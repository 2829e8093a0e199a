"""Engine-portable column arithmetic.

The driver's correctness gate hash-compares Spark results against a DuckDB
oracle running equivalent SQL. Anything involving engine-specific hash
functions or order-sensitive floating-point reduction would spuriously
mismatch, so the oracle-checked operators here use only:

- **polynomial rolling hashes** over character codes (pure 64-bit integer
  arithmetic, identical in any engine) instead of murmur/xxhash;
- **floor-scaled integer sums** (``floor(x * 10^k)`` summed as BIGINT)
  instead of unordered double sums (double addition is not associative, so
  a group-by sum over doubles is not reproducible across engines);
- **left-fold double arithmetic** for per-row vector math (both Spark's
  ``aggregate`` and DuckDB's ``list_reduce`` fold sequentially over the
  array, so the IEEE operation sequence — and therefore every bit of the
  result — is identical).

Each helper has a Spark (Column) and a DuckDB (SQL-fragment) form kept
side-by-side so the pair can't drift.

Performance note: these portable forms are the *oracle parity* path. For
the 100 TB hot path, `duckdb_pst_spark.operators.dedup` exposes the same
operators parameterized by Spark's native ``xxhash64`` (JVM, codegen'd),
which is ~10× faster; correctness of the pipeline shape is proven on the
portable path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large prime < 2^31 so (acc * 31 + x) stays far below 2^63 (ANSI-safe).
P_HASH = 1_000_000_007


# ---------------------------------------------------------------- tokens
def tokens(col: Column) -> Column:
    """Whitespace tokenization with empty tokens removed (array<string>)."""
    return F.filter(F.split(col, " "), lambda x: x != F.lit(""))


def duck_tokens(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), x -> x != '')"


# ------------------------------------------------------------- poly hash
def poly_hash(col: Column) -> Column:
    """Polynomial rolling hash over character codes: fold (acc*31+code) % P.

    Portable replacement for an engine hash function. Returns BIGINT.
    """
    codes = F.transform(
        F.filter(F.split(col, ""), lambda c: c != F.lit("")),
        lambda c: F.ascii(c).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(P_HASH),
    )


def duck_poly_hash(expr: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(ascii(c) AS BIGINT) for c in string_split({expr}, '')]), "
        f"(acc, x) -> (acc * 31 + x) % {P_HASH})"
    )


def poly_hash_long(col: Column) -> Column:
    """Poly-hash of a BIGINT column: (x * 2654435761) % P  (Knuth-style)."""
    return (col.cast("long") % F.lit(P_HASH) * F.lit(2654435761 % P_HASH)) % F.lit(P_HASH)


def duck_poly_hash_long(expr: str) -> str:
    return f"((CAST({expr} AS BIGINT) % {P_HASH}) * {2654435761 % P_HASH}) % {P_HASH}"


# --------------------------------------------------- floor-scaled money
def scaled_long(col: Column, scale: int = 100) -> Column:
    """floor(x * scale) as BIGINT — exact, order-independent summation."""
    return F.floor(col * F.lit(scale)).cast("long")


def duck_scaled_long(expr: str, scale: int = 100) -> str:
    return f"CAST(FLOOR(({expr}) * {scale}) AS BIGINT)"
