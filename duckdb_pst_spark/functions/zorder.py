"""Z-order (Morton) curve helpers — interleave two integer keys so that
sorting by the single z-value co-locates rows close in EITHER dimension.

Keys are first NORMALIZED to equal-width bucket ids 0..2^ZBITS-1 over
their own [min, max] — raw interleaving degenerates when domains are
asymmetric (a 14-bit orderkey vs an 8-bit custkey puts every leading z
bit on the wide key and the layout collapses to a single-key sort; this
is why Delta/Iceberg OPTIMIZE ZORDER range-normalizes each column
first). All arithmetic is integer shift-by-division, exact and
identical in Spark and DuckDB."""

from __future__ import annotations

ZBITS = 8  # bits per dimension -> 16-bit z-value


def bucket_expr(col: str, mn: str, mx: str, div: str) -> str:
    """Equal-width bucket id 0..2^ZBITS-1 of `col` over [mn, mx]."""
    return f"((({col}) - ({mn})) * {1 << ZBITS} {div} (({mx}) - ({mn}) + 1))"


def _interleave(bx: str, by: str, div: str) -> str:
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({bx}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({by}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def spark_zval(x: str, y: str, min_x: str, max_x: str, min_y: str, max_y: str) -> str:
    bx = bucket_expr(x, min_x, max_x, "div")
    by = bucket_expr(y, min_y, max_y, "div")
    return _interleave(bx, by, "div")


def duck_zval(x: str, y: str, min_x: str, max_x: str, min_y: str, max_y: str) -> str:
    bx = bucket_expr(x, min_x, max_x, "//")
    by = bucket_expr(y, min_y, max_y, "//")
    return _interleave(bx, by, "//")
