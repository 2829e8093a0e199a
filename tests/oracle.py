"""Local replica of the driver's correctness gate: run a registered query
on Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row count, column-name set, and order-insensitive values exactly
(the driver hashes values, so any value difference is a failure here too).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from duckdb_pst_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    """Canonicalize a cell value for exact cross-engine comparison."""
    if v is None:
        return ("_", "")  # sortable against the other tagged tuples
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v.hex())
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("t", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    if isinstance(v, list):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    return ("s", str(v))


def _spark_type_key(dt) -> str:
    """Flatten a Spark data type to a comparable key."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_type_key(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{_spark_type_key(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    return {
        "long": "int64", "integer": "int32", "short": "int16", "byte": "int8",
        "double": "float64", "float": "float32", "string": "string",
        "boolean": "bool", "binary": "binary", "date": "date",
        "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    }.get(dt.typeName(), dt.typeName())


def _arrow_type_key(at) -> str:
    """Flatten a pyarrow type to the same comparable key space."""
    import pyarrow as pa

    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return f"list<{_arrow_type_key(at.value_type)}>"
    if pa.types.is_struct(at):
        inner = ",".join(f"{f.name}:{_arrow_type_key(f.type)}" for f in at)
        return f"struct<{inner}>"
    if pa.types.is_decimal(at):
        return f"decimal({at.precision},{at.scale})"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_large_string(at) or pa.types.is_string(at):
        return "string"
    if pa.types.is_large_binary(at) or pa.types.is_binary(at):
        return "binary"
    if pa.types.is_boolean(at):
        return "bool"
    if pa.types.is_float64(at):
        return "float64"
    if pa.types.is_float32(at):
        return "float32"
    return str(at)


def _check_types(name: str, spark_schema, arrow_schema) -> None:
    """Exact cross-engine type parity per column. The driver hashes the
    materialized values, so a DuckDB HUGEINT (→ decimal128/float64 via
    Arrow) or an int-width drift against Spark is a real failure even
    when the Python values compare equal."""
    stypes = {f.name: _spark_type_key(f.dataType) for f in spark_schema.fields}
    dtypes = {arrow_schema.field(i).name: _arrow_type_key(arrow_schema.field(i).type)
              for i in range(len(arrow_schema))}
    diffs = {
        c: (stypes[c], dtypes[c])
        for c in stypes
        if c in dtypes and stypes[c] != dtypes[c]
    }
    assert not diffs, f"{name}: type mismatch (spark vs duck-arrow): {diffs}"


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def compare(spark, spec, sf_dir: str, *, max_diff_report: int = 5) -> None:
    """Assert spark result == duckdb oracle result for one QuerySpec.

    Specs with a constant-pinned golden (``pinned_sf`` set) are compared
    at their pinning corpus regardless of the ambient ``sf_dir`` — the
    VALUES literal is only the query's output there (the driver's gate
    runs at exactly that corpus, sf0.01)."""
    if spec.pinned_sf is not None:
        sf_dir = spec.pinned_sf
    sdf = spec.builder(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duck_connection(sf_dir)
    # Fetch through Arrow, not fetchall(): the driver materializes the
    # oracle result through Arrow/pandas, where DuckDB's HUGEINT (the
    # result type of SUM over integers) becomes decimal128/float64, not
    # int64 — fetchall() hides that by returning plain Python ints.
    tbl = con.execute(spec.oracle).fetch_arrow_table()
    dcols = list(tbl.column_names)
    drows = [tuple(d.values()) for d in tbl.to_pylist()]
    con.close()

    assert sorted(scols) == sorted(dcols), (
        f"{spec.name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    _check_types(spec.name, sdf.schema, tbl.schema)
    assert len(srows) == len(drows), (
        f"{spec.name}: row count mismatch spark={len(srows)} duck={len(drows)}"
    )
    _, s_norm = _normalize(scols, srows)
    _, d_norm = _normalize(dcols, drows)
    if s_norm != d_norm:
        diffs = [
            (i, s, d)
            for i, (s, d) in enumerate(zip(s_norm, d_norm))
            if s != d
        ][:max_diff_report]
        raise AssertionError(
            f"{spec.name}: value mismatch; first diffs (spark vs duck):\n"
            + "\n".join(f"  row {i}:\n    S={s}\n    D={d}" for i, s, d in diffs)
        )
