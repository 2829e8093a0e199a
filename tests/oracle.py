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


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def compare(spark, spec, sf_dir: str, *, max_diff_report: int = 5) -> None:
    """Assert spark result == duckdb oracle result for one QuerySpec."""
    sdf = spec.builder(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duck_connection(sf_dir)
    cur = con.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = [tuple(r) for r in cur.fetchall()]
    con.close()

    assert sorted(scols) == sorted(dcols), (
        f"{spec.name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
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
