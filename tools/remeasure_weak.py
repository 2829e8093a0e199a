#!/usr/bin/env python
"""Idle re-measure of the standing >2x weak list (round 8).

Round 8's signature-kernel re-check proved the repo's ratio rows are
systematically biased AGAINST Spark when measured under box load
(q_minhash_band_stats: 2.4x loaded -> 1.38x idle; box load taxes
codegen/exchange stages more than DuckDB's in-process scans). Every
standing weak row except group-topk/band-stats (re-made this round)
and the TPC-H stars (re-measured in the bucketing A/B) carries a
round-4..7 loaded-box ratio. This script re-makes them all idle with
the standard discipline: DuckDB floors FIRST in this JVM-free
process (min-of-3 after a warm run), then ONE Spark session, every
plan warmed at sf0.001, interleaved min-of-3.

Usage: python tools/remeasure_weak.py  — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

X100 = os.path.join(REPO_ROOT, ".cache", "x100")
X100Z = os.path.join(REPO_ROOT, ".cache", "x100z")

PLAN: list[tuple[str, str]] = [
    ("q_heavy_hitters", X100Z),
    ("q_split_leakfree", X100Z),
    ("q_phrase_pmi", X100Z),
    ("q_token_histogram", X100Z),
    ("q_hybrid_rrf", X100Z),
    ("q_lang_confusion", X100Z),
    ("q_quality_ks", X100Z),
    ("q_dedup_prefix_exact", X100Z),
    ("q_degree_distribution", X100),
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
REPS = 3


def duck_floors() -> dict[str, float]:
    import duckdb

    from duckdb_pst_spark.registry import load_all

    specs = load_all()
    out: dict[str, float] = {}
    for name, d in PLAN:
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        for t in TABLES:
            p = f"{d}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        sql = specs[name].oracle
        con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
        con.close()
        print(f"duck {name}: {out[name]}", file=sys.stderr)
    return out


def main() -> None:
    duck = duck_floors()

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark

    spark = get_spark("remeasure-weak")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    def noop(name: str, d: str) -> None:
        specs[name].builder(spark, d).write.mode("overwrite").format("noop").save()

    for name, _ in PLAN:
        noop(name, "/root/testdata/sf0.001")

    # SPARK_GRAFT_FREE_CKPT=1: release resident localCheckpoint blocks
    # between queries (session.free_checkpoints) — the mitigation for
    # confound 1; with it the interleaved session should read like the
    # fresh-process protocol.
    free_ckpt = os.environ.get("SPARK_GRAFT_FREE_CKPT") == "1"
    if free_ckpt:
        from duckdb_pst_spark.session import free_checkpoints

    best = {name: float("inf") for name, _ in PLAN}
    for rep in range(REPS):
        for name, d in PLAN:
            if free_ckpt:
                free_checkpoints(spark)
            t0 = time.perf_counter()
            noop(name, d)
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name}: {dt:.2f}", file=sys.stderr)

    rows = {
        name: {
            "spark": round(best[name], 2),
            "duckdb": duck[name],
            "ratio": round(best[name] / duck[name], 2) if duck[name] else None,
        }
        for name, _ in PLAN
    }
    print(json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
