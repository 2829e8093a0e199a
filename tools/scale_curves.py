#!/usr/bin/env python
"""Measure the Spark-vs-DuckDB scaling curves in SCALE.md.

For each headline query, run the Spark builder and (where the registry
carries an oracle) the identical DuckDB SQL over the SAME parquet
directory, at one or more volumes (1x = the driver's sf0.1, 10x/100x =
`tools/gen_sf.py` key-consistent replicas). Steady-state min-of-2 after
one warm run, one long-lived session per engine — the methodology the
SCALE.md table quotes.

Usage: python tools/scale_curves.py DIR [DIR...] > curves.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

QUERIES = [
    "q_tpch_q1",
    "q_join_agg_topn",
    "q_multi_join",
    "q_window_rank",
    "q_recursive_descendants",
    "q_dedup_exact",
    "q_text_tokens",
    "q_doc_chunk",
    "q_heavy_hitters",
    "q_dedup_minhash_vec",
    "q_dedup_cluster_star",
    "q_kmeans_iter",
    "q_knn_brute",
    "q_knn_gemm",
    "q_pipeline_pretrain",
    "q_passage_dedup",
    "q_ann_rerank",
    "q_bloom_prune",
    "q_dedup_incremental",
    "q_events_funnel",
    "q_retention_cohorts",
    "q_source_cap",
    "q_pagerank",
    "q_winnowing",
    "q_quality_gopher",
    "q_global_shuffle",
    "q_token_histogram",
    "q_bm25",
    "q_bpe_pairs",
    "q_chi2_terms",
    "q_merge_upsert",
    "q_dedup_semantic_gemm",
]

# measure a subset: SPARK_GRAFT_CURVE_QUERIES="q_pagerank,q_winnowing"
_ONLY = os.environ.get("SPARK_GRAFT_CURVE_QUERIES")
if _ONLY:
    # Names come straight from the env (validated against the registry at
    # load), so newly added queries can be measured without editing this
    # default headline list.
    QUERIES = [q.strip() for q in _ONLY.split(",") if q.strip()]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def time_min2(fn) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def spark_side(dirs: list[str]) -> dict:
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark

    spark = get_spark("scale-curves")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out: dict = {}
    for d in dirs:
        out[d] = {}
        for name in QUERIES:
            b = specs[name].builder
            try:
                out[d][name] = time_min2(lambda: b(spark, d).count())
            except Exception as exc:
                out[d][name] = f"ERR {type(exc).__name__}"
            print(f"spark {d} {name}: {out[d][name]}", file=sys.stderr)
    spark.stop()
    return out


def duck_side(dirs: list[str]) -> dict:
    import duckdb

    from duckdb_pst_spark.registry import load_all

    specs = load_all()
    out: dict = {}
    for d in dirs:
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t in TABLES:
            p = f"{d}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        out[d] = {}
        for name in QUERIES:
            sql = specs[name].oracle
            if not sql:
                out[d][name] = None  # rows-only query: no SQL twin
                continue
            try:
                out[d][name] = time_min2(
                    lambda: con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
                )
            except Exception as exc:
                out[d][name] = f"ERR {type(exc).__name__}"
            print(f"duck  {d} {name}: {out[d][name]}", file=sys.stderr)
        con.close()
    return out


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    # DuckDB measures FIRST: once the Spark JVM exists in this process
    # (spark.stop() does not release its heap), DuckDB's numbers inflate
    # 4-7x from memory pressure — measured round 5: q_sequence_gaps
    # oracle 1.35 s clean vs 10.6 s with a stopped-but-resident JVM.
    duck = duck_side(dirs)
    result = {"spark": spark_side(dirs), "duckdb": duck}
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
