#!/usr/bin/env python
"""Round-12 optimization A/Bs: old-vs-new builder variants, one session,
interleaved min-of-N noop-sink timing, results pinned equal first.

Usage: python tools/ab_r12.py <experiment> [corpus_dir]

Experiments are registered in EXPERIMENTS below; each returns
(old_builder, new_builder) where a builder is (spark, sf_dir) -> DataFrame.
The "new" side is the REGISTERED builder (what ships); the "old" side is
the pre-optimization shape kept here verbatim for reproducible evidence.
Same harness as tools/ab_r11.py.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REPS = 3


# ------------------------------------------------------------ experiments
def tkey128():
    """r12 hardening cost probe: q_pipeline_pretrain with the r11 64-bit
    content key / 64-bit decon shingle ids (old, kept verbatim) vs the
    shipped 128-bit two-seed keys (new). The answer is identical on any
    collision-free corpus; the A/B prices the second xxhash64 per text /
    per gram and the extra 8 B per row on the exact-dedup exchange."""
    from pyspark.sql import DataFrame, Window
    from pyspark.sql import functions as F

    from duckdb_pst_spark.functions.partitioning import spread
    from duckdb_pst_spark.operators.pipeline import (
        _EN_STOPWORDS,
        EN_RATIO_U,
        JACCARD_THRESHOLD_U,
        MIN_CHARS,
        MIN_TOKENS,
        _band_pairs,
        _minhash_band_kernel,
        _shingle_hashes,
    )
    from duckdb_pst_spark.functions.portable import poly_hash, tokens
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.tables import table

    def old(spark, sf_dir):
        docs = spread(table(spark, sf_dir, "documents"))
        d = docs.withColumn("toks", tokens(F.col("text")))
        en_hits = F.size(
            F.filter(F.col("toks"), lambda t: t.isin(*_EN_STOPWORDS))
        ).cast("long")
        gated = d.filter(
            (F.length("text") >= MIN_CHARS)
            & (F.size("toks") >= MIN_TOKENS)
            & ((en_hits * 1_000_000).cast("long") / F.size("toks") >= EN_RATIO_U)
        )
        train = gated.filter(F.col("doc_id") % 100 != 0)
        train_slim = train.select(
            "doc_id",
            "source",
            "lang",
            F.xxhash64("text").alias("_tkey"),
            F.size("toks").alias("n_toks"),
        )

        def shingle_rows(df: DataFrame) -> DataFrame:
            grams = F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> xxhash64(toks[i-1], toks[i], toks[i+1]))"
                )
            )
            return (
                df.filter(F.size("toks") >= 3)
                .select("doc_id", F.explode(grams).alias("g"))
            )

        eval_sh = shingle_rows(d.filter(F.col("doc_id") % 100 == 0))
        contaminated = (
            shingle_rows(train)
            .join(F.broadcast(eval_sh.select("g").distinct()), "g")
            .select("doc_id")
            .distinct()
        )
        clean = train_slim.join(contaminated, "doc_id", "left_anti")
        exact = (
            clean.withColumn(
                "_min_id", F.min("doc_id").over(Window.partitionBy("_tkey"))
            )
            .filter(F.col("doc_id") == F.col("_min_id"))
            .drop("_min_id", "_tkey")
        )
        bands = (
            docs
            .select("doc_id", "text")
            .mapInPandas(
                _minhash_band_kernel, "doc_id long, band_idx int, band_val long"
            )
        )
        pairs = _band_pairs(bands)
        member_ids = (
            pairs.select(F.col("doc_a").alias("doc_id"))
            .union(pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sh = (
            docs
            .join(F.broadcast(member_ids), "doc_id", "left_semi")
            .select("doc_id", tokens(F.col("text")).alias("toks"))
            .localCheckpoint(eager=True)
            .select("doc_id", _shingle_hashes(F.col("toks"), poly_hash).alias("sh"))
        )
        jacc = F.expr(
            "(CAST(size(array_intersect(sa_sh, sb_sh)) AS BIGINT) * 1000000)"
            " div size(array_union(sa_sh, sb_sh))"
        )
        near_drop = (
            pairs.join(
                sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa_sh")),
                "doc_a",
            )
            .join(
                sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb_sh")),
                "doc_b",
            )
            .filter(jacc >= JACCARD_THRESHOLD_U)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        survivors = exact.join(near_drop, "doc_id", "left_anti")
        return survivors.groupBy("source", "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_toks").cast("long")).alias("total_tokens"),
        )

    return old, load_all()["q_pipeline_pretrain"].builder


def pk128():
    """r12 hardening cost probe: q_passage_dedup with the r11 64-bit
    slice key (old, kept verbatim, incl. the empty-slice shim) vs the
    shipped 128-bit two-seed key + zero-token guard (new). Identical
    answers on any collision-free, no-empty-doc corpus (all testdata)."""
    from pyspark.sql import functions as F

    from duckdb_pst_spark.operators.text import _PASSAGE_W, _docs_with_tokens
    from duckdb_pst_spark.registry import load_all

    def old(spark, sf_dir):
        d = _docs_with_tokens(spark, sf_dir)
        slices = F.expr(
            f"transform(sequence(0, cast(ceil(size(toks) / {_PASSAGE_W}.0) as int) - 1),"
            f" i -> slice(toks, i * {_PASSAGE_W} + 1, {_PASSAGE_W}))"
        )
        passages = d.select("doc_id", F.explode(slices).alias("p")).select(
            "doc_id",
            F.xxhash64("p").alias("pk"),
            F.when(F.size("p") == 0, 1).otherwise(F.size("p")).alias("n_ptok"),
        )
        dup = (
            passages.groupBy("pk")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .where(F.col("nd") > 1)
            .select("pk", F.lit(1).alias("isdup"))
        )
        return (
            passages.join(dup, "pk", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_passages"),
                F.sum(F.when(F.col("isdup").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("kept_passages"),
                F.sum(F.when(F.col("isdup").isNull(), F.col("n_ptok")).otherwise(0))
                .cast("long")
                .alias("kept_tokens"),
            )
        )

    return old, load_all()["q_passage_dedup"].builder


def quality_ks_lazy():
    """r12 (ADVICE r11): q_quality_ks's histogram checkpoint goes
    eager=True (old, r11 shipped — runs a corpus scan at DataFrame-BUILD
    time) -> eager=False (new — same lineage truncation and same single
    corpus pass, final-stage materialization moved to the first ACTION).
    Measured: 0.97x sf0.1 / 0.93x x100 (the deleted eager pass). Caveat
    probed with a statusTracker job count: under AQE, builder()+explain
    still fires the aggregate's shuffle-stage jobs (2, vs eager's 3) —
    the build-time-job class is reduced, not eliminated."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.tables import table

    def old(spark, sf_dir):
        d = table(spark, sf_dir, "documents").filter(F.col("lang").isin("en", "fr"))
        h = d.groupBy(F.col("n_chars").alias("v")).agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("na"),
            F.sum(F.when(F.col("lang") == "fr", 1).otherwise(0))
            .cast("long")
            .alias("nb"),
        ).localCheckpoint(eager=True)
        w = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        c = h.select(
            F.sum("na").over(w).cast("long").alias("ca"),
            F.sum("nb").over(w).cast("long").alias("cb"),
        )
        t = h.agg(
            F.coalesce(F.sum("na"), F.lit(0)).cast("long").alias("n_a"),
            F.coalesce(F.sum("nb"), F.lit(0)).cast("long").alias("n_b"),
        )
        diff = (
            c.crossJoin(F.broadcast(t))
            .agg(
                F.max(
                    F.abs(
                        F.col("ca").cast("decimal(38,0)") * F.col("n_b")
                        - F.col("cb").cast("decimal(38,0)") * F.col("n_a")
                    )
                ).alias("d_num")
            )
        )
        return (
            t.crossJoin(F.broadcast(diff))
            .select(
                "n_a",
                "n_b",
                F.when(
                    (F.col("n_a") == 0) | (F.col("n_b") == 0),
                    F.lit(0).cast("long"),
                )
                .otherwise(
                    F.expr(
                        "coalesce(d_num, CAST(0 AS DECIMAL(38,0))) * 1000000"
                        " div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
                    )
                )
                .alias("ks_ppm"),
            )
        )

    return old, load_all()["q_quality_ks"].builder


def dedup_exact_hash():
    """r12 (VERDICT r11 item 6): the exact-dedup production twin. Old =
    the registered text-keyed q_dedup_exact projected to (keep_id,
    dup_cnt) so results pin equal (the projection does NOT change the
    text-keyed exchange being priced — the group key still rides the
    wire; only the cosmetic key_text output column is dropped). New =
    q_dedup_exact_hash (128-bit two-seed hash group key, 16 B/doc on
    the exchange instead of ~1 KB)."""
    from duckdb_pst_spark.registry import load_all

    specs = load_all()
    plain = specs["q_dedup_exact"].builder

    def old(spark, sf_dir):
        return plain(spark, sf_dir).select("keep_id", "dup_cnt")

    return old, specs["q_dedup_exact_hash"].builder


def _q8_pre_r12(spark, sf_dir):
    """Q8 as shipped in r8–r11 (supplier attached per fact row), kept
    verbatim: the 'old' side of suppagg_q8."""
    from pyspark.sql import functions as F

    from duckdb_pst_spark.tables import table

    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n2.select("n_nationkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_c = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    j = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            rev_c.alias("rev_c"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("rev_c")).otherwise(0)
    return (
        j.groupBy("o_year")
        .agg(
            F.sum(nat).cast("long").alias("nation_rev_c"),
            F.sum("rev_c").cast("long").alias("total_rev_c"),
            F.expr(
                "CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' "
                "THEN rev_c ELSE 0 END) AS DECIMAL(38,0)) * 1000000"
                " div sum(rev_c) AS BIGINT)"
            ).alias("mkt_share_ppm"),
        )
        .orderBy("o_year")
    )


def suppagg_q8():
    """r12 SHIPPED (VERDICT r11 item 2): Q8's fact partially aggregated
    to (l_suppkey, o_year) BEFORE the supplier attach. Run with
    AB_R12_BCAST_OFF=1 to disable size-based broadcasts (planner + AQE)
    and measure the post-broadcast-cliff shape the restructure targets.
    Verdicts: broadcast-on 1.01x sf0.1 / 0.96x x10; broadcast-off 0.88x
    x10 / 0.92x x100."""
    from duckdb_pst_spark.registry import load_all

    return _q8_pre_r12, load_all()["q_tpch_q8"].builder


def suppagg_noship():
    """Measured NO-SHIP: the same partial-agg-before-supplier-attach
    restructure for Q5/Q7/Q9 (candidates in tools/probe_suppagg_r12.py,
    runnable standalone). Verdicts (interleaved min-of-3):
    Q5 1.02x sf0.1-on / 1.30x x10-on / 1.09x x10-off / 1.12x x100-off;
    Q7 1.07x / 1.16x / 1.15x / 1.10x — both regress everywhere (their
    partial-agg keys carry cust_nation, so the pre-supplier fact join
    loses its supplier prune (Q7) or the agg collapses less (Q5));
    Q9 0.94x sf0.1-on / 0.94x x100-off BUT 1.17x x10-on (min-of-5) —
    not uniform across confs, so the registered shape stands (the
    repo's preferSMJ lesson: no uniform direction, no ship)."""
    raise SystemExit(
        "no-ship evidence experiment: run `python tools/probe_suppagg_r12.py"
        " <corpus> [off]` for the Q5/Q7/Q9 candidates"
    )


def infer_gen():
    """r12 SHIPPED (found by tests/test_plan_audit.py): the four
    _docs_with_tokens consumers that explode the projected toks column
    (q_explode_agg, q_bpe_pairs, q_oov_rate, q_phrase_pmi) carried an
    InferFiltersFromGenerate-inferred size/isnotnull filter that
    re-inlined the tokenization HOF 2-3x per document. Cure: per-query
    excludedRules conf (_NO_INFER_GEN in operators/text.py). A/B:
    `python tools/probe_infer_gen_r12.py <corpus>` (interleaved
    min-of-3, results pinned equal) — 0.91-0.98x sf0.1,
    0.54/0.67/0.72/0.89x at x100."""
    raise SystemExit(
        "conf experiment: run `python tools/probe_infer_gen_r12.py <corpus>`"
    )


EXPERIMENTS = {
    "tkey128": tkey128,
    "pk128": pk128,
    "quality_ks_lazy": quality_ks_lazy,
    "dedup_exact_hash": dedup_exact_hash,
    "suppagg_q8": suppagg_q8,
    "suppagg_noship": suppagg_noship,
    "infer_gen": infer_gen,
}


def main() -> None:
    name = sys.argv[1]
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    old_b, new_b = EXPERIMENTS[name]()

    from duckdb_pst_spark.session import free_checkpoints, get_spark

    spark = get_spark(f"ab-r12-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("AB_R12_BCAST_OFF") == "1":
        # disable size-based broadcasts (planner + AQE) to measure the
        # post-broadcast-cliff shape; explicit F.broadcast hints on the
        # fixed-cardinality dims still apply, as they would at any scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        print("AB_R12_BCAST_OFF=1: size-based broadcasts disabled", file=sys.stderr)

    # results pinned equal first
    o = sorted(tuple(r) for r in old_b(spark, corpus).collect())
    n = sorted(tuple(r) for r in new_b(spark, corpus).collect())
    assert o == n, f"{name}: old/new results differ ({len(o)} vs {len(n)} rows)"
    print(f"{name}: results pinned equal ({len(o)} rows)", file=sys.stderr)
    free_checkpoints(spark)

    def run(b) -> float:
        t0 = time.perf_counter()
        b(spark, corpus).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # plan warm-up, then interleaved min-of-REPS
    run(old_b), run(new_b)
    free_checkpoints(spark)
    to, tn = float("inf"), float("inf")
    for _ in range(REPS):
        to = min(to, run(old_b))
        free_checkpoints(spark)
        tn = min(tn, run(new_b))
        free_checkpoints(spark)
    print(
        f"{name} @ {corpus}: old {to:.3f} s -> new {tn:.3f} s "
        f"({tn / to:.2f}x), interleaved min-of-{REPS}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
