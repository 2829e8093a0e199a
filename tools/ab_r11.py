#!/usr/bin/env python
"""Round-11 optimization A/Bs: old-vs-new builder variants, one session,
interleaved min-of-N noop-sink timing, results pinned equal first.

Usage: python tools/ab_r11.py <experiment> [corpus_dir]

Experiments are registered in EXPERIMENTS below; each returns
(old_builder, new_builder) where a builder is (spark, sf_dir) -> DataFrame.
The "new" side is the REGISTERED builder (what ships); the "old" side is
the pre-optimization shape kept here verbatim for reproducible evidence.
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
def ngram_novelty():
    """Measured NO-SHIP (the registered two-branch shape stands as
    "old"): the candidate computed per-doc totals scan-local via
    size(array_distinct(...)) instead of the second explode + doc-keyed
    aggregate. Verdict (interleaved min-of-3, results pinned equal):
    sf0.1 1.15-1.30x REGRESSION, x10 0.75x, x100 0.95x — the deleted
    exchange is map-side combined to doc cardinality already, so only
    explode/agg CPU goes away while the totals branch still pays the
    full trigram HOF; inconsistent across scales, not a cure. (An
    earlier candidate that exploded a PROJECTED trigram column measured
    7x WORSE: InferFiltersFromGenerate infers size>0/isnotnull on the
    cheap column child and project-collapse re-evaluates the trigram
    HOF three times per row.)"""
    from pyspark.sql import functions as F

    from duckdb_pst_spark.operators.text import _docs_with_tokens
    from duckdb_pst_spark.registry import load_all

    def candidate(spark, sf_dir):
        d = _docs_with_tokens(spark, sf_dir).where(F.size("toks") >= 3)
        _tg = F.array_distinct(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> xxhash64(toks[i - 1], toks[i], toks[i + 1]))"
            )
        )
        totals = d.select("doc_id", F.size(_tg).cast("long").alias("n_trigrams"))
        tri = d.select("doc_id", F.explode(_tg).alias("g"))
        novel = (
            tri.groupBy("g")
            .agg(F.min("doc_id").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
        )
        return totals.join(novel, "doc_id", "left").select(
            "doc_id",
            "n_trigrams",
            F.expr(
                "1000000 * coalesce(n_novel, CAST(0 AS BIGINT)) div n_trigrams"
            ).alias("novel_ppm"),
        )

    return load_all()["q_ngram_novelty"].builder, candidate


def bpe_pairs():
    """Old (pre-r11, kept verbatim): per-word char split + transform
    concat. New (shipped): substring-based pair generation directly on
    the word string — no per-char array, no filter, no concat.
    Identical pairs: substring(w, i, 2) IS cs[i]||cs[i+1] (Spark
    substring and split('') both index codepoints)."""
    from pyspark.sql import functions as F

    from duckdb_pst_spark.operators.text import BPE_TOP_PAIRS, _docs_with_tokens
    from duckdb_pst_spark.registry import load_all

    def old(spark, sf_dir):
        words = (
            _docs_with_tokens(spark, sf_dir)
            .select(F.explode("toks").alias("w"))
            .select(F.expr("filter(split(w, ''), c -> c != '')").alias("cs"))
            .filter(F.size("cs") >= 2)
        )
        pairs = words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(cs) - 1), i -> concat(cs[i-1], cs[i]))"
                )
            ).alias("pair")
        )
        return (
            pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(BPE_TOP_PAIRS)
        )

    return old, load_all()["q_bpe_pairs"].builder


def quality_linear():
    """Old (pre-r11, kept verbatim): weights joined as a 4096-row
    broadcast dimension — the shape a real exported model needs. New
    (shipped): the weight computed inline (the model IS deterministic
    arithmetic here, exactly what the oracle runs; join deleted)."""
    from pyspark.sql import functions as F

    from duckdb_pst_spark.functions.partitioning import spread
    from duckdb_pst_spark.functions.portable import poly_hash, tokens
    from duckdb_pst_spark.operators.text import _QL_BUCKETS, _QL_MULT
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.tables import table

    def old(spark, sf_dir):
        weights = F.broadcast(
            spark.range(_QL_BUCKETS).select(
                F.col("id").alias("bucket"),
                ((F.col("id") * F.lit(_QL_MULT)) % F.lit(1_000_000_007) % F.lit(1001))
                .cast("long")
                .alias("w"),
            )
        )
        tok = (
            spread(table(spark, sf_dir, "documents"))
            .select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
            .select(
                "doc_id", (poly_hash(F.col("t")) % F.lit(_QL_BUCKETS)).alias("bucket")
            )
        )
        agg = (
            tok.join(weights, "bucket")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.sum("w").cast("long").alias("score"),
            )
        )
        q = F.expr("(score * 1000000) div n_tokens")
        return agg.select(
            "doc_id", "n_tokens", "score", q.alias("quality_u"),
            (q >= F.lit(500_000)).alias("is_keep"),
        )

    return old, load_all()["q_quality_linear"].builder


def pipeline_pretrain():
    """Old (pre-r11, kept verbatim): text carried through the exact-dedup
    window exchange; decontamination shingles as concat'd strings. New
    (shipped): xxhash64 content key + trigram ids — the chain's only
    corpus exchange carries 8-byte keys instead of ~1 KB texts."""
    from pyspark.sql import DataFrame, Window
    from pyspark.sql import functions as F

    from duckdb_pst_spark.functions.partitioning import spread
    from duckdb_pst_spark.functions.portable import poly_hash, tokens
    from duckdb_pst_spark.operators.dedup import (
        JACCARD_THRESHOLD_U,
        _band_pairs,
        _minhash_band_kernel,
        _shingle_hashes,
    )
    from duckdb_pst_spark.operators.pipeline import EN_RATIO_U, MIN_CHARS, MIN_TOKENS
    from duckdb_pst_spark.operators.text import _EN_STOPWORDS
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
            "doc_id", "source", "lang", "text", F.size("toks").alias("n_toks")
        )

        def shingle_rows(df: DataFrame) -> DataFrame:
            grams = F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
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
                "_min_id", F.min("doc_id").over(Window.partitionBy("text"))
            )
            .filter(F.col("doc_id") == F.col("_min_id"))
            .drop("_min_id")
        )
        bands = (
            docs.select("doc_id", "text")
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
            docs.join(F.broadcast(member_ids), "doc_id", "left_semi")
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


def passage_dedup():
    """Old (pre-r11, kept verbatim): passages materialized as joined
    strings, shuffled and joined as strings. New (shipped): xxhash64 of
    the token slice as the shuffle/join key; per-passage token count
    computed scan-local at explode time."""
    from pyspark.sql import functions as F

    from duckdb_pst_spark.operators.text import _PASSAGE_W, _docs_with_tokens
    from duckdb_pst_spark.registry import load_all

    def old(spark, sf_dir):
        d = _docs_with_tokens(spark, sf_dir)
        starts = F.expr(
            f"transform(sequence(0, cast(ceil(size(toks) / {_PASSAGE_W}.0) as int) - 1),"
            f" i -> array_join(slice(toks, i * {_PASSAGE_W} + 1, {_PASSAGE_W}), ' '))"
        )
        passages = d.select("doc_id", F.explode(starts).alias("passage"))
        dup = (
            passages.groupBy("passage")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .where(F.col("nd") > 1)
            .select("passage", F.lit(1).alias("isdup"))
        )
        kept_tok = F.when(
            F.col("isdup").isNull(), F.size(F.split(F.col("passage"), " "))
        ).otherwise(0)
        return (
            passages.join(dup, "passage", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_passages"),
                F.sum(F.when(F.col("isdup").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("kept_passages"),
                F.sum(kept_tok).cast("long").alias("kept_tokens"),
            )
        )

    return old, load_all()["q_passage_dedup"].builder


def quality_ks():
    """Old (pre-r11, kept verbatim): the histogram re-computed per
    consumer — three corpus scan+aggregate branches. New (shipped): one
    eager localCheckpoint of the histogram-sized table."""
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
        )
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
        diff = c.crossJoin(F.broadcast(t)).agg(
            F.max(
                F.abs(
                    F.col("ca").cast("decimal(38,0)") * F.col("n_b")
                    - F.col("cb").cast("decimal(38,0)") * F.col("n_a")
                )
            ).alias("d_num")
        )
        return t.crossJoin(F.broadcast(diff)).select(
            "n_a",
            "n_b",
            F.when(
                (F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(0).cast("long")
            )
            .otherwise(
                F.expr(
                    "coalesce(d_num, CAST(0 AS DECIMAL(38,0))) * 1000000"
                    " div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
                )
            )
            .cast("long")
            .alias("ks_ppm"),
        )

    return old, load_all()["q_quality_ks"].builder


def lang_confusion():
    """Measured NO-SHIP (registered shape stands as "old"): the static
    plan shows two scan+classifier subtrees, but AQE stage reuse already
    deduplicates the shared aggregate exchange at runtime — the
    checkpoint candidate measured 0.90x sf0.1 / 0.97x x100 only."""
    from pyspark.sql import functions as F

    from duckdb_pst_spark.operators.text import _lang_guess_df
    from duckdb_pst_spark.registry import load_all

    def candidate(spark, sf_dir):
        g = _lang_guess_df(spark, sf_dir)
        c = (
            g.groupBy("lang", "lang_guess")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .localCheckpoint(eager=True)
        )
        tot = c.groupBy("lang").agg(F.sum("n").cast("long").alias("n_gold"))
        return c.join(F.broadcast(tot), "lang").select(
            "lang",
            "lang_guess",
            "n",
            F.expr("1000000 * n div n_gold").alias("cell_ppm"),
        )

    return load_all()["q_lang_confusion"].builder, candidate


def source_overlap():
    """Measured NO-SHIP: eager localCheckpoint of the |sources|x64-row
    KMV sketch so the corpus shingle pass provably runs once (the static
    plan holds FOUR copies of the scan->shingle->distinct->window-limit
    subtree). Verdict: sf0.1 0.85x, x10 0.97x, x100 0.94x interleaved
    min-of-3 — AQE stage reuse already dedupes the corpus stage at
    runtime; the residual is small-scale fixed overhead, which does not
    ship (local-only wins don't count). Registered shape stands."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duckdb_pst_spark.functions.partitioning import spread
    from duckdb_pst_spark.functions.portable import poly_hash
    from duckdb_pst_spark.operators.sketches import _OVL_K, _OVL_SALT
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.tables import table

    def candidate(spark, sf_dir):
        sh = (
            spread(table(spark, sf_dir, "documents"))
            .select(
                "source",
                F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"),
            )
            .filter(F.size("toks") >= 3)
            .select(
                "source",
                F.explode(
                    F.array_distinct(
                        F.expr(
                            "transform(sequence(1, size(toks) - 2),"
                            " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                        )
                    )
                ).alias("g"),
            )
            .select("source", poly_hash(F.col("g")).alias("hv"))
            .distinct()
        )
        w1 = Window.partitionBy("source", (F.col("hv") % _OVL_SALT)).orderBy("hv")
        w2 = Window.partitionBy("source").orderBy("hv")
        sk = (
            sh.withColumn("rn1", F.row_number().over(w1))
            .filter(F.col("rn1") <= _OVL_K)
            .withColumn("rn2", F.row_number().over(w2))
            .filter(F.col("rn2") <= _OVL_K)
            .select("source", "hv")
            .localCheckpoint(eager=True)
        )
        srcs = sk.select("source").distinct()
        pairs = srcs.select(F.col("source").alias("sa")).join(
            srcs.select(F.col("source").alias("sb")), F.col("sa") < F.col("sb")
        )
        ska = sk.select(F.col("source").alias("sa"), "hv", F.lit(1).alias("in_a"))
        skb = sk.select(F.col("source").alias("sb"), "hv", F.lit(1).alias("in_b"))
        left = pairs.join(ska, "sa").select("sa", "sb", "hv", "in_a")
        right = pairs.join(skb, "sb").select("sa", "sb", "hv", "in_b")
        u = left.join(right, ["sa", "sb", "hv"], "full_outer").select(
            "sa",
            "sb",
            "hv",
            F.coalesce(F.col("in_a"), F.lit(0)).alias("in_a"),
            F.coalesce(F.col("in_b"), F.lit(0)).alias("in_b"),
        )
        wr = Window.partitionBy("sa", "sb").orderBy("hv")
        est = (
            u.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= _OVL_K)
            .groupBy("sa", "sb")
            .agg(
                F.count(F.lit(1)).cast("long").alias("k_used"),
                F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("both_n"),
            )
        )
        return est.select(
            "sa", "sb", "k_used",
            F.expr("(both_n * 1000000) div k_used").alias("jaccard_ppm"),
        )

    return load_all()["q_source_overlap"].builder, candidate


EXPERIMENTS = {
    "ngram_novelty": ngram_novelty,
    "bpe_pairs": bpe_pairs,
    "quality_linear": quality_linear,
    "pipeline_pretrain": pipeline_pretrain,
    "passage_dedup": passage_dedup,
    "quality_ks": quality_ks,
    "lang_confusion": lang_confusion,
    "source_overlap": source_overlap,
}


def main() -> None:
    name = sys.argv[1]
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    old_b, new_b = EXPERIMENTS[name]()

    from duckdb_pst_spark.session import free_checkpoints, get_spark

    spark = get_spark(f"ab-r11-{name}")
    spark.sparkContext.setLogLevel("ERROR")

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
