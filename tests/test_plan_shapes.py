"""Plan-shape assertions — the Spark port of the reference's EXPLAIN
tests (/root/reference/test/sql/query_optimizations.test): instead of
COLUMN_DATA_SCAN / HASH_JOIN regexes, assert pushed filters, pushed
aggregates, pruned read schemas, TakeOrderedAndProject, broadcast joins,
and shuffle counts on the registered queries. These gates are what keep
the 100 TB plan shape from regressing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_pst_spark.plans import introspect as pi
from duckdb_pst_spark.registry import load_all
from duckdb_pst_spark.tables import table

SPECS = load_all()


def _fn_code(fn) -> str:
    """Source of a @query-decorated function's BODY, comments stripped.

    inspect.getsource includes the decorator, whose triple-quoted oracle
    SQL shifts split('\"\"\"') indices (a fixed [2] lands on the decorator
    tail, not the code — found by the round-5 advisor). The code is
    always the segment AFTER the last triple quote (docstring close, or
    oracle close when the function has no docstring), and comments are
    stripped so a needle like 'distinct' can't match prose."""
    import inspect

    code = inspect.getsource(fn).split('"""')[-1]
    return "\n".join(line.split("#", 1)[0] for line in code.splitlines())


def test_count_star_uses_footer_stats(spark, sf_dir):
    """count(*) is answered from parquet footers (PushedAggregation) —
    the analogue of the reference's stats-based COLUMN_DATA_SCAN rewrite
    (query_optimizations.test:13-17)."""
    df = SPECS["q_count_star"].builder(spark, sf_dir)
    assert any("COUNT(*)" in a for a in pi.pushed_aggregates(df)), pi.executed_plan(df)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = SPECS["q_filter_eq"].builder(spark, sf_dir)
    pushed = pi.pushed_filters(df)
    assert any("c_mktsegment" in p and "EqualTo" in p for p in pushed), pushed


def test_like_prefix_pushdown(spark, sf_dir):
    df = SPECS["q_filter_like"].builder(spark, sf_dir)
    pushed = pi.pushed_filters(df)
    assert any("StringStartsWith" in p or "Like" in p for p in pushed), pushed


def test_projection_prunes_read_schema(spark, sf_dir):
    """A 4-column projection over 16-column lineitem must scan only 4
    (reference projection_pushdown, pst_extension.cpp:35)."""
    df = SPECS["q_scan_project"].builder(spark, sf_dir)
    schemas = pi.read_schemas(df)
    assert schemas, pi.executed_plan(df)
    s = schemas[0]
    assert "l_quantity" in s and "l_comment" not in s and "l_extendedprice" not in s


def test_topn_is_take_ordered(spark, sf_dir):
    """order+limit → TakeOrderedAndProject: per-partition heaps, no global
    sort — the plan the reference needs late-materialization to get
    (query_optimizations.test:49-53); Spark gets it natively."""
    df = SPECS["q_topn"].builder(spark, sf_dir)
    assert pi.has_take_ordered(df), pi.executed_plan(df)


def test_dim_joins_broadcast(spark, sf_dir):
    """region/nation joins must be broadcast (no shuffle of the fact
    side); zero sort-merge joins in the dim-join query."""
    df = SPECS["q_join_inner"].builder(spark, sf_dir)
    assert pi.broadcast_join_count(df) == 2, pi.executed_plan(df)
    assert pi.sort_merge_join_count(df) == 0


def test_groupby_single_shuffle(spark, sf_dir):
    """Hash aggregate = partial (map-side) + final: exactly one exchange
    on the group key; the orderBy on the tiny aggregated result may add
    one more, but never a third."""
    df = SPECS["q_groupby_count_order"].builder(spark, sf_dir)
    assert pi.shuffle_count(df) <= 2, pi.executed_plan(df)


def test_tpch_q1_shape(spark, sf_dir):
    """Q1: scan→filter→partial agg→exchange→final agg, all codegen'd;
    one shuffle for the 4-group aggregate + at most a sort exchange."""
    df = SPECS["q_tpch_q1"].builder(spark, sf_dir)
    assert pi.shuffle_count(df) <= 2, pi.executed_plan(df)
    assert pi.codegen_fraction(df) > 0.5


def test_scan_pipeline_fully_codegened(spark, sf_dir):
    """A scan→filter→project pipeline stays inside one WholeStageCodegen
    span — nothing row-at-a-time in the hot path."""
    df = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_quantity")
    )
    assert pi.codegen_fraction(df) >= 0.5, pi.executed_plan(df)
    # formatted explain marks codegen'd operators with a leading star
    assert "* Filter" in pi.formatted_plan(df)


def test_limit_no_full_scan_stages(spark, sf_dir):
    """df.limit(n): CollectLimit/GlobalLimit plan, no exchange needed."""
    df = table(spark, sf_dir, "orders").limit(5)
    plan = pi.executed_plan(df)
    assert "CollectLimit" in plan or "GlobalLimit" in plan
    assert pi.shuffle_count(df) == 0, plan


@pytest.mark.parametrize(
    "name", ["q_scan_project", "q_filter_eq", "q_tpch_q1", "q_join_inner"]
)
def test_no_python_udfs_in_core_relational(spark, sf_dir, name):
    """Core relational surface must be pure JVM — no BatchEvalPython /
    ArrowEvalPython stages (UDFs are the slow path)."""
    plan = pi.executed_plan(SPECS[name].builder(spark, sf_dir))
    assert "EvalPython" not in plan, plan


def test_range_join_is_hash_join_not_nested_loop(spark, sf_dir):
    """q_range_join's bin bucketing must restore an equi-key: the plan
    may contain no nested-loop/cartesian join (the default physical
    strategy for a pure range predicate), only a hash join on `bin`."""
    df = SPECS["q_range_join"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert pi.broadcast_join_count(df) >= 1, plan


def test_skew_join_salted_takes_shuffle_path(spark, sf_dir):
    """q_skew_join_salted forces the shuffled-hash path so the salted
    key shape is exercised (a broadcast would make salt a no-op)."""
    df = SPECS["q_skew_join_salted"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "ShuffledHashJoin" in plan, plan


def test_kmv_topk_is_take_ordered(spark, sf_dir):
    """The KMV sketch's k smallest hashes come from TakeOrdered
    (per-partition heaps + driver merge of #partitions·k values), never
    a global sort."""
    df = SPECS["q_kmv_distinct"].builder(spark, sf_dir)
    assert pi.has_take_ordered(df), pi.executed_plan(df)


def test_hash_sample_filter_is_scan_local(spark, sf_dir):
    """Hash sampling must be a codegen'd filter over the scan — the only
    shuffle in the query is the final per-source aggregate."""
    df = SPECS["q_hash_sample"].builder(spark, sf_dir)
    assert pi.shuffle_count(df) <= 1, pi.executed_plan(df)
    assert "EvalPython" not in pi.executed_plan(df)


def test_map_only_text_ops_no_shuffle(spark, sf_dir):
    """q_repetition and q_pii_scrub are per-row projections — zero
    exchanges; corpus-size-independent map stages at any scale."""
    for name in ("q_repetition", "q_pii_scrub"):
        df = SPECS[name].builder(spark, sf_dir)
        assert pi.shuffle_count(df) == 0, (name, pi.executed_plan(df))


def test_contamination_eval_side_broadcasts(spark, sf_dir):
    """The eval split (benchmarks are MBs, corpora TBs) must broadcast
    into the training-side shingle stream — no shuffle of the big side
    for the join itself."""
    df = SPECS["q_contamination"].builder(spark, sf_dir)
    assert pi.broadcast_join_count(df) >= 1, pi.executed_plan(df)
    assert pi.sort_merge_join_count(df) == 0


def test_pack_sequences_single_window_shuffle(spark, sf_dir):
    """Sharded packing = one exchange on the shard key; a global (empty
    partition-by) window would show as an exchange to a single
    partition."""
    df = SPECS["q_pack_sequences"].builder(spark, sf_dir)
    assert pi.shuffle_count(df) == 1, pi.executed_plan(df)
    assert "SinglePartition" not in pi.executed_plan(df)


def test_minhash_vec_is_arrow_not_row_python(spark, sf_dir):
    """The vectorized minhash kernel must run as an Arrow-batched python
    stage (mapInPandas), never row-at-a-time BatchEvalPython. The full
    query checkpoints the band table (so its final plan starts from the
    cached RDD); the gate inspects the kernel stage itself."""
    from duckdb_pst_spark.operators.dedup import _minhash_band_kernel
    from duckdb_pst_spark.tables import table

    bands = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(_minhash_band_kernel, "doc_id long, band_idx int, band_val long")
    )
    plan = pi.executed_plan(bands)
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # and the full query's band table must come from that cached kernel
    # output, not a re-planned row-python stage
    full = pi.executed_plan(SPECS["q_dedup_minhash_vec"].builder(spark, sf_dir))
    assert "BatchEvalPython" not in full, full


def test_doc_chunk_is_map_only_generator(spark, sf_dir):
    """q_doc_chunk (sliding-window chunking) must stay a zero-shuffle
    generator projection: sequence+explode in codegen, output
    partitioning inherited from the scan, pruned to (doc_id, text)."""
    df = SPECS["q_doc_chunk"].builder(spark, sf_dir)
    assert pi.shuffle_count(df) == 0, pi.executed_plan(df)
    schemas = pi.read_schemas(df)
    assert schemas and "n_chars" not in schemas[0] and "source" not in schemas[0]


def test_vocab_df_shape(spark, sf_dir):
    """q_vocab_df: exactly ONE shuffle (the vocab-keyed count over
    per-doc-distinct tokens — r4 removed the pair-distinct exchange, r7
    moved the whole plan JVM-side: split + array_distinct in codegen,
    map-side-combined hash agg) and a TakeOrdered heap for the top-50 —
    never a global sort."""
    df = SPECS["q_vocab_df"].builder(spark, sf_dir)
    assert pi.shuffle_count(df) == 1, pi.executed_plan(df)
    assert pi.has_take_ordered(df), pi.executed_plan(df)


def test_gapfill_grid_is_dimension_only(spark, sf_dir):
    """q_gapfill_locf: the fill grid is built from broadcast-small
    dimension sides — at least one broadcast join, no sort-merge join,
    and the severity filter reaches the scan."""
    df = SPECS["q_gapfill_locf"].builder(spark, sf_dir)
    assert pi.broadcast_join_count(df) >= 1, pi.executed_plan(df)
    assert pi.sort_merge_join_count(df) == 0, pi.executed_plan(df)
    assert any("value" in p for p in pi.pushed_filters(df)), pi.pushed_filters(df)


def test_aqe_splits_skewed_join(spark):
    """The 100 TB skew story must be real: a join where half the fact
    rows share one key gets its oversized partition SPLIT by AQE's
    skew-join handling (skew=true in the final SMJ), not serialized
    through one task. Thresholds are lowered so the ~MB-scale test data
    crosses AQE's skew detection bars."""
    from pyspark.sql import functions as F

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # The payload must SURVIVE column pruning into the shuffle and be
        # incompressible, or the "skewed" partition is just 300k copies
        # of one 8-byte key that compress to nothing and never cross the
        # detection threshold (AQE measures compressed shuffle sizes).
        fact = spark.range(600_000).select(
            F.when(F.col("id") < 300_000, F.lit(7)).otherwise(F.col("id") % 997).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(1000).select(F.col("id").alias("k"), F.lit("d").alias("tag"))
        j = fact.join(dim, "k").select(
            F.max("payload").alias("mx"), F.count(F.lit(1)).alias("n")
        )
        j.collect()  # execute THIS Dataset so its AQE plan is final
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_prune_filters_fact_before_shuffle(spark, sf_dir):
    """q_bloom_prune's bitmap test must actually prune: the bloom
    prefilter alone keeps ~the BUILDING fraction of orders (1/5 of
    segments) plus a tiny false-positive tail, and never loses a true
    match (no false negatives by construction). The exact semi-join
    downstream stays on the shuffle path so the pruning is load-bearing,
    not cosmetic."""
    from duckdb_pst_spark.operators.join_strategies import q_bloom_prune

    df = q_bloom_prune(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "ShuffledHashJoin" in plan, plan

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    total = o.count()
    exact = (
        o.join(
            c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
            o.o_custkey == F.col("c_custkey"),
            "left_semi",
        ).count()
    )
    kept = sum(r["n_orders"] for r in df.collect())
    assert kept == exact  # oracle-grade: bloom+semi == plain semi
    assert exact < total  # the gate actually has something to prune


def test_job_progress_reports_task_completion(spark, sf_dir):
    """A19: JobProgress observes a query's task progress via the public
    StatusTracker — final snapshot is 100% with a real task denominator,
    and the scope doesn't leak a job group into later queries."""
    from duckdb_pst_spark.plans.progress import JobProgress

    with JobProgress(spark) as p:
        table(spark, sf_dir, "lineitem").repartition(16, "l_orderkey").count()
    last = p.samples[-1]
    assert last.total_tasks >= 16, last
    assert last.completed_tasks == last.total_tasks, last
    assert p.pct() == 100.0
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") is None


def test_pipeline_stage_counts_ride_one_execution(spark, sf_dir):
    """pipeline_stage_counts returns the per-stage yield report via
    Dataset.observe — counts are monotone non-increasing along the
    chain and agree with the pipeline's own final output, all from one
    execution (no per-stage re-runs)."""
    from duckdb_pst_spark.operators.pipeline import (
        pipeline_stage_counts,
        q_pipeline_pretrain,
    )

    counts = pipeline_stage_counts(spark, sf_dir)
    order = ["gated", "train_split", "decontaminated", "exact_deduped", "survivors"]
    assert list(counts) == order
    for a, b in zip(order, order[1:]):
        assert counts[a] >= counts[b], counts
    total = sum(
        r["n_docs"] for r in q_pipeline_pretrain(spark, sf_dir).collect()
    )
    assert counts["survivors"] == total


def test_tpch_q19_disjunction_pushes_to_both_scans(spark, sf_dir):
    """Q19's OR-of-ANDs must not evaluate post-join only: the covering
    quantity ranges push into the lineitem scan and the brand/size
    branches into the part scan, with one broadcast join and a single
    (aggregate) shuffle."""
    import re

    df = SPECS["q_tpch_q19"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    pushed = re.findall(r"PushedFilters: \[[^\]]*", plan)
    assert any("l_quantity" in x for x in pushed), pushed
    assert any("p_brand" in x for x in pushed), pushed
    assert pi.broadcast_join_count(df) == 1
    assert pi.shuffle_count(df) == 1


def test_bigram_surprise_broadcast_lm(spark, sf_dir):
    """The r4 rewrite's contract: the pruned sample-trained LM joins by
    BROADCAST into the scoring scan, and the only groupBy-keyed
    exchanges are the sample LM build + the per-doc aggregate — never a
    corpus-wide bigram-keyed shuffle (r3's plan: 16.2 s vs 7.8 s at
    100×)."""
    df = SPECS["q_bigram_surprise"].builder(spark, sf_dir)
    assert pi.broadcast_join_count(df) >= 1, pi.executed_plan(df)
    assert pi.shuffle_count(df) <= 2, pi.executed_plan(df)
    assert pi.has_take_ordered(df)


def test_substring_spans_single_shingle_window(spark, sf_dir):
    """The r4 fusion: cross-doc duplication detection is one window over
    the shingle (min/max doc_id), not groupBy + self-join — so the plan
    holds exactly two keyed exchanges (shingle window, per-doc window)
    and NO join."""
    df = SPECS["q_substring_spans"].builder(spark, sf_dir)
    assert pi.shuffle_count(df) <= 2, pi.executed_plan(df)
    assert pi.broadcast_join_count(df) == 0
    assert pi.sort_merge_join_count(df) == 0


def test_heavy_hitters_sketch_is_arrow_on_hashes(spark, sf_dir):
    """The r4 sketch contract: the Misra-Gries pass runs over xxhash64
    int64 keys (no token strings enter Python), via mapInArrow; the
    verify pass semi-joins on the broadcast candidate hash set."""
    df = SPECS["q_heavy_hitters"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "xxhash64" in plan, plan
    assert pi.broadcast_join_count(df) >= 1, plan


def test_profile_columns_has_no_expand(spark, sf_dir):
    """q_profile_columns must stay per-column pruned branches: an Expand
    node means the wide multi-COUNT(DISTINCT) aggregate came back (7x
    the row volume through aggregation state — measured 12x slower at
    100x). Each branch's read schema must hold exactly one column."""
    df = SPECS["q_profile_columns"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "Expand" not in plan, plan
    schemas = pi.read_schemas(df)
    assert schemas and all(s.count(",") == 0 for s in schemas), schemas


def test_char_diversity_kernel_is_scan_local(spark, sf_dir):
    """q_char_diversity's histogram is an Arrow kernel directly over the
    (possibly spread) scan — no keyed exchange: at most the spread
    round-robin repartition, never a hash partitioning."""
    df = SPECS["q_char_diversity"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan or "mapInArrow" in plan, plan
    assert "hashpartitioning" not in plan, plan


def test_simhash_prod_sigs_are_arrow_kernel(spark, sf_dir):
    """q_dedup_simhash_prod's signature stage must stay the numpy
    prefix-scan kernel (45.3 -> 9.2 s at 100x vs the 60 interpreted
    conditional folds per token)."""
    df = SPECS["q_dedup_simhash_prod"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    # the kernel materializes via localCheckpoint, so the visible plan is
    # the block join over a checkpointed scan — no interpreted char fold
    # (the old JVM form's plan is full of ascii(...) lambda expressions)
    assert "ascii(" not in plan.lower(), plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan


def test_dedup_cluster_collapses_before_pair_chain(spark, sf_dir):
    """The component chain must keep the distinct-text collapse: the
    representative semi-join appears before any shingle work (312 -> 6.6
    s at 100x). Detect via the xxhash64(text) grouping in the first
    aggregate."""
    import inspect

    import duckdb_pst_spark.operators.dedup as D

    body = inspect.getsource(D._collapsed_cluster)
    assert "xxhash64" in body and "left_semi" in body


def test_sequence_gaps_no_upfront_distinct(spark, sf_dir):
    """The id stream must flow straight into the bucketed lag window: a
    duplicate id lags to diff 0 and the `> 1` hole filter drops it, so
    an up-front DISTINCT is a pure extra corpus exchange (same-session
    100x A/B: 22.7 s with it, 9.0 s without). The checkpoint hides the
    upstream plan, so gate at the source level like the cluster gate."""
    import duckdb_pst_spark.operators.relational as R

    code = _fn_code(R.q_sequence_gaps)
    assert ".distinct()" not in code and "dropDuplicates" not in code, code


def test_dedup_incremental_fused_text_aggregate(spark, sf_dir):
    """Incremental dedup must keep the round-5 fusion: ONE text-keyed
    aggregate carries both sides' min doc (c_doc/b_doc), the exact gate
    is a null test on it, and the side tag rides through the signature
    kernel (`carry`) so bands split with map-side filters instead of two
    doc_id join-backs (same-session 100x A/B: 5.3 s -> 3.4 s)."""
    import duckdb_pst_spark.operators.dedup as D

    code = _fn_code(D.q_dedup_incremental)
    assert code.count('groupBy("text")') == 1, code
    assert 'carry=("is_c",)' in code, code


def test_chi2_one_exchange(spark, sf_dir):
    """q_chi2_terms: within-doc presence dedup is scan-local
    (array_distinct) and the label rides the source row, so the plan
    has exactly ONE corpus-keyed shuffle (the vocab contingency
    aggregate; the only other exchange is the SinglePartition hop of
    the 1-row broadcast totals) and a TakeOrdered heap (Zipf-100× A/B:
    4.14 → 1.83 s). The old plan's (doc, tok) DISTINCT exchange and
    doc_id label join must stay gone."""
    df = SPECS["q_chi2_terms"].builder(spark, sf_dir)
    assert pi.shuffle_count(df) <= 2, pi.executed_plan(df)
    assert pi.has_take_ordered(df), pi.executed_plan(df)
    plan = pi.executed_plan(df)
    assert "array_distinct" in plan, plan
    assert pi.sort_merge_join_count(df) == 0, plan


def test_dsir_feat_checkpointed(spark, sf_dir):
    """_dsir_scored: the (doc_id, lang, b) feature triple must stay
    checkpoint-materialized — both consumers (bucket table + scoring
    join) would otherwise re-run the interpreted per-character
    poly-hash over every bigram instance (Zipf-100× A/B: 27.3 → 9.1 s).
    The checkpoint hides upstream plan nodes, so gate at source level."""
    import duckdb_pst_spark.operators.text as T

    code = _fn_code(T._dsir_scored)
    assert "localCheckpoint" in code, code


def test_winnowing_scan_local(spark, sf_dir):
    """q_winnowing: the whole selection is per-document, so the plan is
    ONE scan-local Arrow stage — zero exchanges, no window operator, no
    distinct (Zipf-100× A/B: 30.4 → 8.2 s over the JVM window plan)."""
    df = SPECS["q_winnowing"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert pi.shuffle_count(df) == 0, plan
    assert "Window" not in plan, plan


def test_keep_best_kernel_one_exchange(spark, sf_dir):
    """q_dedup_keep_best: signatures from the scan-local numpy poly-hash
    kernel with n_chars riding the source row — NO join anywhere, one
    sig_key exchange for the window rank (Zipf-100× A/B: 36.4 → 7.3 s,
    now faster than the embedded comparator)."""
    df = SPECS["q_dedup_keep_best"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert pi.shuffle_count(df) == 1, plan
    assert "Join" not in plan, plan


def test_split_leakfree_one_exchange(spark, sf_dir):
    """q_split_leakfree: ONE text-keyed exchange (the window's
    partitioning — the same exchange exact dedup pays) and no join; the
    split predicate is per-row arithmetic on rep_id."""
    df = SPECS["q_split_leakfree"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert pi.shuffle_count(df) == 1, plan
    assert "Join" not in plan, plan


def test_oov_vocab_is_broadcast(spark, sf_dir):
    """q_oov_rate: the vocabulary joins the token stream as a BROADCAST
    (vocab ≪ corpus at any scale) — a shuffled vocab join would move
    the whole exploded corpus on token strings."""
    df = SPECS["q_oov_rate"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert pi.broadcast_join_count(df) >= 1, plan
    assert pi.shuffle_count(df) <= 4, plan


def test_ngram_novelty_no_corpus_joinback(spark, sf_dir):
    """q_ngram_novelty: per-doc novel counts come from grouping the
    first-occurrence table by its min-doc, NOT from joining it back to
    the corpus-sized trigram stream (Zipf-100× A/B: 8.3 → 3.0 s). Three
    map-side-combined exchanges; the only join is doc-cardinality."""
    df = SPECS["q_ngram_novelty"].builder(spark, sf_dir)
    assert pi.shuffle_count(df) <= 3, pi.executed_plan(df)


def test_triangle_adjacency_intersect(spark, sf_dir):
    """q_triangle_count: edge-iterator triangles over degree-ORIENTED
    out-adjacency arrays — per-edge array_intersect, never a
    materialized wedge set through an exchange (x10 interleaved
    min-of-3: wedge-semi-join 72.8 s vs 23.2 s, identical counts)."""
    df = SPECS["q_triangle_count"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "array_intersect" in plan, plan
    assert pi.shuffle_count(df) <= 7, plan


def test_triangle_pte_shape(spark, sf_dir):
    """q_triangle_count_pte (r7): the bucket-triple table joins as a
    BROADCAST (never a shuffle of the edge side), the local counting
    runs in ONE FlatMapGroupsInPandas kernel over per-(triple, source)
    adjacency ARRAYS (sort_array pre-grouping — never raw edge rows
    through the 256-row Arrow cap), and no O(m^1.5) wedge set or
    per-edge neighbor-array join appears: the only Python stage is the
    grouped kernel."""
    df = SPECS["q_triangle_count_pte"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert "array_intersect" not in plan, plan
    assert pi.shuffle_count(df) <= 9, plan


def test_ivfpq_codebook_broadcast(spark, sf_dir):
    """q_knn_ivfpq: centroids, codebook, and the ADC lookup table are
    broadcasts; only list-sized aggregates shuffle. A shuffled codebook
    join would exchange the corpus per subspace."""
    df = SPECS["q_knn_ivfpq"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert pi.broadcast_join_count(df) >= 3, plan
    # probe rank, encode argmin, ADC partial sum, final rank + AQE
    # session variation — all skinny (list-sized or |Q|-sized) exchanges
    assert pi.shuffle_count(df) <= 7, plan


def test_degree_distribution_one_exchange_mapside_dedup(spark, sf_dir):
    """q_degree_distribution: ONE corpus exchange (r7 — the collect_set
    partial aggregate dedups duplicate (u, v) instances map-side, so
    the wire carries per-partition-distinct neighbor sets; the r5
    repartition(u) plan shipped every duplicate instance), plus the
    tiny bucket-rollup exchange."""
    df = SPECS["q_degree_distribution"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert pi.shuffle_count(df) == 2, plan
    assert "partial_collect_set" in plan, plan


def test_tpch_q10_pushdown_and_takeordered(spark, sf_dir):
    """q_tpch_q10: the returnflag filter reaches the lineitem scan, the
    order-date range runs before any join (pushed or codegen'd scan-side
    Filter — the ts loader cast keeps it out of PushedFilters), and the
    top-20 is a TakeOrdered heap — never a global sort of the grouped
    output."""
    df = SPECS["q_tpch_q10"].builder(spark, sf_dir)
    pushed = pi.pushed_filters(df)
    assert any("l_returnflag" in p for p in pushed), pushed
    plan = pi.executed_plan(df)
    assert any(
        "Filter" in line and "o_orderdate" in line for line in plan.splitlines()
    ), plan
    assert pi.has_take_ordered(df), plan


def test_group_topk_window_is_partitioned(spark, sf_dir):
    """q_group_topk_freq: the rank window runs over the AGGREGATED
    (lang, tok) table partitioned by lang — the plan must contain no
    unpartitioned window (a corpus-sized single-task sort)."""
    df = SPECS["q_group_topk_freq"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    # the window's required distribution is hash(lang); an unpartitioned
    # window would demand a SinglePartition exchange instead
    assert "hashpartitioning(lang" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_band_stats_no_pair_materialization(spark, sf_dir):
    """q_minhash_band_stats: candidate-pair counts are ARITHMETIC on
    bucket sizes — the plan may contain no self-join of the bands table
    (the production band join this table prices must not run here)."""
    df = SPECS["q_minhash_band_stats"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    # the checkpointed signature set is read ONCE (the exploded band
    # array) — the 4-way per-band union read it once per band
    assert plan.count("Scan ExistingRDD") == 1, plan


def test_group_topk_windowgrouplimit_fires(spark, sf_dir):
    """q_group_topk_freq: Catalyst's WindowGroupLimit (rank-filter
    pushdown) must fire on the rk<=3 filter, in BOTH modes — Partial
    (per-task top-k heaps run before the lang exchange, so only <=3k
    rows per task per group cross it) and Final. Without it the window
    sorts and ranks the full vocab-sized aggregate per group."""
    df = SPECS["q_group_topk_freq"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan and "Final" in plan, plan


def test_tpch_q4_semi_join_with_date_pushdown(spark, sf_dir):
    """q_tpch_q4: the EXISTS compiles to a left-semi join (no join
    payload ever materializes) and the quarter window prunes orders
    scan-side (pushed or codegen'd scan-side Filter — the ts loader
    cast keeps it out of PushedFilters)."""
    df = SPECS["q_tpch_q4"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "LeftSemi" in plan, plan
    assert any(
        "Filter" in line and "o_orderdate" in line for line in plan.splitlines()
    ), plan


def test_tpch_q12_skinny_join_columns(spark, sf_dir):
    """q_tpch_q12: the fact scan reads ONLY the two join/group columns
    plus the pushed date column — the CASE split must not drag wide
    columns through the orderkey exchange."""
    df = SPECS["q_tpch_q12"].builder(spark, sf_dir)
    schemas = pi.read_schemas(df)
    li = [s for s in schemas if "l_orderkey" in s]
    assert li and all(
        "l_extendedprice" not in s and "l_quantity" not in s for s in li
    ), schemas


def test_tpch_q14_prunes_fact_scan(spark, sf_dir):
    """q_tpch_q14: lineitem reads exactly the 4 needed columns
    (partkey, price, discount + the pushed shipdate)."""
    df = SPECS["q_tpch_q14"].builder(spark, sf_dir)
    schemas = pi.read_schemas(df)
    li = [s for s in schemas if "l_partkey" in s]
    assert li and all(
        "l_orderkey" not in s and "l_returnflag" not in s for s in li
    ), schemas


def test_join_key_skew_no_join_of_fact(spark, sf_dir):
    """q_join_key_skew: the audit is ONE key-keyed aggregate plus a
    1-row broadcast total — no sort-merge join of anything
    fact-sized, and the scan reads only the key column."""
    df = SPECS["q_join_key_skew"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "SortMergeJoin" not in plan, plan
    schemas = pi.read_schemas(df)
    assert any("l_orderkey" in s and "l_partkey" not in s for s in schemas), schemas


def test_char_class_profile_scan_local(spark, sf_dir):
    """q_char_class_profile: class counts are codegen'd length/regex
    expressions — no Python stage, and the only exchange is the
    ≤|sources|-group rollup."""
    df = SPECS["q_char_class_profile"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "EvalPython" not in plan and "MapInPandas" not in plan, plan
    assert pi.shuffle_count(df) == 1, plan


def test_tpch_q17_reuses_filtered_fact_exchange(spark, sf_dir):
    """q_tpch_q17: the per-part aggregate and the probe side both
    partition the SAME brand-filtered broadcast-join subtree by
    partkey — Catalyst must reuse that exchange (one fact exchange of
    filtered lines), and the part side must broadcast."""
    df = SPECS["q_tpch_q17"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "ReusedExchange" in plan, plan
    assert pi.broadcast_join_count(df) >= 1, plan


def test_tpch_q15_scalar_max_broadcast(spark, sf_dir):
    """q_tpch_q15: the revenue view materializes once (checkpoint) and
    the scalar max joins back as a 1-row broadcast — no sort-merge
    join of anything fact-sized."""
    df = SPECS["q_tpch_q15"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert plan.count("Scan ExistingRDD") >= 1, plan


def test_tpch_q7_nation_pair_prunes_before_fact_join(spark, sf_dir):
    """q_tpch_q7: the two-nation filter reaches the supplier and
    customer sides as broadcast joins (no fact-sized nation attach),
    and the ship-date window filters the lineitem scan."""
    df = SPECS["q_tpch_q7"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert pi.broadcast_join_count(df) >= 3, plan  # n->s, n->c, s->li
    assert any(
        "l_shipdate" in f for f in pi.pushed_filters(df)
    ) or any(
        "Filter" in line and "l_shipdate" in line for line in plan.splitlines()
    ), plan


def test_tpch_q8_part_filter_broadcasts_into_fact(spark, sf_dir):
    """q_tpch_q8: the p_type filter (the most selective predicate)
    broadcasts into lineitem, and no wide money columns survive past
    the aggregate's input."""
    df = SPECS["q_tpch_q8"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert pi.broadcast_join_count(df) >= 4, plan  # p, s(+n1), r->n2->c chain
    assert any(
        "Filter" in line and "p_type" in line for line in plan.splitlines()
    ) or any("p_type" in f for f in pi.pushed_filters(df)), plan


def test_tpch_q9_reads_only_needed_lineitem_columns(spark, sf_dir):
    """q_tpch_q9: the lineitem scan must not read l_shipdate /
    l_returnflag etc — only the 6 columns the profit expression and
    joins need."""
    df = SPECS["q_tpch_q9"].builder(spark, sf_dir)
    schemas = pi.read_schemas(df)
    li = [s for s in schemas if "l_partkey" in s and "l_orderkey" in s]
    assert li and all(
        "l_shipdate" not in s and "l_returnflag" not in s for s in li
    ), schemas


def test_tpch_q2_offers_aggregate_sees_only_matching_parts(spark, sf_dir):
    """q_tpch_q2: both LEFT SEMI prunes (part spec, EU suppliers) sit
    BELOW the (partkey, suppkey) offers aggregate, so the exchange
    carries only candidate lines; the correlated min decorrelates to a
    broadcast join-back (no sort-merge join anywhere)."""
    df = SPECS["q_tpch_q2"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert plan.count("LeftSemi") >= 2, plan
    assert pi.sort_merge_join_count(df) == 0, plan
    assert pi.has_take_ordered(df), plan


def test_tpch_q11_single_fact_exchange(spark, sf_dir):
    """q_tpch_q11: the region's supplier keys broadcast-semi into the
    fact BEFORE the partkey aggregate; the scalar total is a 1-row
    broadcast (crossJoin of an aggregate), not a second fact pass."""
    df = SPECS["q_tpch_q11"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    # the value view checkpoints (like q_tpch_q15), so the fact pass is
    # below the ExistingRDD boundary; assert the view is read from the
    # checkpoint and the scalar threshold attaches as a broadcast
    assert plan.count("Scan ExistingRDD") >= 1, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # the semi prune lives in the checkpointed fragment — assert it in
    # the builder source instead (the _fn_code gate style)
    code = _fn_code(SPECS["q_tpch_q11"].builder)
    assert '"left_semi"' in code or "'left_semi'" in code, code


def test_tpch_q16_anti_join_and_two_phase_distinct(spark, sf_dir):
    """q_tpch_q16: the blacklist is LEFT ANTI (null-robust NOT IN) and
    the count-distinct runs as the two-phase partial/final aggregate —
    exactly one exchange on the group keys."""
    df = SPECS["q_tpch_q16"].builder(spark, sf_dir)
    # the blacklist can be EMPTY at smoke scale, and AQE then eliminates
    # the anti join outright — assert the shape on the pre-AQE plan
    plan = pi.formatted_plan(df)
    assert "LeftAnti" in plan, plan
    # (group+suppkey) dedup exchange, group exchange, final sort — the
    # canonical two-phase distinct; anything more means a join leaked
    # fact-sized rows above the aggregate
    assert pi.shuffle_count(df) <= 3, plan


def test_tpch_q20_nested_semis_never_materialize_payload(spark, sf_dir):
    """q_tpch_q20: the three-level IN chain compiles to two LEFT SEMI
    joins (part names into the fact, qualifying suppliers into the
    region's suppliers) — no inner join duplicates a fact row."""
    df = SPECS["q_tpch_q20"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert plan.count("LeftSemi") >= 2, plan
    assert any(
        "Filter" in line and "l_shipdate" in line for line in plan.splitlines()
    ) or any("l_shipdate" in f for f in pi.pushed_filters(df)), plan


def test_tpch_q21_one_window_pass_replaces_self_joins(spark, sf_dir):
    """q_tpch_q21: the EXISTS/NOT-EXISTS pair must NOT appear as two
    extra fact self-joins — the plan carries ONE window over the
    orderkey partitioning and at most the orders join on the fact
    side (collect_set appears in the window, bounded per order)."""
    df = SPECS["q_tpch_q21"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "Window" in plan and "collect_set" in plan, plan
    assert pi.sort_merge_join_count(df) <= 1, plan  # li⋈o only


def test_tpch_q22_anti_probe_is_windowed(spark, sf_dir):
    """q_tpch_q22: the lapsed test anti-joins against the date-windowed
    orders scan (the window filters the probe side), and the
    above-mean threshold is a 1-row broadcast."""
    df = SPECS["q_tpch_q22"].builder(spark, sf_dir)
    plan = pi.executed_plan(df)
    assert "LeftAnti" in plan, plan
    assert any(
        "Filter" in line and "o_orderdate" in line for line in plan.splitlines()
    ) or any("o_orderdate" in f for f in pi.pushed_filters(df)), plan


def test_partition_pruning_prunes_directories(spark, sf_dir, tmp_path):
    """q_partition_pruning's contract: a predicate on the partitioning
    column becomes a PLANNING-time PartitionFilter — non-matching lang
    directories are never opened (selected partition count < total).
    Replicates the builder's lake inline because the registered query
    checkpoints its result and removes the temp lake."""
    from duckdb_pst_spark.tables import table as t

    lake = str(tmp_path / "lake")
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    d.write.partitionBy("lang").mode("overwrite").parquet(lake)
    langs_total = d.select("lang").distinct().count()
    scan = spark.read.parquet(lake).filter(F.col("lang").isin("en", "de"))
    plan = pi.formatted_plan(scan)
    assert "PartitionFilters" in plan and "lang" in plan, plan
    got_langs = {r.lang for r in scan.select("lang").distinct().collect()}
    assert got_langs == {"en", "de"}
    assert langs_total > 2, "fixture must have more langs than the filter keeps"
