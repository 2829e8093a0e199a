import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from duckdb_pst_spark.session import get_spark, free_checkpoints
from duckdb_pst_spark.registry import load_all
from duckdb_pst_spark.tables import table
from duckdb_pst_spark.functions.portable import poly_hash_long
from duckdb_pst_spark.operators.dedup import (
    _INCR_MOD, _INCR_CORPUS, _band_cols, signatures_for, JACCARD_THRESHOLD_U)

corpus = sys.argv[1]
spark = get_spark("probe-incr"); spark.sparkContext.setLogLevel("ERROR")

def build(variant):
    docs = table(spark, corpus, "documents")
    in_corpus = poly_hash_long(F.col("doc_id")) % _INCR_MOD < _INCR_CORPUS
    role = docs.select("doc_id", "text", in_corpus.alias("in_corpus"))
    per_text = (
        role.groupBy("text")
        .agg(F.min(F.when(F.col("in_corpus"), F.col("doc_id"))).alias("c_doc"),
             F.min(F.when(~F.col("in_corpus"), F.col("doc_id"))).alias("b_doc"))
        .localCheckpoint(eager=(variant != 'lazy'))
    )
    sig_in = (
        per_text.where(F.col("c_doc").isNotNull())
        .select(F.col("c_doc").alias("doc_id"), "text", F.lit(True).alias("is_c"))
        .unionByName(
            per_text.where(F.col("c_doc").isNull() & F.col("b_doc").isNotNull()).select(
                F.col("b_doc").alias("doc_id"), "text", F.lit(False).alias("is_c")))
    )
    sigs = signatures_for(sig_in, carry=("is_c",))
    bands = sigs.select("doc_id", "is_c",
        F.posexplode(F.array(*_band_cols())).alias("band_idx", "band_val"))
    b_bands = bands.where(~F.col("is_c")).select(
        F.col("doc_id").alias("bid"), "band_idx", "band_val")
    c_bands = bands.where(F.col("is_c")).select(
        F.col("doc_id").alias("cid"), "band_idx", "band_val")
    cand_p = b_bands.join(c_bands, ["band_idx", "band_val"]).select("bid", "cid").distinct()
    sh = sigs.select("doc_id", "sh")
    jacc = F.expr("(CAST(size(array_intersect(sa_sh, sb_sh)) AS BIGINT) * 1000000)"
                  " div size(array_union(sa_sh, sb_sh))")
    near_rep = (
        cand_p.join(sh.select(F.col("doc_id").alias("bid"), F.col("sh").alias("sa_sh")), "bid")
        .join(sh.select(F.col("doc_id").alias("cid"), F.col("sh").alias("sb_sh")), "cid")
        .where(jacc >= JACCARD_THRESHOLD_U)
        .select("bid").distinct()
        .select(F.col("bid"), F.lit(1).alias("is_near")))
    if variant == 'hashjoin':
        pt = per_text.select(
            F.xxhash64("text").alias("_t1"), F.xxhash64(F.lit(1), "text").alias("_t2"),
            "c_doc", "b_doc")
        return (
            role.where(~F.col("in_corpus"))
            .select("doc_id", F.xxhash64("text").alias("_t1"),
                    F.xxhash64(F.lit(1), "text").alias("_t2"))
            .join(pt, ["_t1", "_t2"])
            .select("doc_id", "c_doc", F.col("b_doc").alias("bid"))
            .join(near_rep, "bid", "left")
            .select("doc_id",
                F.when(F.col("c_doc").isNotNull(), "exact_corpus")
                .when(F.col("is_near").isNotNull(), "near_corpus")
                .when(F.col("doc_id") != F.col("bid"), "batch_dup")
                .otherwise("kept").alias("status")))
    return (
        role.where(~F.col("in_corpus"))
        .select("doc_id", "text")
        .join(per_text, "text")
        .select("doc_id", "c_doc", F.col("b_doc").alias("bid"))
        .join(near_rep, "bid", "left")
        .select("doc_id",
            F.when(F.col("c_doc").isNotNull(), "exact_corpus")
            .when(F.col("is_near").isNotNull(), "near_corpus")
            .when(F.col("doc_id") != F.col("bid"), "batch_dup")
            .otherwise("kept").alias("status")))

old_b = load_all()["q_dedup_incremental"].builder
ref = sorted(tuple(r) for r in old_b(spark, corpus).collect())
free_checkpoints(spark)
for v in ['lazy', 'hashjoin']:
    got = sorted(tuple(r) for r in build(v).collect())
    assert got == ref, v
    free_checkpoints(spark)
print("pinned equal", len(ref))
def run(b):
    t0 = time.perf_counter()
    (b(spark, corpus) if callable(b) else build(b)).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    free_checkpoints(spark)
    return dt
run(old_b); run('lazy'); run('hashjoin')
best = {'old': float('inf'), 'lazy': float('inf'), 'hashjoin': float('inf')}
for _ in range(3):
    best['old'] = min(best['old'], run(old_b))
    best['lazy'] = min(best['lazy'], run('lazy'))
    best['hashjoin'] = min(best['hashjoin'], run('hashjoin'))
print({k: round(v,3) for k,v in best.items()})
spark.stop()
