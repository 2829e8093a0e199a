import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import DataFrame, functions as F
from duckdb_pst_spark.session import get_spark, free_checkpoints
from duckdb_pst_spark.registry import load_all
import duckdb_pst_spark.operators.dedup as D

corpus = sys.argv[1]
spark = get_spark("probe-cluster"); spark.sparkContext.setLogLevel("ERROR")

def _min_label_lazy(pairs: DataFrame) -> DataFrame:
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(32):
        msgs = edges.join(labels, edges["u"] == labels["node"]).select(
            edges["v"].alias("node"), "label")
        labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)   # materialized by the sum below
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels

def cand(spark, sf_dir):
    labels = D._collapsed_cluster(spark, sf_dir, _min_label_lazy).select("doc_id", "cluster_id")
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    hist = sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"))
    from duckdb_pst_spark.tables import table
    docs_n = table(spark, sf_dir, "documents").agg(F.count(F.lit(1)).cast("long").alias("total"))
    in_comp = labels.agg(F.count(F.lit(1)).cast("long").alias("clustered"))
    single = (docs_n.crossJoin(in_comp)
        .select(F.lit(1).cast("long").alias("cluster_size"),
                (F.col("total") - F.col("clustered")).cast("long").alias("n_clusters"))
        .where(F.col("n_clusters") > 0))
    return hist.unionByName(single).select(
        "cluster_size", "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"))

old_b = load_all()["q_cluster_size_histogram"].builder
ref = sorted(tuple(r) for r in old_b(spark, corpus).collect()); free_checkpoints(spark)
got = sorted(tuple(r) for r in cand(spark, corpus).collect()); free_checkpoints(spark)
assert ref == got
print("pinned equal", len(ref))
def run(b):
    t0 = time.perf_counter()
    b(spark, corpus).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    free_checkpoints(spark)
    return dt
run(old_b); run(cand)
to = tn = float('inf')
for _ in range(3):
    to = min(to, run(old_b)); tn = min(tn, run(cand))
print(f"cluster_hist @ {corpus}: old {to:.3f} -> lazyfix {tn:.3f} ({tn/to:.2f}x)")
spark.stop()
