import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from duckdb_pst_spark.session import get_spark
from duckdb_pst_spark.registry import load_all

corpus = sys.argv[1]
spark = get_spark("probe-infer"); spark.sparkContext.setLogLevel("ERROR")
S = load_all()
RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

def run(name, excl):
    spark.conf.set("spark.sql.optimizer.excludedRules", RULE if excl else "")
    b = S[name].builder
    t0 = time.perf_counter()
    b(spark, corpus).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0

for name in ["q_bpe_pairs", "q_explode_agg", "q_oov_rate", "q_phrase_pmi"]:
    # pin results equal
    spark.conf.set("spark.sql.optimizer.excludedRules", "")
    a = sorted(tuple(r) for r in S[name].builder(spark, corpus).collect())
    spark.conf.set("spark.sql.optimizer.excludedRules", RULE)
    b = sorted(tuple(r) for r in S[name].builder(spark, corpus).collect())
    assert a == b, name
    run(name, False); run(name, True)
    to = tn = float('inf')
    for _ in range(3):
        to = min(to, run(name, False)); tn = min(tn, run(name, True))
    print(f"{name} @ {corpus}: with-infer {to:.3f} -> excluded {tn:.3f} ({tn/to:.2f}x)")
spark.stop()
