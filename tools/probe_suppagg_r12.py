import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from duckdb_pst_spark.session import get_spark
from duckdb_pst_spark.registry import load_all
from duckdb_pst_spark.tables import table

corpus = sys.argv[1]
bcast_off = len(sys.argv) > 2 and sys.argv[2] == 'off'
spark = get_spark("probe-suppagg"); spark.sparkContext.setLogLevel("ERROR")
if bcast_off:
    # disable planner+AQE size-based broadcasts; explicit F.broadcast hints
    # (fixed-cardinality nation/region chains) still apply
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

S = load_all()

def new_q9(spark, sf_dir):
    p = (table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
         .select("p_partkey", "p_retailprice"))
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    s = (table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("sn_key"))
         .select("s_suppkey", "nation"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
    amount_c = (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
                - F.floor(F.col("p_retailprice") * 100).cast("long")
                * F.floor(F.col("l_quantity")).cast("long"))
    part_agg = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_suppkey", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(amount_c).alias("amt_part"))
    )
    return (part_agg.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amt_part").cast("long").alias("sum_profit_c"))
        .orderBy("nation", F.col("o_year").desc()))

def new_q8(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    s = (table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
         .select("s_suppkey", "supp_nation"))
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = table(spark, sf_dir, "nation").join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    c = (table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
         .join(F.broadcast(n2.select("n_nationkey")), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey"))
    o = (table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
         .select("o_orderkey", "o_custkey", "o_orderdate")
         .join(c, F.col("o_custkey") == F.col("c_custkey"))
         .select("o_orderkey", "o_orderdate"))
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    rev_c = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    part_agg = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_suppkey", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(rev_c).alias("rev_part"))
    )
    j = part_agg.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("rev_part")).otherwise(0)
    return (j.groupBy("o_year")
        .agg(F.sum(nat).cast("long").alias("nation_rev_c"),
             F.sum("rev_part").cast("long").alias("total_rev_c"),
             F.expr("CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' "
                    "THEN rev_part ELSE 0 END) AS DECIMAL(38,0)) * 1000000"
                    " div sum(rev_part) AS BIGINT)").alias("mkt_share_ppm"))
        .orderBy("o_year"))

def new_q5(spark, sf_dir):
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    c = table(spark, sf_dir, "customer").join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    oc = o.join(c, F.col("o_custkey") == F.col("c_custkey"))
    rev = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    part_agg = (
        li.join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_suppkey", "c_nationkey", "n_name")
        .agg(F.sum(rev).alias("rev_part"))
    )
    return (part_agg.join(
            s, (F.col("l_suppkey") == F.col("s_suppkey"))
               & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(F.sum("rev_part").cast("long").alias("revenue_c"))
        .orderBy(F.desc("revenue_c"), F.asc("n_name")))

def new_q7(spark, sf_dir):
    pair = ["NATION_3", "NATION_8"]
    n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    s = (table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
         .join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                                    F.col("n_name").alias("supp_nation"))),
               F.col("s_nationkey") == F.col("sn_key"))
         .select("s_suppkey", "supp_nation"))
    c = (table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
         .join(F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"),
                                    F.col("n_name").alias("cust_nation"))),
               F.col("c_nationkey") == F.col("cn_key"))
         .select("c_custkey", "cust_nation"))
    o = (table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
         .join(c, F.col("o_custkey") == F.col("c_custkey"))
         .select("o_orderkey", "cust_nation"))
    li = (table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
          .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"))
    rev_c = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    part_agg = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_suppkey", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(rev_c).alias("rev_part"))
    )
    return (part_agg.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_part").cast("long").alias("revenue_c"))
        .orderBy("supp_nation", "cust_nation", "l_year"))

CAND = {"q_tpch_q9": new_q9, "q_tpch_q8": new_q8, "q_tpch_q5": new_q5, "q_tpch_q7": new_q7}

def run(b):
    t0 = time.perf_counter()
    b(spark, corpus).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0

for name, cand in CAND.items():
    old_b = S[name].builder
    o = [tuple(r) for r in old_b(spark, corpus).collect()]
    nw = [tuple(r) for r in cand(spark, corpus).collect()]
    assert o == nw, f"{name} results differ"
for name, cand in CAND.items():
    old_b = S[name].builder
    run(old_b); run(cand)
    to = tn = float('inf')
    for _ in range(3):
        to = min(to, run(old_b)); tn = min(tn, run(cand))
    print(f"{name} @ {corpus} bcast_off={bcast_off}: old {to:.3f} -> new {tn:.3f} ({tn/to:.2f}x)")
spark.stop()
