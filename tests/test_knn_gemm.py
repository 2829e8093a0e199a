"""The BLAS-path KNN must agree with the oracle-checked exact baseline:
same top-k PAIR SET per query (scores differ only in final float bits
from summation order, which cannot change the set unless two candidates
are ~1e-15 apart — not the case in the synthetic corpus)."""

from __future__ import annotations

from duckdb_pst_spark.registry import load_all


def test_gemm_topk_matches_brute(spark, sf_dir):
    specs = load_all()
    brute = {
        (r.qid, r.cand_id) for r in specs["q_knn_brute"].builder(spark, sf_dir).collect()
    }
    gemm = {
        (r.qid, r.cand_id) for r in specs["q_knn_gemm"].builder(spark, sf_dir).collect()
    }
    assert brute == gemm


def test_gemm_scores_close(spark, sf_dir):
    specs = load_all()
    brute = {
        (r.qid, r.cand_id): r.cos_sim
        for r in specs["q_knn_brute"].builder(spark, sf_dir).collect()
    }
    for r in specs["q_knn_gemm"].builder(spark, sf_dir).collect():
        assert abs(brute[(r.qid, r.cand_id)] - r.cos_sim) < 1e-9


def test_semantic_gemm_pairs_match_exact(spark, sf_dir):
    """The BLAS cluster kernel must find exactly the exact twin's pair
    set; cosines may differ only in the last bits (BLAS accumulation
    order vs sequential fold)."""
    from duckdb_pst_spark.registry import load_all

    specs = load_all()
    exact = {
        (r.cid, r.vec_a, r.vec_b): r.cos_sim
        for r in specs["q_dedup_semantic"].builder(spark, sf_dir).collect()
    }
    fast = {
        (r.cid, r.vec_a, r.vec_b): r.cos_sim
        for r in specs["q_dedup_semantic_gemm"].builder(spark, sf_dir).collect()
    }
    assert set(exact) == set(fast)
    assert all(abs(exact[k] - fast[k]) < 1e-9 for k in exact)


def test_semantic_threshold_margin_on_pinned_corpus():
    """Certificate for the constant-pinned semantic-dedup goldens: the
    kernel's threshold membership test (`S > SEMANTIC_THRESHOLD` in
    _cluster_pairs_kernel) runs on raw BLAS scores, so a pair whose
    exact cosine sat within ~1 ulp of the threshold could flip in/out
    of the pinned VALUES golden on a different BLAS build. Prove the
    class empty on the pinned corpus, assignment-independently: over
    ALL embedding pairs (a superset of every clustering's within-
    cluster pairs), the minimum |cos - SEMANTIC_THRESHOLD| must exceed
    1e-6 — measured 6.9e-05, eleven orders above float64 accumulation
    noise. If the driver regenerates the corpus this re-proves the
    margin (and test_pinned_goldens_match_current_corpus already forces
    a golden re-pin)."""
    import numpy as np
    import pyarrow.parquet as pq

    from duckdb_pst_spark.goldens_pinned import PINNED_SF
    from duckdb_pst_spark.operators.similarity import SEMANTIC_THRESHOLD

    t = pq.read_table(f"{PINNED_SF}/embeddings.parquet", columns=["embedding"])
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    iu = np.triu_indices(len(X), 1)
    margin = np.abs(S[iu] - SEMANTIC_THRESHOLD).min()
    assert margin > 1e-6, (
        f"a pair's cosine is within {margin} of SEMANTIC_THRESHOLD — "
        "re-pin the goldens with a threshold-epsilon policy before "
        "trusting cross-BLAS determinism"
    )


def test_lloyd_gemm_matches_jvm(spark, sf_dir):
    """_lloyd_gemm must walk the identical integer lattice as _lloyd:
    same final (vec_id, cid) assignment, at the oracle K and at a K
    large enough to exercise multi-chunk BLAS paths."""
    import pyspark.sql.functions as F

    from duckdb_pst_spark.operators import similarity as S

    for k in (S.KM_K, 37):
        jvm = {
            (r.vec_id, r.cid)
            for r in S._lloyd(spark, sf_dir, k=k)[0].select("vec_id", "cid").collect()
        }
        gemm = {
            (r.vec_id, r.cid)
            for r in S._lloyd_gemm(spark, sf_dir, k=k).collect()
        }
        assert jvm == gemm, f"assignment diverged at k={k}"


def test_semantic_scaled_pairs_match_exact(spark, sf_dir):
    """The scaling-K production twin must find exactly the pair set a
    JVM-fold exact computation finds on the SAME trained assignment
    (same K formula, same Lloyd loop) — proving the blocked GEMM and
    the sub-quadratic K=f(n) clustering change the plan, not the
    answer."""
    import pyspark.sql.functions as F

    from duckdb_pst_spark.operators import similarity as S
    from duckdb_pst_spark.tables import table

    e = table(spark, sf_dir, "embeddings")
    n = e.count()
    k = max(S.KM_K, min(S._SEM_MAX_K, n // S._SEM_TARGET_CLUSTER))
    final, _cent = S._lloyd(spark, sf_dir, k=k)
    assigned = e.select("vec_id", "embedding").join(
        final.select("vec_id", "cid"), "vec_id"
    ).select("vec_id", "embedding", "cid", S.norm(F.col("embedding")).alias("nrm"))
    a = assigned.select(
        "cid", F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"), F.col("nrm").alias("a_nrm"),
    )
    b = assigned.select(
        "cid", F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"), F.col("nrm").alias("b_nrm"),
    )
    cos = S.dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_nrm") * F.col("b_nrm"))
    exact = {
        (r.cid, r.vec_a, r.vec_b): r.cos_sim
        for r in a.join(b, ["cid"])
        .filter(F.col("vec_b") > F.col("vec_a"))
        .select("cid", "vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") > S.SEMANTIC_THRESHOLD)
        .collect()
    }
    specs = load_all()
    fast = {
        (r.cid, r.vec_a, r.vec_b): r.cos_sim
        for r in specs["q_dedup_semantic_scaled"].builder(spark, sf_dir).collect()
    }
    assert set(exact) == set(fast)
    assert all(abs(exact[p] - fast[p]) < 1e-9 for p in exact)
