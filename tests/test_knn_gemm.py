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
