#!/usr/bin/env python
"""Quiet-box re-check of the round-6 signature-kernel ship (VERDICT r7
item 1).

Round 7 proved box load biases kernel-vs-JVM A/Bs toward kernels (the
q_vocab_df call reversed on an idle box: kernel "won" under load, JVM
won 1.17 vs 1.62 s idle). The round-6 migration of ``signatures_for``
to the numpy poly-hash kernel (45.6 -> 33.8 s on q_dedup_minhash at
Zipf-100x) was measured under those same loaded conditions, and the
kernel is now the floor under the WHOLE minhash family — including
q_minhash_band_stats at 2.4x DuckDB / 15 s, the most expensive
registered query. This script re-makes the call idle:

  - DuckDB floor FIRST in this JVM-free process (a resident Spark JVM
    inflates DuckDB 4-7x — SCALE.md round-5 methodology note).
  - One Spark session, every variant's plan warmed at sf0.001, then
    interleaved min-of-3 at Zipf-100x:
      sig_kernel   — current signatures_for (numpy poly-hash kernel)
      sig_jvm      — the pre-round-6 JVM path, reconstructed verbatim
                     from git cbbd6df~1: tokenize -> checkpoint ->
                     higher-order-lambda shingle poly-hash ->
                     array_distinct -> checkpoint -> 8 array_min
                     signature transforms
      band_kernel  — q_minhash_band_stats end-to-end (kernel sigs)
      band_jvm     — same builder over the JVM signature set

Usage: python tools/ab_signature_kernel.py [corpus_dir] (default
.cache/x100z). Prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

CORPUS = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".cache", "x100z")
REPS = 3


def duck_floor() -> float:
    import duckdb

    from duckdb_pst_spark.registry import load_all

    sql = load_all()["q_minhash_band_stats"].oracle
    best = float("inf")
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{CORPUS}/documents.parquet'"
    )
    con.execute(f"SELECT count(*) FROM ({sql})").fetchone()  # warm
    for _ in range(REPS):
        t0 = time.perf_counter()
        con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return round(best, 2)


def main() -> None:
    duck = duck_floor()
    print(f"duckdb band_stats floor: {duck}", file=sys.stderr)

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from duckdb_pst_spark.operators import dedup
    from duckdb_pst_spark.operators.dedup import (
        MINHASH_K,
        P_HASH,
        _A,
        _B,
        _shingle_hashes,
        signatures_for,
    )
    from duckdb_pst_spark.functions.portable import poly_hash, tokens
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark
    from duckdb_pst_spark.tables import table

    def signatures_for_jvm(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
        """Pre-round-6 JVM path, verbatim shape from git cbbd6df~1."""
        toks_df = (
            docs.select("doc_id", *carry, tokens(F.col("text")).alias("toks"))
            .filter(F.size("toks") >= 3)
            .localCheckpoint(eager=True)
        )
        sh_df = (
            toks_df.select(
                "doc_id", *carry, _shingle_hashes(F.col("toks"), poly_hash).alias("sh")
            )
            .filter(F.size("sh") >= 1)
            .localCheckpoint(eager=True)
        )

        def perm(k: int):
            return lambda h: (F.lit(_A[k]) * h + F.lit(_B[k])) % F.lit(P_HASH)

        d = sh_df
        for k in range(MINHASH_K):
            d = d.withColumn(f"sig_{k}", F.array_min(F.transform(F.col("sh"), perm(k))))
        return d

    spark = get_spark("ab-sig-kernel")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    band_builder = specs["q_minhash_band_stats"].builder

    def docs(d: str) -> DataFrame:
        return table(spark, d, "documents").select("doc_id", "text")

    def noop(df: DataFrame) -> None:
        df.write.mode("overwrite").format("noop").save()

    variants = {
        "sig_kernel": lambda d: noop(signatures_for(docs(d))),
        "sig_jvm": lambda d: noop(signatures_for_jvm(docs(d))),
        "band_kernel": lambda d: noop(band_builder(spark, d)),
    }

    def band_jvm(d: str) -> None:
        orig = dedup.signatures_for
        dedup.signatures_for = signatures_for_jvm
        try:
            noop(band_builder(spark, d))
        finally:
            dedup.signatures_for = orig

    variants["band_jvm"] = band_jvm

    # hash-equality spot check at sf0.001: both signature paths must
    # produce identical (doc_id, sig_*) sets before timing means anything
    small = "/root/testdata/sf0.001"
    cols = ["doc_id"] + [f"sig_{k}" for k in range(MINHASH_K)]
    a = {tuple(r) for r in signatures_for(docs(small)).select(*cols).collect()}
    b = {tuple(r) for r in signatures_for_jvm(docs(small)).select(*cols).collect()}
    assert a == b, f"signature paths diverge: {len(a ^ b)} rows differ"
    print("sig paths hash-equal at sf0.001", file=sys.stderr)

    for fn in variants.values():  # warm every plan shape
        fn(small)

    best: dict[str, float] = {k: float("inf") for k in variants}
    for rep in range(REPS):  # interleaved min-of-3
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(CORPUS)
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name}: {dt:.2f}", file=sys.stderr)

    out = {k: round(v, 2) for k, v in best.items()}
    out["duckdb_band_stats"] = duck
    out["corpus"] = CORPUS
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
