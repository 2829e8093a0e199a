#!/usr/bin/env python
"""PQ recall probe on the clustered corpus (VERDICT r8 item 6): is PQ
servable on tight-cluster embeddings at a reasonable code budget?

Replicates q_knn_pq's exact pipeline in numpy (unit-normalize → encode
against per-subspace codebooks → ADC rank → recall@5 vs exact cosine)
and sweeps the two levers the verdict names:

  - code budget: PQ_K = 16 (4-bit, the registered query) vs 256 (8-bit)
  - codebook source: seed vectors (the registered no-training quantizer)
    vs per-subspace k-means (Lloyd, 25 iters — what a deployment trains
    offline; the repo's IVF path already ships trained centroids via
    _lloyd_gemm, this measures the same upgrade for PQ)

Numpy is the right harness here: recall is a property of the algorithm
on the data, not of the engine; the Spark/DuckDB plans reproduce the
same arithmetic (q_knn_pq's oracle pins that).

Usage: python tools/probe_pq_recall.py [embeddings.parquet]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

PATH = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.cache/x100v/embeddings.parquet"
N_QUERIES, TOP_K, DIM, PQ_M = 10, 5, 64, 8
SUB = DIM // PQ_M


def load() -> np.ndarray:
    t = pq.read_table(PATH, columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    emb = emb[np.argsort(vid)]
    return emb / np.linalg.norm(emb, axis=1, keepdims=True)


def _argmin_d2(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """argmin over squared L2 via the GEMM identity |x|²+|c|²−2x·cᵀ —
    the broadcast form allocates len(x)·k·dim temporaries and was the
    reason the first probe run timed out at k=256."""
    d2 = (x * x).sum(1)[:, None] + (c * c).sum(1)[None, :] - 2.0 * (x @ c.T)
    return d2.argmin(1)


def lloyd(x: np.ndarray, k: int, iters: int = 25) -> np.ndarray:
    c = x[:k].copy()
    for _ in range(iters):
        assign = _argmin_d2(x, c)
        for j in range(k):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(0)
    return c


def pq_recall(emb: np.ndarray, k_codes: int, trained: bool) -> float:
    q, cand = emb[:N_QUERIES], emb[N_QUERIES:]
    # exact cosine top-5 (unit vectors: max dot)
    exact = (q @ cand.T).argsort(1)[:, ::-1][:, :TOP_K]
    hits = 0
    codes = np.empty((len(cand), PQ_M), dtype=np.int64)
    books = []
    for m in range(PQ_M):
        sub = cand[:, m * SUB:(m + 1) * SUB]
        book = lloyd(sub, k_codes) if trained else sub[:k_codes].copy()
        books.append(book)
        codes[:, m] = _argmin_d2(sub, book)
    for qi in range(N_QUERIES):
        adc = np.zeros(len(cand))
        for m in range(PQ_M):
            lut = ((q[qi, m * SUB:(m + 1) * SUB][None, :] - books[m]) ** 2).sum(-1)
            adc += lut[codes[:, m]]
        got = adc.argsort()[:TOP_K]
        hits += len(set(got) & set(exact[qi]))
    return hits / (N_QUERIES * TOP_K)


def main() -> None:
    emb = load()
    print(f"corpus: {len(emb)} vectors from {PATH}", file=sys.stderr)
    arms = ((16, False), (256, False), (16, True), (256, True))
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    out = {}
    for k_codes, trained in arms:
        tag = f"k{k_codes}_{'trained' if trained else 'seed'}"
        if only and tag not in only:
            continue
        out[tag] = round(pq_recall(emb, k_codes, trained), 3)
        print(tag, out[tag], file=sys.stderr)
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
