"""Vectorized portable poly-hash over word-3-gram shingles (numpy).

The engine-portable shingle hash is poly_hash("tok_i tok_{i+1} tok_{i+2}")
with poly_hash = fold (acc·31 + codepoint) mod p (functions/portable.py —
the same fold DuckDB oracles express with list_reduce). Evaluating that
fold as a JVM higher-order lambda costs ~|shingle| interpreted steps per
shingle; this module computes the identical values for EVERY shingle of a
document batch in a handful of numpy passes via prefix hashes:

    Hpre[k] = Σ_{j<k} code[j]·31^(k-1-j)  (mod p)
            = 31^(k-1) · Σ_{j<k} code[j]·inv31^j
    H(a,b)  = Hpre[b] − Hpre[a]·31^(b−a)   — depends only on codes[a:b],
              so per-doc substrings hash correctly even over the batch-
              concatenated code array.

Exactness: codes < 2^21 (codepoints), p = 1e9+7, so every intermediate
is bounded as annotated inline and stays inside int64. Shared by the
winnowing kernel (operators/text.py) and the MinHash signature kernel
(operators/dedup.py); hash equality with the interpreted JVM fold is
pinned by the oracle-parity suite on every consumer.
"""

from __future__ import annotations

import numpy as np

from duckdb_pst_spark.functions.portable import P_HASH

_INV31 = pow(31, -1, P_HASH)


def powmod_arange(base: int, n: int, p: int = P_HASH) -> np.ndarray:
    """[base^0, base^1, …, base^(n-1)] mod p via vectorized binary
    decomposition of the exponent (no Python loop over n)."""
    out = np.ones(n, dtype=np.int64)
    k = np.arange(n, dtype=np.int64)
    b = base % p
    bit = 0
    while (1 << bit) < max(n, 2):
        mask = (k >> bit) & 1 == 1
        out[mask] = (out[mask] * b) % p
        b = (b * b) % p
        bit += 1
    return out


def batch_shingle_hashes(
    texts, doc_keys
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Word-3-gram poly-hashes for a batch of documents.

    ``texts``: iterable of raw text values (None allowed); ``doc_keys``:
    matching per-doc identifiers. Documents with < 3 whitespace tokens
    are dropped (no shingle — same rule as the JVM path and the DuckDB
    oracles). Returns (kept_doc_keys, nsh, didx, pos, h):
      kept_doc_keys — int64 doc identifier per KEPT doc
      nsh           — shingle count per kept doc
      didx          — kept-doc index (0-based) per shingle
      pos           — 1-based shingle position within its doc
      h             — poly-hash of the shingle string
    Shingles appear grouped by doc in position order, so segment
    reductions over ``nsh`` boundaries are valid.
    """
    p = P_HASH
    kept, nsh_l, spans_a, spans_b = [], [], [], []
    chunks: list[str] = []
    off = 0
    for key, text in zip(doc_keys, texts):
        if text is None:
            continue
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        if n < 3:
            continue
        norm = " ".join(toks)
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
        st = np.zeros(n, dtype=np.int64)
        st[1:] = np.cumsum(lens[:-1] + 1)
        ns = n - 2
        spans_a.append(off + st[:ns])
        spans_b.append(off + st[2:] + lens[2:])
        kept.append(key)
        nsh_l.append(ns)
        chunks.append(norm)
        off += len(norm)
    if not kept:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, z
    codes = np.frombuffer(
        "".join(chunks).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    L = len(codes)
    ipw = powmod_arange(_INV31, L + 1)
    pw = powmod_arange(31, L + 1)
    # code·ipw < 0x10FFFF·p ≈ 1.1e15 per product (codepoints < 2^21,
    # exact under int64 multiply); reduced mod p before the cumsum, so
    # the running sum is < L·p — exact to L ≈ 9e9 chars per batch
    terms = (codes * ipw[:L]) % p
    s_cum = np.zeros(L + 1, dtype=np.int64)
    np.cumsum(terms, out=s_cum[1:])
    s_cum %= p
    hpre = np.zeros(L + 1, dtype=np.int64)
    hpre[1:] = (pw[:L] * s_cum[1:]) % p  # p² ≈ 1e18 < 2^63 ✓
    a = np.concatenate(spans_a)
    b = np.concatenate(spans_b)
    h = (hpre[b] - hpre[a] * pw[b - a]) % p
    nsh = np.asarray(nsh_l, dtype=np.int64)
    didx = np.repeat(np.arange(len(kept), dtype=np.int64), nsh)
    pos = np.concatenate([np.arange(1, ns + 1, dtype=np.int64) for ns in nsh_l])
    return np.asarray(kept, dtype=np.int64), nsh, didx, pos, h
