#!/usr/bin/env python
"""Generate a larger scale factor from the driver's sf0.1 tables by
key-consistent replication (for scaling measurements — NOT a driver
artifact; driver testdata stays read-only).

Each copy i offsets every surrogate key (custkey, orderkey, partkey,
suppkey, doc_id, vec_id, event_id, user_id) by i·span so foreign-key
relationships survive: replicated orders reference replicated customers,
lineitems their orders, events their users. Fixed-cardinality dimensions
(region, nation) are NOT replicated — exactly how TPC-H scales.

Usage: python tools/gen_sf.py [factor] [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

ZIPF = "--zipf" in sys.argv
# --docs-only: write only documents.parquet (the single table --zipf
# rewrites) so a Zipf variant of an existing replica dir can reuse its
# other tables via symlinks instead of re-copying ~2 GB of facts.
DOCS_ONLY = "--docs-only" in sys.argv
VECS = "--vecs" in sys.argv
# --vecs-only: write only embeddings.parquet (the single table --vecs
# rewrites), mirror of --docs-only.
VECS_ONLY = "--vecs-only" in sys.argv
_args = [
    a for a in sys.argv[1:] if a not in ("--zipf", "--docs-only", "--vecs", "--vecs-only")
]
FACTOR = int(_args[0]) if _args else 10
SRC = _args[1] if len(_args) > 1 else "/root/testdata/sf0.1"
DST = (
    _args[2]
    if len(_args) > 2
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "sf1")
)

# --zipf: realistic token statistics for the replicated documents table.
# Plain replication multiplies every token count by FACTOR and grows the
# vocabulary not at all (the driver corpus holds only ~31 distinct
# tokens), so any perf decision that hinges on a rare-token tail —
# min-count prunes, hapax-heavy key spaces, PMI/bigram filters — is
# structurally untestable on it. In Zipf mode each copy's documents
# rewrite a deterministic ~10% of token OCCURRENCES to a token 'z<id>'
# with id drawn LOG-UNIFORMLY from [1, 10_000_000]:
# P(id = k) ∝ 1/k, i.e. a Zipf(s=1) frequency law, and the number of
# DISTINCT ids seen grows with the number of draws — Heaps-law vocabulary
# growth with a genuine hapax tail, from one hash-seeded closed form.
# The head (the other ~90% of occurrences) stays the shared original
# vocabulary, so common-token statistics still scale like the plain
# replicas. n_chars is recomputed from the rewritten text.
_ZIPF_TAIL_PPM = 100_000  # 10% of occurrences move to the tail
_ZIPF_VMAX = 10_000_000  # tail id space; V(N) ~ integral of min(1, draws/k)

# --vecs: cluster-structured growth for the EMBEDDINGS table. Plain
# replication copies every vector verbatim, so a query's true top-k are
# its own literal copies — they share the query's IVF cell by
# construction and recall pins at 10⁶ ppm for every nprobe (the round-6
# artifact SCALE.md documents). In --vecs mode copy 0 stays pristine
# and every copy i>0 adds per-(vec_id, dim) hash noise uniform in
# ±_VEC_NOISE: with the driver's unit-norm dim-64 vectors (measured
# inter-base NN distance ≈ 1.08) this yields sibling→base distance
# ≈ _VEC_NOISE·√(dim/3) ≈ 0.69 and sibling↔sibling ≈ _VEC_NOISE·
# √(2·dim/3) ≈ 0.98 — each base becomes a REAL cluster of FACTOR
# near-neighbors whose intra-cluster distances sit BELOW the ≈1.08
# inter-base floor (the sibling↔sibling margin is thin by design:
# wide enough to straddle trained IVF cell boundaries, so recall must
# climb with nprobe like it does on organic data — the measured 100×
# curve is monotone 92/94/96/98% at nprobe 1–4 with THIS constant).
# Deterministic: one hash-seeded closed form, no RNG state.
_VEC_NOISE = 0.15

# Key DOMAINS: one span per domain, computed from the OWNING dimension's
# key column — never from a referencing column. (A referencing column's
# own max underestimates the domain when the dimension has an
# unreferenced tail: in TPC-H ~1/3 of customers place no orders, so
# max(o_custkey) < max(c_custkey) and per-column spans would point
# copy-i orders at the wrong copy's customers.)
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

# table -> {column: key domain}; every referencing column reuses its
# owner's span so FK relationships survive replication exactly
OFFSETS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    # events.user_id draws from the customer key domain (q_range_join
    # joins events.user_id to c_custkey)
    "events": {"event_id": "event_id", "user_id": "custkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    "region": {},
    "nation": {},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    spans = {
        d: con.execute(f"SELECT max({col}) + 1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
        for d, (t, col) in DOMAINS.items()
    }
    for t, keys in OFFSETS.items():
        if DOCS_ONLY and t != "documents":
            continue
        if VECS_ONLY and t != "embeddings":
            continue
        src = f"{SRC}/{t}.parquet"
        if not keys or (FACTOR == 1 and not (ZIPF and t == "documents")):
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{DST}/{t}.parquet' (FORMAT parquet)")
            continue
        cols = [d[0] for d in con.execute(f"SELECT * FROM '{src}' LIMIT 0").description]
        parts = []
        for i in range(FACTOR):
            if VECS and t == "embeddings" and i > 0:
                off = i * spans["vec_id"]
                dim = con.execute(
                    f"SELECT max(len(embedding)) FROM '{src}'"
                ).fetchone()[0]
                parts.append(
                    f"""SELECT vec_id + {off} AS vec_id,
                    list_transform(range(1, {dim} + 1), j -> CAST(
                      CAST(embedding[j] AS DOUBLE) + {_VEC_NOISE} *
                      (CAST(hash((vec_id + {off}) * 1000003 + j) % 2000001
                            AS BIGINT)
                       - 1000000) / 1000000.0 AS FLOAT)) AS embedding,
                    label FROM '{src}'"""
                )
                continue
            sel = ", ".join(
                f"{c} + {i * spans[keys[c]]} AS {c}" if c in keys else c for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{src}'")
        union = " UNION ALL ".join(parts)
        if ZIPF and t == "documents":
            # token-position explode → deterministic hash-gated rewrite →
            # ordered re-assembly; the (doc_id, pos) hash makes every copy
            # rewrite different positions to different tail ids, so the
            # aggregate corpus grows a fresh hapax tail with volume
            # NULL-text rows would vanish here (string_split(NULL) → NULL
            # toks, range over NULL unnests to zero rows, GROUP BY drops
            # the doc_id — round-5 advisor find), so they bypass the
            # rewrite and pass through unchanged.
            union = f"""
            WITH base AS ({union}),
            tok AS (
              SELECT doc_id, lang, source, u.i AS pos, toks[u.i] AS t0,
                     hash(doc_id * 1000003 + u.i) AS h
              FROM (SELECT *, string_split(text, ' ') AS toks
                    FROM base WHERE text IS NOT NULL),
                   unnest(range(1, len(toks) + 1)) AS u(i)
            ),
            rew AS (
              SELECT doc_id, lang, source, pos,
                     CASE WHEN h % 1000000 < {_ZIPF_TAIL_PPM}
                          THEN 'z' || CAST(CAST(pow({_ZIPF_VMAX},
                                 ((h // 1000000) % 1000000) / 1000000.0)
                               AS BIGINT) AS VARCHAR)
                          ELSE t0 END AS t
              FROM tok
            )
            SELECT doc_id,
                   string_agg(t, ' ' ORDER BY pos) AS text,
                   any_value(lang) AS lang,
                   any_value(source) AS source,
                   len(string_agg(t, ' ' ORDER BY pos)) AS n_chars
            FROM rew GROUP BY doc_id
            UNION ALL
            SELECT doc_id, text, lang, source, n_chars
            FROM base WHERE text IS NULL
            """
        con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: x{FACTOR}{' zipf' if ZIPF and t == 'documents' else ''}")
    print("wrote", DST)


if __name__ == "__main__":
    main()
