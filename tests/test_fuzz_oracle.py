"""Randomized-DATA oracle parity (hypothesis).

The driver's correctness gate and `test_oracle_parity.py` prove
Spark ≡ DuckDB on the FIXED synthetic tables. These properties re-run
the exact same comparison (`tests.oracle.compare` — row count, column
names, cross-engine types, order-insensitive canonical values) on
ADVERSARIAL generated tables the fixed data can't cover:

- tie-heavy timestamps (every window orderBy tiebreak exercised),
- duplicate / negative / fractional metric values at the centi-scale
  rounding boundary (q_anomaly_zscore's integer moments),
- single-event users, one-type users, empty funnel stages,
- single-doc sources and uniform-source corpora (q_source_mix rate
  saturation; q_source_cap rank ties),
- duplicate embedding vectors (k-means argmin ties broken by cid).

Each example builds a throwaway sf-dir (symlinks to sf0.001 for the
untouched tables + a regenerated parquet for the fuzzed one) so the
operator under test runs UNMODIFIED through its registered builder and
oracle SQL. Example counts are small: every example runs Spark jobs.

Plus pure-math properties (no Spark, many examples) for the
integer-moment z-score identity.
"""

from __future__ import annotations

import datetime
import math
import os
import shutil
import tempfile
from fractions import Fraction

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_pst_spark.registry import REGISTRY, load_all
from duckdb_pst_spark.tables import TABLES
from tests.oracle import compare

load_all()

BASE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

EPOCH = datetime.datetime(2024, 1, 1)


def _fuzz_dir(writers: dict[str, callable]) -> str:
    """Throwaway sf-dir: symlink every table from BASE, then overwrite
    the fuzzed ones. Caller must shutil.rmtree it."""
    d = tempfile.mkdtemp(prefix="fuzz_sf_")
    for t in TABLES:
        os.symlink(os.path.join(BASE, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    for name, write in writers.items():
        path = os.path.join(d, f"{name}.parquet")
        os.unlink(path)
        write(path)
    return d


def _copy_to_parquet(select_sql: str, pdf: pd.DataFrame, path: str) -> None:
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.execute(f"COPY ({select_sql}) TO '{path}' (FORMAT PARQUET)")
    con.close()


def _write_events(rows: list[tuple[int, str, int, float]], path: str) -> None:
    """rows: (user_id, event_type, ts_offset_seconds, value)."""
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [EPOCH + datetime.timedelta(seconds=r[2]) for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "value": [r[3] for r in rows],
            "props": ['{"k": 1}'] * len(rows),
        }
    )
    _copy_to_parquet(
        "SELECT CAST(event_id AS BIGINT) AS event_id, CAST(ts AS TIMESTAMP) AS ts,"
        " CAST(user_id AS BIGINT) AS user_id, event_type,"
        " CAST(value AS DOUBLE) AS value, props FROM pdf",
        pdf,
        path,
    )


def _write_documents(rows: list[tuple[str, int]], path: str) -> None:
    """rows: (source, n_chars>=1)."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [f"doc {i} " + "w " * (r[1] % 7) for i, r in enumerate(rows)],
            "lang": ["en"] * len(rows),
            "source": [r[0] for r in rows],
            "n_chars": [r[1] for r in rows],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,"
        " CAST(n_chars AS BIGINT) AS n_chars FROM pdf",
        pdf,
        path,
    )


def _write_embeddings(vecs: list[list[float]], path: str) -> None:
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": vecs,
            "label": [i % 3 for i in range(len(vecs))],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(vec_id AS BIGINT) AS vec_id,"
        " CAST(embedding AS FLOAT[]) AS embedding,"
        " CAST(label AS INTEGER) AS label FROM pdf",
        pdf,
        path,
    )


def _check(spark, qname: str, writers: dict[str, callable]) -> None:
    d = _fuzz_dir(writers)
    try:
        compare(spark, REGISTRY[qname], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# Values stay inside the documented centi-scale domain (|v| <= 1e4 so
# Q = sum(v_c^2) stays far below 2^53); the set is duplicate- and
# sign-heavy to force sigma=0 groups and rounding-boundary floors.
_VALUES = [-9999.99, -250.0, -0.01, 0.0, 0.005, 1.0, 1.0, 99.99, 9999.99]

events_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["signup", "click", "purchase", "error"]),
        st.integers(min_value=0, max_value=6),  # tie-heavy timestamps
        st.sampled_from(_VALUES),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_anomaly_zscore(spark, rows):
    """Integer-moment 3-sigma gate: sigma=0 groups, n=1 groups, negative
    floors, duplicate values — Spark and DuckDB must agree exactly."""
    _check(spark, "q_anomaly_zscore", {"events": lambda p: _write_events(rows, p)})


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_window_count_distinct(spark, rows):
    """First-occurrence flags + running sum == prefix COUNT(DISTINCT)
    under heavy timestamp ties (event_id tiebreak is load-bearing)."""
    _check(
        spark, "q_window_count_distinct", {"events": lambda p: _write_events(rows, p)}
    )


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_events_funnel(spark, rows):
    """Ordered funnel: purchases before signups must not count; equal
    timestamps are strictly 'after' only via > comparison."""
    _check(spark, "q_events_funnel", {"events": lambda p: _write_events(rows, p)})


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_retention_cohorts(spark, rows):
    """Cohort x week-offset retention on degenerate cohorts (single user,
    all users same second)."""
    _check(spark, "q_retention_cohorts", {"events": lambda p: _write_events(rows, p)})


docs_st = st.lists(
    st.tuples(
        st.sampled_from(["web", "books", "code"]),
        st.integers(min_value=1, max_value=5000),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=docs_st)
@settings(**_SETTINGS)
def test_fuzz_source_mix(spark, rows):
    """Integer ppm keep-rates: single-source corpora saturate the rate at
    1e6; tiny sources keep everything; hash gate identical both sides."""
    _check(spark, "q_source_mix", {"documents": lambda p: _write_documents(rows, p)})


@given(rows=docs_st)
@settings(**_SETTINGS)
def test_fuzz_source_cap(spark, rows):
    """Per-source cap in hash order with doc_id tiebreak, sources at /
    below / above the cap size."""
    _check(spark, "q_source_cap", {"documents": lambda p: _write_documents(rows, p)})


# Duplicate-heavy coordinate set: forces exact distance ties between
# distinct centroids so the cid-asc argmin tiebreak decides assignments.
_COORDS = [-1.0, -0.5, 0.0, 0.5, 0.5, 1.0]


@given(
    vecs=st.lists(
        st.lists(st.sampled_from(_COORDS), min_size=64, max_size=64),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_fuzz_kmeans_iter(spark, vecs):
    """Fixed-point Lloyd iterations: duplicate vectors (argmin ties),
    fewer points than K, empty clusters keeping stale centroids —
    engine-exact on the integer lattice."""
    _check(spark, "q_kmeans_iter", {"embeddings": lambda p: _write_embeddings(vecs, p)})


# --------------------------------------------------- pure-math properties
@given(
    xs=st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=60),
    i=st.integers(min_value=0, max_value=59),
)
@settings(max_examples=300, deadline=None)
def test_zscore_integer_moment_identity(xs, i):
    """(n*x - S)^2 > 9*(n*Q - S^2)  <=>  |x - mean| > 3*stddev_pop, in
    exact rational arithmetic — the derivation q_anomaly_zscore rests on
    (its doubles then evaluate the same integers in the same op order on
    both engines)."""
    x = xs[i % len(xs)]
    n, s, q = len(xs), sum(xs), sum(v * v for v in xs)
    integer_verdict = (n * x - s) ** 2 > 9 * (n * q - s * s)
    mean = Fraction(s, n)
    var = Fraction(q, n) - mean * mean
    exact_verdict = (Fraction(x) - mean) ** 2 > 9 * var
    assert integer_verdict == exact_verdict


@given(xs=st.lists(st.integers(min_value=-(10**4), max_value=10**4), min_size=1, max_size=40))
@settings(max_examples=300, deadline=None)
def test_zscore_double_sequence_stays_exact_in_domain(xs):
    """Within the documented domain (centi-scaled |v_c| <= 1e6, n <= 60)
    every intermediate of the implemented double expression is an
    integer below 2^53, so the double comparison equals the exact
    integer comparison — the reason the operator never materializes a
    float mean/stddev."""
    n, s, q = len(xs), sum(xs), sum(v * v for v in xs)
    for x in xs:
        dev = float(n * x - s)
        var_term = float(n) * float(q) - float(s) * float(s)
        dbl = dev * dev > 9.0 * float(n) * var_term / float(n)
        exact = (n * x - s) ** 2 > 9 * (n * q - s * s)
        assert dbl == exact
        assert abs(n * x - s) < 2**53 and abs(n * q - s * s) < 2**53
        assert not math.isinf(var_term)


# ------------------------------------------------ round-3 text operators
_WORDS = ["the", "be", "to", "of", "and", "x", "zz", "-", "...", "1", "##",
          "supercalifragilistic", "a"]


def _write_rich_documents(docs: list[list[str]], path: str) -> None:
    """Documents whose text is a generated word/line soup: bullet lines,
    ellipsis line-ends, newlines, repeated shingles, single-word docs."""
    texts = []
    for i, words in enumerate(docs):
        # every 4th doc gets line structure (bullets / ellipsis endings)
        if i % 4 == 0 and len(words) >= 4:
            mid = len(words) // 2
            texts.append("- " + " ".join(words[:mid]) + "\n" + " ".join(words[mid:]) + "...")
        else:
            texts.append(" ".join(words))
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [["web", "books", "code"][i % 3] for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,"
        " CAST(n_chars AS BIGINT) AS n_chars FROM pdf",
        pdf,
        path,
    )


rich_docs_st = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=24),
    min_size=1,
    max_size=20,
)


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_quality_gopher(spark, docs):
    """Gopher rule bundle on adversarial text: bullet/ellipsis lines,
    one-word docs, symbol-only tokens, stopword-free docs."""
    _check(spark, "q_quality_gopher", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_winnowing(spark, docs):
    """Winnowing fingerprints: docs shorter than one window, docs of one
    repeated word (all shingle hashes equal — position tiebreak decides
    every window), shared shingles across docs."""
    _check(spark, "q_winnowing", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_token_histogram(spark, docs):
    """log2 bucketing exactly at power-of-two boundaries (1, 2, 4... word
    docs are common under this strategy)."""
    _check(spark, "q_token_histogram", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_global_shuffle(spark, docs):
    """Shard assignment + within-shard order on tiny corpora: empty
    shards, single-doc shards — positions must stay dense per shard."""
    _check(spark, "q_global_shuffle", {"documents": lambda p: _write_rich_documents(docs, p)})


# ------------------------------------------------------ pagerank on fuzz
def _write_lineitem(edges: list[tuple[int, int]], path: str) -> None:
    """Minimal lineitem: fuzzed (l_partkey, l_suppkey) pairs; the other
    columns are deterministic fillers with the production schema."""
    n = len(edges)
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(n),
            "l_partkey": [e[0] for e in edges],
            "l_suppkey": [e[1] for e in edges],
            "l_linenumber": [1] * n,
            "l_quantity": [1.0] * n,
            "l_extendedprice": [10.0] * n,
            "l_discount": [0.0] * n,
            "l_tax": [0.0] * n,
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": [EPOCH] * n,
        }
    )
    _copy_to_parquet(
        "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,"
        " CAST(l_partkey AS BIGINT) AS l_partkey,"
        " CAST(l_suppkey AS BIGINT) AS l_suppkey,"
        " CAST(l_linenumber AS INTEGER) AS l_linenumber,"
        " CAST(l_quantity AS DOUBLE) AS l_quantity,"
        " CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,"
        " CAST(l_discount AS DOUBLE) AS l_discount,"
        " CAST(l_tax AS DOUBLE) AS l_tax,"
        " l_returnflag, l_linestatus, CAST(l_shipdate AS TIMESTAMP) AS l_shipdate"
        " FROM pdf",
        pdf,
        path,
    )


@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=4)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_fuzz_pagerank(spark, edges):
    """Integer PageRank on arbitrary small bipartite multigraphs:
    duplicate edges (collapsed by DISTINCT), star hubs, isolated pairs —
    every rank bit must match the unrolled-CTE oracle."""
    _check(spark, "q_pagerank", {"lineitem": lambda p: _write_lineitem(edges, p)})


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_cdc_apply(spark, rows):
    """CDC compaction: tombstone-last vs tombstone-overwritten keys,
    same-timestamp changes ordered by log position (event_id)."""
    _check(spark, "q_cdc_apply", {"events": lambda p: _write_events(rows, p)})


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_scd2_intervals(spark, rows):
    """SCD2 interval chaining under duplicate timestamps: lead() must
    chain by (ts, event_id) identically on both engines."""
    _check(spark, "q_scd2_intervals", {"events": lambda p: _write_events(rows, p)})


# --------------------------------------- round-3 text/sketch additions
# q_bm25's fixed query terms must actually occur sometimes — pool them
# (twice for 'hash' so tf > 1 happens) next to the adversarial words.
_BM25_WORDS = _WORDS + ["hash", "vector", "stream", "hash"]

bm25_docs_st = st.lists(
    st.lists(st.sampled_from(_BM25_WORDS), min_size=1, max_size=24),
    min_size=1,
    max_size=20,
)


@given(docs=bm25_docs_st)
@settings(**_SETTINGS)
def test_fuzz_bm25(spark, docs):
    """BM25 on adversarial corpora: term-free corpora (empty result),
    single-doc corpora (dl == avgdl exactly), tf-heavy repeats, and
    df == N-ish extremes of the integer IDF."""
    _check(spark, "q_bm25", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_bpe_pairs(spark, docs):
    """BPE pair counts: 1-char words (no pairs), punctuation/multibyte
    tokens, tie-heavy counts (pair asc tiebreak decides the top-k cut)."""
    _check(spark, "q_bpe_pairs", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_countmin(spark, docs):
    """Count-min grid on tiny corpora: empty-cell probes never happen by
    construction (probes are the observed tokens), but single-token
    corpora, all-identical tokens (one hot cell), and collision-heavy
    16-wide rows all occur here."""
    _check(spark, "q_countmin", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_kmv_jaccard(spark, docs):
    """KMV Jaccard: shingle-free corpora (k_used = 0 guard), one-sided
    corpora (doc_id parity leaves a side empty), identical sides
    (J = 1), sketches smaller than k."""
    _check(spark, "q_kmv_jaccard", {"documents": lambda p: _write_rich_documents(docs, p)})


def _write_labeled_documents(docs: list[list[str]], path: str) -> None:
    """Rich documents with MIXED language labels (en/fr alternating) so
    the χ² contingency table has both classes — and all-en degenerate
    corpora still occur via single-doc examples."""
    texts = [" ".join(words) for words in docs]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en" if i % 2 == 0 else "fr" for i in range(len(texts))],
            "source": ["web"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,"
        " CAST(n_chars AS BIGINT) AS n_chars FROM pdf",
        pdf,
        path,
    )


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_chi2_terms(spark, docs):
    """χ² term selection: degenerate one-class corpora (denominator 0 →
    NaN/Inf, IEEE-identical in both engines), tokens in every doc
    (excluded), min-df boundary, tie-heavy χ² with tok-asc cuts."""
    _check(spark, "q_chi2_terms", {"documents": lambda p: _write_labeled_documents(docs, p)})


# ----------------------------------------------- MERGE upsert on fuzz
def _write_orders(rows: list[tuple[int, int, float]], path: str) -> None:
    """Minimal orders: fuzzed (o_orderkey, o_custkey, o_totalprice) with
    the production schema. Duplicate keys are allowed on purpose — a
    non-unique merge key fans out the full-outer join identically in
    both engines, and that semantic must stay pinned."""
    n = len(rows)
    pdf = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[1] for r in rows],
            "o_orderstatus": [["O", "F", "P"][i % 3] for i in range(n)],
            "o_totalprice": [r[2] for r in rows],
            "o_orderdate": [EPOCH] * n,
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    _copy_to_parquet(
        "SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,"
        " CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus,"
        " CAST(o_totalprice AS DOUBLE) AS o_totalprice,"
        " CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority FROM pdf",
        pdf,
        path,
    )


orders_st = st.lists(
    st.tuples(
        # keys straddle the +10M insert offset so a synthesized insert id
        # can collide with an existing key (two source rows, one target)
        st.sampled_from([0, 1, 3, 7, 13, 1001, 9_999_993, 10_000_001, 10_001_001]),
        st.integers(min_value=0, max_value=5),
        st.sampled_from(_VALUES),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=orders_st)
@settings(**_SETTINGS)
def test_fuzz_merge_upsert(spark, rows):
    """MERGE on adversarial targets: duplicate merge keys (join fan-out),
    negative / centi-boundary prices, and insert-id collisions with
    existing keys — the full-outer CASE semantics must match exactly."""
    _check(spark, "q_merge_upsert", {"orders": lambda p: _write_orders(rows, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_histogram_drift(spark, docs):
    """Drift histogram on tiny corpora: one-doc corpora leave a side
    empty (the n=0 guard), zero-token docs land in bucket 0, buckets
    present on only one side."""
    _check(spark, "q_histogram_drift", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_bigram_surprise(spark, docs):
    """Bigram-LM surprise on tiny corpora: one-token docs (excluded by
    the len>=2 gate on both engines), docs of one repeated word (every
    bigram identical — c = corpus count), integer-div rounding at
    n_bigrams boundaries, top-20 ties broken by doc_id."""
    _check(spark, "q_bigram_surprise", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_substring_spans(spark, docs):
    """Exact-substring spans on tiny corpora: docs shorter than one
    shingle (gated identically), adjacent/overlapping duplicated
    shingles merging into one island, gap-separated islands, ties at
    the top-50 boundary broken by doc_id."""
    _check(spark, "q_substring_spans", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(
    vecs=st.lists(
        st.lists(st.sampled_from(_COORDS), min_size=64, max_size=64),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_fuzz_auc(spark, vecs):
    """Rank-sum AUC on adversarial inputs: one-class corpora (the
    500000-ppm guard), all-identical vectors (every row tied — one
    histogram bucket), duplicate norms exercising average ranks."""
    _check(spark, "q_auc", {"embeddings": lambda p: _write_embeddings(vecs, p)})


@given(
    docs=rich_docs_st,
    vecs=st.lists(
        st.lists(st.sampled_from(_COORDS), min_size=64, max_size=64),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_fuzz_hybrid_rrf(spark, docs, vecs):
    """RRF fusion on misaligned arms: doc ids the dense pool never
    ranks and vice versa (full-outer membership, zero contributions),
    empty sparse pools (no doc matches the terms), one-vector corpora
    (the query is the only embedding — empty dense pool)."""
    _check(
        spark,
        "q_hybrid_rrf",
        {
            "documents": lambda p: _write_rich_documents(docs, p),
            "embeddings": lambda p: _write_embeddings(vecs, p),
        },
    )


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_dsir_weights(spark, docs):
    """DSIR weights on tiny corpora: no English docs (cnt_tgt = 0
    everywhere, smoothing only), single-bigram docs, every doc scoring
    from the same bucket (hash collisions at 256 buckets)."""
    _check(spark, "q_dsir_weights", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_lsh_recall(spark, docs):
    """LSH recall QA on tiny corpora: empty truth sets (recall = 10^6
    by convention), docs below the 3-token shingle gate, identical docs
    (jaccard 10^6, every band shared)."""
    _check(spark, "q_lsh_recall", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_simhash_hamming(spark, docs):
    """Pigeonhole simhash dedup on tiny corpora: identical docs (all 4
    blocks shared, hamming 0), single-doc corpora (no pairs), bucket
    collisions at 4-bit block width, the 64-member degenerate-bucket
    drop on many-duplicate corpora."""
    _check(spark, "q_dedup_simhash_hamming", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_source_overlap(spark, docs):
    """KMV source-overlap matrix on tiny corpora: single-source corpora
    (no pairs), shingle-free docs, sketches smaller than K, identical
    sources (jaccard 10^6)."""
    _check(spark, "q_source_overlap", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(
    vecs=st.lists(
        st.lists(st.sampled_from(_COORDS), min_size=64, max_size=64),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_fuzz_embedding_drift(spark, vecs):
    """Centroid drift on adversarial inputs: one-class corpora (empty
    side -> the 0-centroid guard, no division by zero), negative
    components (floor-scaling toward -inf must agree), single vectors."""
    _check(spark, "q_embedding_drift", {"embeddings": lambda p: _write_embeddings(vecs, p)})


@given(rows=orders_st)
@settings(**_SETTINGS)
def test_fuzz_lateral_topk(spark, rows):
    """LATERAL top-k on adversarial orders: duplicate (custkey, price)
    pairs at the k=2 boundary (o_orderkey tiebreak), customers with one
    or zero orders (LATERAL inner join drops them), duplicate order
    keys."""
    _check(spark, "q_lateral_topk", {"orders": lambda p: _write_orders(rows, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_setsim_prefix(spark, docs):
    """Prefix-filter set-sim join on tiny corpora: identical docs
    (jaccard 10^6), singleton token sets (prefix = whole set),
    frequency ties broken by token string, pairs exactly at the 0.5
    threshold boundary."""
    _check(spark, "q_setsim_prefix", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(rows=orders_st)
@settings(**_SETTINGS)
def test_fuzz_zorder_stats(spark, rows):
    """Z-order bucketing on adversarial orders: single-row tables
    (min = max, zero-width domains -> bucket arithmetic must not
    divide by zero since max - min + 1 >= 1), duplicate keys, negative
    totals ignored by the integer key path."""
    _check(spark, "q_zorder_stats", {"orders": lambda p: _write_orders(rows, p)})


@given(rows=orders_st)
@settings(**_SETTINGS)
def test_fuzz_exact_median(spark, rows):
    """Two-pass median on adversarial orders: single-row tables (k=0),
    duplicate prices straddling bucket boundaries, negative prices
    (floor toward -inf and negative div must agree across engines)."""
    _check(spark, "q_exact_median_2pass", {"orders": lambda p: _write_orders(rows, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_phrase_pmi(spark, docs):
    """PMI phrase mining on tiny corpora: no bigram reaching the
    min-count gate (empty result), single-token docs, repeated-word
    docs (cxy close to c1 = c2), top-25 ties broken by (w1, w2)."""
    _check(spark, "q_phrase_pmi", {"documents": lambda p: _write_rich_documents(docs, p)})


def _write_part(rows: list[tuple[float, int]], path: str) -> None:
    """Minimal part: fuzzed (p_retailprice, p_size) with the production
    schema. Duplicate (price, size) pairs are deliberate — equal pairs
    never dominate each other, so all must survive the skyline."""
    pdf = pd.DataFrame(
        {
            "p_partkey": range(len(rows)),
            "p_name": [f"part {i}" for i in range(len(rows))],
            "p_brand": ["Brand#1"] * len(rows),
            "p_type": ["STANDARD"] * len(rows),
            "p_size": [r[1] for r in rows],
            "p_retailprice": [r[0] for r in rows],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name, p_brand, p_type,"
        " CAST(p_size AS BIGINT) AS p_size,"
        " CAST(p_retailprice AS DOUBLE) AS p_retailprice FROM pdf",
        pdf,
        path,
    )


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(_VALUES), st.integers(min_value=1, max_value=8)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_fuzz_skyline(spark, rows):
    """Pareto skyline on adversarial parts: duplicate (price, size)
    pairs (all survive), single-row tables (min=max bucket domain),
    equal prices with distinct sizes (only the min size survives),
    negative prices (bucket arithmetic on negative cents)."""
    _check(spark, "q_skyline", {"part": lambda p: _write_part(rows, p)})


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_ohlc_bars(spark, rows):
    """OHLC bars on tie-heavy events: same-timestamp ticks (the
    (ts, event_id) tiebreak decides open/close), single-event bars
    (open = high = low = close), negative values (floor toward -inf)."""
    _check(spark, "q_ohlc_bars", {"events": lambda p: _write_events(rows, p)})


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_regr_slope(spark, rows):
    """OLS slope on tiny groups: single-point groups and all-same-x
    groups (den = 0 -> NULL via the guard on both engines), negative
    values, duplicate (x, y) points."""
    _check(spark, "q_regr_slope", {"events": lambda p: _write_events(rows, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_dsir_resample(spark, docs):
    """DSIR resampling on tiny corpora: scores above 10^6 (the least()
    clamp makes keep certain), sub-bigram docs excluded identically,
    single-language corpora."""
    _check(spark, "q_dsir_resample", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_except_all(spark, docs):
    """EXCEPT ALL multiset arithmetic on duplicate-heavy corpora: each
    duplicate survives count_left - count_right times; empty sides."""
    _check(spark, "q_except_all", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_intersect_all(spark, docs):
    """INTERSECT ALL: min(count_left, count_right) copies survive."""
    _check(spark, "q_intersect_all", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(rows=orders_st)
@settings(**_SETTINGS)
def test_fuzz_orderby_nulls(spark, rows):
    """NULLS LAST pinning on adversarial orders: all-null keys, no-null
    keys, ties at the limit boundary broken by the unique orderkey."""
    _check(spark, "q_orderby_nulls", {"orders": lambda p: _write_orders(rows, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_corpus_card(spark, docs):
    """Corpus card on tiny corpora: single-doc sources (distinct_ppm =
    10^6), fully duplicated sources, no-English corpora."""
    _check(spark, "q_corpus_card", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(rows=orders_st)
@settings(**_SETTINGS)
def test_fuzz_not_in_nulls(spark, rows):
    """The NOT IN trap under fuzz: probe sets with and without NULLs
    (without, NOT IN == NOT EXISTS; with, NOT IN collapses to 0),
    empty probe sets (NOT IN keeps everything)."""
    _check(spark, "q_not_in_nulls", {"orders": lambda p: _write_orders(rows, p)})


@given(rows=orders_st)
@settings(**_SETTINGS)
def test_fuzz_decimal_money(spark, rows):
    """Native DECIMAL aggregation on adversarial prices: negative
    values, centi-boundary values (the class that exposes rounding-rule
    divergence if any cast reduces scale), duplicate keys."""
    _check(spark, "q_decimal_money", {"orders": lambda p: _write_orders(rows, p)})


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_sequence_gaps(spark, rows):
    """Gap audit on tiny id spaces: no gaps (empty result), one id
    (no lag), every id filtered (empty distinct set)."""
    _check(spark, "q_sequence_gaps", {"events": lambda p: _write_events(rows, p)})


@given(rows=orders_st)
@settings(**_SETTINGS)
def test_fuzz_benford(spark, rows):
    """Benford digits on adversarial prices: sub-1 values excluded
    identically, negative values excluded by the >= 1 gate, single-row
    tables (share 10^6)."""
    _check(spark, "q_benford", {"orders": lambda p: _write_orders(rows, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_hof_parity(spark, docs):
    """HOF parity on tiny docs: empty token arrays (max over empty ->
    NULL on both engines), no long tokens, exists-miss rows."""
    _check(spark, "q_hof_parity", {"documents": lambda p: _write_rich_documents(docs, p)})


@given(rows=events_st)
@settings(**_SETTINGS)
def test_fuzz_attribution(spark, rows):
    """Last-touch attribution on tie-heavy events: simultaneous touches
    (collapsed by arg_max on the unique event id), touch exactly at the
    purchase ts (>= counts), purchases with no prior touch ('none'),
    touches outside the 1h window."""
    _check(spark, "q_attribution_last_touch", {"events": lambda p: _write_events(rows, p)})


@given(edges=st.lists(st.tuples(st.integers(min_value=0, max_value=6),
                                st.integers(min_value=0, max_value=6)),
                      min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_fuzz_degree_distribution(spark, edges):
    """Degree buckets on tiny graphs: degree-1 nodes (bucket 0),
    duplicate edges collapsed by the distinct, self-loop-ish pairs."""
    _check(spark, "q_degree_distribution", {"lineitem": lambda p: _write_lineitem(edges, p)})


@given(docs=rich_docs_st)
@settings(**_SETTINGS)
def test_fuzz_filter_cascade(spark, docs):
    """Cascade attribution on tiny docs: sub-5-token docs (len kill
    fires first and shadows later rules), one-word repeats (repetition
    kill), stopword-free docs, all-kept corpora."""
    _check(spark, "q_filter_cascade", {"documents": lambda p: _write_rich_documents(docs, p)})


def test_threshold_sweep_clean_corpus(spark):
    """Round-7 advisor fix: on a corpus with ZERO LSH-verified pairs the
    pair/doc histograms are empty — the sweep must still return all 7
    tau rows with zero counts (the oracle COALESCEs over a LEFT JOIN;
    an inner join back onto taus returned 0 rows and diverged)."""

    def write(path: str) -> None:
        pdf = pd.DataFrame(
            {
                "doc_id": range(8),
                # disjoint vocabularies: no shared shingles, no band
                # collisions, hence zero candidate pairs
                "text": [
                    " ".join(f"tok{i}x{j}" for j in range(40)) for i in range(8)
                ],
                "lang": ["en"] * 8,
                "source": ["web"] * 8,
                "n_chars": [200] * 8,
            }
        )
        _copy_to_parquet(
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,"
            " CAST(n_chars AS BIGINT) AS n_chars FROM pdf",
            pdf,
            path,
        )

    d = _fuzz_dir({"documents": write})
    try:
        compare(spark, REGISTRY["q_dedup_threshold_sweep"], d)
        rows = REGISTRY["q_dedup_threshold_sweep"].builder(spark, d).collect()
        assert len(rows) == 7
        assert all(r.n_pairs == 0 and r.n_dup_docs == 0 for r in rows)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _write_lineitem_op(pairs: list[tuple[int, int]], path: str) -> None:
    """Minimal lineitem keyed for the co-purchase graph: fuzzed
    (l_orderkey, l_partkey) pairs, production schema fillers."""
    n = len(pairs)
    pdf = pd.DataFrame(
        {
            "l_orderkey": [p[0] for p in pairs],
            "l_partkey": [p[1] for p in pairs],
            "l_suppkey": [1] * n,
            "l_linenumber": [1] * n,
            "l_quantity": [1.0] * n,
            "l_extendedprice": [10.0] * n,
            "l_discount": [0.0] * n,
            "l_tax": [0.0] * n,
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": [EPOCH] * n,
        }
    )
    _copy_to_parquet(
        "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,"
        " CAST(l_partkey AS BIGINT) AS l_partkey,"
        " CAST(l_suppkey AS BIGINT) AS l_suppkey,"
        " CAST(l_linenumber AS INTEGER) AS l_linenumber,"
        " CAST(l_quantity AS DOUBLE) AS l_quantity,"
        " CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,"
        " CAST(l_discount AS DOUBLE) AS l_discount,"
        " CAST(l_tax AS DOUBLE) AS l_tax,"
        " l_returnflag, l_linestatus,"
        " CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM pdf",
        pdf,
        path,
    )


@given(pairs=st.lists(st.tuples(st.integers(min_value=0, max_value=5),
                                st.integers(min_value=0, max_value=12)),
                      min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_fuzz_triangle_count(spark, pairs):
    """Both triangle strategies vs the id-ordered SQL oracle on
    adversarial tiny co-purchase graphs: dense cliques from shared
    orders (orders with many parts), single-bucket triangles (the
    PTE c1/C(rho-1,2) weight path), duplicate (order, part) pairs
    collapsed by the distinct, and triangle-free stars."""
    d = _fuzz_dir({"lineitem": lambda p: _write_lineitem_op(pairs, p)})
    try:
        compare(spark, REGISTRY["q_triangle_count"], d)
        compare(spark, REGISTRY["q_triangle_count_pte"], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _write_lang_documents(rows: list[tuple[int, list[str]]], path: str) -> None:
    """Documents with fuzzed (lang, words): multilingual slices for the
    KS / fertility / top-k family; every 5th row is a NULL text."""
    langs = ["en", "fr", "de"]
    texts = [None if i % 5 == 4 else " ".join(r[1]) for i, r in enumerate(rows)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": texts,
            "lang": [langs[r[0] % 3] for r in rows],
            "source": ["web"] * len(rows),
            "n_chars": [0 if t is None else len(t) for t in texts],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,"
        " CAST(n_chars AS BIGINT) AS n_chars FROM pdf",
        pdf,
        path,
    )


lang_docs_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.lists(st.sampled_from(["aa", "bb", "ab", "the", "x"]), min_size=0, max_size=8),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=lang_docs_st)
@settings(**_SETTINGS)
def test_fuzz_quality_ks(spark, rows):
    """Two-sample KS on adversarial slices: tie-heavy n_chars (tiny
    vocab → repeated lengths), empty sides (all-en or all-fr corpora →
    the 0-division guard), a third language that must be excluded, and
    NULL-text rows contributing n_chars = 0 ties."""
    _check(spark, "q_quality_ks", {"documents": lambda p: _write_lang_documents(rows, p)})


@given(rows=lang_docs_st)
@settings(**_SETTINGS)
def test_fuzz_tokenizer_fertility(spark, rows):
    """Fertility on adversarial slices: zero-token documents (empty
    text / NULL text → the ws_tokens = 0 guard), languages with one
    document, token soup identical across langs."""
    _check(spark, "q_tokenizer_fertility", {"documents": lambda p: _write_lang_documents(rows, p)})


@given(rows=lang_docs_st)
@settings(**_SETTINGS)
def test_fuzz_group_topk_freq(spark, rows):
    """Grouped top-k on tie-heavy counts: a 5-token vocabulary forces
    equal-count ties (the tok ASC tie-break decides rank), languages
    with fewer than 3 distinct tokens, and NULL texts that contribute
    nothing."""
    _check(spark, "q_group_topk_freq", {"documents": lambda p: _write_lang_documents(rows, p)})


@given(rows=lang_docs_st)
@settings(**_SETTINGS)
def test_fuzz_dedup_prefix_exact(spark, rows):
    """Prefix-key audit on adversarial texts: every text is shorter
    than the 64-char key (prefix == text → zero false merges by
    construction), duplicate texts across docs, NULL texts excluded on
    both engines."""
    _check(spark, "q_dedup_prefix_exact", {"documents": lambda p: _write_lang_documents(rows, p)})


def test_quality_ks_large_counts_no_overflow(spark):
    """Round-8 advisor fix: ks_ppm's 1e6·d_num rescale wraps BIGINT
    once n_a·n_b·1e6 > 2^63 (~3.04M docs per side at worst-case D=1);
    Spark wrapped silently while DuckDB raised. Both sides now run the
    cross-products and the rescale in 128-bit-safe intermediates
    (DECIMAL(38,0) / HUGEINT). Disjoint supports (en all n_chars=1,
    fr all 2) force D = 1, so d_num = n_a·n_b = 9.61e12 and the old
    formula's 1e6·d_num = 9.61e18 > 2^63."""
    n_side = 3_100_000

    def write(path: str) -> None:
        con = duckdb.connect()
        con.execute(
            f"""
            COPY (
              SELECT CAST(range AS BIGINT) AS doc_id, 'x' AS text,
                     CASE WHEN range < {n_side} THEN 'en' ELSE 'fr' END AS lang,
                     'web' AS source,
                     CAST(CASE WHEN range < {n_side} THEN 1 ELSE 2 END AS BIGINT)
                       AS n_chars
              FROM range({2 * n_side})
            ) TO '{path}' (FORMAT PARQUET)
            """
        )
        con.close()

    d = _fuzz_dir({"documents": write})
    try:
        compare(spark, REGISTRY["q_quality_ks"], d)
        row = REGISTRY["q_quality_ks"].builder(spark, d).collect()[0]
        assert (row.n_a, row.n_b, row.ks_ppm) == (n_side, n_side, 1_000_000)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hybrid_rrf_zero_norm_embedding_raises(spark):
    """Round-8 advisor fix: a zero-norm embedding makes the dense-arm
    cosine 0/0. The declarative fallback raises (ANSI DIVIDE_BY_ZERO)
    and DuckDB NULLs, so the numpy kernel must not silently emit NaN —
    np.lexsort would trim NaN from the local pool while Spark/DuckDB
    desc ordering ranks NaN first. The kernel now fails loudly."""
    import pytest

    def write_docs(path: str) -> None:
        _write_rich_documents(
            [["alpha", "beta", "gamma", "delta", "epsilon"]], path
        )

    def write_vecs(path: str) -> None:
        _write_embeddings(
            [[1.0] * 64, [0.0] * 64, [0.5] * 64],  # vec_id 1 is zero-norm
            path,
        )

    d = _fuzz_dir({"documents": write_docs, "embeddings": write_vecs})
    try:
        with pytest.raises(Exception, match="zero-norm"):
            REGISTRY["q_hybrid_rrf"].builder(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pte_kernel_id_range_guard():
    """Round-8 advisor fix: the PTE kernel's packed (s·2³² + t) edge key
    silently collides when vertex ids exceed 2³² — it must fail loudly
    instead. In-range inputs keep counting exactly."""
    import pytest

    from duckdb_pst_spark.operators.recursive import _pte_count_kernel

    ok = pd.DataFrame(
        {
            "s": [1, 2],
            "bs": [0, 0],
            "nt": [[2, 3], [3]],
            "nbt": [[0, 0], [0]],
        }
    )
    out = _pte_count_kernel(ok)
    # triangle 1-2-3, all three vertices in bucket 0 → one c1 triangle
    assert (int(out.c1[0]), int(out.c2[0]), int(out.c3[0])) == (1, 0, 0)

    bad = pd.DataFrame(
        {
            "s": [1],
            "bs": [0],
            "nt": [[2, 1 << 32]],
            "nbt": [[0, 0]],
        }
    )
    with pytest.raises(ValueError, match="packed-key range"):
        _pte_count_kernel(bad)


# ------------------------------------------------- round-8 additions

def _write_ol_pair(rows: list[tuple[int, int, int, float]], path_o: str, path_l: str) -> None:
    """Joined orders+lineitem slice for the Q4/Q12 family.

    rows: (orderkey, priority_idx, ship_lag_days, price). Order dates
    march through the Q4 quarter INCLUDING its edges; ship_lag lands
    ON the 90-day lateness boundary (the >= must behave identically
    through Spark interval arithmetic and DuckDB INTERVAL). Every 7th
    order has NO lines (EXISTS must drop it); line prices sit at the
    floor-scaling boundary (x.xx5)."""
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[0] % 17 for r in rows],
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [100.0] * len(rows),
            "o_orderdate": [
                datetime.datetime(1996, 1, 1)
                + datetime.timedelta(days=(r[0] * 13) % 120)  # spills past Mar 31
                for r in rows
            ],
            "o_orderpriority": [pri[r[1] % 5] for r in rows],
        }
    )
    keep = [r for i, r in enumerate(rows) if r[0] % 7 != 0]
    l = pd.DataFrame(
        {
            "l_orderkey": [r[0] for r in keep],
            "l_partkey": [r[0] % 11 for r in keep],
            "l_suppkey": [r[0] % 5 for r in keep],
            "l_linenumber": [1] * len(keep),
            "l_quantity": [float(r[0] % 50) for r in keep],
            "l_extendedprice": [r[3] for r in keep],
            "l_discount": [0.05] * len(keep),
            "l_tax": [0.0] * len(keep),
            "l_returnflag": ["R" if r[0] % 2 else "N" for r in keep],
            "l_linestatus": ["O" if r[0] % 3 else "F" for r in keep],
            "l_shipdate": [
                datetime.datetime(1996, 1, 1)
                + datetime.timedelta(days=(r[0] * 13) % 120 + r[2])
                for r in keep
            ],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,"
        " CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus,"
        " o_totalprice, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,"
        " o_orderpriority FROM pdf",
        o,
        path_o,
    )
    _copy_to_parquet(
        "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,"
        " CAST(l_partkey AS BIGINT) AS l_partkey,"
        " CAST(l_suppkey AS BIGINT) AS l_suppkey,"
        " CAST(l_linenumber AS INTEGER) AS l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM pdf",
        l,
        path_l,
    )


ol_st = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=60),
        st.integers(min_value=0, max_value=4),
        st.sampled_from([0, 89, 90, 91, 120]),  # lateness boundary
        st.sampled_from([0.01, 99.995, 100.005, 9999.99]),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)


@given(rows=ol_st)
@settings(**_SETTINGS)
def test_fuzz_tpch_q4(spark, rows):
    """Q4 lateness EXISTS on the 90-day boundary: ship_lag exactly 89/
    90/91 days (>= must agree through Spark INTERVAL vs DuckDB
    INTERVAL), orders with no lines, quarter-edge order dates."""
    d = _fuzz_dir({})
    try:
        for t in ("orders", "lineitem"):
            os.unlink(os.path.join(d, f"{t}.parquet"))
        _write_ol_pair(
            rows, os.path.join(d, "orders.parquet"), os.path.join(d, "lineitem.parquet")
        )
        compare(spark, REGISTRY["q_tpch_q4"], d)
        compare(spark, REGISTRY["q_tpch_q12"], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _write_skew_lineitem(mults: list[int], path: str) -> None:
    """lineitem with per-key multiplicities `mults` — key i repeats
    mults[i] times (one hot key saturates max_key_share_ppm at 10⁶
    when len==1)."""
    keys = [i for i, m in enumerate(mults) for _ in range(m)]
    l = pd.DataFrame(
        {
            "l_orderkey": keys,
            "l_partkey": [k % 7 for k in keys],
            "l_suppkey": [k % 3 for k in keys],
            "l_linenumber": [1] * len(keys),
            "l_quantity": [1.0] * len(keys),
            "l_extendedprice": [1.0] * len(keys),
            "l_discount": [0.0] * len(keys),
            "l_tax": [0.0] * len(keys),
            "l_returnflag": ["N"] * len(keys),
            "l_linestatus": ["O"] * len(keys),
            "l_shipdate": [EPOCH] * len(keys),
        }
    )
    _copy_to_parquet(
        "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,"
        " CAST(l_partkey AS BIGINT) AS l_partkey,"
        " CAST(l_suppkey AS BIGINT) AS l_suppkey,"
        " CAST(l_linenumber AS INTEGER) AS l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM pdf",
        l,
        path,
    )


@given(mults=st.lists(st.sampled_from([1, 1, 2, 3, 4, 7, 8, 64]), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_fuzz_join_key_skew(spark, mults):
    """Skew audit on adversarial multiplicities: single-key tables
    (max share = 10⁶ ppm exactly), power-of-two counts sitting ON
    log2 bucket edges (floor(log2(8)) must bucket as 3 in both
    engines), all-unique tables (one bucket 0 row)."""
    _check(spark, "q_join_key_skew", {"lineitem": lambda p: _write_skew_lineitem(mults, p)})


def _write_class_documents(rows: list[tuple[int, int, int, int]], path: str) -> None:
    """Documents whose text is a deterministic char-class soup:
    (source_idx, n_alpha, n_digit, n_space). Includes empty texts
    (all-zero rows → the sum(n)=0 guard when a whole source is empty)
    and every-5th NULL text."""
    texts = [
        None if i % 5 == 4 else ("a" * r[1] + "7" * r[2] + " " * r[3])
        for i, r in enumerate(rows)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": texts,
            "lang": ["en"] * len(rows),
            "source": [f"s{r[0] % 3}" for r in rows],
            "n_chars": [0 if t is None else len(t) for t in texts],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,"
        " CAST(n_chars AS BIGINT) AS n_chars FROM pdf",
        pdf,
        path,
    )


class_docs_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=class_docs_st)
@settings(**_SETTINGS)
def test_fuzz_char_class_profile(spark, rows):
    """Char-class profile on adversarial soups: empty texts, all-digit
    sources, a source whose every kept text is '' (sum(n)=0 → the
    guard yields 0 ppm on both engines instead of NULL-vs-error)."""
    _check(spark, "q_char_class_profile", {"documents": lambda p: _write_class_documents(rows, p)})


@given(mults=st.lists(st.sampled_from([1, 2, 5, 5, 8]), min_size=1, max_size=15))
@settings(**_SETTINGS)
def test_fuzz_tpch_q17_q15_degenerate(spark, mults):
    """Q17/Q15 on degenerate slices: every line of a part has IDENTICAL
    quantity (sum = qty·cnt, so the strict 5·qty·cnt < sum threshold
    excludes everything — the empty-aggregate NULL/0 row must match
    across engines), and every shipdate sits OUTSIDE Q15's quarter
    (empty revenue view → scalar max over empty → zero rows on both
    engines)."""
    writers = {"lineitem": lambda p: _write_skew_lineitem(mults, p)}
    d = _fuzz_dir(writers)
    try:
        compare(spark, REGISTRY["q_tpch_q17"], d)
        compare(spark, REGISTRY["q_tpch_q15"], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _write_q21_pair(rows: list[tuple[int, int, int, int]], path_o: str, path_l: str) -> None:
    """Orders+lineitem slice for the Q21 waiting-supplier family.

    rows: (orderkey, n_supps, late_bits, status_idx). Each order gets
    n_supps lines from suppkeys 0..n-1; supplier i's line is late iff
    bit i of late_bits (lag 91d) else lag 89d — one day each side of
    the 90-day boundary, so single-supplier orders (EXISTS must drop),
    all-late orders (NOT EXISTS must drop) and exactly-one-late orders
    (the countable class) are all generated, under every orderstatus."""
    status = ["F", "O", "P"]
    o = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[0] % 17 for r in rows],
            "o_orderstatus": [status[r[3] % 3] for r in rows],
            "o_totalprice": [100.0] * len(rows),
            "o_orderdate": [
                EPOCH + datetime.timedelta(days=r[0] % 40) for r in rows
            ],
            "o_orderpriority": ["3-MEDIUM"] * len(rows),
        }
    )
    lk, ls, lag = [], [], []
    for r in rows:
        n = max(1, r[1] % 4)
        for i in range(n):
            lk.append(r[0])
            ls.append(i % 10)
            lag.append(91 if (r[2] >> i) & 1 else 89)
    l = pd.DataFrame(
        {
            "l_orderkey": lk,
            "l_partkey": [k % 11 for k in lk],
            "l_suppkey": ls,
            "l_linenumber": [1] * len(lk),
            "l_quantity": [1.0] * len(lk),
            "l_extendedprice": [10.0] * len(lk),
            "l_discount": [0.0] * len(lk),
            "l_tax": [0.0] * len(lk),
            "l_returnflag": ["N"] * len(lk),
            "l_linestatus": ["O"] * len(lk),
            "l_shipdate": [
                EPOCH + datetime.timedelta(days=k % 40 + d)
                for k, d in zip(lk, lag)
            ],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,"
        " CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus,"
        " o_totalprice, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,"
        " o_orderpriority FROM pdf",
        o,
        path_o,
    )
    _copy_to_parquet(
        "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,"
        " CAST(l_partkey AS BIGINT) AS l_partkey,"
        " CAST(l_suppkey AS BIGINT) AS l_suppkey,"
        " CAST(l_linenumber AS INTEGER) AS l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM pdf",
        l,
        path_l,
    )


q21_st = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=30),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=2),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda r: r[0],
)


@given(rows=q21_st)
@settings(**_SETTINGS)
def test_fuzz_tpch_q21(spark, rows):
    """Q21 on adversarial order compositions: the decorrelated window
    form (n_supp/n_late collect_sets) must match DuckDB's literal
    EXISTS + NOT-EXISTS on single-supplier orders, all-late orders,
    orders one day each side of the lateness boundary, and every
    orderstatus."""
    d = _fuzz_dir({})
    try:
        for t in ("orders", "lineitem"):
            os.unlink(os.path.join(d, f"{t}.parquet"))
        _write_q21_pair(
            rows, os.path.join(d, "orders.parquet"), os.path.join(d, "lineitem.parquet")
        )
        compare(spark, REGISTRY["q_tpch_q21"], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _write_offers_lineitem(rows: list[tuple[int, int, int]], path: str) -> None:
    """lineitem as a raw offer book for the Q2/Q11/Q16/Q20 bridge
    family: (partkey, suppkey, price_idx) with a TIE-HEAVY price set
    (several suppliers hit the identical min cost — Q2 must return
    ALL of them) and quantities cycling 1..3 (Q20's HAVING boundary,
    Q11's value arithmetic)."""
    prices = [1.0, 1.0, 1.005, 2.0, 2.0, 99.99]
    l = pd.DataFrame(
        {
            "l_orderkey": range(len(rows)),
            "l_partkey": [r[0] % 200 for r in rows],
            "l_suppkey": [r[1] % 10 for r in rows],
            "l_linenumber": [1] * len(rows),
            "l_quantity": [float(1 + i % 3) for i in range(len(rows))],
            "l_extendedprice": [prices[r[2] % len(prices)] for r in rows],
            "l_discount": [0.0 if r[2] % 2 else 0.5 for r in rows],
            "l_tax": [0.0] * len(rows),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": [
                datetime.datetime(1996, 6, 1) + datetime.timedelta(days=i % 300)
                for i in range(len(rows))
            ],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,"
        " CAST(l_partkey AS BIGINT) AS l_partkey,"
        " CAST(l_suppkey AS BIGINT) AS l_suppkey,"
        " CAST(l_linenumber AS INTEGER) AS l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM pdf",
        l,
        path,
    )


offers_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=250),
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=offers_st)
@settings(**_SETTINGS)
def test_fuzz_tpch_bridge_family(spark, rows):
    """Q2/Q11/Q16/Q20 on an adversarial offer book: min-cost ties
    across suppliers (Q2 returns all), 50%-discount floors at the
    half-cent boundary, single-line parts, values vs the div-800
    threshold on tiny totals (Q11's strict > at the boundary), and
    HAVING sums exactly at Q20's cutoff."""
    writers = {"lineitem": lambda p: _write_offers_lineitem(rows, p)}
    d = _fuzz_dir(writers)
    try:
        for q in ("q_tpch_q2", "q_tpch_q11", "q_tpch_q16", "q_tpch_q20"):
            compare(spark, REGISTRY[q], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _write_q22_customer(rows: list[tuple[int, int, int]], path_c: str, path_o: str) -> None:
    """customer+orders for Q22: (custkey, nation_idx, bal_idx) with a
    tie-heavy balance set (ALL-EQUAL pools make the strict above-mean
    test empty — both engines must agree on zero groups), negative and
    boundary-cent balances, and orders alternating recent/old so the
    lapsed anti-join sees both sides."""
    bals = [-5.0, 0.0, 0.005, 100.0, 100.0, 100.0, 9999.99]
    c = pd.DataFrame(
        {
            "c_custkey": [r[0] for r in rows],
            "c_name": [f"Customer#{r[0]:09d}" for r in rows],
            "c_nationkey": [[2, 5, 9, 13, 0, 1][r[1] % 6] for r in rows],
            "c_acctbal": [bals[r[2] % len(bals)] for r in rows],
            "c_mktsegment": ["BUILDING"] * len(rows),
        }
    )
    o = pd.DataFrame(
        {
            "o_orderkey": range(len(rows)),
            "o_custkey": [r[0] for r in rows],
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [100.0] * len(rows),
            "o_orderdate": [
                datetime.datetime(2000, 1, 1)
                if r[0] % 2
                else datetime.datetime(1999, 12, 31)
                for r in rows
            ],
            "o_orderpriority": ["3-MEDIUM"] * len(rows),
        }
    )
    _copy_to_parquet(
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,"
        " CAST(c_nationkey AS INTEGER) AS c_nationkey, c_acctbal,"
        " c_mktsegment FROM pdf",
        c,
        path_c,
    )
    _copy_to_parquet(
        "SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,"
        " CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus,"
        " o_totalprice, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,"
        " o_orderpriority FROM pdf",
        o,
        path_o,
    )


q22_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda r: r[0],
)


@given(rows=q22_st)
@settings(**_SETTINGS)
def test_fuzz_tpch_q22(spark, rows):
    """Q22 on adversarial pools: all-equal balances (strict > mean →
    empty output must match), balances at the floor-cent boundary,
    negative-only pools (n=0 positive rows never occurs by
    construction in testdata, but all-negative pools here exercise
    the empty-threshold row), and 2000-01-01 boundary order dates on
    the lapsed anti-join."""
    d = _fuzz_dir({})
    try:
        for t in ("customer", "orders"):
            os.unlink(os.path.join(d, f"{t}.parquet"))
        _write_q22_customer(
            rows, os.path.join(d, "customer.parquet"), os.path.join(d, "orders.parquet")
        )
        compare(spark, REGISTRY["q_tpch_q22"], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


_YEAR_EDGES = [
    datetime.datetime(1995, 12, 31),
    datetime.datetime(1996, 1, 1),
    datetime.datetime(1996, 12, 31, 23, 0),
    datetime.datetime(1997, 1, 1),
    datetime.datetime(1997, 12, 31, 23, 59),
    datetime.datetime(1998, 1, 1),
    datetime.datetime(2000, 6, 15, 12, 30),
]


def _write_year_edge_pair(rows: list[tuple[int, int, int, int]], path_o: str, path_l: str) -> None:
    """orders+lineitem for the Q7/Q8/Q9 year-extraction family:
    (orderkey, odate_idx, sdate_idx, supp_idx) with order and ship
    dates pinned ON window edges (1996-01-01 / 1998-01-01) and at
    23:xx on Dec 31 — year(ts) must be zone-free under the hostile
    America/New_York probe session, where an LTZ mistake would shift
    Dec 31 23:00 into the next year."""
    o = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[0] % 150 for r in rows],
            "o_orderstatus": ["F" if r[0] % 2 else "O" for r in rows],
            "o_totalprice": [100.0] * len(rows),
            "o_orderdate": [_YEAR_EDGES[r[1] % len(_YEAR_EDGES)] for r in rows],
            "o_orderpriority": ["3-MEDIUM"] * len(rows),
        }
    )
    l = pd.DataFrame(
        {
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[0] % 200 for r in rows],
            "l_suppkey": [r[3] % 10 for r in rows],
            "l_linenumber": [1] * len(rows),
            "l_quantity": [float(1 + r[0] % 50) for r in rows],
            "l_extendedprice": [1000.005] * len(rows),
            "l_discount": [0.05 * (r[0] % 3) for r in rows],
            "l_tax": [0.0] * len(rows),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": [_YEAR_EDGES[r[2] % len(_YEAR_EDGES)] for r in rows],
        }
    )
    _copy_to_parquet(
        "SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,"
        " CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus,"
        " o_totalprice, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,"
        " o_orderpriority FROM pdf",
        o,
        path_o,
    )
    _copy_to_parquet(
        "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,"
        " CAST(l_partkey AS BIGINT) AS l_partkey,"
        " CAST(l_suppkey AS BIGINT) AS l_suppkey,"
        " CAST(l_linenumber AS INTEGER) AS l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM pdf",
        l,
        path_l,
    )


year_edge_st = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda r: r[0],
)


@given(rows=year_edge_st)
@settings(**_SETTINGS)
def test_fuzz_tpch_year_extraction(spark, rows):
    """Q7/Q8/Q9 on year-edge dates: window predicates exactly AT the
    half-open boundaries, and year() over Dec-31-23:xx timestamps —
    the zone-free extraction must agree across engines under the
    hostile-timezone test session."""
    d = _fuzz_dir({})
    try:
        for t in ("orders", "lineitem"):
            os.unlink(os.path.join(d, f"{t}.parquet"))
        _write_year_edge_pair(
            rows, os.path.join(d, "orders.parquet"), os.path.join(d, "lineitem.parquet")
        )
        for q in ("q_tpch_q7", "q_tpch_q8", "q_tpch_q9"):
            compare(spark, REGISTRY[q], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------- round-9 FLOOR harmonization

def test_raw_quantity_cast_divergence_is_real(spark):
    """The reason the round-9 FLOOR harmonization exists, pinned as a
    fact: CAST(DOUBLE AS BIGINT) rounds half-away-from-zero in DuckDB
    but truncates in Spark, so any oracle/builder pair using the raw
    cast on a fractional column diverges. FLOOR-then-cast agrees."""
    assert duckdb.sql("SELECT CAST(25.5::DOUBLE AS BIGINT)").fetchone()[0] == 26
    assert spark.sql("SELECT CAST(25.5D AS BIGINT)").collect()[0][0] == 25
    assert duckdb.sql("SELECT CAST(FLOOR(25.5::DOUBLE) AS BIGINT)").fetchone()[0] == 25
    assert spark.sql("SELECT CAST(FLOOR(25.5D) AS BIGINT)").collect()[0][0] == 25


def test_fractional_quantities_floor_harmonized(spark):
    """Round-9 advisor fix (round-8 ADVICE medium): Q9/Q11/Q20 —
    plus the pre-batch Q17/Q18 and q_profile_columns — used the raw
    BIGINT cast on l_quantity in their oracles/builders; on the
    integral-quantity generated corpora that is invisible, on a
    fractional corpus the engines disagree on every x.5 row (and at
    Q20's strict HAVING sum > 25 boundary a single half-up round flips
    membership). This corpus adds +0.25/+0.5/+0.75 offsets to the REAL
    sf0.001 lineitem (all join keys stay valid), so every one of the
    six harmonized queries must still hash-match its oracle."""
    def write(path: str) -> None:
        con = duckdb.connect()
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (
                l_quantity + [0.0, 0.25, 0.5, 0.75][(l_orderkey % 4) + 1]
                  AS l_quantity)
              FROM read_parquet('{BASE}/lineitem.parquet')
            ) TO '{path}' (FORMAT PARQUET)
            """
        )
        con.close()

    d = _fuzz_dir({"lineitem": write})
    try:
        for q in (
            "q_tpch_q9",
            "q_tpch_q11",
            "q_tpch_q17",
            "q_tpch_q18",
            "q_tpch_q20",
            "q_profile_columns",
        ):
            compare(spark, REGISTRY[q], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------------- round-11 additions

def _write_co_pair(rows: list[tuple[int, int, float, int]],
                   path_c: str, path_o: str) -> None:
    """Joined customer+orders slice for the Q13/Q22 family.

    rows: (custkey, n_orders, acctbal, priority_idx). Adversarial
    cases the generated corpora never produce: ORDERLESS customers
    (n_orders=0 — Q13's LEFT OUTER must emit c_count=0 through the
    NULL-skipping count), all-URGENT customers (the join-condition
    residual drops every order: c_count=0 by residual, not by
    absence), acctbal at the exact integer-division threshold
    boundary (Q22's `acctbal_c > s div n` must agree bit-for-bit),
    and order dates straddling the 2000-01-01 lapse window."""
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    c = pd.DataFrame(
        {
            "c_custkey": [r[0] for r in rows],
            "c_name": [f"c{r[0]}" for r in rows],
            "c_nationkey": [r[0] % 25 for r in rows],
            "c_acctbal": [r[2] for r in rows],
            "c_mktsegment": ["BUILDING" if r[0] % 2 else "MACHINERY"
                             for r in rows],
        }
    )
    o_rows = []
    for ck, n, _bal, p in rows:
        for j in range(n):
            o_rows.append(
                (
                    ck * 1000 + j,
                    ck,
                    pri[(p + j) % 5],
                    # straddle the Q22 lapse window edge
                    datetime.datetime(1999, 12, 30)
                    + datetime.timedelta(days=(ck + j) % 5),
                )
            )
    o = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in o_rows] or [0],
            "o_custkey": [r[1] for r in o_rows] or [0],
            "o_orderstatus": ["O"] * max(len(o_rows), 1),
            "o_totalprice": [100.0] * max(len(o_rows), 1),
            "o_orderdate": [r[3] for r in o_rows]
            or [datetime.datetime(1996, 1, 1)],
            "o_orderpriority": [r[2] for r in o_rows] or ["5-LOW"],
        }
    )
    if not o_rows:  # keep the (valid) empty-orders case representable
        o = o.iloc[0:0]
    _copy_to_parquet(
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,"
        " CAST(c_nationkey AS INTEGER) AS c_nationkey, c_acctbal,"
        " c_mktsegment FROM pdf",
        c,
        path_c,
    )
    _copy_to_parquet(
        # VARCHAR casts are load-bearing: an EMPTY pandas object column
        # registers in DuckDB as INTEGER, which would write int32
        # o_orderstatus/o_orderpriority for the zero-order case
        "SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,"
        " CAST(o_custkey AS BIGINT) AS o_custkey,"
        " CAST(o_orderstatus AS VARCHAR) AS o_orderstatus,"
        " CAST(o_totalprice AS DOUBLE) AS o_totalprice,"
        " CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,"
        " CAST(o_orderpriority AS VARCHAR) AS o_orderpriority FROM pdf",
        o,
        path_o,
    )


co_st = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=0, max_value=4),          # incl. ORDERLESS
        st.sampled_from([-1.0, 0.0, 0.005, 49.995, 50.0, 50.005, 7000.0]),
        st.integers(min_value=0, max_value=4),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda r: r[0],
)


@given(rows=co_st)
@settings(**_SETTINGS)
def test_fuzz_tpch_q13_q22(spark, rows):
    """Q13's NULL-count path (orderless + all-URGENT customers give
    c_count=0 via two different mechanisms) and Q22's exact-integer
    above-mean boundary + lapse-window edge, on the same adversarial
    customer/orders slice. The bucketed twins share these oracles
    verbatim and are rows-equal-gated to the plains, so fuzzing the
    plains covers the family's semantics."""
    d = _fuzz_dir({})
    try:
        for t in ("customer", "orders"):
            os.unlink(os.path.join(d, f"{t}.parquet"))
        _write_co_pair(
            rows,
            os.path.join(d, "customer.parquet"),
            os.path.join(d, "orders.parquet"),
        )
        compare(spark, REGISTRY["q_tpch_q13"], d)
        compare(spark, REGISTRY["q_tpch_q22"], d)
    finally:
        shutil.rmtree(d, ignore_errors=True)
