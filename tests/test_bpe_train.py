"""Reference-implementation pin for q_bpe_train: pure-python greedy BPE
over the same word-frequency sample must produce the identical merge
table — every rank, pair, and count."""

from __future__ import annotations

import collections

import duckdb

SF = "/root/testdata/sf0.001"


def _reference_bpe(words: dict[str, int], iters: int):
    state = {w: list(w) for w in words}
    merges = []
    for rank in range(iters):
        cnt: collections.Counter = collections.Counter()
        for w, syms in state.items():
            n = words[w]
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += n
        if not cnt:
            break
        # tie-break identical to the query: count desc, pair key asc
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x1f" + kv[0][1]))
        merges.append((rank, a, b, c))
        for w, syms in state.items():
            out, pend = [], ""
            for x in syms:
                if pend == "":
                    pend = x
                elif pend == a and x == b:
                    out.append(a + b)
                    pend = ""
                else:
                    out.append(pend)
                    pend = x
            if pend:
                out.append(pend)
            state[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    from duckdb_pst_spark.operators.text import _BPE_ITERS, _BPE_SAMPLE
    from duckdb_pst_spark.registry import load_all

    con = duckdb.connect()
    words = dict(
        con.execute(
            f"""
            SELECT w, count(*) FROM (
              SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w
              FROM '{SF}/documents.parquet' WHERE doc_id < {_BPE_SAMPLE}
            ) t GROUP BY w
            """
        ).fetchall()
    )
    expect = _reference_bpe(words, _BPE_ITERS)
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in load_all()["q_bpe_train"].builder(spark, SF).collect()
    ]
    assert got == expect, (got, expect)


def test_bpe_encode_matches_reference(spark):
    """Encoding the whole corpus with the learned merges: the per-lang
    char/symbol totals must equal a pure-python re-encode."""
    from duckdb_pst_spark.operators.text import _BPE_ITERS, _BPE_SAMPLE
    from duckdb_pst_spark.registry import load_all

    con = duckdb.connect()
    sample = dict(
        con.execute(
            f"""
            SELECT w, count(*) FROM (
              SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w
              FROM '{SF}/documents.parquet' WHERE doc_id < {_BPE_SAMPLE}
            ) t GROUP BY w
            """
        ).fetchall()
    )
    merges = _reference_bpe(sample, _BPE_ITERS)

    def encode(w: str) -> int:
        syms = list(w)
        for _, a, b, _c in merges:
            out, pend = [], ""
            for x in syms:
                if pend == "":
                    pend = x
                elif pend == a and x == b:
                    out.append(a + b)
                    pend = ""
                else:
                    out.append(pend)
                    pend = x
            if pend:
                out.append(pend)
            syms = out
        return len(syms)

    rows = con.execute(
        f"""
        SELECT lang, w, count(*) FROM (
          SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w
          FROM '{SF}/documents.parquet'
        ) t GROUP BY lang, w
        """
    ).fetchall()
    expect: dict[str, list[int]] = {}
    for lang, w, n in rows:
        e = expect.setdefault(lang, [0, 0, 0])
        e[0] += n
        e[1] += n * len(w)
        e[2] += n * encode(w)
    got = {
        r.lang: [r.word_instances, r.total_chars, r.total_syms]
        for r in load_all()["q_bpe_encode"].builder(spark, SF).collect()
    }
    assert got == expect, (got, expect)
