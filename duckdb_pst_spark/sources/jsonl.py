"""JSONL (newline-delimited JSON) ingest — the interchange format every
training-data pipeline actually receives (crawler dumps, provider
exports, eval suites all ship as .jsonl[.gz]).

Design mirrors the PST source's error-tolerance stance (A18): a corrupt
line must never kill a 100 TB ingest. Spark reads PERMISSIVE with an
explicit schema — malformed lines surface as all-null rows tagged in
``_corrupt_record`` and are counted, not thrown; DuckDB's oracle reads
the same file with ``ignore_errors`` and explicit columns, so both
engines agree on the VALID row set exactly. Schema-on-read with an
EXPLICIT schema is deliberate: schema inference is a full extra pass at
scale and infers differently between engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_FIX_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".cache", "jsonl")

JSONL_SCHEMA = "doc_id long, text string, lang string, n_tokens long, _corrupt_record string"
N_VALID = 240
N_CORRUPT = 3


def fixture_path() -> str:
    """Deterministic JSONL fixture: {240} valid docs over 4 langs with a
    trailing-field curveball, plus {3} strictly-non-JSON lines (the
    crawler-truncation case)."""
    os.makedirs(_FIX_DIR, exist_ok=True)
    p = os.path.join(_FIX_DIR, "docs.jsonl")
    marker = os.path.join(_FIX_DIR, ".v1")
    if os.path.exists(p) and os.path.exists(marker):
        return p
    langs = ["en", "de", "fr", "zh"]
    lines = []
    for i in range(N_VALID):
        lang = langs[i % 4]
        text = f"doc {i} body " + "tok " * (i % 9)
        lines.append(
            '{"doc_id": %d, "text": "%s", "lang": "%s", "n_tokens": %d}'
            % (i, text.strip(), lang, 3 + i % 9)
        )
        if i % 80 == 79:  # interleave the corrupt lines deterministically
            lines.append('{"doc_id": ' + "x" * 20)  # truncated mid-object
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    open(marker, "w").write("1")
    return p


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """PERMISSIVE schema'd JSONL scan: valid rows parse, malformed lines
    land in ``_corrupt_record`` with data columns null. The scan is
    line-splittable, so a 100 TB .jsonl directory parallelizes like any
    text source; explicit schema keeps it one pass."""
    return (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
