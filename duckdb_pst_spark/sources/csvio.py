"""CSV ingest — the other interchange format a data pipeline receives
(vendor exports, spreadsheet dumps, log extracts). The reference's own
import/export surface is DuckDB's built-ins (README.md:4 — "import to
DuckDB tables", which includes read_csv); this is the Spark twin with
the same error-tolerance stance as the JSONL source (A18): a malformed
row must never kill a 100 TB ingest.

Spark reads PERMISSIVE with an explicit schema — rows with a bad-typed
field, too many or too few columns become tagged ``_corrupt_record``
rows and are counted, not thrown; DuckDB's oracle reads the same file
with ``ignore_errors=true`` and explicit columns, so both engines agree
on the VALID row set exactly. Quoted fields carry embedded commas (the
RFC-4180 case both parsers handle identically); embedded NEWLINES are
deliberately absent — a multi-line CSV record breaks line-splittability,
which at 100 TB means single-task files; pipelines that need them
should land JSONL/parquet instead (documented trade, not an oversight).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "csv",
)

CSV_SCHEMA = "doc_id long, text string, lang string, n_tokens long, _corrupt_record string"
N_VALID = 260
N_CORRUPT = 3


def fixture_path() -> str:
    """Deterministic CSV fixture: {260} valid rows over 4 langs, every
    5th text quoted with embedded commas, plus {3} corrupt lines — a
    bad-typed id, an extra column, a missing column (the three ways a
    vendor export actually breaks)."""
    os.makedirs(_FIX_DIR, exist_ok=True)
    p = os.path.join(_FIX_DIR, "docs.csv")
    marker = os.path.join(_FIX_DIR, ".v2")
    if os.path.exists(p) and os.path.exists(marker):
        return p
    langs = ["en", "de", "fr", "zh"]
    lines = ["doc_id,text,lang,n_tokens"]
    for i in range(N_VALID):
        lang = langs[i % 4]
        if i % 5 == 0:
            text = f'"doc {i}, with a comma, body ' + ("tok " * (i % 7)).strip() + '"'
        else:
            text = (f"doc {i} body " + "tok " * (i % 7)).strip()
        lines.append(f"{i},{text},{lang},{3 + i % 9}")
        # interleave the corrupt lines deterministically — exactly the
        # documented three (round-9 advisor: the old i%90 form emitted
        # the bad-typed line twice, making 4)
        if i == 89:
            lines.append("notanumber,truncated vendor row,en,4")  # bad type
            lines.append("9001,extra col,en,4,SURPLUS")  # too many
        if i == 179:
            lines.append("9002,missing lang")  # too few
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    open(marker, "w").write("1")
    return p


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """PERMISSIVE schema'd CSV scan with header: valid rows parse,
    malformed rows land in ``_corrupt_record`` with data columns null.
    Explicit schema keeps ingest ONE pass (inference re-reads the file
    and infers differently between engines); the scan is line-splittable
    so a 100 TB .csv directory parallelizes like any text source."""
    return (
        spark.read.schema(CSV_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
