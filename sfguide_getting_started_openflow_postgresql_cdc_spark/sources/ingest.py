"""Semi-structured corpus ingestion: JSONL / CSV -> typed documents.

A training-data pipeline's raw corpus rarely arrives as parquet — it
lands as JSONL (one document object per line) or CSV exports. This
module is the typed front door for those: DECLARED schemas (never
inferred — inference samples the data and can flip types between runs,
the A2 lesson), malformed-line QUARANTINE instead of job failure, and
normalization into the same ``documents`` shape the dedup/text/px
operators consume.

Scale notes: both readers are plain distributed file scans — JSONL and
CSV split by line, so a 100 TB corpus parallelizes by input split with
no driver involvement. PERMISSIVE mode keeps the scan single-pass:
malformed lines surface in ``_corrupt_record`` and are split off with
one filter, not a second read. The quarantine split is a column filter
on the same scan (two passes over cached/columnar data at worst), the
same refuse-don't-drop contract as the CDC merge's quarantine
(streaming/cdc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents contract (TESTDATA.md) + raw-ingest quarantine column
DOCUMENTS_INGEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus under the DECLARED documents schema.

    Returns ``(docs, quarantine)``:
    - ``docs``: well-formed rows normalized to the documents contract
      (``n_chars`` derived, so downstream operators see the exact table
      shape the parquet loader produces);
    - ``quarantine``: the raw text of every line that failed to parse
      or missed a required field (doc_id/text) — kept, never dropped,
      so ingest is lossless and auditable.

    A line that is valid JSON but wrong-typed (e.g. ``doc_id`` a
    string) lands in quarantine too: PERMISSIVE mode nulls the
    miscast field and preserves the raw line in ``_corrupt_record``
    only for unparseable JSON, so the required-field filter catches
    the rest.
    """
    raw = (
        spark.read.schema(DOCUMENTS_INGEST_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    bad = F.col("_corrupt_record").isNotNull() | F.col("doc_id").isNull() | F.col(
        "text"
    ).isNull()
    quarantine = raw.filter(bad).select(
        F.coalesce(
            F.col("_corrupt_record"),
            F.to_json(F.struct("doc_id", "text", "lang", "source")),
        ).alias("raw_line")
    )
    docs = (
        raw.filter(~bad)
        .select(
            "doc_id",
            "text",
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("unknown")).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    return docs, quarantine


def read_documents_csv(
    spark: SparkSession, path: str, sep: str = ","
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_documents_jsonl` — same declared schema,
    same quarantine contract (header expected; quoted fields may span
    lines only if the writer quoted them — standard CSV splitting)."""
    raw = (
        spark.read.schema(DOCUMENTS_INGEST_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", "true")
        .option("sep", sep)
        .csv(path)
    )
    bad = F.col("_corrupt_record").isNotNull() | F.col("doc_id").isNull() | F.col(
        "text"
    ).isNull()
    quarantine = raw.filter(bad).select(
        F.coalesce(
            F.col("_corrupt_record"),
            F.concat_ws(
                sep, "doc_id", "text", "lang", "source"
            ),
        ).alias("raw_line")
    )
    docs = raw.filter(~bad).select(
        "doc_id",
        "text",
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        F.coalesce(F.col("source"), F.lit("unknown")).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return docs, quarantine
