"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as Arrow-batched pandas stages.

North-star extension. The container ships no image/audio codecs, so the
DECODE step is stubbed (``decode_media`` raises NotImplementedError
unless a codec import succeeds); everything Spark-side is real and
tested: binary column handling, metadata struct schema, ``mapInPandas``
batch iteration, output schema, and partition-preserving execution.

At 100 TB the pattern is: keep payloads as parquet binary columns
(columnar compression + predicate pushdown on the metadata columns
only), decode inside ``mapInPandas`` so bytes never leave the executor,
and emit fixed-width feature vectors for the similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table

N_HIST_BINS = 8

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, feature array<double>"
)


def decode_media(payload: bytes, kind: str):
    """Real decode hook — STUB. Wire an actual codec here when the
    runtime ships one (PIL for images, soundfile for audio, ...)."""
    try:  # gated optional dependency
        from PIL import Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "media decode requires a codec library (e.g. Pillow); "
            "not available in this runtime — use byte_histogram_features "
            "for the deterministic fake path"
        )
    raise NotImplementedError("codec present but decode not implemented yet")


def byte_histogram_features(payload: bytes, bins: int = N_HIST_BINS) -> list[float]:
    """Deterministic fake 'feature extractor': normalized byte-value
    histogram. Stands in for a real embedding so the Spark-side plumbing
    (batch shapes, schema, downstream joins) is fully exercised."""
    if not payload:
        return [0.0] * bins
    counts = [0] * bins
    for b in payload:
        counts[b * bins // 256] += 1
    n = len(payload)
    return [c / n for c in counts]


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: (doc_id, payload, kind) -> feature rows.
    Arrow-batched; bytes stay executor-local."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "feature": pdf["payload"].map(
                    lambda p: byte_histogram_features(p or b"")
                ),
            }
        )


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Model the documents table as a media table: payload = utf-8 bytes
    of the text (a stand-in binary column), plus typed metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("kind"),
        F.length(F.col("text")).alias("meta_n_chars"),
        F.col("lang").alias("meta_lang"),
    )


@query("mm1_media_features")  # rows-only: mapInPandas is not SQL-expressible
def mm1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: parquet -> binary payload +
    metadata -> Arrow-batched feature extraction -> fixed-width vectors.
    The plan stays partition-preserving (no shuffle): scan -> project ->
    mapInPandas.

    The pandas stage is a self-contained closure (no references to this
    package) so cloudpickle ships it BY VALUE — Spark's Python workers
    need no import path to our code, whatever environment the driver
    session runs in."""
    bins = N_HIST_BINS

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def hist(payload):
            if not payload:
                return [0.0] * bins
            counts = [0] * bins
            for byte in payload:
                counts[byte * bins // 256] += 1
            n = len(payload)
            return [c / n for c in counts]

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(lambda p: hist(p or b"")),
                }
            )

    # single-file source -> repartition so the Arrow-batched python
    # workers run in parallel instead of one worker eating every batch
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    media = with_media_columns(docs)
    return media.select("doc_id", "payload", "kind").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


@query(
    "mm2_media_metadata_stats",
    oracle="""
    SELECT lang AS meta_lang,
           COUNT(*) AS n_media,
           CAST(SUM(CAST(length(text) AS DECIMAL(38,4))) AS DOUBLE) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def mm2_media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over a media table: the payload column is never
    read (column pruning) — the access pattern that makes 100 TB media
    tables queryable."""
    media = with_media_columns(load_table(spark, sf_dir, "documents"))
    return media.groupBy("meta_lang").agg(
        F.count("*").alias("n_media"),
        F.sum(F.col("meta_n_chars").cast("decimal(38,4)"))
        .cast("double")
        .alias("total_chars"),
    )
