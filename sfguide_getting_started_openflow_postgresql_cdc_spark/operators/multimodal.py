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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table

N_HIST_BINS = 8

# Exploded (one row per histogram bin) rather than array<double>: scalar
# columns survive any downstream comparator/sink, and the shape becomes
# plain-SQL-expressible (the driver's oracle gate covers it).
FEATURE_SCHEMA = "doc_id long, kind string, n_bytes long, bin long, n_in_bin long"


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
    (batch shapes, schema, downstream joins) is fully exercised.

    Vectorized: ``frombuffer`` + ``bincount`` touch the payload once in C;
    never iterate Python-level over bytes in an Arrow-batched stage."""
    if not payload:
        return [0.0] * bins
    b = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount((b.astype(np.int64) * bins) >> 8, minlength=bins)
    return (counts / len(payload)).tolist()


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: (doc_id, payload, kind) -> one row per
    (doc, bin) with exact byte counts. Arrow-batched; bytes stay
    executor-local; the whole batch is histogrammed by ONE segmented
    ``bincount`` over ``row_index * bins + bucket`` — no per-row Python."""
    nb = N_HIST_BINS
    for pdf in batches:
        payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
        n = len(payloads)
        lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
        blob = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        counts = np.bincount(
            row * nb + ((blob.astype(np.int64) * nb) >> 8), minlength=n * nb
        )
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(np.int64), nb),
                "kind": np.repeat(pdf["kind"].to_numpy(object), nb),
                "n_bytes": np.repeat(lens, nb),
                "bin": np.tile(np.arange(nb, dtype=np.int64), n),
                "n_in_bin": counts.astype(np.int64),
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


@query(
    "mm1_media_features",
    oracle="""
    WITH e AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text))) AS i
      FROM documents
    ), bucketed AS (
      SELECT doc_id, (least(unicode(text[i]), 255) * 8) // 256 AS bin
      FROM e
    ), agg AS (
      SELECT doc_id, bin, COUNT(*) AS n_in_bin FROM bucketed GROUP BY 1, 2
    ), bins AS (
      SELECT unnest(generate_series(0, 7)) AS bin
    ), base AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
    )
    SELECT base.doc_id,
           'text/plain' AS kind,
           CAST(base.n_bytes AS BIGINT) AS n_bytes,
           CAST(bins.bin AS BIGINT) AS bin,
           CAST(COALESCE(agg.n_in_bin, 0) AS BIGINT) AS n_in_bin
    FROM base CROSS JOIN bins
    LEFT JOIN agg ON agg.doc_id = base.doc_id AND agg.bin = bins.bin
    """,
)
def mm1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: parquet -> binary payload +
    metadata -> Arrow-batched feature extraction -> exploded per-bin
    histogram rows. The plan stays partition-preserving (no shuffle):
    scan -> project -> mapInPandas.

    The whole Arrow batch is histogrammed by one segmented
    ``np.bincount`` over ``row_index * bins + bucket`` — zero Python-level
    byte iteration. Output is 8 scalar rows per doc (exact counts), which
    keeps every column comparator-safe and makes the op SQL-expressible.

    The oracle histograms unicode code points clamped to 255; the engine
    histograms raw utf-8 payload bytes. These agree on ASCII corpora
    (asserted true for all testdata SFs); the engine-side byte definition
    is the one that generalizes to real opaque media payloads.

    The pandas stage is a self-contained closure (no references to this
    package) so cloudpickle ships it BY VALUE — Spark's Python workers
    need no import path to our code, whatever environment the driver
    session runs in."""
    nb = N_HIST_BINS

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            n = len(payloads)
            lens = _np.fromiter((len(p) for p in payloads), dtype=_np.int64, count=n)
            blob = _np.frombuffer(b"".join(payloads), dtype=_np.uint8)
            row = _np.repeat(_np.arange(n, dtype=_np.int64), lens)
            counts = _np.bincount(
                row * nb + ((blob.astype(_np.int64) * nb) >> 8), minlength=n * nb
            )
            yield _pd.DataFrame(
                {
                    "doc_id": _np.repeat(pdf["doc_id"].to_numpy(_np.int64), nb),
                    "kind": _np.repeat(pdf["kind"].to_numpy(object), nb),
                    "n_bytes": _np.repeat(lens, nb),
                    "bin": _np.tile(_np.arange(nb, dtype=_np.int64), n),
                    "n_in_bin": counts.astype(_np.int64),
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


FRAME_BYTES = 256
SAMPLE_EVERY = 4


@query(
    "mm3_frame_sample",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    frames AS (
      SELECT doc_id, unnest(range(0, (n + {FRAME_BYTES} - 1) // {FRAME_BYTES}))
                 AS frame_idx
      FROM b WHERE n > 0
    ),
    sampled AS (
      SELECT doc_id, frame_idx FROM frames WHERE frame_idx % {SAMPLE_EVERY} = 0
    ),
    chars AS (
      SELECT doc_id, i - 1 AS pos, least(unicode(text[i]), 255) AS v
      FROM (
        SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
        FROM documents
      )
    )
    SELECT s.doc_id,
           CAST(s.frame_idx AS BIGINT) AS frame_idx,
           CAST(COUNT(c.v) AS BIGINT) AS n_frame_bytes,
           CAST(SUM(c.v) AS BIGINT) AS byte_sum
    FROM sampled s
    JOIN chars c
      ON c.doc_id = s.doc_id AND c.pos // {FRAME_BYTES} = s.frame_idx
    GROUP BY 1, 2
    """,
)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media payloads: treat each payload as
    fixed-{FRAME_BYTES}-byte frames, keep every {SAMPLE_EVERY}th frame,
    emit exact per-frame stats — the video-pipeline access pattern
    (decode only sampled frames) with the codec stubbed by a
    deterministic byte-sum 'feature' (decode_media is the real hook).

    Per Arrow batch: one ``np.frombuffer`` + one ``np.add.reduceat`` at
    the frame starts per payload — no Python-level byte iteration. The
    plan is scan -> mapInPandas, partition-preserving; at 100 TB frame
    stats land next to the payload row group that produced them."""
    fb, se = FRAME_BYTES, SAMPLE_EVERY

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            doc_ids, f_idx, f_len, f_sum = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                buf = _np.frombuffer(bytes(p) if p is not None else b"", _np.uint8)
                if buf.size == 0:
                    continue
                starts = _np.arange(0, buf.size, fb)
                sums = _np.add.reduceat(buf.astype(_np.int64), starts)
                lens = _np.diff(_np.append(starts, buf.size))
                keep = _np.arange(starts.size) % se == 0
                k = int(keep.sum())
                doc_ids.extend([doc_id] * k)
                f_idx.extend(_np.nonzero(keep)[0].tolist())
                f_len.extend(lens[keep].tolist())
                f_sum.extend(sums[keep].tolist())
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": _pd.Series(f_idx, dtype="int64"),
                    "n_frame_bytes": _pd.Series(f_len, dtype="int64"),
                    "byte_sum": _pd.Series(f_sum, dtype="int64"),
                }
            )

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    media = with_media_columns(docs)
    return media.select("doc_id", "payload").mapInPandas(
        _frames, schema="doc_id long, frame_idx long, n_frame_bytes long, byte_sum long"
    )
