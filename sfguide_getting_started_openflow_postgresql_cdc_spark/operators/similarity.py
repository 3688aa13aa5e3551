"""Similarity search over embedding columns (array<float>).

North-star extensions: brute-force cosine top-k as the exact baseline,
and a random-hyperplane LSH-bucketed variant as the scale path.

Numeric determinism: floats widen to double (exact), the dot product is
a strict left fold over the array (``F.aggregate``), and sqrt/div are
correctly-rounded IEEE ops — verified bit-identical to DuckDB's
``list_cosine_similarity`` for all cross pairs, so exact similarity
values ship in the oracle-checked output.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table

N_QUERIES = 5  # vec_id < 5 act as the query set
TOP_K = 10

# Multi-band random-hyperplane LSH (OR-amplification): a pair is a
# candidate if it collides in ANY band. For sign-bit LSH,
# P(bit match) = 1 - theta/pi, so with r bits per band and b bands
# P(candidate) = 1 - (1 - p^r)^b. The testdata's true neighbors sit at
# cosine ~0.35-0.60 (p ~ 0.61-0.70): 4 bands x 2 bits gives ~85-92%
# recall there. On a production corpus where near-dups are tight
# (cosine >= 0.9, p ~ 0.86) raise BAND_BITS to 6-8 for the same recall
# with far fewer collisions — the knobs trade recall for bucket size.
N_BANDS = 4
BAND_BITS = 2


def dot(a: Column, b: Column) -> Column:
    """Strict left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(a: Column) -> Column:
    """||a|| — hoist this into a per-vector projection before pairwise
    joins: sqrt(dot(a,a)) yields the identical double wherever computed,
    so ``dot(a,b)/(norm_a*norm_b)`` is bit-identical to :func:`cosine`
    while folding each array once per PAIR instead of three times
    (measured 3x on all-pairs workloads)."""
    return F.sqrt(dot(a, a))


# --- Arrow-vectorized twins -------------------------------------------------
#
# F.aggregate/zip_with are HigherOrderFunctions: Catalyst interprets the
# lambda per element (no codegen), which made the 8-plane bucket pass the
# single most expensive projection in the repo (~2.3 s for 1M lambda
# evals at sf0.1). The pandas-UDF twins below run the SAME arithmetic as
# the fold — accumulate dimension-by-dimension in index order, each step
# an elementwise IEEE double op over the batch — so results are
# BIT-IDENTICAL to the fold (asserted exhaustively in
# tests/test_extensions.py::test_arrow_paths_bit_identical_to_folds) while
# running as numpy loops over Arrow batches. UDF bodies are self-contained
# closures: workers never import this package.


def arrow_dot(a: Column, b: Column) -> Column:
    """Pairwise dot product, bit-identical to ``dot`` (left fold)."""

    @F.pandas_udf("double")
    def _dot(xs: pd.Series, ys: pd.Series) -> pd.Series:
        import numpy as _np

        if len(xs) == 0:
            return pd.Series([], dtype="float64")
        mx = _np.stack(xs.to_numpy()).astype(_np.float64)
        my = _np.stack(ys.to_numpy()).astype(_np.float64)
        acc = _np.zeros(len(mx), dtype=_np.float64)
        for i in range(mx.shape[1]):  # index order == the fold's order
            acc = acc + mx[:, i] * my[:, i]
        return pd.Series(acc)

    return _dot(a, b)


def arrow_norm(a: Column) -> Column:
    """||a||, bit-identical to ``norm`` (IEEE sqrt of the exact fold)."""

    @F.pandas_udf("double")
    def _norm(xs: pd.Series) -> pd.Series:
        import numpy as _np

        if len(xs) == 0:
            return pd.Series([], dtype="float64")
        m = _np.stack(xs.to_numpy()).astype(_np.float64)
        acc = _np.zeros(len(m), dtype=_np.float64)
        for i in range(m.shape[1]):
            acc = acc + m[:, i] * m[:, i]
        return pd.Series(_np.sqrt(acc))

    return _norm(a)


def arrow_band_buckets(embedding: Column, planes: list[list[float]]) -> Column:
    """All N_BANDS band buckets in one pass -> ``array<long>``,
    bit-identical to per-band :func:`band_bucket` (same accumulation
    order per plane dot; only the >= 0 sign reaches the bucket)."""
    n_bands, band_bits = N_BANDS, BAND_BITS
    plane_rows = [list(map(float, p)) for p in planes]

    @F.pandas_udf("array<long>")
    def _buckets(xs: pd.Series) -> pd.Series:
        import numpy as _np

        if len(xs) == 0:
            return pd.Series([], dtype="object")
        m = _np.stack(xs.to_numpy()).astype(_np.float64)  # n x dim
        p = _np.array(plane_rows, dtype=_np.float64)  # P x dim
        acc = _np.zeros((len(m), len(p)), dtype=_np.float64)
        for i in range(m.shape[1]):
            acc = acc + m[:, i : i + 1] * p[:, i]
        bits = acc >= 0.0
        out = _np.zeros((len(m), n_bands), dtype=_np.int64)
        for band in range(n_bands):
            for j in range(band_bits):
                out[:, band] += bits[:, band * band_bits + j].astype(_np.int64) << j
        return pd.Series(list(out))

    return _buckets(embedding)


@query(
    "sim1_knn_cosine_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ),
    s AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
                 AS similarity
      FROM embeddings e, q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, similarity, CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY similarity DESC, neighbor_id) AS rnk
      FROM s
    ) WHERE rnk <= {TOP_K}
    """,
)
def sim1_knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, stream the corpus
    past it (no corpus shuffle), rank per query. At 100 TB the corpus
    scan dominates and parallelizes linearly; the per-query top-k uses a
    ranking window over a corpus already reduced to (n_queries x corpus)
    similarity rows — for large query sets switch to the LSH variant."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "en", arrow_norm(F.col("embedding"))  # hoisted: one pass per vector
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("en").alias("qn"),
    )
    sim = arrow_dot(F.col("embedding"), F.col("qv")) / (F.col("en") * F.col("qn"))
    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("similarity"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def _band_planes(dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, N_BANDS * BAND_BITS rows
    (seeded, engine-side constant — broadcast as literals into the plan
    AND into the DuckDB oracle SQL, so both engines bucket identically)."""
    import numpy as np

    rs = np.random.RandomState(7)
    return rs.standard_normal((N_BANDS * BAND_BITS, dim)).tolist()


def band_bucket(embedding: Column, planes: list[list[float]], band: int) -> Column:
    """Bucket id for one band: BAND_BITS sign bits of plane dot products."""
    bucket = F.lit(0).cast("long")
    for j in range(BAND_BITS):
        plane = planes[band * BAND_BITS + j]
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(embedding, lit_plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long")
    return bucket


def band_bucket_sql(planes: list[list[float]], band: int, emb_expr: str = "embedding") -> str:
    """DuckDB twin of :func:`band_bucket` — the plane constants are
    emitted as float literals (repr = shortest round-trip, parses back to
    the identical double), so the oracle buckets exactly as the engine
    does. ``list_dot_product`` matches the strict left fold bit-for-bit
    (same property as ``list_cosine_similarity``, verified in parity)."""
    terms = []
    for j in range(BAND_BITS):
        plane = planes[band * BAND_BITS + j]
        arr = "[" + ", ".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({emb_expr}::DOUBLE[], {arr}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def banded_sql_cte() -> str:
    """Shared oracle CTE: one (vec_id, band_id, bucket) row per vector
    per band over the embeddings table."""
    planes = _band_planes()
    arms = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_id, {band_bucket_sql(planes, b)} AS bucket "
        "FROM embeddings"
        for b in range(N_BANDS)
    )
    return f"banded AS ({arms})"


@query(
    "sim2_knn_lsh_bucketed",
    oracle=f"""
    WITH {banded_sql_cte()},
    q AS (
      SELECT vec_id AS query_id, band_id, bucket FROM banded
      WHERE vec_id < {N_QUERIES}
    ),
    cand AS (
      SELECT DISTINCT c.vec_id AS neighbor_id, q.query_id
      FROM banded c
      JOIN q ON c.band_id = q.band_id AND c.bucket = q.bucket
            AND c.vec_id <> q.query_id
    ),
    s AS (
      SELECT cand.query_id, cand.neighbor_id,
             list_cosine_similarity(x.embedding::DOUBLE[],
                                    y.embedding::DOUBLE[]) AS similarity
      FROM cand
      JOIN embeddings x ON x.vec_id = cand.neighbor_id
      JOIN embeddings y ON y.vec_id = cand.query_id
    )
    SELECT query_id, neighbor_id, similarity, CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY similarity DESC, neighbor_id) AS rnk
      FROM s
    ) WHERE rnk <= {TOP_K}
    """,
)
def sim2_knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: multi-band random-hyperplane LSH (N_BANDS bands of
    BAND_BITS sign bits, OR-amplified — a neighbor is a candidate if it
    shares ANY band bucket with the query, fixing the single-band recall
    cliff at bucket boundaries). Ranking computes exact cosine on
    candidates only.

    Plan at 100 TB: the banding pass is a pure projection + posexplode
    (no shuffle, xN_BANDS rows); the candidate join is map-side against a
    BROADCAST of the banded query set; only candidate (query, neighbor,
    sim) rows — nothing quadratic — reach the dedup + ranking shuffle."""
    planes = _band_planes()
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "en", arrow_norm(F.col("embedding"))
    )
    banded = emb.select(
        "vec_id",
        "embedding",
        "en",
        F.posexplode(arrow_band_buckets(F.col("embedding"), planes)).alias(
            "band_id", "bucket"
        ),
    )
    q = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("en").alias("qn"),
        "band_id",
        "bucket",
    )
    sim = arrow_dot(F.col("embedding"), F.col("qv")) / (F.col("en") * F.col("qn"))
    cands = (
        banded.join(F.broadcast(q), on=["band_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("similarity"),
        )
        # a pair colliding in several bands yields bit-identical duplicate
        # rows (same deterministic sim) — distinct dedups them
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


N_IVF_CELLS = 16
# 6/16 probes: the testdata embeddings are near-uniform (no cluster
# structure), so recall tracks the probe fraction — 6 probes measures
# ~0.82 recall@10 with the unbiased hash-ordered training sample while
# still cutting pairwise work ~2.7x; real clustered corpora need fewer.
N_PROBE = 6
IVF_LLOYD_ITERS = 5


def train_ivf_centroids(sample, n_cells: int, n_iters: int = IVF_LLOYD_ITERS):
    """Spherical k-means quantizer: seeds = the first ``n_cells`` sample
    rows, then ``n_iters`` Lloyd passes over the (normalized) sample —
    assign by max dot product, recompute means, keep the previous
    centroid for any emptied cell. Deterministic (no RNG): same sample
    -> same quantizer, which keeps the IVF operators replayable.

    Driver-side numpy on a sample x dim matrix — the sample is a few
    hundred rows regardless of corpus size (at 100 TB you'd lift the
    sample with ``df.limit``/TABLESAMPLE exactly the same way; only the
    assignment of the CORPUS is distributed).

    Returns the row-normalized centroid matrix (n_cells x dim).
    """
    import numpy as np

    def _norm_rows(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    sample = np.asarray(sample, dtype=np.float64)
    sn = _norm_rows(sample)
    centroids_n = _norm_rows(sample[:n_cells].copy())
    for _ in range(n_iters):
        cells = (sn @ centroids_n.T).argmax(axis=1)
        centroids_n = _norm_rows(
            np.stack(
                [
                    sn[cells == i].mean(axis=0)
                    if (cells == i).any()
                    else centroids_n[i]
                    for i in range(n_cells)
                ]
            )
        )
    return centroids_n


@query("sim4_knn_ivf")  # rows-only: kmeans assignment is engine-side
def sim4_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path.

    1. Train: spherical k-means ({IVF_LLOYD_ITERS} Lloyd passes over a
       deterministic 512-row sample, ``train_ivf_centroids``) gives
       {N_IVF_CELLS} centroids (driver-side math on a tiny k x dim
       matrix; corpus assignment is a vectorized Arrow-batched pandas UDF
       — numpy matmul per batch, no per-row Python).
    2. Index: each vector joins its nearest cell (one projection; at
       100 TB this is the partitioning column of the stored index).
    3. Search: each query probes its {N_PROBE} nearest cells and ranks
       exact cosine only within them — pairwise work drops by
       ~cells/probes vs brute force, recall bounded by cell locality.
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")

    # --- train: spherical k-means over a deterministic 512-row sample.
    # Hash-ordered, NOT a vec_id prefix: ingestion order correlates with
    # content in real corpora (crawls are time/domain-ordered), so a
    # prefix sample trains a biased quantizer; md5 ordering is a seeded
    # uniform draw with the same determinism (TakeOrdered, no full sort).
    sample = [
        r["embedding"]
        for r in emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(512)
        .collect()
    ]
    centroids_n = train_ivf_centroids(sample, N_IVF_CELLS)

    # --- index: vectorized cell assignment (closure ships by value) ----
    cn = centroids_n.tolist()

    @F.pandas_udf("int")
    def nearest_cell(col: pd.Series) -> pd.Series:
        import numpy as _np

        c = _np.array(cn)
        m = _np.stack(col.to_numpy())
        m = m / _np.maximum(_np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ c.T).argmax(axis=1).astype("int32"))

    indexed = emb.withColumn("cell", nearest_cell(F.col("embedding")))

    # --- search: queries probe their N_PROBE nearest cells --------------
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    probe_pairs = []
    for r in q_rows:
        qv = np.array(r["embedding"], dtype=np.float64)
        qv /= max(np.linalg.norm(qv), 1e-12)
        order = (qv @ centroids_n.T).argsort()[::-1][:N_PROBE]
        probe_pairs.extend((int(r["vec_id"]), int(c)) for c in order)
    probes = spark.createDataFrame(probe_pairs, "query_id long, cell int")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("qn"),
    )
    sim = dot(F.col("embedding"), F.col("qv")) / (
        norm(F.col("embedding")) * F.col("qn")
    )
    cands = (
        indexed.join(F.broadcast(probes), "cell")
        .join(F.broadcast(queries), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("similarity"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


# Fixed-point scale for exact float accumulation: every float32 component
# in the testdata times 2^45 is an exact integer (verified across all sf
# dirs), so sums are order-independent with NO decimal rounding — a
# decimal(38,10)-style cast would hit round-half ties on float mantissas.
_FIXED_POINT = float(1 << 45)


@query(
    "sim3_pairwise_label_centroids",
    oracle=f"""
    WITH e AS (
      SELECT label, unnest(embedding::DOUBLE[]) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    )
    SELECT label, COUNT(DISTINCT i) AS dim,
           CAST(SUM(CAST(x * {_FIXED_POINT:.1f} AS DECIMAL(38,0))) AS DOUBLE)
               / {_FIXED_POINT:.1f} AS component_sum
    FROM e GROUP BY label
    """,
)
def sim3_pairwise_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding aggregate (centroid precursor — the reduce
    step of IVF coarse quantization). Components accumulate as exact
    2^45-scaled integers (see _FIXED_POINT) so the sum is independent of
    partitioning/merge order at any cluster size."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("i", "x")
    )
    fixed = (F.col("x").cast("double") * F.lit(_FIXED_POINT)).cast("decimal(38,0)")
    return ex.groupBy("label").agg(
        F.countDistinct("i").alias("dim"),
        (F.sum(fixed).cast("double") / F.lit(_FIXED_POINT)).alias("component_sum"),
    )


N_CENTROIDS = 8


@query(
    "sim7_kmeans_assign",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS cv
      FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {N_CENTROIDS}
    ),
    sims AS (
      SELECT e.vec_id, c.centroid_id,
             list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[])
                 AS sim
      FROM embeddings e CROSS JOIN cent c
    )
    SELECT vec_id, centroid_id, sim AS similarity
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, centroid_id) AS rn
      FROM sims
    ) WHERE rn = 1
    """,
)
def sim7_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means ASSIGNMENT step: every vector -> its most-cosine-
    similar centroid, seeds drawn deterministically as the first
    N_CENTROIDS vectors in md5(vec_id) order (the same de-biased
    hash-order sample the IVF trainer uses — a prefix of vec_ids would
    inherit generator ordering bias). This is the inner loop of
    k-means / IVF training and of cluster-balanced corpus sampling.

    Scale shape: the centroid table is tiny -> broadcast; the corpus
    streams past it (no corpus shuffle) and the argmax folds INSIDE the
    per-vector aggregation via max(struct(sim, -centroid_id)) — the
    k candidate rows collapse map-side (partial agg) before the one
    vec_id-keyed exchange, instead of sorting k rows per key in a
    ranking window. Ties break to the lowest centroid_id, exactly the
    oracle's ORDER BY sim DESC, centroid_id.

    Numeric note: centroids COME FROM the corpus, so self-pairs hit the
    one case where the raw ``dot/(||a||*||b||)`` exceeds 1 by an ulp
    (1.0000000000000002) while DuckDB's list_cosine_similarity CLAMPS
    to [-1, 1] (probed: identical vectors -> exactly 1.0, antipodal ->
    exactly -1.0, generic pairs -> the unclamped sqrt*sqrt value). The
    same clamp is applied here; sim1/sim2 exclude self-pairs, so they
    never see it."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "en", arrow_norm(F.col("embedding"))
    )
    cent = (
        emb.select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cv"),
            F.col("en").alias("cn"),
        )
        .orderBy(F.md5(F.col("centroid_id").cast("string")))
        .limit(N_CENTROIDS)  # TakeOrderedAndProject: no global sort
    )
    sim = F.greatest(
        F.lit(-1.0),
        F.least(
            F.lit(1.0),
            arrow_dot(F.col("embedding"), F.col("cv"))
            / (F.col("en") * F.col("cn")),
        ),
    )
    best = F.max(
        F.struct(
            F.col("sim").alias("s"), (-F.col("centroid_id")).alias("negid")
        )
    )
    return (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", "centroid_id", sim.alias("sim"))
        .groupBy("vec_id")
        .agg(best.alias("_b"))
        .select(
            "vec_id",
            (-F.col("_b.negid")).alias("centroid_id"),
            F.col("_b.s").alias("similarity"),
        )
    )


KMEANS_MAX_ITERS = 8


def kmeans_fit(spark: SparkSession, emb: DataFrame, k: int = 8,
               max_iters: int = KMEANS_MAX_ITERS):
    """Distributed spherical k-means over the FULL corpus — the scale
    path past ``train_ivf_centroids`` (which Lloyd-iterates a driver
    sample): here every pass streams the whole embedding table, so it
    works when even a training sample can't represent the corpus.

    Determinism is engineered, not hoped for:
    - seeds = first ``k`` vectors in md5(vec_id) order (de-biased, same
      rule as IVF), renumbered by seed vec_id so tie-breaks mean
      "lowest seed vec_id" exactly like sim7;
    - the assignment dot products accumulate DIMENSION-BY-DIMENSION in
      index order (elementwise numpy, never BLAS gemm, whose blocking
      — and therefore rounding — can vary with Arrow batch size);
    - centroid updates accumulate per (cluster, dim) in DECIMAL(38,18)
      — order-independent exact sums — so the new centroids are
      bit-identical under ANY partitioning/batching; one double
      division + driver-side normalization per dim closes the loop.
    - iteration stops when the centroid matrix reproduces itself
      (exact comparison — meaningful only because the sums are exact).

    Returns ``(cluster_ids, centroids, assigned, history)``: seed-derived
    cluster ids, the final row-normalized k x dim matrix, the UNCOLLECTED
    final assignment frame (vec_id, cluster_id, sim), and per-iteration
    [(n_changed_centroids, mean_sim)] history.
    """
    import numpy as np

    def _norm_rows(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    seeds = sorted(
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cluster_ids = [int(r["vec_id"]) for r in seeds]
    centroids = _norm_rows(
        np.array([list(r["embedding"]) for r in seeds], dtype=np.float64)
    )
    dim = centroids.shape[1]

    embp = emb.select("vec_id", "embedding").persist()

    def _assign_col(cn):
        """(cluster index, cosine to it) via fixed-order accumulation."""
        rows = [list(map(float, c)) for c in cn]

        @F.pandas_udf("struct<cluster:int,sim:double>")
        def _assign(xs: pd.Series) -> pd.DataFrame:
            import numpy as _np
            import pandas as _pd

            if len(xs) == 0:
                return _pd.DataFrame({"cluster": _pd.Series([], dtype="int32"),
                                      "sim": _pd.Series([], dtype="float64")})
            m = _np.stack(xs.to_numpy()).astype(_np.float64)
            c = _np.array(rows, dtype=_np.float64)
            acc = _np.zeros((len(m), len(c)), dtype=_np.float64)
            nx = _np.zeros(len(m), dtype=_np.float64)
            for i in range(m.shape[1]):  # index order == arrow_dot's fold
                acc = acc + m[:, i : i + 1] * c[:, i]
                nx = nx + m[:, i] * m[:, i]
            best = acc.argmax(axis=1)  # first max -> lowest seed vec_id
            sim = acc[_np.arange(len(m)), best] / _np.sqrt(nx)
            return _pd.DataFrame(
                {"cluster": best.astype("int32"), "sim": sim}
            )

        return _assign

    history = []
    for _ in range(max_iters):
        assigned = embp.withColumn(
            "_a", _assign_col(centroids.tolist())(F.col("embedding"))
        ).select(
            "vec_id", "embedding",
            F.col("_a.cluster").alias("cluster"),
            F.col("_a.sim").alias("sim"),
        )
        stats = (
            assigned.select(
                "cluster", "sim", F.posexplode("embedding").alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.col("v").cast("decimal(38,18)")).alias("s"),
                F.count("*").alias("n"),
                F.sum(
                    F.when(F.col("dim") == 0,
                           F.col("sim").cast("decimal(38,18)"))
                ).alias("simsum"),
            )
            .collect()
        )
        new = centroids.copy()
        sums = np.zeros((k, dim)); counts = np.zeros(k, dtype=np.int64)
        # simsum rows arrive in partition-dependent order; the decimals
        # are exact, so accumulate in Decimal (associative) and convert
        # ONCE — a float += here would make the "bit-identical history"
        # invariant depend on collect order
        from decimal import Decimal

        simsum_d = Decimal(0)
        for r in stats:
            sums[r["cluster"], r["dim"]] = float(r["s"])
            counts[r["cluster"]] = r["n"]
            if r["simsum"] is not None:
                simsum_d += r["simsum"]
        simsum = float(simsum_d)
        n_rows = int(counts.sum())
        for j in range(k):
            if counts[j]:
                new[j] = sums[j] / counts[j]
        new = _norm_rows(new)
        moved = int((~np.isclose(new, centroids, rtol=0, atol=0)).any(axis=1).sum())
        history.append((moved, simsum / max(n_rows, 1)))
        if np.array_equal(new, centroids):
            break
        centroids = new

    final = embp.withColumn(
        "_a", _assign_col(centroids.tolist())(F.col("embedding"))
    ).select(
        "vec_id",
        F.element_at(
            F.array(*[F.lit(c) for c in cluster_ids]),
            F.col("_a.cluster") + 1,
        ).alias("cluster_id"),
        F.col("_a.sim").alias("sim"),
    )
    embp.unpersist()
    return cluster_ids, centroids, final, history


@query("sim8_kmeans_fit")  # rows-only: iterative algorithm, no SQL twin
def sim8_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full distributed k-means FIT (Lloyd iterations to convergence or
    KMEANS_MAX_ITERS) and the resulting cluster summary: members and
    decimal-exact mean cosine per cluster. Iteration 0 starts from
    sim7's seeds and tie rule (seeds are renormalized, so per-pair sims
    differ only in final-ulp rounding); later iterations move the
    centroids, so no closed-form SQL oracle exists -> rows-only driver
    check, with convergence/determinism/quality gates in
    tests/test_extensions.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    _, _, assigned, _ = kmeans_fit(spark, emb, k=N_CENTROIDS)
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            (
                F.sum(F.col("sim").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("mean_sim"),
        )
    )


N_NEGATIVES = 3


@query(
    "sim9_contrastive_pairs",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ),
    s AS (
      SELECT q.query_id, e.vec_id,
             list_cosine_similarity(e.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[]) AS similarity
      FROM embeddings e, q WHERE e.vec_id <> q.query_id
    ),
    pos AS (
      SELECT query_id, vec_id, similarity FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY similarity DESC, vec_id) AS rn
        FROM s
      ) WHERE rn = 1
    ),
    neg AS (
      SELECT query_id, vec_id, similarity FROM (
        SELECT s.*, ROW_NUMBER() OVER (PARTITION BY s.query_id
                 ORDER BY md5(CAST(s.query_id AS VARCHAR) || ':' ||
                              CAST(s.vec_id AS VARCHAR)), s.vec_id) AS rn
        FROM s LEFT JOIN pos p
          ON p.query_id = s.query_id AND p.vec_id = s.vec_id
        WHERE p.vec_id IS NULL
      ) WHERE rn <= {N_NEGATIVES}
    )
    SELECT query_id, vec_id, 'pos' AS role, similarity FROM pos
    UNION ALL
    SELECT query_id, vec_id, 'neg' AS role, similarity FROM neg
    """,
)
def sim9_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair MINING for embedding training: per anchor, the
    hardest positive (most-similar corpus vector) plus N_NEGATIVES
    hash-deterministic random negatives — the (anchor, pos, negs) tuples
    a contrastive/metric-learning dataloader consumes. Negatives are
    drawn by md5(query:candidate) order, so the sample is uniform-ish,
    reproducible across engines/retries, and excludes the positive.

    Scale shape: identical to sim1 — anchors broadcast, one linear
    corpus pass computes all similarities, and BOTH selections (top-1
    by similarity, N by hash) are ranking windows over the same
    per-anchor candidate rows; the corpus is never shuffled."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "en", arrow_norm(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("en").alias("qn"),
    )
    sim = arrow_dot(F.col("embedding"), F.col("qv")) / (
        F.col("en") * F.col("qn")
    )
    s = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("similarity"))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("vec_id")
    )
    ranked = s.withColumn("_pos_rn", F.row_number().over(wp))
    pos = ranked.filter(F.col("_pos_rn") == 1).drop("_pos_rn")
    wn = Window.partitionBy("query_id").orderBy(
        F.md5(
            F.concat_ws(
                ":",
                F.col("query_id").cast("string"),
                F.col("vec_id").cast("string"),
            )
        ),
        F.col("vec_id"),
    )
    neg = (
        ranked.filter(F.col("_pos_rn") > 1)  # everything but the positive
        .withColumn("_neg_rn", F.row_number().over(wn))
        .filter(F.col("_neg_rn") <= N_NEGATIVES)
        .drop("_pos_rn", "_neg_rn")
    )
    return pos.select(
        "query_id", "vec_id", F.lit("pos").alias("role"), "similarity"
    ).unionByName(
        neg.select(
            "query_id", "vec_id", F.lit("neg").alias("role"), "similarity"
        )
    )


# --- corpus-size-scaled banding (the raise-BAND_BITS knob, realized) -------
#
# The fixed sim2/sim6/dd6 parameters (4 bands x 2 bits) are pinned by
# their oracles; the sf1 checkpoint records their collision cost growing
# quadratically in bucket occupancy (BASELINE.md §similarity). These
# parametrized twins realize the documented fix — more bits per band ->
# exponentially more buckets -> occupancy (and the candidate join) held
# constant as the corpus grows — with the same plane-literal oracle
# construction, so the scaled variant is oracle-checked too.

SCALED_N_BANDS = 4
SCALED_BAND_BITS = 6  # 64 buckets/band: ~10x corpus at sf0.1 occupancy


def scaled_planes(dim: int = 64) -> list[list[float]]:
    """Deterministic hyperplanes for the scaled config (seed differs
    from _band_planes so the two configs are independent draws)."""
    import numpy as np

    rs = np.random.RandomState(11)
    return rs.standard_normal((SCALED_N_BANDS * SCALED_BAND_BITS, dim)).tolist()


def arrow_band_buckets_param(
    embedding: Column, planes: list[list[float]], n_bands: int, band_bits: int
) -> Column:
    """Parametrized twin of :func:`arrow_band_buckets` (same per-dim
    accumulation order, any band geometry)."""
    plane_rows = [list(map(float, p)) for p in planes]

    @F.pandas_udf("array<long>")
    def _buckets(xs: pd.Series) -> pd.Series:
        import numpy as _np

        if len(xs) == 0:
            return pd.Series([], dtype="object")
        m = _np.stack(xs.to_numpy()).astype(_np.float64)
        p = _np.array(plane_rows, dtype=_np.float64)
        acc = _np.zeros((len(m), len(p)), dtype=_np.float64)
        for i in range(m.shape[1]):
            acc = acc + m[:, i : i + 1] * p[:, i]
        bits = acc >= 0.0
        out = _np.zeros((len(m), n_bands), dtype=_np.int64)
        for band in range(n_bands):
            for j in range(band_bits):
                out[:, band] += bits[:, band * band_bits + j].astype(
                    _np.int64
                ) << j
        return pd.Series(list(out))

    return _buckets(embedding)


def band_bucket_sql_param(
    planes: list[list[float]], band: int, band_bits: int,
    emb_expr: str = "embedding",
) -> str:
    """Parametrized twin of :func:`band_bucket_sql`."""
    terms = []
    for j in range(band_bits):
        plane = planes[band * band_bits + j]
        arr = "[" + ", ".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({emb_expr}::DOUBLE[], {arr}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def scaled_banded_sql_cte() -> str:
    """Oracle CTE for the scaled band geometry."""
    planes = scaled_planes()
    arms = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_id, "
        f"{band_bucket_sql_param(planes, b, SCALED_BAND_BITS)} AS bucket "
        "FROM embeddings"
        for b in range(SCALED_N_BANDS)
    )
    return f"banded AS ({arms})"


# dd6's scaled geometry: occupancy-constant bits (5 -> 32 buckets/band)
# like sim10, but with the band COUNT raised 4 -> 12 to OR-amplify
# recall back to the 2-bit config's level. This is the textbook LSH
# scale rule: rows-per-band r is set by the similarity threshold (keeps
# per-band collision probability p^r, and with it bucket occupancy,
# O(1) in corpus size); band count b is then chosen for target recall
# 1-(1-p^r)^b. Candidate cost grows linearly in b, never quadratically
# in corpus — the trade dd6's pinned 2-bit config cannot make.
DD6_SCALED_N_BANDS = 12
DD6_SCALED_BAND_BITS = 5


def dd6_scaled_planes(dim: int = 64) -> list[list[float]]:
    """Deterministic hyperplanes for dd6's scaled config (independent
    seed from both _band_planes and scaled_planes)."""
    import numpy as np

    rs = np.random.RandomState(23)
    return rs.standard_normal(
        (DD6_SCALED_N_BANDS * DD6_SCALED_BAND_BITS, dim)
    ).tolist()


def dd6_scaled_banded_sql_cte() -> str:
    """Oracle CTE for dd6's scaled band geometry."""
    planes = dd6_scaled_planes()
    arms = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_id, "
        f"{band_bucket_sql_param(planes, b, DD6_SCALED_BAND_BITS)} AS bucket "
        "FROM embeddings"
        for b in range(DD6_SCALED_N_BANDS)
    )
    return f"banded AS ({arms})"
