"""Generator operators (SURVEY.md §2.A5): ``generate_series`` +
deterministic derived columns.

The reference seeds data with ``generate_series(1,150)`` + RANDOM()
projections (sql/0.init_healthcare.sql:235-270). ``RANDOM()`` is not
cross-engine reproducible, so derived values come from md5 of the row id
— portable, seedable (prefix), and uniform enough for synthetic data.
``spark.range`` produces a distributed, splittable source: at cluster
scale a trillion-row generator parallelizes with no input at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query


@query(
    "a5_generate_series",
    oracle="""
    SELECT id,
           CAST(id % 10 AS BIGINT) AS bucket,
           md5('seed42|' || id::VARCHAR) AS token,
           CAST(('0x' || substr(md5('seed42|' || id::VARCHAR), 1, 4))::BIGINT
                AS DOUBLE) / 65535.0 AS uniform
    FROM range(1, 1001) t(id)
    """,
)
def a5_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data generator: range -> md5-derived pseudo-random columns
    (reference: generate_series + RANDOM() seeding,
    sql/0.init_healthcare.sql:235-270)."""
    ids = spark.range(1, 1001).select(F.col("id"))
    token = F.md5(F.concat(F.lit("seed42|"), F.col("id").cast("string")))
    uniform = (
        F.conv(F.substring(token, 1, 4), 16, 10).cast("double") / 65535.0
    )
    return ids.select(
        "id",
        F.pmod(F.col("id"), F.lit(10)).cast("long").alias("bucket"),
        token.alias("token"),
        uniform.alias("uniform"),
    )
