"""Skew-handling join helper: key salting.

AQE's skew-join handling (enabled in session.py) covers sort-merge
joins at runtime; explicit salting is the deterministic fallback when a
handful of hot keys dominate a shuffle (the classic 100 TB failure mode:
one executor gets the 'null'/'unknown' key's terabyte).

``salted_join`` replicates the small side ``salt`` times and spreads the
big side's rows across salt buckets, so a hot key's rows land on
``salt`` tasks instead of one. Use only for measured skew — it
multiplies the small side's shuffle volume by ``salt``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``key``, salted ``salt`` ways.

    Each big row picks one bucket (any is correct — the small side is
    replicated into all of them); unmatched-left semantics survive, so
    'inner' and 'left' are supported. 'right'/'full' would duplicate
    unmatched small rows across buckets — rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_s = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").alias("_salt"))
        )
    )
    joined = big_s.join(small_s, on=[key, "_salt"], how=how)
    return joined.drop("_salt")
