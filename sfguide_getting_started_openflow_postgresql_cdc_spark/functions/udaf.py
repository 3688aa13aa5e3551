"""Custom aggregates (SURVEY §2.J UDAF surface).

The reference defines no UDFs/UDAFs — every aggregate it runs is a SQL
built-in — so this module exists to prove the ENGINE surface: a
GROUPED_AGG pandas UDF participates in groupBy()/agg() beside built-ins
and windows, receiving each group's values as one Arrow batch.

Determinism note (the part that actually takes care): a grouped-agg UDF
sees its group's values in PARTITION-DEPENDENT order, so any
order-sensitive accumulation (float sums, first/last) would flake under
repartitioning. The aggregate below SORTS inside the UDF before
accumulating, making the result a pure function of the value multiset —
the same discipline the decimal-sum shims apply to built-in SUMs.

GROUPED_AGG UDFs hold one group per invocation in memory (no partial
aggregation); at 100 TB that bounds group size, not corpus size — fine
for per-key groups, wrong for global aggregates (use built-ins there).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def gini(col: Column | str) -> Column:
    """Gini concentration coefficient of a group's values (0 = all
    equal, ->1 = one value dominates) — the inequality stat used for
    revenue/suppler-concentration reports. Exact formula over the
    sorted values: sum_i((2i - n - 1) * x_i) / (n * sum(x)); sorted
    ascending inside the UDF, so the result is partition-order
    independent."""

    @F.pandas_udf("double")
    def _gini(xs: pd.Series) -> float:
        import numpy as _np

        v = _np.sort(xs.to_numpy(_np.float64))
        n = len(v)
        if n == 0:
            return float("nan")
        total = v.sum()
        if total == 0.0:
            return 0.0
        i = _np.arange(1, n + 1, dtype=_np.float64)
        return float(((2.0 * i - n - 1.0) * v).sum() / (n * total))

    return _gini(F.col(col) if isinstance(col, str) else col)
