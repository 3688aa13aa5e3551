from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.shims import (
    decimal_avg,
    decimal_sum,
    listagg_distinct_ordered,
    nullif_zero,
    pct_of,
    sf_datediff_year,
    sf_dayname,
    sf_dayofweek,
    sf_timestampdiff_minute,
    to_time_string,
)

__all__ = [
    "decimal_avg",
    "decimal_sum",
    "listagg_distinct_ordered",
    "nullif_zero",
    "pct_of",
    "sf_datediff_year",
    "sf_dayname",
    "sf_dayofweek",
    "sf_timestampdiff_minute",
    "to_time_string",
]
