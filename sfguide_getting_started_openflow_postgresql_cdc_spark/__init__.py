"""PySpark-native CDC analytics engine.

A from-scratch re-expression of the capabilities demonstrated by
``Snowflake-Labs/sfguide-getting-started-openflow-postgresql-cdc``
(PostgreSQL -> CDC -> warehouse -> analytics) on Apache Spark:

- ``sources``    : schema-explicit batch/stream readers (parquet, JSON-lines
                   change events).
- ``streaming``  : CDC core — snapshot bootstrap, keyed upsert merge with
                   soft deletes and ``_SNOWFLAKE_*`` metadata columns,
                   append-only journal, Structured Streaming wrapper.
- ``operators``  : the full analytics operator inventory (SURVEY.md §2) as
                   named DataFrame builders with DuckDB oracle twins, plus
                   LLM-data-pipeline extensions (dedup, similarity search,
                   text analysis, multimodal plumbing).
- ``functions``  : Snowflake<->Spark semantics shims (DATEDIFF(year),
                   DAYOFWEEK numbering, LISTAGG, TIME emulation).
- ``semantic``   : semantic-model catalog (tables, relationships, verified
                   queries) mirroring the reference's YAML semantic model.
- ``plans``      : plan inspection helpers (pushdown/broadcast assertions).

Everything is DataFrame/Spark-SQL first; Catalyst owns physical planning.
"""

from sfguide_getting_started_openflow_postgresql_cdc_spark.session import get_spark

__all__ = ["get_spark"]
