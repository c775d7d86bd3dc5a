"""PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
``palladiumkenya/dwh-etl-ods-spark-jobs`` (see SURVEY.md), re-expressed as
idiomatic PySpark DataFrame/SQL operators planned by Catalyst, plus
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Layout:
    session      -- SparkSession factory tuned for the target workload
    sources      -- scan/sink abstractions (parquet, JDBC spec)
    operators    -- the core ETL operator library (dedupe, clean,
                    normalize, incremental anti-join, PII hashing, merge,
                    month spine)
    functions    -- T-SQL-compatible scalar function shims
    plans        -- declarative job catalog + runner (the reference's 48
                    jobs as data, not code)
    pipelines    -- LLM-data-pipeline operators (dedup family, similarity
                    search, text analysis, multimodal)
    streaming    -- Structured Streaming variants of the incremental load
"""

__version__ = "0.1.0"
