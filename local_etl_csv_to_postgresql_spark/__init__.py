"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL project (`local-etl-csv-to-postgresql`).

The reference (see /root/reference, SURVEY.md) is a pandas + psycopg2 +
PostgreSQL star-schema ETL. This package re-expresses every operator it
implements as idiomatic Spark DataFrame / Spark SQL, designed for a
multi-executor cluster:

- ``sources``    — CSV extraction, structural validation, synthetic data
- ``operators``  — standardization, validation rules, dedup, dimension
                   builds, surrogate keys, warehouse load protocol
- ``functions``  — scale-out extensions: text analysis, fuzzy dedup
                   (MinHash/SimHash), similarity search, multimodal columns
- ``plans``      — the Q1-Q20 analytics query library + corpus runner
- ``streaming``  — incremental / Structured Streaming idempotent append
"""

__version__ = "0.1.0"
