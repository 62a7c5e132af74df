"""ethereum2_etl_airflow_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
blockchain-etl/ethereum2-etl-airflow (the reference delegates all query
execution to BigQuery; see SURVEY.md §0).  Everything here is expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
explicit schemas, Hive-style date partitioning, ANSI-mode verify SQL and
AQE-friendly shuffle settings sized for a 100 TB / 1000-executor target.

Layout
------
- ``session``     : tuned SparkSession builder (UTC, AQE, ANSI knobs)
- ``config``      : chain/pipeline configuration (analog of the reference's
                    Airflow-variable resolution, ``variables.py:6-64``)
- ``sources``     : schema-enforced NDJSON/parquet scans + schema translator
- ``operators``   : load/verify/relational/dedup/similarity/text/multimodal
- ``functions``   : beacon chain-time column math, vector math
- ``plans``       : plan-inspection helpers (pushdown/broadcast assertions)
- ``streaming``   : Structured Streaming analog of the hourly cron DAGs
- ``dags``        : Airflow DAG builders (import-gated; Airflow optional)
"""

__version__ = "0.1.0"
