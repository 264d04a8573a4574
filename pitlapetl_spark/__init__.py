"""pitlapetl_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the query and data-processing
capabilities of the reference ETL project (RabbiNash/PitLapETL, an
Airflow + pandas + MongoDB pipeline; see SURVEY.md). Every implicit
operator in the reference's seven DAG task functions is re-expressed
as a declarative DataFrame / Spark SQL plan so Catalyst + Tungsten
pick the physical strategy, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
columns) the north star mandates.

Layout:
    session     — SparkSession factory tuned for local[N] and cluster use
    sources     — explicit-schema readers for the test parquet tables
    functions   — scalar expression helpers (native exprs, no UDFs)
    operators   — relational / nested / window / asof / dedup /
                  similarity / text / multimodal operator library
    plans       — the seven reference pipelines restated as Spark jobs
    sinks       — keyed-upsert / overwrite sink helpers
    streaming   — structured-streaming surface over the events table
    registry    — (name -> query fn, oracle SQL) registry consumed by
                  __spark_entry__.py
"""

__version__ = "0.1.0"
