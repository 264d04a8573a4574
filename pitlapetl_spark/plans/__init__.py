"""Pipeline restatements — each reference DAG as one declarative Spark
job (SURVEY.md §7.1: job function ``(spark, params) -> DataFrame``)."""
