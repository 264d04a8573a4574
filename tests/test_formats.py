"""Source-format connector edge cases (operators/formats.py): ORC
scan efficiency and the text-format pitfalls (nulls in CSV, embedded
newlines in JSON-lines) that silently corrupt data at scale if the
reader options are wrong."""

from __future__ import annotations

from pyspark.sql import functions as F

from pitlapetl_spark import registry

registry.load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    """ORC must behave like parquet at scan time: the predicate
    reaches PushedFilters and the ReadSchema narrows to the selected
    columns — the properties that make a 100-TB ORC handover scan at
    parquet cost."""
    p = str(tmp_path / "t.orc")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.lit("pad").alias("pad")
    ).write.orc(p)
    df = spark.read.orc(p).filter(F.col("k") == 3).select("id")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "k" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "pad" not in read_schema


def test_csv_roundtrip_preserves_nulls_in_typed_columns(spark, tmp_path):
    """Nulls in numeric/timestamp columns must survive the CSV text
    roundtrip as nulls (not zeros or epoch) when read back through an
    explicit schema."""
    from pitlapetl_spark.operators.formats import _roundtrip

    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, None), (3, 0.0, "")],
        "id LONG, v DOUBLE, s STRING",
    )
    from pitlapetl_spark.operators.formats import CSV_OPTS
    back = _roundtrip(df, "csv", "id LONG, v DOUBLE, s STRING", CSV_OPTS)
    rows = {r.id: r for r in back.collect()}
    assert rows[2].v is None
    assert rows[3].v == 0.0
    # the documented CSV ambiguity: empty string and null both write
    # as the empty field, and the default reader maps BOTH back to
    # null for string columns — callers needing the distinction must
    # set nullValue/emptyValue explicitly. Pin the default so a
    # behavior change is caught.
    assert rows[2].s is None and rows[3].s is None


def test_jsonl_roundtrip_preserves_newlines_and_quotes(spark, tmp_path):
    """JSON-lines escapes embedded newlines/quotes inside values, so
    a multi-line document survives line-split parallel ingestion —
    the property that makes JSONL the crawl-dump format (a raw-text
    reader would shear the record)."""
    from pitlapetl_spark.operators.formats import _roundtrip

    tricky = 'line1\nline2\t"quoted" \\backslash'
    df = spark.createDataFrame([(1, tricky), (2, "plain")], "id LONG, t STRING")
    back = _roundtrip(df, "json", "id LONG, t STRING", {})
    rows = {r.id: r.t for r in back.collect()}
    assert rows[1] == tricky
    assert rows[2] == "plain"


def test_csv_timestamp_roundtrip_is_microsecond_exact(spark, tmp_path):
    """Timestamps with sub-second precision must survive the CSV
    roundtrip to the microsecond — the events table carries micros
    and a lossy format option would shift every window boundary."""
    from pitlapetl_spark.operators.formats import _roundtrip

    df = spark.sql(
        "SELECT 1 AS id, TIMESTAMP '2024-03-01 12:34:56.789123' AS ts"
    )
    from pitlapetl_spark.operators.formats import CSV_OPTS

    back = _roundtrip(df, "csv", "id LONG, ts TIMESTAMP", CSV_OPTS)
    got = back.collect()[0].ts
    assert got.microsecond == 789123


def test_jsonl_timestamp_roundtrip_is_microsecond_exact(spark, tmp_path):
    """The JSON writer shares CSV's millis-truncating default
    timestampFormat; JSON_OPTS must preserve micros exactly."""
    from pitlapetl_spark.operators.formats import JSON_OPTS, _roundtrip

    df = spark.sql(
        "SELECT 1 AS id, TIMESTAMP '2024-03-01 12:34:56.789123' AS ts"
    )
    back = _roundtrip(df, "json", "id LONG, ts TIMESTAMP", JSON_OPTS)
    assert back.collect()[0].ts.microsecond == 789123
