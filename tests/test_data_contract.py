"""Data-contract smoke tests for the driver-generated testdata.

Round 2 post-mortem: the driver regenerated events.parquet with the
ts column's physical unit changed from TIMESTAMP(nanos) to
TIMESTAMP(micros); the reader's unconditional nanos workaround then
silently collapsed every 2024 timestamp into ~43 minutes of 1970,
corrupting 18 downstream checks while every test stayed green. These
tests fail LOUDLY (and cheaply — footer metadata + one min/max agg)
if the physical layout shifts again, and pin the reader's output to
DuckDB's reading of the very same file.
"""

from __future__ import annotations

import pytest

from pitlapetl_spark import sources
from tests.conftest import SF_SMOKE


def test_events_ts_lands_in_a_plausible_era(spark):
    """min/max of load_table(events).ts must sit in [2000, 2100) —
    the guard that catches any future unit mismatch (nanos read as
    micros => year 1970; micros read as nanos => year ~52970)."""
    from pyspark.sql import functions as F

    ev = sources.load_table(spark, SF_SMOKE, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert 2000 <= lo.year < 2100, f"events.ts min out of era: {lo}"
    assert 2000 <= hi.year < 2100, f"events.ts max out of era: {hi}"
    assert lo <= hi


def test_events_ts_matches_duckdb_exactly(spark):
    """Spark's reading of events.ts must equal DuckDB's reading of the
    SAME parquet file to the microsecond — the oracle comparisons all
    assume this."""
    import duckdb
    from pyspark.sql import functions as F

    ev = sources.load_table(spark, SF_SMOKE, "events")
    s_lo, s_hi, s_n = ev.agg(
        F.min("ts"), F.max("ts"), F.count(F.lit(1))
    ).first()
    d_lo, d_hi, d_n = duckdb.sql(
        f"SELECT min(ts), max(ts), count(*) "
        f"FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()
    assert (s_lo, s_hi, s_n) == (d_lo, d_hi, d_n)


def test_footer_unit_detection(tmp_path):
    """parquet_ts_unit reads the footer, not the data; both physical
    units the driver has shipped so far must be recognized."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for unit in ("us", "ns"):
        f = tmp_path / f"t_{unit}.parquet"
        pq.write_table(
            pa.table({"ts": pa.array([1_700_000_000_000_000], pa.timestamp(unit))}),
            f,
            use_deprecated_int96_timestamps=False,
            coerce_timestamps=None,
        )
        assert sources.parquet_ts_unit(str(f)) == unit

    # directory form: first part file wins
    d = tmp_path / "dir_src"
    d.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([1], pa.timestamp("us"))}), d / "part-0.parquet"
    )
    assert sources.parquet_ts_unit(str(d)) == "us"

    # hive-partitioned form: no top-level part files, probe one level
    # down instead of silently defaulting to 'us' (ADVICE r3)
    h = tmp_path / "hive_src"
    (h / "day=d1").mkdir(parents=True)
    pq.write_table(
        pa.table({"ts": pa.array([1], pa.timestamp("ns"))}),
        h / "day=d1" / "part-0.parquet",
    )
    assert sources.parquet_ts_unit(str(h)) == "ns"

    # memoized per resolved path: a rewrite without cache_clear is
    # served from cache; cache_clear re-reads the footer
    pq.write_table(
        pa.table({"ts": pa.array([1], pa.timestamp("ns"))}), d / "part-0.parquet"
    )
    assert sources.parquet_ts_unit(str(d)) == "us"  # stale by design
    sources.parquet_ts_unit.cache_clear()
    assert sources.parquet_ts_unit(str(d)) == "ns"


def test_nanos_fallback_still_reads(spark, tmp_path):
    """If the driver ever ships nanos again, the legacy read path must
    produce the same wall-clock micros DuckDB would."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = 1_704_067_200_123_456  # 2024-01-01 00:00:00.123456 UTC
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([micros * 1000], pa.timestamp("ns")),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    sf = tmp_path / "sf_nanos"
    sf.mkdir()
    pq.write_table(tbl, sf / "events.parquet", coerce_timestamps=None)
    assert sources.parquet_ts_unit(str(sf / "events.parquet")) == "ns"
    row = sources.load_table(spark, str(sf), "events").first()
    assert row.ts == datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)


def test_all_tables_load_and_match_duckdb_counts(spark):
    """Every table in the star schema must load under its declared
    schema and agree with DuckDB on row count — the cheap whole-schema
    guard against a future testdata regeneration changing physical
    types out from under the explicit schemas (the events-ts failure
    mode, generalized)."""
    import duckdb

    for name in sources.TABLES:
        df = sources.load_table(spark, SF_SMOKE, name)
        n_spark = df.count()
        n_duck = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/{name}.parquet')"
        ).fetchone()[0]
        assert n_spark == n_duck, f"{name}: {n_spark} vs {n_duck}"
        # no column silently reads as all-NULL (a type mismatch under
        # an explicit schema surfaces exactly that way)
        from pyspark.sql import functions as F

        row = df.limit(500).agg(
            *[F.count(c).alias(c) for c in df.columns]
        ).first()
        empty = [c for c in df.columns if row[c] == 0]
        assert not empty, f"{name}: all-NULL columns {empty}"
