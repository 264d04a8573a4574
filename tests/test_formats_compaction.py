"""Multi-format source/sink round-trips (CSV / JSON / ORC with
explicit schemas — schema inference stays banned at every format) and
small-files compaction."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pitlapetl_spark.sinks import compact
from pitlapetl_spark.sources import EVENTS, load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events(spark):
    # drop sub-second precision: CSV timestamp round-trip is
    # second-granular by default
    return load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.date_trunc("second", "ts")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip(spark, events, fmt):
    tmp = tempfile.mkdtemp(prefix=f"pitlap_{fmt}_")
    try:
        writer = events.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", True)
        getattr(writer, fmt)(f"{tmp}/t")
        reader = spark.read.schema(EVENTS)
        if fmt == "csv":
            reader = reader.option("header", True)
        back = getattr(reader, fmt)(f"{tmp}/t")
        assert _rows(back) == _rows(events)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_reduces_file_count(spark, events):
    tmp = tempfile.mkdtemp(prefix="pitlap_compact_")
    path = f"{tmp}/t"
    try:
        # simulate small-files accumulation: 16-way write
        events.repartition(16).write.parquet(path)
        assert len(glob.glob(f"{path}/part-*")) == 16
        before = _rows(spark.read.parquet(path))
        n_files = compact(spark, path, target_files=2)
        assert n_files == 2
        assert _rows(spark.read.parquet(path)) == before
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_write_sized_files_caps_and_ranges(spark, events):
    """write_sized_files must (a) cap rows per file, (b) produce files
    whose ts min/max footer ranges are mostly disjoint — the property
    a range-pruning scan depends on."""
    import glob
    import tempfile

    import pyarrow.parquet as pq

    from pitlapetl_spark.sinks import write_sized_files

    path = tempfile.mkdtemp(prefix="pitlap_sized_") + "/t"
    write_sized_files(events, path, ["ts"], max_records_per_file=1000, num_ranges=4)

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 4
    spans = []
    for f in files:
        pf = pq.ParquetFile(f)
        assert pf.metadata.num_rows <= 1000, f
        ts_idx = pf.schema_arrow.names.index("ts")
        stats = [
            pf.metadata.row_group(i).column(ts_idx).statistics
            for i in range(pf.metadata.num_row_groups)
        ]
        spans.append((min(s.min for s in stats), max(s.max for s in stats)))
    # range partitioning => sorted by file range, overlaps only at
    # boundaries (range exchange sampling is approximate)
    spans.sort()
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if b[0] < a[1])
    assert overlaps <= len(spans) // 4, spans
