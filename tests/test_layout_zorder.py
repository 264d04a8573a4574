"""Z-order layout: measured file-skipping contract.

Writes the events table twice — time-sorted (the layout a streaming
ingest naturally produces) and Z-ordered over (user_id, epoch-day) —
then reads ACTUAL parquet footer statistics with pyarrow and counts
how many files a selective user-range predicate could prune. The
Z-order layout must let the scan skip files the time-sorted layout
cannot (under time-sort, every file spans all users)."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pitlapetl_spark.sinks.layout import zorder_write
from pitlapetl_spark.sources import load_table
from tests.conftest import SF_SMOKE

N_FILES = 8


@pytest.fixture(scope="module")
def layouts(spark):
    tmp = tempfile.mkdtemp(prefix="pitlap_zorder_")
    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id",
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).alias("day"),
        "value",
    )
    (
        events.repartitionByRange(N_FILES, "day")
        .sortWithinPartitions("day")
        .write.mode("overwrite")
        .parquet(f"{tmp}/by_time")
    )
    zorder_write(events, f"{tmp}/zorder", "user_id", "day", num_files=N_FILES)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose footer [min,max] of ``col`` intersects [lo,hi],
    total files) — exactly the pruning decision a scan makes."""
    hit = total = 0
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        cmin, cmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    cmin = s.min if cmin is None else min(cmin, s.min)
                    cmax = s.max if cmax is None else max(cmax, s.max)
        total += 1
        if cmin is None or (cmax >= lo and cmin <= hi):
            hit += 1
    return hit, total


def test_zorder_skips_files_linear_sort_cannot(layouts):
    """A ~10%-of-users range predicate: the time-sorted layout stores
    every user in every file (zero pruning); Z-order bounds user_id
    per file, so the same predicate must skip at least half the
    files."""
    lo, hi = 0, 3  # ~quarter of the user range (events cover 0..14 here)
    t_hit, t_total = _files_overlapping(f"{layouts}/by_time", "user_id", lo, hi)
    z_hit, z_total = _files_overlapping(f"{layouts}/zorder", "user_id", lo, hi)
    assert t_total == z_total == N_FILES
    assert t_hit == N_FILES  # time layout: no user pruning at all
    assert z_hit <= N_FILES // 2, (z_hit, N_FILES)


def test_zorder_still_prunes_on_time(layouts):
    """Z-order trades a little per-dimension locality for coverage of
    BOTH dimensions: a 3-day window must still skip files (a linear
    user sort would fail this side the way time-sort fails user)."""
    z_hit, z_total = _files_overlapping(f"{layouts}/zorder", "day", 19723, 19725)
    assert z_hit < z_total, (z_hit, z_total)


def test_zorder_preserves_rows(spark, layouts):
    a = spark.read.parquet(f"{layouts}/by_time")
    b = spark.read.parquet(f"{layouts}/zorder")
    assert a.count() == b.count()
    assert sorted(a.columns) == sorted(b.columns)
