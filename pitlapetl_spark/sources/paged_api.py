"""Custom Python DataSource (the Spark 4 DataSource API) — a
paged-API connector, SURVEY.md §2.1 S1 restated a second way.

The reference fetches its REST API driver-side as ONE blocking
``requests.get`` per task (driverstandings.py:66-68) — it has no
pagination at all; paging is a north-star extension this engine adds
for APIs whose exports don't fit one response. ``sources/rest.py``
already restates the reference's single-shot fetch as a mapInPandas
fetch over a URL frame; THIS module is
the modern first-class form: a ``DataSource`` subclass whose reader
declares ONE InputPartition PER PAGE, so the planner schedules pages
across executors like any other scan — pagination becomes partition
parallelism, the result is an ordinary DataFrame with a declared
schema, and everything downstream (pruning, filters, joins) is plain
Catalyst.

100-TB shape: a paged/chunked upstream (REST offset pages, a cursored
export, a range-sharded table dump) maps 1:1 onto InputPartitions —
thousands of pages fetch concurrently, each task owns its page's
retry/backoff, and no driver loop or driver memory is involved. The
page fetch here is a deterministic FAKE transport (the container has
no network — same device as ``rest.py``): swap ``_fetch_page`` for a
real HTTP call in deployment; the partition-per-page structure is the
point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import query

PAGE_SIZE = 25
DEFAULT_PAGES = 4


def _fetch_page(page: int) -> list[tuple]:
    """Deterministic fake of one API page (clearly marked — no
    network in the container). Points are exact quarters so the
    double arithmetic replays exactly on every engine."""
    rows = []
    for i in range(PAGE_SIZE):
        item = page * PAGE_SIZE + i
        rows.append((page, item, i + 1, (item * 7 % 100) / 4.0))
    return rows


class PagedApiDataSource(DataSource):
    """``spark.read.format("paged_api").option("pages", N).load()`` —
    one row per item across N pages, one input partition per page."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return "page INT, item_id BIGINT, position INT, points DOUBLE"

    def reader(self, schema) -> DataSourceReader:
        return PagedApiReader(self.options)


class PagedApiReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = int(options.get("pages", DEFAULT_PAGES))

    def partitions(self) -> list[InputPartition]:
        # the planner's unit of parallelism: one partition per page
        return [InputPartition(p) for p in range(self.n_pages)]

    def read(self, partition: InputPartition):
        yield from _fetch_page(partition.value)


def register_paged_api(spark: SparkSession) -> None:
    """Idempotent format registration (re-register overwrites)."""
    spark.dataSource.register(PagedApiDataSource)


@query(
    "source_python_datasource",
    oracle=f"""
    SELECT CAST(item_id // {PAGE_SIZE} AS INT) AS page,
           item_id,
           CAST(item_id % {PAGE_SIZE} + 1 AS INT) AS position,
           (item_id * 7 % 100) / 4.0 AS points,
           round((item_id * 7 % 100) / 4.0 * 2.5, 2) AS adjusted
    FROM (SELECT unnest(range({DEFAULT_PAGES * PAGE_SIZE})) AS item_id)
    WHERE (item_id * 7 % 100) / 4.0 > 0
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom DataSource and push a filter +
    projection through it like any scan — proving the source is a
    first-class relation, not a collected list. (The Python
    DataSource API evaluates filters above the scan unless
    pushFilters is implemented; the plan is still a normal
    Filter-over-scan, which is the contract this query pins.)"""
    from pyspark.sql import functions as F

    register_paged_api(spark)
    df = spark.read.format("paged_api").option("pages", str(DEFAULT_PAGES)).load()
    return (
        df.filter(F.col("points") > 0)
        .select(
            "page",
            "item_id",
            "position",
            "points",
            F.round(F.col("points") * 2.5, 2).alias("adjusted"),
        )
    )
