"""Registered queries for the REST source (S1) and row-level error
tolerance (V3).

The REST query's oracle is a VALUES literal: the fake transport is a
pure function of the URL list, so the expected rows are recomputed
independently here (same arithmetic, plain Python) and embedded as
ANSI SQL — DuckDB executes it without touching the parquet views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources import load_table
from ..sources.rest import fetch_json, parse_driver_standings

SEASONS = (2021, 2022, 2023, 2024)
_URLS = [
    f"https://api.example.test/ergast/f1/{season}/driverStandings.json"
    for season in SEASONS
]


def _expected_rows() -> list[tuple]:
    """Independent recomputation of the fake-transport payload
    arithmetic (sources/rest.py fake_transport)."""
    rows = []
    for url in _URLS:
        season = url.rstrip("/").split("/")[-2]
        seed = sum(ord(c) for c in season)
        for i in range(3):
            rows.append(
                (
                    url,
                    season,
                    i + 1,
                    float(100 - 10 * i + seed % 7),
                    max(0, 5 - i),
                    f"driver_{season}_{i}",
                    f"G{i} F{seed % 13}",
                    f"Team {(seed + i) % 4}",
                )
            )
    return rows


def _values_sql() -> str:
    vals = ",\n        ".join(
        f"('{u}', '{s}', {p}, {pts}, {w}, '{d}', '{n}', '{c}')"
        for (u, s, p, pts, w, d, n, c) in _expected_rows()
    )
    return f"""
    SELECT url, season, CAST(position AS INT) AS position,
           CAST(points AS DOUBLE) AS points, CAST(wins AS INT) AS wins,
           driverId, driverName, constructor
    FROM (VALUES
        {vals}
    ) AS t(url, season, position, points, wins, driverId, driverName, constructor)
    """


@query("rest_driver_standings", oracle=_values_sql())
def rest_driver_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 end-to-end: partitioned URL list -> mapInPandas fetch (fake
    transport, deterministic) -> explicit-schema from_json -> deep
    path + explode + element_at -> typed defensive defaults. The
    driver-side single GET of the reference (driverstandings.py:66-68)
    becomes an executor-parallel scan."""
    fetched = fetch_json(spark, _URLS, num_partitions=4)
    return parse_driver_standings(fetched)


@query(
    "json_corrupt_quarantine",
    oracle="""
    WITH probed AS (
        SELECT event_id,
               CASE WHEN event_id % 13 = 0 THEN '!!!' || props ELSE props END AS raw
        FROM events
    )
    SELECT event_id,
           NOT json_valid(raw) AS is_corrupt,
           CASE WHEN json_valid(raw)
                THEN CAST(json_extract_string(raw, '$.k') AS INT) END AS k
    FROM probed
    """,
)
def json_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 typed row-level tolerance: a corrupted feed (every 13th row
    mangled with a leading-garbage prefix) parses permissively — malformed rows quarantine as
    is_corrupt=true with NULL fields instead of aborting the task.
    At 100 TB corrupt rows are routed to a quarantine sink for
    reprocessing; good rows flow on unimpeded."""
    events = load_table(spark, sf_dir, "events")
    probed = events.select(
        "event_id",
        F.when(F.col("event_id") % 13 == 0, F.concat(F.lit("!!!"), "props"))
        .otherwise(F.col("props"))
        .alias("raw"),
    )
    parsed = probed.withColumn(
        "m", F.from_json("raw", T.MapType(T.StringType(), T.IntegerType()))
    )
    return parsed.select(
        "event_id",
        F.col("m").isNull().alias("is_corrupt"),
        F.element_at(F.col("m"), "k").alias("k"),
    )
