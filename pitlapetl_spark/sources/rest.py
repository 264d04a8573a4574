"""REST JSON source — SURVEY.md §2.1 S1.

The reference fetches standings driver-side with a single blocking GET
(driverstandings.py:66-68, constructorstandings.py:52-54) and walks
the payload with raw dict indexing. Spark-first restatement:

- a *partitioned URL list* becomes a DataFrame; the fetch runs inside
  ``mapInPandas`` so a million URLs fan out across executors with no
  driver bottleneck (each Arrow batch of URLs is fetched by the task
  that owns it);
- the response body lands in a ``payload`` string column; parsing is
  ``from_json`` with an explicit schema + ``explode`` downstream
  (operators/nested.py) — never Python dict walking.

The container has no network, so the default transport is a
deterministic fake that synthesizes an Ergast-shaped payload from the
URL (clearly marked; swap ``transport=requests_transport`` in a real
deployment — ``requests`` itself is import-guarded).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Transport = Callable[[str], str]

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("payload", T.StringType()),
    ]
)

# Ergast driver-standings payload shape (driverstandings.py:20-22)
STANDINGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "MRData",
            T.StructType(
                [
                    T.StructField(
                        "StandingsTable",
                        T.StructType(
                            [
                                T.StructField(
                                    "StandingsLists",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("season", T.StringType()),
                                                T.StructField(
                                                    "DriverStandings",
                                                    T.ArrayType(
                                                        T.StructType(
                                                            [
                                                                T.StructField("position", T.StringType()),
                                                                T.StructField("points", T.StringType()),
                                                                T.StructField("wins", T.StringType()),
                                                                T.StructField(
                                                                    "Driver",
                                                                    T.StructType(
                                                                        [
                                                                            T.StructField("driverId", T.StringType()),
                                                                            T.StructField("givenName", T.StringType()),
                                                                            T.StructField("familyName", T.StringType()),
                                                                        ]
                                                                    ),
                                                                ),
                                                                T.StructField(
                                                                    "Constructors",
                                                                    T.ArrayType(
                                                                        T.StructType(
                                                                            [
                                                                                T.StructField("constructorId", T.StringType()),
                                                                                T.StructField("name", T.StringType()),
                                                                            ]
                                                                        )
                                                                    ),
                                                                ),
                                                            ]
                                                        )
                                                    ),
                                                ),
                                            ]
                                        )
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def fake_transport(url: str) -> str:
    """Deterministic offline stand-in for HTTP GET: synthesizes an
    Ergast-shaped payload whose contents are a pure function of the
    URL (season -> 3 standings rows). STUB for the network edge only —
    everything downstream of the payload string is the real pipeline."""
    season = url.rstrip("/").split("/")[-2] if "/" in url else "0"
    seed = sum(ord(c) for c in season)
    standings = [
        {
            "position": str(i + 1),
            "points": str(100 - 10 * i + seed % 7),
            "wins": str(max(0, 5 - i)),
            "Driver": {
                "driverId": f"driver_{season}_{i}",
                "givenName": f"G{i}",
                "familyName": f"F{seed % 13}",
            },
            "Constructors": [
                {"constructorId": f"cons_{(seed + i) % 4}", "name": f"Team {(seed + i) % 4}"}
            ],
        }
        for i in range(3)
    ]
    return json.dumps(
        {
            "MRData": {
                "StandingsTable": {
                    "StandingsLists": [
                        {"season": season, "DriverStandings": standings}
                    ]
                }
            }
        }
    )


def requests_transport(url: str) -> str:
    """Real HTTP transport (unused in this container — no network);
    raise-on-error semantics match the reference
    (constructorstandings.py:52-54 ``raise_for_status``)."""
    import requests  # import-guarded: not exercised offline

    resp = requests.get(url, timeout=30)
    resp.raise_for_status()
    return resp.text


def fetch_json(
    spark: SparkSession,
    urls: list[str] | DataFrame,
    transport: Transport = fake_transport,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed REST scan: URL list -> (url, status, payload) rows.

    URLs are repartitioned so fetch latency spreads across executors;
    the transport runs once per URL inside an Arrow-batched
    ``mapInPandas`` (per-partition connection reuse is the transport's
    concern). Failures surface as status != 200 rows rather than task
    aborts — per-row error tolerance, the V3 semantic
    (topspeed.py:68-70) done properly."""
    if isinstance(urls, list):
        url_df = spark.createDataFrame([(u,) for u in urls], ["url"])
    else:
        url_df = urls
    if num_partitions:
        url_df = url_df.repartition(num_partitions)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "status": [], "payload": []}
            for u in pdf["url"]:
                try:
                    body = transport(u)
                    out["url"].append(u)
                    out["status"].append(200)
                    out["payload"].append(body)
                except Exception:
                    out["url"].append(u)
                    out["status"].append(599)
                    out["payload"].append(None)
            yield pd.DataFrame(out).astype({"status": "int32"})

    return url_df.mapInPandas(fetch, FETCH_SCHEMA)


def parse_driver_standings(fetched: DataFrame) -> DataFrame:
    """N1+N2+N3 over the fetched payloads: explicit-schema parse, deep
    path, explode array->rows, element_at first-constructor pick, with
    the reference's defensive defaults (X5/X6: 'Unknown' -> 0,
    missing -> default) as typed expressions."""
    parsed = fetched.filter(F.col("status") == 200).withColumn(
        "j", F.from_json("payload", STANDINGS_SCHEMA)
    )
    lists = parsed.select(
        "url",
        F.element_at(F.col("j.MRData.StandingsTable.StandingsLists"), 1).alias("sl"),
    )
    rows = lists.select(
        "url",
        F.col("sl.season").alias("season"),
        F.explode("sl.DriverStandings").alias("s"),
    )
    return rows.select(
        "url",
        "season",
        F.when(F.col("s.position") != "Unknown", F.col("s.position").cast("int"))
        .otherwise(0)
        .alias("position"),
        F.coalesce(F.col("s.points").cast("double"), F.lit(0.0)).alias("points"),
        F.coalesce(F.col("s.wins").cast("int"), F.lit(0)).alias("wins"),
        F.col("s.Driver.driverId").alias("driverId"),
        F.concat_ws(" ", "s.Driver.givenName", "s.Driver.familyName").alias("driverName"),
        F.element_at(F.col("s.Constructors"), 1).getField("name").alias("constructor"),
    )
