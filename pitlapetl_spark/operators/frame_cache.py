"""Session-scoped materialized-frame memo, keyed by source fingerprint.

Several graph queries consume the SAME derived frame (the long-keyed
co-purchase edge list feeds PageRank / LPA / k-core / HITS; the
part-part basket edge list feeds triangle counting), and each
invocation used to pay the full fact-scale join + distinct again.
This module generalizes the device pagerank.py introduced in round 6
(measured −25% on the PageRank+LPA pair, SCALE.md): build the frame
once per (application, sf_dir, source-file fingerprint), hold it as an
EAGER localCheckpoint so every consumer starts from materialized
executor blocks, and invalidate by fingerprint (file sizes + mtimes)
if the source tables are rewritten mid-process — registered-query
semantics are unchanged, bit-identical frames.

Memory discipline: ONE live entry per (app, sf_dir, name). Inserting a
fresh fingerprint evicts the superseded entry and best-effort
unpersists its checkpoint blocks; without eviction a process whose
inputs are rewritten N times — the very case the fingerprint exists
for — would pin N stale frames on executors.

100-TB note: on a real cluster the same role is played by a staged
materialized view (write the edge frame to parquet once per source
snapshot, read it from every consumer); localCheckpoint is the
single-process equivalent with identical semantics and no external
storage dependency.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}


def source_fingerprint(sf_dir: str, tables: Sequence[str]) -> tuple:
    """(relpath, size, mtime_ns) of every file under the given source
    tables — the staleness key that keeps a frame memo honest if the
    inputs are rewritten mid-process."""
    stats = []
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    stats.append(
                        (os.path.relpath(fp, sf_dir), st.st_size, st.st_mtime_ns)
                    )
        else:
            st = os.stat(p)
            stats.append((t, st.st_size, st.st_mtime_ns))
    return tuple(stats)


def cached_frame(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    tables: Sequence[str],
    builder: Callable[[], DataFrame],
) -> DataFrame:
    """Return the memoized eager localCheckpoint of ``builder()``,
    keyed by (application, sf_dir, name, fingerprint(tables))."""
    prefix = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    key = (*prefix, source_fingerprint(sf_dir, tables))
    df = _CACHE.get(key)
    if df is None:
        for stale in [k for k in _CACHE if k[:3] == prefix and k != key]:
            old_df = _CACHE.pop(stale)
            try:
                old_df.unpersist()
            except Exception:
                pass  # blocks also die with the app; eviction is the point
        df = builder().localCheckpoint()
        _CACHE[key] = df
    return df
