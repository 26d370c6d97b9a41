"""Distributed filesystem listing for the primary-storage crawl.

The reference's explorer reads only watermark-selected files: it LISTS
directory levels (names are data: tenant, account, snapshot version, event
status/transaction) and READS content only where the watermarks say there is
something new (PrimaryDataExplorationService.scala:107-178, notably the
event-dir count skip ``lastSynchronizedEvent >= data.size``).

This module is the listing half of that contract. Directory scans are
distributed as RDD ``flatMap`` stages over the parent-directory list — the
same work Spark's ``InMemoryFileIndex`` parallelizes for large tables, but
WITHOUT instantiating a read of file contents. Content reads happen later,
against explicit path lists the watermark logic has pruned to O(new).

On a real cluster this becomes a listFiles against the object store /
DFS namenode; the per-tick volume is O(#accounts) directory entries of
strings, never file bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SNAPSHOT_FILE_SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.StringType(), False),
        T.StructField("account", T.StringType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("path", T.StringType(), False),
    ]
)

EVENT_FILE_SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.StringType(), False),
        T.StructField("account", T.StringType(), False),
        T.StructField("snapshot_version", T.IntegerType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
    ]
)


def _slices(n: int) -> int:
    return max(1, min(n, 64))


def snapshot_inventory(spark: SparkSession, root: str, tenants: list[str]) -> DataFrame:
    """(tenant, account, version, path) for every snapshot FILE, from
    directory listings alone — the version is the file name (S1/S2 + the
    snapshot half of D4). Accounts are the ``version == 0`` rows (an account
    without snapshot 0 is undiscoverable, as in the reference where the
    metadata read requires it)."""

    def scan_accounts(tenant: str):
        base = os.path.join(root, f"t_{tenant}", "account")
        try:
            with os.scandir(base) as it:
                return [(tenant, e.name) for e in it if e.is_dir()]
        except (FileNotFoundError, NotADirectoryError):
            return []

    def scan_snapshots(ta):
        tenant, account = ta
        base = os.path.join(root, f"t_{tenant}", "account", account, "snapshot")
        out = []
        try:
            with os.scandir(base) as it:
                for e in it:
                    if e.is_file() and e.name.isdigit():
                        out.append((tenant, account, int(e.name), e.path))
        except (FileNotFoundError, NotADirectoryError):
            pass
        return out

    sc = spark.sparkContext
    # parallelism is #tenants-bound; a repartition between the two levels
    # was measured a net LOSS at 8 tenants x 50k accounts (idle tick
    # 3.4 s -> 4.6 s: the per-tick shuffle costs more than the widened
    # scandir parallelism saves) — scale-out at width is sharding tenants
    # across ingest workers, not intra-tick shuffles (INGEST_BENCH.json)
    rdd = (
        sc.parallelize(tenants, _slices(len(tenants) or 1))
        .flatMap(scan_accounts)
        .flatMap(scan_snapshots)
    )
    return spark.createDataFrame(rdd, SNAPSHOT_FILE_SCHEMA)


def event_files(spark: SparkSession, root: str, snapshot_dirs: DataFrame) -> DataFrame:
    """Event-file listing for the given (tenant, account, version) snapshot
    rows: (tenant, account, snapshot_version, filename, path). Names carry
    (status, hint, transaction); only the event VERSION lives in content —
    which is exactly what the count-skip lets us avoid reading."""

    def scan_events(row):
        tenant, account, version = row.tenant, row.account, int(row.version)
        base = os.path.join(
            root, f"t_{tenant}", "account", account, "events", f"{version:010d}"
        )
        out = []
        try:
            with os.scandir(base) as it:
                for e in it:
                    if e.is_file() and e.name:
                        out.append((tenant, account, version, e.name, e.path))
        except (FileNotFoundError, NotADirectoryError):
            pass
        return out

    rdd = snapshot_dirs.select("tenant", "account", "version").rdd.flatMap(scan_events)
    return spark.createDataFrame(rdd, EVENT_FILE_SCHEMA)
