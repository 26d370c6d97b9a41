"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the lineitem↔orders join shuffles both facts on orderkey every
query. Bucketing both tables by the join key at write time (``bucketBy`` +
``saveAsTable``) pins partitioning into the table layout, so every later
join/aggregation on that key runs shuffle-free — the write-once,
join-many-times trade.

``write_bucketed`` + ``bucketed_join_ready`` wrap the pattern;
tests/test_bucketing.py asserts the physical plan has NO Exchange on either
side of the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sorted) table in
    the session catalog. Sorting within buckets additionally removes the
    Sort from sort-merge joins. ``path`` makes it an external table (the
    warehouse dir is a static conf and may not be writable)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst sees the
    compatible output partitioning and plans no Exchange."""
    return spark.table(left).join(spark.table(right), on)
