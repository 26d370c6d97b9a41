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


def zorder_key(*ordinals, bits: int = 21):
    """Morton (Z-order) interleave of up to 3 bigint ordinals — the
    multi-dimensional clustering key for ``TableStore.cluster_by``.

    Single-column sort clustering gives perfect skipping on ONE predicate
    column; interleaving the bit patterns of several ordinals keeps rows
    close in EVERY dimension close in the sort order, so min/max row-group
    stats prune scans filtered on any of them (the OPTIMIZE ZORDER BY
    story). Ordinals must be non-negative and fit ``bits`` bits (caller
    maps domains: dates → epoch days, doubles → cents, strings → h60 %
    2^bits); values are clamped to the top of the range rather than
    silently wrapping.

    Pure JVM bit arithmetic (shift/and/or), whole-stage-codegen friendly —
    the expression tree is bits × dims terms with zero Python.
    """
    from pyspark.sql import Column, functions as F

    if not 1 <= len(ordinals) <= 3:
        raise ValueError("zorder_key takes 1-3 ordinal columns")
    dims = len(ordinals)
    cap = (1 << bits) - 1
    # cast('bigint') BEFORE shifting: shiftleft on an IntegerType column
    # uses Java int semantics (shift count mod 32), so interleave positions
    # ≥32 would silently wrap back onto low bits for int32 ordinals
    cols = [
        F.least(
            F.greatest(
                (c if isinstance(c, Column) else F.col(c)).cast("bigint"),
                F.lit(0),
            ),
            F.lit(cap),
        )
        for c in ordinals
    ]
    key = F.lit(0)
    for i in range(bits):
        for d, c in enumerate(cols):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * dims + d)
            )
    return key.cast("bigint")
