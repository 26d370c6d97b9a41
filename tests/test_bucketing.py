"""Bucketed co-located joins: the plan must contain no Exchange on either
join side (the write-once / join-shuffle-free trade at 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_spark import catalog as cat
from data_warehouse_spark.plans.explain import plan_report
from data_warehouse_spark.sources import bucketing

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    li = cat.load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    od = cat.load_table(spark, SF_DIR, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    bucketing.write_bucketed(
        li, "li_bucketed", ["orderkey"], 8, sort_cols=["orderkey"], path=f"{wh}/li"
    )
    bucketing.write_bucketed(
        od, "od_bucketed", ["orderkey"], 8, sort_cols=["orderkey"], path=f"{wh}/od"
    )
    yield "li_bucketed", "od_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS od_bucketed")


def test_bucketed_join_no_shuffle(spark, bucketed):
    left, right = bucketed
    # disable broadcast so the join strategy is genuinely SMJ/shuffle-hash
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join_ready(spark, left, right, "orderkey").groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        rep = plan_report(joined)
        # both scans are bucketed and feed the join with NO shuffle: the
        # plan's only Exchange is the final group-by on o_orderstatus
        assert rep.text.count("Bucketed: true") == 2, rep.text
        assert rep.exchanges == 1, rep.text
        assert rep.sortmerge_joins + rep.shuffle_hash_joins == 1, rep.text
        # correctness: same rows as the unbucketed join
        li = cat.load_table(spark, SF_DIR, "lineitem")
        od = cat.load_table(spark, SF_DIR, "orders")
        expected = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_zorder_key_interleaves_bits(spark):
    from data_warehouse_spark.sources.bucketing import zorder_key

    df = spark.createDataFrame([(0b101, 0b011)], ["x", "y"])
    (got,) = df.select(zorder_key("x", "y", bits=4).alias("z")).collect()
    # interleave LSB-first: z bit 2i = x bit i, bit 2i+1 = y bit i
    # x=101, y=011 -> bits (y1 x1)(y0 x0)... = x0=1,y0=1,x1=0,y1=1,x2=1,y2=0
    want = (1 << 0) | (1 << 1) | (0 << 2) | (1 << 3) | (1 << 4) | (0 << 5)
    assert got["z"] == want


def test_zorder_key_clamps_out_of_range(spark):
    from data_warehouse_spark.sources.bucketing import zorder_key

    df = spark.createDataFrame([(1 << 40, -5)], ["x", "y"])
    (got,) = df.select(zorder_key("x", "y", bits=8).alias("z")).collect()
    # x clamps to 255, y to 0 -> even bits all set, odd bits all clear
    assert got["z"] == sum(1 << (2 * i) for i in range(8))


def test_zorder_locality_beats_single_column_sort(spark):
    """Rows sorted by the z-key keep BOTH dimensions clustered: for any
    contiguous block of the z-sorted data, the per-block min/max range of
    each dimension is much smaller than the full domain — which is exactly
    what parquet row-group min/max skipping needs on the second column
    (a single-column sort leaves the other dimension's range full-width)."""
    import random

    from pyspark.sql import functions as F

    from data_warehouse_spark.sources.bucketing import zorder_key

    rng = random.Random(7)
    rows = [(rng.randrange(1 << 10), rng.randrange(1 << 10)) for _ in range(4096)]
    df = spark.createDataFrame(rows, ["x", "y"])

    def mean_block_span(sorted_df, col, block=256):
        data = [r[col] for r in sorted_df.collect()]
        spans = [
            max(data[i : i + block]) - min(data[i : i + block])
            for i in range(0, len(data), block)
        ]
        return sum(spans) / len(spans)

    by_x = df.orderBy("x")
    by_z = df.orderBy(zorder_key("x", "y", bits=10))
    full = 1 << 10
    # y is unclustered under the x-sort (block span ~ full domain) but
    # clustered under the z-sort; x stays reasonably clustered under z
    assert mean_block_span(by_x, "y") > 0.9 * full
    assert mean_block_span(by_z, "y") < 0.5 * full
    assert mean_block_span(by_z, "x") < 0.5 * full
