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
