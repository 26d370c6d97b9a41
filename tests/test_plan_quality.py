"""Physical-plan shape pins: the queries must not silently de-optimize.

Each test asserts the plan properties that matter at 100 TB — filters pushed
to the parquet scan, columns pruned, dims broadcast (fact side never
shuffled for a dim join), no accidental cartesian products.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_spark import catalog as cat
from data_warehouse_spark.operators import analytics
from data_warehouse_spark.plans.explain import plan_report

from .conftest import SF_DIR


def test_pricing_summary_pushdown_and_pruning(spark):
    df = analytics.pricing_summary(cat.load_table(spark, SF_DIR, "lineitem"))
    rep = plan_report(df, run_first=True)  # AQE final plan carries codegen ids
    assert any("l_shipdate" in f for f in rep.pushed_filters), rep.text
    cols = rep.scans_column_count("lineitem")
    # 7 needed columns (flag, status, qty, price, discount, tax, shipdate)
    assert cols is not None and cols <= 7, rep.text
    assert rep.codegen_spans >= 1, rep.text


def test_revenue_by_nation_broadcasts_all_dims(spark):
    df = analytics.revenue_by_nation(cat.load_all(spark, SF_DIR))
    rep = plan_report(df)
    # customer, supplier, nation, region are broadcast; only the
    # lineitem↔orders fact join may shuffle
    assert rep.broadcast_joins >= 4, rep.text
    assert rep.cartesian_products == 0, rep.text
    assert any("o_orderdate" in f for f in rep.pushed_filters), rep.text


def test_shipping_priority_semi_join_broadcast(spark):
    df = analytics.shipping_priority(
        cat.load_table(spark, SF_DIR, "customer"),
        cat.load_table(spark, SF_DIR, "orders"),
        cat.load_table(spark, SF_DIR, "lineitem"),
    )
    rep = plan_report(df)
    assert rep.broadcast_joins >= 1, rep.text
    assert any("l_shipdate" in f for f in rep.pushed_filters), rep.text
    assert any("o_orderdate" in f for f in rep.pushed_filters), rep.text


def test_transfers_filter_reaches_scan(spark):
    from data_warehouse_spark.operators import queries as wh

    v = cat.warehouse_views(spark, SF_DIR)
    df = wh.transfers(v["transfer"], tenant="NATION_2", status=1, amount_gte=100)
    rep = plan_report(df)
    # tenant filter must reach the nation dim scan; status filter must reach
    # the orders scan (status is derived from o_orderstatus, so at minimum
    # the date/key filters push) — assert SOMETHING pushed into lineitem side
    assert rep.pushed_filters, rep.text
    assert rep.cartesian_products == 0, rep.text


def test_point_lookup_prunes_to_single_column(spark):
    v = cat.warehouse_views(spark, SF_DIR)
    from data_warehouse_spark.operators import queries as wh

    df = wh.tenants(v["tenant"], limit=10, offset=0)
    rep = plan_report(df)
    assert rep.scans_column_count("nation") == 1, rep.text  # only n_name read


def test_exact_dedup_single_exchange(spark):
    from data_warehouse_spark.operators import dedup

    df = dedup.exact_duplicates(cat.load_table(spark, SF_DIR, "documents"))
    rep = plan_report(df)
    # groupBy(content_key) + join back on the same key: AQE may leave the
    # join broadcast; there must be no cartesian blowup either way
    assert rep.cartesian_products == 0, rep.text
    cols = rep.scans_column_count("documents")
    assert cols is not None and cols <= 2, rep.text  # doc_id + text only


def test_partitioned_transfer_scan_prunes_tenant(spark, tmp_path):
    """The partitioned warehouse transfer table must show partition filters
    (not data filters) for a tenant-filtered read."""
    import os

    from data_warehouse_spark.operators import queries as wh
    from data_warehouse_spark.streaming.ingest import IngestionPipeline, warehouse_store

    root = str(tmp_path / "data")
    for t in ("t_P1", "t_P2"):
        p = os.path.join(root, t, "account", "A", "snapshot", "0000000000")
        os.makedirs(os.path.dirname(p))
        with open(p, "w") as f:
            f.write("CZK FORMAT_T\n")
        tx = os.path.join(root, t, "transaction", "TR")
        os.makedirs(os.path.dirname(tx))
        with open(tx, "w") as f:
            f.write(f"committed\nX {t[2:]} A {t[2:]} A 2020-01-01T00:00:00Z 1 CZK\n")
        ev = os.path.join(root, t, "account", "A", "events", "0000000000", "1_1_TR")
        os.makedirs(os.path.dirname(ev))
        with open(ev, "w") as f:
            f.write("1\n")
    store = warehouse_store(spark, str(tmp_path / "wh"))
    IngestionPipeline(spark, root, store).run_once()

    df = wh.transfers(store.read("transfer"), tenant="P1")
    rep = plan_report(df)
    assert "PartitionFilters" in rep.text and "tenant" in rep.text.split(
        "PartitionFilters"
    )[1].splitlines()[0], rep.text
    assert df.count() == 1
