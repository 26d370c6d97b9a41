"""OLAP analytics operators over the star schema (the bench workload).

These widen the engine beyond the reference's read surface into the operator
classes a Spark warehouse must cover: multi-dimension hash aggregation,
fact-to-fact + fact-to-dim joins (dims broadcast), exists/not-exists
semi-joins, top-k (TakeOrderedAndProject), windowed time-series rollups,
sessionization, and top-k-per-group.

Fixed-point convention: money/measure doubles in the source parquet are exact
2-dp values; we convert to integer fixed-point *before* aggregating —
``*_cents`` = value×100, ``*_x10k`` = ×10^4, ``*_x1m`` = ×10^6, all BIGINT.
Integer sums are exact, associative (safe for map-side partial aggregation),
bit-identical across engines (the DuckDB oracle), and cheaper than decimal at
100 TB. Averages are exported as (sum, count) pairs — exact — rather than a
rounded quotient.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cents(col) -> F.Column:
    """double holding an exact 2-dp value → integer cents (BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


# --- TPC-H Q1 shape: pricing summary -----------------------------------------
def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """Scan-heavy multi-aggregate rollup; the flagship bench query.

    Plan: parquet scan with pushed ship-date filter + pruned columns →
    partial hash agg (map-side) → single shuffle on 6 grouping values →
    final agg. Whole-stage codegen end to end; no Python boundary.
    """
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")  # 0..100 (discount is a 2-dp fraction)
    tax_c = cents("l_tax")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(price_c).alias("sum_base_price_cents"),
            F.sum(price_c * (100 - disc_c)).alias("sum_disc_price_x10k"),
            F.sum(price_c * (100 - disc_c) * (100 + tax_c)).alias("sum_charge_x1m"),
            F.sum(disc_c).alias("sum_discount_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- TPC-H Q3 shape: top-k unshipped orders by revenue ------------------------
def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """Dim-filter → broadcast semi-ish join → fact-fact join → agg → top-k.

    customer is small relative to lineitem at every SF → broadcast; the
    lineitem↔orders join shuffles on orderkey only after both sides are
    filtered (Catalyst pushes the date predicates into the scans).
    """
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")).select(
        "l_orderkey", rev.alias("rev_x10k")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum("rev_x10k").alias("revenue_x10k"))
        .orderBy(F.desc("revenue_x10k"), "l_orderkey")
        .limit(k)
    )


# --- TPC-H Q5 shape: revenue by nation ---------------------------------------
def revenue_by_nation(
    tables: dict[str, DataFrame],
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """Five-way join; every dim side broadcast, one shuffle for the agg.

    Classic TPC-H Q5 additionally requires customer and supplier to share a
    nation; we keep that predicate (join on both nationkeys).
    """
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    o = tables["orders"].filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    return (
        tables["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(tables["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(tables["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(tables["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(tables["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).alias("revenue_x10k"))
        .orderBy("r_name", F.desc("revenue_x10k"), "n_name")
    )


# --- top-k customers by spend -------------------------------------------------
def top_customers(customer: DataFrame, orders: DataFrame, k: int = 25) -> DataFrame:
    """Agg-then-join: aggregate the fact first (shrinks to ≤ |customer| rows),
    then broadcast-join the dim — never join-then-agg at scale."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("spend_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        spend.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment", "spend_cents", "n_orders")
        .orderBy(F.desc("spend_cents"), "c_custkey")
        .limit(k)
    )


# --- TPC-H Q4 shape: order-priority count with EXISTS -------------------------
def order_priority_count(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """EXISTS → left-semi join on the fact key.

    TPC-H Q4 gates on ``l_commitdate < l_receiptdate``; the synthetic schema
    lacks those columns, so the EXISTS predicate is "order shipped late":
    any line with ``l_shipdate`` > 30 days after ``o_orderdate`` (applied
    post-join would break semi-join shape, so we gate on the line side with
    the ship date alone and keep the semi-join).
    """
    late = lineitem.filter(
        F.col("l_shipdate") >= F.lit(date_from).cast("timestamp")
    ).select("l_orderkey")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    return (
        o.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- events: hourly rollup ----------------------------------------------------
def events_hourly(events: DataFrame) -> DataFrame:
    """Time-bucketed rollup (the batch twin of the streaming windowed agg)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


# --- events: sessionization ----------------------------------------------------
def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions via lag-gap-cumsum; one shuffle on user_id.

    At 100 TB the shuffle partitions by user_id (high-cardinality, low skew);
    the window sort is per-user within partitions.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # compare in integer microseconds: exact, and identical in any SQL twin
    # (casting to whole seconds would truncate differently across engines)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    with_sid = with_flag.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .orderBy("user_id", "session_seq")
    )


# --- events: top-k per group ----------------------------------------------------
def top_users_per_event_type(events: DataFrame, k: int = 5) -> DataFrame:
    """Top-k-per-group: agg → row_number window → filter (no global sort)."""
    per_user = events.groupBy("event_type", "user_id").agg(
        F.sum(cents("value")).alias("value_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value_cents"), F.col("user_id")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("event_type", "rank")
    )
