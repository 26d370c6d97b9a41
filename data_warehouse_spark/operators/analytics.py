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
    """Dim-filter → semi join → fact-fact join → agg → top-k.

    The segment-filtered customer slice carries no broadcast hint: customer
    grows with SF (a 1/5 slice of a 100 TB-scale dim is still huge), so the
    join strategy is left to AQE, which promotes it to a broadcast from
    observed size whenever it actually fits. The lineitem↔orders join
    shuffles on orderkey only after both sides are filtered (Catalyst
    pushes the date predicates into the scans).
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
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
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
    """Five-way join; fixed-size dims broadcast, one shuffle for the agg.

    Only nation and region carry broadcast hints — their cardinality is a
    constant at every SF. customer and supplier GROW with SF; forcing them
    into broadcasts would OOM the driver/executors at 100 TB, so their join
    strategy is AQE's call (it promotes to broadcast from observed sizes
    while they fit, and degrades gracefully to shuffle joins when they
    don't). Classic TPC-H Q5 additionally requires customer and supplier
    to share a nation; we keep that predicate (join on both nationkeys).
    """
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    o = tables["orders"].filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    return (
        tables["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(tables["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(tables["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
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
    then join the dim — never join-then-agg at scale. No broadcast hint on
    customer (it grows with SF); AQE broadcasts it while it fits."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("spend_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        spend.join(customer, F.col("o_custkey") == F.col("c_custkey"))
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


# --- TPC-H Q13 shape: left-outer join + double aggregation --------------------
def customer_order_histogram(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Orders-per-customer distribution INCLUDING zero-order customers.

    The left outer join is the whole point (an inner join silently drops
    the 0 bucket). Agg-then-join: the fact aggregates to ≤ |customer| rows
    before joining, so the join input is dim-sized on both sides; one
    shuffle for each agg, join co-partitioned on the custkey by AQE.
    """
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    counts = customer.join(
        per_cust, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"))
    return (
        counts.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


# --- TPC-H Q14 shape: dim join + conditional aggregation ----------------------
def promo_revenue_by_month(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-month promo vs total revenue (integer fixed point; the Q14 ratio
    is left to the client — dividing here would reintroduce float drift).

    part is pruned to two columns pre-join but carries no broadcast hint —
    it grows with SF, so AQE picks the strategy (broadcast while it fits);
    the conditional SUM is a map-side partial agg, one shuffle on the month
    key.
    """
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        lineitem.join(
            part.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
                "promo_rev_x10k"
            ),
            F.sum(rev).alias("total_rev_x10k"),
        )
        .orderBy("ship_month")
    )


# --- NOT EXISTS shape: left-anti join ----------------------------------------
def dormant_customers(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """Customers with NO order on/after ``since``, counted per segment.

    NOT EXISTS → left-anti join. The anti side is pre-filtered and
    projected to the key column only before the shuffle; no broadcast hint
    (the key set is O(|orders|) — AQE decides, never the driver).
    """
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    return (
        customer.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_dormant"),
            F.min("c_custkey").alias("first_custkey"),
        )
        .orderBy("c_mktsegment")
    )


# --- TPC-H Q17 shape: decorrelated per-group scalar subquery ------------------
def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#9"
) -> DataFrame:
    """Revenue of lines whose quantity is below half the part's average.

    The correlated subquery ``qty < 0.5 * avg(qty) OVER part`` decorrelates
    into agg-then-self-join, and the predicate is kept INTEGER-exact:
    ``qty < sum/(2·cnt)  ⇔  2·qty·cnt < sum`` — no float average crosses an
    engine boundary. Only brand lines survive the semi-join before either
    shuffle; the brand slice is unhinted (part grows with SF — a 1/25
    slice of a 100 TB dim is not broadcastable), AQE promotes it while it
    fits.
    """
    qty_c = cents("l_quantity")
    brand_keys = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        brand_keys,
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    ).select("l_partkey", qty_c.alias("qty_c"), cents("l_extendedprice").alias("price_c"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum("qty_c").alias("sum_qty_c"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(per_part.withColumnRenamed("l_partkey", "pk"), F.col("l_partkey") == F.col("pk"))
        .filter(F.lit(2) * F.col("qty_c") * F.col("cnt") < F.col("sum_qty_c"))
        .agg(
            F.sum("price_c").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- set op: UNION ALL of two ordered top-k sides -----------------------------
def acctbal_extremes_union(customer: DataFrame, supplier: DataFrame, k: int = 10) -> DataFrame:
    """Top-k account balances from two entity tables, unioned with a
    discriminator column (the reference's closest set-op shape: Q8's
    per-tenant batch concatenation = UNION ALL). Each side is a global
    top-k (TakeOrderedAndProject — no full sort), union is a zero-shuffle
    concatenation."""
    c = (
        customer.select(
            F.lit("customer").alias("party"),
            F.col("c_name").alias("name"),
            cents("c_acctbal").alias("acctbal_cents"),
        )
        .orderBy(F.desc("acctbal_cents"), "name")
        .limit(k)
    )
    s = (
        supplier.select(
            F.lit("supplier").alias("party"),
            F.col("s_name").alias("name"),
            cents("s_acctbal").alias("acctbal_cents"),
        )
        .orderBy(F.desc("acctbal_cents"), "name")
        .limit(k)
    )
    return c.unionByName(s).orderBy("party", F.desc("acctbal_cents"), "name")


# --- events: multi-step funnel -----------------------------------------------
def funnel(
    events: DataFrame,
    steps: list[str] = ("view", "click", "purchase"),
    within_days: int = 7,
) -> DataFrame:
    """Ordered conversion funnel: users whose step-k event follows their
    step-(k-1) event, all within ``within_days`` of step 1.

    SINGLE-PASS: one scan of events (filtered to the k step types — an
    IN-filter pushed to the scan), one shuffle grouping each user's
    relevant events into a time-sorted array, then a per-user JVM
    ``aggregate`` fold walks the array once carrying the (t1..tk) chain
    state — first step-1 time, then the first step-2 time inside
    (t1, t1+window], and so on. Equivalent to the progressive
    agg-then-join formulation (the sorted walk picks exactly the MIN
    qualifying time per stage, which is what each join's re-aggregation
    computed) but costs ONE events scan and one exchange instead of k
    scans and k-1 join shuffles. Per-user state is k timestamps; the
    array is only that user's funnel-step events. Time math in integer µs
    (``unix_micros`` ≡ DuckDB ``epoch_us``). Output: one row per step
    with the surviving user count.
    """
    k = len(steps)
    us = F.unix_micros(F.col("ts"))
    window_us = within_days * 86_400_000_000
    step_idx = F.when(F.col("event_type") == steps[0], 0)
    for i, s in enumerate(steps[1:], start=1):
        step_idx = step_idx.when(F.col("event_type") == s, i)
    per_user = (
        events.filter(F.col("event_type").isin(list(steps)))
        .select("user_id", us.alias("t"), step_idx.cast("int").alias("s"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("t", "s"))).alias("evs"))
    )

    def advance(acc, ev):
        fields = []
        for i in range(k):
            cur = acc[f"t{i}"]
            if i == 0:
                take = cur.isNull() & (ev["s"] == 0)
            else:
                take = (
                    cur.isNull()
                    & acc[f"t{i - 1}"].isNotNull()
                    & (ev["s"] == i)
                    & (ev["t"] > acc[f"t{i - 1}"])
                    & (ev["t"] <= acc["t0"] + window_us)
                )
            fields.append(F.when(take, ev["t"]).otherwise(cur).alias(f"t{i}"))
        return F.struct(*fields)

    chain = F.aggregate(
        "evs",
        F.struct(*[F.lit(None).cast("bigint").alias(f"t{i}") for i in range(k)]),
        advance,
    )
    counts = per_user.select(chain.alias("c")).agg(
        *[
            F.sum(F.when(F.col("c").getField(f"t{i}").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"n{i}")
            for i in range(k)
        ]
    )
    # step names are caller-supplied strings — escape quotes (SQL doubling)
    # so an apostrophe in an event type cannot break the stack() expression
    stack_args = ", ".join(
        f"CAST({i + 1} AS BIGINT), '{s.replace(chr(39), chr(39) * 2)}', n{i}"
        for i, s in enumerate(steps)
    )
    return counts.select(
        F.expr(f"stack({k}, {stack_args}) AS (step, event_type, n_users)")
    ).orderBy("step")


# --- events: retention cohorts ------------------------------------------------
def retention_cohorts(events: DataFrame, max_weeks: int = 8) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen DATE-derived
    cohort, counted distinct per whole-week offset.

    Cohort anchor is each user's min event DATE (never ``date_trunc('week')``
    — week-start conventions differ across engines); the offset is integer
    day-difference ``div`` 7. Agg-then-join: first-seen shrinks to |users|
    before rejoining the event stream.
    """
    first = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    joined = events.select("user_id", F.to_date("ts").alias("day")).join(first, "user_id")
    return (
        joined.select(
            "user_id",
            "cohort_day",
            F.expr("datediff(day, cohort_day) div 7").cast("bigint").alias("week_offset"),
        )
        .filter(F.col("week_offset") <= max_weeks)
        # DATE output degrades differently across engine→pandas bridges;
        # surface the cohort anchor as midnight TIMESTAMP (the engine's
        # proven cross-engine output type for day-grain keys)
        .groupBy(F.col("cohort_day").cast("timestamp").alias("cohort_day"), "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active_users"))
        .orderBy("cohort_day", "week_offset")
    )


# --- events: semi-structured props --------------------------------------------
def props_rollup(events: DataFrame) -> DataFrame:
    """Semi-structured column handling: extract a JSON field with the
    JVM-codegen'd ``get_json_object`` (no Python, no schema inference) and
    roll it up per event type. The pattern for property bags at 100 TB:
    extract-then-aggregate, never materialize a parsed struct column wider
    than the fields used."""
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("bigint").alias("n_k_over_50"),
        )
        .orderBy("event_type")
    )


# ==============================================================================
# Deep TPC-H shapes — correlated/scalar subqueries, wide joins, disjunctive
# predicates, distinct aggregation. Each decorrelates the textbook subquery
# into the join/agg form that actually scales on Spark; every measure stays
# integer fixed-point (exact across the DuckDB oracle boundary). The repo has
# no partsupp table, so Q2/Q16-style shapes derive the part↔supplier relation
# from lineitem (groupBy/distinct on the two keys — one bounded shuffle).
# ==============================================================================


# --- TPC-H Q2 shape: per-part min-cost supplier in a region -------------------
def min_cost_supplier(
    tables: dict[str, DataFrame],
    region_name: str = "EUROPE",
    part_type: str = "STANDARD",
    k: int = 25,
) -> DataFrame:
    """For each part of a type, the cheapest regional supplier.

    The correlated scalar subquery ``cost = (SELECT min(cost) ... WHERE
    partkey = p_partkey)`` decorrelates into ONE per-part argmin: supply
    cost is the minimum observed sale price per (part, supplier), and the
    chosen supplier is the min-cost one with suppkey tiebreak — both fall
    out of a single lexicographic ``min(struct(price, suppkey))`` over the
    regional rows (min price first; among its rows, min suppkey — exactly
    the two-phase min-then-rank answer, without the second shuffle a
    groupBy-pair + window would cost). nation/region are fixed-size →
    broadcast; supplier/part joins are left to AQE (they grow with SF).
    """
    regional = (
        tables["supplier"]
        .join(F.broadcast(tables["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(tables["region"].filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    best = (
        tables["lineitem"]
        .select("l_partkey", "l_suppkey", cents("l_extendedprice").alias("price_c"))
        .join(regional.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.min(F.struct("price_c", "l_suppkey")).alias("m"))
        .select(
            "l_partkey",
            F.col("m.price_c").alias("supply_cost_cents"),
            F.col("m.l_suppkey").alias("best_suppkey"),
        )
    )
    parts = tables["part"].filter(F.col("p_type") == part_type).select("p_partkey", "p_name")
    return (
        best.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(regional, F.col("best_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "supply_cost_cents")
        .orderBy("supply_cost_cents", "p_partkey")
        .limit(k)
    )


# --- TPC-H Q15 shape: supplier(s) with the maximum revenue --------------------
def top_revenue_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """Suppliers whose quarterly revenue equals the global maximum.

    The uncorrelated scalar subquery ``= (SELECT max(total) FROM rev)``
    becomes an agg over the already-aggregated per-supplier table (tiny)
    broadcast back as a 1-row equi-join — never a global sort, never a
    single-partition window.
    """
    rev_expr = cents("l_extendedprice") * (100 - cents("l_discount"))
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_expr).alias("revenue_x10k"))
    )
    mx = rev.agg(F.max("revenue_x10k").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("revenue_x10k") == F.col("mx"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "revenue_x10k")
        .orderBy("s_suppkey")
    )


# --- TPC-H Q18 shape: large-volume orders (agg-subquery IN) -------------------
def large_quantity_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = 300,
    k: int = 25,
) -> DataFrame:
    """Orders whose total line quantity exceeds ``min_qty``, with customer.

    ``o_orderkey IN (SELECT l_orderkey ... HAVING sum > T)`` is an
    agg-then-join: the fact aggregates down to qualifying orderkeys FIRST
    (the having filter runs on the agg output, upstream of both joins), so
    the join fan-in is the tiny qualifying set, not the fact.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            "o_orderdate",
            cents("o_totalprice").alias("totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), "o_orderkey")
        .limit(k)
    )


# --- TPC-H Q22 shape: above-average balances with no orders -------------------
def idle_rich_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Per segment: customers with above-average positive balance and no
    orders at all.

    The scalar subquery ``c_acctbal > (SELECT avg(c_acctbal) WHERE
    c_acctbal > 0)`` stays INTEGER-exact by cross-multiplying:
    ``bal > sum/cnt  ⇔  bal·cnt > sum`` — the (sum, cnt) pair is a 1-row
    broadcast, no float average crosses the engine boundary. NOT EXISTS →
    left-anti join on the projected key column.
    """
    bal_c = cents("c_acctbal")
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_c).alias("sum_bal_c"), F.count(F.lit(1)).alias("n_pos")
    )
    rich = (
        customer.select("c_custkey", "c_mktsegment", bal_c.alias("bal_c"))
        .crossJoin(F.broadcast(pos))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_bal_c"))
    )
    return (
        rich.join(
            orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("bal_c").alias("total_bal_cents"),
        )
        .orderBy("c_mktsegment")
    )


# --- TPC-H Q8 shape: national market share within a region --------------------
def market_share(
    tables: dict[str, DataFrame],
    region_name: str = "AMERICA",
    nation_name: str = "NATION_3",
    part_type: str = "PROMO",
) -> DataFrame:
    """Per order-year: total revenue sold into a region and the slice
    delivered by one supplier nation.

    The share is exported as the exact integer pair (total_x10k,
    nation_x10k), not a rounded quotient. One fact scan; orders joined on
    orderkey (shuffle), every dim broadcast after its filter; the nation
    flag is a CASE aggregated conditionally — no second pass.
    """
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    cust_region = (
        tables["customer"]
        .join(F.broadcast(tables["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(tables["region"].filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        tables["supplier"]
        .join(
            F.broadcast(
                tables["nation"].select(
                    F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    parts = tables["part"].filter(F.col("p_type") == part_type).select("p_partkey")
    return (
        tables["lineitem"]
        # parts is a type-filtered slice of an SF-growing dim — no forced
        # broadcast; AQE promotes the semi-join build side while it fits
        .join(parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            rev.alias("rev_x10k"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum("rev_x10k").alias("total_x10k"),
            F.sum(
                F.when(F.col("supp_nation") == nation_name, F.col("rev_x10k")).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).alias("nation_x10k"),
        )
        .orderBy("o_year")
    )


# --- TPC-H Q9 shape: profit by supplier nation and year -----------------------
def nation_profit(tables: dict[str, DataFrame], name_substr: str = "red") -> DataFrame:
    """Profit (revenue − retail cost of goods) per supplier nation per
    order-year, for parts whose name contains a substring.

    Cost uses the part's retail price (the repo has no partsupp):
    ``cost_x10k = retail_cents · qty · 100`` aligns the scale with
    ``rev_x10k`` so profit subtracts exactly. The part filter is an inner
    join carrying retail_cents; the only fact-fact shuffle is
    lineitem↔orders on orderkey. Only the fixed-size nation dim carries a
    broadcast hint — part and supplier grow with SF, so their join
    strategy is AQE's call.
    """
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    parts = tables["part"].filter(F.col("p_name").contains(name_substr)).select(
        "p_partkey", cents("p_retailprice").alias("retail_c")
    )
    supp_nation = (
        tables["supplier"]
        .join(F.broadcast(tables["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    profit = rev - F.col("retail_c") * F.col("l_quantity").cast("bigint") * 100
    return (
        tables["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"), profit.alias("p"))
        .groupBy("n_name", "o_year")
        .agg(F.sum("p").alias("profit_x10k"))
        .orderBy("n_name", F.desc("o_year"))
    )


# --- TPC-H Q16 shape: distinct supplier count per part attribute --------------
def supplier_counts_by_part(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    excl_brand: str = "Brand#1",
    excl_type: str = "PROMO",
    k: int = 50,
) -> DataFrame:
    """How many distinct suppliers ship each (brand, type, size) bucket,
    excluding one brand, one type, and negative-balance suppliers.

    The part↔supplier relation comes from the fact projected to its two
    key columns; COUNT(DISTINCT) runs as Spark's two-phase distinct
    aggregate (partial distinct map-side → final). Exclusions: dim filters
    before the join + a left-anti on the bad-supplier keys (NOT IN with a
    guaranteed non-null key set). Neither exclusion side is hint-forced
    into a broadcast — part and supplier grow with SF; AQE promotes them
    while they fit.
    """
    ps = lineitem.select("l_partkey", "l_suppkey")
    good_parts = part.filter(
        (F.col("p_brand") != excl_brand) & (F.col("p_type") != excl_type)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(good_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
        .orderBy(F.desc("n_suppliers"), "p_brand", "p_type", "p_size")
        .limit(k)
    )


# --- TPC-H Q19 shape: disjunctive predicate revenue ---------------------------
def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Revenue matched by an OR of three conjunctive (brand, size, qty)
    clauses — the shape that exercises disjunctive predicate handling.

    The part-side conjuncts (brand, size) ride the dim join (unhinted —
    part grows with SF, AQE broadcasts the filtered slice while it fits);
    the OR collapses to per-row CASE logic after the join, and the common
    superset predicates (size ≥ 1, qty bounds) are pushed to the scans as
    the disjunction's envelope. Single aggregate output.
    """
    qty = F.col("l_quantity").cast("bigint")
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    clauses = (
        (F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 5) & qty.between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 10) & qty.between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15) & qty.between(20, 30)
    )
    parts = part.filter(
        F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        lineitem.filter(qty.between(1, 30))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .filter(clauses)
        .agg(
            F.sum(rev).alias("revenue_x10k"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- TPC-H Q10 shape: returned-item revenue by customer -----------------------
def returned_item_revenue(
    tables: dict[str, DataFrame],
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """Top customers by revenue lost to returns in one quarter.

    Fact filtered on return flag at the scan, orders filtered on the
    quarter — both upstream of the orderkey shuffle join; the agg shrinks
    to customers before the dim joins (agg-then-join); nation broadcast.
    """
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    li = tables["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", rev.alias("rev_x10k")
    )
    o = tables["orders"].filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rev_x10k").alias("lost_revenue_x10k"))
    )
    return (
        per_cust.join(tables["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(tables["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "lost_revenue_x10k")
        .orderBy(F.desc("lost_revenue_x10k"), "c_custkey")
        .limit(k)
    )


# --- TPC-H Q21 shape: sole-supplier orders ------------------------------------
def sole_supplier_orders(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    status: str = "F",
    k: int = 25,
) -> DataFrame:
    """Per supplier: how many finished orders they supplied ALONE.

    The textbook form is a correlated pair — EXISTS(my lineitem) AND NOT
    EXISTS(another supplier's lineitem in the same order) — which the
    DuckDB oracle states literally. The scale form decorrelates both into
    ONE aggregate over the fact: per order, the distinct-supplier count
    and (via the lexicographic min trick) the single supplier when that
    count is 1 — one shuffle on orderkey, no self-join of the fact against
    itself. Orders join filters status; final per-supplier count is a
    second (tiny) shuffle.
    """
    per_order = (
        lineitem.select("l_orderkey", "l_suppkey")
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.min("l_suppkey").alias("only_supp"),
        )
        .filter(F.col("n_supp") == 1)
    )
    o = orders.filter(F.col("o_orderstatus") == status).select("o_orderkey")
    return (
        per_order.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("only_supp")
        .agg(F.count(F.lit(1)).alias("n_sole_orders"))
        .join(supplier, F.col("only_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_sole_orders")
        .orderBy(F.desc("n_sole_orders"), "s_suppkey")
        .limit(k)
    )


# --- monitoring: integer-exact z-score anomalies ------------------------------
def anomalous_hours(events: DataFrame, z_x100: int = 300) -> DataFrame:
    """Hours whose event count sits more than z standard deviations from
    the event type's hourly mean — the data-quality tripwire over a rollup.

    INTEGER-EXACT: ``|c − S/N| > z·σ`` cross-multiplies to
    ``100²·(N·c − S)² > z₁₀₀²·(N·Σc² − S²)`` — no float mean or stddev
    crosses an engine boundary. The squared terms are compared in
    DECIMAL(38,0) (DuckDB twin: HUGEINT): ``N·c`` is hours×count, so its
    square overflows 64 bits at realistic volumes (~10⁹ deviation units),
    and Spark's non-ANSI BIGINT would wrap silently while DuckDB errors —
    the 38-digit domain keeps the flag bit-identical up to ~10¹⁷ deviation
    units, far past any hourly-count magnitude. One aggregation (the
    hourly grain — the only shuffle over events) plus the per-type
    moments as unbounded WINDOW aggregates over that tiny grain: the r10
    shape rolled the moments up separately and broadcast-joined them back,
    which needed a per-call parquet checkpoint of the grain (its two
    consumers pruned different columns, defeating exchange reuse) — the
    window form has ONE consumer, so the checkpoint, the join and the
    second grain scan all disappear (guide §2.4: same-key window after
    aggregation shares the partitioning story; identical sums, identical
    integer comparison). Both tails flag (the square covers spikes and
    dips); types with a single observed hour have zero variance evidence
    and are skipped.
    """
    hr = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("c"))
    tw = Window.partitionBy("event_type")
    moments = hr.select(
        "event_type",
        "hour",
        "c",
        F.count(F.lit(1)).over(tw).alias("n"),
        F.sum("c").over(tw).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(tw).alias("ss"),
    )
    # widen BEFORE the first multiply — an inner BIGINT product would have
    # already wrapped by the time an outer cast saw it
    wide = "decimal(38,0)"
    dev = F.col("n").cast(wide) * F.col("c") - F.col("s")
    var_num = F.col("n").cast(wide) * F.col("ss") - F.col("s").cast(wide) * F.col("s")
    lhs = F.lit(10000).cast(wide) * dev * dev
    rhs = F.lit(z_x100 * z_x100).cast(wide) * var_num
    return (
        moments.filter((F.col("n") >= 2) & (lhs > rhs))
        .select("event_type", "hour", F.col("c").alias("n_events"))
        .orderBy("event_type", "hour")
    )


# --- set-op algebra over behavior cohorts -------------------------------------
def user_set_op_counts(
    events: DataFrame, type_a: str = "purchase", type_b: str = "error"
) -> DataFrame:
    """INTERSECT / EXCEPT over two behavior cohorts: users who did both
    ``type_a`` and ``type_b``, and users who did ``type_a`` but never
    ``type_b`` — the relational set-op SEMANTICS (bag-exact on the
    already-distinct inputs). Physically Catalyst rewrites INTERSECT to a
    left-semi join while EXCEPT ALL runs its own union + replicate-rows
    plan — so only the EXCEPT arm adds a distinct physical path; both arms
    pin the set-op API surface and its NULL/duplicate semantics.
    Output: two (set_op, n_users) rows.
    """
    a = events.filter(F.col("event_type") == type_a).select("user_id").distinct()
    b = events.filter(F.col("event_type") == type_b).select("user_id").distinct()

    def count_row(label: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(label).alias("set_op"), "n_users"
        )

    return count_row(f"n_{type_a}_and_{type_b}", a.intersect(b)).unionByName(
        count_row(f"n_{type_a}_not_{type_b}", a.exceptAll(b))
    )


# --- TPC-H Q6 shape: forecast revenue change ----------------------------------
def forecast_revenue_change(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo_c: int = 5,
    disc_hi_c: int = 7,
    max_qty: int = 24,
) -> DataFrame:
    """Revenue delta if discounts in a band were dropped for small orders —
    the pure scan-aggregate shape: every predicate (date range, discount
    band, quantity cap) pushes to the parquet scan, the map side computes
    ``price·disc`` per surviving row, and ONE 1-row aggregate comes back.
    No join, no wide shuffle; at 100 TB this is bandwidth-bound by design.
    Exports (revenue_x10k, n_lines) — the exact integer pair.
    """
    disc_c = cents("l_discount")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & disc_c.between(disc_lo_c, disc_hi_c)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.sum(cents("l_extendedprice") * disc_c).alias("revenue_x10k"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- TPC-H Q7 shape: volume shipping between two nations ----------------------
def nation_pair_volume(
    tables: dict[str, DataFrame],
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """Revenue flowing between two nations (both directions), by supplier
    nation → customer nation → ship year.

    Only the 2-row filtered nation dim carries broadcast hints (a constant
    at every SF); the nation-filtered supplier/customer slices stay
    unhinted — they are 2/25 of SF-growing dims, so AQE promotes them to
    broadcasts from observed sizes while they fit. The single fact-fact
    shuffle is lineitem↔orders on orderkey. The cross-pair predicate
    (a→b or b→a) collapses to a post-join filter on two tiny string
    columns.
    """
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    pair = tables["nation"].filter(F.col("n_name").isin(nation_a, nation_b))
    supp = (
        tables["supplier"]
        .join(
            F.broadcast(
                pair.select(F.col("n_nationkey").alias("sn_key"),
                            F.col("n_name").alias("supp_nation"))
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        tables["customer"]
        .join(
            F.broadcast(
                pair.select(F.col("n_nationkey").alias("cn_key"),
                            F.col("n_name").alias("cust_nation"))
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = tables["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            rev.alias("rev_x10k"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_x10k").alias("revenue_x10k"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- TPC-H Q11 shape: important stock values ----------------------------------
def important_part_values(
    lineitem: DataFrame, frac_num: int = 1, frac_den: int = 1000, k: int = 25
) -> DataFrame:
    """Parts whose shipped value exceeds a fraction of the corpus-wide
    total (the repo's lineitem stands in for partsupp, as in the other
    deep shapes).

    The scalar subquery ``> total/1000`` is INTEGER-EXACT by
    cross-multiplying: ``value·den > total·num`` with both sides widened
    to DECIMAL(38,0) before the multiply (value is cents×qty, so ×1000
    would overflow BIGINT at high SF). The global total re-aggregates the
    tiny per-part table — never a second fact scan — and returns as a
    1-row broadcast.
    """
    wide = "decimal(38,0)"
    per_part = (
        lineitem.select(
            "l_partkey",
            (cents("l_extendedprice") * F.col("l_quantity").cast("bigint")).alias("v"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("v").alias("stock_value_x100"))
    )
    total = per_part.agg(F.sum("stock_value_x100").alias("total_x100"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("stock_value_x100").cast(wide) * frac_den
            > F.col("total_x100").cast(wide) * frac_num
        )
        .select("l_partkey", "stock_value_x100")
        .orderBy(F.desc("stock_value_x100"), "l_partkey")
        .limit(k)
    )


# --- TPC-H Q12 shape: late shipments by line status ---------------------------
def late_shipment_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    late_days: int = 90,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """Per line status (standing in for the reference schema's ship mode,
    absent here): how many lines shipped more than ``late_days`` after
    their order was placed, split by urgent-vs-other order priority.

    The priority split is conditional aggregation (two CASE sums, one
    pass); the lateness predicate needs both fact sides, so the one
    shuffle is the mandatory lineitem↔orders orderkey join — the ship-date
    window still pushes to the lineitem scan first.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(late)
        .groupBy("l_linestatus")
        .agg(
            F.sum(urgent.cast("bigint")).alias("high_line_count"),
            F.sum((~urgent).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --- TPC-H Q20 shape: suppliers with excess supply ----------------------------
def excess_supply_suppliers(
    tables: dict[str, DataFrame],
    name_substr: str = "red",
    frac_num: int = 3,
    frac_den: int = 10,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """Suppliers who shipped more than ``frac`` of some matching part's
    year volume — the nested-IN shape (supplier IN (… part IN (…))).

    Decorrelated bottom-up: the fact (filtered to the year and, via an
    AQE-sized semi-join on the name-matched part slice, to matching
    parts) aggregates ONCE to the
    (part, supplier) grain; the per-part total is a window sum over that
    small aggregated table — NOT a re-aggregate-and-join-back, which
    would materialize the ``ps`` subtree twice (its two consumers prune
    different columns, so exchange reuse cannot canonicalize them and the
    fact would be scanned twice — plan-pinned in test_plan_quality). The
    threshold compares integer-exactly by cross-multiplying. Qualifying
    supplier keys arrive at the supplier dim as a distinct semi-join —
    each supplier counted once with its excess-part count.
    """
    parts = tables["part"].filter(F.col("p_name").contains(name_substr)).select("p_partkey")
    li = tables["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    )
    ps = (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty_ps"))
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        ps.withColumn("qty_part", F.sum("qty_ps").over(w))
        .filter(F.col("qty_ps") * frac_den > F.col("qty_part") * frac_num)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_excess_parts"))
    )
    return (
        excess.join(tables["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_excess_parts")
        .orderBy("s_suppkey")
    )
