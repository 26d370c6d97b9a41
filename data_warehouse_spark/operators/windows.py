"""Window/time-series operators: running aggregates, as-of joins, pivots,
hierarchical rollups, percentiles.

None of these exist in the reference (SURVEY §2.4 explicitly: no window
functions, no set ops beyond UNION ALL, one aggregate) — they're the operator
classes any warehouse migration lands on next, implemented Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analytics import cents


def running_balance(abc: DataFrame) -> DataFrame:
    """Cumulative signed balance per account ordered by value_date — the
    windowed generalization of the reference's point-in-time SUM (Q6).

    One shuffle on (tenant, name); within partitions an ordered running
    frame. ROWS (not RANGE) so equal timestamps accumulate deterministically
    via the amount tie-break.
    """
    w = (
        Window.partitionBy("tenant", "name")
        .orderBy("value_date", "amount")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return abc.select(
        "tenant",
        "name",
        "value_date",
        (F.col("amount") * 100).cast("bigint").alias("amount_cents"),
        F.sum((F.col("amount") * 100).cast("bigint")).over(w).alias("running_cents"),
    )


def running_balance_summary(abc: DataFrame) -> DataFrame:
    """Bounded (|accounts|-sized) serving shape of :func:`running_balance`:
    per account, the FINAL balance, the PEAK running balance, the MAX
    DRAWDOWN (largest peak-to-trough drop of the running series), and the
    change count. The full running window still executes — this is the
    running-balance operator with a dimension-sized output instead of one
    row per transfer, so it can be benched without the timing degenerating
    into driver-side row serialization.

    Plan: the same single shuffle on (tenant, name) as running_balance;
    the second window pass (running max) and the final aggregate reuse
    that partitioning — no additional exchange. The final balance is
    SUM(amount_cents) — by construction equal to the last running value,
    with no last-row selection needed (a row_number pick with tied
    (value_date, amount) keys would grab the wrong tied row).

    Determinism under tied duplicate rows: a group of identical
    (value_date, amount) rows carries DISTINCT running values whose
    time-order is fixed (prev+a, prev+2a, …) even though the rows
    themselves are interchangeable. The running-max pass therefore orders
    ties by SERIAL POSITION — running ascending for positive amounts,
    descending for negative — so runmax replays the actual series instead
    of whatever tie order the engine's sort happened to emit (sorts are
    not stable under spill, and the oracle's engine is under no obligation
    to agree)."""
    amt = (F.col("amount") * 100).cast("bigint")
    w_run = (
        Window.partitionBy("tenant", "name")
        .orderBy("value_date", "amount")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = abc.select(
        "tenant",
        "name",
        "value_date",
        amt.alias("amount_cents"),
        F.sum(amt).over(w_run).alias("running_cents"),
    )
    serial_pos = F.when(
        F.col("amount_cents") >= 0, F.col("running_cents")
    ).otherwise(-F.col("running_cents"))
    w_max = (
        Window.partitionBy("tenant", "name")
        .orderBy("value_date", "amount_cents", serial_pos)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r2 = r.select(
        "tenant",
        "name",
        "amount_cents",
        "running_cents",
        F.max("running_cents").over(w_max).alias("runmax"),
    )
    return (
        r2.groupBy("tenant", "name")
        .agg(
            F.sum("amount_cents").alias("final_cents"),
            F.max("running_cents").alias("peak_cents"),
            F.max(F.col("runmax") - F.col("running_cents")).alias(
                "max_drawdown_cents"
            ),
            F.count(F.lit(1)).alias("n_changes"),
        )
        .orderBy("tenant", "name")
    )


def asof_join_purchase_to_click(events: DataFrame) -> DataFrame:
    """As-of join: each *purchase* event matched to the latest *click* by
    the same user at-or-before its timestamp.

    Spark lacks a native as-of join; this is the composition strategy:
    union both sides tagged, ONE window pass carries the last left-side row
    forward, filter back to the right side. One shuffle on the join key and
    no range explosion — the pattern that scales where a naive theta-join
    (t_click <= t_purchase) would blow up quadratically.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.col("event_id").alias("click_id"),
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
    )
    # clicks sort before purchases at the same instant (side ascending) so a
    # simultaneous click is visible (at-or-before); click_id breaks ts ties
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side", "click_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click", F.last("click_id", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("side") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("t").alias("purchase_ts"),
            F.col("last_click").alias("asof_click_id"),
        )
        .orderBy("purchase_id")
    )


def status_priority_rollup(orders: DataFrame) -> DataFrame:
    """Hierarchical ROLLUP (status → priority) with grand total."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def status_priority_grouping_sets(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority)) with ``grouping_id`` —
    the marginal cuts a ROLLUP cannot express (ROLLUP's lattice is strictly
    hierarchical; the priority-only marginal needs an explicit set). One
    shuffle with partial aggregation per set; ``gid`` disambiguates which
    set a row belongs to exactly as SQL-standard GROUPING() does
    (bit per column, rightmost column = bit 0)."""
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def status_priority_cube(orders: DataFrame) -> DataFrame:
    """Full CUBE lattice over (status, priority): every subset of the
    grouping columns in ONE pass — the 2ⁿ-cut completion of ROLLUP's
    hierarchy and GROUPING SETS' explicit list. ``gid`` disambiguates
    base cells from each marginal and the grand total (a NULL group value
    alone cannot — a genuinely NULL column value would collide)."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot: one row per user, one count column per event type. Explicit
    pivot values keep the schema static (required for a 100 TB plan — an
    unvalued pivot scans twice to discover columns)."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select(
            "user_id", *[F.col(t).cast("bigint").alias(f"n_{t}") for t in types]
        )
        .orderBy("user_id")
    )


def order_value_percentiles(orders: DataFrame) -> DataFrame:
    """Exact percentiles (type-7 linear interpolation) of order value in
    cents, per status. Exact `percentile` (sort-based) — at 100 TB swap in
    `percentile_approx` (t-digest) and accept bounded error; both exposed.
    """
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.expr(
                "percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)"
            ).alias("p50_cents"),
            F.expr(
                "percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.9)"
            ).alias("p90_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


def distinct_user_counts(events: DataFrame) -> DataFrame:
    """Exact + approximate distinct users per event type. The approx column
    (HLL++) is the 100 TB default; exact requires a distinct shuffle."""
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .orderBy("event_type")
    )


def _daily_activity(events: DataFrame) -> DataFrame:
    """The shared daily grain both calendar operators window over —
    ONE definition so rolling and densify can never disagree on it."""
    return events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
    )


def rolling_daily_activity(events: DataFrame, window_days: int = 7) -> DataFrame:
    """RANGE-frame moving aggregate: per event type, each day's event count
    plus the trailing ``window_days``-day rolling count and value sum.

    The frame is RANGE over an integer day ordinal (epoch days), so a
    missing calendar day still shortens the window — the semantics ROWS
    frames get wrong on gappy time series (a ROWS frame would reach back
    ``window_days`` *observed* days, silently widening over gaps). Two
    shuffles total: the daily pre-aggregation (shrinks the fact to
    |types|×|days| rows) and the per-type window — the window input is the
    tiny daily grain, never raw events.
    """
    daily = _daily_activity(events)
    ordinal = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(ordinal)
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "value_cents",
        F.sum("n_events").over(w).alias("rolling_events"),
        F.sum("value_cents").over(w).alias("rolling_value_cents"),
    ).orderBy("event_type", "day")


def densify_daily_activity(events: DataFrame) -> DataFrame:
    """Gap-filled daily series per event type: every calendar day between
    the type's first and last observation appears, missing days carry
    ``n_events = 0`` and the FORWARD-FILLED last observed daily value sum.

    The two window-function idioms this pins: grid DENSIFICATION (per-type
    ``sequence(min_day, max_day)`` exploded — the calendar comes from an
    aggregate + generator, never a driver loop) and FORWARD FILL
    (``last(value, ignorenulls=True)`` over an unbounded-preceding frame).
    Cost: ONE fact scan — the daily grain is materialized to a storage
    checkpoint because two consumers read it (the bounds aggregate and the
    grid join; without the checkpoint each would rescan the fact) — then a
    broadcast of the tiny per-type bounds and one per-type window over
    |types|×|days| rows.
    """
    # gap-explode form (r11): each observed day generates the run of
    # calendar days up to (not including) the type's next observed day —
    # the missing days inherit the generating row's forward-filled value,
    # so densification and forward fill ride ONE per-type window pass.
    # The old shape needed the daily grain twice (a bounds aggregate and
    # a grid join), which forced a parquet checkpoint per call to avoid a
    # double fact scan; this one consumes daily once — no checkpoint, no
    # join, and one fewer shuffle at any scale. Row-for-row identical:
    # the generated day set per type is [min(day), max(day)] exactly, a
    # missing day's n_events is 0, and filled_value_cents is the last
    # non-null daily value at or before the day (the ignorenulls fill is
    # applied over observed rows BEFORE the explode, so a NULL daily sum
    # still carries the previous non-null value, as before).
    daily = _daily_activity(events)
    w = Window.partitionBy("event_type").orderBy("day")
    stepped = daily.select(
        "event_type",
        "day",
        "n_events",
        F.last("value_cents", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_filled"),
        F.lead("day").over(w).alias("_next"),
    )
    grid = stepped.select(
        "event_type",
        F.col("day").alias("_obs"),
        "n_events",
        "_filled",
        F.explode(
            F.sequence(
                "day",
                F.coalesce(F.date_sub("_next", 1), F.col("day")),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    return (
        grid.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.when(F.col("day") == F.col("_obs"), F.col("n_events"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("n_events"),
            F.col("_filled").alias("filled_value_cents"),
        )
        .orderBy("event_type", "day")
    )


def band_join_pairs(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    band_minutes: int = 60,
) -> DataFrame:
    """Banded interval join: every same-user (left, right) event pair with
    ``0 < t_right − t_left ≤ band`` — the range-join shape Spark has no
    native operator for (a raw theta-join ``ON t_r > t_l AND t_r ≤ t_l +
    band`` plans as a nested-loop and explodes at scale).

    The scale path quantizes time into buckets of the band width: a
    qualifying pair's left timestamp is within one band of the right, so
    the left bucket equals the right's bucket or the one before it.
    Replicate each LEFT row into (its bucket, next bucket) — a 2-element
    explode, bounded blowup — keep RIGHT rows single, and the join
    becomes a pure EQUI-join on (user_id, bucket) that shuffles once per
    side; the exact band predicate filters after. Each qualifying pair
    matches exactly once (the two left copies land in distinct buckets).
    Time math in integer µs end-to-end. Unlike the as-of join (latest
    left only — one window pass), this yields ALL pairs in the band.
    """
    band_us = band_minutes * 60_000_000

    def bucket_of(t: F.Column) -> F.Column:
        # exact integer floor-division: (t − t mod b)/b divides an exact
        # multiple, so the double division is exact (no boundary drift a
        # rounded float quotient could introduce)
        return ((t - t % band_us) / band_us).cast("bigint")

    left = (
        events.filter(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("left_id"),
            F.unix_micros("ts").alias("t_l"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(bucket_of(F.col("t_l")), bucket_of(F.col("t_l")) + 1)
            ),
        )
    )
    right = events.filter(F.col("event_type") == right_type).select(
        "user_id",
        F.col("event_id").alias("right_id"),
        F.unix_micros("ts").alias("t_r"),
        bucket_of(F.unix_micros("ts")).alias("bucket"),
    )
    dt = F.col("t_r") - F.col("t_l")
    return (
        left.join(right, ["user_id", "bucket"])
        .filter((dt > 0) & (dt <= band_us))
        .select("user_id", "left_id", "right_id", dt.alias("dt_us"))
        .orderBy("left_id", "right_id")
    )
