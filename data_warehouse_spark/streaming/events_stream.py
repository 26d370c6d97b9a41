"""Structured Streaming operators over the events stream.

The reference's only streaming concept is a 2 s incremental re-crawl (no
event time); these operators supply the event-time layer a Spark warehouse
is expected to have, as readStream-composable transformations:

  hourly_rollup      watermarked tumbling-window counts/sums — the streaming
                     twin of analytics.events_hourly (same output semantics
                     on complete input)
  session_windows    native session_window aggregation (gap-based)
  running_user_state applyInPandasWithState: per-user running counters —
                     the custom-stateful-operator template (timeout handling,
                     state schema, Arrow batches)
  dedup_stream       exactly-once key dedup with watermark-bounded state
  enrich_stream      stream-static enrichment join — the static side is
                     broadcast while it fits per the planner's static file
                     size estimate vs autoBroadcastJoinThreshold (Spark
                     disables AQE for streaming queries, so no runtime
                     re-plan happens on this path)

All take a DataFrame that may be batch or streaming: transformations are
identical (Spark's unified model); tests drive them with a file stream +
``availableNow`` trigger to completion.

Scale notes: watermark bounds state (late rows beyond 10 min are dropped —
the late-data policy); state store partitions by the grouping key, so
user_id/session keys shard across executors; foreachBatch + the TableStore
MERGE gives exactly-once sinks on replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hourly_rollup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1 h windows per event_type; watermark bounds open windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Per-user session windows with an inactivity gap (native operator —
    the streaming counterpart of analytics.sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "value_cents",
        )
    )


def dedup_stream(
    events: DataFrame, key: str = "event_id", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup on a key: at-least-once upstream (replayed
    files, retried producers) → exactly-once downstream.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only for the
    watermark horizon, so state is bounded by (arrival rate × horizon), not
    by stream lifetime — the property that makes dedup viable on an
    unbounded stream. Batch DataFrames (no watermark support) fall back to
    plain ``dropDuplicates`` — same output on complete input."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            [key]
        )
    return events.dropDuplicates([key])


def enrich_stream(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins the
    slowly-changing dimension with no stream state at all (the static side
    is re-resolved every trigger, so dim updates are picked up without
    restarting the query). No broadcast hint: a user dimension grows with
    the corpus, so the per-batch join strategy is the planner's call — it
    broadcasts the dim while it fits and falls back to a shuffled join
    when it doesn't."""
    return events.join(
        user_dim, events["user_id"] == user_dim["uid"], "left"
    ).drop("uid")


RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("value_cents", T.LongType(), False),
    ]
)

RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("value_cents", T.LongType(), False),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running per-user
    totals emitted every micro-batch (update mode).

    The template for operators Spark lacks natively: explicit state schema,
    Arrow-batched per-group input, GroupState get/update, timeout config.
    """
    import pandas as pd  # local import: executors pickle this closure

    def update(key, pdf_iter, state):
        (user_id,) = key
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # per-row fixed-point BEFORE summing — the cents() convention used
            # engine-wide. Spark's F.round is HALF_UP (away from zero) while
            # pandas .round() is banker's half-even, so half-cents must be
            # rounded explicitly or the stream drifts from every batch twin.
            import numpy as np

            scaled = pdf["value"].to_numpy(dtype="float64") * 100.0
            half_up = np.where(
                scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
            )
            cents += int(half_up.astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "value_cents": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def join_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: each purchase matched to the
    clicks of the same user within the preceding ``window``.

    THE stateful join shape of Structured Streaming: both sides buffer rows
    in the state store, and the combination of (a) watermarks on both event
    times and (b) a closed time-range predicate lets Spark evict state as
    the watermark passes — without both, a stream-stream join's state grows
    forever. State per key is bounded by (rate × (window + watermark)).

    Batch DataFrames run the identical join (unified model), which is the
    twin the tests compare against.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond, "inner").select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )
