"""Streaming incremental view maintenance: an always-fresh exact rollup.

``operators/ivm.py`` maintains a stored COUNT/SUM rollup from one CDC
batch. This module keeps that view current from a STREAM under replay —
the same epoch-keyed construction as ``sketch_stream.py``, applied to an
exact additive aggregate instead of a sketch:

  rollup_epochs   (epoch, group…, n_rows, sum_…) — one per-group delta
                  row set per micro-batch, MERGE-inserted on PK
                  (epoch, group…) DO NOTHING → a replayed epoch inserts
                  nothing (exactly-once without a transaction log);
  serving         view = per-group SUM over epochs (additivity — the
                  same telescoping algebra ivm.apply_delta relies on),
                  groups whose running count is zero dropped;
  compaction      epochs fold into the reserved base epoch, watermark
                  FIRST so a stale replay of a folded epoch is skipped,
                  never re-inserted (same crash-order argument as
                  ``sketch_stream.compact_epochs``).

Batches may be plain appends (every row counts +1) or CDC row images
carrying ``ivm.CHANGE_COL`` (insert/delete signs — streaming deletes
maintain the view exactly; the sink detects the column and reuses
``ivm.cdc_delta``). Served totals are EXACT, not estimates — the sink's
value over ``SketchSink`` is exactness for the distributive aggregates;
its cost is state linear in |groups|, where the CMS is constant-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import ivm
from ..sources.tables import TableStore

ROLLUP_EPOCHS_TABLE = "rollup_epochs"
ROLLUP_META_TABLE = "rollup_meta"
BASE_EPOCH = -1

_META_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), False),
    ]
)


def rollup_store(
    spark: SparkSession,
    root: str,
    group_fields: list[T.StructField],
    sum_cols: list[str],
) -> TableStore:
    """A TableStore wired for :class:`RollupSink` over the given group
    columns; every maintained measure is a BIGINT (the repo's integer
    fixed-point discipline — float sums would drift under maintenance)."""
    epochs_schema = T.StructType(
        [T.StructField("epoch", T.LongType(), False)]
        + list(group_fields)
        + [T.StructField("n_rows", T.LongType(), False)]
        + [T.StructField(f"sum_{c}", T.LongType(), False) for c in sum_cols]
    )
    return TableStore(
        spark,
        root,
        {ROLLUP_EPOCHS_TABLE: epochs_schema, ROLLUP_META_TABLE: _META_SCHEMA},
    )


def _compacted_watermark(store: TableStore) -> int:
    if not store.exists(ROLLUP_META_TABLE):
        return BASE_EPOCH
    rows = (
        store.read(ROLLUP_META_TABLE).filter(F.col("k") == "compacted_through").collect()
    )
    return rows[0]["v"] if rows else BASE_EPOCH


class RollupSink:
    """``foreachBatch`` hook maintaining the epoch-keyed exact rollup.

    Returns the number of delta rows inserted (0 for a replayed or
    already-compacted epoch — the idempotence signal)."""

    def __init__(self, store: TableStore, group_cols: list[str], sum_cols: list[str]):
        self.store = store
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> int:
        if epoch_id <= _compacted_watermark(self.store):
            return 0
        if ivm.CHANGE_COL in batch_df.columns:
            delta = ivm.cdc_delta(batch_df, self.group_cols, self.sum_cols)
        else:
            delta = ivm.compute_rollup(batch_df, self.group_cols, self.sum_cols)
        cells = delta.select(
            F.lit(int(epoch_id)).cast("long").alias("epoch"),
            *self.group_cols,
            F.col("n_rows").cast("long").alias("n_rows"),
            *[F.col(f"sum_{c}").cast("long").alias(f"sum_{c}") for c in self.sum_cols],
        )
        return self.store.merge_insert_missing(
            ROLLUP_EPOCHS_TABLE, cells, ["epoch", *self.group_cols]
        )


def served_rollup(store: TableStore, group_cols: list[str], sum_cols: list[str]) -> DataFrame:
    """The live view: per-group totals summed over epochs, zero-count
    groups dropped (a group fully deleted by CDC images vanishes, exactly
    as in ``ivm.apply_delta``)."""
    measures = ["n_rows"] + [f"sum_{c}" for c in sum_cols]
    return (
        store.read(ROLLUP_EPOCHS_TABLE)
        .groupBy(*group_cols)
        .agg(*[F.sum(m).alias(m) for m in measures])
        .filter(F.col("n_rows") > 0)
    )


def compact_epochs(store: TableStore, group_cols: list[str], sum_cols: list[str]) -> int:
    """Fold all epochs into the base epoch per group (the additivity
    serving relies on); watermark first — both crash orders stay exact
    (see sketch_stream.compact_epochs for the argument). Returns the
    number of epochs folded away."""
    if not store.exists(ROLLUP_EPOCHS_TABLE):
        return 0
    cells = store.read(ROLLUP_EPOCHS_TABLE)
    epochs = [r["epoch"] for r in cells.select("epoch").distinct().collect()]
    folded = [e for e in epochs if e != BASE_EPOCH]
    if not folded:
        return 0
    meta = store.spark.createDataFrame(
        [("compacted_through", int(max(folded)))], schema=_META_SCHEMA
    )
    store.overwrite(ROLLUP_META_TABLE, meta)
    measures = ["n_rows"] + [f"sum_{c}" for c in sum_cols]
    base = (
        cells.groupBy(*group_cols)
        .agg(*[F.sum(m).alias(m) for m in measures])
        .select(F.lit(BASE_EPOCH).cast("long").alias("epoch"), *group_cols, *measures)
    )
    store.overwrite(ROLLUP_EPOCHS_TABLE, base)
    return len(folded)
