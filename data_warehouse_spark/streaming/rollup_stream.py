"""Streaming incremental view maintenance: an always-fresh exact rollup.

``operators/ivm.py`` maintains a stored COUNT/SUM rollup from one CDC
batch. This module keeps that view current from a STREAM under replay —
the epoch-keyed construction shared with ``sketch_stream.py`` (one copy
of the watermark/compaction reasoning lives in ``epochs.py``), applied
to an exact additive aggregate instead of a sketch:

  rollup_epochs   (epoch, group…, n_rows, nn_…, sum_…) — one per-group
                  delta row set per micro-batch, MERGE-inserted on PK
                  (epoch, group…) DO NOTHING → a replayed epoch inserts
                  nothing (exactly-once without a transaction log);
  serving         view = per-group SUM over epochs (the telescoping
                  algebra ivm.apply_delta relies on), zero-count groups
                  dropped, sums with zero non-null contributions NULL;
  compaction      ``epochs.compact_additive`` — watermark-first, single
                  writer (see epochs.py for both arguments).

Batches may be plain appends (every row counts +1) or CDC row images
carrying ``ivm.CHANGE_COL`` (insert/delete signs — streaming deletes
maintain the view exactly; the sink detects the column and reuses
``ivm.cdc_delta``). Served totals are EXACT under the single-writer
assumption documented in epochs.py — the sink's value over
``SketchSink`` is exactness for the distributive aggregates; its cost is
state linear in |groups|, where the CMS is constant-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import ivm
from ..sources.tables import TableStore
from . import epochs

ROLLUP_EPOCHS_TABLE = "rollup_epochs"
ROLLUP_META_TABLE = "rollup_meta"
BASE_EPOCH = epochs.BASE_EPOCH


def rollup_store(
    spark: SparkSession,
    root: str,
    group_fields: list[T.StructField],
    sum_cols: list[str],
) -> TableStore:
    """A TableStore wired for :class:`RollupSink` over the given group
    columns. Counts are BIGINT; sums are BIGINT (the repo's integer
    fixed-point discipline — float sums would drift under maintenance)
    and nullable, NULL meaning "no non-null contributions"."""
    epochs_schema = T.StructType(
        [T.StructField("epoch", T.LongType(), False)]
        + list(group_fields)
        + [T.StructField("n_rows", T.LongType(), False)]
        + [T.StructField(f"nn_{c}", T.LongType(), False) for c in sum_cols]
        + [T.StructField(f"sum_{c}", T.LongType(), True) for c in sum_cols]
    )
    return TableStore(
        spark,
        root,
        {ROLLUP_EPOCHS_TABLE: epochs_schema, ROLLUP_META_TABLE: epochs.META_SCHEMA},
    )


class RollupSink:
    """``foreachBatch`` hook maintaining the epoch-keyed exact rollup.

    Returns the number of delta rows inserted (0 for a replayed or
    already-compacted epoch — the idempotence signal)."""

    def __init__(self, store: TableStore, group_cols: list[str], sum_cols: list[str]):
        self.store = store
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> int:
        if ivm.CHANGE_COL in batch_df.columns:
            delta = ivm.cdc_delta(batch_df, self.group_cols, self.sum_cols)
        else:
            delta = ivm.compute_rollup(batch_df, self.group_cols, self.sum_cols)
        measures = ivm.measure_cols(self.sum_cols)
        rows = delta.select(
            *self.group_cols,
            *[F.col(m).cast("long").alias(m) for m in measures],
        )
        return epochs.insert_epoch(
            self.store,
            ROLLUP_EPOCHS_TABLE,
            ROLLUP_META_TABLE,
            epoch_id,
            rows,
            self.group_cols,
        )


def served_rollup(store: TableStore, group_cols: list[str], sum_cols: list[str]) -> DataFrame:
    """The live view: per-group totals summed over epochs, zero-count
    groups dropped, all-NULL sums served as NULL (exactly as in
    ``ivm.apply_delta``)."""
    totals = epochs.served_additive(
        store, ROLLUP_EPOCHS_TABLE, group_cols, ivm.measure_cols(sum_cols)
    )
    sums = [
        F.when(F.col(f"nn_{c}") == 0, F.lit(None))
        .otherwise(F.col(f"sum_{c}"))
        .alias(f"sum_{c}")
        for c in sum_cols
    ]
    return totals.select(
        *group_cols,
        "n_rows",
        *[f"nn_{c}" for c in sum_cols],
        *sums,
    ).filter(F.col("n_rows") > 0)


def compact_epochs(store: TableStore, group_cols: list[str], sum_cols: list[str]) -> int:
    """Fold all epochs into the base epoch per group; watermark-first and
    single-writer (the one copy of both arguments: epochs.py). Returns the
    number of epochs folded away."""
    return epochs.compact_additive(
        store,
        ROLLUP_EPOCHS_TABLE,
        ROLLUP_META_TABLE,
        group_cols,
        ivm.measure_cols(sum_cols),
    )
