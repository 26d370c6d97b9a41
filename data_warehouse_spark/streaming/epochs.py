"""Shared epoch-store scaffolding for replay-exactly-once streaming sinks.

Both additive stores (``sketch_stream``'s CMS cells, ``rollup_stream``'s
exact rollup deltas) rely on the same construction: per-micro-batch rows
keyed by ``(epoch, …)`` MERGE-inserted with DO-NOTHING semantics (a
replayed epoch inserts nothing), serving by an additive fold over epochs,
and compaction folding history into a reserved base epoch. This module
holds the one copy of the two subtle pieces:

**Watermark-first compaction.** ``compact_additive`` persists the
compaction watermark BEFORE folding. Both crash orders stay exact: a
crash after the watermark but before the fold leaves the epochs in place
(serving still sums them; replays of those epochs are skipped, which is
correct because their rows are still counted; the next compaction re-runs
the fold). The reverse order would open a window where a folded epoch's
replay re-inserts and double-counts.

**Single-writer assumption.** The store is a plain versioned parquet
table with no cross-writer coordination: compaction reads the epoch set,
then overwrites. An epoch inserted BETWEEN that read and the overwrite
would be dropped from the fold and its replay skipped by the advanced
watermark — so compaction must not run concurrently with the sink.
Every caller here satisfies that structurally (the ingestion loop is
single-flight; foreachBatch serializes micro-batches; compaction belongs
in the same maintenance slot as ``TableStore.compact``). A multi-writer
deployment needs a real transaction log (Delta/Iceberg) underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import TableStore

BASE_EPOCH = -1  # reserved: the fold target of compacted epochs

META_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), False),
    ]
)


def compacted_watermark(store: TableStore, meta_table: str) -> int:
    """Highest epoch folded into the base (BASE_EPOCH when none)."""
    if not store.exists(meta_table):
        return BASE_EPOCH
    rows = store.read(meta_table).filter(F.col("k") == "compacted_through").collect()
    return rows[0]["v"] if rows else BASE_EPOCH


def insert_epoch(
    store: TableStore,
    epochs_table: str,
    meta_table: str,
    epoch_id: int,
    rows: DataFrame,
    key_cols: list[str],
) -> int:
    """MERGE-insert one epoch's rows; 0 for a replayed epoch (PK
    collision) or a stale replay of an epoch already compacted away."""
    if epoch_id <= compacted_watermark(store, meta_table):
        return 0
    cells = rows.select(
        F.lit(int(epoch_id)).cast("long").alias("epoch"), *rows.columns
    )
    return store.merge_insert_missing(epochs_table, cells, ["epoch", *key_cols])


def served_additive(
    store: TableStore, epochs_table: str, group_cols: list[str], measures: list[str]
) -> DataFrame:
    """The live view: per-group sum of every measure over all epochs."""
    return (
        store.read(epochs_table)
        .groupBy(*group_cols)
        .agg(*[F.sum(m).alias(m) for m in measures])
    )


def compact_additive(
    store: TableStore,
    epochs_table: str,
    meta_table: str,
    group_cols: list[str],
    measures: list[str],
) -> int:
    """Fold every stored epoch into the base epoch per group (the
    additivity serving relies on); watermark FIRST — see module docstring
    for the crash-order argument. Returns the number of epochs folded."""
    if not store.exists(epochs_table):
        return 0
    cells = store.read(epochs_table)
    epoch_ids = [r["epoch"] for r in cells.select("epoch").distinct().collect()]
    folded = [e for e in epoch_ids if e != BASE_EPOCH]
    if not folded:
        return 0
    meta = store.spark.createDataFrame(
        [("compacted_through", int(max(folded)))], schema=META_SCHEMA
    )
    store.overwrite(meta_table, meta)
    base = (
        cells.groupBy(*group_cols)
        .agg(*[F.sum(m).alias(m) for m in measures])
        .select(F.lit(BASE_EPOCH).cast("long").alias("epoch"), *group_cols, *measures)
    )
    store.overwrite(epochs_table, base)
    return len(folded)
