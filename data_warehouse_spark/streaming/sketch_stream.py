"""Streaming sketch maintenance: an always-fresh count-min store.

The batch sketch (``operators/sketches.py``) answers "which keys are
frequent?" over a corpus at rest. A production pipeline wants the same
answer continuously over an arriving stream without re-scanning history —
and the CMS is LINEAR (cells add), so the stored sketch of stream∪batch is
exactly stored-cells + batch-cells.

Exactly-once under replay is the design constraint: a re-delivered
micro-batch (at-least-once source, foreachBatch re-invocation after crash)
must not double-count. Epoch-keyed cells give that for free:

  cms_epochs table   (epoch, d, bucket, cnt) — one constant-size sketch
                     per micro-batch, MERGE-inserted on PK (epoch, d,
                     bucket) DO NOTHING → a replayed epoch inserts nothing;
  serving            merged sketch = SUM(cnt) per (d, bucket) over epochs
                     (linearity), a ≤ depth×width×epochs row aggregation —
                     never touches the raw stream;
  compaction         epochs fold into the reserved base epoch −1 cell-wise
                     (same linearity); the high-watermark of folded epochs
                     is persisted so a STALE replay arriving after its
                     epoch was compacted away is recognized and skipped
                     rather than re-inserted.

Estimates served from the store carry the standard CMS one-sided guarantee
(estimate ≥ true count); for exact heavy hitters over data at rest, use
``sketches.cms_heavy_hitters`` — this module is the monitoring/triage path
(hot keys RIGHT NOW, a few KB of state, zero history re-reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import sketches
from ..sources.tables import TableStore
from . import epochs

CMS_EPOCHS_TABLE = "cms_epochs"
CMS_META_TABLE = "cms_meta"
BASE_EPOCH = epochs.BASE_EPOCH

_EPOCHS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("d", T.IntegerType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)
def sketch_store(spark: SparkSession, root: str) -> TableStore:
    """A TableStore wired for :class:`SketchSink`."""
    return TableStore(
        spark, root, {CMS_EPOCHS_TABLE: _EPOCHS_SCHEMA, CMS_META_TABLE: epochs.META_SCHEMA}
    )


class SketchSink:
    """``foreachBatch`` hook maintaining the epoch-keyed CMS store.

    Wire as ``stream.writeStream.foreachBatch(SketchSink(store, "token"))``
    or call per incremental-batch tick. Returns the number of cells
    inserted (0 for a replayed or already-compacted epoch — the
    idempotence signal, mirroring the discovery-count convention of the
    other sinks).
    """

    def __init__(
        self,
        store: TableStore,
        key_col: str,
        width: int = sketches.CMS_WIDTH,
        depth: int = sketches.CMS_DEPTH,
    ):
        self.store = store
        self.key_col = key_col
        self.width = width
        self.depth = depth

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> int:
        cells = sketches.count_min_sketch(
            batch_df, self.key_col, width=self.width, depth=self.depth
        ).select(
            F.col("d").cast("int").alias("d"),
            F.col("bucket").cast("int").alias("bucket"),
            F.col("cnt").cast("long").alias("cnt"),
        )
        return epochs.insert_epoch(
            self.store, CMS_EPOCHS_TABLE, CMS_META_TABLE, epoch_id, cells, ["d", "bucket"]
        )


def served_sketch(store: TableStore) -> DataFrame:
    """The merged live sketch: (d, bucket, cnt) summed over every stored
    epoch (CMS linearity). Input is ≤ depth×width×epochs rows."""
    return (
        store.read(CMS_EPOCHS_TABLE)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def estimate_counts(
    store: TableStore,
    keys: DataFrame,
    key_col: str,
    width: int = sketches.CMS_WIDTH,
    depth: int = sketches.CMS_DEPTH,
) -> DataFrame:
    """Frequency estimate for each requested key from the stored sketch —
    map-side literal lookups against the merged cells (the serving path:
    no stream scan, no join). Estimates are ≥ the true stream counts."""
    table = sketches.sketch_table(served_sketch(store).collect(), width, depth)
    key = F.col(key_col)
    est = sketches.estimate_expr(table, key, width, depth)
    return keys.select(key, est.cast("long").alias("estimated_count"))


def compact_epochs(store: TableStore) -> int:
    """Fold every stored epoch into the reserved base epoch (cell-wise sum —
    the same linearity serving relies on) and advance the compaction
    watermark so stale replays of folded epochs are skipped, not
    re-counted. Returns the number of epochs folded away.

    Run periodically from the maintenance path (like ``TableStore.compact``
    for part files): the store shrinks from depth×width×epochs rows back to
    ≤ depth×width, and serving cost stops growing with stream age.
    Watermark-first crash safety and the single-writer assumption are
    documented once, in ``epochs.py``.
    """
    return epochs.compact_additive(
        store, CMS_EPOCHS_TABLE, CMS_META_TABLE, ["d", "bucket"], ["cnt"]
    )
