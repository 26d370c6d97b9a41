"""Streaming exact-rollup maintenance: replay-safe, delete-aware, compactable."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from data_warehouse_spark.operators import ivm
from data_warehouse_spark.streaming import rollup_stream as rs

# streaming/serving e2e tier: full-pipeline ticks / HTTP / stateful
# streams (see pytest.ini) - deselected from the per-commit unit core
pytestmark = pytest.mark.slow

SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.StringType(), False),
        T.StructField("amount_cents", T.LongType(), False),
    ]
)
GROUP_FIELDS = [T.StructField("tenant", T.StringType(), False)]
GROUP = ["tenant"]
SUMS = ["amount_cents"]


def _store(spark, tmp_path):
    return rs.rollup_store(spark, str(tmp_path / "rollup"), GROUP_FIELDS, SUMS)


def _served(store):
    return {
        r["tenant"]: (r["n_rows"], r["sum_amount_cents"])
        for r in rs.served_rollup(store, GROUP, SUMS).collect()
    }


def test_stream_equals_batch_and_replay_is_noop(spark, tmp_path):
    store = _store(spark, tmp_path)
    sink = rs.RollupSink(store, GROUP, SUMS)
    b1 = spark.createDataFrame([("A", 100), ("A", 50), ("B", 7)], SCHEMA)
    b2 = spark.createDataFrame([("A", 1), ("C", 30)], SCHEMA)
    assert sink(b1, 0) > 0
    assert sink(b2, 1) > 0
    # serving equals the batch rollup over the union of all arrivals
    batch = ivm.compute_rollup(b1.unionByName(b2), GROUP, SUMS)
    expected = {
        r["tenant"]: (r["n_rows"], r["sum_amount_cents"]) for r in batch.collect()
    }
    assert _served(store) == expected
    # replayed epochs insert nothing and change nothing
    assert sink(b1, 0) == 0
    assert sink(b2, 1) == 0
    assert _served(store) == expected


def test_cdc_image_batches_maintain_deletes(spark, tmp_path):
    store = _store(spark, tmp_path)
    sink = rs.RollupSink(store, GROUP, SUMS)
    sink(spark.createDataFrame([("A", 100), ("B", 40)], SCHEMA), 0)
    cdc_schema = T.StructType(
        [T.StructField(ivm.CHANGE_COL, T.StringType(), False)] + SCHEMA.fields
    )
    # update A (delete+insert images) and delete B entirely
    cdc = spark.createDataFrame(
        [("delete", "A", 100), ("insert", "A", 175), ("delete", "B", 40)],
        cdc_schema,
    )
    assert sink(cdc, 1) > 0
    assert _served(store) == {"A": (1, 175)}  # B vanished


def test_compaction_preserves_serving_and_skips_stale_replay(spark, tmp_path):
    store = _store(spark, tmp_path)
    sink = rs.RollupSink(store, GROUP, SUMS)
    b1 = spark.createDataFrame([("A", 10)], SCHEMA)
    b2 = spark.createDataFrame([("A", 5), ("B", 3)], SCHEMA)
    sink(b1, 0)
    sink(b2, 1)
    before = _served(store)
    assert rs.compact_epochs(store, GROUP, SUMS) == 2
    assert _served(store) == before
    # one folded base row per group remains
    assert store.read(rs.ROLLUP_EPOCHS_TABLE).count() == 2
    # a stale replay of a folded epoch must be skipped, not re-counted
    assert sink(b1, 0) == 0
    assert sink(b2, 1) == 0
    assert _served(store) == before
