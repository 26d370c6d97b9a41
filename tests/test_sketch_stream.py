"""Streaming CMS store: linearity, replay idempotence, compaction."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_warehouse_spark import catalog as cat
from data_warehouse_spark.operators import sketches
from data_warehouse_spark.streaming import sketch_stream as ss

from .conftest import SF_DIR

# streaming/serving e2e tier: full-pipeline ticks / HTTP / stateful
# streams (see pytest.ini) - deselected from the per-commit unit core
pytestmark = pytest.mark.slow


def _token_batches(spark, n=3):
    docs = cat.load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"[^a-z0-9]+", " ")), " ")).alias("k"),
    ).filter(F.col("k") != "")
    return toks, [toks.filter(F.col("doc_id") % n == i).select("k") for i in range(n)]


def test_stream_sketch_equals_batch_sketch_after_all_epochs(spark, tmp_path):
    toks, batches = _token_batches(spark)
    store = ss.sketch_store(spark, str(tmp_path / "sk"))
    sink = ss.SketchSink(store, "k")
    for epoch, b in enumerate(batches):
        assert sink(b, epoch) > 0
    served = {
        (r["d"], r["bucket"]): r["cnt"] for r in ss.served_sketch(store).collect()
    }
    whole = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in sketches.count_min_sketch(toks.select("k"), "k").collect()
    }
    assert served == whole  # CMS linearity: epoch cells sum to the batch sketch


def test_stream_replay_inserts_nothing_twice(spark, tmp_path):
    _, batches = _token_batches(spark)
    store = ss.sketch_store(spark, str(tmp_path / "sk"))
    sink = ss.SketchSink(store, "k")
    sink(batches[0], 0)
    before = sorted(map(tuple, ss.served_sketch(store).collect()))
    assert sink(batches[0], 0) == 0  # foreachBatch re-delivery of epoch 0
    assert sorted(map(tuple, ss.served_sketch(store).collect())) == before


def test_estimates_bound_true_counts(spark, tmp_path):
    toks, batches = _token_batches(spark)
    store = ss.sketch_store(spark, str(tmp_path / "sk"))
    sink = ss.SketchSink(store, "k")
    for epoch, b in enumerate(batches):
        sink(b, epoch)
    true = toks.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    est = ss.estimate_counts(store, true.select("k"), "k")
    joined = true.join(est, "k").collect()
    assert len(joined) > 0
    assert all(r["estimated_count"] >= r["n"] for r in joined), [
        r for r in joined if r["estimated_count"] < r["n"]
    ][:3]


def test_compaction_folds_epochs_and_skips_stale_replays(spark, tmp_path):
    _, batches = _token_batches(spark)
    store = ss.sketch_store(spark, str(tmp_path / "sk"))
    sink = ss.SketchSink(store, "k")
    for epoch, b in enumerate(batches):
        sink(b, epoch)
    before = sorted(map(tuple, ss.served_sketch(store).collect()))
    assert ss.compact_epochs(store) == len(batches)
    # the store shrank to the base epoch only; serving is unchanged
    epochs = [
        r["epoch"]
        for r in store.read(ss.CMS_EPOCHS_TABLE).select("epoch").distinct().collect()
    ]
    assert epochs == [ss.BASE_EPOCH]
    assert sorted(map(tuple, ss.served_sketch(store).collect())) == before
    # a stale replay of a folded epoch must be skipped, not re-counted
    assert sink(batches[1], 1) == 0
    assert sorted(map(tuple, ss.served_sketch(store).collect())) == before
    # second compaction is a no-op
    assert ss.compact_epochs(store) == 0
