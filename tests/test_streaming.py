"""Structured Streaming tests: file-source micro-batches driven to
completion, checked against the batch twins (unified-model equivalence)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_warehouse_spark.operators import analytics
from data_warehouse_spark.streaming import events_stream

from .conftest import SF_DIR

# streaming/serving e2e tier: full-pipeline ticks / HTTP / stateful
# streams (see pytest.ini) - deselected from the per-commit unit core
pytestmark = pytest.mark.slow


@pytest.fixture()
def events_batch(spark):
    from data_warehouse_spark.catalog import load_table

    return load_table(spark, SF_DIR, "events")


@pytest.fixture()
def events_streaming(spark, events_batch, tmp_path):
    """The same events as a file-source STREAM (two parquet files so
    availableNow produces multiple micro-batches)."""
    src = str(tmp_path / "stream_src")
    half1, half2 = (
        events_batch.filter(F.col("event_id") % 2 == 0),
        events_batch.filter(F.col("event_id") % 2 == 1),
    )
    half1.write.mode("overwrite").parquet(os.path.join(src, "part1"))
    half2.write.mode("overwrite").parquet(os.path.join(src, "part2"))
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for sub in ("part1", "part2"):
        for f in os.listdir(os.path.join(src, sub)):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src, sub, f), os.path.join(flat, f"{n}.parquet"))
                n += 1
    return (
        spark.readStream.schema(events_batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(flat)
    )


def _run_to_completion(spark, sdf, name: str, output_mode: str):
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive
    return spark.sql(f"SELECT * FROM {name}")


def test_hourly_rollup_stream_equals_batch(spark, events_batch, events_streaming):
    batch = {
        (r["hour"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in analytics.events_hourly(events_batch).collect()
    }
    streamed = _run_to_completion(
        spark, events_stream.hourly_rollup(events_streaming), "hourly_out", "complete"
    )
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in streamed.collect()
    }
    # the batch twin also counts distinct users; compare the shared columns
    assert got == {k: v for k, v in batch.items()}


def test_session_windows_stream(spark, events_batch, events_streaming):
    batch_sessions = (
        analytics.sessionize(events_batch)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    expected = {
        r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch_sessions.collect()
    }
    streamed = _run_to_completion(
        spark, events_stream.session_windows(events_streaming), "sessions_out", "complete"
    )
    got = {}
    for r in streamed.collect():
        n_sess, n_ev = got.get(r["user_id"], (0, 0))
        got[r["user_id"]] = (n_sess + 1, n_ev + r["n_events"])
    assert got == expected


def test_running_user_totals_state(spark, events_batch, events_streaming):
    """Final stateful totals must equal the batch aggregate (state survives
    across micro-batches)."""
    expected = {
        r["user_id"]: (r["n"], r["cents"])
        for r in events_batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
    }
    streamed = _run_to_completion(
        spark,
        events_stream.running_user_totals(events_streaming),
        "running_out",
        "update",
    )
    # update mode emits one row per user per micro-batch: keep the last
    final = {}
    for r in streamed.collect():  # memory sink preserves batch order
        final[r["user_id"]] = (r["n_events"], r["value_cents"])
    assert final == expected


def test_foreachbatch_merge_idempotent(spark, events_batch, events_streaming, tmp_path):
    """Streaming sink via foreachBatch + keyed MERGE: replaying the whole
    stream into the same table adds zero duplicate rows (exactly-once
    semantics without a transactional format)."""
    from pyspark.sql import types as T

    from data_warehouse_spark.sources.tables import TableStore

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
        ]
    )
    store = TableStore(spark, str(tmp_path / "wh"), {"events_clean": schema})

    def sink(batch_df, _epoch):
        store.merge_insert_missing(
            "events_clean", batch_df.select("event_id", "user_id", "event_type"), ["event_id"]
        )

    def run():
        q = events_streaming.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        q.awaitTermination(300)

    run()
    n1 = store.read("events_clean").count()
    run()  # full replay (no checkpoint on purpose): MERGE must dedupe
    n2 = store.read("events_clean").count()
    assert n1 == events_batch.count()
    assert n2 == n1


def test_dedup_stream_removes_replayed_duplicates(spark, events_batch, tmp_path):
    """A file replayed verbatim (at-least-once upstream) must not double
    rows downstream: the streamed dedup output equals the batch distinct."""
    src = str(tmp_path / "dup_src")
    os.makedirs(src)
    sample = events_batch.limit(500).cache()
    sample.write.mode("overwrite").parquet(str(tmp_path / "one"))
    for f in os.listdir(str(tmp_path / "one")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(str(tmp_path / "one"), f), os.path.join(src, f"a_{f}"))
            shutil.copy(os.path.join(str(tmp_path / "one"), f), os.path.join(src, f"b_{f}"))
    sdf = (
        spark.readStream.schema(events_batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = _run_to_completion(
        spark, events_stream.dedup_stream(sdf), "dedup_stream_t", "append"
    )
    assert out.count() == sample.count()
    assert out.select("event_id").distinct().count() == sample.count()
    sample.unpersist()


def test_enrich_stream_static_join(spark, events_batch, events_streaming):
    """Stream-static left join: every event carries its dim attribute; dim
    misses survive as NULL (left join, not inner)."""
    user_ids = [r["user_id"] for r in events_batch.select("user_id").distinct().limit(3).collect()]
    dim = spark.createDataFrame(
        [(int(u), f"seg_{i}") for i, u in enumerate(user_ids)], ["uid", "segment"]
    )
    out = _run_to_completion(
        spark,
        events_stream.enrich_stream(events_streaming, dim),
        "enrich_stream_t",
        "append",
    )
    assert out.count() == events_batch.count()
    tagged = out.filter(F.col("segment").isNotNull())
    assert tagged.count() == events_batch.filter(F.col("user_id").isin(user_ids)).count()


def test_corpus_stream_dedups_across_micro_batches(spark, tmp_path):
    """The end-to-end incremental corpus pipeline: batch 2's near-dup of a
    batch-1 document is gated out by the signature store that batch 1
    populated, and a full replay appends nothing (idempotent end-to-end)."""
    from data_warehouse_spark.streaming import corpus_stream

    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "completely different content about spark query engines and shuffles"),
        ],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [
            (3, "the quick brown fox jumps over the lazy dog near the river shore"),  # near-dup of 1
            (4, "broadcast joins beat shuffles whenever one side fits in memory"),     # fresh
        ],
        "doc_id long, text string",
    )
    store = corpus_stream.corpus_store(spark, str(tmp_path / "corpus_wh"), b1)
    sink = corpus_stream.CorpusDedupSink(store)

    assert sink(b1, 0) == 2
    assert sink(b2, 1) == 1  # near-dup of an EARLIER batch's doc is gated
    kept = {r["doc_id"] for r in store.read(corpus_stream.CORPUS_TABLE).collect()}
    assert kept == {1, 2, 4}
    # signature store grew with the corpus — batch 3 is gated against batch 2
    assert store.read(corpus_stream.SIGS_TABLE).count() == 3
    # full replay of both batches: ids 1/2/3/4 all known or gated → no-op
    assert sink(b1, 2) == 0
    assert sink(b2, 3) == 0
    assert store.read(corpus_stream.CORPUS_TABLE).count() == 3


def test_corpus_stream_via_writestream(spark, tmp_path):
    """Same sink wired through a real writeStream.foreachBatch run."""
    from data_warehouse_spark.streaming import corpus_stream

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river bank!"),  # near-dup of 1
            (3, "partition pruning and predicate pushdown keep parquet scans minimal"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs_src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    store = corpus_stream.corpus_store(spark, str(tmp_path / "corpus_wh"), docs)
    sink = corpus_stream.CorpusDedupSink(store)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(300)
    kept = {r["doc_id"] for r in store.read(corpus_stream.CORPUS_TABLE).collect()}
    assert kept == {1, 3}  # within-batch near-dup gated, smaller id survives


def test_embedding_index_sink_appends_and_dedups(spark, tmp_path):
    """The vector sibling of the corpus sink: new vectors become servable
    per micro-batch, replayed ids append nothing, and the index keeps its
    cell-partitioned layout."""
    from data_warehouse_spark.operators import similarity
    from data_warehouse_spark.streaming.corpus_stream import EmbeddingIndexSink

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(emb, path)
    base = emb.count()
    q = emb.orderBy("vec_id").limit(1).collect()[0]
    twin_rows = [(777_777, [float(x) for x in q["embedding"]], 0)]
    batch = spark.createDataFrame(
        twin_rows + twin_rows,  # duplicate within the batch too
        "vec_id long, embedding array<float>, label int",
    )
    sink = EmbeddingIndexSink(path)
    assert sink(batch, 0) == 1  # in-batch duplicate collapsed
    assert sink(batch, 1) == 0  # full replay appends nothing
    _c, _cdf, corpus = similarity.load_ivf_index(spark, path)
    assert corpus.count() == base + 1
    top = similarity.ivf_topk_stored(spark, path, [q["vec_id"]], k=2).collect()
    assert top[0]["neighbor_id"] == 777_777  # fresh vector serves at rank 1


def test_stream_stream_interval_join_equals_batch(
    spark, events_batch, events_streaming
):
    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    expected = events_stream.join_streams(*split(events_batch)).collect()
    assert len(expected) > 0, "fixture must produce at least one match"
    out = _run_to_completion(
        spark,
        events_stream.join_streams(*split(events_streaming)),
        "ssjoin",
        "append",
    )
    got = out.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_stream_stream_join_requires_both_watermarks(spark, events_streaming):
    # the plan must carry watermarks on BOTH sides — that's what bounds the
    # join state; a missing one would make state grow without bound
    sdf = events_stream.join_streams(
        events_streaming.filter(F.col("event_type") == "click"),
        events_streaming.filter(F.col("event_type") == "purchase"),
    )
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2, plan
