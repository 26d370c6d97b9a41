"""Structured-Streaming arm of the primary-storage ingestion (SURVEY §7
step 6): Spark's file source replaces the driver-side ``os.scandir`` crawl.

:class:`IngestionPipeline` (streaming/ingest.py) re-expresses the
reference's 2 s re-crawl (PrimaryDataExplorationService.scala:25-36) as a
batch tick whose discovery is a driver-side directory walk — O(new files)
in content reads, but the LISTING itself is single-threaded on the driver,
which becomes the tick's critical path at millions of accounts.
:class:`FileStreamIngestion` is the alternative mode that scales past that
ceiling: two ``readStream`` file sources (snapshot tree + event tree) with
Spark's checkpointed file index doing incremental discovery — each file is
delivered EXACTLY ONCE across restarts, so the per-account watermark
machinery (take-2 windows, count-skip) is unnecessary here; its job was
precisely to re-derive "what is new" from a stateless directory walk. The
default trigger is the reference's cadence,
``Trigger.ProcessingTime("2 seconds")``.

Each micro-batch reuses the batch pipeline's own stages verbatim
(``primary.parse_*`` for S4/S5/S6, ``IngestionPipeline._expand_and_merge``
for D6-D10): transaction content is still read per named active event
(never streamed — a transaction file's arrival order relative to its event
must not matter), every write is the same keyed MERGE, and markers advance
last, so crash-replays of a batch dedupe exactly like replayed ticks.

Scale notes: the streamed trees carry tiny files (meta lines, one-line
events), so ``maxFilesPerTrigger`` is the batch-size knob; the store
merges shuffle on the same tenant-partitioned keys as the batch mode; and
the file-index checkpoint replaces the account-table watermarks as the
source of incremental truth (both survive restarts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PRIMARY_KEYS
from ..sources import primary
from ..sources.tables import TableStore
from .ingest import IngestionPipeline, TickMetrics


class FileStreamIngestion:
    """File-source ingestion into the same :class:`TableStore` tables as
    the batch pipeline; ``strict`` gates the D8 invariant identically."""

    def __init__(
        self,
        spark: SparkSession,
        primary_root: str,
        store: TableStore,
        checkpoint_dir: str,
        strict: bool = True,
        max_files_per_trigger: int | None = None,
    ):
        self.spark = spark
        self.root = primary_root
        self.store = store
        self.checkpoint_dir = checkpoint_dir
        self._pipeline = IngestionPipeline(spark, primary_root, store, strict=strict)
        self.max_files_per_trigger = max_files_per_trigger
        self.last_metrics: TickMetrics | None = None

    # ------------------------------------------------------------------
    def _source(self, glob: str) -> DataFrame:
        reader = (
            self.spark.readStream.format("text")
            .option("wholetext", "true")
        )
        if self.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return (
            reader.load(os.path.join(self.root, glob))
            .select(
                F.col("_metadata.file_path").alias("path"),
                F.col("value"),
            )
        )

    def _stream(self) -> DataFrame:
        # two fixed-depth globs: the snapshot tree (account meta + snapshot
        # inventory) and the event tree. Transaction files are NOT streamed
        # — their content is read per named active event inside the batch
        # (the reference's D6 economy, and immunity to arrival order).
        snapshots = self._source("t_*/account/*/snapshot/*")
        events = self._source("t_*/account/*/events/*/*")
        return snapshots.unionByName(events)

    # ------------------------------------------------------------------
    def _process_batch(self, bdf: DataFrame, batch_id: int) -> None:
        m = TickMetrics()
        files_read = {"meta": 0, "events": 0, "transactions": 0}
        m.extra["files_read"] = files_read
        store = self.store
        bdf = bdf.persist()
        try:
            # --- tenants: discovered from the delivered paths (D3) --------
            tenants = (
                bdf.select(
                    F.regexp_extract("path", r"/t_([^/]+)/", 1).alias("name")
                )
                .filter(F.col("name") != "")
                .distinct()
            )
            m.tenants_discovered = store.merge_insert_missing(
                "tenant", tenants, PRIMARY_KEYS["tenant"]
            )

            # --- account meta: snapshot-0 files in this batch (S4) --------
            meta_raw = bdf.filter(
                F.col("path").rlike(r"/account/[^/]+/snapshot/0+$")
            )
            files_read["meta"] = meta_raw.count()
            if files_read["meta"]:
                meta = primary.parse_account_meta(self.spark, meta_raw).select(
                    "tenant",
                    "name",
                    "currency",
                    "format",
                    F.lit(0).cast("int").alias("last_syn_snapshot"),
                    F.lit(0).cast("int").alias("last_syn_event"),
                )
                m.accounts_discovered = store.merge_insert_missing(
                    "account", meta, PRIMARY_KEYS["account"]
                )

            # --- events: every delivered event file is new by construction
            #     (the file index is the watermark) — straight to D6-D10.
            #     The two sources throttle independently, so an account's
            #     events can arrive BEFORE its snapshot-0 meta; events whose
            #     account is not yet known are PARKED in the pending store
            #     and retried next batch (the batch crawl gets the same
            #     ordering guarantee from only listing events under known
            #     accounts). Markers advance monotonically because pending
            #     replays + late files break arrival order across batches.
            ev_raw = bdf.filter(F.col("path").rlike(r"/events/\d+/[^/]+$"))
            files_read["events"] = ev_raw.count()
            batch_events = primary.parse_account_events(self.spark, ev_raw)
            candidates = batch_events.unionByName(self._read_pending()).persist()
            try:
                accounts = store.read("account")
                known = accounts.select("tenant", F.col("name").alias("account"))
                picked = candidates.join(known, ["tenant", "account"], "left_semi")
                leftover = candidates.join(
                    known, ["tenant", "account"], "left_anti"
                )
                # Persist leftover durably BEFORE any table merge mutates
                # the store files this plan reads — as a NEW pending-store
                # VERSION written distributedly (executor tasks), never a
                # driver collect: a pathological writer producing millions
                # of orphans costs a slow parquet write, not driver memory.
                # Orphans are normally the anomaly window between an event
                # file landing and its account meta; the metric + warning
                # surface a store that grows instead of draining (writer
                # bug, deleted account), which otherwise taxes every batch.
                n_pending = leftover.count()
                m.extra["pending_events"] = n_pending
                if n_pending > self.pending_warn_threshold:
                    import logging

                    logging.getLogger(__name__).warning(
                        "pending-event store holds %d orphans - accounts "
                        "whose snapshot-0 meta never arrived; investigate "
                        "the primary writers",
                        n_pending,
                    )
                self._write_pending(leftover)
                if not picked.limit(1).count():
                    return
                self._pipeline._expand_and_merge(
                    m, files_read, picked, accounts, monotonic_markers=True
                )
            finally:
                candidates.unpersist()
        finally:
            bdf.unpersist()
            self.last_metrics = m

    # ------------------------------------------------------------------
    # Orphan-event pending store: VERSIONED directories under
    # ``pending_events/`` (``v1``, ``v2``, …). Each batch writes its
    # leftover set as a brand-new version (a distributed parquet write —
    # rows never pass through the driver), committed by Spark's own
    # ``_SUCCESS`` marker; readers take the newest committed version and
    # prune the superseded ones. Crash anywhere is safe:
    #   mid-write            → no _SUCCESS → next batch reads the previous
    #                          version (stale = replay no-op, same contract
    #                          as the batch pipeline's ticks);
    #   write ok, merge lost → the streaming checkpoint replays the batch;
    #                          the new version is a subset of what the
    #                          replay recomputes, keyed merges dedupe;
    #   two committed versions (prune lost) → newest wins, older deleted
    #                          at the next read.
    # Writing BEFORE the table merges also means the leftover plan (which
    # reads the account store) can never race the store's copy-on-write
    # file swap — the reason the old implementation collect()ed.

    # above this many parked orphans the batch logs a writer-bug warning
    # (driver safety no longer depends on this — nothing is collected)
    pending_warn_threshold = 10_000

    def _pending_root(self) -> str:
        return os.path.join(self.checkpoint_dir, "pending_events")

    def _pending_versions(self) -> list[int]:
        root = self._pending_root()
        if not os.path.isdir(root):
            return []
        out = []
        for d in os.listdir(root):
            if (
                d.startswith("v")
                and d[1:].isdigit()
                and os.path.exists(os.path.join(root, d, "_SUCCESS"))
            ):
                out.append(int(d[1:]))
        return sorted(out)

    def _read_pending(self) -> DataFrame:
        vers = self._pending_versions()
        if vers:
            # prune superseded versions NOW (before this batch's candidates
            # plan exists) — never right after a write, where a persisted-
            # DataFrame recompute could still re-read the old version
            import shutil

            for v in vers[:-1]:
                shutil.rmtree(
                    os.path.join(self._pending_root(), f"v{v}"),
                    ignore_errors=True,
                )
            # STRICT: a committed version that cannot be read must fail the
            # batch (streaming restart replays it with the store intact) —
            # swallowing the error would permanently drop parked events the
            # file index never redelivers.
            return self.spark.read.schema(primary.ACCOUNT_EVENT_SCHEMA).parquet(
                os.path.join(self._pending_root(), f"v{vers[-1]}")
            )
        return self.spark.createDataFrame([], primary.ACCOUNT_EVENT_SCHEMA)

    def _write_pending(self, leftover: DataFrame) -> None:
        """Write the orphan-event store as the next version — distributed,
        bounded file count (the store is small in steady state; a flood is
        a slow executor-side write, never driver memory)."""
        vers = self._pending_versions()
        nxt = (vers[-1] + 1) if vers else 1
        leftover.select(*primary.ACCOUNT_EVENT_SCHEMA.fieldNames()).coalesce(
            1
        ).write.mode("overwrite").parquet(
            os.path.join(self._pending_root(), f"v{nxt}")
        )

    # ------------------------------------------------------------------
    def start(self, processing_time: str = "2 seconds"):
        """Continuous mode: the reference's cadence as a streaming trigger."""
        self.last_metrics = None
        return (
            self._stream()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .start()
        )

    def run_available(self) -> TickMetrics | None:
        """Drain everything currently discoverable (``Trigger.AvailableNow``)
        and return the last batch's metrics — the deterministic test/backfill
        mode; the checkpointed file index carries over, so a later call picks
        up only files that appeared in between (an incremental "tick").
        Returns ``None`` when nothing new was discoverable (no batch ran)."""
        self.last_metrics = None
        q = (
            self._stream()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.last_metrics
