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

DEPLOYMENT SCOPE (measured, INGEST_BENCH.json): this arm is for
**bursty-append trees** — moderate file counts with new files arriving in
batches, where the checkpointed exactly-once index earns its keep.  It is
NOT the wide-tree default: Spark's ``FileStreamSource`` re-LISTS the full
glob every trigger (one Hadoop ``listStatus`` per directory, then a diff
against the seen-files map), so the IDLE tick cost grows with total tree
width regardless of ``maxFilesPerTrigger`` — measured 62.6 s per idle
tick at 50 k accounts / 57.5 k files vs the scandir arm's 3.5 s, ~18×,
against the reference's 2 s cadence.  That cost is the source's listing
architecture, not a tuning gap: the streaming file index keeps no
directory-level incremental state (a well-known limitation; managed
platforms solve it with file-NOTIFICATION sources — cloud event queues —
which need infra this repo can't assume).  The scandir arm
(:class:`.ingest.IngestionPipeline`) holds the cadence at wide trees
because its per-account watermarks make the walk O(new files) in content
reads and its listing is a raw ``os.scandir`` pass with none of the
per-file FileStatus overhead.  Both arms are merge-identical on golden
fixtures (tests/test_file_ingest.py), so the choice is purely
operational: scandir for wide trees / steady 2 s cadence, file-source
for bursty appends or when the checkpointed index must survive restarts
without the account-table watermarks.
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
                version = self._write_pending(leftover)
                if picked.limit(1).count():
                    self._pipeline._expand_and_merge(
                        m, files_read, picked, accounts, monotonic_markers=True
                    )
                # COMMIT LAST: the new version becomes readable only after
                # every merge it depends on has durably completed. A crash
                # anywhere before this line leaves the version invisible
                # (readers fall back to the previous committed version,
                # which still holds the rows this batch drained into
                # ``picked``) — the replay re-merges them as keyed no-ops.
                self._commit_pending(version)
            finally:
                candidates.unpersist()
        finally:
            bdf.unpersist()
            self.last_metrics = m

    # ------------------------------------------------------------------
    # Orphan-event pending store: VERSIONED directories under
    # ``pending_events/`` (``v1``, ``v2``, …). Each batch writes its
    # leftover set as a brand-new version (a distributed parquet write —
    # rows never pass through the driver). TWO markers gate a version:
    #   _SUCCESS  (Spark's)  — the data files are durably written;
    #   COMMITTED (ours)     — touched only AFTER the batch's table merges
    #                          completed, i.e. after every row this version
    #                          OMITS (the drained ``picked`` set) has been
    #                          durably merged into the warehouse.
    # Readers take the newest version carrying BOTH markers and prune the
    # rest. Crash anywhere is safe:
    #   mid-write              → no _SUCCESS → invisible garbage, pruned;
    #   write ok, merge lost   → _SUCCESS but no COMMITTED → readers fall
    #                            back to the PREVIOUS committed version,
    #                            which still holds the rows this batch
    #                            drained; the checkpoint replay re-merges
    #                            them (keyed merges dedupe). Without the
    #                            COMMITTED gate those drained rows would be
    #                            lost: the replay's batch_events doesn't
    #                            contain them (they came from older files)
    #                            and the file index never redelivers.
    #   merge ok, commit lost  → same fallback; replay re-runs the merges
    #                            as no-ops, rewrites, then commits;
    #   two committed versions (prune lost) → newest wins, older deleted
    #                            at the next read.
    # Writing the DATA before the table merges is still required: the
    # leftover plan reads the account store, so materializing it first
    # means it can never race the store's copy-on-write file swap — the
    # reason the old implementation collect()ed.

    # above this many parked orphans the batch logs a writer-bug warning
    # (driver safety no longer depends on this — nothing is collected)
    pending_warn_threshold = 10_000

    def _pending_root(self) -> str:
        return os.path.join(self.checkpoint_dir, "pending_events")

    def _version_dirs(self) -> list[int]:
        """Every ``vN`` directory, committed or not — the numbering source
        (a crashed batch's uncommitted ``vN`` must not be reused while it
        still exists on disk)."""
        root = self._pending_root()
        if not os.path.isdir(root):
            return []
        return sorted(
            int(d[1:])
            for d in os.listdir(root)
            if d.startswith("v") and d[1:].isdigit()
        )

    def _pending_versions(self) -> list[int]:
        """Versions eligible for reading: data durable (``_SUCCESS``) AND
        the writing batch's merges completed (``COMMITTED``)."""
        root = self._pending_root()
        out = []
        for v in self._version_dirs():
            d = os.path.join(root, f"v{v}")
            if os.path.exists(os.path.join(d, "_SUCCESS")) and os.path.exists(
                os.path.join(d, "COMMITTED")
            ):
                out.append(v)
        return out

    def _read_pending(self) -> DataFrame:
        vers = self._pending_versions()
        if vers:
            # prune superseded AND crash-garbage versions NOW (before this
            # batch's candidates plan exists) — never right after a write,
            # where a persisted-DataFrame recompute could still re-read the
            # old version. Everything except the newest committed version
            # is dead: older committed = superseded, uncommitted = a
            # crashed batch whose replay recomputes it.
            import shutil

            for v in self._version_dirs():
                if v != vers[-1]:
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

    def _write_pending(self, leftover: DataFrame) -> int:
        """Write the orphan-event store's next version — distributed,
        bounded file count (the store is small in steady state; a flood is
        a slow executor-side write, never driver memory). The version is
        NOT readable yet: the caller commits it only after its batch's
        table merges durably complete (see the protocol note above)."""
        dirs = self._version_dirs()
        nxt = (dirs[-1] + 1) if dirs else 1
        leftover.select(*primary.ACCOUNT_EVENT_SCHEMA.fieldNames()).coalesce(
            1
        ).write.mode("overwrite").parquet(
            os.path.join(self._pending_root(), f"v{nxt}")
        )
        return nxt

    def _commit_pending(self, version: int) -> None:
        """Make ``vN`` eligible for reading — called only after the batch's
        merges completed, so a fallback to the previous version can never
        lose drained rows."""
        marker = os.path.join(self._pending_root(), f"v{version}", "COMMITTED")
        open(marker, "w").close()


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
        # serving balance-rollup convergence (noop when fresh — per-batch
        # maintenance already ran inside _expand_and_merge; this covers
        # bootstrap over an externally loaded change table)
        from ..operators import balance_view

        balance_view.maintain(self.store)
        return self.last_metrics
