"""Incremental ingestion: primary storage → warehouse tables.

The reference's pipeline (PrimaryDataExplorationService.scala:25-36) crawls
the primary-storage tree every 2 s, upserting discoveries into the relational
store, bounded per tick by per-account high-watermarks
(``last_syn_snapshot`` / ``last_syn_event`` — D4/D5/D10 in SURVEY §2.2).

Spark re-expression: one :class:`IngestionPipeline` whose ``run_once`` is a
tick — set-oriented instead of per-entity async loops:

  tenants      discovered dirs            → MERGE insert-missing
  accounts     snapshot-0 metadata        → MERGE insert-missing (meta rows;
               watermarks live on the account row, preserved on re-discovery)
  snapshots    version inventory          → high-watermark filter
               (version ≥ last_syn_snapshot), row_number ≤ 2 per account —
               the reference's bounded incremental window (take(2) — :121)
  events       watermark filter (version ≥ last_syn_event on the account's
               current snapshot), status ≠ 0 gates transaction reads (D6)
  transfers    transaction files → relevance filter (touches a discovering
               account, D7) → invariant status check (D8) → MERGE
               insert-missing on PK (idempotent replay)
  markers      account watermarks advanced in the same tick (D10)
  balances     account_balance_change re-derived from committed transfers

Idempotence: every write is keyed MERGE; a crash between transfer-merge and
marker-advance replays work that the PK merge then drops — the same guarantee
the reference gets from ON CONFLICT DO NOTHING.

``run_forever`` wraps ``run_once`` in the 2 s single-flight cadence
(Trigger.ProcessingTime semantics; the reference's Lock/Free actor gives the
same ≤1-in-flight property — PrimaryDataExplorerActor.scala:34-127).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import account_balance_change_view
from ..schemas import (
    ACCOUNT_BALANCE_CHANGE_SCHEMA,
    ACCOUNT_SCHEMA,
    PRIMARY_KEYS,
    TENANT_SCHEMA,
    TRANSFER_SCHEMA,
)
from ..sources import primary
from ..sources.tables import TableStore


class InvariantViolation(Exception):
    """Transfer status ≠ discovering event status (reference D8 fails the
    pipeline and lets the supervisor restart it)."""


@dataclass
class TickMetrics:
    """Discovery counters (the reference's StatsD metrics —
    PrimaryDataExplorationService.scala:58,92,247)."""

    tenants_discovered: int = 0
    accounts_discovered: int = 0
    transfers_discovered: int = 0
    extra: dict = field(default_factory=dict)


def warehouse_store(spark: SparkSession, root: str) -> TableStore:
    return TableStore(
        spark,
        root,
        {
            "tenant": TENANT_SCHEMA,
            "account": ACCOUNT_SCHEMA,
            "transfer": _ingest_transfer_schema(),
            "account_balance_change": ACCOUNT_BALANCE_CHANGE_SCHEMA,
        },
        # hot tables partition by tenant: MERGE prunes to touched tenants,
        # GraphQL tenant-filtered reads prune at the scan
        partitions={"transfer": ["tenant"], "account_balance_change": ["tenant"]},
    )


def _ingest_transfer_schema():
    # transfer schema with the ingestion-grade amount precision (28,10)
    from pyspark.sql import types as T

    fields = []
    for f in TRANSFER_SCHEMA.fields:
        if f.name == "amount":
            fields.append(T.StructField("amount", primary.AMOUNT, False))
        else:
            fields.append(f)
    return T.StructType(fields)


class IngestionPipeline:
    def __init__(
        self, spark: SparkSession, primary_root: str, store: TableStore, strict: bool = True
    ):
        self.spark = spark
        self.root = primary_root
        self.store = store
        self.strict = strict

    # ------------------------------------------------------------------
    def run_once(self) -> TickMetrics:
        m = TickMetrics()
        spark, root, store = self.spark, self.root, self.store

        # --- tenants (D3 get-else-insert) ------------------------------
        tenants = primary.discover_tenants(spark, root).select(
            F.col("tenant").alias("name")
        )
        m.tenants_discovered = store.merge_insert_missing(
            "tenant", tenants, PRIMARY_KEYS["tenant"]
        )

        # --- accounts: snapshot-0 metadata, watermarks start at 0 ------
        meta = primary.read_account_meta(spark, root).select(
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

        accounts = store.read("account")

        # --- snapshot selection (D4): ≥ watermark, ascending, take 2 ----
        snaps = primary.read_snapshots(spark, root).withColumnRenamed(
            "name", "account"
        )
        marked = snaps.join(
            accounts.select(
                "tenant",
                F.col("name").alias("account"),
                "last_syn_snapshot",
                "last_syn_event",
            ),
            ["tenant", "account"],
        ).filter(F.col("version") >= F.col("last_syn_snapshot"))
        w = Window.partitionBy("tenant", "account").orderBy("version")
        selected_snaps = marked.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= 2
        )

        # --- event selection (D5): events of selected snapshots with
        #     version ≥ the account's event watermark -------------------
        events = primary.read_account_events(spark, root)
        snap_keys = selected_snaps.select(
            "tenant",
            "account",
            F.col("version").alias("snapshot_version"),
            "last_syn_snapshot",
            "last_syn_event",
        )
        # the event watermark applies ONLY to the boundary snapshot
        # (lastSynchronizedSnapshot == snapshot.version); event versions
        # restart per snapshot, so a newer snapshot takes ALL its events
        # (PrimaryDataExplorationService.scala:155-178). `>=` on the boundary
        # replays the last event; the PK merge dedupes — the idempotence story
        picked = events.join(snap_keys, ["tenant", "account", "snapshot_version"]).filter(
            (F.col("snapshot_version") > F.col("last_syn_snapshot"))
            | (F.col("version") >= F.col("last_syn_event"))
        )

        # --- transaction expansion (D6 status gate) --------------------
        active = picked.filter(F.col("status") != 0).select(
            "tenant", "account", "transaction", F.col("status").alias("event_status")
        )
        transfers_raw = primary.read_transactions(spark, root)
        joined = transfers_raw.join(
            F.broadcast(active.select("tenant", "account", "transaction", "event_status")),
            ["tenant", "transaction"],
        )

        # D7 relevance: transfer must touch the discovering account
        relevant = joined.filter(
            ((F.col("credit_tenant") == F.col("tenant")) & (F.col("credit_name") == F.col("account")))
            | ((F.col("debit_tenant") == F.col("tenant")) & (F.col("debit_name") == F.col("account")))
        )

        # D8 invariant: transfer status must equal the event's status
        if self.strict:
            bad = relevant.filter(F.col("status") != F.col("event_status")).limit(1).collect()
            if bad:
                r = bad[0]
                raise InvariantViolation(
                    f"transfer {r['tenant']}/{r['transaction']}/{r['transfer']} "
                    f"status={r['status']} != event status={r['event_status']}"
                )
            good = relevant
        else:
            good = relevant.filter(F.col("status") == F.col("event_status"))

        new_transfers = good.select(
            "tenant",
            "transaction",
            "transfer",
            "status",
            "credit_tenant",
            "credit_name",
            "debit_tenant",
            "debit_name",
            "amount",
            "currency",
            "value_date",
        )
        m.transfers_discovered = store.merge_insert_missing(
            "transfer", new_transfers, PRIMARY_KEYS["transfer"]
        )

        # --- marker advance (D10): per-account watermarks ----------------
        # Assignment semantics, not max: the reference sets
        # (lastSynchronizedSnapshot, lastSynchronizedEvent) := (snapshot,
        # event) per processed event (:180-186), so the final value is the
        # lexicographic max (snapshot, version) pair — and last_syn_event may
        # DECREASE when the snapshot advances (versions restart per snapshot).
        ev_pos = picked.groupBy("tenant", "account").agg(
            F.max(F.struct("snapshot_version", "version")).alias("pos")
        )
        advanced = (
            accounts.join(
                ev_pos.withColumnRenamed("account", "name"), ["tenant", "name"], "left"
            )
            .select(
                "tenant",
                "name",
                "currency",
                "format",
                F.coalesce(F.col("pos.snapshot_version"), F.col("last_syn_snapshot"))
                .cast("int")
                .alias("last_syn_snapshot"),
                F.coalesce(F.col("pos.version"), F.col("last_syn_event"))
                .cast("int")
                .alias("last_syn_event"),
            )
        )
        self.store.merge_upsert("account", advanced, PRIMARY_KEYS["account"])

        # --- derived gold table: signed balance changes -------------------
        abc = account_balance_change_view(
            store.read("transfer"), amount_type=primary.AMOUNT
        )
        store.overwrite("account_balance_change", abc)
        return m

    # ------------------------------------------------------------------
    def run_forever(self, tick_seconds: float = 2.0, max_ticks: int | None = None):
        """The reference's 2 s single-flight cadence (D12). Ticks never
        overlap; a failed tick is logged and the next one retries (the
        supervisor-restart behavior). :class:`InvariantViolation` (D8) is the
        one fatal case — it propagates so the outer supervisor decides."""
        n = 0
        while max_ticks is None or n < max_ticks:
            started = time.monotonic()
            try:
                yield self.run_once()
            except InvariantViolation:
                raise
            except Exception:  # noqa: BLE001 — supervisor semantics: log, retry next tick
                logging.getLogger(__name__).exception("ingestion tick failed; retrying next tick")
            n += 1
            elapsed = time.monotonic() - started
            if max_ticks is None or n < max_ticks:
                time.sleep(max(0.0, tick_seconds - elapsed))
