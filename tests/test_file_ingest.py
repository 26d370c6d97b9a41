"""FileStreamIngestion (Structured-Streaming file-source arm) must produce
IDENTICAL warehouse tables to the batch IngestionPipeline on the bbtest
golden fixtures, discover incrementally via the checkpointed file index
(second drain reads only new files), and enforce the same D8 invariant.

One deliberate difference, by construction of a file source: a tenant
directory containing NO files is invisible until its first file lands
(the batch crawl sees bare directories). Deliveries, not directories, are
the stream's unit — every fixture below carries files.
"""

from __future__ import annotations

import decimal
import os

import pytest

from data_warehouse_spark.streaming.file_ingest import FileStreamIngestion
from data_warehouse_spark.streaming.ingest import IngestionPipeline, warehouse_store

from .test_ingest import _write_transfer_fixture, write

# streaming/serving e2e tier: full-pipeline ticks / HTTP / stateful
# streams (see pytest.ini) - deselected from the per-commit unit core
pytestmark = pytest.mark.slow

TABLES = ("tenant", "account", "transfer", "account_balance_change")


def _rows(store, name):
    return sorted(tuple(r) for r in store.read(name).collect())


def _second_transfer(root: str) -> None:
    t = "t_TENANT_TRN"
    write(
        os.path.join(root, t, "transaction", "TRN2"),
        "committed\nTRX2 TENANT_TRN CREDIT TENANT_TRN DEBIT 2020-02-01T00:00:00Z 5 CZK\n",
    )
    write(os.path.join(root, t, "account", "CREDIT", "events", "0000000000", "1_2_TRN2"), "2\n")
    write(os.path.join(root, t, "account", "DEBIT", "events", "0000000000", "1_-2_TRN2"), "2\n")


@pytest.fixture()
def roots(spark, tmp_path):
    primary = str(tmp_path / "data")
    os.makedirs(primary, exist_ok=True)
    batch_store = warehouse_store(spark, str(tmp_path / "wh_batch"))
    stream_store = warehouse_store(spark, str(tmp_path / "wh_stream"))
    stream = FileStreamIngestion(
        spark, primary, stream_store, checkpoint_dir=str(tmp_path / "ckpt")
    )
    return primary, IngestionPipeline(spark, primary, batch_store), stream


def test_stream_matches_batch_on_golden_fixtures(roots):
    primary, batch, stream = roots
    _write_transfer_fixture(primary)
    write(
        os.path.join(primary, "t_TENANT_ACC", "account", "A2", "snapshot", "0000000000"),
        "EUR FORMAT_X\n",
    )
    batch.run_once()
    m = stream.run_available()
    assert m is not None and m.transfers_discovered == 1
    for name in TABLES:
        assert _rows(stream.store, name) == _rows(batch.store, name), name


def test_stream_second_drain_is_incremental(roots):
    """The checkpointed file index is the stream's watermark: a second
    drain delivers ONLY files that appeared since the first, and the
    resulting tables still equal a fresh batch crawl of the full tree —
    the two modes' incremental truths (file index vs account watermarks)
    converge to the same state."""
    primary, batch, stream = roots
    _write_transfer_fixture(primary)
    first = stream.run_available()
    assert first is not None and first.transfers_discovered == 1

    _second_transfer(primary)
    second = stream.run_available()
    # O(new files): 2 new event files, 1 newly named transaction, 0 meta
    assert second is not None
    assert second.extra["files_read"] == {
        "meta": 0,
        "events": 2,
        "transactions": 1,
    }
    assert second.transfers_discovered == 1

    batch.run_once()
    for name in TABLES:
        assert _rows(stream.store, name) == _rows(batch.store, name), name

    # replay drain: nothing new anywhere — no reads, no discoveries
    third = stream.run_available()
    assert third is None or third.extra["files_read"]["events"] == 0


def test_stream_balances_match_reference_scenario(roots):
    """The graphql_api.feature signed-balance golden, served from the
    stream-ingested store."""
    from data_warehouse_spark.operators import queries as wh

    primary, _batch, stream = roots
    _write_transfer_fixture(primary)
    stream.run_available()
    abc = stream.store.read("account_balance_change")
    credit = wh.account_balance(abc, "TENANT_TRN", "CREDIT").collect()[0]["balance"]
    debit = wh.account_balance(abc, "TENANT_TRN", "DEBIT").collect()[0]["balance"]
    assert credit == decimal.Decimal("1")
    assert debit == decimal.Decimal("-1")


def test_stream_parks_events_arriving_before_their_account_meta(roots):
    """The two file sources throttle independently, so an account's events
    can be delivered in an earlier micro-batch than its snapshot-0 meta.
    Those events must be PARKED and retried — not dropped (the file index
    never redelivers) and not half-processed without marker advance."""
    primary, batch, stream = roots
    t = "t_TENANT_TRN"
    # batch 1: events + transaction exist, meta does NOT
    write(
        os.path.join(primary, t, "transaction", "TRN"),
        "committed\nTRX TENANT_TRN CREDIT TENANT_TRN DEBIT 2020-01-01T00:00:00Z 1 CZK\n",
    )
    write(os.path.join(primary, t, "account", "CREDIT", "events", "0000000000", "1_1_TRN"), "1\n")
    write(os.path.join(primary, t, "account", "DEBIT", "events", "0000000000", "1_-1_TRN"), "1\n")
    first = stream.run_available()
    assert first is not None and first.transfers_discovered == 0
    assert stream.store.read("transfer").count() == 0  # parked, not ingested

    # batch 2: the meta files land — parked events must replay
    write(os.path.join(primary, t, "account", "CREDIT", "snapshot", "0000000000"), "CZK FORMAT_F\n")
    write(os.path.join(primary, t, "account", "DEBIT", "snapshot", "0000000000"), "CZK FORMAT_F\n")
    second = stream.run_available()
    assert second is not None and second.transfers_discovered == 1

    batch.run_once()
    for name in TABLES:
        assert _rows(stream.store, name) == _rows(batch.store, name), name


def test_stream_markers_never_regress_on_out_of_order_delivery(roots):
    """Files can appear out of order across micro-batches; a late LOWER
    event version must still ingest its transfer but must not move the
    account watermark backwards."""
    from pyspark.sql import functions as F

    primary, _batch, stream = roots
    t = "t_TENANT_TRN"
    write(os.path.join(primary, t, "account", "A", "snapshot", "0000000000"), "CZK FORMAT_F\n")
    write(
        os.path.join(primary, t, "transaction", "T2"),
        "committed\nX2 TENANT_TRN A TENANT_TRN B 2020-01-02T00:00:00Z 2 CZK\n",
    )
    write(os.path.join(primary, t, "account", "A", "events", "0000000000", "1_2_T2"), "2\n")
    stream.run_available()

    def marker():
        r = (
            stream.store.read("account")
            .filter((F.col("tenant") == "TENANT_TRN") & (F.col("name") == "A"))
            .collect()[0]
        )
        return (r["last_syn_snapshot"], r["last_syn_event"])

    assert marker() == (0, 2)
    # a LATE lower-version event file appears afterwards
    write(
        os.path.join(primary, t, "transaction", "T1"),
        "committed\nX1 TENANT_TRN A TENANT_TRN B 2020-01-01T00:00:00Z 1 CZK\n",
    )
    write(os.path.join(primary, t, "account", "A", "events", "0000000000", "1_1_T1"), "1\n")
    stream.run_available()
    assert marker() == (0, 2)  # not regressed to (0, 1)
    got = sorted(
        r["transaction"]
        for r in stream.store.read("transfer").select("transaction").collect()
    )
    assert got == ["T1", "T2"]  # the late transfer still ingested


def test_stream_strict_invariant_violation_fails_query(roots):
    """D8 in stream mode: a transfer whose status contradicts the
    discovering event fails the streaming query (supervisor semantics),
    exactly like the batch pipeline's InvariantViolation."""
    primary, _batch, stream = roots
    t = "t_TENANT_BAD"
    write(os.path.join(primary, t, "account", "A", "snapshot", "0000000000"), "CZK FORMAT_T\n")
    write(
        os.path.join(primary, t, "transaction", "TX"),
        "committed\nTR TENANT_BAD A TENANT_BAD B 2020-01-01T00:00:00Z 1 CZK\n",
    )
    # event claims status 2 (rollbacked), file says committed (1)
    write(os.path.join(primary, t, "account", "A", "events", "0000000000", "2_1_TX"), "1\n")
    with pytest.raises(Exception, match="status"):
        stream.run_available()


def test_stream_processing_time_trigger_runs(roots):
    """The continuous mode (Trigger.ProcessingTime — the reference's 2 s
    cadence) ingests a fixture end-to-end, then stops cleanly."""
    import time

    primary, _batch, stream = roots
    _write_transfer_fixture(primary)
    q = stream.start(processing_time="1 seconds")
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if (
                stream.last_metrics is not None
                and stream.store.read("transfer").count() == 1
            ):
                break
            time.sleep(0.5)
        assert stream.store.read("transfer").count() == 1
    finally:
        q.stop()


def test_pending_store_is_versioned_and_survives_floods(roots, caplog):
    """The orphan-event pending store must (a) never pass rows through the
    driver — it is written as versioned parquet directories, newest
    committed version wins, superseded versions pruned at the next read;
    (b) retain EVERY orphan even when a pathological writer floods it (the
    warn threshold only logs — dropping is not an option, the file index
    never redelivers); (c) drain completely once the account meta lands."""
    import logging

    primary, _batch, stream = roots
    t = "t_TENANT_FLOOD"
    stream.pending_warn_threshold = 10  # exercise the flood path cheaply
    n_trx = 25
    n_orphans = 2 * n_trx  # one credit + one debit event per transaction
    for i in range(n_trx):
        write(
            os.path.join(
                primary, t, "account", f"C{i:03d}", "events",
                "0000000000", f"1_1_TRN{i:03d}",
            ),
            "1\n",
        )
        write(
            os.path.join(
                primary, t, "account", f"D{i:03d}", "events",
                "0000000000", f"1_-1_TRN{i:03d}",
            ),
            "1\n",
        )
        write(
            os.path.join(primary, t, "transaction", f"TRN{i:03d}"),
            f"committed\nTRX{i:03d} TENANT_FLOOD C{i:03d} TENANT_FLOOD "
            f"D{i:03d} 2020-01-01T00:00:00Z 1 CZK\n",
        )
    with caplog.at_level(logging.WARNING):
        first = stream.run_available()
    assert first is not None
    assert first.extra["pending_events"] == n_orphans
    assert any("orphans" in r.message for r in caplog.records)
    # versioned layout: exactly one committed version, no flat files
    root = stream._pending_root()
    vers = stream._pending_versions()
    assert vers, "flood must be parked in a committed version"
    assert all(d.startswith("v") for d in os.listdir(root))
    # every orphan retained (read back through the store API)
    assert stream._read_pending().count() == n_orphans

    # metas land → everything drains; version superseded then pruned
    for i in range(n_trx):
        for side in ("C", "D"):
            write(
                os.path.join(
                    primary, t, "account", f"{side}{i:03d}", "snapshot", "0000000000"
                ),
                "CZK FORMAT_F\n",
            )
    second = stream.run_available()
    assert second is not None and second.extra["pending_events"] == 0
    assert stream.store.read("transfer").count() == n_trx
    # after the next read cycle only the newest (empty) version remains
    assert stream._read_pending().count() == 0
    assert len(stream._pending_versions()) == 1


def test_pending_version_unreadable_until_merge_commits(roots):
    """Crash-window regression: a batch that drains parked events writes
    its new (drained-rows-EXCLUDED) pending version BEFORE the table
    merges, but that version must not become readable until the merges
    durably complete. If it did, a crash between the write and the merge
    would lose the drained events permanently — the replay's batch_events
    doesn't contain them (they came from older files), the file index
    never redelivers, and the newest pending version omits them."""
    primary, _batch, stream = roots
    t = "t_TENANT_CRASH"
    # batch 1: events + transaction land WITHOUT the account metas → parked
    write(
        os.path.join(primary, t, "transaction", "TRN"),
        "committed\nTRX TENANT_CRASH C TENANT_CRASH D 2020-01-01T00:00:00Z 1 CZK\n",
    )
    write(os.path.join(primary, t, "account", "C", "events", "0000000000", "1_1_TRN"), "1\n")
    write(os.path.join(primary, t, "account", "D", "events", "0000000000", "1_-1_TRN"), "1\n")
    first = stream.run_available()
    assert first is not None and first.extra["pending_events"] == 2
    assert stream._read_pending().count() == 2

    # batch 2: the metas land, the parked events drain into `picked` —
    # but the merge CRASHES after the new pending version's data write.
    write(os.path.join(primary, t, "account", "C", "snapshot", "0000000000"), "CZK FORMAT_F\n")
    write(os.path.join(primary, t, "account", "D", "snapshot", "0000000000"), "CZK FORMAT_F\n")
    real_merge = stream._pipeline._expand_and_merge

    def crash(*a, **k):
        raise RuntimeError("injected crash between pending write and merge")

    stream._pipeline._expand_and_merge = crash
    with pytest.raises(Exception, match="injected crash"):
        stream.run_available()
    stream._pipeline._expand_and_merge = real_merge

    # the crashed batch's version has data (_SUCCESS) but no COMMITTED —
    # readers must fall back to the previous version, which still holds
    # the two drained events
    dirs = stream._version_dirs()
    committed = stream._pending_versions()
    assert len(dirs) > len(committed), "crashed version must stay uncommitted"
    assert stream._read_pending().count() == 2, "drained rows must survive the crash"

    # replay: checkpoint redelivers the failed batch; the fallback pending
    # version re-supplies the drained events; everything completes
    replay = stream.run_available()
    assert replay is not None and replay.transfers_discovered == 1
    assert stream.store.read("transfer").count() == 1
    assert replay.extra["pending_events"] == 0
    # exactly one committed version remains after the next read cycle
    assert stream._read_pending().count() == 0
    assert len(stream._pending_versions()) == 1
