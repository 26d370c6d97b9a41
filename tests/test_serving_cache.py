"""Serving-tier dimension snapshots: fingerprint-fresh-or-fallback, and
bit-equal output against the Spark resolver paths they shortcut.

Equivalence is asserted through the PUBLIC GraphQL surface — the same
query executed with and without the cache must produce identical JSON —
so a divergence anywhere (pagination, filters, decimal scale, zero
defaults, missing keys) fails, not just in the unit the snapshot
replaces."""

from __future__ import annotations

import pytest

import decimal
import os

from data_warehouse_spark.api.graphql_schema import execute
from data_warehouse_spark.api.serving_cache import ServingCache
from data_warehouse_spark.operators import balance_view
from data_warehouse_spark.streaming.ingest import IngestionPipeline, warehouse_store

# streaming/serving e2e tier: full-pipeline ticks / HTTP / stateful
# streams (see pytest.ini) - deselected from the per-commit unit core
pytestmark = pytest.mark.slow


def write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(content)


def _fixture(root: str) -> None:
    """Two tenants; one with a committed transfer (signed balances), one
    with a zero-activity account — the golden shapes."""
    t = "t_CACHE_TRN"
    for a in ("CREDIT", "DEBIT", "IDLE"):
        write(os.path.join(root, t, "account", a, "snapshot", "0000000000"), "CZK FORMAT_T\n")
    write(
        os.path.join(root, t, "transaction", "TRN"),
        "committed\nTRX CACHE_TRN CREDIT CACHE_TRN DEBIT 2020-01-01T00:00:00Z 1 CZK\n",
    )
    write(os.path.join(root, t, "account", "CREDIT", "events", "0000000000", "1_1_TRN"), "1\n")
    write(os.path.join(root, t, "account", "DEBIT", "events", "0000000000", "1_-1_TRN"), "1\n")
    t2 = "t_CACHE_ACC"
    write(os.path.join(root, t2, "account", "ZZ", "snapshot", "0000000000"), "EUR FORMAT_U\n")


QUERIES = [
    "query { tenants(limit: 1000, offset: 0) { name } }",
    "query { tenants(limit: 1, offset: 1) { name } }",
    'query { tenant(tenant: "CACHE_TRN") { name } }',
    'query { tenant(tenant: "NOPE") { name } }',
    'query { accounts(tenant: "CACHE_TRN", limit: 1000, offset: 0) '
    "{ name currency format balance } }",
    'query { accounts(tenant: "CACHE_TRN", limit: 2, offset: 1) { name balance } }',
    'query { accounts(tenant: "CACHE_TRN", currency: "CZK", format: "FORMAT_T") { name } }',
    'query { accounts(tenant: "CACHE_TRN", currency: "XXX") { name } }',
    'query { accounts(tenant: "CACHE_ACC") { name currency balance } }',
    'query { account(tenant: "CACHE_TRN", name: "CREDIT") { balance currency } }',
    'query { account(tenant: "CACHE_TRN", name: "MISSING") { balance } }',
    'query { transfers(tenant: "CACHE_TRN", limit: 10, offset: 0) '
    "{ transaction amount credit { name balance } debit { name balance } } }",
]


def _ticked_store(spark, tmp_path):
    root = str(tmp_path / "primary")
    _fixture(root)
    store = warehouse_store(spark, str(tmp_path / "wh"))
    IngestionPipeline(spark, root, store).run_once()
    return store


def test_cache_paths_equal_spark_paths(spark, tmp_path):
    store = _ticked_store(spark, tmp_path)
    cache = ServingCache(store)
    # precondition: every snapshot actually engages (fresh after the tick)
    assert cache.tenant_names() is not None
    assert cache.accounts() is not None
    assert cache.balances() is not None
    for q in QUERIES:
        with_cache = execute(store, q, cache=cache)
        without = execute(store, q)
        assert with_cache.errors is None and without.errors is None, q
        assert with_cache.data == without.data, q


def test_cache_refuses_stale_and_reloads(spark, tmp_path):
    """A merge the cache has not seen flips the fingerprint: balances
    refuse (never stale-and-served); after the next maintenance the
    reloaded snapshot serves the NEW value."""
    import datetime

    from data_warehouse_spark.streaming.ingest import (
        ABC_PRIMARY_KEYS,
        ingest_abc_schema,
    )

    store = _ticked_store(spark, tmp_path)
    cache = ServingCache(store)
    before = cache.balances()
    assert before[("CACHE_TRN", "CREDIT")] == decimal.Decimal("1.00")
    batch = spark.createDataFrame(
        [("CACHE_TRN", "CREDIT", datetime.datetime(2020, 1, 2),
          decimal.Decimal("2"), "CACHE_TRN", "TRN9", "t1", "c")],
        ingest_abc_schema(),
    )
    store.merge_insert_missing(balance_view.ABC_TABLE, batch, ABC_PRIMARY_KEYS)
    assert cache.balances() is None  # stale → refused
    balance_view.maintain(store)
    assert cache.balances()[("CACHE_TRN", "CREDIT")] == decimal.Decimal("3.00")
    # account dimension snapshot is independent and still fresh
    assert cache.accounts() is not None


def test_cache_over_max_rows_falls_back(spark, tmp_path):
    """Above the memory bound the loader refuses and the GraphQL output
    is served by the Spark path — identical either way."""
    store = _ticked_store(spark, tmp_path)
    cache = ServingCache(store, max_rows=1)
    assert cache.accounts() is None
    assert cache.balances() is None
    q = 'query { accounts(tenant: "CACHE_TRN") { name balance } }'
    assert execute(store, q, cache=cache).data == execute(store, q).data


def test_transfer_page_cache_hits_and_invalidates(spark, tmp_path):
    """Repeat transfer-page requests serve from the fingerprint-pinned
    page cache (counter-visible), a table change drops every page, and
    the cached response is byte-identical to the uncached one."""
    store = _ticked_store(spark, tmp_path)
    cache = ServingCache(store)
    q = (
        'query { transfers(tenant: "CACHE_TRN", limit: 10, offset: 0) '
        "{ transaction amount credit { name balance } debit { name balance } } }"
    )
    first = execute(store, q, cache=cache)
    assert cache.counters["transfer_page_load"] == 1
    second = execute(store, q, cache=cache)
    assert cache.counters["transfer_page_hit"] == 1
    assert first.data == second.data == execute(store, q).data
    # a different arg shape is a different entry (no false sharing)
    q2 = q.replace("limit: 10", "limit: 1")
    execute(store, q2, cache=cache)
    assert cache.counters["transfer_page_load"] == 2

    # table change → every page invalidated, reload serves the new state
    root2 = str(tmp_path / "primary")
    write(
        os.path.join(root2, "t_CACHE_TRN", "transaction", "TRN2"),
        "committed\nTRX2 CACHE_TRN CREDIT CACHE_TRN DEBIT 2020-02-01T00:00:00Z 5 CZK\n",
    )
    write(os.path.join(root2, "t_CACHE_TRN", "account", "CREDIT", "events",
                       "0000000000", "1_1_TRN2"), "2\n")
    write(os.path.join(root2, "t_CACHE_TRN", "account", "DEBIT", "events",
                       "0000000000", "1_-1_TRN2"), "2\n")
    IngestionPipeline(spark, root2, store).run_once()
    after = execute(store, q, cache=cache)
    assert after.data == execute(store, q).data
    assert len(after.data["transfers"]) == 2  # the new transfer is visible


def test_transfer_page_cache_respects_row_bound(spark, tmp_path):
    """Pages above max_page_rows are served but never cached (driver
    memory bound)."""
    store = _ticked_store(spark, tmp_path)
    cache = ServingCache(store, max_page_rows=0)
    q = 'query { transfers(tenant: "CACHE_TRN", limit: 10) { transaction } }'
    execute(store, q, cache=cache)
    execute(store, q, cache=cache)
    assert cache.counters["transfer_page_load"] == 2
    assert cache.counters["transfer_page_hit"] == 0


def test_fake_store_without_versions_is_harmless(spark):
    """build_app-style unit fakes (no version plumbing) must degrade to
    the Spark path, not crash the cache."""

    class Fake:
        pass

    cache = ServingCache(Fake())
    assert cache.tenant_names() is None
    assert cache.accounts() is None
    assert cache.balances() is None


def test_torn_pin_served_from_window_history(spark, tmp_path):
    """r11: a request whose pinned window token was outrun by a mid-request
    adopt is served its exact PINNED state from the window-token history
    (snapshot isolation — the Postgres-MVCC read the reference gets),
    instead of falling back to the Spark path.  The pinned values must
    equal the pre-adopt state, EXCLUDING the later merge's rows."""
    import datetime

    from data_warehouse_spark.streaming.ingest import (
        ABC_PRIMARY_KEYS,
        ingest_abc_schema,
    )

    def _abc(spark, trn, amount):
        return spark.createDataFrame(
            [("CACHE_TRN", "CREDIT", datetime.datetime(2020, 1, 2),
              decimal.Decimal(amount), "CACHE_TRN", trn, "t1", "c")],
            ingest_abc_schema(),
        )

    store = _ticked_store(spark, tmp_path)
    balance_view.maintain(store)
    base = balance_view.freshness_token(store)
    assert base is not None

    # open a deferral window, capture its token as a request pin
    store.merge_insert_missing(balance_view.ABC_TABLE, _abc(spark, "W1", "2"), ABC_PRIMARY_KEYS)
    assert balance_view.maintain(store, defer_under_files=64) == "deferred"
    pin = balance_view.serving_token(store)
    assert pin is not None and pin.startswith("window:")

    # the tick lands mid-request: another adopt moves the live token
    store.merge_insert_missing(balance_view.ABC_TABLE, _abc(spark, "W2", "8"), ABC_PRIMARY_KEYS)
    assert balance_view.serving_token(store) != pin

    cache = ServingCache(store)
    keys = [("CACHE_TRN", "CREDIT")]
    served = cache.kv_balances(keys, pinned=pin)
    assert served is not None, "torn pin must serve from history, not None"
    # pinned state = initial 1.00 + W1's 2, WITHOUT W2's 8
    assert served[("CACHE_TRN", "CREDIT")] == decimal.Decimal("3.00")
    assert cache.counters["kv_balance_window_pinned"] == 1

    # unpinned: the LIVE window includes W2
    live = cache.kv_balances(keys)
    assert live[("CACHE_TRN", "CREDIT")] == decimal.Decimal("11.00")

    # after the rollup CONVERGES past the pin, the history must refuse
    # (kv index rebuild hazard) and the request takes the Spark path
    assert balance_view.maintain(store) == "delta"
    assert cache.kv_balances(keys, pinned=pin) is None


def test_transfer_page_follower_served_stale_during_reload(spark, tmp_path):
    """r11: while a page's post-invalidation reload flight is running,
    CONCURRENT requests for the same key are served the previous
    committed generation instead of blocking on the leader's Spark job
    (bounded one-generation staleness, MVCC semantics).  The leader
    itself still returns the FRESH rows — first-reader freshness holds."""
    import threading

    store = _ticked_store(spark, tmp_path)
    cache = ServingCache(store)
    key = ("CACHE_TRN", None, None, 10, 0)
    old_rows = [{"transaction": "OLD"}]
    new_rows = [{"transaction": "NEW"}]
    assert cache.transfers_page(key, lambda: old_rows) == old_rows

    # invalidate: any content-changing op moves the transfer fingerprint
    import datetime

    from data_warehouse_spark.streaming.ingest import ingest_abc_schema

    batch = spark.createDataFrame(
        [("CACHE_TRN", "CREDIT", datetime.datetime(2020, 1, 3),
          decimal.Decimal("1"), "CACHE_TRN", "TRNZ", "t1", "c")],
        ingest_abc_schema(),
    )
    store.merge_insert_missing(
        "transfer",
        store.read("transfer").limit(0),  # no-op rows, still bumps state
        ["tenant", "transaction", "transfer"],
    )
    del batch
    # force a REAL fingerprint move via a direct write to the table dir
    store.overwrite("transfer", store.read("transfer"))

    release = threading.Event()
    entered = threading.Event()

    def slow_loader():
        entered.set()
        release.wait(timeout=60)
        return new_rows

    got = {}

    def leader():
        got["leader"] = cache.transfers_page(key, slow_loader)

    t = threading.Thread(target=leader)
    t.start()
    assert entered.wait(timeout=60)
    # follower while the flight is running: previous generation, instantly
    assert cache.transfers_page(key, lambda: new_rows) == old_rows
    assert cache.counters["transfer_page_stale_served"] == 1
    release.set()
    t.join(timeout=60)
    assert got["leader"] == new_rows  # leader saw fresh
    # after the flight: the fresh page is cached and served
    assert cache.transfers_page(key, lambda: ["never"]) == new_rows
