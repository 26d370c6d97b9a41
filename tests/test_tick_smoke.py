"""Per-commit tick-path smoke (NOT in the slow tier, deliberately).

The ``-m "not slow"`` per-commit gate deselects the full-pipeline e2e
suites — precisely the coverage over the tick's riskiest machinery
(concurrent transfer+abc MERGEs, the fused account MERGE with
insert-only discovery rows, deferred rollup maintenance, balance
serving through the stale window). This ONE fast scenario keeps a
thread of that coverage in the per-commit core so a tick-path
regression surfaces at commit time, not at the round-closing full run.

It is a smoke, not the suite: the golden bbtest ports in
``test_ingest.py`` / ``test_graphql_api.py`` (slow tier) remain the
authoritative checks.
"""

from __future__ import annotations

import decimal
import os

from data_warehouse_spark.operators import balance_view
from data_warehouse_spark.operators import queries as wh
from data_warehouse_spark.streaming.ingest import IngestionPipeline, warehouse_store


def _write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def test_single_tick_ingest_then_balance_serve(spark, tmp_path):
    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    store = warehouse_store(spark, str(tmp_path / "warehouse"))
    pipe = IngestionPipeline(spark, root, store)

    t = "t_SMOKE"
    _write(os.path.join(root, t, "account", "CREDIT", "snapshot", "0000000000"),
           "CZK FORMAT_F\n")
    _write(os.path.join(root, t, "account", "DEBIT", "snapshot", "0000000000"),
           "CZK FORMAT_F\n")
    _write(
        os.path.join(root, t, "transaction", "TRN"),
        "committed\nTRX SMOKE CREDIT SMOKE DEBIT 2020-01-01T00:00:00Z 1 CZK\n",
    )
    _write(os.path.join(root, t, "account", "CREDIT", "events", "0000000000", "1_1_TRN"), "1\n")
    _write(os.path.join(root, t, "account", "DEBIT", "events", "0000000000", "1_-1_TRN"), "1\n")

    # tick 1: discovery + expansion ride the fused account MERGE
    m = pipe.run_once()
    assert m.accounts_discovered == 2
    assert m.transfers_discovered == 1

    abc = store.read("account_balance_change")
    credit = wh.account_balance(abc, "SMOKE", "CREDIT").collect()[0]["balance"]
    debit = wh.account_balance(abc, "SMOKE", "DEBIT").collect()[0]["balance"]
    assert credit == decimal.Decimal("1")
    assert debit == decimal.Decimal("-1")

    # markers advanced (not rewound to the discovery (0,0) sentinel)
    acc = {
        (r["tenant"], r["name"]): (r["last_syn_snapshot"], r["last_syn_event"])
        for r in store.read("account").collect()
    }
    assert acc[("SMOKE", "CREDIT")] == (0, 1)
    assert acc[("SMOKE", "DEBIT")] == (0, 1)

    # idle tick: no re-processing, nothing rediscovered
    m2 = pipe.run_once()
    assert m2.accounts_discovered == 0
    assert m2.transfers_discovered == 0

    # serving path: rollup converges and matches the direct SUM
    balance_view.maintain(store)
    rollup = balance_view.read_if_fresh(store)
    assert rollup is not None
    served = {(r["tenant"], r["name"]): r["sum_amount"] for r in rollup.collect()}
    assert served[("SMOKE", "CREDIT")] == decimal.Decimal("1")
    assert served[("SMOKE", "DEBIT")] == decimal.Decimal("-1")
