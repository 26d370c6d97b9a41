"""Serving-path load bench: concurrent GraphQL requests against the sf1
warehouse WITH the ingestion loop ticking — the e2e shape the reference's
bbtest suite exercises (bbtest/steps/http_steps.py polls with a 20 s
deadline; graphql_api.feature's three golden query shapes).

What runs:
  * the four warehouse tables derived from ``--sf`` (default scale_data/sf1,
    ~6 M transfers / ~3.7 M balance rows) loaded into a real TableStore
    (tenant-partitioned parquet — the serving layout);
  * a Service ingestion loop ticking every 2 s against a generated primary
    tree (``--accounts`` fresh accounts land mid-run), submitting its Spark
    jobs in the "ingest" FAIR pool;
  * the Flask app served threaded; every request thread tags the "serving"
    pool (api/http.py) — this bench is also the measurement of that
    isolation;
  * ``--clients`` threads (default 32, the reference's HTTP pool size —
    application.conf:15-17) each replaying ``--requests-per-client``
    requests cycling the three golden shapes over random sf1 tenants.

Output: ONE JSON line (also written to SERVING_BENCH.json) with per-shape
p50/p95/p99/max latency, the 20 s reference deadline verdict, and the
ingestion tick stats observed during the run.

Usage: python serving_bench.py [--sf scale_data/sf1] [--clients 32]
                               [--requests-per-client 6] [--port 18080]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import statistics
import sys
import tempfile
import threading
import time
import urllib.request

SHAPES = {
    # graphql_api.feature:1-30 — tenants page
    "tenants_page": lambda tenant: (
        "query { tenants(limit: 1000, offset: 0) { name } }"
    ),
    # feature:32-67 — accounts page with currency + balance (the batched
    # nested-resolution path: one semi-join + one grouped agg per request)
    "accounts_balances": lambda tenant: (
        f'query {{ accounts(tenant: "{tenant}", limit: 1000, offset: 0) '
        "{ name currency balance } }"
    ),
    # feature:69-142 — transfers page with both nested entities + balances
    "transfers_nested": lambda tenant: (
        f'query {{ transfers(tenant: "{tenant}", limit: 1000, offset: 0) '
        "{ transaction transfer amount currency status "
        "  credit { name balance } debit { name balance } } }"
    ),
}


def _load_warehouse(spark, store, sf_dir: str) -> dict[str, int]:
    """Derive the four warehouse tables from the TPC-H-ish fixture and load
    them into the TableStore with the ingest schemas (the bench serves from
    REAL stored tables, not views over the fixture)."""
    from pyspark.sql import functions as F

    from data_warehouse_spark.catalog import warehouse_views

    views = warehouse_views(spark, sf_dir)
    rows: dict[str, int] = {}
    tenant = views["tenant"]
    store.overwrite("tenant", tenant)
    account = views["account"].select(
        "tenant", "name", "currency", "format",
        F.lit(0).cast("int").alias("last_syn_snapshot"),
        F.lit(0).cast("int").alias("last_syn_event"),
    )
    store.overwrite("account", account)
    tr = views["transfer"]
    amount_t = {
        f.name: f.dataType for f in store.schemas["transfer"].fields
    }["amount"]
    store.overwrite("transfer", tr.withColumn("amount", F.col("amount").cast(amount_t)))
    abc_t = {f.name: f.dataType for f in store.schemas["account_balance_change"].fields}
    committed = tr.filter(F.col("status") == 1)
    sides = []
    for side, ten, nam, sign in (
        ("c", "credit_tenant", "credit_name", 1),
        ("d", "debit_tenant", "debit_name", -1),
    ):
        sides.append(
            committed.select(
                F.col(ten).alias("tenant"),
                F.col(nam).alias("name"),
                F.col("value_date"),
                (F.col("amount") * sign).cast(abc_t["amount"]).alias("amount"),
                F.col("tenant").alias("src_tenant"),
                "transaction",
                "transfer",
                F.lit(side).alias("side"),
            )
        )
    store.overwrite("account_balance_change", sides[0].unionByName(sides[1]))
    for name in ("tenant", "account", "transfer", "account_balance_change"):
        rows[name] = store.read(name).count()
    return rows


def _write_primary_tree(root: str, n_accounts: int, tenant: str = "LOADGEN") -> None:
    """A primary-storage tree the ingestion loop discovers DURING the bench
    (fresh tenants/accounts/transfers — every tick does real merge work)."""
    t = f"t_{tenant}"
    for i in range(n_accounts):
        a = f"LOAD{i:05d}"
        d = os.path.join(root, t, "account", a)
        os.makedirs(os.path.join(d, "snapshot"), exist_ok=True)
        with open(os.path.join(d, "snapshot", "0000000000"), "w") as fh:
            fh.write("CZK FORMAT_L\n")
    # one committed transaction between each consecutive account pair
    os.makedirs(os.path.join(root, t, "transaction"), exist_ok=True)
    for i in range(0, n_accounts - 1, 2):
        trn = f"TLOAD{i:05d}"
        with open(os.path.join(root, t, "transaction", trn), "w") as fh:
            fh.write(
                f"committed\nTX{i} {tenant} LOAD{i:05d} {tenant} "
                f"LOAD{i + 1:05d} 2020-01-01T00:00:00Z 1 CZK\n"
            )
        for a, v in ((f"LOAD{i:05d}", "1_1_"), (f"LOAD{i + 1:05d}", "1_-1_")):
            d = os.path.join(root, t, "account", a, "events", "0000000000")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{v}{trn}"), "w") as fh:
                fh.write("1\n")


def _post(port: int, query: str, timeout: float = 120.0) -> tuple[int, float]:
    body = json.dumps({"query": query}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/graphql",
        data=body,
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as rv:
            rv.read()
            return rv.status, time.perf_counter() - t0
    except urllib.error.HTTPError as e:
        e.read()
        return e.code, time.perf_counter() - t0


def _pct(xs: list[float], q: float) -> float:
    return round(
        statistics.quantiles(xs, n=100, method="inclusive")[int(q) - 1], 3
    ) if len(xs) > 1 else round(xs[0], 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="scale_data/sf1")
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests-per-client", type=int, default=6)
    ap.add_argument("--accounts", type=int, default=2000,
                    help="fresh primary-storage accounts ingested mid-run")
    ap.add_argument("--port", type=int, default=18080)
    ap.add_argument("--out", default="SERVING_BENCH.json")
    ap.add_argument(
        "--kv-only",
        action="store_true",
        help="disable the account/balance in-memory snapshots so the KV "
        "tier (api/kv_tier.py row-group-pruned point reads) carries the "
        "dimension serving — the measured answer for tables past the "
        "snapshot's ~2M-row memory bound",
    )
    ap.add_argument(
        "--stacks",
        action="store_true",
        help="sample every thread's Python stack at 4 Hz during the client "
        "window and print the hottest frames to stderr — the attribution "
        "tool for request latency under the merge tick",
    )
    ap.add_argument(
        "--no-response-cache",
        action="store_true",
        help="disable the HTTP-layer LRU response cache (api/http.py layer "
        "0) so every request pays full GraphQL execution — the cold arm "
        "proving the 20 s deadline holds against the engine, not the cache",
    )
    args = ap.parse_args()
    if args.no_response_cache:
        os.environ["SPARK_GRAFT_RESPONSE_CACHE"] = "0"

    from werkzeug.serving import make_server

    from data_warehouse_spark.service import Service
    from data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="dwh-serving-bench")
    tmp = tempfile.mkdtemp(prefix="dwh-serving-")
    # scratch is GBs per run — reclaim on exit (a crashed run leaves
    # the dir; 35 leftovers once held 24 GB hostage on this box)
    import atexit as _atexit
    import shutil as _shutil
    _atexit.register(_shutil.rmtree, tmp, True)
    primary = os.path.join(tmp, "primary")
    os.makedirs(primary)
    svc = Service(
        spark=spark,
        primary_root=primary,
        warehouse_root=os.path.join(tmp, "warehouse"),
        http_port=args.port,
        tick_seconds=2.0,
    )
    t0 = time.time()
    rows = _load_warehouse(spark, svc.store, args.sf)
    load_sec = round(time.time() - t0, 1)

    # deployment step, not a request cost: build the maintained balance
    # rollup BEFORE going live (the ingestion ticks keep it current with
    # exact deltas afterwards).  Without this the first tick pays the
    # full-corpus recompute while 32 clients hammer the slow path —
    # measured p95 80 s; with it the serving path reads O(accounts) rows.
    from data_warehouse_spark.operators import balance_view

    t0 = time.time()
    bootstrap_action = balance_view.maintain(svc.store)
    rollup_bootstrap_sec = round(time.time() - t0, 1)

    tenants = [r["name"] for r in svc.store.read("tenant").collect()]
    app = svc.build_app()
    if args.kv_only:
        # model "account/rollup outgrew the snapshot bound": the two
        # O(rows) snapshots refuse, exactly as _bounded_files would past
        # max_rows; the tenant snapshot (O(25) always) stays — what a real
        # oversized deployment looks like. Dimension lookups must then be
        # carried by the KV tier, and the kv_* counters in the report
        # prove which path served.
        cache = app.serving_cache
        cache.accounts = lambda: None  # type: ignore[method-assign]
        cache.balances = lambda: None  # type: ignore[method-assign]
    server = make_server("127.0.0.1", args.port, app, threaded=True)
    http_thread = threading.Thread(target=server.serve_forever, daemon=True)
    http_thread.start()

    # warm each shape once (codegen + parquet footers — the steady-state
    # server shape; cold-start belongs to a deploy, not a request)
    for shape in SHAPES.values():
        _post(args.port, shape(tenants[0]))

    ticks: list[float] = []
    tick_stages: list[dict] = []
    discovered = {"transfers": 0}
    orig_run_once = svc.pipeline.run_once

    def timed_run_once():
        s = time.perf_counter()
        m = None
        try:
            m = orig_run_once()
            return m
        finally:
            ticks.append(time.perf_counter() - s)
            if m is not None:
                discovered["transfers"] += m.transfers_discovered
                tick_stages.append(
                    {
                        "sec": round(time.perf_counter() - s, 2),
                        "stage_sec": m.extra.get("stage_sec", {}),
                        "files_read": m.extra.get("files_read", {}),
                    }
                )

    svc.pipeline.run_once = timed_run_once
    # the ingestion loop runs from service start (the reference's
    # PrimaryDataExplorerActor ticks from boot, long before bbtest lands
    # fixtures), so start it BEFORE the client window: the first-ever
    # tick pays a one-time post-load JVM/codegen warm-up (measured 45.9 s
    # at sf10 — TICK_ATTRIBUTION_SF10, stage-attributed as warm-up, not
    # per-tick work) that belongs to deployment, not to request latency.
    # Two idle ticks absorb it; the MERGE tick that lands mid-run below
    # still does the full 1000-transfer discovery at steady state.
    svc.start_ingestion()
    # explicit warm-up canary: a 2-account/1-transfer fixture consumed by a
    # real merge tick BEFORE the client window. r8's bench absorbed the
    # one-time JVM/codegen warm-up of the merge path in its idle ticks
    # (each re-ran the full listing plans); the ListingCache's idle fast
    # path runs zero Spark jobs, so without a canary the first merge tick
    # would pay ~all codegen compile inside the client window — deployment
    # cost billed to requests. The canary is the deployment step made
    # explicit (same category as the rollup bootstrap above).
    _write_primary_tree(primary, 2, tenant="WARMUP")
    # wait on the pipeline's OWN discovery counter — a poll that reads the
    # store would itself be a Spark job every 500 ms (file-listing the
    # month-partitioned fact ~2100 dirs each time), contending with the
    # very tick it waits for
    warm_deadline = time.time() + 300
    while discovered["transfers"] < 1 and time.time() < warm_deadline:
        time.sleep(0.5)
    # re-snapshot the baseline AFTER the canary so ingested-counts below
    # measure only the client-window wave
    rows = {
        name: svc.store.read(name).count()
        for name in rows
    }
    warm_ticks = list(ticks)

    # primary tree lands NOW: ingestion discovers it while clients run.
    # The discovery baseline MUST be snapshotted before the landing — the
    # merge tick can complete during the client window, and a baseline
    # taken after it would already include the wave (the poll below then
    # never fires — a measured 600 s timeout)
    base_discovered = discovered["transfers"]
    _write_primary_tree(primary, args.accounts)
    tree_landed = time.perf_counter()

    # fixture→queryable poller, started IMMEDIATELY after the fixture
    # write and CONCURRENT with the client window (r10 verdict item 1:
    # pre-r11 the poll only started after every client joined, so the
    # measured fixture→queryable was floored by the whole client window's
    # wall — a 40 s storm forced ftq ≥ 40 s even when the data was
    # queryable at 12 s.  bbtest's own shape is land-then-poll-right-away
    # with a 20 s budget, http_steps.py:57; the confirming GraphQL query
    # below rides the loaded server, so the number stays honest e2e).
    expected = args.accounts // 2
    ftq_result: dict = {"sec": None}

    def _ftq_poller() -> None:
        poll_deadline = time.time() + 600
        while time.time() < poll_deadline:
            if discovered["transfers"] - base_discovered >= expected:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{args.port}/graphql",
                    data=json.dumps(
                        {
                            "query": 'query { transfers(tenant: "LOADGEN", '
                            "limit: 1, offset: 0) { transaction } }"
                        }
                    ).encode(),
                    headers={"Content-Type": "application/json"},
                )
                try:
                    with urllib.request.urlopen(req, timeout=60) as rv:
                        body = json.loads(rv.read())
                except Exception:  # noqa: BLE001 — poll: retry next round
                    body = {}
                if (body.get("data") or {}).get("transfers"):
                    ftq_result["sec"] = round(
                        time.perf_counter() - tree_landed, 2
                    )
                    return
            time.sleep(0.5)

    ftq_thread = threading.Thread(target=_ftq_poller, daemon=True)
    ftq_thread.start()

    # --stacks: sample every thread's Python stack during the client
    # window (sys._current_frames, 4 Hz) and report the hottest frames —
    # the attribution tool for "requests are slow under the merge tick"
    stack_counts: dict = {}
    stop_sampling = threading.Event()
    if args.stacks:
        import collections as _c
        import sys as _sys

        stack_counts = _c.Counter()

        def _sampler():
            while not stop_sampling.is_set():
                for tid, frame in _sys._current_frames().items():
                    parts = []
                    f = frame
                    while f is not None and len(parts) < 3:
                        parts.append(
                            f"{f.f_code.co_filename.rsplit('/', 1)[-1]}:"
                            f"{f.f_code.co_name}"
                        )
                        f = f.f_back
                    stack_counts[" < ".join(parts)] += 1
                time.sleep(0.25)

        threading.Thread(target=_sampler, daemon=True).start()

    lat: dict[str, list[float]] = {k: [] for k in SHAPES}
    failures: list[tuple[str, int]] = []
    rng = random.Random(7)

    def client(cid: int) -> None:
        order = list(SHAPES.items())
        for i in range(args.requests_per_client):
            name, shape = order[(cid + i) % len(order)]
            q = shape(rng.choice(tenants))
            status, sec = _post(args.port, q)
            lat[name].append(sec)
            if status != 200:
                failures.append((name, status))

    threads = [
        threading.Thread(target=client, args=(c,)) for c in range(args.clients)
    ]
    run_t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    run_wall = round(time.perf_counter() - run_t0, 2)

    # health must still answer under/after load (reference polls /health)
    with urllib.request.urlopen(
        f"http://127.0.0.1:{args.port}/health", timeout=60
    ) as rv:
        health = json.loads(rv.read())

    # the landed fixtures must become QUERYABLE (the reference's bbtest
    # contract) — join the concurrent poller started at fixture-write
    # time; it confirms end-to-end via /graphql (http_steps.py polls the
    # API, not the storage layer), inside the clock, while the client
    # storm runs
    ftq_thread.join(timeout=620)
    fixture_to_queryable = ftq_result["sec"]

    stop_sampling.set()
    if stack_counts:
        import sys as _sys

        print("== hottest sampled frames ==", file=_sys.stderr)
        for frame, n in sorted(
            stack_counts.items(), key=lambda kv: -kv[1]
        )[:25]:
            print(f"{n:6d}  {frame}", file=_sys.stderr)

    svc.stop()
    server.shutdown()
    ingested = svc.store.read("transfer").count() - rows["transfer"]

    all_lat = [s for xs in lat.values() for s in xs]
    report = {
        "metric": "graphql_serving_p95",
        "mode": "kv_only" if args.kv_only else "snapshots",
        "response_cache": "off" if args.no_response_cache else "on",
        "value": _pct(all_lat, 95),
        "unit": "sec",
        "deadline_sec": 20.0,
        "deadline": "reference bbtest e2e poll deadline (http_steps.py:57)",
        "pass": max(all_lat) < 20.0 and not failures,
        "sf_dir": args.sf,
        "warehouse_rows": rows,
        "warehouse_load_sec": load_sec,
        "rollup_bootstrap": {"action": bootstrap_action, "sec": rollup_bootstrap_sec},
        "clients": args.clients,
        "requests": len(all_lat),
        "failures": failures,
        "run_wall_sec": run_wall,
        "throughput_rps": round(len(all_lat) / run_wall, 2),
        "shapes": {
            name: {
                "n": len(xs),
                "p50": _pct(xs, 50),
                "p95": _pct(xs, 95),
                "p99": _pct(xs, 99),
                "max": round(max(xs), 3),
            }
            for name, xs in lat.items()
        },
        "ingest_during_run": {
            "warmup_idle_ticks": [round(t, 3) for t in warm_ticks],
            "ticks": len(ticks) - len(warm_ticks),
            "tick_p50": _pct(ticks[len(warm_ticks):], 50)
            if len(ticks) > len(warm_ticks) else None,
            "tick_max": round(max(ticks[len(warm_ticks):]), 3)
            if len(ticks) > len(warm_ticks) else None,
            "transfers_ingested": ingested,
            "fixture_to_queryable_sec": fixture_to_queryable,
            "tick_stages": [
                t for t in tick_stages if any(t["files_read"].values())
            ][:6],
            "pools": "FAIR scheduler; serving vs ingest pools (session.py)",
            "lifecycle": "loop started at service boot (reference cadence); "
            "an explicit WARMUP canary fixture pays the one-time merge-path "
            "codegen before the client window (deployment step, like the "
            "rollup bootstrap); the merge tick that lands mid-run is "
            "steady-state",
        },
        # which path served: per-kind snapshot hit/reload/fallback counts +
        # transfer page-cache hits (api/serving_cache.py counters)
        "cache_counters": dict(getattr(app, "serving_cache").counters)
        if hasattr(app, "serving_cache") else {},
        "health_after_load": health,
    }
    line = json.dumps(report)
    print(line)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    spark.stop()
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
