"""Wide-tree ingestion bench: tick latency of the two discovery arms at
≥50 k accounts (VERDICT r5 item 5).

The reference re-crawls the whole primary tree every 2 s
(PrimaryDataExplorationService.scala:25-36). Our batch arm
(IngestionPipeline) mirrors that with a driver-side ``os.scandir`` walk —
O(tree) listing per tick regardless of what changed; the Structured-
Streaming arm (FileStreamIngestion) discovers through Spark's checkpointed
file index — each tick lists the trees but parses only NEW files, and
``maxFilesPerTrigger`` bounds any single micro-batch.

Three phases per arm, identical fixture:
  cold     — first tick over the full tree (everything is new);
  incr     — one tick after +delta fresh accounts land (the steady-state
             shape: small change, wide tree);
  idle     — one tick with nothing new (pure discovery overhead — THE
             number that bounds the 2 s cadence at scale).

Both stores must finish bit-identical (asserted) — this is a latency
bench, not a correctness relaxation.

Output: ONE JSON line, also written to INGEST_BENCH.json.

Usage: python ingest_bench.py [--accounts 50000] [--delta 500]
                              [--transactions-per-1000 50]
                              [--max-files-per-trigger 65536]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time


def _w(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(content)


def build_tree(root: str, n_accounts: int, trx_per_1000: int, start: int = 0,
               tenants: int = 8) -> int:
    """``n_accounts`` accounts spread over ``tenants`` tenants, snapshot-0
    meta each; ``trx_per_1000`` committed transactions per 1000 accounts
    (pairing consecutive accounts). Returns files written."""
    files = 0
    for i in range(start, start + n_accounts):
        t = f"t_T{i % tenants:02d}"
        a = f"A{i:07d}"
        _w(os.path.join(root, t, "account", a, "snapshot", "0000000000"),
           "CZK FORMAT_B\n")
        files += 1
    # pair account i with i+tenants — same tenant tree by construction
    step = max(1, 1000 // max(1, trx_per_1000))
    for i in range(start, start + max(0, n_accounts - tenants), step):
        tn = f"T{i % tenants:02d}"
        t = f"t_{tn}"
        a, b = f"A{i:07d}", f"A{i + tenants:07d}"
        trn = f"TRN{i:07d}"
        _w(os.path.join(root, t, "transaction", trn),
           f"committed\nTX{i} {tn} {a} {tn} {b} "
           f"2020-01-01T00:00:00Z 1 CZK\n")
        _w(os.path.join(root, t, "account", a, "events", "0000000000",
                        f"1_1_{trn}"), "1\n")
        _w(os.path.join(root, t, "account", b, "events", "0000000000",
                        f"1_-1_{trn}"), "1\n")
        files += 3
    return files


def _rows(store, name):
    return sorted(tuple(r) for r in store.read(name).collect())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--accounts", type=int, default=50_000)
    ap.add_argument("--delta", type=int, default=500)
    ap.add_argument("--transactions-per-1000", type=int, default=50)
    ap.add_argument("--max-files-per-trigger", type=int, default=65_536)
    ap.add_argument("--out", default="INGEST_BENCH.json")
    args = ap.parse_args()

    from data_warehouse_spark.session import get_spark
    from data_warehouse_spark.streaming.file_ingest import FileStreamIngestion
    from data_warehouse_spark.streaming.ingest import (
        IngestionPipeline,
        warehouse_store,
    )

    spark = get_spark(app_name="dwh-ingest-bench")
    tmp = tempfile.mkdtemp(prefix="dwh-ingest-bench-")
    # scratch is GBs per run — reclaim on exit (a crashed run leaves
    # the dir; 35 leftovers once held 24 GB hostage on this box)
    import atexit as _atexit
    import shutil as _shutil
    _atexit.register(_shutil.rmtree, tmp, True)
    primary = os.path.join(tmp, "primary")
    t0 = time.time()
    n_files = build_tree(primary, args.accounts, args.transactions_per_1000)
    gen_sec = round(time.time() - t0, 1)

    batch = IngestionPipeline(
        spark, primary, warehouse_store(spark, os.path.join(tmp, "wh_batch"))
    )
    stream = FileStreamIngestion(
        spark,
        primary,
        warehouse_store(spark, os.path.join(tmp, "wh_stream")),
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        max_files_per_trigger=args.max_files_per_trigger,
    )

    def tick(fn) -> float:
        s = time.perf_counter()
        fn()
        return round(time.perf_counter() - s, 2)

    res: dict[str, dict[str, float]] = {"scandir": {}, "file_source": {}}
    # cold: full tree is new
    res["scandir"]["cold"] = tick(batch.run_once)
    res["file_source"]["cold"] = tick(stream.run_available)
    # incr: +delta accounts land
    build_tree(primary, args.delta, args.transactions_per_1000,
               start=args.accounts)
    res["scandir"]["incr"] = tick(batch.run_once)
    res["file_source"]["incr"] = tick(stream.run_available)
    # idle: nothing new — pure discovery overhead
    res["scandir"]["idle"] = tick(batch.run_once)
    res["file_source"]["idle"] = tick(stream.run_available)

    identical = all(
        _rows(batch.store, n) == _rows(stream.store, n)
        for n in ("tenant", "account", "transfer", "account_balance_change")
    )
    counts = {
        n: batch.store.read(n).count()
        for n in ("tenant", "account", "transfer")
    }

    report = {
        # headline = the DEFAULT arm (scandir): the number a driver reading
        # only "value" should see. The file-source arm — which arm_policy
        # itself rejects for wide trees — lives under arms["file_source"].
        "metric": "ingest_idle_tick_sec",
        "value": res["scandir"]["idle"],
        "headline_arm": "scandir (the default; see arm_policy)",
        "unit": "sec",
        "accounts": args.accounts + args.delta,
        "files": n_files,
        "fixture_gen_sec": gen_sec,
        "max_files_per_trigger": args.max_files_per_trigger,
        "arms": res,
        "tables": counts,
        "arms_identical": identical,
        "cadence_note": (
            "the reference ticks every 2 s; an arm whose IDLE tick exceeds "
            "that budget cannot hold the cadence at this tree width"
        ),
        "arm_policy": (
            "scandir is the wide-tree default (holds cadence; O(new) "
            "content reads via watermarks); the file-source arm is scoped "
            "to bursty-append / narrow trees - its per-trigger "
            "FileStreamSource listing is O(total files) by architecture "
            "(maxFilesPerTrigger bounds batch size, not listing), and the "
            "platform fix is a file-notification source, the swap point "
            "this interface leaves open (file_ingest.py docstring, README)"
        ),
    }
    print(json.dumps(report))
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    return 0 if identical else 1


if __name__ == "__main__":
    raise SystemExit(main())
