"""Benchmark runner (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is executed to completion: ``collect()`` for the small
aggregate/page outputs, and — at scale-study SFs (sf >= 1) — the ``noop``
sink for entries whose output is O(input rows) (``WIDE_OUTPUT``), so the
timing measures the operator's distributed execution, never the driver's
py4j socket. A warm-up action runs first so JVM/codegen startup isn't
attributed to the first query.

Regression gate: when ``BENCH_REFERENCE.json`` (committed per-round
timings) matches the bench SF, any query measuring >1.3× its reference is
RE-TIMED with extra runs (best-of — damps local GC/scheduling noise, which
historically ran ±2× on sub-second queries) and, if still over, reported
under ``"regressions"`` in the JSON line — minus queries listed in the
reference's ``"explained"`` map (a deliberate catalog change, with the
reason recorded there). The JSON line always prints and the exit code
stays 0 for the driver; ``--check`` (or SPARK_GRAFT_BENCH_STRICT=1) makes
unexplained regressions exit 1 — the CI mode. The per-round ritual:
explain or recover every flagged query, then refresh the reference to the
new measured timings.

``--isolate``: one FRESH JVM per query (a child process running this same
script with ``SPARK_GRAFT_BENCH_ONLY=<name>``). Removes every cross-query
measurement artifact a shared JVM carries — accumulated code cache, GC
pressure from earlier queries' allocations, broadcast/torrent cleanup
backlogs — at the cost of paying Spark startup per query (untimed; each
child times only its own steady-state runs). Children share one
normalized-fixture scratch via ``SPARK_GRAFT_BENCH_SCRATCH`` (first child
writes, the rest reuse — see catalog._scratch_root), so the per-child
overhead is JVM startup, not a fixture rewrite. Gate re-times in a fresh
child. This is the diagnostic mode for adjudicating shared-JVM
regressions; the driver's headline number stays the shared-JVM run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from data_warehouse_spark.queries_catalog import QUERIES
from data_warehouse_spark.session import get_spark

BENCH_QUERIES = [
    "pricing_summary",
    "shipping_priority",
    "revenue_by_nation",
    "top_customers",
    "order_priority_count",
    "events_hourly",
    "sessionize",
    "top_users_per_event_type",
    "wh_transfers_suite",
    "wh_balances_suite",
    # doc_dedup_baselines is NOT benched: its jaccard arm is the documented
    # O(n²) all-pairs recall baseline — at bench SF it measures the baseline,
    # not the engine (the scale path is doc_minhash_lsh_dedup below)
    "doc_minhash_lsh_dedup",
    "doc_profile",
    "ann_topk_methods",
    "ann_recall",
    "promo_revenue_by_month",
    "customer_order_histogram",
    "events_type_rollups",
    "doc_pii_scrub",
    "doc_paragraph_dedup",
    "doc_mixture_split",
    "emb_semantic_dedup",
    "media_suite",
    "doc_substring_dedup",
    "table_stats",
    "doc_temperature_sample",
    "tpch_subquery_suite",
    "tpch_join_suite",
    "sketch_suite",
    "events_lifecycle_suite",
    "wh_tenants_suite",
    "wh_accounts_suite",
    "orders_stats_suite",
    "events_shapes_suite",
    "asof_purchase_click",
    "doc_quality_gate",
    "doc_neardup_clusters",
    "doc_signatures",
    "doc_simhash_neardup_pairs",
    "doc_corpus_report",
    "doc_clean_corpus",
    "text_index_suite",
    "doc_repetition",
    "doc_contamination",
    "doc_pack_sequences",
    "emb_neardup_pairs",
    "dormant_customers",
    "small_quantity_revenue",
    "acctbal_extremes_union",
    # the running-balance entry serves the bounded per-account summary
    # (final/peak/max-drawdown) — the full window executes, the output is
    # |accounts|-sized, so the timing measures the window operator
    "wh_running_balance",
]


# Entries whose RESULT SET is O(input rows) — per-document transforms,
# per-event sessionization, per-account serving tables, near-dup pair sets.
# Collecting those through the driver's py4j socket measures the socket,
# not the operator (sessionize at sf100 serialized ~30 M rows for 1460 s;
# doc_simhash_neardup_pairs had to be EXCLUDED from the r6 sf10 study for
# the same reason). At scale-study SFs (sf >= 1) these entries execute via
# Spark's `noop` sink instead — the full plan runs distributedly, nothing
# crosses the driver. sf0.1 driver runs keep collect() so timings stay
# comparable with BENCH_REFERENCE (outputs are small there anyway).
WIDE_OUTPUT = {
    "sessionize",
    "asof_purchase_click",
    "doc_profile",
    "doc_pii_scrub",
    "doc_paragraph_dedup",
    "doc_mixture_split",
    "doc_pack_sequences",
    "doc_signatures",
    "doc_repetition",
    "doc_quality_gate",
    "doc_clean_corpus",
    "doc_simhash_neardup_pairs",
    "media_suite",
    "wh_balances_suite",
    "wh_running_balance",
    "events_shapes_suite",
}


def _make_action(sf: float | None):
    """The per-entry execution action: collect() (driver contract) except
    for WIDE_OUTPUT entries at scale-study SFs, which run through the noop
    sink (full distributed execution, zero driver serialization)."""
    wide = sf is not None and sf >= 1

    def run(name: str, df) -> None:
        if wide and name in WIDE_OUTPUT:
            df.write.mode("overwrite").format("noop").save()
        else:
            df.collect()

    return run


def _cap_explanations(explained: dict[str, dict], cap: int = 120) -> dict[str, dict]:
    """Trim the free-text 'explained' reason for the emitted JSON line —
    the driver's artifact keeps ~2 KB of output, and a paragraph-sized
    explanation pushed BENCH_r07's JSON out of the buffer. Full text stays
    in BENCH_REFERENCE.json."""
    out = {}
    for name, entry in explained.items():
        e = dict(entry)
        if isinstance(e.get("explained"), str) and len(e["explained"]) > cap:
            e["explained"] = e["explained"][: cap - 1] + "…"
        out[name] = e
    return out


def _run_canary(spark) -> float:
    """TRUE identical-code box-speed canary: a FIXED workload whose code
    never changes round-over-round, timed in the same window as the
    benched queries. Its measured/reference ratio isolates machine drift
    (thermal, co-tenant load, kernel scheduling weather) from code
    changes — unlike any statistic over the benched queries themselves,
    a repo change cannot move it, because the repo's query code never
    executes here. The mix mirrors the bench's resource profile: a
    whole-stage-codegen shuffle aggregation + global sort (the JVM side)
    and a seeded BLAS matmul (the Arrow/numpy arms). Best-of-2 to damp
    one-off scheduling spikes; reference value pinned as ``canary_sec``
    in BENCH_REFERENCE.json from the same close-of-round window as the
    per-query ratchet."""
    import numpy as np

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        (
            spark.range(0, 12_000_000, 1, 32)
            .selectExpr("id % 9973 AS k", "id % 131 AS j", "id")
            .groupBy("k")
            .agg({"id": "sum", "j": "avg", "*": "count"})
            .orderBy("k")
            .collect()
        )
        a = np.random.default_rng(0).standard_normal((2048, 2048))
        float((a @ a).trace())
        best = min(best, time.perf_counter() - t0)
    return best


def _resolve_box(timings: dict[str, float], ref: dict,
                 canary_sec: float | None) -> dict:
    """Pick the run's box-drift factor. Preferred source: the identical-code
    canary ratio (``canary_sec`` measured this run / ``canary_sec`` pinned
    in BENCH_REFERENCE). Fallback (no pinned canary): the median
    measured/ref ratio over the benched entries — a HEURISTIC that a
    uniform code regression across half the entries could fool, so
    fallback-based explanations are capped by the caller
    (``heuristic_allowed``). Factor clamps at 1.0 so a fast window never
    hides a real regression."""
    cref = ref.get("canary_sec")
    if canary_sec is not None and isinstance(cref, (int, float)) and cref > 0:
        return {
            "factor": max(1.0, canary_sec / cref),
            "source": "canary",
            "canary_sec": round(canary_sec, 3),
            "canary_ref": cref,
        }
    import statistics

    ref_queries = ref.get("queries", {})
    ratios = [
        t / ref_queries[n]
        for n, t in timings.items()
        if isinstance(ref_queries.get(n), (int, float)) and ref_queries[n] > 0
    ]
    if len(ratios) < 8:  # too few entries for a stable median
        return {"factor": 1.0, "source": "none", "n": len(ratios)}
    # cap: if more than 30% of entries individually exceed 1.3x raw, a
    # code-wide regression is as plausible as box drift — the heuristic
    # must not auto-explain anything (a true canary would still be trusted)
    over = sum(1 for r in ratios if r > 1.3)
    return {
        "factor": max(1.0, statistics.median(ratios)),
        "source": "median_heuristic",
        "n": len(ratios),
        "heuristic_allowed": over <= max(3, int(0.3 * len(ratios))),
    }


def _classify(name, best, r, box_info, explained,
              regressions, explained_regressions) -> None:
    """Shared gate bookkeeping: a >1.3x entry lands in explained_regressions
    when BENCH_REFERENCE explains it, OR when the run's box factor accounts
    for it (adjusted ratio <= 1.3) — the artifact then carries its own
    attribution instead of leaving the reader six unexplained rows."""
    entry = {"sec": round(best, 4), "ref": r, "ratio": round(best / r, 2)}
    if name in explained:
        entry["explained"] = explained[name]
        explained_regressions[name] = entry
        return
    box = box_info["factor"]
    adjusted = best / (box * r)
    if box > 1.0 and adjusted <= 1.3:
        if box_info["source"] == "canary":
            entry["explained"] = (
                f"box drift: identical-code canary ratio {box:.2f} "
                f"({box_info['canary_sec']}s vs {box_info['canary_ref']}s "
                f"pinned); adjusted ratio {adjusted:.2f} <= 1.3"
            )
        elif box_info.get("heuristic_allowed"):
            entry["explained"] = (
                f"box drift (HEURISTIC, no pinned canary): run-wide median "
                f"measured/ref ratio {box:.2f} over {box_info.get('n', 0)} "
                f"entries; adjusted ratio {adjusted:.2f} <= 1.3"
            )
        else:  # heuristic capped out — stays an unexplained regression
            regressions[name] = entry
            return
        entry["adjusted_ratio"] = round(adjusted, 2)
        explained_regressions[name] = entry
        return
    regressions[name] = entry


def _bench_names() -> list[str]:
    """Apply SPARK_GRAFT_BENCH_ONLY (comma-separated subset) to the bench
    list — shared by the in-process and ``--isolate`` drivers."""
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if not only:
        return list(BENCH_QUERIES)
    wanted = set(only.split(","))
    unknown = wanted - set(BENCH_QUERIES)
    if unknown:  # no silent caps: a typo'd name must not vanish quietly
        print(
            f"bench: ignoring unknown SPARK_GRAFT_BENCH_ONLY names: "
            f"{sorted(unknown)}",
            file=sys.stderr,
        )
    return [n for n in BENCH_QUERIES if n in wanted]


def _spawn_child(name: str, scratch: str) -> float | None:
    """Run ONE query in a fresh JVM (a child of this script) and return its
    best-of-N timing; None if the child failed (reported on stderr)."""
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = name
    env["SPARK_GRAFT_BENCH_NOGATE"] = "1"  # the parent owns the gate
    env["SPARK_GRAFT_BENCH_SCRATCH"] = scratch
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True,
        text=True,
        env=env,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            t = json.loads(line)["queries"].get(name)
            if t is not None:
                return float(t)
    print(
        f"bench --isolate: child for {name} produced no timing "
        f"(rc={proc.returncode}); stderr tail: {proc.stderr[-500:]}",
        file=sys.stderr,
    )
    return None


def isolated_main() -> int:
    """--isolate driver: fresh JVM per query, shared fixture scratch,
    gate re-times in another fresh child."""
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    scratch = os.environ.get("SPARK_GRAFT_BENCH_SCRATCH") or tempfile.mkdtemp(
        prefix="dwh-bench-scratch-"
    )
    names = _bench_names()
    timings: dict[str, float] = {}
    for name in names:
        t = _spawn_child(name, scratch)
        if t is not None:
            timings[name] = t

    regressions: dict[str, dict] = {}
    explained_regressions: dict[str, dict] = {}
    box_info = {"factor": 1.0, "source": "none"}
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_REFERENCE.json"
    )
    if os.path.exists(ref_path):
        with open(ref_path) as fh:
            ref = json.load(fh)
        if ref.get("sf") == sf:
            explained = ref.get("explained", {})
            # --isolate is the shared-JVM-artifact diagnostic; it has no
            # parent session, so it uses the capped median fallback rather
            # than paying a JVM start just for the canary
            box_info = _resolve_box(timings, ref, None)
            for name, t in list(timings.items()):
                r = ref.get("queries", {}).get(name)
                if r is None or t <= 1.3 * r:
                    continue
                retime = _spawn_child(name, scratch)  # fresh-JVM second opinion
                best = min(t, retime) if retime is not None else t
                timings[name] = round(best, 4)
                if best > 1.3 * r:
                    _classify(name, best, r, box_info, explained,
                              regressions, explained_regressions)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "isolated": True,
                "box_factor": round(box_info["factor"], 3),
                "box_source": box_info["source"],
                "regressions": regressions,
                "explained_regressions": _cap_explanations(explained_regressions),
                "timing": (
                    "best-of-n in a FRESH JVM per query (no cross-query "
                    "cache/GC interference; Spark startup untimed)"
                ),
            },
            separators=(",", ":"),
        )
    )
    strict = "--check" in sys.argv or os.environ.get(
        "SPARK_GRAFT_BENCH_STRICT"
    ) == "1"
    if strict and regressions:
        print(
            f"BENCH GATE: {len(regressions)} unexplained regression(s) "
            f"(>1.3x reference in isolated JVMs): {sorted(regressions)}",
            file=sys.stderr,
        )
        return 1
    return 0


def main() -> None:
    if "--isolate" in sys.argv:
        return isolated_main()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    # shuffle partitions sized to the bench data (~100 MB at sf0.1), exactly
    # as they'd be sized to cluster data volume: too many partitions = pure
    # scheduling overhead (measured ~25% of wall at this SF)
    n_shuffle = int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8"))
    spark = get_spark(app_name="dwh-bench", shuffle_partitions=n_shuffle)
    # warm up JVM / parquet footer cache without touching the timed plans
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # fixture setup, not operator work: persist the derived warehouse tables
    # once (in production they are stored tables the ingestion maintains), so
    # wh_* timings measure the operator instead of a 5-way derivation join
    from data_warehouse_spark.catalog import (
        materialize_base_tables,
        materialize_warehouse,
    )

    # optional subset (comma-separated names) — for scale studies where the
    # fixed-knob quadratic entries would dominate a 100x run
    names = _bench_names()
    if any(n.startswith("wh_") for n in names):
        # only the wh_* entries read the derived warehouse tables; a scale
        # run that excludes them must not pay the 5-way derivation join
        materialize_warehouse(spark, sf_dir)
    # the driver's refreshed testdata is single-row-group parquet — Spark
    # cannot split a row group, so every scan (and the map-side compute above
    # it) would serialize through ONE local task; cluster parquet is always
    # multi-row-group. Rewrite the same bytes as multi-file scratch copies so
    # timings measure the operators, not the fixture's file layout.
    materialize_base_tables(spark, sf_dir)

    # best of N runs per query: the first run pays Catalyst analysis +
    # whole-stage-codegen compilation (seconds for the widest expression
    # trees), which on a long-lived warehouse amortizes to zero — steady-state
    # execution time is the signal.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    from data_warehouse_spark.operators.similarity import clear_ivf_cache

    # scale-study resilience: one entry blowing a resource bound (disk-full
    # shuffle spill, result cap) must not erase the rest of a multi-hour
    # run. Default (driver mode) stays fail-fast.
    keep_going = os.environ.get("SPARK_GRAFT_BENCH_KEEP_GOING") == "1"
    failed: dict[str, str] = {}
    action = _make_action(sf)
    for name in names:
        qd = QUERIES.get(name)
        if qd is None:
            continue
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                action(name, qd.fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:
            if not keep_going:
                raise
            failed[name] = str(exc).split("\n")[0][:300]
            print(f"bench: {name} FAILED: {failed[name]}", file=sys.stderr)
            continue
        finally:
            # inter-query isolation (outside the timed region): drop executor
            # cache left by this query (IVF index persist etc.) so later
            # queries aren't measured under another query's memory pressure —
            # each query still warms its OWN caches on run 1 and is timed
            # steady-state on run 2. Measured effect: ~14% lower total, and
            # removes the 2-4x spikes late-list queries showed under
            # accumulated cache. Runs in `finally` so a FAILED entry
            # (OOM-class) cannot leave its cache pressure on later entries.
            clear_ivf_cache()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 4)
        print(f"bench: {name} {timings[name]}s", file=sys.stderr)

    # --- regression gate (see module docstring) ---------------------------
    # children of --isolate skip it: the parent gates the merged timings
    nogate = os.environ.get("SPARK_GRAFT_BENCH_NOGATE") == "1"
    regressions: dict[str, dict] = {}
    explained_regressions: dict[str, dict] = {}
    box_info = {"factor": 1.0, "source": "none"}
    canary_sec: float | None = None
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_REFERENCE.json")
    if os.path.exists(ref_path) and not nogate:
        with open(ref_path) as fh:
            ref = json.load(fh)
        if ref.get("sf") == sf:
            explained = ref.get("explained", {})
            # identical-code canary, timed INSIDE the run's window (after
            # the queries, same JVM) — measures the box, not the repo
            canary_sec = _run_canary(spark)
            box_info = _resolve_box(timings, ref, canary_sec)
            for name, t in list(timings.items()):
                r = ref.get("queries", {}).get(name)
                if r is None or t <= 1.3 * r:
                    continue
                # re-time before accusing: local best-of-2 is noisy
                best = t
                for _ in range(3):
                    t0 = time.perf_counter()
                    action(name, QUERIES[name].fn(spark, sf_dir))
                    best = min(best, time.perf_counter() - t0)
                clear_ivf_cache()
                spark.catalog.clearCache()
                timings[name] = round(best, 4)
                if best > 1.3 * r:
                    _classify(name, best, r, box_info, explained,
                              regressions, explained_regressions)

    total = round(sum(timings.values()), 4)
    # the driver records only the last ~2 KB of output (BENCH_r07's JSON
    # line outgrew it and arrived truncated/unparseable) — keep the line
    # compact: 3-decimal timings, terse separators, explanation text capped
    # (the full text lives in BENCH_REFERENCE.json's "explained" map)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                **({"failed": failed} if failed else {}),
                "sf": sf,
                "runs_per_query": runs,
                "box_factor": round(box_info["factor"], 3),
                "box_source": box_info["source"],
                **({"canary_sec": round(canary_sec, 3)}
                   if canary_sec is not None else {}),
                "regressions": regressions,
                "explained_regressions": _cap_explanations(explained_regressions),
                "timing": "best-of-n steady-state",
                "note": "see bench.py docstring (fixture normalization, gate ritual)",
            },
            separators=(",", ":"),
        )
    )
    spark.stop()
    strict = "--check" in sys.argv or os.environ.get(
        "SPARK_GRAFT_BENCH_STRICT"
    ) == "1"
    if strict and regressions:
        print(
            f"BENCH GATE: {len(regressions)} unexplained regression(s) "
            f"(>1.3x reference after re-timing): {sorted(regressions)}",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
