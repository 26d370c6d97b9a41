"""Round-12 optimization measurement harness (extends profile_r11).

Subcommands (bench session shape: SPARK_GRAFT_BENCH_SHUFFLE partitions,
scratch-normalized fixtures):

  plans   [--suffix before|after|current] [--only a,b]
          dump .explain("formatted") to plans/r12/<name>_<suffix>.txt
  profile [--only a,b] [--runs N]   build/act wall split per query
          (run1 = codegen+index build; run2+ = steady state)
  ann     per-arm ann attribution (cold/warm) — same as r11's
  py4j    [--only a,b] count py4j command round trips during ONE
          construction + collect of each query (steady-state: caches warm
          from a first untimed call) — the driver-chatter metric the r11
          SQL-string fast paths were validated with

Usage: python profile_r12.py plans --suffix before --only ann_recall
"""
from __future__ import annotations

import argparse
import json
import os
import time

from profile_r11 import _explain_text, _spark_and_fixtures, cmd_ann, cmd_profile

from data_warehouse_spark.queries_catalog import QUERIES


def cmd_plans(args) -> None:
    spark, sf_dir = _spark_and_fixtures()
    outdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r12"
    )
    os.makedirs(outdir, exist_ok=True)
    names = args.only.split(",") if args.only else list(QUERIES)
    for name in names:
        qd = QUERIES[name]
        df = qd.fn(spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(_explain_text(df))
        print(f"{name} -> {path}")
    spark.stop()


def cmd_py4j(args) -> None:
    """Count py4j command round trips per query call (construction+collect,
    caches warm). The counter wraps the gateway client's send_command."""
    spark, sf_dir = _spark_and_fixtures()
    from py4j.java_gateway import GatewayClient

    from data_warehouse_spark.operators.similarity import clear_ivf_cache

    counter = {"n": 0}
    orig = GatewayClient.send_command

    def counted(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    names = args.only.split(",") if args.only else list(QUERIES)
    out = {}
    for name in names:
        qd = QUERIES[name]
        qd.fn(spark, sf_dir).collect()  # warm caches + codegen, untimed
        GatewayClient.send_command = counted
        counter["n"] = 0
        t0 = time.perf_counter()
        df = qd.fn(spark, sf_dir)
        built = counter["n"]
        t1 = time.perf_counter()
        df.collect()
        dt = time.perf_counter() - t1
        GatewayClient.send_command = orig
        out[name] = {
            "py4j_build": built,
            "py4j_total": counter["n"],
            "build_s": round(t1 - t0, 3),
            "act_s": round(dt, 3),
        }
        print(json.dumps({name: out[name]}))
        clear_ivf_cache()
        spark.catalog.clearCache()
    print(json.dumps({"py4j": out}))
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("plans")
    pp.add_argument("--suffix", default="before")
    pp.add_argument("--only", default=None)
    pr = sub.add_parser("profile")
    pr.add_argument("--only", default=None)
    pr.add_argument("--runs", type=int, default=3)
    sub.add_parser("ann")
    pj = sub.add_parser("py4j")
    pj.add_argument("--only", default=None)
    args = p.parse_args()
    {
        "plans": cmd_plans,
        "profile": cmd_profile,
        "ann": cmd_ann,
        "py4j": cmd_py4j,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
