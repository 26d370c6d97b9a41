"""Round-11 optimization measurement harness.

Subcommands (all run under the bench's exact session shape — shuffle
partitions from SPARK_GRAFT_BENCH_SHUFFLE, scratch-normalized fixtures):

  plans   [--suffix before|after] [--only a,b]   dump .explain("formatted")
          for every declared query to plans/r11/<name>_<suffix>.txt
  profile [--only a,b] [--runs N]                per-run wall timings
          (run1 = Catalyst+codegen+index build, run2+ = steady state, the
          bench's best-of-N signal), per query
  ann     per-arm attribution of ann_recall/ann_topk_methods at the bench
          SF: each arm built+collected in isolation, index caches cleared
          between arms (cold) and kept (warm)

Usage: python profile_r11.py plans --suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import time

from data_warehouse_spark.queries_catalog import QUERIES
from data_warehouse_spark.session import get_spark


def _spark_and_fixtures():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_shuffle = int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8"))
    spark = get_spark(app_name="dwh-profile-r11", shuffle_partitions=n_shuffle)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from data_warehouse_spark.catalog import (
        materialize_base_tables,
        materialize_warehouse,
    )

    materialize_warehouse(spark, sf_dir)
    materialize_base_tables(spark, sf_dir)
    return spark, sf_dir


def _explain_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def cmd_plans(args) -> None:
    spark, sf_dir = _spark_and_fixtures()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r11")
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


def cmd_profile(args) -> None:
    spark, sf_dir = _spark_and_fixtures()
    from data_warehouse_spark.operators.similarity import clear_ivf_cache

    names = args.only.split(",") if args.only else list(QUERIES)
    out: dict[str, list] = {}
    for name in names:
        qd = QUERIES[name]
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qd.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            # (construction = driver-side actions: centroid collects,
            #  codeword training, checkpoints;  action = the final collect)
            runs.append({"build": round(t1 - t0, 4), "act": round(t2 - t1, 4),
                         "total": round(t2 - t0, 4)})
        out[name] = runs
        clear_ivf_cache()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        print(json.dumps({name: runs}))
    print(json.dumps({"profile": out}))
    spark.stop()


def cmd_ann(args) -> None:
    """Per-arm attribution: time each ann arm alone (build+probe+collect),
    then a second call (indexes warm from the arm's own cache key)."""
    spark, sf_dir = _spark_and_fixtures()
    from pyspark.sql import functions as F

    from data_warehouse_spark import catalog as cat
    from data_warehouse_spark.operators import similarity
    from data_warehouse_spark.operators.similarity import clear_ivf_cache
    from data_warehouse_spark.queries_catalog import _ANN_K, _ANN_QUERY_IDS

    emb = cat.load_table(spark, sf_dir, "embeddings")
    arms = {
        "bf": lambda: similarity.brute_force_topk(emb, _ANN_QUERY_IDS, k=_ANN_K),
        "ivf": lambda: similarity.ivf_topk(
            emb, _ANN_QUERY_IDS, k=_ANN_K, n_cells=similarity.N_CELLS,
            nprobe=similarity.N_PROBE, index_cache_key=sf_dir),
        "ivf_auto": lambda: similarity.ivf_topk(
            emb, _ANN_QUERY_IDS, k=_ANN_K, n_cells=None, nprobe=None,
            train_iters=0, index_cache_key=sf_dir + "::auto"),
        "ivf_fast": lambda: similarity.ivf_topk(
            emb, _ANN_QUERY_IDS, k=_ANN_K, n_cells=similarity.N_CELLS,
            nprobe=similarity.N_PROBE, index_cache_key=sf_dir + "::fast",
            fast=True),
        "lsh": lambda: similarity.lsh_topk(
            emb, _ANN_QUERY_IDS, k=_ANN_K, planes=similarity.hyperplanes()),
        "lsh_mp": lambda: similarity.lsh_topk(
            emb, _ANN_QUERY_IDS, k=_ANN_K, planes=similarity.hyperplanes(),
            multiprobe=True),
        "pq": lambda: similarity.pq_topk(
            emb, _ANN_QUERY_IDS, k=_ANN_K, index_cache_key=sf_dir),
        "ivfpq": lambda: similarity.ivfpq_topk(
            emb, _ANN_QUERY_IDS, k=_ANN_K, n_cells=similarity.N_CELLS,
            nprobe=similarity.N_PROBE, index_cache_key=sf_dir),
        "ivfpq_refine": lambda: similarity.ivfpq_refine_topk(
            emb, _ANN_QUERY_IDS, k=_ANN_K, refine=4,
            n_cells=similarity.N_CELLS, nprobe=similarity.N_PROBE,
            index_cache_key=sf_dir),
    }
    report = {}
    for name, fn in arms.items():
        clear_ivf_cache()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn().collect()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn().collect()
        warm = time.perf_counter() - t0
        report[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
        print(json.dumps({name: report[name]}))
    # the recall join overhead: everything minus the arms
    from data_warehouse_spark.materialize import storage_checkpoint

    clear_ivf_cache()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    bf = storage_checkpoint(
        similarity.brute_force_topk(emb, _ANN_QUERY_IDS, k=_ANN_K))
    ck = time.perf_counter() - t0
    report["bf_checkpoint"] = round(ck, 3)
    t0 = time.perf_counter()
    r = similarity.recall_vs_exact(
        similarity.ivf_topk(
            emb, _ANN_QUERY_IDS, k=_ANN_K, n_cells=similarity.N_CELLS,
            nprobe=similarity.N_PROBE, index_cache_key=sf_dir),
        bf, k=_ANN_K,
    ).select(F.lit("ivf").alias("method"), "query_id", "recall_x1000")
    r.collect()
    report["one_recall_join_cold"] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"ann_attribution_sf_bench": report}))
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
    args = p.parse_args()
    {"plans": cmd_plans, "profile": cmd_profile, "ann": cmd_ann}[args.cmd](args)


if __name__ == "__main__":
    main()
