"""Per-arm attribution of the ``ann_recall`` suite at scale.

VERDICT r7 item 6: ann_recall's sf30 wall (339.5 s = 4.07× for 3× data)
needed per-arm isolated timings to separate single-disk spill during
CONCURRENT index builds from any real per-arm plan cost — mirroring the
round-7 ``ann_topk_attribution`` method that adjudicated the sf100 number.

What runs, each arm timed alone with caches cleared between arms (so an
arm pays its own index build, never inherits a neighbor's):

  bf         exact brute-force top-k — the recall denominator
  ivf        cold (train+assign+probe) then warm (probe only, cached index)
  ivf_auto   same, corpus-derived √N geometry (train_iters=0)
  lsh        hyperplane LSH probe (no stored index — always "cold")
  lsh_mp     multi-probe variant
  pq         cold (codebook train+encode) then warm (ADC probe)
  ivfpq      cold (both artifacts) then warm (composed probe)

Output: ONE JSON line (also written to ``--out``) with per-arm seconds and
the sum-vs-suite comparison: if Σ(isolated arms) ≪ the suite's one-JVM
wall, the gap is cross-arm interference (concurrent builds spilling
through the single test volume), not plan cost.

Usage: python ann_attribution.py [--sf scale_data/sf30]
                                 [--out ANN_ATTRIBUTION.json] [--suite]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="scale_data/sf30")
    ap.add_argument("--out", default="ANN_ATTRIBUTION.json")
    ap.add_argument(
        "--suite",
        action="store_true",
        help="also run the whole ann_recall catalog entry afterwards in "
        "this same JVM (the shared-fate number the isolated arms explain)",
    )
    args = ap.parse_args()

    from data_warehouse_spark import catalog as cat
    from data_warehouse_spark.materialize import storage_checkpoint
    from data_warehouse_spark.operators import similarity
    from data_warehouse_spark.session import get_spark

    QIDS = [0, 1, 2, 3, 4]  # queries_catalog._ANN_QUERY_IDS
    K = 5  # queries_catalog._ANN_K

    spark = get_spark(app_name="dwh-ann-attribution")
    emb = cat.load_table(spark, args.sf, "embeddings")
    n_vectors = emb.count()  # also warms the scan/codegen once

    arms: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        n = fn().count()
        arms[name] = round(time.perf_counter() - t0, 2)
        print(f"arm {name}: {arms[name]}s ({n} rows)", flush=True)

    timed("bf", lambda: similarity.brute_force_topk(emb, QIDS, k=K))

    similarity.clear_ivf_cache()
    key = args.sf + "::attr"
    timed("ivf_cold", lambda: similarity.ivf_topk(
        emb, QIDS, k=K, n_cells=similarity.N_CELLS,
        nprobe=similarity.N_PROBE, index_cache_key=key))
    timed("ivf_warm", lambda: similarity.ivf_topk(
        emb, QIDS, k=K, n_cells=similarity.N_CELLS,
        nprobe=similarity.N_PROBE, index_cache_key=key))

    similarity.clear_ivf_cache()
    timed("ivf_auto_cold", lambda: similarity.ivf_topk(
        emb, QIDS, k=K, n_cells=None, nprobe=None, train_iters=0,
        index_cache_key=key + "::auto"))
    timed("ivf_auto_warm", lambda: similarity.ivf_topk(
        emb, QIDS, k=K, n_cells=None, nprobe=None, train_iters=0,
        index_cache_key=key + "::auto"))

    # r10 BLAS scale mode: same geometry/training, dgemm assignment. The
    # pinned-geometry arm mirrors the suite's new ivf_fast arm; the AUTO
    # arm is the headline — auto √N geometry is where the O(N·√N·d)
    # assignment flops live (ANN_ATTRIBUTION_SF30/SF100), so
    # ivf_auto_cold / ivf_fast_auto_cold is the build-time speedup claim.
    similarity.clear_ivf_cache()
    timed("ivf_fast_cold", lambda: similarity.ivf_topk(
        emb, QIDS, k=K, n_cells=similarity.N_CELLS,
        nprobe=similarity.N_PROBE, index_cache_key=key + "::fast",
        fast=True))
    timed("ivf_fast_warm", lambda: similarity.ivf_topk(
        emb, QIDS, k=K, n_cells=similarity.N_CELLS,
        nprobe=similarity.N_PROBE, index_cache_key=key + "::fast",
        fast=True))
    similarity.clear_ivf_cache()
    timed("ivf_fast_auto_cold", lambda: similarity.ivf_topk(
        emb, QIDS, k=K, n_cells=None, nprobe=None, train_iters=0,
        index_cache_key=key + "::fastauto", fast=True))
    timed("ivf_fast_auto_warm", lambda: similarity.ivf_topk(
        emb, QIDS, k=K, n_cells=None, nprobe=None, train_iters=0,
        index_cache_key=key + "::fastauto", fast=True))

    planes = similarity.hyperplanes()
    timed("lsh", lambda: similarity.lsh_topk(emb, QIDS, k=K, planes=planes))
    timed("lsh_mp", lambda: similarity.lsh_topk(
        emb, QIDS, k=K, planes=planes, multiprobe=True))

    similarity._PQ_CODES_CACHE.clear()
    timed("pq_cold", lambda: similarity.pq_topk(
        emb, QIDS, k=K, index_cache_key=key))
    timed("pq_warm", lambda: similarity.pq_topk(
        emb, QIDS, k=K, index_cache_key=key))

    similarity.clear_ivf_cache()
    similarity._PQ_CODES_CACHE.clear()
    timed("ivfpq_cold", lambda: similarity.ivfpq_topk(
        emb, QIDS, k=K, n_cells=similarity.N_CELLS,
        nprobe=similarity.N_PROBE, index_cache_key=key))
    timed("ivfpq_warm", lambda: similarity.ivfpq_topk(
        emb, QIDS, k=K, n_cells=similarity.N_CELLS,
        nprobe=similarity.N_PROBE, index_cache_key=key))

    # r11: IVF+PQ + exact re-rank refinement (the FAISS refine stage) —
    # timing plus the recall claim (refine >= plain ivfpq at equal nprobe)
    similarity.clear_ivf_cache()
    similarity._PQ_CODES_CACHE.clear()
    timed("ivfpq_refine_cold", lambda: similarity.ivfpq_refine_topk(
        emb, QIDS, k=K, refine=4, n_cells=similarity.N_CELLS,
        nprobe=similarity.N_PROBE, index_cache_key=key))
    timed("ivfpq_refine_warm", lambda: similarity.ivfpq_refine_topk(
        emb, QIDS, k=K, refine=4, n_cells=similarity.N_CELLS,
        nprobe=similarity.N_PROBE, index_cache_key=key))
    bf_df = storage_checkpoint(similarity.brute_force_topk(emb, QIDS, k=K))
    recall = {}
    for name, fn in (
        ("ivfpq", lambda: similarity.ivfpq_topk(
            emb, QIDS, k=K, n_cells=similarity.N_CELLS,
            nprobe=similarity.N_PROBE, index_cache_key=key)),
        ("ivfpq_refine", lambda: similarity.ivfpq_refine_topk(
            emb, QIDS, k=K, refine=4, n_cells=similarity.N_CELLS,
            nprobe=similarity.N_PROBE, index_cache_key=key)),
    ):
        rows = similarity.recall_vs_exact(fn(), bf_df, k=K).collect()
        recall[name] = round(
            sum(r["recall_x1000"] for r in rows) / (1000 * len(rows)), 3
        )
    print(f"recall@{K}: {recall}", flush=True)

    # r11: the STORED index lifecycle's build modes (save_ivf_index) —
    # the verdict-r10 item: the 7x BLAS win must exist for the artifact a
    # production deployment actually builds, not just session indexes
    import shutil as _sh
    import tempfile as _tf

    stored = {}
    for mode, fast in (("parity", False), ("fast", True)):
        d = _tf.mkdtemp(prefix=f"ann-stored-{mode}-")
        similarity.clear_ivf_cache()
        t0 = time.perf_counter()
        similarity.save_ivf_index(emb, d, fast=fast)
        stored[f"stored_build_{mode}"] = round(time.perf_counter() - t0, 2)
        print(f"stored_build_{mode}: {stored[f'stored_build_{mode}']}s",
              flush=True)
        _sh.rmtree(d, ignore_errors=True)
    arms.update(stored)

    # the recall joins themselves (6 small joins on a k×|queries| table)
    similarity.clear_ivf_cache()
    similarity._PQ_CODES_CACHE.clear()
    suite_sec = None
    if args.suite:
        from data_warehouse_spark.queries_catalog import QUERIES

        t0 = time.perf_counter()
        QUERIES["ann_recall"].fn(spark, args.sf).count()
        suite_sec = round(time.perf_counter() - t0, 2)
        print(f"full ann_recall suite (same JVM, after arms): {suite_sec}s",
              flush=True)

    cold_sum = round(
        arms["bf"] + arms["ivf_cold"] + arms["ivf_auto_cold"]
        + arms["ivf_fast_cold"] + arms["lsh"]
        + arms["lsh_mp"] + arms["pq_cold"] + arms["ivfpq_cold"], 2)
    report = {
        "metric": "ann_recall_per_arm_attribution",
        "sf_dir": args.sf,
        "n_vectors": n_vectors,
        "arms_sec": arms,
        "isolated_cold_sum_sec": cold_sum,
        "recall_at_k_mean": recall,
        "stored_build_speedup": (
            round(stored["stored_build_parity"] / stored["stored_build_fast"], 2)
            if stored.get("stored_build_fast") else None
        ),
        "suite_same_jvm_sec": suite_sec,
        "reading": (
            "arms timed alone with caches cleared between them; compare "
            "isolated_cold_sum_sec with the suite's one-JVM SCALE wall — "
            "any large gap is cross-arm interference (concurrent index "
            "builds spilling through one volume), not per-arm plan cost"
        ),
    }
    line = json.dumps(report)
    print(line)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
