"""Iterative graph operators: PageRank over an edge DataFrame.

The engine already runs one iterative fixpoint algorithm (connected
components via min-label propagation, operators/dedup.py:neardup_clusters);
PageRank is the other canonical join-based iteration a warehouse-scale graph
workload needs (domain authority over a web-link graph, supplier importance
over a trade graph, …).

Scale design (the GraphX/Pregel pattern expressed as DataFrame joins):

  * per iteration: ONE shuffle join (ranks ⋈ out-degreed edges on src) +
    ONE aggregation shuffle (contributions grouped by dst). Both shuffle on
    node ids — co-partitioned by Catalyst since the keys repeat, and AQE
    handles skewed hubs.
  * dangling nodes (no out-edges) redistribute their mass uniformly —
    computed as a scalar aggregate per iteration (tiny driver value), the
    standard correction that keeps ranks summing to 1.
  * lineage is truncated with a storage checkpoint every few rounds, exactly
    like neardup_clusters — an unbounded iterative plan otherwise grows the
    DAG until planning dominates runtime.
  * iteration count is fixed (default 10): deterministic output, bounded
    cost; convergence-threshold looping adds a driver-side reduce per round
    and is left to callers who need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import storage_checkpoint as _storage_checkpoint

CHECKPOINT_EVERY = 4


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank) with ranks
    summing to 1 (dangling mass redistributed uniformly).

    ``edges`` is any DataFrame with ``src_col``/``dst_col``; duplicate
    edges count as parallel edges (a doc linking a domain twice votes
    twice), matching the classic formulation on multigraphs.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # edges annotated once with the constant out-degree of their source
    e_deg = e.join(out_deg, "src")
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev_cached = None
    for i in range(iterations):
        # persist before the dangling collect: each iteration consumes
        # `ranks` twice (contribs join + dangling aggregate) and the next
        # iteration a third time — unpersisted, the whole lineage since the
        # last storage checkpoint re-executes per consumer (~quadratic work
        # inside each checkpoint window)
        ranks = ranks.persist()
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # mass sitting on dangling nodes (rank not forwarded by any edge);
        # the collect also materializes the persist above
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["src"], "left_anti")
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = ranks
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if (i + 1) % CHECKPOINT_EVERY == 0:
            # storage checkpoint (parquet scratch), not localCheckpoint:
            # the latter strands one persisted RDD per truncation until JVM
            # GC — the executor-cache leak the cache-hygiene test pins
            ranks = _storage_checkpoint(ranks)
    if prev_cached is not None:
        # break the lineage before releasing the cache the result depends
        # on — no block-manager state may outlive the call
        ranks = _storage_checkpoint(ranks)
        prev_cached.unpersist()
    return ranks.orderBy(F.desc("rank"), "node")


def supplier_importance(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """PageRank on the customer→supplier trade graph (who supplies the
    buyers that matter): an edge per lineitem from the ordering customer to
    the supplying supplier. Customers never receive edges, so all authority
    flows to (and concentrates on) suppliers."""
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    return pagerank(edges, iterations=6)
