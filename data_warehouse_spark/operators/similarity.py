"""Similarity search over embedding columns (array<float>).

Two paths:

  brute_force_topk   exact cosine top-k: broadcast the (small) query set
                     against the corpus; per-partition top-k via window.
                     O(|queries|·|corpus|) — the correctness baseline and
                     perfectly respectable when |queries| is small.
  lsh_topk           random-hyperplane LSH: corpus bucketed by sign bits
                     (one pass, no shuffle), queries probe matching buckets
                     only. The 100 TB path: bucket count scales the
                     candidate set down exponentially (16 planes → 65k
                     buckets). Approximate — recall measured in tests.

Hyperplanes are deterministic literals (seeded numpy, fixed), so results are
reproducible and SQL-twin-able.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V

# 6 planes → 64 buckets: sized for the synthetic corpus (≈500–50k vectors,
# near-random directions). At real scale the plane count is THE tuning knob:
# each plane halves expected candidates (bucket count doubles).
N_PLANES = 6
_EMBED_DIM = 64


def hyperplanes(dim: int = _EMBED_DIM, n: int = N_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (values rounded so literals embed
    exactly in SQL twins)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n, dim))
    return [[round(float(x), 6) for x in row] for row in planes]


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id (excluding self)."""
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = V.cosine("q_vec", "n_vec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def bucketize(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    planes = planes or hyperplanes()
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        V.hyperplane_signs(vec_col, planes).alias("bucket"),
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k: only candidates in the query's LSH bucket
    are scored. Single-probe (same-bucket) — recall/latency knob is the
    plane count; multi-probe would flip bucket bits for higher recall."""
    planes = planes or hyperplanes()
    bucketed = bucketize(embeddings, id_col, vec_col, planes)
    queries = bucketed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = bucketed.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = V.cosine("q_vec", "vec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        cands.select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets: pairs sharing a
    bucket with cosine ≥ threshold. Output is id pairs (rank-free, exact to
    compare); cosine itself stays internal."""
    bucketed = bucketize(embeddings, id_col, vec_col, planes)
    a = bucketed.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket"
    )
    pairs = a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    sim = V.cosine("vec_a", "vec_b")
    return (
        pairs.select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
        .distinct()
        .orderBy("id_a", "id_b")
    )
