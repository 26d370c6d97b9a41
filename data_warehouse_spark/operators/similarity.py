"""Similarity search over embedding columns (array<float>).

Three paths:

  brute_force_topk   exact cosine top-k: broadcast the (small) query set
                     against the corpus; per-partition top-k via window.
                     O(|queries|·|corpus|) — the correctness baseline and
                     perfectly respectable when |queries| is small.
  lsh_topk           random-hyperplane LSH: corpus bucketed by sign bits
                     (one pass, no shuffle), queries probe matching buckets
                     only. The 100 TB path: bucket count scales the
                     candidate set down exponentially (16 planes → 65k
                     buckets). Approximate — recall measured in tests.
  ivf_topk           inverted-file index (IVF-flat): a small deterministic
                     centroid set partitions the corpus into cells
                     (map-only assignment against broadcast centroids);
                     queries probe only the `nprobe` nearest cells. The
                     other classic ANN scale path — candidate count is
                     |corpus|·nprobe/n_cells instead of bucket-collision
                     driven, so recall degrades gracefully with nprobe.

Hyperplanes are deterministic literals (seeded numpy, fixed), and IVF
centroids are k-means-trained from a hash-selected init + sample with a
fixed iteration count and exact cross-engine fold orders
(:func:`kmeans_refine`), so results are reproducible and SQL-twin-able.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..functions import vectors as V

# PINNED geometry for the sf0.1 synthetic fixture — kept for oracle/recall
# stability of the catalog's pinned arms. Library DEFAULTS are now
# corpus-derived (n_cells/planes/nprobe=None → auto_* below): fixed
# geometry is the measured 100 TB failure mode (within-cell pair work grows
# quadratically at a fixed cell count — sf1 measured ~75× wall for 10×
# data at n_cells=16).
N_PLANES = 6
_EMBED_DIM = 64
N_CELLS = 16
N_PROBE = 4

# auto_n_cells clamp: 2^18 cells ≈ right-sized for ~7e10 vectors; beyond
# that a flat coarse quantizer stops being the design anyway.
AUTO_MAX_CELLS = 1 << 18


def auto_n_cells(n: int) -> int:
    """Corpus-derived IVF cell count: smallest power of two ≥ ⌊√N⌋, clamped
    to [4, 2^18] — classic IVF sizing (cells ≈ √N keeps the centroid table
    AND the expected per-cell population both at O(√N), so within-cell
    quadratic work totals O(N·√N /cells)≈O(N)). Pure integer math (isqrt +
    bit_length) so the SQL twin's geometry CTE (oracle_twins.geo_cte) can
    replay it exactly — no float-log boundary hazards; equality is pinned
    cross-engine by tests/test_llm_ops geometry sweep."""
    s = math.isqrt(max(1, int(n)))
    c = 1 << max(0, (s - 1).bit_length())
    return min(AUTO_MAX_CELLS, max(4, c))


def auto_n_planes(n: int) -> int:
    """LSH plane count whose bucket space (2^planes) equals auto_n_cells(n)
    — the same √N occupancy target, so bucketed near-dup pair work scales
    like the cell-scoped paths."""
    return auto_n_cells(n).bit_length() - 1


def auto_nprobe(n_cells: int) -> int:
    """Probe width ⌊√n_cells⌋ — the standard IVF operating point (recall
    grows ~linearly in nprobe, cost too; √cells keeps probe cost O(N^(3/4))
    total). Reproduces the long-pinned 4-of-16 at the fixture geometry."""
    return max(1, math.isqrt(int(n_cells)))


def _resolve_n_cells(embeddings: DataFrame, n_cells: int | None) -> int:
    """``n_cells=None`` → derive from the corpus count (one column-pruned
    count job; amortize with an explicit value or ``index_cache_key`` when
    calling in a loop)."""
    return int(n_cells) if n_cells is not None else auto_n_cells(embeddings.count())


def _resolve_planes(
    embeddings: DataFrame, planes: list[list[float]] | None, dim: int = _EMBED_DIM
) -> list[list[float]]:
    if planes is not None:
        return planes
    return hyperplanes(dim=dim, n=auto_n_planes(embeddings.count()))


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
    """Exact cosine top-k neighbors for each query id (excluding self).

    One Arrow-batched vectorized scan: every (corpus row × query) cosine
    in numpy float64 with the exact IEEE fold sequence of
    :func:`vectors.cosine` (per-dim left-fold dot and norms,
    ``norm(q)·norm(n)`` then one divide — parity pinned by
    ``test_brute_force_vectorized_equals_expr`` against the retained
    expression form, :func:`_brute_force_topk_expr`), then a per-batch
    local top-k under the final total order so only partitions×|queries|×k
    rows reach the global ranking window. The expression form's
    interpreted cosine folds measured ~20 s for 600 k vectors × 5 queries
    at sf30 (ANN_ATTRIBUTION ``bf``); the vectorized scan is I/O-bound.
    NaN cosines (zero-norm vectors) are kept for the global window —
    Spark orders NaN greatest — and only SUBSTITUTED with +inf inside the
    local argselection so such a candidate can never be dropped early."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    q_rows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .collect()
    )
    id_field = [f for f in embeddings.schema.fields if f.name == id_col][0]
    out_schema = StructType(
        [
            StructField("query_id", id_field.dataType),
            StructField("neighbor_id", id_field.dataType),
            StructField("cosine", DoubleType()),
        ]
    )
    if not q_rows:
        return embeddings.sparkSession.createDataFrame([], out_schema).select(
            "query_id", "neighbor_id", F.lit(0).cast("bigint").alias("rank")
        )
    qids = np.asarray([r["query_id"] for r in q_rows], dtype=np.int64)
    qm = np.asarray(
        [np.asarray(r["q_vec"], dtype=np.float64) for r in q_rows], dtype=np.float64
    )
    # norm2(q) with the same 0.0-init per-dim fold the expression runs
    qacc = np.zeros(qm.shape[0], dtype=np.float64)
    for d in range(qm.shape[1]):
        qacc = qacc + qm[:, d] * qm[:, d]
    qn = np.sqrt(qacc)

    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["n_vec"]],
                dtype=np.float64,
            )
            nid = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            dots = np.zeros((a.shape[0], qm.shape[0]), dtype=np.float64)
            nacc = np.zeros(a.shape[0], dtype=np.float64)
            for d in range(a.shape[1]):
                col = a[:, d]
                dots = dots + col[:, None] * qm[None, :, d]
                nacc = nacc + col * col
            nn = np.sqrt(nacc)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (qn[None, :] * nn[:, None])
            outs = []
            for qi in range(qm.shape[0]):
                c = cos[:, qi]
                keep = nid != qids[qi]
                sel = np.where(np.isnan(c), np.inf, c)[keep]
                ids_k = nid[keep]
                if ids_k.size == 0:
                    continue
                top = min(k, ids_k.size)
                # final total order: cosine desc, neighbor_id asc
                order = np.lexsort((ids_k, -sel))[:top]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(top, qids[qi], dtype=np.int64),
                            "neighbor_id": ids_k[order],
                            "cosine": c[keep][order],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    reduced = corpus.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        reduced.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def _brute_force_topk_expr(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The expression form — the spec :func:`brute_force_topk` must match
    row-for-row (retained for the parity pin; interpreted cosine folds
    make it ~10× the vectorized scan at corpus scale)."""
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
    """(vec_id, vec, bucket) — hyperplane-LSH bucket per vector, as one
    vectorized Arrow-batch pass. The expression form
    (:func:`vectors.hyperplane_signs` — N×planes interpreted dot folds
    over the corpus) stays the spec and the per-query probe path; the
    numpy pass replays its exact IEEE sequence (per-dim 0.0-init left
    fold per plane, bit m set iff d > 0) — pinned by
    ``test_bucketize_vectorized_equals_expr``."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    planes = _resolve_planes(embeddings, planes)
    pm = np.asarray(planes, dtype=np.float64)  # (planes, dim)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    out_schema = StructType(
        list(base.schema.fields) + [StructField("bucket", LongType())]
    )
    weights = np.asarray([2**m for m in range(pm.shape[0])], dtype=np.int64)

    def bucketit(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]],
                dtype=np.float64,
            )
            dots = np.zeros((a.shape[0], pm.shape[0]), dtype=np.float64)
            for d in range(pm.shape[1]):
                dots = dots + a[:, d : d + 1] * pm[None, :, d]
            out = pdf.copy()
            # Spark compares NaN greater than any value, so a NaN dot sets
            # its bit under the expression spec; numpy's NaN > 0 is False
            out["bucket"] = ((dots > 0) | np.isnan(dots)) @ weights
            yield out

    return base.mapInPandas(bucketit, schema=out_schema)


# (app_id, cache key, plane geometry, columns) → persisted bucketed corpus.
# The LSH analogue of _IVF_INDEX_CACHE: the bucketed corpus IS the LSH index
# (a stored artifact in production, built once and probed many times); the
# session cache is the local stand-in. Same CONTRACT as the IVF cache: the
# cache_key must uniquely identify the corpus DATA. Cleared (and the persisted
# partitions released) by clear_ivf_cache alongside the IVF entries.
_LSH_INDEX_CACHE: dict[tuple, DataFrame] = {}


def _lsh_bucketed_corpus(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    cache_key: str | None,
) -> DataFrame:
    """The bucketed corpus for :func:`lsh_topk`, optionally cached per
    session. Without a key this is exactly the old inline
    ``bucketize(...)`` call; with one, the corpus-wide Arrow bucketing
    pass runs once per (corpus, geometry) instead of once per probe call
    (guide §2.4: an index is a shuffle/pass you stop repeating)."""
    if cache_key is None:
        return bucketize(embeddings, id_col, vec_col, planes)
    key = (
        embeddings.sparkSession.sparkContext.applicationId,
        cache_key,
        tuple(tuple(p) for p in planes),
        id_col,
        vec_col,
    )
    hit = _LSH_INDEX_CACHE.get(key)
    if hit is not None:
        return hit
    bucketed = bucketize(embeddings, id_col, vec_col, planes).persist()
    _LSH_INDEX_CACHE[key] = bucketed
    return bucketed


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    multiprobe: bool = False,
    index_cache_key: str | None = None,
) -> DataFrame:
    """Approximate cosine top-k: only candidates in the query's LSH bucket(s)
    are scored. Single-probe (same bucket) by default; ``multiprobe=True``
    additionally probes every bucket at Hamming distance 1 (one hyperplane
    sign flipped) — the classic multi-probe LSH recall lift at a fixed plane
    count. Implemented by EXPLODING the tiny query side into its probe
    buckets so the candidate join stays a broadcast equi-join on ``bucket``
    (each corpus vector has exactly one bucket, so probes never duplicate a
    candidate pair); the corpus side is untouched — at 100 TB the cost is
    (1 + n_planes)× more broadcast rows, not a corpus re-shuffle.

    ``planes=None`` auto-sizes the plane count from the corpus
    (:func:`auto_n_planes` — bucket space ≈ √N); pass explicit planes to
    pin geometry (the catalog's oracle arms do). ``index_cache_key``
    caches the bucketed corpus per session (the LSH index — a stored
    artifact in production), exactly as ``ivf_topk`` caches its index —
    and, like every ``*_topk`` here, the built plan itself
    (``_TOPK_PLAN_CACHE``; re-executed from parquet per action)."""
    pk = _plan_cache_key(
        embeddings, index_cache_key, "lsh_topk", k,
        None if planes is None else tuple(tuple(p) for p in planes),
        multiprobe, tuple(query_ids), id_col, vec_col,
    )
    if pk is not None and pk in _TOPK_PLAN_CACHE:
        return _TOPK_PLAN_CACHE[pk]
    planes = _resolve_planes(embeddings, planes)
    bucketed = _lsh_bucketed_corpus(embeddings, id_col, vec_col, planes,
                                    index_cache_key)
    probe_buckets = F.array(
        F.col("bucket"),
        *(
            [F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(len(planes))]
            if multiprobe
            else []
        ),
    )
    # probe side: filter the RAW corpus down to the |queries| rows FIRST
    # (an id-pruned parquet scan), then bucket just those rows — the old
    # shape filtered AFTER bucketize, and a filter cannot push through the
    # opaque mapInPandas node, so selecting 5 query rows cost a full
    # corpus-wide Python pass (guide §4.1: opaque functions defeat
    # pushdown — prune before the boundary). bucketize is a deterministic
    # per-row map, so the buckets are bit-identical either way.
    queries = bucketize(
        embeddings.filter(F.col(id_col).isin(query_ids)), id_col, vec_col, planes
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.explode(probe_buckets).alias("q_bucket"),
    )
    cands = bucketed.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = V.cosine("q_vec", "vec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    out = (
        cands.select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )
    if pk is not None:
        _TOPK_PLAN_CACHE[pk] = out
    return out


def kmeans_refine(
    sample: list[tuple[int, list[float]]],
    init: list[tuple[int, list[float]]],
    iters: int = V.KMEANS_ITERS,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's refinement, replayable bit-for-bit by the SQL
    twin (oracle_twins._ivf_assigned_cte unrolls the same fixed iterations):

      assignment  max cosine to current centroids, ties → larger cell id
                  (the same rule every IVF consumer here uses), cosine via
                  the exact cross-engine fold (:func:`~..functions.vectors.cos_py`);
      update      element-wise mean over members ordered by vec_id
                  ascending, 0.0-init sequential sum then one divide —
                  the twin's ``list_reduce(list_prepend(0.0, ...)) / len``;
      empty cell  keeps its previous centroid (twin: LEFT JOIN + coalesce).

    Cell ids stay the INIT vectors' ids throughout, so probe tie-breaking
    (``cell_id DESC``) is identical before and after training. Runs on the
    driver over the tiny hash-selected sample — at 100 TB quantizer
    training is a driver-side task over a bounded sample by design (the
    full corpus is only ever assigned map-side)."""
    cents = [(cid, [float(x) for x in cv]) for cid, cv in init]
    for _ in range(iters):
        members: dict[int, list[tuple[int, list[float]]]] = {c: [] for c, _ in cents}
        for vid, v in sample:
            # NaN cosine (zero-norm vector) → +inf: the same NaN-greatest
            # rule every assignment consumer applies (ties → larger cell)
            _best_cos, best_cid = max(
                (float("inf") if c != c else c, cid)
                for c, cid in ((V.cos_py(v, cv), cid) for cid, cv in cents)
            )
            members[best_cid].append((vid, v))
        nxt = []
        for cid, cv in cents:
            mem = sorted(members[cid], key=lambda t: t[0])
            if not mem:
                nxt.append((cid, cv))
                continue
            n = len(mem)
            mean = []
            for i in range(len(cv)):
                acc = 0.0
                for _vid, mv in mem:
                    acc = acc + mv[i]
                mean.append(acc / n)
            nxt.append((cid, mean))
        cents = nxt
    return cents


def ivf_centroids(
    embeddings: DataFrame,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = V.KMEANS_ITERS,
    n_train: int = V.KMEANS_TRAIN,
) -> list[tuple[int, list[float], float]]:
    """Deterministic coarse quantizer: k-means-TRAINED centroids seeded from
    the ``n_cells`` corpus vectors whose ids hash lowest under the
    cross-engine h60 primitive, refined by :func:`kmeans_refine` over the
    ``n_train`` hash-lowest vectors (one ordering serves both: the init set
    is the sample's prefix). ``train_iters=0`` degrades to the round-3
    hash-selected baseline. Returns ``(cell_id, vector, norm)`` rows; tiny
    (n_cells ≪ corpus), collected once per index build and broadcast as
    literals thereafter.

    Everything — sample selection, assignment ties, mean fold order, the
    baked-in norm — replays the exact IEEE operation sequence of the SQL
    twin, so trained centroids cannot drift from the oracle.

    ``n_cells=None`` auto-sizes from the corpus count (√N — see
    :func:`auto_n_cells`). Training is SKIPPED when ``n_cells >= n_train``:
    you cannot estimate more centroids than the bounded training sample
    holds (most cells would keep their init anyway), and the driver-side
    trainer is O(iters·n_train·n_cells·dim) — at auto geometry on a large
    corpus that guard is what keeps quantizer construction bounded. The
    twin generator applies the identical guard.
    """
    n_cells = _resolve_n_cells(embeddings, n_cells)
    if train_iters and n_cells >= n_train:
        train_iters = 0
    take = max(n_cells, n_train if train_iters else 0)
    rows = (
        embeddings.select(
            F.col(id_col).alias("cell_id"),
            F.col(vec_col).alias("cv"),
            TXT.h60(F.col(id_col).cast("string")).alias("hh"),
        )
        .orderBy("hh", "cell_id")
        .limit(take)
        .select("cell_id", "cv")
        .collect()
    )
    picked = [(int(r["cell_id"]), [float(x) for x in r["cv"]]) for r in rows]
    cents = picked[:n_cells]
    if train_iters:
        # the training sample is EXACTLY the n_train hash-lowest vectors —
        # never the init set when n_cells > n_train (the twin's s0 CTE
        # LIMITs n_train regardless of n_cells)
        cents = kmeans_refine(picked[:n_train], cents, train_iters)
    out = []
    for cid, v in cents:
        acc = 0.0
        for x in v:
            acc = acc + x * x
        out.append((cid, v, math.sqrt(acc)))
    return out


def _centroid_scores(vec_col, centroids, v_norm=None) -> F.Column:
    """array<struct<cos,cell>> of the cosine from ``vec_col`` to every
    centroid — a pure map-side expression (centroids ride the plan as
    literals; the corpus never shuffles to find its cell). Pass ``v_norm``
    (a column holding norm2 of the vector) to compute the vector's own norm
    once instead of once per centroid — same IEEE value, |centroids|× less
    fold work."""
    if v_norm is None:
        v_norm = V.norm2(vec_col)
    entries = []
    for cell_id, cvec, cnorm in centroids:
        lit_vec = F.array(*[F.lit(x) for x in cvec])
        cos = V.dot(vec_col, lit_vec) / (v_norm * F.lit(cnorm))
        entries.append(
            F.struct(
                cos.alias("cos"), F.lit(cell_id).cast("bigint").alias("cell")
            )
        )
    return F.array(*entries)


# (app_id, sf-or-caller key, geometry) → (centroids, persisted assigned
# corpus). An IVF index is a STORED artifact in production (built once,
# probed many times); this cache is the local stand-in, keyed by Spark app
# so a fresh driver session never sees another session's persisted plans.
# CONTRACT: cache_key must uniquely identify the corpus DATA, not just its
# column names — two different DataFrames sharing a cache_key would serve
# the first caller's index. Call clear_ivf_cache() to release the persisted
# corpus partitions (long-lived sessions building many indexes).
_IVF_INDEX_CACHE: dict[tuple, tuple] = {}

# (app_id, cache_key, fn-name, full arg signature) → the built top-k
# DataFrame PLAN. No rows are cached: the DataFrame re-executes from the
# parquet inputs on every action; what reuse saves is the ~1k generic
# DataFrame-API py4j round trips per arm of plan construction plus the
# JVM-side re-analysis of the identical tree (guide §7.3 — driver/plan
# work is wall time; VERDICT r11 item #2's "per-arm plan-builder reuse").
# Same lifecycle contract as the index caches: cache_key must uniquely
# identify the corpus DATA, entries die with the Spark app (applicationId
# in the key) and are evicted by clear_ivf_cache — plans built over a
# persisted index must not outlive the index's eviction.
_TOPK_PLAN_CACHE: dict[tuple, DataFrame] = {}


def _plan_cache_key(embeddings: DataFrame, index_cache_key, *parts):
    """Cache key for a built top-k plan, or None when the caller gave no
    index_cache_key (no data-identity contract → no reuse)."""
    if index_cache_key is None:
        return None
    return (
        embeddings.sparkSession.sparkContext.applicationId,
        index_cache_key,
        *parts,
    )


def clear_ivf_cache(cache_key: str | None = None) -> int:
    """Evict IVF (and LSH) index entries, unpersisting their cached corpus
    DataFrames. ``cache_key=None`` clears everything; otherwise only entries
    built under that key (any geometry). Returns the number of entries
    evicted."""
    doomed = [
        k
        for k in _IVF_INDEX_CACHE
        if cache_key is None or k[1] == cache_key
    ]
    for k in doomed:
        _centroids, _cdf, corpus = _IVF_INDEX_CACHE.pop(k)
        try:
            corpus.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    lsh_doomed = [
        k for k in _LSH_INDEX_CACHE if cache_key is None or k[1] == cache_key
    ]
    for k in lsh_doomed:
        bucketed = _LSH_INDEX_CACHE.pop(k)
        try:
            bucketed.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    # cached plans reference the just-unpersisted index frames — evict them
    # together (they hold no rows or persisted blocks themselves)
    for k in [
        k for k in _TOPK_PLAN_CACHE if cache_key is None or k[1] == cache_key
    ]:
        del _TOPK_PLAN_CACHE[k]
    return len(doomed) + len(lsh_doomed)


# above this many centroids, assignment uses the vectorized Arrow-batch
# pass instead of literal-embedded centroid expressions. Set to 0: the
# literal path's per-centroid cosine folds are higher-order functions and
# never enter whole-stage codegen, so even at the pinned 16 cells the
# expression form costs ~20 s per 600 k vectors of interpreted eval where
# the numpy pass (bit-identical, see _assign_cells_vectorized) is seconds.
# The expression path remains the SPEC, pinned by
# test_assign_cells_join_and_literal_paths_agree (which raises this knob
# to force it).
_LITERAL_ASSIGN_MAX = 0


def _assign_cells(
    embeddings: DataFrame, centroids, id_col: str, vec_col: str,
    fast: bool = False,
) -> DataFrame:
    """(neighbor_id, n_vec, _vn, cell) — assignment of every vector to its
    nearest centroid (max cos, ties → max cell, mirroring the twin's
    ``ORDER BY cos DESC, cell_id DESC``). THE shared contract between index
    build and append: both paths assign through this one expression, so
    stored and appended vectors can never diverge. The norm is kept so the
    probe's exact cosine later pays ONE fold (the dot) per candidate
    instead of three (dot + two norms).

    Two physical shapes, one semantic (both compute the identical IEEE
    ``dot / (vn · cnorm)`` fold, so results are bit-equal):

      * ≤ :data:`_LITERAL_ASSIGN_MAX` centroids: map-only ``array_max``
        over literal-centroid cosines — the expression SPEC, kept for the
        parity pin (interpreted HOF folds make it ~10× the vectorized
        pass, so the knob defaults to 0);
      * otherwise (the default at ANY geometry): one vectorized
        Arrow-batch pass (:func:`_assign_cells_vectorized`) — map-only,
        no shuffle, plan O(1)-sized however many cells the corpus
        demands, and the N×cells×dim arithmetic runs as float64 vector
        math instead of per-element interpreted eval.

    ``fast=True`` is the SCALE mode (see :func:`_assign_cells_vectorized`):
    one blocked BLAS matmul per Arrow batch instead of the parity-pinned
    per-dimension fold — reassociates the IEEE sum. Checked two ways: the
    :func:`ivf_fast_agreement` witness (≥99.9% assignment-agreement floor,
    pinned by ``test_ivf_fast_assignment_agreement``), and the catalog's
    ``ann_recall`` ``ivf_fast`` arm, which DELIBERATELY holds the stricter
    rows+hash bar against the parity-IVF SQL twin — at driver SFs zero of
    2000 vectors sit within reassociation distance of a cell boundary, so
    exact equality is the expected outcome there. If a future SF ever
    trips it on a legitimate reassociation tie, the procedure is: confirm
    via the agreement witness (≥0.999), then regenerate that arm's pinned
    expectation — do NOT loosen the hash for the SFs where exactness
    holds. At 10⁹ vectors the parity fold alone is not a shippable index
    build (O(N·√N·d) at ~200 GFLOP/s ceiling — ANN_ATTRIBUTION_SF100);
    BLAS recovers the 10-50× a dgemm has over strided numpy loops.
    """
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        V.norm2(vec_col).alias("_vn"),
    )
    if not fast and len(centroids) <= _LITERAL_ASSIGN_MAX:
        return base.select(
            "neighbor_id",
            "n_vec",
            "_vn",
            F.array_max(_centroid_scores(F.col("n_vec"), centroids, F.col("_vn")))
            .getField("cell")
            .alias("cell"),
        )
    return _assign_cells_vectorized(base, centroids, fast=fast)


def _assign_cells_vectorized(
    base: DataFrame, centroids, fast: bool = False
) -> DataFrame:
    """Auto-geometry assignment (√N cells): one Arrow-batched numpy
    matmul-shaped pass instead of N×cells interpreted expression folds.

    Every ``F.aggregate``/``zip_with`` fold evaluates interpreted (no
    whole-stage codegen for higher-order functions), so the broadcast-join
    form of this assignment — N·cells cosine folds — measured 1379.7 s for
    600 k vectors × 775 cells at sf30 (ANN_ATTRIBUTION_SF30 ivf_auto_cold)
    while the same flops are <1 s of vectorized float64. This is exactly
    the case the repo's UDF discipline reserves mapInPandas for: built-in
    operators CAN express the semantics but not the arithmetic intensity.

    Bit-parity with the expression/twin fold is preserved, not assumed:
    the accumulation loops dim-by-dim (acc = acc + a_d·c_d), the exact
    IEEE sequence of :func:`vectors.dot`'s 0.0-init left fold, then one
    divide by the same (vn·cnorm) product — pinned by
    ``test_assign_cells_vectorized_equals_literal`` against the literal
    expression path (the spec both physical shapes must match, and the
    one the DuckDB twin hash-proves). Ties → max cell (the twin's ORDER BY cos DESC,
    cell DESC) via last-argmax over cell-ascending columns; NaN maps to
    +inf first (Spark orders NaN greatest; a NaN cosine needs a zero-norm
    vector, where every cell's score degenerates together)."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    order = sorted(centroids, key=lambda t: int(t[0]))
    cmat = np.asarray([t[1] for t in order], dtype=np.float64)  # (cells, d)
    cnorm = np.asarray([t[2] for t in order], dtype=np.float64)
    cids = np.asarray([int(t[0]) for t in order], dtype=np.int64)
    out_schema = StructType(
        list(base.schema.fields) + [StructField("cell", LongType())]
    )

    dim = cmat.shape[1]

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            out["cell"] = _batch_cells(
                list(pdf["n_vec"]), pdf["_vn"].to_numpy(dtype=np.float64),
                cmat, cnorm, cids, dim, fast,
            )
            yield out

    return base.mapInPandas(assign, schema=out_schema)


def _batch_cells(vecs, vn_all, cmat, cnorm, cids, dim, fast):
    """The per-Arrow-batch assignment kernel shared by
    :func:`_assign_cells_vectorized` (both modes) and
    :func:`ivf_fast_agreement` (which runs BOTH modes over the same batch
    in one pass). Returns an int64 cell array aligned with ``vecs``."""
    import numpy as np

    # a row whose vector length ≠ centroid dim gets every cosine
    # NULL under the expression spec (zip_with pads the shorter
    # array with nulls, the fold propagates) and the struct-max
    # tie then falls through to the MAX cell — replicate that so
    # e.g. append_to_ivf_index's dim guard can still materialize
    # the assignment and refuse cleanly
    ok = np.asarray(
        [v is not None and len(v) == dim for v in vecs], dtype=bool
    )
    cells = np.full(len(vecs), cids[-1], dtype=np.int64)
    if ok.any():
        a = np.asarray(
            [np.asarray(vecs[i], dtype=np.float64)
             for i in np.nonzero(ok)[0]],
            dtype=np.float64,
        )
        vn = vn_all[ok]
        if fast:
            # SCALE mode: one BLAS dgemm — reassociates the IEEE
            # sum (agreement-checked, not hash-checked)
            acc = a @ cmat.T
        else:
            acc = np.zeros((a.shape[0], cmat.shape[0]), dtype=np.float64)
            for d in range(dim):
                acc = acc + a[:, d : d + 1] * cmat[None, :, d]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = acc / (vn[:, None] * cnorm[None, :])
        cos[np.isnan(cos)] = np.inf
        best = cos.shape[1] - 1 - np.argmax(cos[:, ::-1], axis=1)
        cells[ok] = cids[best]
    return cells


def ivf_fast_agreement(
    embeddings: DataFrame,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_agreement: float = 0.999,
    train_iters: int = V.KMEANS_ITERS,
) -> DataFrame:
    """The FAST index build's correctness witness: one map-only Arrow pass
    computes BOTH the parity-pinned per-dim assignment and the BLAS
    assignment over the same batches (same trained centroids — training
    is mode-independent) and counts agreements. Returns ONE row
    ``(n_vectors, n_agree, agreement_ok)`` where ``agreement_ok`` asserts
    ``n_agree ≥ ceil(min_agreement · n_vectors)``.

    This is the oracle shape the bit-parity hash can't provide for a
    reassociated sum: disagreement is only possible where two cells'
    cosines are within float-reassociation distance (ties), which trained
    well-separated centroids make vanishingly rare — measured 100%
    agreement on the driver fixtures. Map-only: no join, no shuffle
    before the single-row aggregate."""
    import numpy as np

    n_cells = _resolve_n_cells(embeddings, n_cells)
    centroids = ivf_centroids(embeddings, n_cells, id_col, vec_col, train_iters)
    order = sorted(centroids, key=lambda t: int(t[0]))
    cmat = np.asarray([t[1] for t in order], dtype=np.float64)
    cnorm = np.asarray([t[2] for t in order], dtype=np.float64)
    cids = np.asarray([int(t[0]) for t in order], dtype=np.int64)
    dim = cmat.shape[1]
    base = embeddings.select(
        F.col(vec_col).alias("n_vec"), V.norm2(vec_col).alias("_vn")
    )

    def compare(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = list(pdf["n_vec"])
            vn = pdf["_vn"].to_numpy(dtype=np.float64)
            parity = _batch_cells(vecs, vn, cmat, cnorm, cids, dim, False)
            fast = _batch_cells(vecs, vn, cmat, cnorm, cids, dim, True)
            yield pd.DataFrame(
                {"n": [len(vecs)], "agree": [int((parity == fast).sum())]}
            )

    stats = base.mapInPandas(compare, "n bigint, agree bigint").agg(
        F.sum("n").alias("n_vectors"), F.sum("agree").alias("n_agree")
    )
    return stats.select(
        "n_vectors",
        "n_agree",
        (
            F.col("n_agree")
            >= F.ceil(F.lit(min_agreement) * F.col("n_vectors")).cast("long")
        ).alias("agreement_ok"),
    )


def ivf_index(
    embeddings: DataFrame,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
    train_iters: int = V.KMEANS_ITERS,
    fast: bool = False,
):
    """Build (or fetch) the IVF index: the centroid list plus the corpus
    with its assigned cell (max cos, ties → max cell — mirrored by the
    twin's ``ORDER BY cos DESC, cell_id DESC``; see :func:`_assign_cells`
    for the two physical shapes). ``n_cells=None`` auto-sizes √N from the
    corpus count. ``fast=True`` builds with the BLAS assignment (the
    scale mode — agreement-checked against the parity build, not
    hash-pinned; centroid TRAINING is identical in both modes)."""
    n_cells = _resolve_n_cells(embeddings, n_cells)
    key = None
    if cache_key is not None:
        # the full geometry + column identity is part of the key — two
        # callers sharing a cache_key but reading different columns must
        # never see each other's index
        key = (
            embeddings.sparkSession.sparkContext.applicationId,
            cache_key,
            n_cells,
            id_col,
            vec_col,
            train_iters,
            fast,
        )
        hit = _IVF_INDEX_CACHE.get(key)
        if hit is not None:
            return hit
    centroids = ivf_centroids(embeddings, n_cells, id_col, vec_col, train_iters)
    corpus = _assign_cells(embeddings, centroids, id_col, vec_col, fast=fast)
    # centroid table for the probe side: ranking 16 rows via a broadcast
    # join keeps the probe PLAN small — embedding the centroids as literal
    # arrays instead costs ~1.5 s of Catalyst compile per query (the giant
    # literal tree is re-analyzed on every call; the index build pays it
    # exactly once, where map-only assignment is worth it). One python
    # slice: every probe's broadcast build evaluates this frame
    # (materialize.driver_df — 32 slices cost ~0.7 s per evaluation).
    from ..materialize import driver_df

    cdf = driver_df(
        embeddings.sparkSession,
        [(cid, cv, cn) for cid, cv, cn in centroids],
        "cell_id bigint, cv array<double>, cnorm double",
    )
    if key is not None:
        corpus = corpus.persist()
        _IVF_INDEX_CACHE[key] = (centroids, cdf, corpus)
    return centroids, cdf, corpus


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int | None = None,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_cache_key: str | None = None,
    train_iters: int = V.KMEANS_ITERS,
    fast: bool = False,
) -> DataFrame:
    """IVF-flat approximate top-k.

    Plan shape (the one that survives 100 TB):
      1. index build — see :func:`ivf_index`; amortized across queries via
         ``index_cache_key`` (a stored table in production);
      2. probe — each query ranks the same literal centroids and keeps
         ``nprobe`` cells (map-only on a tiny side), then broadcast-joins
         the corpus on ``cell``: candidates shrink by ~nprobe/n_cells;
      3. exact cosine + per-query top-k window over candidates only.

    ``n_cells=None`` → √N auto-sizing; ``nprobe=None`` → ⌊√n_cells⌋.
    ``fast=True`` probes an index built with the BLAS assignment (the
    scale mode — :func:`ivf_fast_agreement` is its witness); probe-side
    scoring is identical in both modes.

    With ``index_cache_key`` the BUILT PLAN is session-cached on the raw
    argument signature (``_TOPK_PLAN_CACHE``) — a repeat call returns the
    identical DataFrame, re-executed from parquet on every action. Keying
    on the RAW ``n_cells``/``nprobe`` also skips the auto-geometry count
    job on the warm path (the count is a pure function of the corpus the
    cache_key identifies).
    """
    pk = _plan_cache_key(
        embeddings, index_cache_key, "ivf_topk", k, n_cells, nprobe,
        tuple(query_ids), id_col, vec_col, train_iters, fast,
    )
    if pk is not None and pk in _TOPK_PLAN_CACHE:
        return _TOPK_PLAN_CACHE[pk]
    n_cells = _resolve_n_cells(embeddings, n_cells)
    if nprobe is None:
        nprobe = auto_nprobe(n_cells)
    _centroids, cdf, corpus = ivf_index(
        embeddings, n_cells, id_col, vec_col, cache_key=index_cache_key,
        train_iters=train_iters, fast=fast,
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        V.norm2(vec_col).alias("_qn"),
    )
    # rank the 16 centroids per query via a broadcast nested-loop join over
    # the tiny centroid table (|q|×n_cells rows — intentional cross product)
    probe_cos = V.dot("q_vec", "cv") / (F.col("_qn") * F.col("cnorm"))
    pw = Window.partitionBy("query_id").orderBy(
        F.desc("probe_cos"), F.desc("cell_id")
    )
    probed = (
        queries.crossJoin(F.broadcast(cdf))
        .select("query_id", "q_vec", "_qn", "cell_id", probe_cos.alias("probe_cos"))
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "q_vec", "_qn", F.col("cell_id").alias("cell"))
    )
    cands = corpus.join(F.broadcast(probed), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # same IEEE ops as V.cosine / the twin's _cos: dot / (sqrt·sqrt product),
    # with both sqrt factors precomputed once per row instead of per pair
    sim = V.dot("q_vec", "n_vec") / (F.col("_qn") * F.col("_vn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    out = (
        cands.select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )
    if pk is not None:
        _TOPK_PLAN_CACHE[pk] = out
    return out


# single source of truth for the stored-index layout — consumers (the
# streaming sink's id gate, external tooling) must not re-hardcode it
IVF_CORPUS_SUBDIR = "corpus"
IVF_ID_COLUMN = "neighbor_id"


def stored_index_ids(spark, path: str) -> DataFrame:
    """The id column of a stored IVF index's corpus — a column-pruned scan
    (parquet reads just the id pages), for gating appends."""
    return spark.read.parquet(f"{path}/{IVF_CORPUS_SUBDIR}").select(IVF_ID_COLUMN)


def save_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fast: bool = False,
) -> None:
    """Persist the IVF index as a storage artifact — the production shape
    of "build once, probe for months" (the session cache in
    :data:`_IVF_INDEX_CACHE` is the local stand-in; this is the real
    thing). Layout under ``path``:

      centroids/   (cell_id, cv, cnorm) — the tiny coarse quantizer
      corpus/      (neighbor_id, n_vec, _vn) **partitioned by cell**
      meta/        one row of geometry for load-time validation

    Partitioning the corpus by cell is the point: a probe touching
    ``nprobe`` of ``n_cells`` cells reads only those directories (Spark's
    dynamic partition pruning turns the broadcast probe join into a
    partition filter), so serving cost is ~nprobe/n_cells of the corpus —
    sub-linear scans with zero custom index code.

    ``n_cells=None`` (the default) auto-sizes √N from the corpus count —
    a stored artifact should be built at corpus-derived geometry unless
    the caller pins one deliberately.

    ``fast=True`` builds the stored artifact with the BLAS assignment —
    the shippable path for production-size corpora. The ASSIGNMENT keeps
    the session build's measured 6–8× (ANN_ATTRIBUTION_SF30/SF100:
    session auto-geometry build 316.7→38.4 s at 2 M vectors); the stored
    END-TO-END build measures ~2.5× because the artifact write
    (cell-partitioned parquet, one file per cell) is mode-independent
    and dominates once assignment is fast. Centroid training is
    mode-independent, so the artifact layout, geometry and probe plans
    are identical; only the cell assignment's IEEE summation order
    differs (witnessed by :func:`ivf_fast_agreement`, and pinned
    stored-fast ≡ stored-parity at driver SFs by
    ``test_stored_index_fast_build_matches_parity``).
    """
    n_cells = _resolve_n_cells(embeddings, n_cells)
    centroids, cdf, corpus = ivf_index(
        embeddings, n_cells, id_col, vec_col, fast=fast
    )
    cdf.write.mode("overwrite").parquet(f"{path}/centroids")
    # shuffle each cell's rows into ONE task before the partitioned write:
    # without this every task writes a file into every cell dir it sees —
    # tasks × √N-cells files (measured: the stored-artifact write was the
    # dominant build cost at 2 M vectors, ANN_ATTRIBUTION_SF100 r11).
    # After: one right-sized file per cell — fewer footers for the pruned
    # probe reads too.
    (
        corpus.repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/{IVF_CORPUS_SUBDIR}")
    )
    dim = len(centroids[0][1]) if centroids else 0
    embeddings.sparkSession.createDataFrame(
        [(n_cells, id_col, vec_col, dim)],
        "n_cells int, id_col string, vec_col string, dim int",
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_ivf_index(spark, path: str, n_cells: int | None = None):
    """Load a :func:`save_ivf_index` artifact → the same (centroids, cdf,
    corpus) triple :func:`ivf_index` returns. The stored geometry is
    validated: ``n_cells`` against the caller's expectation (``None`` =
    accept whatever geometry the artifact was built at — the normal case
    now that builds auto-size) and the centroid dimensionality against the
    meta (``id_col``/``vec_col`` in meta are provenance only — the
    artifact's own column names are fixed)."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    if n_cells is not None and meta["n_cells"] != n_cells:
        raise ValueError(
            f"index at {path} was built with n_cells={meta['n_cells']}, "
            f"caller expects {n_cells}"
        )
    cdf = spark.read.parquet(f"{path}/centroids")
    corpus = spark.read.parquet(f"{path}/{IVF_CORPUS_SUBDIR}")
    centroids = _centroids_from_cdf(cdf)
    if centroids and len(centroids[0][1]) != meta["dim"]:
        raise ValueError(
            f"index at {path} stores dim={meta['dim']} but centroids have "
            f"dim={len(centroids[0][1])} — artifact is corrupt"
        )
    return centroids, cdf, corpus


def _centroids_from_cdf(cdf: DataFrame):
    return [
        (int(r["cell_id"]), [float(x) for x in r["cv"]], float(r["cnorm"]))
        for r in cdf.orderBy("cell_id").collect()
    ]


def append_to_ivf_index(
    new_embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scratch_dir: str | None = None,
    fast: bool = False,
) -> int:
    """Index freshness without a rebuild — the IVF maintenance path every
    serving system needs: assign the new vectors to the STORED centroids
    (the same :func:`_assign_cells` dispatch as the index build — stored
    and appended assignments cannot diverge) and append them to the
    cell-partitioned corpus. Assignment is the map-only vectorized
    Arrow-batch pass at any geometry (see :func:`_assign_cells`) — no
    corpus shuffle, but a streaming sink appending every micro-batch
    should budget the per-batch Arrow transfer (size the trigger so batches
    amortize it). Centroids stay fixed, so existing cell assignments,
    stored files, and in-flight probes are untouched; the classic
    operational rule applies — rebuild (re-quantize) only when drift makes
    cell sizes skew enough to hurt recall.

    Returns the number of vectors appended. Id uniqueness is the caller's
    contract (pair with the dedup gate / MERGE upstream — e.g. gate the
    embedding stream exactly like ``streaming.corpus_stream`` gates text).

    ``fast=True`` assigns the appended batch with the BLAS kernel (same
    scale mode as the fast build — the agreement witness generalizes to
    appended batches since assignment is the same shared expression).
    """
    from ..materialize import storage_checkpoint

    spark = new_embeddings.sparkSession
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    centroids = _centroids_from_cdf(spark.read.parquet(f"{path}/centroids"))
    dim = int(meta["dim"])
    # materialize ONCE: the dim guard, the returned count, and the write
    # must all see the same rows (a live/nondeterministic source could
    # otherwise slip a bad row in between guard and write)
    # scratch_dir: repeated callers (a streaming sink appending every
    # micro-batch) pass a REUSED location so each batch does not leak a
    # process-lifetime temp dir holding a full copy of the batch
    assigned = storage_checkpoint(
        _assign_cells(new_embeddings, centroids, id_col, vec_col, fast=fast),
        path=scratch_dir,
    )
    if dim:
        bad = assigned.filter(F.size("n_vec") != dim).count()
        if bad:
            raise ValueError(
                f"{bad} vector(s) have dim != {dim}; refusing to append"
            )
    n = assigned.count()
    # same one-file-per-touched-cell discipline as the initial build
    (
        assigned.repartition(F.col("cell"))
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path}/{IVF_CORPUS_SUBDIR}")
    )
    return n


def ivf_topk_stored(
    spark,
    path: str,
    query_ids: list[int],
    k: int = 5,
    n_cells: int | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """Serve approximate top-k straight from a stored IVF index — no
    original embedding table needed (query vectors are fetched from the
    index corpus by id; external query vectors would join the same way).
    The candidate join keys on ``cell``, which is the artifact's partition
    column, so the corpus scan prunes to the probed cells.

    ``n_cells=None`` accepts the artifact's stored geometry; ``nprobe=None``
    derives ⌊√n_cells⌋ from it."""
    _centroids, cdf, corpus = load_ivf_index(spark, path, n_cells)
    if nprobe is None:
        nprobe = auto_nprobe(len(_centroids) or 1)
    queries = corpus.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"),
        F.col("n_vec").alias("q_vec"),
        F.col("_vn").alias("_qn"),
    )
    probe_cos = V.dot("q_vec", "cv") / (F.col("_qn") * F.col("cnorm"))
    pw = Window.partitionBy("query_id").orderBy(F.desc("probe_cos"), F.desc("cell_id"))
    probed = (
        queries.crossJoin(F.broadcast(cdf))
        .select("query_id", "q_vec", "_qn", "cell_id", probe_cos.alias("probe_cos"))
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "q_vec", "_qn", F.col("cell_id").alias("cell"))
    )
    cands = corpus.join(F.broadcast(probed), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = V.dot("q_vec", "n_vec") / (F.col("_qn") * F.col("_vn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        cands.select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def recall_vs_exact(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against the exact
    one, as an exact integer permille (hits × 1000 div k — cross-engine
    hashable, no floats). Built FROM the exact side (always k rows per
    query), so a query the approximate method missed entirely still yields
    a 0‰ row instead of vanishing. Both inputs are tiny top-k outputs —
    the join is a broadcast on (query_id, neighbor_id)."""
    hits = approx.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1))
    j = exact.select("query_id", "neighbor_id").join(
        F.broadcast(hits), ["query_id", "neighbor_id"], "left"
    )
    return (
        j.groupBy("query_id")
        .agg(
            F.expr(f"CAST((coalesce(sum(__hit), 0) * 1000) DIV {int(k)} AS BIGINT)").alias(
                "recall_x1000"
            )
        )
        .orderBy("query_id")
    )


def _max_group_rows() -> int:
    """Per-pandas-group row cap for the pairwise-scoring passes — the
    memory bound under cell/bucket skew (env SPARK_GRAFT_MAX_CELL_ROWS).
    100k rows × 64 float64 dims ≈ 51 MB of vectors per task plus the
    blocked score matrices — comfortably inside an executor slot."""
    import os

    return int(os.environ.get("SPARK_GRAFT_MAX_CELL_ROWS", "100000"))


def _salted_pair_tasks(
    df: DataFrame, group_col: str, id_col: str, cap: int,
    total_rows: int | None = None,
):
    """Exact cross-split of oversized groups for pairwise scoring.

    A group with n ≤ cap rows stays one task. A skewed group splits into
    k = ⌈n/cap⌉ hash salts, and every unordered salt pair (ti ≤ tj)
    becomes a task holding the union of the two salts' rows — each row
    replicated into its k tasks. Every within-group PAIR lands in exactly
    one task (the sorted pair of its endpoints' salts), so scoring tasks
    independently and unioning is pair-for-pair identical to scoring the
    whole group at once — same threshold, same IEEE cosine — while no
    task ever holds more than ~2·cap rows (the skew memory bound the r8
    verdict asked to pin).

    Returns df with ``_s`` (row salt), ``_ti``/``_tj`` (task id) — group
    the result by (group_col, _ti, _tj); scoring masks pairs to
    (min(sa,sb), max(sa,sb)) == (ti, tj) so replicas never double-count.

    ``total_rows`` (when the caller already counted for auto-geometry)
    short-circuits the machinery: a corpus of ≤ cap rows cannot hold an
    oversized group, so the counts join + explode (a fixed ~0.4 s at
    bench scale) is skipped and every row is its own single task."""
    if total_rows is not None and total_rows <= cap:
        return (
            df.withColumn("_s", F.lit(0))
            .withColumn("_ti", F.lit(0))
            .withColumn("_tj", F.lit(0))
        )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    df = df.join(F.broadcast(counts), group_col)
    k = F.greatest(F.lit(1), F.ceil(F.col("_n") / F.lit(cap))).cast("int")
    df = df.withColumn("_k", k).withColumn(
        "_s", F.pmod(F.xxhash64(F.col(id_col)), F.col("_k")).cast("int")
    )
    tasks = df.withColumn(
        "_t", F.explode(F.sequence(F.lit(0), F.col("_k") - 1))
    )
    return (
        tasks.withColumn("_ti", F.least("_s", "_t"))
        .withColumn("_tj", F.greatest("_s", "_t"))
        .drop("_t", "_k", "_n")
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
    compare); cosine itself stays internal.

    Within-bucket pair scoring runs as one vectorized pass per bucket
    (applyInPandas, the same shape as :func:`semantic_dedup`'s per-cell
    pass): the corpus shuffles ONCE on the bucket id and pairs never
    exist as rows — the earlier bucket self-join materialized |bucket|²
    pair rows carrying both vectors and scored each with an interpreted
    cosine fold. The numpy block replays :func:`vectors.cosine`'s exact
    IEEE sequence (per-dim left-fold dot and norms, norm(a)·norm(b) then
    one divide), so survivors are bit-identical to the expression form
    (the emb_neardup_pairs oracle hash-proves it end-to-end).

    ``planes=None`` auto-sizes the plane count so the bucket space tracks
    √N (:func:`auto_n_planes`) — expected bucket occupancy O(√N), pair work
    ~linear; a pinned plane count is the measured quadratic failure mode."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    n_total = embeddings.count()  # drives auto-geometry AND the skew cap
    if planes is None:
        planes = hyperplanes(n=auto_n_planes(n_total))
    bucketed = _salted_pair_tasks(
        bucketize(embeddings, id_col, vec_col, planes),
        "bucket",
        "vec_id",
        _max_group_rows(),
        total_rows=n_total,
    )
    threshold_f = float(threshold)
    out_schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )

    def bucket_pairs(pdf):
        import pandas as pd

        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        if ids.size < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}, dtype="int64")
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        salts = pdf["_s"].to_numpy(dtype=np.int64)[order]
        ti = int(pdf["_ti"].iloc[0])
        tj = int(pdf["_tj"].iloc[0])
        a = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["vec"].iloc[order]],
            dtype=np.float64,
        )
        n = ids.size
        # norm2 = sqrt of the 0.0-init per-dim square fold
        acc = np.zeros(n, dtype=np.float64)
        for d in range(a.shape[1]):
            acc = acc + a[:, d] * a[:, d]
        vn = np.sqrt(acc)
        ia, ib = [], []
        block = max(64, 4_000_000 // n)
        for s in range(0, n, block):
            e = min(s + block, n)
            dot = np.zeros((e - s, n), dtype=np.float64)
            for d in range(a.shape[1]):
                dot = dot + a[s:e, d : d + 1] * a[None, :, d]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / (vn[s:e, None] * vn[None, :])
            # NaN (zero-norm pair) → +inf: the retained Spark expression
            # orders NaN greatest, so `cosine >= threshold` PASSES for
            # zero-norm vectors — same substitution as brute_force_topk
            # and _assign_cells_vectorized (bit-parity with the spec form)
            cos = np.where(np.isnan(cos), np.inf, cos)
            hit = (cos >= threshold_f) & (
                np.arange(n)[None, :] > np.arange(s, e)[:, None]
            )
            # a pair belongs to exactly ONE task — the sorted pair of its
            # endpoints' salts; masking here keeps replicated rows from
            # double-counting pairs across the group's salt tasks
            sp = np.minimum(salts[s:e, None], salts[None, :])
            sq = np.maximum(salts[s:e, None], salts[None, :])
            hit &= (sp == ti) & (sq == tj)
            r, c = np.nonzero(hit)
            ia.append(ids[s:e][r])
            ib.append(ids[c])
        return pd.DataFrame(
            {"id_a": np.concatenate(ia) if ia else np.asarray([], dtype=np.int64),
             "id_b": np.concatenate(ib) if ib else np.asarray([], dtype=np.int64)}
        )

    # explicit repartition on the group key: AQE coalesces shuffle
    # partitions by input BYTES, but per-group work here is quadratic in
    # rows — letting AQE pack many buckets onto a few tasks serializes
    # the O(|bucket|²) scoring (r7 lesson, reinstated after the r8 rewrite
    # dropped it)
    return (
        bucketed.repartition(min(2 ** len(planes), 256), "bucket", "_ti", "_tj")
        .groupBy("bucket", "_ti", "_tj")
        .applyInPandas(bucket_pairs, schema=out_schema)
        .orderBy("id_a", "id_b")
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_cache_key: str | None = None,
    train_iters: int = V.KMEANS_ITERS,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023): cluster
    the corpus with the coarse quantizer, then look for near-duplicate
    pairs only WITHIN a cluster — the cells bound the quadratic pairwise
    cost, turning all-pairs O(n²) into Σ O(|cell|²) with |cell| ≈ n/k.

    Output: one row per duplicate — (dup_id, keep_id) where keep_id is the
    smallest same-cell partner with cosine ≥ threshold (the canonical
    survivor). A vector with no smaller-id partner above threshold is not
    a duplicate and emits nothing.

    Reuses the IVF index (trained centroids, map-only assignment,
    optionally cached via ``index_cache_key``), so at 100 TB the cluster
    assignment is amortized across dedup + ANN: one stored artifact, two
    consumers. The corpus shuffles ONCE on the cell id into a per-cell
    vectorized scoring pass (see the body) — pairs never exist as rows,
    where the earlier self-join shipped |cell|² pair rows each carrying
    both vectors through the exchange and scored them with interpreted
    cosine folds (the measured sf1 failure mode was ~12M materialized
    pairs; the r8 attribution showed interpreted folds cost ~1000× the
    equivalent float64 vector math).

    ``n_cells=None`` (the default) derives √N geometry from the corpus
    count (:func:`auto_n_cells`) — THE scale knob: at a fixed cell count
    the within-cell pair work grows quadratically with the corpus (the
    measured sf1 regression: ~75× wall for 10× data at n_cells=16), while
    √N cells keep it ~linear. Pass an explicit ``n_cells`` to pin geometry
    (the catalog's pinned oracle arm does).
    """
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    n_total = embeddings.count()  # drives auto-geometry AND the skew cap
    n_cells = int(n_cells) if n_cells is not None else auto_n_cells(n_total)
    _centroids, _cdf, corpus = ivf_index(
        embeddings, n_cells, id_col, vec_col, cache_key=index_cache_key,
        train_iters=train_iters,
    )
    # Within-cell pair scoring as ONE vectorized pass per cell
    # (applyInPandas): the corpus shuffles ONCE on the cell id and the
    # pairs never exist as rows — the previous self-join materialized
    # |cell|² pair rows each carrying BOTH vectors through the exchange
    # (the dominant shuffle at scale) and scored each with an interpreted
    # cosine fold. Here each task computes its cell's cosine block
    # G = Nv·Nvᵀ in float64 with the exact IEEE fold sequence of
    # vectors.dot (per-dim left accumulation; norms precomputed by the
    # index build; a_n·b_n then one divide — multiply commutes
    # bit-exactly), in row blocks bounded to ~4M matrix entries so a
    # skewed cell never holds |cell|² doubles at once. Only qualifying
    # (dup, min-keep) rows leave the task. The emb_semantic_dedup oracle
    # hash-proves the rewrite end-to-end at sf0.01.
    threshold_f = float(threshold)
    out_schema = StructType(
        [StructField("dup_id", LongType()), StructField("keep_id", LongType())]
    )

    def cell_pairs(pdf):
        import pandas as pd

        ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        if ids.size < 2:
            return pd.DataFrame({"dup_id": [], "keep_id": []}, dtype="int64")
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        salts = pdf["_s"].to_numpy(dtype=np.int64)[order]
        ti = int(pdf["_ti"].iloc[0])
        tj = int(pdf["_tj"].iloc[0])
        a = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["n_vec"].iloc[order]],
            dtype=np.float64,
        )
        vn = pdf["_vn"].to_numpy(dtype=np.float64)[order]
        n = ids.size
        dup, keep = [], []
        block = max(64, 4_000_000 // n)
        for s in range(0, n, block):
            e = min(s + block, n)
            acc = np.zeros((e - s, n), dtype=np.float64)
            for d in range(a.shape[1]):
                acc = acc + a[s:e, d : d + 1] * a[None, :, d]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = acc / (vn[s:e, None] * vn[None, :])
            # NaN (zero-norm pair) → +inf, matching the retained Spark
            # expression's NaN-greatest ordering (see bucket_pairs)
            cos = np.where(np.isnan(cos), np.inf, cos)
            # keep candidates are the SMALLER ids: rows are id-sorted, so
            # for dup j the candidates are columns strictly left of j's
            # global position; emit per-dup the FIRST (= min-id) match
            # within THIS salt task — the final min over tasks is taken
            # by the groupBy(dup_id).min(keep_id) downstream, so the
            # salt split changes memory shape, never the answer
            hit = (cos >= threshold_f) & (
                np.arange(n)[None, :] < np.arange(s, e)[:, None]
            )
            sp = np.minimum(salts[s:e, None], salts[None, :])
            sq = np.maximum(salts[s:e, None], salts[None, :])
            hit &= (sp == ti) & (sq == tj)
            anyrow = hit.any(axis=1)
            first = np.argmax(hit, axis=1)
            dup.append(ids[s:e][anyrow])
            keep.append(ids[first[anyrow]])
        return pd.DataFrame(
            {"dup_id": np.concatenate(dup) if dup else np.asarray([], dtype=np.int64),
             "keep_id": np.concatenate(keep) if keep else np.asarray([], dtype=np.int64)}
        )

    # explicit repartition on the task key: AQE coalesces by bytes while
    # per-task work is quadratic — keep tasks spread across cores
    tasks = _salted_pair_tasks(
        corpus, "cell", "neighbor_id", _max_group_rows(), total_rows=n_total
    )
    return (
        tasks.repartition(min(n_cells, 1024), "cell", "_ti", "_tj")
        .groupBy("cell", "_ti", "_tj")
        .applyInPandas(cell_pairs, schema=out_schema)
        # a dup present in several salt tasks reports one min-id keep per
        # task; the global answer is the min over them — identical to the
        # unsplit per-cell scan
        .groupBy("dup_id")
        .agg(F.min("keep_id").alias("keep_id"))
        .orderBy("dup_id")
    )


# --- product quantization (PQ) -----------------------------------------------
# The memory-side half of the FAISS-standard IVF+PQ recipe: compress each
# vector to M sub-quantizer codes (here 8 codes over 8-dim subspaces, 16
# codewords each → 8 small ints replace 64 floats) and score queries with
# asymmetric distance computation (ADC): the query precomputes a
# (M × codewords) distance table once, and every corpus candidate costs M
# table lookups instead of a full-dimension fold. At 100 TB the codes
# table is ~60× smaller than the raw vectors — it fits where the vectors
# don't, which is the whole point.
#
# Everything is deterministic and cross-engine (the repo discipline):
# codewords are k-means-trained per subspace from a PQ-salted hash-selected
# init + sample with a FIXED iteration count (the SQL twin unrolls the same
# iterations — no opaque k-means state, the training is replayable),
# vectors are L2-normalized first (then squared-L2 ordering ≡ cosine
# ordering, so PQ ranks live in the same geometry as every other ANN path
# here), and every float fold runs in the same sequential order as the SQL
# twin.

PQ_M = 8        # subspaces
PQ_SUB = 8      # dims per subspace (M × SUB = 64)
PQ_KC = 16      # codewords per subspace


def _pq_normalize_py(vec) -> list[float]:
    """Python-side L2 normalization with the exact fold order of the SQL
    twin's ``x / sqrt(dot(v,v))`` (sequential i ascending, IEEE double)."""
    v = [float(x) for x in vec]
    acc = 0.0
    for x in v:
        acc = acc + x * x
    n = math.sqrt(acc)
    return [x / n for x in v]


def pq_codewords(
    embeddings: DataFrame,
    kc: int = PQ_KC,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    sub: int = PQ_SUB,
    train_iters: int = V.KMEANS_ITERS,
    n_train: int = V.KMEANS_TRAIN,
) -> list[list[float]]:
    """The shared codeword source: per-subspace k-means-trained codewords,
    initialized from the ``kc`` corpus vectors with the lowest PQ-salted
    h60 over the id (L2-normalized; codeword ``c`` of subspace ``j``
    starts as the j-th slice of chosen vector ``c``) and refined by
    ``train_iters`` fixed Lloyd iterations over the ``n_train``
    hash-lowest normalized sample — per subspace: argmin squared-L2
    assignment (ties → smaller codeword id, the encode rule), element-wise
    0.0-init sequential-fold mean over members ordered by vec_id, empty
    codewords keep their previous slice. Trained slices are STITCHED back
    into full-dim vectors (slice ``j`` of returned codeword ``c`` is the
    trained (j, c) codeword), so encode/ADC indexing is untouched.
    ``train_iters=0`` is the round-3 hash-selected baseline. The SQL twin
    (oracle_twins._pq_ctes) unrolls the identical iterations. One tiny
    collect (driver-side training over a bounded sample — the 100 TB
    shape) serves every subspace."""
    take = max(kc, n_train if train_iters else 0)
    rows = (
        embeddings.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cv"),
            TXT.h60(F.concat(F.col(id_col).cast("string"), F.lit("|pq"))).alias("hh"),
        )
        .orderBy("hh", "cid")
        .limit(take)
        .collect()
    )
    picked = [(int(r["cid"]), _pq_normalize_py(r["cv"])) for r in rows]
    words = [list(v) for _cid, v in picked[:kc]]
    if not train_iters:
        return words
    # the training sample is EXACTLY the n_train hash-lowest vectors (the
    # twin's ps CTE LIMITs n_train regardless of kc); mean folds run over
    # members ordered by vec_id ASCENDING (the twin's
    # ``list(v ORDER BY vec_id)``), not sample-hash order
    ordered = sorted(picked[:n_train], key=lambda t: t[0])
    for _ in range(train_iters):
        # assignment: per (sample vector s, subspace j) → nearest codeword
        # (0.0-init sequential fold of (x−y)², ties → smaller codeword id)
        members: dict[tuple[int, int], list[list[float]]] = {}
        for _vid, v in ordered:
            for j in range(m):
                best = None
                for c, w in enumerate(words):
                    acc = 0.0
                    for i in range(sub):
                        d = v[j * sub + i] - w[j * sub + i]
                        acc = acc + d * d
                    if best is None or acc < best[0]:
                        best = (acc, c)
                members.setdefault((j, best[1]), []).append(v)
        # update: per (j, c) slice mean; empty (j, c) keeps its previous slice
        nxt = [list(w) for w in words]
        for (j, c), mems in members.items():
            n = len(mems)
            for i in range(sub):
                acc = 0.0
                for mv in mems:
                    acc = acc + mv[j * sub + i]
                nxt[c][j * sub + i] = acc / n
        words = nxt
    return words


def _adc_table_row(
    qv: list[float], codewords: list[list[float]], j: int,
    m: int = PQ_M, sub: int = PQ_SUB,
) -> list[float]:
    """Row ``j`` of a query's ADC table: ``table[j][c]`` = squared L2
    between subspace ``j`` of the normalized query and codeword slice
    ``(j, c)`` — the exact 0.0-init sequential fold the encode/twin
    expressions run, computed driver-side once per query."""
    row = []
    for cw in codewords:
        acc = 0.0
        for i in range(sub):
            d = qv[j * sub + i] - cw[j * sub + i]
            acc = acc + d * d
        row.append(acc)
    return row


def _pq_normalized_col(vec_col) -> F.Column:
    d = V.dot(vec_col, vec_col)
    return F.transform(V.to_double(vec_col), lambda x: x / F.sqrt(d))


def _l2sq_sub(nv: F.Column, w: list[float], j: int, sub: int = PQ_SUB) -> F.Column:
    """Squared L2 between subspace ``j`` of ``nv`` and a literal codeword
    slice, UNROLLED into a left-to-right addition chain of plain
    arithmetic — value-identical to the twin's sequential ``list_reduce``
    fold (same IEEE operation order; the fold's 0.0+t₀ equals t₀ exactly
    for the non-negative squares), but whole-stage-codegen-able where a
    higher-order ``aggregate`` lambda would run interpreted per element —
    with 128 of these per row (subspaces × codewords), interpreted HOFs
    cost ~40× the entire operator."""
    terms = None
    for i in range(sub):
        diff = nv.getItem(j * sub + i) - F.lit(w[j * sub + i])
        t = diff * diff
        terms = t if terms is None else terms + t
    return terms


def pq_encode(
    embeddings: DataFrame,
    codewords: list[list[float]] | None = None,
    m: int = PQ_M,
    sub: int = PQ_SUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): each vector's per-subspace nearest
    codeword (min squared-L2, ties → smaller codeword id). Map-side, one
    Arrow-batched vectorized pass — at scale this is the one full read
    that builds the stored codes table.

    The expression form of this encode (m×kc unrolled subspace-distance
    chains — kept as :func:`_pq_encode_expr`, the spec the twin
    hash-proves) exceeds Janino's single-method codegen limit and runs
    interpreted: ~82 s for 600 k vectors at sf30. The numpy pass computes
    the identical IEEE sequences — normalize as a 0.0-init per-dim square
    fold then one divide, each subspace distance as a left-to-right
    (x−w)² addition chain, first-argmin ties — in <2 s of float64 work;
    parity pinned by ``test_pq_encode_vectorized_equals_expr``."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, IntegerType, StructField, StructType,
    )

    codewords = codewords if codewords is not None else pq_codewords(embeddings)
    w = np.asarray(codewords, dtype=np.float64)  # (kc, m·sub)
    id_field = [f for f in embeddings.schema.fields if f.name == id_col][0]
    out_schema = StructType(
        [
            StructField("vec_id", id_field.dataType),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]],
                dtype=np.float64,
            )
            # normalize: x / sqrt(Σ x²), the Σ a 0.0-init left fold
            acc = np.zeros(a.shape[0], dtype=np.float64)
            for d in range(a.shape[1]):
                acc = acc + a[:, d] * a[:, d]
            nv = a / np.sqrt(acc)[:, None]
            codes = np.empty((a.shape[0], m), dtype=np.int32)
            for j in range(m):
                # d2[(row, c)] accumulated i-ascending: t₀ then +tᵢ —
                # the exact chain of _pq_encode_expr / the SQL twin
                d2 = None
                for i in range(sub):
                    diff = nv[:, j * sub + i, None] - w[None, :, j * sub + i]
                    t = diff * diff
                    d2 = t if d2 is None else d2 + t
                codes[:, j] = np.argmin(d2, axis=1)  # first min = smaller c
            out = pdf[["vec_id"]].copy()
            out["codes"] = list(codes)
            yield out

    return base.mapInPandas(encode, schema=out_schema)


def _pq_encode_expr(
    embeddings: DataFrame,
    codewords: list[list[float]],
    m: int = PQ_M,
    sub: int = PQ_SUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The literal-expression encode — the semantic spec :func:`pq_encode`
    must reproduce bit-for-bit (and the shape the DuckDB twin mirrors).
    Retained for the parity pin; not used on the hot path (the projection
    exceeds Janino's codegen limit and evaluates interpreted)."""
    # materialize the normalized vector ONCE per row in its own projection:
    # the code expressions below reference it ~m×kc×sub times, and Catalyst
    # keeps a multiply-referenced non-trivial alias un-collapsed — without
    # this staging the norm fold would be re-evaluated per reference.
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _pq_normalized_col(F.col(vec_col)).alias("_nv"),
    )
    nv = F.col("_nv")
    codes = []
    for j in range(m):
        cands = F.array(
            *[
                F.struct(
                    _l2sq_sub(nv, w, j, sub).alias("d2"),
                    F.lit(c).cast("int").alias("c"),
                )
                for c, w in enumerate(codewords)
            ]
        )
        codes.append(F.array_min(cands).getField("c"))
    return base.select("vec_id", F.array(*codes).alias("codes"))


# (app_id, cache_key, geometry) → (codewords, encoded-codes DataFrame read
# from parquet scratch). The codes table is a STORED artifact in a PQ
# deployment (encoded once, served forever); this cache is the local
# stand-in — and it also amortizes the one-time driver cost of ANALYZING
# the wide encode expression (m×kc unrolled subspace distances), which at
# any data size dwarfs the encode's actual execution. Same data-identity
# contract as the IVF/signature caches: cache_key must uniquely identify
# the corpus. Entries are parquet-backed DataFrames — no persisted RDDs.
_PQ_CODES_CACHE: dict[tuple, tuple] = {}


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = PQ_M,
    sub: int = PQ_SUB,
    kc: int = PQ_KC,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_cache_key: str | None = None,
    train_iters: int = V.KMEANS_ITERS,
) -> DataFrame:
    """Approximate top-k by ADC over PQ codes: encode the corpus once,
    precompute each query's (m × kc) distance table driver-side (queries
    are a handful; the table math replays the engine fold order exactly),
    then score every candidate with m literal-array lookups — no
    full-dimension arithmetic per candidate, the PQ serving economics.
    Ranking ascends approximate squared-L2 over normalized vectors
    (≡ descending cosine), ties → smaller neighbor id.
    """
    from ..materialize import storage_checkpoint

    pk = _plan_cache_key(
        embeddings, index_cache_key, "pq_topk", k,
        (m, sub, kc), tuple(query_ids), id_col, vec_col, train_iters,
    )
    if pk is not None and pk in _TOPK_PLAN_CACHE:
        return _TOPK_PLAN_CACHE[pk]
    cache_k = None
    if index_cache_key is not None:
        spark = embeddings.sparkSession
        cache_k = (
            spark.sparkContext.applicationId,
            index_cache_key,
            (m, sub, kc, id_col, vec_col, train_iters),
        )
    hit = _PQ_CODES_CACHE.get(cache_k) if cache_k is not None else None
    if hit is not None:
        codewords, encoded = hit
    else:
        codewords = pq_codewords(embeddings, kc, id_col, vec_col, m, sub, train_iters)
        # the codes table IS the stored artifact in a PQ deployment — write
        # it once; every query branch below reads codes, never re-encodes
        encoded = storage_checkpoint(
            pq_encode(embeddings, codewords, m, sub, id_col, vec_col)
        )
        if cache_k is not None:
            _PQ_CODES_CACHE[cache_k] = (codewords, encoded)
    q_rows = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    if not q_rows:
        # mirror the other ANN paths: unknown/empty query ids yield an
        # empty result, never an AttributeError on a never-assigned union
        return embeddings.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, rank bigint"
        )

    # ONE pass over the codes table instead of a per-query union: each
    # query's ADC table rides a |queries|-row broadcast (the same shape
    # ivf_index chose for centroids — literal arrays cost ~0.3 s of py4j
    # per query to BUILD and as much Catalyst time to re-analyze on every
    # collect), and the codes scan happens once, paired with every query
    # by a ≤|queries|-row broadcast nested loop (the documented ann_* BNLJ
    # shape). The r10 form built one union branch per query — each branch
    # re-scanned the codes parquet, and every unionByName re-analyzed the
    # growing tree on the driver, which at any data size dominated the arm
    # (plan work measured 2.8 s/run vs 0.07 s of execution at sf0.1).
    # Same ADC values: table[j][c] is the identical driver-side double,
    # and the per-row sum folds j-ascending exactly as before (guide
    # §2.4: remove redundant passes; §7.3: plan work is driver time).
    from ..materialize import driver_df

    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    qtab = driver_df(
        embeddings.sparkSession,
        [
            (
                int(r["qid"]),
                [
                    _adc_table_row(_pq_normalize_py(r["qv"]), codewords,
                                   j, m, sub)
                    for j in range(m)
                ],
            )
            for r in q_rows
        ],
        "query_id bigint, _tabs array<array<double>>",
    )
    adist = None
    for j in range(m):
        term = F.element_at(
            F.col("_tabs").getItem(j), F.col("codes").getItem(j) + 1
        )
        adist = term if adist is None else adist + term
    out = (
        encoded.crossJoin(F.broadcast(qtab))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adist.alias("adist"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )
    if pk is not None:
        _TOPK_PLAN_CACHE[pk] = out
    return out


def _ivfpq_adist_scored(
    embeddings: DataFrame,
    query_ids: list[int],
    n_cells: int | None = None,
    nprobe: int | None = None,
    m: int = PQ_M,
    sub: int = PQ_SUB,
    kc: int = PQ_KC,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_cache_key: str | None = None,
    train_iters: int = V.KMEANS_ITERS,
) -> DataFrame | None:
    """Shared IVF+PQ scoring core: the probed candidate set (EXACTLY
    ``ivf_topk``'s — same index, same probe ranking) ADC-scored by the PQ
    codes table (EXACTLY ``pq_topk``'s order restricted to those
    candidates). Returns (query_id, neighbor_id, adist) rows — or None
    for an unknown/empty query set. ``ivfpq_topk`` ranks these directly;
    ``ivfpq_refine_topk`` widens the cut and exact-re-ranks the
    survivors. IVF restricts WHICH candidates are scored (probe
    ``nprobe`` cells → candidates shrink ~nprobe/n_cells), PQ decides
    HOW each survivor is scored (ADC over the codes table — m lookups,
    no raw vector touched). Shares both session caches via
    ``index_cache_key``.
    """
    from ..materialize import storage_checkpoint

    # --- IVF half: probed candidate ids per query (cells from the index)
    n_cells = _resolve_n_cells(embeddings, n_cells)
    if nprobe is None:
        nprobe = auto_nprobe(n_cells)
    _centroids, cdf, corpus = ivf_index(
        embeddings, n_cells, id_col, vec_col, cache_key=index_cache_key,
        train_iters=train_iters,
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        V.norm2(vec_col).alias("_qn"),
    )
    probe_cos = V.dot("q_vec", "cv") / (F.col("_qn") * F.col("cnorm"))
    pw = Window.partitionBy("query_id").orderBy(
        F.desc("probe_cos"), F.desc("cell_id")
    )
    probed = (
        queries.crossJoin(F.broadcast(cdf))
        .select("query_id", "cell_id", probe_cos.alias("probe_cos"))
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", F.col("cell_id").alias("cell"))
    )
    cand = (
        corpus.join(F.broadcast(probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )

    # --- PQ half: ADC over the codes table, restricted to the candidates
    cache_k = None
    if index_cache_key is not None:
        cache_k = (
            embeddings.sparkSession.sparkContext.applicationId,
            index_cache_key,
            (m, sub, kc, id_col, vec_col, train_iters),
        )
    hit = _PQ_CODES_CACHE.get(cache_k) if cache_k is not None else None
    if hit is not None:
        codewords, encoded = hit
    else:
        codewords = pq_codewords(embeddings, kc, id_col, vec_col, m, sub, train_iters)
        encoded = storage_checkpoint(
            pq_encode(embeddings, codewords, m, sub, id_col, vec_col)
        )
        if cache_k is not None:
            _PQ_CODES_CACHE[cache_k] = (codewords, encoded)

    q_rows = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    if not q_rows:
        return None
    # ONE equi-join instead of a per-query union of semi-joins: the r10
    # shape re-executed the whole probe+corpus candidate subtree once per
    # query branch (5× at the catalog's query count — and at 100 TB, 5
    # scans of the codes table instead of 1), and every unionByName
    # re-analyzed the growing driver plan (plan work measured 8.3 s/run
    # vs 0.12 s of execution at sf0.1). Now: candidates (query_id,
    # neighbor_id) join the codes table once, and each row picks up its
    # query's driver-computed ADC table from a |queries|-row broadcast
    # (literal arrays would cost ~0.3 s of py4j per query to build and as
    # much Catalyst time per collect) — identical doubles, identical
    # j-ascending sum fold.
    from ..materialize import driver_df

    qtab = driver_df(
        embeddings.sparkSession,
        [
            (
                int(r["qid"]),
                [
                    _adc_table_row(_pq_normalize_py(r["qv"]), codewords,
                                   j, m, sub)
                    for j in range(m)
                ],
            )
            for r in q_rows
        ],
        "query_id bigint, _tabs array<array<double>>",
    )
    adist = None
    for j in range(m):
        term = F.element_at(
            F.col("_tabs").getItem(j), F.col("codes").getItem(j) + 1
        )
        adist = term if adist is None else adist + term
    return (
        cand.join(encoded, cand["neighbor_id"] == encoded["vec_id"])
        .join(F.broadcast(qtab), "query_id")
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            "neighbor_id",
            adist.alias("adist"),
        )
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int | None = None,
    nprobe: int | None = None,
    m: int = PQ_M,
    sub: int = PQ_SUB,
    kc: int = PQ_KC,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_cache_key: str | None = None,
    train_iters: int = V.KMEANS_ITERS,
) -> DataFrame:
    """The full FAISS recipe, composed from the two stored artifacts this
    module already maintains: IVF restricts WHICH candidates are scored
    (probe ``nprobe`` cells → candidates shrink ~nprobe/n_cells), PQ
    decides HOW each survivor is scored (ADC over the codes table — m
    lookups, no raw vector touched). At 100 TB that combination is the
    serving economics: the probe prunes I/O to a cell slice, and that
    slice is read as 8-byte codes instead of 256-byte vectors.

    Semantics, precisely: the candidate set is EXACTLY ``ivf_topk``'s
    (same index, same probe ranking) and the scoring order is EXACTLY
    ``pq_topk``'s restricted to those candidates — pinned by test against
    both parents. Shares both session caches via ``index_cache_key``
    (and the built-plan cache, like every ``*_topk`` here).
    """
    pk = _plan_cache_key(
        embeddings, index_cache_key, "ivfpq_topk", k, n_cells, nprobe,
        (m, sub, kc), tuple(query_ids), id_col, vec_col, train_iters,
    )
    if pk is not None and pk in _TOPK_PLAN_CACHE:
        return _TOPK_PLAN_CACHE[pk]
    scored = _ivfpq_adist_scored(
        embeddings, query_ids, n_cells, nprobe, m, sub, kc,
        id_col, vec_col, index_cache_key, train_iters,
    )
    if scored is None:
        # mirror the other ANN paths: unknown/empty query ids yield an
        # empty result, never an AttributeError on a never-assigned union
        return embeddings.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, rank bigint"
        )
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )
    if pk is not None:
        _TOPK_PLAN_CACHE[pk] = out
    return out


def ivfpq_refine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    refine: int = 4,
    n_cells: int | None = None,
    nprobe: int | None = None,
    m: int = PQ_M,
    sub: int = PQ_SUB,
    kc: int = PQ_KC,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_cache_key: str | None = None,
    train_iters: int = V.KMEANS_ITERS,
) -> DataFrame:
    """IVF+PQ with an exact re-rank tail — the standard FAISS
    ``IndexRefineFlat`` recipe (public knowledge): ADC-score the probed
    candidates from the CODES table as usual, keep the best ``k·refine``
    per query by approximate distance, then re-score ONLY those
    survivors with the exact cosine over the full vectors and return the
    exact-ordered top k. Recall@k rises toward IVF-flat while the full
    vectors are read for k·refine rows per query instead of the whole
    probed slice — at 100 TB the refine read is a point-lookup-sized
    fraction of the codes scan it rides on.

    The exact stage uses the SAME deterministic cosine fold as
    ``brute_force_topk``'s expression form (``V.cosine``), so the
    re-rank order is bit-reproducible against the DuckDB twin
    (``tw.ann_ivfpq_refine_sql``)."""
    pk = _plan_cache_key(
        embeddings, index_cache_key, "ivfpq_refine_topk", k, refine,
        n_cells, nprobe, (m, sub, kc), tuple(query_ids), id_col, vec_col,
        train_iters,
    )
    if pk is not None and pk in _TOPK_PLAN_CACHE:
        return _TOPK_PLAN_CACHE[pk]
    scored = _ivfpq_adist_scored(
        embeddings, query_ids, n_cells, nprobe, m, sub, kc,
        id_col, vec_col, index_cache_key, train_iters,
    )
    if scored is None:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, rank bigint"
        )
    aw = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    survivors = (
        scored.withColumn("arn", F.row_number().over(aw))
        .filter(F.col("arn") <= int(k) * int(refine))
        .select("query_id", "neighbor_id")
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # survivors are k·refine rows per query — broadcast them onto the
    # corpus for the exact-vector read (a semi-join-sized probe, never a
    # corpus scan), then score with the deterministic fold
    exact = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
        )
        .join(F.broadcast(survivors), "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            V.cosine("q_vec", "n_vec").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    out = (
        exact.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )
    if pk is not None:
        _TOPK_PLAN_CACHE[pk] = out
    return out
