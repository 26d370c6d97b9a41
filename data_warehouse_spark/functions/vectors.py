"""Vector math over ``array<float>`` embedding columns — native expressions.

Everything uses sequential left folds (``F.aggregate``) in double precision;
the SQL twins use DuckDB's ``list_reduce`` with the same fold order, so
dot products are bit-identical across engines (summation order matters for
floating point). Rank outputs (top-k ids) are the hash-compared contract;
similarity values are carried for humans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# Deterministic k-means knobs shared by the Spark trainer
# (operators/similarity.py) and the SQL twins (oracle_twins.py): Lloyd's
# with a FIXED iteration count over a FIXED hash-selected sample, so both
# engines can replay the training bit-for-bit. At real scale the sample
# cap is the training-cost knob (classic practice: train the quantizer on
# a sample, assign the full corpus map-side).
KMEANS_ITERS = 4
KMEANS_TRAIN = 256


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_py(a: list[float], b: list[float]) -> float:
    """Driver-side twin of :func:`dot`: 0.0-init sequential left fold in
    double precision — the exact IEEE operation sequence of both the Spark
    ``F.aggregate`` expression and the DuckDB ``list_reduce`` twin, so
    values computed here can be baked into plans/SQL as literals without
    drift."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def cos_py(a: list[float], b: list[float]) -> float:
    """Driver-side twin of :func:`cosine` (same op order: dot / (sqrt·sqrt)).

    Division is IEEE like the Spark/DuckDB double division it twins —
    a zero-norm operand yields NaN (0/0) or ±inf, never a Python
    ``ZeroDivisionError`` (which the engines cannot raise)."""
    import math

    num = dot_py(a, b)
    den = math.sqrt(dot_py(a, a)) * math.sqrt(dot_py(b, b))
    if den == 0.0:
        return math.nan if num == 0.0 else math.copysign(math.inf, num)
    return num / den


def _sql_ref(col: Column | str) -> str | None:
    """Backquoted SQL identifier when the argument is a plain column name;
    None for computed Column objects (those keep the DSL path)."""
    if isinstance(col, str):
        return "`" + col.replace("`", "``") + "`"
    return None


def _dot_sql(ra: str, rb: str) -> str:
    """SQL text of :func:`dot` — the byte-identical fold (cast each element
    to double, zip-multiply, 0.0-init sequential left fold; ``0.0D`` is the
    explicit DOUBLE literal, matching the DSL's ``F.lit(0.0)``)."""
    return (
        f"aggregate(zip_with(transform({ra}, x -> CAST(x AS DOUBLE)), "
        f"transform({rb}, x -> CAST(x AS DOUBLE)), (x, y) -> x * y), "
        f"0.0D, (acc, v) -> acc + v)"
    )


# The str/str fast paths below parse ONE SQL string per expression instead
# of assembling the same tree through the higher-order-function DSL. The
# resulting Catalyst expressions are identical (same functions, same fold
# order, same double literals — only auto-generated lambda-variable names
# differ), but the DSL costs ~40 py4j round trips per fold (each lambda is
# created via its own JVM call) where F.expr costs one. Measured on the
# ann_recall construction: 12k py4j round trips ≈ 4.7 s per warm build,
# dominated by these folds (guide §7.3: plan/driver work is wall time too).


def to_double(vec: Column | str) -> Column:
    r = _sql_ref(vec)
    if r is not None:
        return F.expr(f"transform({r}, x -> CAST(x AS DOUBLE))")
    return F.transform(_c(vec), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    ra, rb = _sql_ref(a), _sql_ref(b)
    if ra is not None and rb is not None:
        return F.expr(_dot_sql(ra, rb))
    prods = F.zip_with(to_double(a), to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm2(a: Column | str) -> Column:
    r = _sql_ref(a)
    if r is not None:
        return F.expr(f"sqrt({_dot_sql(r, r)})")
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    ra, rb = _sql_ref(a), _sql_ref(b)
    if ra is not None and rb is not None:
        return F.expr(
            f"({_dot_sql(ra, rb)}) / "
            f"(sqrt({_dot_sql(ra, ra)}) * sqrt({_dot_sql(rb, rb)}))"
        )
    return dot(a, b) / (norm2(a) * norm2(b))


def hyperplane_signs(vec: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit m = sign(v · H_m).

    ``planes`` are deterministic literals (seeded offline) so the same
    constants can be baked into a SQL twin.
    """
    v = to_double(vec)
    bucket = F.lit(0).cast("bigint")
    for m, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(v, lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**m).cast("bigint")).otherwise(F.lit(0))
    return bucket
