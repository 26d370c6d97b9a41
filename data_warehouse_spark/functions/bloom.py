"""DataFrame-native Bloom filter: semi-join reduction without a shuffle.

Spark's own runtime bloom filters (``bloom_filter_agg`` / ``might_contain``)
are internal Catalyst expressions not exposed through the public function
registry, so this builds the identical mechanism out of public DataFrame
operators:

  build   k salted-h60 probe positions per value → explode → bit_or words
          (two TINY shuffles over the build side only) → one row holding an
          ``array<bigint>`` bitmap
  probe   broadcast the 1-row bitmap (BroadcastNestedLoopJoin of a single
          row = a map-side literal), then a pure-JVM bit test per value:
          ``element_at(bloom, pos/64+1) & (1 << pos%64) != 0`` AND-ed over
          the k probes

The point at 100 TB: a big-side ⋈ small-side equi-join shuffles EVERY
big-side row; probing the small side's bloom first drops the (vast)
non-matching majority map-side, so the shuffle carries only probable hits.
False positives only cost shuffle bytes — the exact join downstream still
decides membership, so results are bit-identical with the filter on or off.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as X

DEFAULT_BITS = 1 << 20  # 128 KiB bitmap — ~0.6% fp at 100k build keys, k=5
DEFAULT_K = 5


def _probe_positions(value: Column, n_bits: int, k: int) -> list[Column]:
    # k independent salted 60-bit hashes of the value's string form
    return [
        X.h60(F.concat(value.cast("string"), F.lit(f":bloom{i}"))) % n_bits
        for i in range(k)
    ]


def build_bloom(
    df: DataFrame, col: str, n_bits: int = DEFAULT_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """Aggregate ``df[col]`` into a 1-row DataFrame with an ``array<bigint>``
    column ``bloom`` (dense, ``n_bits/64`` words) — broadcastable state."""
    n_words = n_bits // 64
    pos = F.explode(F.array(*_probe_positions(F.col(col), n_bits, k))).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.floor(F.col("pos") / 64).cast("bigint").alias("w"),
            # F.shiftleft's Python signature only takes a literal count;
            # the SQL function accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    dense = (
        df.sparkSession.range(n_words)
        .withColumnRenamed("id", "w")
        .join(words, "w", "left")
        .select("w", F.coalesce("word", F.lit(0).cast("bigint")).alias("word"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "word"))),
            lambda s: s.getField("word"),
        ).alias("bloom")
    )


def might_contain(
    bloom: Column, value: Column, n_bits: int = DEFAULT_BITS, k: int = DEFAULT_K
) -> Column:
    """True iff every probe bit of ``value`` is set in ``bloom`` (same
    geometry as :func:`build_bloom`). Pure JVM bit arithmetic."""
    cond = F.lit(True)
    for pos in _probe_positions(value, n_bits, k):
        word = F.element_at(bloom, (F.floor(pos / 64) + 1).cast("int"))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_gate(
    big: DataFrame,
    build: DataFrame,
    big_col: str,
    build_col: str,
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Filter ``big`` to rows whose ``big_col`` probably appears in
    ``build[build_col]`` — the map-side pre-gate in front of an exact join.
    Broadcasts one row; never shuffles ``big``."""
    bloom_row = build_bloom(build, build_col, n_bits, k)
    gated = big.join(F.broadcast(bloom_row), F.lit(True))
    return gated.filter(
        might_contain(F.col("bloom"), F.col(big_col), n_bits, k)
    ).drop("bloom")
