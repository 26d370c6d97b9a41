"""Skew-aware join: hot-key salting for large-large equi-joins.

Broadcast solves small-dim joins and AQE's skew-join splits oversized
sort-merge partitions, but neither helps when BOTH sides are large AND a
handful of keys dominate the stream side (the classic power-law user_id):
every row of a hot key still lands on one reducer. Salting is the standard
fix — spread each hot key over ``n_salts`` reducers by appending a salt to
the stream side's key and replicating the build side ``n_salts``×:

    stream: salt = hash(whole row) % n        (1 row  → 1 salted row)
    build:  explode [0..n)                    (1 row  → n salted rows)
    join on (key, salt)                       (same matches as plain join)

Row-for-row identical to the unsalted join — the salt never reaches the
output — so the DuckDB oracle is the PLAIN join, which is exactly the point:
same logical result, different physical distribution.

Cost model: build side pays n× replication (shuffle + memory), stream side
pays nothing. Use when build ≪ stream but too big to broadcast and the
stream key is skewed; ``n_salts`` caps hot-key reducer load at 1/n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    stream: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``stream ⋈ build`` on ``on``, hot-key-safe.

    The salt is a deterministic hash of the full stream row (NOT of the join
    key — a hot key's rows must spread across salts), so recomputation under
    task retry reproduces the same assignment.

    Only stream-sided join types are supported: the build side is
    REPLICATED, so right/full joins would emit unmatched build rows once
    per salt (and null-padded rows for salts with no stream partner) —
    swap the arguments instead of asking for a right join.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports stream-sided joins only, not {how!r}: "
            "the replicated build side breaks right/full semantics"
        )
    if _SALT in stream.columns or _SALT in build.columns:
        raise ValueError(f"{_SALT} column collides")
    salted_stream = stream.withColumn(
        _SALT,
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in stream.columns])), F.lit(n_salts)).cast(
            "int"
        ),
    )
    salted_build = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_stream.join(salted_build, [*on, _SALT], how).drop(_SALT)
