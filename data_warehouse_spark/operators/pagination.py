"""Deterministic ordered pagination.

Every list query in the reference is ORDER BY unique-key + OFFSET/LIMIT
(GraphQLPersistence.scala:153-154,206-207,328-329 in the reference).
Determinism under Spark parallelism requires the sort keys to be a total
order — callers must pass unique key sets.

Plan shape at scale: when offset==0 Catalyst compiles orderBy+limit to
``TakeOrderedAndProject`` (per-partition top-k, no global sort). With an
offset, Spark 4's ``DataFrame.offset`` composes with limit into a
``GlobalLimit(offset+limit)`` over partial top-k — still no full sort of the
table. Pagination deep into a 100 TB table is inherently O(offset); the API
layer caps offset like the reference caps fetch size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def paginate(
    df: DataFrame,
    order_by: Sequence[Column | str],
    limit: int | None = None,
    offset: int = 0,
) -> DataFrame:
    if offset < 0 or (limit is not None and limit < 0):
        raise ValueError("limit/offset must be natural numbers")  # NaturalNumber scalar
    out = df.orderBy(*order_by)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out
