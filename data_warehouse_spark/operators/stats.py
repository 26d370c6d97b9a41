"""ANALYZE-style column statistics (the engine's stats-collection operator).

The reference delegates all statistics to Postgres (`ANALYZE` runs inside the
DB the reference queries; cf. reference perf/README.md — the service itself
never computes stats). A Spark-native warehouse needs its own: per-column
null counts, distinct counts, and min/max are what a cost-based optimizer,
a data-quality gate, and a dataset card all consume.

Design for 100 TB:

  * ONE scan — every statistic is an aggregate over the same pass; Spark
    plans the multi-DISTINCT agg with an Expand (rows x (n_distinct + 1)),
    the standard exact plan.  For corpus-scale tables pass
    ``exact_ndv=False`` to use HLL++ (``approx_count_distinct``) instead,
    which drops the Expand entirely and keeps the agg map-side partial.
  * all comparisons land in ONE ordinal domain (bigint) so min/max are
    engine-portable and integer-exact: ints as themselves, doubles as
    half-up cents, timestamps as epoch microseconds; strings keep their
    min/max in a separate string column.
  * output is long-format (one row per column), the shape a catalog table
    of column stats would be stored in.

The column spec (name, kind) is shared with the DuckDB oracle twin
(oracle_twins.table_stats_sql) so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kind: "int" (integral), "cents" (double -> half-up cents), "str", "ts"
TABLE_STATS_COLS: dict[str, list[tuple[str, str]]] = {
    "lineitem": [
        ("l_orderkey", "int"),
        ("l_linenumber", "int"),
        ("l_quantity", "cents"),
        ("l_extendedprice", "cents"),
        ("l_returnflag", "str"),
        ("l_linestatus", "str"),
        ("l_shipdate", "ts"),
    ],
}


def _ordinal(name: str, kind: str):
    c = F.col(name)
    if kind == "int":
        return c.cast("bigint")
    if kind == "cents":
        return F.round(c * 100).cast("bigint")
    if kind == "ts":
        return F.unix_micros(c)
    return None  # str: ordered in the string domain instead


def column_stats(
    df: DataFrame, cols: list[tuple[str, str]], exact_ndv: bool = True
) -> DataFrame:
    """Per-column stats in one scan; long format (one row per column).

    Columns: col_name, n_rows, n_nonnull, ndv, min_ord, max_ord (bigint
    ordinal domain; NULL for strings), min_str, max_str (strings only).
    """
    ndv = F.countDistinct if exact_ndv else (lambda c: F.approx_count_distinct(c))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for name, kind in cols:
        c = F.col(name)
        o = _ordinal(name, kind)
        aggs += [
            F.count(c).cast("bigint").alias(f"{name}__nn"),
            ndv(c).cast("bigint").alias(f"{name}__ndv"),
            (F.min(o) if o is not None else F.lit(None).cast("bigint")).alias(
                f"{name}__min_ord"
            ),
            (F.max(o) if o is not None else F.lit(None).cast("bigint")).alias(
                f"{name}__max_ord"
            ),
            (F.min(c) if kind == "str" else F.lit(None).cast("string")).alias(
                f"{name}__min_str"
            ),
            (F.max(c) if kind == "str" else F.lit(None).cast("string")).alias(
                f"{name}__max_str"
            ),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("n_rows"),
                F.col(f"{name}__nn").alias("n_nonnull"),
                F.col(f"{name}__ndv").alias("ndv"),
                F.col(f"{name}__min_ord").alias("min_ord"),
                F.col(f"{name}__max_ord").alias("max_ord"),
                F.col(f"{name}__min_str").alias("min_str"),
                F.col(f"{name}__max_str").alias("max_str"),
            )
            for name, _ in cols
        ]
    )
    return one.select(F.inline(rows)).orderBy("col_name")
