"""Driver-mirror correctness gate, runnable locally before each round closes.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables (default
sf0.01, the driver's correctness scale), comparing row count, sorted column
names, and an order-insensitive canonicalized value hash — the same three
signals the driver records in CORRECTNESS_r{N}.json.

Usage:  python selfcheck.py [--sf /root/testdata/sf0.01] [--only name,name]
Prints one JSON object per query and a trailing summary line; exit code 1 if
any checked entry mismatches.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import time

import duckdb

from data_warehouse_spark.schemas import TESTDATA_TABLES
from data_warehouse_spark.session import get_spark


def canon_cell(v):
    import datetime
    import decimal
    import math

    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "~"
    if isinstance(v, (decimal.Decimal, float)):
        f = float(v)
        return repr(round(f, 6))
    if isinstance(v, int):
        return repr(round(float(v), 6)) if abs(v) < 2**52 else str(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def value_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def fixture_cosines(sf_dir: str, max_pairs: int = 200_000) -> dict:
    """Measure a scaled fixture's SAME-SOURCE cross-copy cosine distribution
    (scale_up.py's sign-flip isometry claims these are ≈0; this records the
    actual distribution in the SCALE artifact instead of assuming the
    energy-spread precondition holds). Pairs are (copy_i, copy_j) replicas
    of the same source vector — the worst case for any dedup threshold."""
    con = duckdb.connect()
    off = 10_000_000  # scale_up.OFFSET
    row = con.execute(
        f"""
        WITH e AS (
            SELECT vec_id % {off} AS src, vec_id // {off} AS copy, embedding
            FROM read_parquet('{sf_dir}/embeddings.parquet')
        ),
        pairs AS (
            SELECT list_cosine_similarity(a.embedding, b.embedding) AS cos
            FROM e a JOIN e b ON a.src = b.src AND a.copy < b.copy
            LIMIT {max_pairs}
        )
        SELECT count(*) AS n,
               round(avg(abs(cos)), 4) AS mean_abs,
               round(quantile_cont(abs(cos), 0.5), 4) AS p50_abs,
               round(quantile_cont(abs(cos), 0.99), 4) AS p99_abs,
               round(max(abs(cos)), 4) AS max_abs,
               sum(CASE WHEN abs(cos) >= 0.85 THEN 1 ELSE 0 END)
                   AS n_above_dedup_threshold
        FROM pairs
        """
    ).fetchone()
    keys = ["n", "mean_abs", "p50_abs", "p99_abs", "max_abs",
            "n_above_dedup_threshold"]
    return {"metric": "cross_copy_cosine", "sf_dir": sf_dir,
            **dict(zip(keys, (None if v is None else float(v) for v in row)))}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--fixture-cosines",
        action="store_true",
        help="instead of the oracle gate, print the scaled fixture's "
        "same-source cross-copy cosine distribution (scale_up.py isometry "
        "spot-check) and exit",
    )
    args = ap.parse_args()
    if args.fixture_cosines:
        print(json.dumps(fixture_cosines(args.sf)))
        return 0

    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries, oracles = mod.queries(), mod.oracle_sql()
    only = {n for n in args.only.split(",") if n}
    unknown = only - set(queries)
    if unknown:
        # a typo'd --only must fail loudly, not report a vacuous green gate
        print(json.dumps({"error": "unknown_queries", "names": sorted(unknown)}))
        return 1

    spark = get_spark(app_name="dwh-selfcheck", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec = {"name": name}
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf).toPandas()
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and value_hash(sdf) == value_hash(odf)
                )
                if not rec["hash_match"]:
                    bad += 1
                    if not rec["schema_match"]:
                        rec["spark_cols"] = sorted(sdf.columns)
                        rec["oracle_cols"] = sorted(odf.columns)
            else:
                rec["err"] = "no_oracle"
        except Exception as exc:  # noqa: BLE001 — report and keep checking
            bad += 1
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        rec["sec"] = round(time.time() - t0, 2)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"checked": len(only) or len(queries), "mismatched": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
