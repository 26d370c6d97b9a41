"""Derive a larger-SF dataset from driver testdata by key-offset replication.

The driver generates parquet up to sf0.1; the scale story above that rests
on plan-shape pins. This tool turns those claims into measured evidence:
it replicates each table ``factor``× with disjoint key ranges (copy 0 is
the ORIGINAL rows bit-for-bit, so every fixed literal the catalog relies
on — nation names, ANN query ids, brand filters — still exists), writing
multi-row-group parquet so Spark can split the scans.

Replication semantics per table (consistency rules):
  * every BIGINT entity key offsets by ``copy * 10_000_000`` — foreign keys
    offset together (l_orderkey with o_orderkey, o_custkey with c_custkey,
    l_partkey/l_suppkey with part/supplier), so join cardinalities scale
    like real TPC-H SF growth;
  * c_name / s_name / p_name get a ``_<copy>`` suffix — the warehouse
    model keys accounts by (nation, customer name), so names must stay
    unique per copy (suffixing preserves every substring/LIKE filter the
    catalog uses);
  * nation/region are FIXED dimensions (25/5 rows at any SF, the broadcast
    contract) and are copied through;
  * documents append a ``" v<copy>"`` suffix (texts stay distinct across
    copies; n_chars recomputed) — replicated docs are deliberate
    near-duplicates of each other, a legitimate dedup stress shape;
  * ``--perturb-text`` additionally rewrites ~1/3 of each copy's TOKENS
    (content-keyed: token t -> t~<copy> when hash(t, copy) lands in the
    replace class). Token-keyed (not position-keyed) so the map is
    IDENTICAL for every document within a copy: documents that were
    near-dups of each other in the source stay near-dups inside each copy
    (shared token windows transform identically), while cross-copy shingle
    survival collapses to (2/3)^8 ≈ 4% of 8-gram windows — replicas of the
    SAME document land far below every near-dup threshold. This is the
    non-degenerate shape for benching the near-dup families at scale:
    without it, N copies of the corpus are N·(N-1)/2 mutual near-dup
    pairs per source doc and the candidate volume measures the fixture,
    not the operator;
  * embeddings get a per-copy DIAGONAL ORTHOGONAL transform (hash-keyed
    sign flip per (copy, dim); copy 0 = identity): within-copy cosines are
    EXACTLY the source corpus's, cross-copy cosines ≈ 0 — non-degenerate
    near-dup structure at any factor (the earlier +copy·1e-3 translation
    made unrelated vectors cosine ~0.95 by copy ~500);
  * timestamps are kept — density per day grows with SF, like TPC-H.

Usage: python scale_up.py [--factor 10] [--src /root/testdata/sf0.1]
                          [--dst scale_data/sf1]
"""

from __future__ import annotations

import argparse
import os
import time

import duckdb

OFFSET = 10_000_000
ROW_GROUP = 131_072  # rows per parquet row group — Spark's split unit


def _copies(factor: int) -> str:
    return f"(SELECT unnest(range(0, {factor})) AS copy) copies"


_KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _guard_key_range(con, src: str, table: str, factor: int) -> None:
    """Fail fast if offsetting would collide: every source key must fit
    below OFFSET (re-running the tool on already-scaled output would
    otherwise silently produce duplicate primary keys and garbage data)."""
    for col in _KEY_COLS.get(table, []):
        mx = con.execute(
            f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]
        if mx is not None and mx >= OFFSET:
            raise SystemExit(
                f"{table}.{col} max {mx} >= OFFSET {OFFSET}: source already "
                "scaled (or keys too large) — offsets would collide. "
                "Scale from the original testdata with a larger --factor "
                "instead of chaining runs."
            )


def scale_table(
    con, src: str, dst: str, table: str, factor: int, perturb_text: bool = False
) -> int:
    _guard_key_range(con, src, table, factor)
    off = "copy * {o}".format(o=OFFSET)
    suffix = "CASE WHEN copy = 0 THEN '' ELSE '_' || copy END"
    doc_suffix = "CASE WHEN copy = 0 THEN '' ELSE ' v' || copy END"
    if perturb_text:
        # content-keyed token rewrite (see module docstring): deterministic,
        # uniform within a copy, divergent across copies; copy 0 untouched
        doc_text = f"""CASE WHEN copy = 0 THEN r.text ELSE
            array_to_string(list_transform(string_split(r.text, ' '),
              t -> CASE WHEN t = '' THEN t
                        WHEN hash(t || ':' || copy) % 3 = 0
                        THEN t || '~' || copy ELSE t END), ' ')
            || ' v' || copy END"""
    else:
        doc_text = f"r.text || {doc_suffix}"
    exprs = {
        "region": "r.*",
        "nation": "r.*",
        "customer": f"""r.c_custkey + {off} AS c_custkey,
            r.c_name || {suffix} AS c_name, r.c_nationkey, r.c_acctbal,
            r.c_mktsegment""",
        "supplier": f"""r.s_suppkey + {off} AS s_suppkey,
            r.s_name || {suffix} AS s_name, r.s_nationkey, r.s_acctbal""",
        "part": f"""r.p_partkey + {off} AS p_partkey,
            r.p_name || {suffix} AS p_name, r.p_brand, r.p_type, r.p_size,
            r.p_retailprice""",
        "orders": f"""r.o_orderkey + {off} AS o_orderkey,
            r.o_custkey + {off} AS o_custkey, r.o_orderstatus,
            r.o_totalprice, r.o_orderdate, r.o_orderpriority""",
        "lineitem": f"""r.l_orderkey + {off} AS l_orderkey,
            r.l_partkey + {off} AS l_partkey, r.l_suppkey + {off} AS l_suppkey,
            r.l_linenumber, r.l_quantity, r.l_extendedprice, r.l_discount,
            r.l_tax, r.l_returnflag, r.l_linestatus, r.l_shipdate""",
        "events": f"""r.event_id + {off} AS event_id, r.ts,
            r.user_id + {off} AS user_id, r.event_type, r.value, r.props""",
        "documents": f"""r.doc_id + {off} AS doc_id,
            {doc_text} AS text, r.lang, r.source,
            CAST(length({doc_text}) AS BIGINT) AS n_chars""",
        # per-copy DIAGONAL ORTHOGONAL transform (hash-keyed sign flip per
        # (copy, dim); copy 0 = identity). An isometry per copy: every
        # within-copy pairwise cosine is EXACTLY the source corpus's (each
        # copy mirrors the real neighborhood structure, so true near-dup
        # counts stay linear in factor), while cross-copy cosines of even
        # the SAME source become a ±1/√dim random walk ≈ 0 — far below any
        # dedup threshold. The previous +copy·1e-3 translation DEGENERATED
        # at large factors: by copy ~500 the shift dominates the signal and
        # UNRELATED vectors measure cosine 0.93-0.98 (verified on the old
        # sf100 fixture), making the true pair count quadratic — any exact
        # algorithm must then emit ~1e11 pairs. Fixture property, not an
        # operator property; this transform removes it at every factor.
        # ASSUMPTION (energy spread): the ≈0 cross-copy cosine argument
        # needs a vector's energy spread across many dims — with k dominant
        # components the flipped dot product is a k-step walk and |cosine|
        # can stay high. The testdata embeddings are dense unit-ish Gaussian
        # mixtures (no dominant axis), and selfcheck.py --fixture-cosines
        # measures the scaled fixture's cross-copy cosine distribution
        # directly so each SCALE artifact records it instead of assuming.
        "embeddings": f"""r.vec_id + {off} AS vec_id,
            list_transform(range(1, len(r.embedding) + 1),
                i -> CAST(r.embedding[i] * (CASE WHEN copy = 0 THEN 1
                     WHEN hash(copy::VARCHAR || ':' || i::VARCHAR) % 2 = 0
                     THEN 1 ELSE -1 END) AS FLOAT)) AS embedding,
            r.label""",
    }
    fixed = table in ("region", "nation")
    frm = f"read_parquet('{src}/{table}.parquet') r" + (
        "" if fixed else f", {_copies(factor)}"
    )
    out = os.path.join(dst, f"{table}.parquet")
    con.execute(
        f"COPY (SELECT {exprs[table]} FROM {frm}) TO '{out}' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})"
    )
    return con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]


def _default_mem() -> str:
    """~25% of physical RAM (capped at 24GB) so the streaming COPY cannot
    overcommit a smaller host; os.sysconf is best-effort (Linux/mac)."""
    try:
        gib = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
        return f"{max(1, min(24, int(gib // 4)))}GB"
    except (ValueError, OSError, AttributeError):
        return "4GB"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="scale_data/sf1")
    ap.add_argument(
        "--perturb-text",
        action="store_true",
        help="token-level per-copy noise so replicated documents are NOT "
        "mutual near-dups (non-degenerate near-dup benching at scale)",
    )
    ap.add_argument(
        "--tables",
        default="",
        help="comma-separated subset (resume after an interrupted run)",
    )
    ap.add_argument(
        "--memory-limit",
        default=os.environ.get("SCALE_UP_MEMORY_LIMIT") or _default_mem(),
        help="DuckDB memory_limit (default: env SCALE_UP_MEMORY_LIMIT, else "
        "~25%% of detected physical RAM, capped at 24GB)",
    )
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    # COPY materializes its whole input to preserve insertion order — at
    # factor 1000 the lineitem cross join is ~90 GB of in-memory rows
    # (measured: OOM-bound on a 128 GB box with ZERO bytes written).
    # Row order inside the output parquet is meaningless to every consumer
    # (Spark scans split by row group; the oracles sort), so let DuckDB
    # STREAM the cross join straight to the writer, bounded by memory_limit.
    con.execute("SET preserve_insertion_order = false")
    con.execute(f"SET memory_limit = '{args.memory_limit}'")
    known = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    wanted = [t for t in args.tables.split(",") if t] or None
    if wanted is not None:
        unknown = [t for t in wanted if t not in known]
        if unknown:
            # no-silent-caps: a typo ('lineitems') in a resume run must not
            # produce an incomplete dataset without a word
            ap.error(f"unknown --tables entries: {', '.join(unknown)} "
                     f"(known: {', '.join(known)})")
    t0 = time.time()
    for t in known:
        if wanted is not None and t not in wanted:
            continue
        n = scale_table(con, args.src, args.dst, t, args.factor,
                        perturb_text=args.perturb_text)
        print(f"{t}: {n} rows")
    print(f"done in {time.time() - t0:.1f}s -> {args.dst}")


if __name__ == "__main__":
    main()
