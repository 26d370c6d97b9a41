"""Maintained balance rollup: the serving-path materialization of Q6.

The reference recomputes every balance as a per-request SUM over the
balance-change fact (``GraphQLPersistence.scala:370-403``).  That is
O(changes) work per request — measured here at sf1 (6 M transfers,
~4 M change rows): 32 concurrent GraphQL clients pushed balance-page
p95 to ~45 s, far past the reference's own 20 s e2e deadline
(``bbtest/steps/http_steps.py:57``).  At 100 TB a per-request fact scan
is a non-starter; the standard warehouse answer is an incrementally
maintained aggregate (``operators/ivm.py``) serving O(accounts) reads.

This module keeps ``account_balance_rollup`` — the ivm COUNT/SUM rollup
of ``account_balance_change`` grouped by (tenant, name) — current from
the single-writer ingestion tick, and gives the GraphQL layer a
*provably fresh* read or nothing:

Freshness contract
    ``account_balance_change`` is append-only via
    ``TableStore.merge_insert_missing``, which adopts part files into
    the CURRENT version dir without a pointer swap — so version
    pointers cannot witness freshness.  Instead the witness is a
    **fingerprint of the version dir's part-file listing** (names +
    sizes + the version dir itself).  Every rollup version records, in
    an atomic sidecar (``_abc_fingerprint``, written before the pointer
    swap that publishes the version), the fingerprint of exactly the
    change-table state it summarizes.  A reader compares that sidecar
    against the LIVE fingerprint (two directory listings, no Spark
    job); on any mismatch it falls back to the direct aggregate — the
    fast path can be stale-but-unused, never stale-and-served.

Maintenance (single writer — the ingestion tick)
    * fingerprint unchanged            → noop (pure Python, no job);
    * fingerprint moved by exactly the files THIS tick adopted (the
      caller passes the pre-merge fingerprint and the adopted paths)
      → exact ivm delta from just those part files — file-level CDC
      for an append-only table, O(tick batch) not O(table);
    * anything else (crash between merge and maintenance, compaction
      rewriting files, external overwrite) → full recompute.  The
      mismatch rule makes every failure mode self-healing: a torn
      state can only disable the fast path until the next tick.

Scale shape: the delta path aggregates one tick's adopted files and
full-outer-joins two rollup-sized tables (ivm.apply_delta — broadcast
when the delta is tiny); the fact table appears in no steady-state
plan.  The serving read is a broadcast semi-join against O(accounts)
rows.

Known write-amplification bound: each maintenance PUBLISHES the whole
rollup (one atomic version swap carrying the sidecar), i.e. O(accounts)
written per busy tick — trivial at the measured 150 k accounts (~2 MB),
wrong past ~10 M.  The scale path is mechanical: partition the rollup
by tenant and MERGE the per-group delta through
``TableStore.merge_upsert`` (copy-on-write rewrites only touched tenant
partitions) plus a ``merge_delete`` of zero-count groups; the freshness
witness then moves from the version sidecar to the same
``table_fingerprint`` scheme the readers already use for
append-without-swap tables.  Not implemented here because the sidecar's
write-before-swap atomicity is simpler to reason about and the serving
tier swaps to a KV store at that population anyway (see
api/serving_cache.py).
"""

from __future__ import annotations

import hashlib
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import ivm

ABC_TABLE = "account_balance_change"
ROLLUP_TABLE = "account_balance_rollup"
GROUP_COLS = ["tenant", "name"]
SUM_COLS = ["amount"]
FINGERPRINT_SIDECAR = "_abc_fingerprint"

# F.sum over the ingest DECIMAL(28,10) amount widens to DECIMAL(38,10);
# storing that exact type keeps the fast path bit-identical to the
# direct aggregate (queries.account_balances with a key batch).
ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("nn_amount", T.LongType(), False),
        T.StructField("sum_amount", T.DecimalType(38, 10), True),
    ]
)


def table_fingerprint(store, name: str) -> str | None:
    """Fingerprint of a table's CURRENT on-disk state: version dir +
    sorted (relative path, size) of its parquet part files.  Append adds
    files, compaction swaps the dir, overwrite swaps the dir — every
    content-changing operation moves the fingerprint (the witness version
    pointers cannot be for append-without-swap tables).  None when the
    table has never been written."""
    vdir = store._resolve(name)
    if vdir is None:
        return None
    h = hashlib.sha256(os.path.basename(vdir).encode())
    entries = []
    for dirpath, _dirs, files in os.walk(vdir):
        rel = os.path.relpath(dirpath, vdir)
        for f in files:
            if f.endswith(".parquet"):
                entries.append(
                    (os.path.join(rel, f), os.path.getsize(os.path.join(dirpath, f)))
                )
    for path, size in sorted(entries):
        h.update(f"{path}\x00{size}\x01".encode())
    return h.hexdigest()


def abc_fingerprint(store) -> str | None:
    """The change table's fingerprint — the rollup's freshness witness."""
    return table_fingerprint(store, ABC_TABLE)


def _version_root(path: str) -> str:
    """The version dir an adopted part file lives in: walk up past hive
    partition dirs (``col=value``).  Used as basePath so pyspark recovers
    the partition column — correct even when a post-merge compaction has
    already swapped the table's CURRENT pointer elsewhere."""
    d = os.path.dirname(path)
    while "=" in os.path.basename(d):
        d = os.path.dirname(d)
    return d


def _rollup_sidecar(vdir: str) -> str | None:
    try:
        with open(os.path.join(vdir, FINGERPRINT_SIDECAR)) as fh:
            return fh.read().strip() or None
    except FileNotFoundError:
        return None


def _publish(store, rollup: DataFrame, fingerprint: str) -> None:
    """Write a rollup version with its fingerprint sidecar, then swap the
    pointer — the sidecar lands BEFORE publication, so a published version
    always carries the fingerprint of the state it summarizes (Spark
    ignores underscore-prefixed files in a parquet directory)."""
    vdir = store._write_version(ROLLUP_TABLE, rollup)
    tmp = os.path.join(vdir, f"{FINGERPRINT_SIDECAR}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(fingerprint)
    os.replace(tmp, os.path.join(vdir, FINGERPRINT_SIDECAR))
    store._swap(ROLLUP_TABLE, vdir)


def maintain(
    store,
    fp_before: str | None = None,
    adopted_files: list[str] | None = None,
) -> str:
    """Converge the rollup to the change table's current state.  Returns
    the action taken: ``"noop"`` | ``"delta"`` | ``"recompute"``.

    Call with ``fp_before`` (fingerprint captured immediately before this
    tick's change-table merge) and ``adopted_files`` (the part files that
    merge adopted — ``TableStore.last_adopted_files``) to enable the
    exact delta path; call bare for the convergence check (noop when
    fresh, recompute when not — the bootstrap/repair path)."""
    fp_now = abc_fingerprint(store)
    if fp_now is None:
        return "noop"  # no changes ever: serving falls back to the empty direct agg
    rdir = store._resolve(ROLLUP_TABLE)
    r_fp = _rollup_sidecar(rdir) if rdir else None
    if r_fp == fp_now:
        return "noop"

    spark = store.spark
    sum_t = ROLLUP_SCHEMA["sum_amount"].dataType
    if (
        r_fp is not None
        and fp_before is not None
        and r_fp == fp_before
        and adopted_files
        and all(os.path.isfile(p) for p in adopted_files)
    ):
        # exact file-level CDC: the rollup summarized precisely the
        # pre-merge state, and these part files are precisely what the
        # merge added.  basePath recovers the tenant partition column
        # from the directory names — derived from the adopted files
        # themselves, NOT the current pointer: a compaction inside the
        # merge swaps a new version dir while the adopted files live in
        # the (still retained) one they were adopted into.  The delta
        # stays exact through that: compaction rewrites files, not rows.
        try:
            cdc = (
                spark.read.option("basePath", _version_root(adopted_files[0]))
                .schema(store.schemas[ABC_TABLE])
                .parquet(*adopted_files)
                .withColumn(ivm.CHANGE_COL, F.lit("insert"))
            )
            delta_rollup = ivm.maintain_rollup(
                store.read(ROLLUP_TABLE), cdc, GROUP_COLS, SUM_COLS
            )
            # publish INSIDE the try: the plan is lazy, so read/verify
            # failures surface at the write — they too must degrade
            _publish(store, delta_rollup.withColumn(
                "sum_amount", F.col("sum_amount").cast(sum_t)), fp_now)
            return "delta"
        except Exception:
            # the delta path is an optimization; any failure degrades to
            # the recompute below (self-healing) rather than failing the
            # ingestion tick that hosts the maintenance
            pass
    new_rollup = ivm.compute_rollup(store.read(ABC_TABLE), GROUP_COLS, SUM_COLS)
    _publish(store, new_rollup.withColumn(
        "sum_amount", F.col("sum_amount").cast(sum_t)), fp_now)
    return "recompute"


def read_if_fresh(store) -> DataFrame | None:
    """Serving fast path: the rollup pinned to the version whose sidecar
    fingerprint matches the change table's LIVE fingerprint, or None (the
    caller falls back to the direct aggregate).  The check is two
    directory listings — no Spark job.  Reading the checked version dir
    directly (not through the pointer) makes the result immune to a
    concurrent maintenance swap between check and read."""
    rdir = store._resolve(ROLLUP_TABLE)
    if rdir is None:
        return None
    if _rollup_sidecar(rdir) != abc_fingerprint(store):
        return None
    return (
        store.spark.read.schema(ROLLUP_SCHEMA)
        .parquet(rdir)
        .select(*[f.name for f in ROLLUP_SCHEMA.fields])
    )


def balances_from_rollup(rollup: DataFrame, keys: DataFrame) -> DataFrame:
    """(tenant, name, balance) for a key batch, from the maintained
    rollup — the EXACT output contract of ``queries.account_balances``
    with a key batch: one row per key, missing/all-NULL keys defaulting
    to 0 cast MONEY_SUM (the reference's getOrElse(0) —
    GraphQLPersistence.scala:400).  Both joins broadcast the small side:
    the key batch against the O(accounts) rollup, then the ≤|keys| hits
    back onto the keys — no shuffle at any size."""
    from ..schemas import MONEY_SUM

    hits = rollup.join(F.broadcast(keys), GROUP_COLS, "left_semi").select(
        "tenant",
        "name",
        F.when(F.col("nn_amount") == 0, F.lit(None))
        .otherwise(F.col("sum_amount"))
        .alias("balance"),
    )
    return keys.select("tenant", "name").join(
        F.broadcast(hits), GROUP_COLS, "left"
    ).select(
        "tenant",
        "name",
        F.coalesce(F.col("balance"), F.lit(0).cast(MONEY_SUM)).alias("balance"),
    )
