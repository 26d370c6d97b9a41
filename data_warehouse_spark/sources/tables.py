"""Parquet-backed warehouse tables with idempotent MERGE semantics.

The reference's consistency mechanism is PostgreSQL ``INSERT … ON CONFLICT``
(SecondaryPersistence.scala:30-127): replays are harmless, discovery is
get-else-insert. Without Delta in this image, MERGE is emulated as
anti-join + rewrite with an atomic directory swap:

  * ``merge_insert_missing`` — ON CONFLICT DO NOTHING: left-anti join of the
    batch against current keys, append-only write of the new rows.
  * ``merge_upsert``        — ON CONFLICT DO UPDATE: current rows minus
    matched keys, union the batch, rewrite.

Scale note: on a cluster this is Delta/Iceberg MERGE (file-pruned, txn log).
The emulation preserves the semantics and the *write amplification* story is
kept honest: insert-missing appends only new files (O(batch)); upsert
rewrites the table (O(table)) — callers partition hot tables (e.g. transfer
by tenant) so the rewrite touches only affected partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TableStore:
    """A directory of named parquet tables with declared schemas.

    ``partitions`` maps table name → hive-partition columns. Partitioned
    tables get partition-pruned MERGE: an insert-missing batch only
    anti-joins against the partitions its keys touch, so upsert cost is
    O(affected partitions), not O(table) — the property that matters when
    ``transfer`` is 100 TB partitioned by tenant.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schemas: dict[str, T.StructType],
        partitions: dict[str, list[str]] | None = None,
    ):
        self.spark = spark
        self.root = root
        self.schemas = schemas
        self.partitions = partitions or {}
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self._path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" or f.count("=")
            for f in os.listdir(p)
        )

    def read(self, name: str) -> DataFrame:
        if not self.exists(name):
            return self.spark.createDataFrame([], self.schemas[name])
        reader = self.spark.read
        if self.partitions.get(name):
            # fix partition-column types (hive dirs would infer strings)
            reader = reader.schema(self.schemas[name])
        df = reader.parquet(self._path(name))
        # project to declared column order (schema is fixed, never inferred)
        return df.select(*[f.name for f in self.schemas[name].fields])

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Atomic replace: write to a temp dir, swap directories."""
        target = self._path(name)
        tmp = f"{target}.tmp-{uuid.uuid4().hex[:8]}"
        writer = df.select(*[f.name for f in self.schemas[name].fields]).write.mode(
            "overwrite"
        )
        if self.partitions.get(name):
            writer = writer.partitionBy(*self.partitions[name])
        writer.parquet(tmp)
        old = f"{target}.old-{uuid.uuid4().hex[:8]}"
        if os.path.isdir(target):
            os.rename(target, old)
        os.rename(tmp, target)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)
        # refresh cached file listings for this path only
        self.spark.catalog.refreshByPath(target)

    def append(self, name: str, df: DataFrame) -> None:
        writer = df.select(*[f.name for f in self.schemas[name].fields]).write.mode(
            "append"
        )
        if self.partitions.get(name):
            writer = writer.partitionBy(*self.partitions[name])
        writer.parquet(self._path(name))

    # ---- MERGE emulation ----------------------------------------------

    def merge_insert_missing(self, name: str, batch: DataFrame, keys: list[str]) -> int:
        """INSERT … ON CONFLICT DO NOTHING. Returns #rows inserted (the
        discovery metric the reference emits per entity —
        PrimaryDataExplorationService.scala:58,92,247)."""
        # dedupe the batch itself on PK first (replayed fixtures)
        fresh = batch.dropDuplicates(keys)
        if self.exists(name):
            current = self.read(name)
            # partition-pruned anti-join: only scan partitions the batch
            # touches (O(batch partitions), not O(table))
            pcols = [c for c in self.partitions.get(name, []) if c in keys]
            if pcols:
                pvals = fresh.select(*pcols).distinct().collect()
                if 0 < len(pvals) <= 1000:
                    for i, c in enumerate(pcols):
                        current = current.filter(
                            F.col(c).isin([row[i] for row in pvals])
                        )
            # no broadcast hint on current_keys: that side is the TABLE's key
            # set (unbounded at scale — forcing it driver-side is an OOM
            # hazard); AQE picks broadcast itself iff the pruned side is small
            current_keys = current.select(*keys)
            fresh = fresh.join(current_keys, keys, "left_anti")
        # materialize to a staging dir FIRST, then move the part files in:
        # appending from a plan that reads the target dir could recompute
        # mid-append (cache eviction) and observe its own output — the
        # classic read-your-own-append duplication hazard
        staging = f"{self._path(name)}.stage-{uuid.uuid4().hex[:8]}"
        writer = fresh.select(*[f.name for f in self.schemas[name].fields]).write.mode(
            "overwrite"
        )
        if self.partitions.get(name):
            writer = writer.partitionBy(*self.partitions[name])
        writer.parquet(staging)
        n = self._adopt_files(staging, self._path(name))
        shutil.rmtree(staging, ignore_errors=True)
        if n:
            self.spark.catalog.refreshByPath(self._path(name))
        return n

    def _adopt_files(self, staging: str, target: str) -> int:
        """Move parquet part files from staging into the table dir (file-level
        append — no recomputation window). Returns row count adopted."""
        import pyarrow.parquet as pq

        n_rows = 0
        os.makedirs(target, exist_ok=True)
        for dirpath, _dirnames, filenames in os.walk(staging):
            rel = os.path.relpath(dirpath, staging)
            for fname in filenames:
                if not fname.endswith(".parquet"):
                    continue
                src = os.path.join(dirpath, fname)
                n_rows += pq.read_metadata(src).num_rows
                dest_dir = target if rel == "." else os.path.join(target, rel)
                os.makedirs(dest_dir, exist_ok=True)
                os.rename(src, os.path.join(dest_dir, f"adopt-{uuid.uuid4().hex[:8]}-{fname}"))
        return n_rows

    def merge_upsert(
        self, name: str, batch: DataFrame, keys: list[str]
    ) -> tuple[int, int]:
        """INSERT … ON CONFLICT DO UPDATE. Returns (#inserted, #updated)."""
        fresh = batch.dropDuplicates(keys).cache()
        if not self.exists(name):
            n = fresh.count()
            self.overwrite(name, fresh)
            fresh.unpersist()
            return n, 0
        current = self.read(name).cache()
        batch_keys = fresh.select(*keys)
        kept = current.join(F.broadcast(batch_keys), keys, "left_anti")
        n_total = current.count()
        n_kept_plus = kept.count()
        merged = kept.unionByName(fresh)
        self.overwrite(name, merged)
        n_new = fresh.count()
        fresh.unpersist()
        current.unpersist()
        n_updated = n_total - n_kept_plus
        return n_new - n_updated, n_updated
