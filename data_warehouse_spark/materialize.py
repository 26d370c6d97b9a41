"""Deterministic plan materialization shared across operator modules.

``storage_checkpoint`` writes a DataFrame to temp parquet and reads it
back — the cluster-scale way to pin an expensive or nondeterministic
intermediate that feeds multiple plan branches (MinHash signatures, LM
gram counts, micro-batch survivor sets). Unlike ``persist()`` it leaves
zero cached RDDs behind in long-lived sessions (bench best-of-N, servers);
unlike ``localCheckpoint()`` it survives executor loss. Temp dirs are
removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame


def driver_df(spark, rows, schema) -> DataFrame:
    """createDataFrame for a SMALL driver-owned row batch as ONE slice.

    The default ``createDataFrame(list, schema)`` parallelizes local rows
    into ``defaultParallelism`` (32 here) python slices, and every
    downstream evaluation of the frame — each broadcast build, each join
    re-execution — pays a python-worker round trip PER SLICE. Measured on
    this box: a 25-row broadcast build side costs 1.13 s from a 32-slice
    source vs 0.42 s from one slice (r12 probe; same pathology the r11
    ingest tick measured at 1.55 s vs 0.74 s for a 500-row staging write).
    These batches are O(queries)/O(keys) rows by contract, so one python
    slice is the right parallelism (guide §2.2: fewer, larger tasks)."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def storage_checkpoint(df: DataFrame, path: str | None = None) -> DataFrame:
    """Pass ``path`` for a REUSED scratch location (overwritten per call):
    repeated callers — a foreachBatch sink checkpointing every micro-batch
    — must not accumulate one temp dir per invocation for the process
    lifetime. Only safe when the previous checkpoint at that path is no
    longer referenced (true for sequential micro-batches)."""
    if path is None:
        path = tempfile.mkdtemp(prefix="dwh-ckpt-")
        atexit.register(shutil.rmtree, path, True)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
