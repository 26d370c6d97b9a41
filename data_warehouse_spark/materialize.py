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
