"""Corpus export/import: sharded JSONL, the LLM-pipeline handoff format.

Training-data pipelines hand corpora downstream as N roughly-equal JSONL
shards (one JSON object per line). Spark's json writer IS line-delimited
JSON, so the sink stays fully distributed — the only added semantics are

  * deterministic sharding: ``shard_by`` hash-partitions on a key column,
    so a doc lands in the same shard across runs (resumable consumers),
    while plain ``n_shards`` just round-robins for size balance;
  * a driver-written ``manifest.json`` with the row count and schema, the
    contract file downstream loaders check before reading data files.

Read side re-applies the explicit schema — JSONL carries no types, and
schema inference is a full extra pass at 100 TB.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# leading underscore: Spark's path filter skips _-prefixed files (like
# _SUCCESS), so the manifest never shadows a data shard on read
MANIFEST = "_manifest.json"


def export_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    shard_by: str | None = None,
    compression: str | None = None,
) -> int:
    """Write ``df`` as sharded JSONL + manifest; returns the row count."""
    out = df
    if shard_by is not None:
        out = out.repartition(n_shards or 1, F.col(shard_by))
    elif n_shards is not None:
        out = out.repartition(n_shards)
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    # count what was WRITTEN, not a re-execution of the input plan — a
    # nondeterministic upstream (sample, unordered limit) would make
    # df.count() disagree with the shards the consumer actually reads
    n = df.sparkSession.read.schema(df.schema).json(path).count()
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump({"rows": n, "schema": df.schema.jsonValue()}, f)
    return n


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL export using the manifest's schema (no inference pass)."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    schema = T.StructType.fromJson(manifest["schema"])
    return spark.read.schema(schema).json(path)
