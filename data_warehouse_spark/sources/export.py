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


CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, mode: str = "FAILFAST"
) -> DataFrame:
    """Read a JSONL export using the manifest's schema (no inference pass).

    ``mode`` is Spark's JSON parser policy — the malformed-input contract
    every external-format source needs once data arrives from outside the
    engine's own sink:

      FAILFAST       (default) any malformed line aborts the read — right
                     for manifest-checked handoffs, where corruption means
                     the producer broke its contract
      DROPMALFORMED  silently skip bad lines (lossy — prefer quarantine)
      PERMISSIVE     bad lines become NULL rows carrying the raw text in
                     ``_corrupt_record`` (use :func:`read_jsonl_quarantine`
                     for the split)
    """
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    schema = T.StructType.fromJson(manifest["schema"])
    if mode.upper() == "PERMISSIVE":
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("mode", mode.upper())
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_jsonl_quarantine(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE read split into (good rows, quarantined raw lines).

    The production shape for untrusted feeds: good rows flow on with the
    manifest schema (corrupt column dropped), bad lines land in a
    quarantine DataFrame with the raw text for triage — nothing is lost,
    nothing poisons downstream aggregates. The parse is materialized ONCE
    to storage (Spark refuses corrupt-column-only queries on a raw read,
    and re-parsing for each branch would double the scan anyway); the
    caller decides where to sink the quarantine.
    """
    from ..materialize import storage_checkpoint

    parsed = storage_checkpoint(read_jsonl(spark, path, mode="PERMISSIVE"))
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
