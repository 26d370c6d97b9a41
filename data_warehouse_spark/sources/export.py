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

import io
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# leading underscore: Spark's path filter skips _-prefixed files (like
# _SUCCESS), so the manifest never shadows a data shard on read
MANIFEST = "_manifest.json"


def _reshard(
    df: DataFrame, n_shards: int | None, shard_by: str | None
) -> DataFrame:
    """The one shared sharding contract for every export sink here:
    ``shard_by`` hash-partitions on the key (deterministic key→shard
    placement; single shard when ``n_shards`` is omitted), plain
    ``n_shards`` round-robins for size balance, neither = input layout."""
    if shard_by is not None:
        return df.repartition(n_shards or 1, F.col(shard_by))
    if n_shards is not None:
        return df.repartition(n_shards)
    return df


def export_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    shard_by: str | None = None,
    compression: str | None = None,
) -> int:
    """Write ``df`` as sharded JSONL + manifest; returns the row count."""
    out = _reshard(df, n_shards, shard_by)
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


# --- WebDataset-style tar shards ---------------------------------------------
# The training-loader handoff format for multimodal corpora (Beaumont et
# al.'s webdataset convention, used by img2dataset / OpenCLIP pipelines):
# N tar files, each sample a group of files sharing a key stem —
# "<key>.txt", "<key>.jpg", "<key>.json" — so a loader streams samples
# sequentially with zero random I/O. The tar layer is plain Python (an
# I/O-bound sink, not a compute path); everything upstream stays
# DataFrame-distributed and each task writes exactly one shard.

WDS_MANIFEST = "_wds_manifest.json"


def export_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int | None = None,
    shard_by: str | None = None,
) -> int:
    """Write ``df`` as WebDataset tar shards + manifest; returns row count.

    Every non-key column becomes one file per sample: BinaryType bytes
    verbatim (name the column with its extension — ``jpg``, ``wav``),
    StringType as UTF-8, anything else JSON-encoded under
    ``<column>.json``. ``shard_by`` gives deterministic key→shard
    placement (resumable consumers); plain ``n_shards`` round-robins for
    size balance. Shard files are byte-reproducible: rows sorted by key
    within each shard, tar metadata (mtime/uid/gid) zeroed — re-exports of
    the same data produce identical bytes (and a retried task overwrites
    its own shard idempotently).

    Executors write ``shard-<id>.tar`` directly under ``path`` — on a
    cluster that path must be shared storage (object-store mount / NFS),
    the same contract as every file sink here.
    """
    import tarfile

    fields = [(f.name, f.dataType.typeName()) for f in df.schema.fields]
    if key_col not in [n for n, _ in fields]:
        raise ValueError(f"key_col {key_col!r} not in DataFrame columns")
    components = [(n, t) for n, t in fields if n != key_col]
    for n, t in components:
        # a string/binary column named "json" would write "<key>.json" —
        # indistinguishable on read from the writer's own JSON-encoding
        # suffix. Refuse up front instead of mangling the round trip.
        if n == "json" and t in ("binary", "string"):
            raise ValueError(
                "a string/binary component named 'json' collides with the "
                "JSON-encoding suffix; rename the column (e.g. 'meta')"
            )
    os.makedirs(path, exist_ok=True)
    # a re-export is a full replace, like every overwrite-mode sink: stale
    # shards from a previous (larger) export must not survive to be read
    for f in os.listdir(path):
        if f.endswith(".tar") or ".tar.tmp-" in f or f == WDS_MANIFEST:
            os.remove(os.path.join(path, f))

    out = _reshard(df, n_shards, shard_by).sortWithinPartitions(key_col)

    def write_shard(idx: int, rows) -> list[int]:
        shard = os.path.join(path, f"shard-{idx:05d}.tar")
        # per-ATTEMPT temp name: concurrent speculative/zombie attempts each
        # write their own file; whichever os.replace lands last publishes a
        # complete tar (same-path .tmp would interleave two writers)
        tmp = f"{shard}.tmp-{uuid.uuid4().hex[:8]}"
        n = 0
        with tarfile.open(tmp, "w") as tar:
            for row in rows:
                key = str(row[key_col])
                for name, kind in components:
                    v = row[name]
                    if v is None:
                        continue
                    if kind == "binary":
                        data = bytes(v)
                        fname = f"{key}.{name}"
                    elif kind == "string":
                        data = v.encode("utf-8")
                        fname = f"{key}.{name}"
                    else:
                        data = json.dumps(v, default=str).encode("utf-8")
                        fname = f"{key}.{name}.json"
                    info = tarfile.TarInfo(fname)
                    info.size = len(data)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(data))
                n += 1
        if n == 0:
            os.remove(tmp)
        else:
            os.replace(tmp, shard)  # atomic publish
        return [n]

    counts = out.rdd.mapPartitionsWithIndex(write_shard).collect()
    total = int(sum(counts))
    with open(os.path.join(path, WDS_MANIFEST), "w") as f:
        json.dump(
            {
                "rows": total,
                "key": key_col,
                "components": [n for n, _ in components],
                "shards": sum(1 for c in counts if c),
            },
            f,
        )
    return total


WDS_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("component", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read tar shards back as long-format samples
    (shard, key, component, content) — one row per member file.

    Each tar is one ``binaryFile`` row fanned out by an Arrow-batched
    ``mapInPandas`` (a tar cannot be split mid-stream — the shard is the
    parallelism unit, exactly the property the format is built around).
    Component names strip the trailing ``.json`` marker the writer added
    for JSON-encoded columns; reassembly to wide rows is a
    ``groupBy(key).pivot(component)`` away when the consumer wants it.
    """
    import tarfile

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out = {"shard": [], "key": [], "component": [], "content": []}
            for p, raw in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                with tarfile.open(fileobj=io.BytesIO(bytes(raw))) as tar:
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        stem = m.name
                        if stem.endswith(".json"):
                            stem = stem[: -len(".json")]
                        key, _, comp = stem.rpartition(".")
                        out["shard"].append(shard)
                        out["key"].append(key)
                        out["component"].append(comp)
                        out["content"].append(tar.extractfile(m).read())
            yield pd.DataFrame(out)

    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )
    return blobs.mapInPandas(parse, WDS_SAMPLE_SCHEMA)
