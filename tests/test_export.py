"""JSONL export round-trips exactly, shards deterministically, and the
manifest carries the contract downstream loaders check."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from data_warehouse_spark.sources.export import MANIFEST, export_jsonl, read_jsonl

from .conftest import SF_DIR


def test_jsonl_roundtrip_exact(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "corpus")
    n = export_jsonl(docs, out, n_shards=4)
    assert n == docs.count()
    back = read_jsonl(spark, out)
    assert back.schema == docs.schema
    nullsafe = lambda rows: sorted(
        (tuple((v is None, v) for v in r) for r in rows)
    )
    assert nullsafe(back.collect()) == nullsafe(docs.collect())


def test_jsonl_shard_count_and_manifest(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    out = str(tmp_path / "sharded")
    n = export_jsonl(docs, out, n_shards=3)
    parts = [p for p in glob.glob(os.path.join(out, "part-*")) if not p.endswith(".crc")]
    assert len(parts) == 3
    with open(os.path.join(out, MANIFEST)) as f:
        m = json.load(f)
    assert m["rows"] == n == 100
    assert any(f["name"] == "doc_id" for f in m["schema"]["fields"])


def test_jsonl_shard_by_is_deterministic(spark, tmp_path):
    """Same key → same shard file index across two exports (hash
    partitioning, not round-robin)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")

    def shard_map(path):
        out = {}
        parts = sorted(
            p
            for p in glob.glob(os.path.join(path, "part-*"))
            if not p.endswith(".crc")
        )
        for i, p in enumerate(parts):
            with open(p) as f:
                for line in f:
                    out[json.loads(line)["doc_id"]] = i
        return out

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_jsonl(docs, a, n_shards=4, shard_by="doc_id")
    export_jsonl(docs.orderBy(F.rand(seed=1)), b, n_shards=4, shard_by="doc_id")
    assert shard_map(a) == shard_map(b)


def test_read_jsonl_malformed_line_policies(spark, tmp_path):
    import pytest

    from data_warehouse_spark.sources.export import read_jsonl_quarantine

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")
    out = str(tmp_path / "jl")
    n = export_jsonl(docs, out, n_shards=2)
    # corrupt one shard: append garbage + truncate-style half json
    shard = sorted(
        p for p in glob.glob(os.path.join(out, "part-*")) if not p.endswith(".crc")
    )[0]
    with open(shard, "a") as f:
        f.write("not json at all\n")
        f.write('{"doc_id": 999999, "lang": \n')
    # drop the LocalFS checksum sidecar the append just invalidated —
    # otherwise every mode fails on ChecksumException, not the parser
    crc = os.path.join(os.path.dirname(shard), f".{os.path.basename(shard)}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    # FAILFAST (the default): corruption aborts the read (surfaces as a
    # raw JVM FAILED_READ_FILE error, not a typed PySparkException)
    with pytest.raises(Exception, match="FAILED_READ_FILE|Malformed"):
        read_jsonl(spark, out).count()
    # DROPMALFORMED: bad lines silently gone
    assert read_jsonl(spark, out, mode="DROPMALFORMED").count() == n
    # quarantine split: good rows intact + exactly the 2 bad raw lines
    good, bad = read_jsonl_quarantine(spark, out)
    assert good.count() == n
    assert good.columns == ["doc_id", "lang"]
    raws = [r["raw_line"] for r in bad.collect()]
    assert len(raws) == 2 and any("not json" in r for r in raws)


# --- WebDataset tar shards ----------------------------------------------------


def _media_df(spark, n=40):
    from data_warehouse_spark import catalog as cat
    from data_warehouse_spark.operators import multimodal

    docs = cat.load_table(spark, SF_DIR, "documents").limit(n)
    return multimodal.media_from_documents(docs).select(
        "media_id", "kind", "payload", "mime"
    )


def test_webdataset_round_trip_bytes_exact(spark, tmp_path):
    from data_warehouse_spark.sources import export as ex

    df = _media_df(spark)
    out = str(tmp_path / "wds")
    n = ex.export_webdataset(df, out, key_col="media_id", n_shards=3)
    assert n == df.count()

    back = ex.read_webdataset(spark, out).collect()
    by_kc = {(r["key"], r["component"]): bytes(r["content"]) for r in back}
    assert len(by_kc) == len(back)  # no duplicate sample files
    for r in df.collect():
        k = str(r["media_id"])
        assert by_kc[(k, "payload")] == bytes(r["payload"])
        assert by_kc[(k, "kind")].decode() == r["kind"]
        assert by_kc[(k, "mime")].decode() == r["mime"]
    # every sample accounted for: 3 components per row
    assert len(by_kc) == 3 * n


def test_webdataset_shards_are_byte_reproducible(spark, tmp_path):
    import hashlib
    import os

    from data_warehouse_spark.sources import export as ex

    df = _media_df(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ex.export_webdataset(df, a, key_col="media_id", n_shards=2, shard_by="media_id")
    ex.export_webdataset(df, b, key_col="media_id", n_shards=2, shard_by="media_id")

    def digests(root):
        return {
            f: hashlib.sha256(open(os.path.join(root, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(root))
            if f.endswith(".tar")
        }

    da, db = digests(a), digests(b)
    assert da and da == db


def test_webdataset_manifest_counts(spark, tmp_path):
    import json
    import os

    from data_warehouse_spark.sources import export as ex

    df = _media_df(spark, n=10)
    out = str(tmp_path / "wds")
    n = ex.export_webdataset(df, out, key_col="media_id", n_shards=4)
    m = json.load(open(os.path.join(out, ex.WDS_MANIFEST)))
    assert m["rows"] == n == 10
    assert m["key"] == "media_id"
    assert set(m["components"]) == {"kind", "payload", "mime"}
    tars = [f for f in os.listdir(out) if f.endswith(".tar")]
    assert len(tars) == m["shards"] <= 4


def test_webdataset_reexport_replaces_stale_shards(spark, tmp_path):
    from data_warehouse_spark.sources import export as ex

    big, small = _media_df(spark, 40), _media_df(spark, 6)
    out = str(tmp_path / "wds")
    ex.export_webdataset(big, out, key_col="media_id", n_shards=4)
    n = ex.export_webdataset(small, out, key_col="media_id", n_shards=2)
    # shards from the larger first export must not survive to be read
    keys = {r["key"] for r in ex.read_webdataset(spark, out).collect()}
    assert keys == {str(r["media_id"]) for r in small.collect()}
    assert len(keys) == n == 6


def test_webdataset_rejects_ambiguous_json_component(spark, tmp_path):
    import pytest

    from data_warehouse_spark.sources import export as ex

    df = _media_df(spark, 5).withColumnRenamed("mime", "json")
    with pytest.raises(ValueError, match="json"):
        ex.export_webdataset(df, str(tmp_path / "w"), key_col="media_id")
