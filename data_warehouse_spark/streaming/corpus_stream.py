"""Streaming corpus ingestion with incremental near-dup gating.

The end-to-end production pipeline the batch operators compose into: a
document stream (file source, Kafka, ...) lands in micro-batches; each
batch is deduplicated against everything already ingested — exact ids via
keyed MERGE, near-duplicates via the persisted MinHash signature store —
and only the survivors (plus their signatures) are appended. The corpus
and its signature store grow together, so batch N+1 is automatically
gated against batch N's content.

Scale shape per micro-batch (the whole point — cost is O(batch), never
O(corpus)):

  sign      only the batch pays shingling+hashing (map-side);
  probe     batch band keys broadcast against the stored band-key
            projection — the corpus store is scanned once, column-pruned,
            and with the store partitioned by band_key (see
            ``dedup.band_keys``) the probe prunes to matching buckets;
  verify    exact Jaccard fetches corpus shingles for candidate ids only;
  append    TableStore MERGE on doc_id — replays (at-least-once upstream,
            foreachBatch re-delivery) insert nothing twice, and
            ``incremental_minhash_dedup`` never matches a re-submitted id
            against itself, so the pipeline is idempotent end-to-end
            without a transactional log.

Wire it as ``docs_stream.writeStream.foreachBatch(CorpusDedupSink(store))``
— or call the sink directly from an incremental batch loop, exactly like
the reference's 2 s re-crawl tick (PrimaryDataExplorerActor.scala:34,43
drives the same once-per-tick batch shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup
from ..sources.tables import TableStore

CORPUS_TABLE = "corpus"
SIGS_TABLE = "corpus_signatures"


def signature_schema(docs_like: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3):
    """The signature store's schema, derived from the operator itself (one
    source of truth — column count tracks the MinHash geometry)."""
    return dedup.minhash_signatures(docs_like.limit(0), id_col, text_col, shingle_n).schema


class CorpusDedupSink:
    """``foreachBatch`` hook maintaining a deduplicated corpus + signature
    store inside ``store`` (a :class:`TableStore`). Create the store with
    :func:`corpus_store` or equivalent schemas."""

    def __init__(
        self,
        store: TableStore,
        id_col: str = "doc_id",
        text_col: str = "text",
        shingle_n: int = 3,
        bands: int = 8,
        rows_per_band: int = 2,
        threshold_x1000: int = 600,
    ):
        self.store = store
        self.id_col = id_col
        self.text_col = text_col
        self.shingle_n = shingle_n
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.threshold_x1000 = threshold_x1000
        # reused per-sink scratch dirs: a long-running stream must not leak
        # one checkpoint dir per micro-batch (safe — each batch's checkpoint
        # is fully consumed before the next batch overwrites it)
        self._sig_scratch = f"{store.root}/.scratch-sigs"
        self._surv_scratch = f"{store.root}/.scratch-survivors"

    def __call__(self, batch_df: DataFrame, epoch_id: int | None = None) -> int:
        """Gate one micro-batch; returns the number of rows actually
        INSERTED into the corpus (the discovery metric — a full replay
        returns 0: replayed ids pass the near-dup gate unflagged by
        design, and the keyed MERGE then inserts nothing)."""
        known = self.store.read(SIGS_TABLE)
        # sign the batch exactly once; the same materialized signatures feed
        # the dedup probe AND the store append (signing twice would double
        # the per-batch shingle+hash cost for nothing)
        nsig = dedup._storage_checkpoint(
            dedup.minhash_signatures(
                batch_df, self.id_col, self.text_col, self.shingle_n
            ),
            path=self._sig_scratch,
        )
        # one deterministic materialization of the survivor set: the corpus
        # append, the signature append, and the return count must all see
        # the same rows (a lazy plan would re-evaluate nondeterministically
        # against a store the first append just changed)
        survivors = dedup._storage_checkpoint(
            dedup.dedup_batch_against(
                batch_df,
                known,
                id_col=self.id_col,
                text_col=self.text_col,
                shingle_n=self.shingle_n,
                bands=self.bands,
                rows_per_band=self.rows_per_band,
                threshold_x1000=self.threshold_x1000,
                new_signatures=nsig,
            ),
            path=self._surv_scratch,
        )
        inserted = self.store.merge_insert_missing(
            CORPUS_TABLE, survivors, [self.id_col]
        )
        surviving_sigs = nsig.join(
            survivors.select(F.col(self.id_col).alias("doc_id")), "doc_id", "left_semi"
        )
        self.store.merge_insert_missing(SIGS_TABLE, surviving_sigs, ["doc_id"])
        return inserted


def corpus_store(
    spark,
    root: str,
    docs_like: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> TableStore:
    """A TableStore wired for :class:`CorpusDedupSink`: the corpus table
    uses the incoming document schema, the signature table the operator's.
    Pass the same ``id_col``/``text_col``/``shingle_n`` the sink will use."""
    return TableStore(
        spark,
        root,
        {
            CORPUS_TABLE: docs_like.schema,
            SIGS_TABLE: signature_schema(docs_like, id_col, text_col, shingle_n),
        },
    )


class EmbeddingIndexSink:
    """``foreachBatch`` hook keeping a stored IVF index fresh from an
    embedding stream — the vector sibling of :class:`CorpusDedupSink`:
    each micro-batch is gated to genuinely-new ids (replays and
    re-deliveries append nothing twice) and the survivors are assigned to
    the STORED centroids and appended to the cell-partitioned corpus
    (``similarity.append_to_ivf_index``) — index freshness with no
    rebuild, serving continues against the same artifact.

    Per-batch cost is O(batch), with the join directions chosen for it:
    the batch's ids are BROADCAST into a semi-join against the index's id
    column (a column-pruned scan that streams — a direct anti-join could
    only build on the corpus side, degrading to an O(corpus) shuffle per
    batch), producing the ≤ batch-sized set of already-known ids; the
    batch then anti-joins that small set. Assignment is map-side against
    centroid literals and the write touches only the cells the batch
    lands in. The index must exist (``similarity.save_ivf_index``) before
    the stream starts.
    """

    def __init__(self, index_path: str, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.index_path = index_path
        self.id_col = id_col
        self.vec_col = vec_col
        self._scratch = f"{index_path}/.scratch-gate"

    def __call__(self, batch_df: DataFrame, epoch_id: int | None = None) -> int:
        """Gate + append one micro-batch; returns #vectors appended."""
        from ..materialize import storage_checkpoint
        from ..operators import similarity

        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([self.id_col])
        bids = batch.select(F.col(self.id_col).alias("__bid"))
        known_hits = (
            similarity.stored_index_ids(spark, self.index_path)
            .join(
                F.broadcast(bids),
                F.col(similarity.IVF_ID_COLUMN) == F.col("__bid"),
                "left_semi",
            )
            .select(F.col(similarity.IVF_ID_COLUMN).alias("__known_id"))
        )
        # reused scratch path: one checkpoint dir per sink, not per batch
        fresh = storage_checkpoint(
            batch.join(
                F.broadcast(known_hits),
                batch[self.id_col] == F.col("__known_id"),
                "left_anti",
            ),
            path=self._scratch,
        )
        if fresh.isEmpty():
            return 0
        # the append's internal checkpoint reuses a per-sink scratch dir
        # too — without it every batch would leak a process-lifetime temp
        # dir holding a full copy of the batch
        return similarity.append_to_ivf_index(
            fresh,
            self.index_path,
            id_col=self.id_col,
            vec_col=self.vec_col,
            scratch_dir=f"{self.index_path}/.scratch-append",
        )
