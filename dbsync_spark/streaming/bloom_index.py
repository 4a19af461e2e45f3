"""Streaming decontamination service: a Bloom-prefiltered held-out-set
index maintained across micro-batches.

The batch operator (functions/sketch.py::decontaminate) builds the test
split's shingle Bloom in one pass; this module maintains it as a
SERVICE: benchmark/test documents arrive in micro-batches (new eval sets
get registered over time), each batch appends its novel shingle hashes
and ORs its bits into the persisted bitmap, and `flag(train_df)` scores
a training corpus against the accumulated held-out set at any point.

Why stream == batch is EXACT: the bitmap is a bitwise OR of per-shingle
bit patterns — associative, commutative, AND idempotent — and the exact
hash set is a plain set union, so any batching of the same test docs
yields the identical (bitmap, hash set) state, and `flag` output equals
the one-pass batch decontaminate. OR's idempotence also makes bitmap
replay trivially safe; the hash-set deltas use the epoch-scoped
append-only discipline (epoch N persists only hashes unseen in state
< N, so a replayed epoch rewrites exactly its own delta).

Storage layout:
- <root>/shash/epoch=N  : (shash) — NEW distinct test shingle hashes
  first seen in epoch N (union over epochs = the exact set)
- <root>/bitmap/epoch=N : (bm binary) 1 row — cumulative Bloom bitmap
  after epoch N (latest wins; epoch N reads only state < N)

No per-document removal: the state is deliberately doc-AGNOSTIC (a
hash set + a bitmap — shared shingles have no owner), so forgetting an
eval document means rebuilding from the surviving eval docs; the
doc-attributed indexes (search_index.ForgettingSearchIndex,
dedup_index.ForgettingDedupIndex) are the ones that support tombstone
forgetting.

Scale: per batch, shingling is row-local and the anti-join touches only
the batch's hashes; the bitmap is a fixed m/8 bytes (128 KB at the
default 2^20 bits) no matter how many eval sets accumulate. Scoring a
100 TB train corpus broadcasts that bitmap, prefilters train shingles
vectorized, and exact-verifies only the flagged residue — the same
two-phase topology as the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from dbsync_spark.functions.sketch import (_build_bloom, bloom_flag_clean,
                                           shingle_hash_rows)
from dbsync_spark.sources.tables import read_state
from dbsync_spark.streaming.state import next_epoch

_SHASH_SCHEMA = StructType([StructField("shash", LongType())])
_BITMAP_SCHEMA = StructType([StructField("bm", BinaryType())])


class StreamingBloomIndex:
    """Incremental held-out-set index over parquet state dirs. Call
    `process_batch` with each batch of test/eval documents (directly or
    via `foreach_batch_handler()`), then `flag` training corpora."""

    def __init__(self, spark: SparkSession, root: str, k: int = 3,
                 bloom_bits: int = 1 << 20, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.k = k
        self.m = bloom_bits
        self.text_col = text_col
        self.id_col = id_col

    def _epochs(self, sub: str) -> list[int]:
        from dbsync_spark.streaming.state import list_epochs

        return list_epochs(self.root, sub)

    def _hashes_through(self, epochs: list[int]) -> DataFrame:
        if not epochs:
            return self.spark.createDataFrame([], _SHASH_SCHEMA)
        paths = [f"{self.root}/shash/epoch={e}" for e in epochs]
        return self.spark.read.schema(_SHASH_SCHEMA).parquet(*paths)

    def _bitmap(self, epoch: int | None) -> bytes:
        if epoch is None:
            return bytes(self.m // 8)
        row = read_state(self.spark, f"{self.root}/bitmap/epoch={epoch}",
                         read_schema=_BITMAP_SCHEMA,
                         empty_schema=_BITMAP_SCHEMA).first()
        return bytes(row["bm"]) if row is not None else bytes(self.m // 8)

    def process_batch(self, test_docs: DataFrame,
                      epoch_id: int | None = None) -> None:
        """Fold one micro-batch of held-out documents into the index."""
        import numpy as np

        if epoch_id is None:
            epoch_id = next_epoch(self.root, "shash")
        before = [e for e in self._epochs("shash") if e < epoch_id]

        sh = shingle_hash_rows(test_docs, text_col=self.text_col,
                               id_col=self.id_col, k=self.k
                               ).select("shash").distinct()
        delta = sh.join(self._hashes_through(before), on="shash",
                        how="anti")
        # a batch's novel-hash delta is small relative to the corpus —
        # one file per epoch keeps the union read O(n_epochs) files
        delta.coalesce(1).write.mode("overwrite").parquet(
            f"{self.root}/shash/epoch={epoch_id}")

        prev_eps = [e for e in self._epochs("bitmap") if e < epoch_id]
        prev = np.frombuffer(
            self._bitmap(prev_eps[-1] if prev_eps else None),
            dtype=np.uint8)
        batch_bm = np.frombuffer(
            _build_bloom(self.spark.read.schema(_SHASH_SCHEMA).parquet(
                f"{self.root}/shash/epoch={epoch_id}"), self.m),
            dtype=np.uint8)
        merged = bytes(prev | batch_bm)
        self.spark.createDataFrame([(bytearray(merged),)], _BITMAP_SCHEMA
                                   ).coalesce(1).write.mode("overwrite"
                                   ).parquet(
            f"{self.root}/bitmap/epoch={epoch_id}")

    def foreach_batch_handler(self):
        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            self.process_batch(batch_df, epoch_id)

        return handle

    def flag(self, train_df: DataFrame) -> DataFrame:
        """(id, n_shingles) for train docs sharing NO shingle with the
        accumulated held-out set — equals the batch decontaminate over
        the union of every processed test batch.

        Soundness guard (no false-clean window): the exact hash set is
        restricted to epochs whose BITMAP write also landed, and the
        bitmap used is the OR of every persisted bitmap epoch. Each
        bitmap epoch contains its own delta's bits, so every hash in the
        used exact set is covered — even if process_batch crashed
        between the shash and bitmap writes (that epoch's hashes are
        excluded until replay) or epochs were processed out of order
        (a later-written earlier epoch's bits OR in regardless of which
        epoch is 'latest')."""
        import numpy as np

        bm_eps = self._epochs("bitmap")
        covered = [e for e in self._epochs("shash") if e in set(bm_eps)]
        test_hashes = self._hashes_through(covered)
        acc = np.frombuffer(bytes(self.m // 8), dtype=np.uint8).copy()
        for e in bm_eps:
            acc |= np.frombuffer(self._bitmap(e), dtype=np.uint8)
        train_sh = shingle_hash_rows(train_df, text_col=self.text_col,
                                     id_col=self.id_col, k=self.k)
        return bloom_flag_clean(train_sh, test_hashes, bytes(acc), self.m,
                                id_col=self.id_col)
