"""Streaming EXACT set-similarity join: the AllPairs/PPJoin operator
(functions/dedup.py::similarity_join) run as a persisted-state SERVICE.

Documents arrive in micro-batches; each batch emits exactly the NEW
qualifying pairs (new-vs-index and new-vs-new) and appends its hashed
shingle-set rows for later batches. Because the operator is EXACT — no
bands, no bucket caps — union-over-batches == full recompute holds BY
CONSTRUCTION at any batching (the qualifying-pair set decomposes by the
batch of each pair's later-arriving doc). This is the guarantee the LSH
StreamingDedupIndex can only give when no bucket crosses its skew cap
mid-stream; the price is the exact operator's higher probe cost.

Storage layout (plain parquet epoch dirs, shared state discipline):
- <root>/sets  : (doc_id, _h)                      — hashed shingle sets
- <root>/pairs : (doc_a, doc_b, n_inter, n_union)  — accumulated output

Scale: per batch, the probe recomputes global document frequencies over
the union corpus (one narrow aggregate — frequencies must be global for
the prefix bound to stay sound) and joins new-doc prefixes against all
prefixes; the verify is row-local array intersection. State stays
integer-narrow: 8-byte hashes, never shingle strings or raw text —
unlike the LSH index, no text column needs persisting at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from dbsync_spark.functions.dedup import (hashed_shingle_sets,
                                          similarity_join_incremental)
from dbsync_spark.sources.tables import read_state
from dbsync_spark.streaming.state import next_epoch, write_parts

_SETS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("_h", LongType()),
])
_PAIRS_SCHEMA = StructType([
    StructField("doc_a", LongType()),
    StructField("doc_b", LongType()),
    StructField("n_inter", LongType()),
    StructField("n_union", LongType()),
])


class StreamingSimJoinIndex:
    """Incremental exact similarity join over parquet state dirs. Call
    `process_batch` per micro-batch (directly, or via
    `foreach_batch_handler()` from a writeStream)."""

    def __init__(self, spark: SparkSession, root: str,
                 threshold_num: int = 4, threshold_den: int = 5,
                 shingle_fn=None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.num = threshold_num
        self.den = threshold_den
        self.shingle_fn = shingle_fn

    def _read(self, sub: str, schema: StructType) -> DataFrame:
        df = read_state(self.spark, f"{self.root}/{sub}",
                        read_schema=schema, empty_schema=schema)
        # project away the epoch partition column the dir layout adds —
        # set rows union with freshly computed (epoch-less) batch rows
        return df.select(*schema.fieldNames())

    def process_batch(self, new_docs: DataFrame,
                      epoch_id: int | None = None) -> DataFrame:
        """Probe the index with a batch of (doc_id, text) docs, append
        the batch's hashed set rows, persist and return the new pairs.
        Batch doc_ids must be globally unique (the CDC id contract)."""
        if epoch_id is None:
            epoch_id = next_epoch(self.root, "sets")
        new_docs = new_docs.select("doc_id", "text")
        batch_sets = hashed_shingle_sets(new_docs,
                                         shingle_fn=self.shingle_fn)
        # epoch-scoped overwrite: replaying a failed epoch rewrites its
        # own files instead of double-appending
        (batch_sets.coalesce(write_parts(self.spark))
         .write.mode("overwrite")
         .parquet(f"{self.root}/sets/epoch={epoch_id}"))
        all_sets = self._read("sets", _SETS_SCHEMA)
        new_ids = new_docs.select("doc_id").distinct()
        index_sets = all_sets.join(F.broadcast(new_ids), on="doc_id",
                                   how="anti")
        pairs, _ = similarity_join_incremental(
            index_sets, new_docs, threshold_num=self.num,
            threshold_den=self.den, shingle_fn=self.shingle_fn)
        (pairs.coalesce(write_parts(self.spark))
         .write.mode("overwrite")
         .parquet(f"{self.root}/pairs/epoch={epoch_id}"))
        return self.spark.read.parquet(
            f"{self.root}/pairs/epoch={epoch_id}")

    def foreach_batch_handler(self):
        """Adapter for `writeStream.foreachBatch` over a (doc_id, text)
        stream."""
        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            self.process_batch(batch_df, epoch_id)

        return handle

    def all_pairs(self) -> DataFrame:
        """Every qualifying pair persisted so far."""
        return self._read("pairs", _PAIRS_SCHEMA)

    def compact(self) -> None:
        """OPTIMIZE-style maintenance (streaming/state.staged_compact
        crash-safe contract): merge every sets/pairs epoch into one —
        state is a set union over epochs, so query results are
        unchanged and file count goes O(1). For the Forgetting variant
        this physically erases tombstoned docs' set rows and pairs.
        Run only when the feeding stream is quiescent past the
        compacted epochs."""
        from dbsync_spark.streaming.state import (finish_compact,
                                                  list_epochs,
                                                  pending_compaction,
                                                  staged_compact)

        for sub in ("sets", "pairs"):
            if pending_compaction(self.root, sub):
                finish_compact(self.root, sub)
            eps = list_epochs(self.root, sub)
            if not eps or (len(eps) <= 1 and not self._has_hidden_rows()):
                continue
            df = (self.all_pairs() if sub == "pairs"
                  else self._read("sets", _SETS_SCHEMA))
            staged_compact(df, self.root, sub, eps)

    def _has_hidden_rows(self) -> bool:
        return False


_FORGETS_SCHEMA = StructType([StructField("doc_id", LongType())])


class ForgettingSimJoinIndex(StreamingSimJoinIndex):
    """StreamingSimJoinIndex with right-to-be-forgotten: `forget`
    tombstones doc ids; set reads anti-join the tombstones (future
    probes can never match a forgotten doc — and frequencies no longer
    count it) and `all_pairs` drops pairs touching forgotten ids, so
    queryable state equals an index never fed those docs. compact()
    physically erases the rows. Forgotten ids are permanently retired
    (re-ingest raises), matching the other forgetting families."""

    def _forgotten(self) -> DataFrame:
        return read_state(self.spark, f"{self.root}/forgets",
                          read_schema=_FORGETS_SCHEMA,
                          empty_schema=_FORGETS_SCHEMA)

    def forget(self, doc_ids: DataFrame, epoch_id: int | None = None
               ) -> None:
        if epoch_id is None:
            epoch_id = next_epoch(self.root, "forgets")
        (doc_ids.select(F.col("doc_id").cast("long")).distinct().coalesce(1)
         .write.mode("overwrite").parquet(
             f"{self.root}/forgets/epoch={epoch_id}"))

    def _read(self, sub: str, schema: StructType) -> DataFrame:
        df = super()._read(sub, schema)
        if sub == "sets":
            return df.join(self._forgotten(), on="doc_id", how="anti")
        return df

    def process_batch(self, new_docs: DataFrame,
                      epoch_id: int | None = None) -> DataFrame:
        clash = (new_docs.select("doc_id")
                 .join(self._forgotten(), on="doc_id", how="semi"))
        if not clash.isEmpty():
            ids = [r.doc_id for r in clash.limit(5).collect()]
            raise ValueError(
                f"doc_ids {ids} were forgotten and are permanently "
                "retired; re-ingest under new ids")
        return super().process_batch(new_docs, epoch_id)

    def all_pairs(self) -> DataFrame:
        gone = self._forgotten()
        pairs = super().all_pairs()
        return (pairs
                .join(gone.select(F.col("doc_id").alias("doc_a")),
                      on="doc_a", how="anti")
                .join(gone.select(F.col("doc_id").alias("doc_b")),
                      on="doc_b", how="anti"))

    def _has_hidden_rows(self) -> bool:
        return not self._forgotten().isEmpty()
