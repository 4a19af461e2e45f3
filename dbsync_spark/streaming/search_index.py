"""Streaming full-text search service: an incrementally maintained
positional inverted index with corpus statistics.

The batch operators (functions/text.py::bm25_topk / phrase_search) scan
the corpus per query; this module maintains the index as a SERVICE:
documents arrive in micro-batches, each batch appends its positional
posting rows and per-doc length stats, and BM25 / phrase queries run
against the accumulated state at any point — the index-at-rest shape a
production search layer keeps, rather than a corpus re-scan per query.

Why stream == batch is EXACT: batches carry disjoint documents (the CDC
id contract shared with the LSH dedup index), so posting rows and doc
stats are plain set unions over epochs; tf/df/dl/N/S derived from the
union are identical for any batching, and the scoring core
(bm25_score_pairs) is the very same quantized-integer arithmetic as the
batch ranker — so the streamed BM25 and phrase queries hash-match the
SAME DuckDB oracles as their batch counterparts.

Storage layout (append-only, epoch-scoped for replay idempotence):
- <root>/postings/epoch=N : (doc_id, pos, term) for epoch-N docs
- <root>/docstats/epoch=N : (doc_id, dl)

Scale: postings at rest would be bucketed by term (queries touch only
the queried terms' buckets) and doc stats by doc_id; a phrase or BM25
query reads |query terms| posting lists, never the corpus. Positions
are 1-based; phrase intersection joins on (doc_id, pos - i).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from dbsync_spark.functions.text import (bm25_score_pairs,
                                         build_posting_index, tokens)
from dbsync_spark.streaming.state import next_epoch

_POSTINGS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("pos", IntegerType()),
    StructField("term", StringType()),
])
_DOCSTATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("dl", LongType()),
])


class StreamingSearchIndex:
    """Incremental inverted index over parquet state dirs. Call
    `process_batch` per micro-batch of (doc_id, text) documents
    (directly or via `foreach_batch_handler()`); query with `bm25`
    and `phrase`. Batch doc_ids must be globally unique."""

    def __init__(self, spark: SparkSession, root: str,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.text_col = text_col
        self.id_col = id_col

    def _epochs(self, sub: str) -> list[int]:
        from dbsync_spark.streaming.state import list_epochs

        return list_epochs(self.root, sub)

    def _read(self, sub: str, schema: StructType) -> DataFrame:
        eps = self._epochs(sub)
        if not eps:
            return self.spark.createDataFrame([], schema)
        paths = [f"{self.root}/{sub}/epoch={e}" for e in eps]
        return self.spark.read.schema(schema).parquet(*paths)

    def process_batch(self, new_docs: DataFrame,
                      epoch_id: int | None = None) -> None:
        """Index one micro-batch: append its postings and doc stats.
        Epoch-scoped overwrite — replaying a failed epoch rewrites
        exactly its own files."""
        if epoch_id is None:
            epoch_id = next_epoch(self.root, "postings")
        posts = build_posting_index(new_docs, text_col=self.text_col,
                                    id_col=self.id_col)
        # state is always stored under 'doc_id' regardless of the
        # caller's id_col: the read schemas are fixed, so an unaliased
        # custom column name would read back as all-NULL doc_ids
        posts.select(F.col(self.id_col).cast("long").alias("doc_id"),
                     F.col("pos").cast("int"), "term"
                     ).write.mode("overwrite").parquet(
            f"{self.root}/postings/epoch={epoch_id}")
        stats = new_docs.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            F.size(tokens(F.col(self.text_col))).cast("long").alias("dl"))
        stats.coalesce(1).write.mode("overwrite").parquet(
            f"{self.root}/docstats/epoch={epoch_id}")

    def foreach_batch_handler(self):
        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            self.process_batch(batch_df, epoch_id)

        return handle

    def compact(self) -> None:
        """OPTIMIZE-style maintenance: merge every epoch's postings/doc
        stats into ONE epoch directory (keeping the max epoch id so
        next_epoch keeps advancing) and physically drop rows the read
        path already hides (the Forgetting subclass's tombstoned docs —
        this is the storage-level-erasure counterpart of its read-time
        anti-join). Query results are unchanged by construction: the
        state is a set union over epochs and compaction only
        re-associates it (pinned in tests + tools/search_soak.py).

        Crash-safe in the BucketedTable staging style: the merged copy
        lands in a `_compacting` staging dir (underscore-hidden from
        Spark and from list_epochs) with a `_covers.json` manifest, the
        covered epoch dirs are deleted, then one atomic rename publishes
        the staging dir as the surviving epoch. A crash before the
        manifest leaves the old state untouched; a crash after it leaves
        a window where reads are partial — re-running compact() first
        completes the interrupted swap from the staged full copy, so no
        data is ever lost. File count: O(n_epochs) -> O(1) per sub."""
        for sub in ("postings", "docstats"):
            self._compact_sub(sub)

    def _compact_sub(self, sub: str) -> None:
        from dbsync_spark.streaming.state import (finish_compact,
                                                  pending_compaction,
                                                  staged_compact)

        schema = _POSTINGS_SCHEMA if sub == "postings" else _DOCSTATS_SCHEMA
        if pending_compaction(self.root, sub):
            finish_compact(self.root, sub)
        eps = self._epochs(sub)
        if not eps or (len(eps) <= 1 and not self._has_hidden_rows(sub)):
            return
        # Forgetting subclass: tombstoned rows filtered here
        staged_compact(self._read(sub, schema), self.root, sub, eps)

    def _has_hidden_rows(self, sub: str) -> bool:
        """Whether compaction would change the stored bytes even with a
        single epoch (rows hidden at read time — overridden by the
        Forgetting subclass)."""
        return False

    def postings(self, terms: list[str] | None = None) -> DataFrame:
        posts = self._read("postings", _POSTINGS_SCHEMA)
        if terms is not None:
            posts = posts.where(F.col("term").isin(list(terms)))
        return posts

    def bm25(self, query_terms: list[str], k: int = 10) -> DataFrame:
        """BM25 top-k over the accumulated index — tf from the queried
        terms' posting lists only, dl/N/S from the doc-stats table;
        equals (and hash-matches the oracle of) the batch ranker over
        the union of every indexed batch."""
        stats = self._read("docstats", _DOCSTATS_SCHEMA)
        corpus = stats.agg(F.count("*").alias("n_docs"),
                           F.sum("dl").alias("s_dl"))
        tf = (self.postings(query_terms)
              .groupBy("doc_id", "term")
              .agg(F.count("*").cast("long").alias("tf")))
        pairs = tf.join(stats, on="doc_id").select(
            "doc_id", "dl", "term", "tf")
        out = bm25_score_pairs(pairs, corpus, k=k, id_col="doc_id")
        return out.withColumnRenamed("doc_id", self.id_col)

    def phrase(self, phrase: list[str]) -> DataFrame:
        """Exact phrase occurrences over the accumulated index — the
        positional posting-list intersection of functions/text.py::
        phrase_search, reading only the phrase terms' postings."""
        from dbsync_spark.functions.text import phrase_search

        return phrase_search(
            None, phrase, id_col="doc_id",
            index=self.postings(list(set(phrase)))
        ).withColumnRenamed("doc_id", self.id_col)


# Right-to-be-forgotten support: tombstone epochs applied at read time.
_FORGETS_SCHEMA = StructType([StructField("doc_id", LongType())])


class ForgettingSearchIndex(StreamingSearchIndex):
    """StreamingSearchIndex with document removal (the right-to-be-
    forgotten pass every training-data store eventually needs): `forget`
    writes a tombstone epoch and every read anti-joins the accumulated
    tombstones, so post-forget queries equal an index rebuilt without
    those documents — EXACTLY, because postings/doc stats are per-doc
    facts and tf/df/dl/N/S recompute from the surviving union. Periodic
    compaction (rewriting posting epochs minus tombstones) is a
    maintenance op, not a correctness requirement.

    Storage addition:
    - <root>/forgets/epoch=N : (doc_id) tombstones
    """

    def _forgotten(self) -> DataFrame:
        eps = self._epochs("forgets")
        if not eps:
            return self.spark.createDataFrame([], _FORGETS_SCHEMA)
        paths = [f"{self.root}/forgets/epoch={e}" for e in eps]
        return self.spark.read.schema(_FORGETS_SCHEMA).parquet(*paths)

    def forget(self, doc_ids: DataFrame, epoch_id: int | None = None
               ) -> None:
        """Tombstone a frame of (doc_id) rows. Epoch-scoped overwrite —
        replaying a forget rewrites identical tombstones."""
        if epoch_id is None:
            epoch_id = next_epoch(self.root, "forgets")
        (doc_ids.select(F.col(self.id_col).cast("long").alias("doc_id"))
         .distinct().coalesce(1)
         .write.mode("overwrite").parquet(
             f"{self.root}/forgets/epoch={epoch_id}"))

    def _read(self, sub: str, schema: StructType) -> DataFrame:
        df = super()._read(sub, schema)
        if sub in ("postings", "docstats"):
            return df.join(self._forgotten(), on="doc_id", how="anti")
        return df

    def _has_hidden_rows(self, sub: str) -> bool:
        return bool(self._epochs("forgets"))

    def process_batch(self, new_docs: DataFrame,
                      epoch_id: int | None = None) -> None:
        """Reject re-ingest of a forgotten doc_id: tombstones apply to
        ALL epochs at read time (no epoch ordering), so a doc ingested
        after its forget would be silently invisible forever. Forgotten
        ids are permanently retired from the id space — a collision is a
        caller bug, surfaced loudly instead of swallowed."""
        clash = (new_docs
                 .select(F.col(self.id_col).cast("long").alias("doc_id"))
                 .join(self._forgotten(), on="doc_id", how="semi")
                 .limit(5).collect())
        if clash:
            ids = sorted(r["doc_id"] for r in clash)
            raise ValueError(
                f"doc_ids {ids} were forgotten and are permanently "
                "retired; re-ingest under a fresh doc_id")
        super().process_batch(new_docs, epoch_id)
