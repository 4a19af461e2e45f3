"""Streaming IVF similarity index: inverted lists maintained from
foreachBatch, with frozen centroids.

The batch operator (functions/similarity.py::ivf_ann_topk) trains
centroids and probes in one job; this module splits that lifecycle the
way a production vector store does:

- `fit(corpus)` — train k-means centroids ONCE on a representative
  sample and freeze them to disk. Centroids are the index's routing
  table; retraining them would reshuffle every stored list, so streaming
  ingest never touches them (periodic re-fit = rebuild, an offline job).
- `process_batch(vectors, epoch)` — assign each arriving vector to its
  nearest centroid (row-local, Arrow-batched) and append to the
  epoch-scoped inverted-list files (same replay-idempotence pattern as
  streaming/dedup_index.py).
- `query(queries, k, nprobe)` — route each query to its nprobe nearest
  lists and score only those lists: reads ~nprobe/n_clusters of the
  stored vectors. At scale the cluster column is the physical partition
  key, so the probe is partition pruning, not a filter.

Batch-invariance (tested): an index built from N micro-batches answers
queries identically to one built in a single batch — assignment is
per-row against frozen centroids, so batching cannot change any list.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsync_spark.functions.similarity import (
    _assign_clusters,
    dot,
    kmeans_centroids,
    norm,
)


from dbsync_spark.sources.tables import read_state
from dbsync_spark.streaming.state import next_epoch

class StreamingIvfIndex:
    def __init__(self, spark: SparkSession, root: str, dim: int,
                 n_clusters: int = 16, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.dim = dim
        self.n_clusters = n_clusters
        self.id_col = id_col
        self.vec_col = vec_col
        self._centroids: np.ndarray | None = None

    @property
    def _centroid_path(self) -> str:
        return f"{self.root}/centroids.npy"

    def fit(self, corpus: DataFrame, iters: int = 2) -> None:
        """Train and freeze the routing centroids (deterministic
        lowest-id seeding, fixed iterations)."""
        os.makedirs(self.root, exist_ok=True)
        c = kmeans_centroids(corpus, self.dim, self.n_clusters, iters=iters,
                             id_col=self.id_col, vec_col=self.vec_col)
        np.save(self._centroid_path, c)
        self._centroids = c

    def centroids(self) -> np.ndarray:
        """Frozen routing centroids. Cached in memory for the lifetime of
        this object: a re-fit by ANOTHER process writing the same root
        goes unnoticed here by design — centroids are immutable for an
        index generation (a re-fit is a rebuild under a new root; see
        module docstring), so the cache can never be legitimately stale."""
        if self._centroids is None:
            if not os.path.exists(self._centroid_path):
                raise RuntimeError(
                    f"no centroids at {self._centroid_path}; call fit() "
                    "before ingesting or querying")
            self._centroids = np.load(self._centroid_path)
        return self._centroids

    def process_batch(self, vectors: DataFrame, epoch_id: int | None = None) -> None:
        """Assign a batch of (id, vector) rows to their inverted lists and
        append (epoch-scoped overwrite — replays are idempotent)."""
        if epoch_id is None:
            epoch_id = next_epoch(self.root, "lists")
        assigned = _assign_clusters(
            vectors.select(self.id_col, self.vec_col), self.centroids(),
            self.id_col, self.vec_col, nprobe=1, keep_vec=True)
        (assigned.select(self.id_col, "cluster", self.vec_col)
         .write.mode("overwrite")
         .parquet(f"{self.root}/lists/epoch={epoch_id}"))

    def foreach_batch_handler(self):
        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            self.process_batch(batch_df, epoch_id)

        return handle

    def compact(self) -> None:
        """OPTIMIZE-style maintenance: the inverted lists are a plain
        append-only union over epochs, so compaction merges every epoch
        dir into one via the shared crash-safe staged swap (query
        results unchanged by construction). Quiescent-caller discipline
        as everywhere: run only past the stream's checkpoint."""
        from dbsync_spark.streaming.state import (finish_compact,
                                                  list_epochs,
                                                  pending_compaction,
                                                  staged_compact)

        if pending_compaction(self.root, "lists"):
            finish_compact(self.root, "lists")
        eps = list_epochs(self.root, "lists")
        if len(eps) > 1:
            paths = [f"{self.root}/lists/epoch={e}" for e in eps]
            staged_compact(self.spark.read.parquet(*paths),
                           self.root, "lists", eps)

    def query(self, queries: DataFrame, k: int = 10,
              nprobe: int = 2) -> DataFrame:
        """Approximate cosine top-k against the stored lists. Before any
        processed batch the index is empty, so the answer is the empty
        top-k frame ("no data yet" only — read_state; real corruption
        propagates)."""
        lists = read_state(self.spark, f"{self.root}/lists")
        if lists is None:
            from pyspark.sql.types import (DoubleType, IntegerType,
                                           LongType, StructField,
                                           StructType)

            return self.spark.createDataFrame([], StructType([
                StructField("query_id", LongType()),
                StructField("vec_id", LongType()),
                StructField("cosine_sim", DoubleType()),
                StructField("rank", IntegerType()),
            ]))
        qb = _assign_clusters(
            queries.select(self.id_col, self.vec_col), self.centroids(),
            self.id_col, self.vec_col, nprobe=nprobe, keep_vec=True)
        c = lists.select(F.col(self.id_col).alias("vec_id"), "cluster",
                         F.col(self.vec_col).alias("e"))
        q = qb.select(F.col(self.id_col).alias("query_id"), "cluster",
                      F.col(self.vec_col).alias("qe"))
        pairs = c.join(F.broadcast(q), on="cluster").where(
            F.col("vec_id") != F.col("query_id"))
        sim = (dot(F.col("e"), F.col("qe"))
               / (norm(F.col("e")) * norm(F.col("qe")))).alias("cosine_sim")
        scored = pairs.select("query_id", "vec_id", sim).dropDuplicates(
            ["query_id", "vec_id"])
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine_sim").desc(), F.col("vec_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))
