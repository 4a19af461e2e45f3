"""Runnable end-to-end SEMANTIC SEARCH pipeline over the documents
fixture: chunk -> embed -> index -> query.

    python examples/semantic_search.py [sf_dir]   # default sf0.001

Stages (every piece a declared operator elsewhere in the engine):

  1. Chunking   functions/text.chunk_documents — 32-token windows,
                stride 24, one uid per chunk.
  2. Encoding   `hash_embed` below: a deterministic feature-hashing
                "encoder" (md5 token hashing into a 64-dim signed
                bag-of-words, L2-normalized) run through Arrow
                mapInPandas. This is the HONEST STUB for a real model:
                the Spark-side plumbing (batch shape, schema, unit
                vectors) is exactly what a sentence-transformer UDF
                produces, with no ML dependency; swap `_encode_pdf` for
                a model call and nothing else changes.
  3. Indexing   streaming/ann_index.StreamingIvfIndex — k-means
                centroids fit once, chunk vectors ingested in
                micro-batches (epoch-idempotent inverted lists).
  4. Querying   nprobe-bounded approximate cosine top-k against the
                stored lists.

Determinism: md5 hashing end-to-end — rerunning produces byte-identical
vectors, lists, and rankings (tests/test_semantic_search.py pins
self-retrieval and brute-force agreement).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

EMBED_DIM = 64


def _encode_pdf(texts, dim: int = EMBED_DIM):
    """Feature-hash a pandas Series of texts into unit vectors: each
    token adds +-1 (md5 sign bit) at an md5-chosen dimension. Pure
    function of the text — the model-free stand-in for an encoder."""
    import hashlib

    import numpy as np

    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, text in enumerate(texts):
        for tok in str(text).split(" "):
            if not tok:
                continue
            h = hashlib.md5(tok.encode()).digest()
            idx = int.from_bytes(h[:4], "big") % dim
            sign = 1.0 if h[4] & 1 else -1.0
            out[i, idx] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def hash_embed(chunks: DataFrame, text_col: str = "chunk_text",
               dim: int = EMBED_DIM) -> DataFrame:
    """(uid, chunk_text, ...) -> (vec_id, embedding array<double>) via
    Arrow mapInPandas (the justified-Python pattern: the encoder is
    inherently per-token; batches never leave the executor; a real
    model swap touches only _encode_pdf)."""
    cols = chunks.columns

    def encode(batches):
        for pdf in batches:
            vecs = _encode_pdf(pdf[text_col], dim)
            out = pdf[[c for c in cols if c != text_col]].copy()
            out["embedding"] = list(vecs)
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in chunks.schema.fields if f.name != text_col
    ) + ", embedding array<double>"
    return chunks.mapInPandas(encode, schema=schema)


def build_index(spark, sf_dir: str, root: str, n_epochs: int = 3):
    """Chunk + encode the corpus, fit centroids, ingest in micro-batches.
    Returns (index, vectors) — vectors carry (vec_id, embedding)."""
    from dbsync_spark.functions.text import chunk_documents
    from dbsync_spark.sources.tables import read_table
    from dbsync_spark.streaming.ann_index import StreamingIvfIndex

    docs = read_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=32, stride=24).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("vec_id"),
        "chunk_text")
    vectors = hash_embed(chunks).localCheckpoint()

    idx = StreamingIvfIndex(spark, root, dim=EMBED_DIM, n_clusters=8)
    idx.fit(vectors)
    for epoch in range(n_epochs):
        idx.process_batch(vectors.where(F.col("vec_id") % n_epochs == epoch),
                          epoch_id=epoch)
    return idx, vectors


def main() -> int:
    import tempfile

    from dbsync_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("semantic-search-demo")
    spark.sparkContext.setLogLevel("ERROR")

    idx, vectors = build_index(
        spark, sf_dir, tempfile.mkdtemp(prefix="dbsync_semsearch_"))
    # query with 5 indexed chunks under fresh ids: rank 1 must be the
    # chunk itself (cosine 1.0) — the index sanity check
    queries = (vectors.where(F.col("vec_id") % 97 == 0).limit(5)
               .select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                       "embedding"))
    hits = idx.query(queries, k=3, nprobe=2)
    for r in hits.orderBy("query_id", "rank").collect():
        print(f"query {r['query_id'] - 10_000_000}: "
              f"rank {r['rank']} -> chunk {r['vec_id']} "
              f"(cos {r['cosine_sim']:.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
