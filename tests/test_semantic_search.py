"""End-to-end semantic search example (examples/semantic_search.py):
encoder determinism, self-retrieval, and ANN agreement with brute force."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from examples.semantic_search import EMBED_DIM, build_index, hash_embed


def test_encoder_deterministic_unit_vectors(spark):
    df = spark.createDataFrame(
        [(1, "spark merge join"), (2, "spark merge join"), (3, "other words")],
        "vec_id long, chunk_text string")
    rows = {r["vec_id"]: r["embedding"] for r in hash_embed(df).collect()}
    assert rows[1] == rows[2]          # pure function of the text
    assert rows[1] != rows[3]
    for v in rows.values():
        assert len(v) == EMBED_DIM
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9  # unit norm


def test_self_retrieval_and_bruteforce_agreement(spark, sf_dir):
    """Querying the index with an indexed chunk's own vector returns that
    chunk at rank 1 with cosine ~1; within probed clusters the ANN
    scores agree with exact brute force to 1e-12."""
    from dbsync_spark.functions.similarity import cosine_topk

    idx, vectors = build_index(
        spark, sf_dir, tempfile.mkdtemp(prefix="dbsync_semsearch_t_"))
    queries = (vectors.where(F.col("vec_id") % 97 == 0).limit(5)
               .select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                       "embedding"))
    hits = idx.query(queries, k=3, nprobe=2)
    top1 = {r["query_id"]: r for r in hits.where(F.col("rank") == 1).collect()}
    assert len(top1) == 5
    for qid, r in top1.items():
        assert r["vec_id"] == qid - 10_000_000
        assert r["cosine_sim"] > 1 - 1e-9

    exact = cosine_topk(vectors, queries, k=3)
    exact_sims = {(r["query_id"], r["vec_id"]): r["cosine_sim"]
                  for r in exact.collect()}
    for r in hits.collect():
        key = (r["query_id"], r["vec_id"])
        if key in exact_sims:
            assert abs(r["cosine_sim"] - exact_sims[key]) < 1e-12
