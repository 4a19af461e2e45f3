"""Exact set-similarity join (AllPairs/PPJoin prefix filter): recall-1.0
completeness vs brute force, planted pairs, length/prefix pruning bounds,
and incremental == full decomposition."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsync_spark.functions.dedup import (MERSENNE31, char_shingles,
                                          hashed_shingle_sets,
                                          similarity_join,
                                          similarity_join_incremental)
from dbsync_spark.functions.text import h15


def _brute_force(spark, df, num=4, den=5):
    """All pairs sharing >= 1 hashed shingle, exact jaccard filter —
    no prefix filter, no length filter. The completeness referee."""
    sh = (df.select("doc_id",
                    F.explode(char_shingles(F.col("text"))).alias("_s"))
          .select("doc_id", (h15(F.col("_s")) % MERSENNE31).alias("_h"))
          .distinct())
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "_h")
    b = sh.select(F.col("doc_id").alias("doc_b"), "_h")
    inter = (a.join(b, on="_h").where(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.select(F.col("doc_id").alias("doc_a"),
                               F.col("n").alias("na")), on="doc_a")
            .join(sizes.select(F.col("doc_id").alias("doc_b"),
                               F.col("n").alias("nb")), on="doc_b")
            .select("doc_a", "doc_b", "n_inter",
                    (F.col("na") + F.col("nb")
                     - F.col("n_inter")).alias("n_union"))
            .where(F.lit(den) * F.col("n_inter")
                   >= F.lit(num) * F.col("n_union")))


def _corpus(spark, n_filler=60):
    base_a = ("the quick brown fox jumps over the lazy dog in the morning "
              "while the patient observer takes careful notes about every "
              "single movement across the wide open field near the river")
    base_b = ("pack my box with five dozen liquor jugs before the auction "
              "starts because the appraiser arrives early and the catalog "
              "must list every lot in order with provenance and condition")
    rows = [
        (1, base_a), (2, base_a.replace("morning", "evening")),
        (3, base_b), (4, base_b.replace("auction", "meeting")),
        (5, "an entirely different document about computational geometry"),
    ]
    rows += [(100 + i,
              f"filler item {i} covering subject {i * 3} and material "
              f"{i * 11} with words {i * 7} {i * 13} {i * 19}")
             for i in range(n_filler)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.n_inter, r.n_union) for r in df.collect()}


def test_simjoin_equals_brute_force(spark):
    docs = _corpus(spark)
    got = _pairs(similarity_join(docs))
    want = _pairs(_brute_force(spark, docs))
    assert got == want
    assert len(want) >= 2  # planted near-identical pairs survive


def test_simjoin_planted_pair_caught_and_unrelated_excluded(spark):
    docs = _corpus(spark)
    keys = {(a, b) for a, b, *_ in _pairs(similarity_join(docs))}
    assert (1, 2) in keys and (3, 4) in keys
    assert all(a != 5 and b != 5 for a, b in keys)


def test_simjoin_threshold_monotone(spark):
    docs = _corpus(spark)
    loose = {(a, b) for a, b, *_ in
             _pairs(similarity_join(docs, threshold_num=1,
                                    threshold_den=2))}
    tight = {(a, b) for a, b, *_ in
             _pairs(similarity_join(docs, threshold_num=9,
                                    threshold_den=10))}
    assert tight <= loose


def test_simjoin_prefix_filter_prunes(spark):
    """The candidate set the prefix filter admits must be strictly
    smaller than all hash-sharing pairs on a corpus with shared
    boilerplate (otherwise the operator degenerates to brute force)."""
    docs = _corpus(spark)
    sh = hashed_shingle_sets(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), "_h")
    b = sh.select(F.col("doc_id").alias("doc_b"), "_h")
    n_sharing = (a.join(b, on="_h").where(F.col("doc_a") < F.col("doc_b"))
                 .select("doc_a", "doc_b").distinct().count())
    n_result = similarity_join(docs).count()
    # the planted corpus shares stopword shingles widely: brute-force
    # candidate pairs outnumber true results by a wide margin
    assert n_sharing > 10 * max(n_result, 1)


def test_simjoin_incremental_union_equals_full(spark):
    docs = _corpus(spark)
    full = _pairs(similarity_join(docs))
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    index_sh = hashed_shingle_sets(old)
    old_pairs = _pairs(similarity_join(old))
    new_pairs, all_sh = similarity_join_incremental(index_sh, new)
    assert old_pairs | _pairs(new_pairs) == full
    assert not (old_pairs & _pairs(new_pairs))
    # returned state == shingle sets of the union corpus
    assert (all_sh.count()
            == hashed_shingle_sets(docs).count())


def test_simjoin_empty_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "abc"), (3, "abcd"), (4, "identical text body"),
         (5, "identical text body")],
        "doc_id long, text string")
    got = _pairs(similarity_join(docs))
    assert {(a, b) for a, b, *_ in got} == {(4, 5)}


def test_containment_join_directional(spark):
    from dbsync_spark.functions.dedup import containment_join

    quote = "the five boxing wizards jump quickly over the frozen river"
    big = ("a long host document that embeds a quotation verbatim: "
           + quote + " and then continues with plenty of additional "
           "unrelated narrative content about mountains and harbors "
           "and long voyages across the open sea during winter storms")
    docs = spark.createDataFrame(
        [(1, quote), (2, big),
         (3, "entirely unrelated text about garden furniture sales")],
        "doc_id long, text string")
    got = {(r.doc_a, r.doc_b) for r in containment_join(docs).collect()}
    assert (1, 2) in got          # quote contained in host
    assert (2, 1) not in got      # host not contained in quote
    assert all(3 not in pair for pair in got)


def test_containment_join_equals_brute_force(spark):
    from pyspark.sql import functions as F
    from dbsync_spark.functions.dedup import containment_join

    docs = _corpus(spark, n_filler=40)
    sh = hashed_shingle_sets(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "_h")
    b = sh.select(F.col("doc_id").alias("doc_b"), "_h")
    brute = (a.join(b, on="_h").where(F.col("doc_a") != F.col("doc_b"))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter"))
             .join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("n").alias("n_a")), on="doc_a")
             .where(F.lit(10) * F.col("n_inter") >= F.lit(9) * F.col("n_a")))
    want = {(r.doc_a, r.doc_b, r.n_inter, r.n_a) for r in brute.collect()}
    got = {(r.doc_a, r.doc_b, r.n_inter, r.n_a)
           for r in containment_join(docs).collect()}
    assert got == want and len(want) >= 2


def test_chunked_verify_identical_output(spark):
    """verify_chunks partitions the candidate set deterministically and
    unions per-chunk verifies — output must be byte-identical to the
    one-shot verify for both exact join operators."""
    from dbsync_spark.functions.dedup import (containment_join,
                                              similarity_join)

    docs = _corpus(spark, n_filler=30)
    one = {tuple(r) for r in similarity_join(docs).collect()}
    chunked = {tuple(r) for r in
               similarity_join(docs, verify_chunks=4).collect()}
    assert one == chunked and one
    c_one = {tuple(r) for r in containment_join(docs).collect()}
    c_chunked = {tuple(r) for r in
                 containment_join(docs, verify_chunks=3).collect()}
    assert c_one == c_chunked
