"""Focused pins for the round-11 optimizations (each changed an
operator's internals while promising bit-identical outputs)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_verify_threshold_rewrite_equals_direct_jaccard(spark):
    """simjoin_verify_arrays' pushed join condition was rewritten from
    den*I >= num*(la+lb-I) to (den+num)*I >= num*(la+lb) (one intersect
    per candidate). Property-check the algebra on random integer sets:
    survivors and their (n_inter, n_union) values must equal the direct
    Jaccard evaluation exactly."""
    from dbsync_spark.functions.dedup import simjoin_verify_arrays

    rng = random.Random(7)
    docs = []
    for i in range(40):
        width = rng.randint(1, 30)
        docs.append((i, sorted(rng.sample(range(60), width))))
    sets = spark.createDataFrame(
        [(i, [int(x) for x in s]) for i, s in docs],
        "doc_id long, _sh array<int>")
    cand = spark.createDataFrame(
        [(a, b) for a in range(40) for b in range(a + 1, 40)],
        "doc_a long, doc_b long")
    num, den = 4, 5
    got = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
           for r in simjoin_verify_arrays(cand, sets, "doc_id",
                                          num, den).collect()}
    exp = {}
    by_id = dict(docs)
    for a in range(40):
        for b in range(a + 1, 40):
            inter = len(set(by_id[a]) & set(by_id[b]))
            union = len(set(by_id[a]) | set(by_id[b]))
            if den * inter >= num * union:
                exp[(a, b)] = (inter, union)
    assert got == exp


def test_read_table_memoizes_per_session(spark, sf_dir):
    """read_table returns the SAME DataFrame handle for repeated
    (session, sf_dir, table) calls — the ~100 ms/call schema inference
    is paid once — and the memo key includes the applicationId so a
    different session never sees this one's plans."""
    from dbsync_spark.sources.tables import _TABLE_CACHE, read_table

    a = read_table(spark, sf_dir, "nation")
    b = read_table(spark, sf_dir, "nation")
    assert a is b
    key = (spark.sparkContext.applicationId, sf_dir, "nation")
    assert _TABLE_CACHE[key] is a
    # the handle is a live plan, not cached data: a fresh action over it
    # still reads the fixture (row count matches a fresh uncached read)
    assert a.count() == spark.read.parquet(f"{sf_dir}/nation.parquet").count()


def test_fuzzy_dedup_banded_levenshtein_values(spark):
    """fuzzy_dedup switched to threshold-form levenshtein (banded
    O(len*k), -1 past the bound). Planted pairs straddling the bound:
    survivors and their exact dist values must match the full-matrix
    semantics (dist <= max_dist)."""
    from dbsync_spark.functions.dedup import fuzzy_dedup

    base = "abcdefghijklmnopqrstuvwxyzabcdefghijklmn"  # 40 chars
    rows = []
    # doc 0: base; doc 1: 5 edits (keep); doc 2: 12 edits (boundary keep);
    # doc 3: 13 edits (drop); doc 4: identical (dist 0)
    def mutate(s, k):
        out = list(s)
        for i in range(k):
            out[i] = "Z"
        return "".join(out)
    texts = [base, mutate(base, 5), mutate(base, 12), mutate(base, 13), base]
    for i, t in enumerate(texts):
        rows.append((i, "en", len(t), t))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["dist"]
           for r in fuzzy_dedup(docs).collect()}
    assert got[(0, 4)] == 0
    assert got[(0, 1)] == 5
    assert got[(0, 2)] == 12          # boundary value survives exactly
    assert (0, 3) not in got          # 13 > max_dist dropped
    assert got[(1, 4)] == 5
