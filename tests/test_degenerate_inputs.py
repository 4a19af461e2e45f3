"""Degenerate inputs: the core sync operators must behave on empty logs,
empty status tables, and single-row inputs (bootstrap day-one states a
production deployment actually hits)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsync_spark.operators.apply import last_writer_wins, parse_changes
from dbsync_spark.operators.diff import log_window_diff
from dbsync_spark.operators.poll import poll_batch
from dbsync_spark.operators.status import status_counts
from dbsync_spark.schemas import SYNC_DATA_SCHEMA


def _payload():
    # fromDDL needs an active session: resolve lazily inside tests
    from pyspark.sql.types import StructType

    return StructType.fromDDL("k LONG, v STRING")


def _empty_log(spark):
    return spark.createDataFrame([], SYNC_DATA_SCHEMA)


def test_apply_on_empty_log(spark):
    changes = parse_changes(_empty_log(spark), _payload())
    out = last_writer_wins(changes, ["k"])
    assert out.count() == 0
    assert set(out.columns) >= {"k", "v"}


def test_poll_on_empty_log_and_empty_polled(spark):
    log = _empty_log(spark).select("id", F.lit("x").alias("payload"))
    polled = spark.createDataFrame([], "dataId LONG, createTime TIMESTAMP")
    assert poll_batch(log, polled, 10).count() == 0

    one = spark.createDataFrame([(1, "x")], "id LONG, payload STRING")
    got = poll_batch(one, polled, 10).collect()
    assert [r["id"] for r in got] == [1]


def test_status_counts_all_pending(spark, sf_dir):
    from dbsync_spark.changelog import build_log_orders

    log = build_log_orders(spark, sf_dir).limit(10)
    empty_status = spark.createDataFrame(
        [], "dataId LONG, status STRING, message STRING, retry INT, "
            "createTime TIMESTAMP")
    rows = {r["status"]: r["cnt"]
            for r in status_counts(log, empty_status).collect()}
    assert rows == {"PENDING": 10}


def test_log_window_diff_degenerate_cutoffs(spark):
    changes = spark.createDataFrame(
        [(1, "I", 1, "a"), (2, "U", 1, "b"), (3, "I", 2, "c")],
        "id LONG, operation STRING, k LONG, v STRING")
    # cutoff below all ids: everything is an insert
    all_new = log_window_diff(changes, ["k"], cutoff=0)
    assert {r["change_type"] for r in all_new.collect()} == {"I"}
    assert all_new.count() == 2
    # cutoff at max id: no changes
    assert log_window_diff(changes, ["k"], cutoff=3).count() == 0


def test_lww_single_row_and_delete_only(spark):
    one = spark.createDataFrame(
        [(1, "I", 7, "x")], "id LONG, operation STRING, k LONG, v STRING")
    assert last_writer_wins(one, ["k"]).count() == 1
    dels = spark.createDataFrame(
        [(1, "D", 7, "x")], "id LONG, operation STRING, k LONG, v STRING")
    assert last_writer_wins(dels, ["k"]).count() == 0


def test_text_ops_on_empty_and_trivial_corpora(spark):
    """Empty corpus, empty-string docs, and single-token docs must produce
    sane (not crashing, not descending-sequence) results for every
    text-pipeline operator."""
    from dbsync_spark.functions.dedup import (containment_pairs,
                                              minhash_near_dups)
    from dbsync_spark.functions.text import bigram_stats, segment_dedup

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_near_dups(empty).count() == 0
    assert containment_pairs(empty).count() == 0
    assert bigram_stats(empty).count() == 0
    assert segment_dedup(empty).count() == 0

    trivial = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two")], "doc_id long, text string")
    # no doc has >= 3 tokens: no shingles, no pairs anywhere
    assert minhash_near_dups(trivial).count() == 0
    assert containment_pairs(trivial).count() == 0
    # bigrams exist only for doc 3; none reach min_count=2
    assert bigram_stats(trivial, min_count=2).count() == 0
    assert bigram_stats(trivial, min_count=1).count() == 1
    segs = {r.doc_id: r.n_segments for r in segment_dedup(trivial).collect()}
    assert segs == {1: 1, 2: 1, 3: 1}  # '' tokenizes to one empty token


def test_bfs_on_empty_edges_with_seeds(spark):
    """BFS over an empty edge set: seeds at distance 0, nothing else."""
    from dbsync_spark.functions.graph import bfs_distances

    edges = spark.createDataFrame([], "src INT, dst INT")
    seeds = spark.createDataFrame([(3,)], "node INT")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(edges, seeds, n_iters=2).collect()}
    assert got == {3: 0}


def test_incremental_minhash_empty_increment(spark):
    """An empty new-docs batch yields zero pairs (and doesn't error on
    the empty probe join)."""
    from dbsync_spark.functions.dedup import minhash_incremental_pairs

    corpus = spark.createDataFrame(
        [(1, "some words here repeated words here again and again")],
        ["doc_id", "text"])
    empty = spark.createDataFrame([], "doc_id LONG")
    assert minhash_incremental_pairs(corpus, empty).count() == 0


def test_group_sample_k_exceeds_group(spark):
    """k larger than every group returns the whole input."""
    from dbsync_spark.functions.sampling import group_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "lang"])
    assert group_sample(df, "doc_id", "lang", 10).count() == 3


def test_dtw_single_point_series(spark):
    """Length-1 series: DTW collapses to sum of |q_i - a| costs along
    the single row."""
    from dbsync_spark.functions.timeseries import dtw_reference, dtw_to_query

    df = spark.createDataFrame([(7, [5.0])], "user_id LONG, values ARRAY<DOUBLE>")
    got = dtw_to_query(df, [1.0, 2.0, 3.0], "user_id", radius=5).first()
    assert got["dtw_dist"] == dtw_reference([5.0], [1.0, 2.0, 3.0], 5)


def test_char_entropy_empty_and_uniform(spark):
    """Empty text rows are dropped; single-char text has zero entropy."""
    from dbsync_spark.functions.text import char_entropy

    df = spark.createDataFrame([(1, ""), (2, "zzzzzz")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(rows) == {2}
    assert rows[2]["entropy_bits"] == 0.0


def test_dup_spans_empty_and_all_identical(spark):
    """Empty corpus -> no spans; an all-identical corpus -> every doc is
    one wall-to-wall span."""
    from dbsync_spark.functions.dedup import substring_dup_spans

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert substring_dup_spans(empty).count() == 0

    txt = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(i, txt) for i in range(3)], "doc_id long, text string")
    rows = substring_dup_spans(df, window_tokens=6).collect()
    assert len(rows) == 3
    assert all((r.span_start, r.span_end) == (1, 10) for r in rows)


def test_dup_spans_upsert_empty_increment(spark):
    """An empty batch is a no-op on all three state tables."""
    from dbsync_spark.functions.dedup import dup_spans_state, dup_spans_upsert

    run = " ".join(f"s{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, "a " + run), (2, "b " + run)], "doc_id long, text string")
    st = dup_spans_state(df)
    empty = spark.createDataFrame([], "doc_id long, text string")
    st2 = dup_spans_upsert(st, empty)
    for before, after in zip(st, st2):
        assert sorted(map(tuple, before.collect())) \
            == sorted(map(tuple, after.collect()))


def test_heavy_hitters_empty_and_single_token(spark):
    from dbsync_spark.functions.sketch import heavy_hitters

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heavy_hitters(empty).count() == 0
    one = spark.createDataFrame([(1, "only")], "doc_id long, text string")
    got = heavy_hitters(one, capacity=10).collect()
    assert [(r.tok, r.n) for r in got] == [("only", 1)]


def test_decontaminate_empty_test_split(spark):
    """No test docs -> nothing is contaminated, every train doc with
    >= k tokens survives."""
    from dbsync_spark.functions.sketch import decontaminate

    df = spark.createDataFrame(
        [(1, "a b c d", "train"), (2, "e f g h", "train")],
        "doc_id long, text string, source string")
    out = decontaminate(df, F.col("source") == "test", k=3)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]


def test_lm_surprisal_single_doc_and_no_bigrams(spark):
    """One-token docs have no bigrams (excluded); the remaining doc
    scores -ln((c+1)/(c_x+V)) = -ln(2/4) with V=3 (a,b,c), c=1, c_x=1."""
    import math
    from dbsync_spark.functions.text import lm_surprisal

    df = spark.createDataFrame(
        [(1, "a b"), (2, "c")], "doc_id long, text string")
    rows = {r.doc_id: r for r in lm_surprisal(df).collect()}
    assert set(rows) == {1}
    assert abs(rows[1].surprisal - (-math.log(2 / 4))) < 1e-12


def test_triangle_counts_degenerate_graphs(spark):
    """Empty edge list, self-loops only, and a single edge: no triangles,
    no crashes, self-loop-only nodes excluded (consistent with the
    oracle's und filter)."""
    from dbsync_spark.functions.graph import triangle_counts

    empty = spark.createDataFrame([], "src int, dst int")
    assert triangle_counts(empty).count() == 0
    loops = spark.createDataFrame([(1, 1), (2, 2)], "src int, dst int")
    assert triangle_counts(loops).count() == 0
    one = spark.createDataFrame([(1, 2)], "src int, dst int")
    got = {r.node: r.n_triangles for r in triangle_counts(one).collect()}
    assert got == {1: 0, 2: 0}


def test_semantic_dedup_degenerate_corpora(spark):
    """Empty corpus -> empty; single vector -> its own kept rep; two
    exact copies -> min id kept, other dropped at cosine exactly 1."""
    from dbsync_spark.functions.dedup import semantic_dedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semantic_dedup(empty, dim=4, n_planes=4).count() == 0

    v = [0.5, -0.25, 0.125, 1.0]
    one = spark.createDataFrame([(7, v)], "vec_id long, embedding array<double>")
    got = one.transform(lambda df: semantic_dedup(df, dim=4, n_planes=4)).collect()
    assert len(got) == 1 and got[0].keep and got[0].rep_id == 7

    two = spark.createDataFrame([(7, v), (9, v)],
                                "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in semantic_dedup(two, dim=4, n_planes=4).collect()}
    assert rows[7].keep and not rows[9].keep
    assert rows[9].cosine_to_rep == 1.0


def test_knn_classify_single_neighbor(spark):
    """Corpus of 2: the query's only neighbor decides the label with one
    vote; self never votes."""
    from dbsync_spark.functions.similarity import knn_classify

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 5), (2, [0.9, 0.1], 6)],
        "vec_id long, embedding array<double>, label int")
    out = knn_classify(df, df.where(F.col("vec_id") == 1), k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.pred_label == 6 and r.n_votes == 1 and not r.correct


def test_search_ops_on_degenerate_docs(spark):
    """BM25 / phrase / posting / compression over empty text, one-token
    docs, and docs without any query term."""
    from dbsync_spark.functions.text import (bm25_topk, compression_signals,
                                             phrase_occurrences_rowlocal,
                                             phrase_search)

    docs = spark.createDataFrame(
        [(1, ""), (2, "spark"), (3, "nothing matches here"),
         (4, "spark merge spark")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["score_micro"]
           for r in bm25_topk(docs, ["spark", "merge"], k=10).collect()}
    assert set(got) == {2, 4} and got[4] > got[2]

    assert phrase_search(docs, ["spark", "merge"]).collect()[0]["doc_id"] == 4
    assert phrase_occurrences_rowlocal(docs, ["no", "match"]).count() == 0
    assert phrase_search(docs, ["no", "match"]).count() == 0

    comp = {r["doc_id"]: r["orig_bytes"]
            for r in compression_signals(docs).collect()}
    assert comp[1] == 0  # empty doc still emits a row (0 orig bytes)


def test_simhash_pairs_no_pairs_and_single_doc(spark):
    from dbsync_spark.functions.dedup import simhash_pairs

    one = spark.createDataFrame([(1, "only doc here")],
                                "doc_id long, text string")
    assert simhash_pairs(one).count() == 0
    far = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string")
    got = simhash_pairs(far, max_hamming=0).collect()
    assert all(r["hamming"] == 0 for r in got)


def test_bloom_index_empty_eval_set(spark, tmp_path):
    """Flagging against an index that has seen no test docs keeps every
    train doc (nothing can be contaminated)."""
    from dbsync_spark.streaming.bloom_index import StreamingBloomIndex

    idx = StreamingBloomIndex(spark, str(tmp_path / "b"), k=3)
    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string")
    empty = train.where(F.lit(False))
    idx.process_batch(empty, epoch_id=0)
    got = sorted(r["doc_id"] for r in idx.flag(train).collect())
    assert got == [1, 2]


def test_search_index_empty_batch_and_missing_terms(spark, tmp_path):
    from dbsync_spark.streaming.search_index import StreamingSearchIndex

    idx = StreamingSearchIndex(spark, str(tmp_path / "s"))
    docs = spark.createDataFrame(
        [(1, "spark merge window")], "doc_id long, text string")
    idx.process_batch(docs.where(F.lit(False)), epoch_id=0)
    assert idx.bm25(["spark"], k=5).count() == 0
    idx.process_batch(docs, epoch_id=1)
    assert idx.bm25(["absent_term"], k=5).count() == 0
    assert idx.bm25(["spark"], k=5).count() == 1


def test_dsir_empty_target_and_empty_raw(spark, tmp_path):
    """Day-one DSIR states: no target exemplars yet (every weight is
    <= 0: t=0 -> SCALE DIV (r+1) - SCALE), an empty raw pool (no rows
    out), and a streaming model queried before any batch arrived."""
    from dbsync_spark.functions import sampling as smp
    from dbsync_spark.streaming.dsir_index import StreamingDsirIndex

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "c d"), (3, "a b c d")],
        "doc_id long, text string")
    empty = docs.where(F.lit(False))

    w = smp.dsir_bucket_weights(empty, docs)
    rows = w.collect()
    assert rows and all(r["t_n"] == 0 and r["weight"] <= 0 for r in rows)
    scored = smp.dsir_select(docs, empty, 2)
    assert scored.count() == 2  # still ranks (all-raw corpus, <=0 scores)

    assert smp.dsir_select(empty, docs, 5).count() == 0

    idx = StreamingDsirIndex(spark, str(tmp_path / "dsir_empty"))
    assert idx.target_counts().count() == 0
    got = idx.select(docs, 2)
    assert got.count() == 2  # empty model == empty-target batch fit
    want = smp.dsir_select(docs, empty, 2)
    assert got.toPandas().values.tolist() == want.toPandas().values.tolist()


def test_dsir_single_token_docs(spark):
    """Single-token docs produce no bigrams; unigram-only corpora still
    fit and score (no slice/zip_with length error)."""
    from dbsync_spark.functions import sampling as smp

    target = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    raw = spark.createDataFrame([(2, "x"), (3, "y")],
                                "doc_id long, text string")
    got = smp.dsir_select(raw, target, 2).collect()
    assert [r["doc_id"] for r in got] == [2, 3]  # x-doc more target-like
    assert all(r["n_grams"] == 1 for r in got)
