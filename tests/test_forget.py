"""Right-to-be-forgotten on the streaming indexes: post-forget state
must equal an index that never saw the forgotten documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsync_spark.sources.tables import read_table
from dbsync_spark.streaming.dedup_index import ForgettingDedupIndex
from dbsync_spark.streaming.search_index import ForgettingSearchIndex

TERMS = ["spark", "merge", "window"]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_search_index_forget_equals_rebuild(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    full = ForgettingSearchIndex(spark, str(tmp_path / "full"))
    for e in range(3):
        full.process_batch(docs.where(F.col("doc_id") % 3 == e), epoch_id=e)

    gone = docs.where(F.col("doc_id") % 7 == 0).select("doc_id")
    full.forget(gone)

    rebuilt = ForgettingSearchIndex(spark, str(tmp_path / "rebuilt"))
    survivors = docs.where(F.col("doc_id") % 7 != 0)
    for e in range(3):
        rebuilt.process_batch(survivors.where(F.col("doc_id") % 3 == e),
                              epoch_id=e)

    assert _rows(full.bm25(TERMS, k=10)) == _rows(rebuilt.bm25(TERMS, k=10))
    assert _rows(full.phrase(["the", "table"])) == \
        _rows(rebuilt.phrase(["the", "table"]))
    # the forgotten ids are unreachable through every accessor
    left = set(r["doc_id"] for r in full.postings().select("doc_id")
               .distinct().collect())
    assert not left & set(r["doc_id"] for r in gone.collect())


def test_search_index_forget_replay_idempotent(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200)
    idx = ForgettingSearchIndex(spark, str(tmp_path / "s"))
    idx.process_batch(docs, epoch_id=0)
    gone = docs.where(F.col("doc_id") % 5 == 0).select("doc_id")
    idx.forget(gone, epoch_id=0)
    before = _rows(idx.bm25(TERMS, k=10))
    idx.forget(gone, epoch_id=0)  # replay
    assert _rows(idx.bm25(TERMS, k=10)) == before


def test_dedup_index_forget_hides_docs_and_pairs(spark, tmp_path):
    base = ("spark table merge join filter scan window batch stream hash "
            "sort group row column value data query order part line key "
            "extra tokens to make shingles ")
    rows = [(i, base + f"suffix{i % 3}") for i in range(12)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    idx = ForgettingDedupIndex(spark, str(tmp_path / "full"), threshold=0.5)
    for e in range(2):
        idx.process_batch(docs.where(F.col("doc_id") % 2 == e), epoch_id=e)
    assert idx.all_pairs().count() > 0

    gone = docs.where(F.col("doc_id") < 4).select("doc_id")
    idx.forget(gone)
    gone_ids = {r["doc_id"] for r in gone.collect()}

    pairs_after = idx.all_pairs().collect()
    assert pairs_after, "unforgotten near-dups must survive"
    for r in pairs_after:
        assert r["doc_a"] not in gone_ids and r["doc_b"] not in gone_ids

    # a future probe cannot match a forgotten doc: new batch of exact
    # copies of a forgotten doc's text finds only unforgotten partners
    probe = spark.createDataFrame([(100, rows[0][1])], ["doc_id", "text"])
    new_pairs = idx.process_batch(probe, epoch_id=5).collect()
    for r in new_pairs:
        assert r["doc_a"] not in gone_ids and r["doc_b"] not in gone_ids
    assert any(r["doc_a"] == 100 or r["doc_b"] == 100 for r in new_pairs)


def test_corpus_service_example_runs(spark, sf_dir):
    """The composed governed-corpus example (decontaminate -> index ->
    retrieve -> forget) runs end-to-end and its internal invariant
    assertions hold."""
    import examples.corpus_service as svc

    argv = ["corpus_service.py", sf_dir]
    old = list(__import__("sys").argv)
    try:
        __import__("sys").argv = argv
        assert svc.main() == 0
    finally:
        __import__("sys").argv = old


def test_reingest_after_forget_raises(spark, tmp_path):
    """Tombstones apply to all epochs at read time, so a forgotten id is
    permanently retired: re-ingesting it must fail loudly, not vanish
    silently (round-4 ADVICE)."""
    import pytest

    rows = [(i, f"doc number {i} spark merge window join filter extra "
                f"tokens for shingles {i}") for i in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    sidx = ForgettingSearchIndex(spark, str(tmp_path / "s"))
    sidx.process_batch(docs.where(F.col("doc_id") < 4), epoch_id=0)
    sidx.forget(docs.where(F.col("doc_id") == 2).select("doc_id"))
    with pytest.raises(ValueError, match="permanently"):
        sidx.process_batch(docs.where(F.col("doc_id") >= 2), epoch_id=1)
    # disjoint batches still ingest fine
    sidx.process_batch(docs.where(F.col("doc_id") > 4), epoch_id=2)

    didx = ForgettingDedupIndex(spark, str(tmp_path / "d"))
    didx.process_batch(docs.where(F.col("doc_id") < 4), epoch_id=0)
    didx.forget(docs.where(F.col("doc_id") == 1).select("doc_id"))
    with pytest.raises(ValueError, match="permanently"):
        didx.process_batch(docs.where(F.col("doc_id") <= 1), epoch_id=1)
    didx.process_batch(docs.where(F.col("doc_id") > 4), epoch_id=2)


def test_bloom_index_forget_equals_rebuild(spark, tmp_path):
    """ForgettingBloomIndex: after forgetting eval docs, flag() must equal
    an index built from only the surviving eval docs — including the
    shared-shingle subtlety (a hash carried by BOTH a forgotten and a
    surviving doc must keep contaminating)."""
    from dbsync_spark.streaming.bloom_index import ForgettingBloomIndex

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    evals = [
        (0, "alpha beta gamma delta"),          # forget
        (1, "epsilon zeta eta theta"),          # keep
        (2, "alpha beta gamma iota"),           # keep — shares shingle w/ 0
        (3, "kappa lambda mu nu"),              # forget
    ]
    train = mk([
        (100, "alpha beta gamma"),    # shared with surviving doc 2: dirty
        (101, "kappa lambda mu"),     # only in forgotten doc 3: clean
        (102, "totally novel words here"),  # clean
        (103, "epsilon zeta eta"),    # surviving doc 1: dirty
    ])

    idx = ForgettingBloomIndex(spark, str(tmp_path / "f"), k=3)
    idx.process_batch(mk(evals[:2]), epoch_id=0)
    idx.process_batch(mk(evals[2:]), epoch_id=1)
    idx.forget(mk([(0, ""), (3, "")]).select("doc_id"))

    rebuilt = ForgettingBloomIndex(spark, str(tmp_path / "r"), k=3)
    rebuilt.process_batch(mk([evals[1]]), epoch_id=0)
    rebuilt.process_batch(mk([evals[2]]), epoch_id=1)

    got = sorted((r["doc_id"], r["n_shingles"])
                 for r in idx.flag(train).collect())
    want = sorted((r["doc_id"], r["n_shingles"])
                  for r in rebuilt.flag(train).collect())
    assert got == want
    assert {d for d, _ in got} == {101, 102}

    # forget replay is idempotent; re-ingest of a forgotten id raises
    idx.forget(mk([(0, ""), (3, "")]).select("doc_id"), epoch_id=0)
    assert sorted((r["doc_id"], r["n_shingles"])
                  for r in idx.flag(train).collect()) == got
    import pytest

    with pytest.raises(ValueError, match="permanently"):
        idx.process_batch(mk([(3, "kappa lambda mu nu")]), epoch_id=5)


def test_dedup_index_compaction_physically_erases(spark, tmp_path):
    """ForgettingDedupIndex.compact(): pairs/docs/bands collapse to one
    epoch each, queryable state is unchanged, and the forgotten docs'
    TEXT is physically gone from the parquet files (not just hidden by
    the read-time anti-join)."""
    import os

    from dbsync_spark.streaming.state import list_epochs

    base = ("spark table merge join filter scan window batch stream hash "
            "sort group row column value data query order part line key ")
    rows = [(i, base + f"suffix{i % 3}") for i in range(12)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    idx = ForgettingDedupIndex(spark, str(tmp_path / "dc"), threshold=0.5)
    for e in range(3):
        idx.process_batch(docs.where(F.col("doc_id") % 3 == e), epoch_id=e)
    idx.forget(docs.where(F.col("doc_id") < 2).select("doc_id"))

    before = sorted(map(tuple, idx.all_pairs().collect()))
    idx.compact()

    for sub in ("docs", "bands", "pairs"):
        assert list_epochs(str(tmp_path / "dc"), sub) == [2], sub
    assert sorted(map(tuple, idx.all_pairs().collect())) == before

    raw_docs = spark.read.parquet(str(tmp_path / "dc" / "docs"))
    assert {r["doc_id"] for r in raw_docs.collect()} & {0, 1} == set()
    raw_pairs = spark.read.parquet(str(tmp_path / "dc" / "pairs"))
    touched = {r["doc_a"] for r in raw_pairs.collect()} | {
        r["doc_b"] for r in raw_pairs.collect()}
    assert touched & {0, 1} == set()

    # file count bounded: one data file per sub
    for sub in ("docs", "bands", "pairs"):
        d = tmp_path / "dc" / sub / "epoch=2"
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (sub, files)

    # the index keeps working: a new batch probes the compacted state
    extra = spark.createDataFrame([(100, base + "suffix2")],
                                  ["doc_id", "text"])
    new_pairs = idx.process_batch(extra)  # auto epoch 3
    partners = {r["doc_b"] for r in new_pairs.collect()} | {
        r["doc_a"] for r in new_pairs.collect()}
    assert 100 in partners and len(partners) > 1
