"""StreamingSimJoinIndex: union-over-batches == full recompute (exact,
any batching), replay idempotence, right-to-be-forgotten, compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbsync_spark.functions.dedup import similarity_join
from dbsync_spark.streaming.simjoin_index import (ForgettingSimJoinIndex,
                                                  StreamingSimJoinIndex)
from tests.test_simjoin import _corpus


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.n_inter, r.n_union) for r in df.collect()}


def test_union_over_batches_equals_full(spark, tmp_path):
    docs = _corpus(spark, n_filler=30)
    full = _pairs(similarity_join(docs))
    idx = StreamingSimJoinIndex(spark, str(tmp_path / "sj"))
    emitted = set()
    for epoch in range(3):
        out = idx.process_batch(docs.where(F.col("doc_id") % 3 == epoch),
                                epoch_id=epoch)
        new = _pairs(out)
        assert not (new & emitted)  # exactly-the-new-pairs: no re-emission
        emitted |= new
    assert emitted == full
    assert _pairs(idx.all_pairs()) == full


def test_replay_is_idempotent(spark, tmp_path):
    docs = _corpus(spark, n_filler=20)
    idx = StreamingSimJoinIndex(spark, str(tmp_path / "sj"))
    b0 = docs.where(F.col("doc_id") % 2 == 0)
    b1 = docs.where(F.col("doc_id") % 2 == 1)
    idx.process_batch(b0, epoch_id=0)
    first = _pairs(idx.process_batch(b1, epoch_id=1))
    replay = _pairs(idx.process_batch(b1, epoch_id=1))  # failed-epoch rerun
    assert replay == first
    assert _pairs(idx.all_pairs()) == _pairs(similarity_join(docs))


def test_forget_equals_never_ingested(spark, tmp_path):
    docs = _corpus(spark, n_filler=20)
    idx = ForgettingSimJoinIndex(spark, str(tmp_path / "sj"))
    idx.process_batch(docs, epoch_id=0)
    gone = spark.createDataFrame([(2,)], "doc_id long")
    idx.forget(gone)
    clean = ForgettingSimJoinIndex(spark, str(tmp_path / "clean"))
    clean.process_batch(docs.where(F.col("doc_id") != 2), epoch_id=0)
    assert _pairs(idx.all_pairs()) == _pairs(clean.all_pairs())
    with pytest.raises(ValueError, match="permanently"):
        idx.process_batch(docs.where(F.col("doc_id") == 2), epoch_id=9)


def test_compact_preserves_pairs_and_collapses_files(spark, tmp_path):
    import os

    docs = _corpus(spark, n_filler=20)
    root = str(tmp_path / "sj")
    idx = StreamingSimJoinIndex(spark, root)
    for epoch in range(4):
        idx.process_batch(docs.where(F.col("doc_id") % 4 == epoch),
                          epoch_id=epoch)
    before = _pairs(idx.all_pairs())
    idx.compact()
    assert _pairs(idx.all_pairs()) == before
    for sub in ("sets", "pairs"):
        eps = [d for d in os.listdir(f"{root}/{sub}")
               if d.startswith("epoch=")]
        assert len(eps) == 1, (sub, eps)
    # service still ingests after compaction
    extra = spark.createDataFrame(
        [(900, "a brand new unrelated document about glaciers")],
        "doc_id long, text string")
    idx.process_batch(extra)
    assert _pairs(idx.all_pairs()) == before  # no near-dups introduced


def test_full_reprobe_mode_matches_default(spark, tmp_path):
    """The r8 additive-state probe and the retained full-recompute
    baseline (full_reprobe=True) emit identical per-epoch pairs — the
    cross-check that bucket pruning + lagged-frequency ranking changed
    the COST shape only, never the output."""
    docs = _corpus(spark, n_filler=25)
    fast = StreamingSimJoinIndex(spark, str(tmp_path / "fast"))
    slow = StreamingSimJoinIndex(spark, str(tmp_path / "slow"),
                                 full_reprobe=True)
    for epoch in range(3):
        batch = docs.where(F.col("doc_id") % 3 == epoch)
        assert (_pairs(fast.process_batch(batch, epoch_id=epoch))
                == _pairs(slow.process_batch(batch, epoch_id=epoch)))


def test_bucketed_state_layout(spark, tmp_path):
    """At-rest pruning layout: set rows bucketed by token hash (_b),
    verify arrays by doc id (_d), dfreq deltas by token hash — the
    physical precondition for batch-proportional probe reads."""
    import os

    docs = _corpus(spark, n_filler=10)
    root = str(tmp_path / "sj")
    idx = StreamingSimJoinIndex(spark, root, n_buckets=8)
    idx.process_batch(docs, epoch_id=0)
    for sub, col in (("sets", "_b"), ("dfreq", "_b"), ("arrays", "_d")):
        dirs = [d for d in os.listdir(f"{root}/{sub}/epoch=0")
                if d.startswith(f"{col}=")]
        assert dirs, (sub, os.listdir(f"{root}/{sub}/epoch=0"))
    # the bucket modulus is pinned in root meta: a reopened handle with
    # a DIFFERENT n_buckets argument must adopt the stored layout
    reopened = StreamingSimJoinIndex(spark, root, n_buckets=64)
    assert reopened.nb == 8


def test_forgetting_compact_physically_erases(spark, tmp_path):
    """compact() on the forgetting variant removes tombstoned docs' set
    rows, arrays, dfreq contributions, and pairs from the FILES (not
    just the read path), preserves bucket partition dirs, and the
    erasure marker keeps a second compact from re-rewriting."""
    import os

    from dbsync_spark.streaming.simjoin_index import ForgettingSimJoinIndex

    docs = _corpus(spark, n_filler=15)
    root = str(tmp_path / "sj")
    idx = ForgettingSimJoinIndex(spark, root)
    for epoch in range(2):
        idx.process_batch(docs.where(F.col("doc_id") % 2 == epoch),
                          epoch_id=epoch)
    gone_id = 2
    idx.forget(spark.createDataFrame([(gone_id,)], "doc_id long"))
    before = _pairs(idx.all_pairs())
    idx.compact()
    assert _pairs(idx.all_pairs()) == before
    raw_sets = spark.read.parquet(f"{root}/sets")
    assert raw_sets.where(F.col("doc_id") == gone_id).isEmpty()
    raw_arr = spark.read.parquet(f"{root}/arrays")
    assert raw_arr.where(F.col("doc_id") == gone_id).isEmpty()
    raw_pairs = spark.read.parquet(f"{root}/pairs")
    assert raw_pairs.where((F.col("doc_a") == gone_id)
                           | (F.col("doc_b") == gone_id)).isEmpty()
    # bucket layout survives the rewrite
    eps = [d for d in os.listdir(f"{root}/sets") if d.startswith("epoch=")]
    assert len(eps) == 1
    assert any(d.startswith("_b=")
               for d in os.listdir(f"{root}/sets/{eps[0]}"))
    # dfreq rebuilt from surviving sets: summed df for the forgotten
    # doc's tokens no longer counts it
    total_rows = raw_sets.count()
    dfreq_sum = (spark.read.parquet(f"{root}/dfreq")
                 .agg(F.sum("_df")).first()[0])
    assert dfreq_sum == total_rows
    # marker: second compact with nothing new is a no-op (single epoch,
    # erasure recorded)
    idx.compact()
    assert _pairs(idx.all_pairs()) == before


def test_verify_chunks_matches_one_shot(spark, tmp_path):
    """Chunk-bounded per-batch verify (round-8 ADVICE: bound the
    streaming verify PAYLOAD, not just its storage level) emits
    byte-identical per-epoch pairs to the default auto path — the
    chunks partition the candidate set, so the union re-assembles the
    one-shot result exactly."""
    docs = _corpus(spark, n_filler=25)
    auto = StreamingSimJoinIndex(spark, str(tmp_path / "auto"))
    chunked = StreamingSimJoinIndex(spark, str(tmp_path / "chunked"),
                                    verify_chunks=3)
    for epoch in range(2):
        batch = docs.where(F.col("doc_id") % 2 == epoch)
        assert (_pairs(auto.process_batch(batch, epoch_id=epoch))
                == _pairs(chunked.process_batch(batch, epoch_id=epoch)))
    assert _pairs(chunked.all_pairs()) == _pairs(similarity_join(docs))
