"""Round-10 regression tests for the round-9 ADVICE findings:

1. (medium) ForgettingSimhashIndex.forget() must be IDEMPOTENT under
   re-forgotten doc ids — at-least-once deletion redelivery forgets the
   same doc twice in two separate events; without the guard the second
   event writes a second death delta for the same fingerprint, breaking
   the deaths/revivals alternation the derived dead test depends on
   (a revived fp stayed dead, probes missed its pairs, compact erased
   the live fingerprint).
2. (low) ForgettingSimhashIndex.compact() crash window between the fps
   publish and the death-delta drop: surviving deltas falsely re-kill
   revived fingerprints. Now closed by the `_compact_ready` marker
   protocol (same as ForgettingSpanIndex), with recovery automatic on
   the next mutating operation.
3. (low) bench.gate_verdict: a single slow outlier anchor must not
   permanently disable regression detection when a consistent majority
   cluster of anchors exists.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


_UNIQ = "omega phi chi psi upsilon tau sigma rho"


def _one_doc(spark, doc_id, text=_UNIQ):
    return spark.createDataFrame([(doc_id, text)], ["doc_id", "text"])


def test_simhash_double_forget_then_revival(spark, tmp_path):
    """The ADVICE repro: forget the same sole-holder doc in TWO separate
    forget events (fresh epoch each, as redelivery would), then revive
    the fingerprint under a new id. The fp must count as alive, later
    probes must pair with the survivor, and compact() must keep it."""
    from dbsync_spark.streaming.simhash_index import ForgettingSimhashIndex

    idx = ForgettingSimhashIndex(spark, str(tmp_path / "sh"))
    idx.process_batch(_one_doc(spark, 1), epoch_id=0)
    gone = _one_doc(spark, 1).select("doc_id")
    idx.forget(gone)           # event 1: sole holder -> fp dies
    idx.forget(gone)           # event 2: redelivery -> must be a no-op
    deaths = idx._read_raw_deadfps(idx._epochs("deadfps")).count()
    assert deaths == 1, f"re-forget wrote a duplicate death ({deaths})"

    idx.process_batch(_one_doc(spark, 2), epoch_id=1)  # revival
    assert idx._dead().isEmpty(), "revived fp still counted dead"
    idx.process_batch(_one_doc(spark, 3), epoch_id=2)
    assert _rows(idx.pairs()) == [(2, 3, 0)]

    idx.compact()  # must NOT physically erase the live fingerprint
    assert _rows(idx.pairs()) == [(2, 3, 0)]
    # fp survival checked end-to-end via a fresh probe after compact
    idx.process_batch(_one_doc(spark, 4), epoch_id=3)
    assert _rows(idx.pairs()) == [(2, 3, 0), (2, 4, 0), (3, 4, 0)]


def test_simhash_forget_replay_idempotent(spark, tmp_path):
    """Replaying a forget EPOCH (same epoch_id, the epoch-replay
    contract) must rewrite identical content — the re-forgotten guard
    filters against epochs STRICTLY BEFORE the replayed one, so the
    event's own prior write does not empty its death delta."""
    from dbsync_spark.streaming.simhash_index import ForgettingSimhashIndex

    idx = ForgettingSimhashIndex(spark, str(tmp_path / "sh"))
    idx.process_batch(_one_doc(spark, 1), epoch_id=0)
    gone = _one_doc(spark, 1).select("doc_id")
    idx.forget(gone, epoch_id=0)
    first = _rows(idx._read_raw_deadfps([0]))
    assert first, "sole-holder forget must record a death"
    idx.forget(gone, epoch_id=0)  # replay
    assert _rows(idx._read_raw_deadfps([0])) == first


def test_simhash_compact_crash_recovery(spark, tmp_path, monkeypatch):
    """Fault injection on the exact ADVICE window: crash AFTER the fps
    staged swap publishes (revived fp deduped to one occurrence) but
    BEFORE the death deltas drop. The marker must make the next
    mutating operation finish the publish and drop the deltas, so the
    revived fingerprint is not falsely re-killed."""
    from dbsync_spark.streaming import state as st
    from dbsync_spark.streaming.simhash_index import ForgettingSimhashIndex

    root = str(tmp_path / "sh")
    idx = ForgettingSimhashIndex(spark, root)
    idx.process_batch(_one_doc(spark, 1), epoch_id=0)
    idx.forget(_one_doc(spark, 1).select("doc_id"))
    idx.process_batch(_one_doc(spark, 2), epoch_id=1)  # revival

    real_finish = st.finish_compact
    calls = []

    def crashing_finish(root_, sub):
        calls.append(sub)
        if sub == "pairs":  # banks+fps published, deltas NOT dropped
            raise RuntimeError("injected crash")
        return real_finish(root_, sub)

    monkeypatch.setattr(st, "finish_compact", crashing_finish)
    try:
        idx.compact()
    except RuntimeError:
        pass
    monkeypatch.setattr(st, "finish_compact", real_finish)
    assert os.path.exists(f"{root}/_compact_ready")
    assert idx._epochs("deadfps"), "crash window: deltas still present"

    # next mutating operation recovers automatically
    idx2 = ForgettingSimhashIndex(spark, root)
    idx2.process_batch(_one_doc(spark, 3), epoch_id=2)
    assert not os.path.exists(f"{root}/_compact_ready")
    assert not idx2._epochs("deadfps")
    assert idx2._dead().isEmpty(), "revived fp falsely re-killed"
    assert _rows(idx2.pairs()) == [(2, 3, 0)]


def test_gate_verdict_majority_cluster():
    """A lone slow outlier anchor must not disable regression detection
    when a consistent majority cluster exists (round-9 ADVICE, low)."""
    from bench import gate_verdict

    # consistent anchors: each votes, any trip flags (unchanged)
    assert not gate_verdict(1.0, [1.0, 1.1])
    assert gate_verdict(3.0, [1.0, 1.1])
    # two-anchor split: slowest stays canonical (r8 behavior)
    assert not gate_verdict(5.2, [1.0, 5.0])
    assert gate_verdict(8.5, [1.0, 5.0])
    # 3+ anchors, one slow outlier, consistent fast majority: a new
    # measurement regressing past the majority cluster trips even
    # though it is under the outlier
    assert gate_verdict(4.0, [1.0, 1.1, 9.0])
    assert not gate_verdict(1.2, [1.0, 1.1, 9.0])
    # 3+ anchors where the slowest IS majority-consistent: unchanged
    # slowest-canonical behavior
    assert not gate_verdict(9.5, [8.8, 1.0, 9.0])
    assert gate_verdict(14.0, [8.8, 1.0, 9.0])
