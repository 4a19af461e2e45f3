"""Runnable GOVERNED CORPUS SERVICE over the documents fixture: the
intake-to-retrieval loop a training-data platform runs continuously.

    python examples/corpus_service.py [sf_dir]   # default sf0.001

Stages (every piece a declared operator elsewhere in the engine):

  1. Register eval sets   streaming/bloom_index.StreamingBloomIndex —
                          held-out benchmark docs arrive over time; the
                          Bloom bitmap ORs in each batch (idempotent),
                          the exact hash set unions.
  2. Intake + indexing    streaming/search_index.ForgettingSearchIndex
                          — micro-batches of training docs append
                          positional postings + doc stats.
  3. Decontamination      bloom.flag(train) — clean docs only (Bloom
                          prefilter, exact verify of flagged residue).
  4. Retrieval            index.bm25(...) / index.phrase(...) over the
                          accumulated posting lists.
  5. Governance           index.forget(ids) — right-to-be-forgotten
                          tombstones; post-forget retrieval equals an
                          index that never saw those docs.
  6. Curation             streaming/dsir_index.StreamingDsirIndex —
                          DSIR importance resampling against a target
                          domain whose exemplars register over time.

Invariants printed at the end (and pinned in tests/test_forget.py /
test_bloom_index.py / test_text_search.py): streamed state == one-pass
batch results; forgotten ids unreachable through every accessor.
"""

from __future__ import annotations

import sys
import tempfile


def main() -> int:
    import os

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from dbsync_spark.session import get_spark
    from dbsync_spark.sources.tables import read_table
    from dbsync_spark.streaming.bloom_index import StreamingBloomIndex
    from dbsync_spark.streaming.search_index import ForgettingSearchIndex

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-service")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    evals = docs.where(F.col("source") == "src19")
    train = docs.where(F.col("source") != "src19")

    # 1. eval sets register incrementally
    bloom = StreamingBloomIndex(spark, tempfile.mkdtemp(prefix="svc_bloom_"))
    for e in range(2):
        bloom.process_batch(evals.where(F.col("doc_id") % 2 == e),
                            epoch_id=e)

    # 3. decontaminate the intake stream BEFORE indexing
    clean_ids = bloom.flag(train).select("doc_id")
    clean = train.join(clean_ids, on="doc_id", how="semi")
    n_train, n_clean = train.count(), clean.count()
    print(f"intake: {n_train} train docs, {n_clean} clean after "
          f"decontamination ({n_train - n_clean} contaminated)")

    # 2. index the clean stream in micro-batches
    index = ForgettingSearchIndex(spark, tempfile.mkdtemp(prefix="svc_idx_"))
    for e in range(3):
        index.process_batch(clean.where(F.col("doc_id") % 3 == e),
                            epoch_id=e)

    # 4. retrieval
    top = index.bm25(["spark", "merge", "window"], k=5).collect()
    if not top:
        print("no documents match the demo query terms in this corpus; "
              "nothing to retrieve or forget")
        return 0
    print("bm25 top-5:", [(r["doc_id"], r["score_micro"]) for r in top])
    hits = index.phrase(["the", "table"]).count()
    print(f"phrase 'the table': {hits} matching docs")

    # 5. governance: forget the current top hit, prove it is gone
    victim = top[0]["doc_id"]
    index.forget(spark.createDataFrame([(victim,)], "doc_id long"))
    after = index.bm25(["spark", "merge", "window"], k=5).collect()
    assert all(r["doc_id"] != victim for r in after), "forget leaked"
    print(f"after forget({victim}): top-5 =",
          [(r["doc_id"], r["score_micro"]) for r in after])

    # 6. maintenance: compact the posting epochs — queries unchanged,
    # the forgotten doc's postings PHYSICALLY erased (storage-level
    # erasure, not just read-time hiding), file count O(1)
    index.compact()
    compacted = index.bm25(["spark", "merge", "window"], k=5).collect()
    assert [(r["doc_id"], r["score_micro"]) for r in compacted] == \
        [(r["doc_id"], r["score_micro"]) for r in after], "compact changed results"
    raw = spark.read.parquet(f"{index.root}/postings")
    assert raw.where(F.col("doc_id") == victim).count() == 0, \
        "compaction left forgotten postings on disk"
    print(f"after compact: results unchanged; doc {victim}'s postings "
          "physically erased")

    # 7. eval-set governance: a registered benchmark doc can be forgotten
    # too (ForgettingBloomIndex rebuilds the bitmap from survivors)
    from dbsync_spark.streaming.bloom_index import ForgettingBloomIndex

    fbloom = ForgettingBloomIndex(spark,
                                  tempfile.mkdtemp(prefix="svc_fbloom_"))
    for e in range(2):
        fbloom.process_batch(evals.where(F.col("doc_id") % 2 == e),
                             epoch_id=e)
    gone_eval = evals.limit(1).select("doc_id")
    before_n = fbloom.flag(train).count()
    fbloom.forget(gone_eval)
    after_n = fbloom.flag(train).count()
    print(f"eval forget: clean-train count {before_n} -> {after_n} "
          "(never decreases — fewer eval shingles can only free docs)")
    assert after_n >= before_n
    # 8. curation: DSIR data selection against a target domain whose
    # exemplars register over time (streaming/dsir_index.py) — pick the
    # most target-like clean docs for the next training mix
    from dbsync_spark.streaming.dsir_index import StreamingDsirIndex

    exemplars = clean.where(F.col("source") == "src0")
    pool = clean.where(F.col("source") != "src0")
    dsir = StreamingDsirIndex(spark, tempfile.mkdtemp(prefix="svc_dsir_"))
    for e in range(2):
        dsir.process_batch(exemplars.where(F.col("doc_id") % 2 == e),
                           epoch_id=e)
    picks = dsir.select(pool, k=5).collect()
    print("dsir top-5 target-like:",
          [(r["doc_id"], r["score"]) for r in picks])

    print("OK: forgotten ids unreachable; compaction exact; "
          "invariants hold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
