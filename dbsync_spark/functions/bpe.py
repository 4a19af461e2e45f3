"""Distributed BPE (byte-pair-encoding) tokenizer training.

The merge loop LOOKS driver-sequential, but distributes cleanly:
- state lives in the (word, cnt, enc) word-frequency table, which is
  post-aggregation data — at 100 TB of corpus this is the distinct-word
  table (millions of rows, not trillions of tokens), spread across the
  cluster;
- each merge round is one map-side-combined pair-count aggregate plus a
  TakeOrdered(1) argmax (no full sort), and the ONLY driver state is
  that single best-pair row per round — the k-means/BPE "tiny aggregate
  crosses the driver" shape;
- applying a merge is a narrow per-row literal `replace` (JVM codegen,
  no Python), lineage truncated per round.

Exactness (the interesting part — an order-DEPENDENT greedy algorithm
that still hash-matches a SQL oracle):
- words are restricted to [a-z]+ runs, so the segmentation can be
  encoded as a flat string with '#' delimiters that can never collide
  with symbol characters;
- the encoding doubles the delimiter ("##a##b##"), and a merge of pair
  (a, b) is the LITERAL replace  '#a##b#' -> '#ab#' : each match
  consumes one of the two delimiters on each side, so back-to-back
  merge sites ("abab") still match, while overlapping sites ("aaa")
  resolve left-to-right non-overlapping — exactly Python's
  str.replace / re.sub greedy semantics. Spark's `replace`, DuckDB's
  `replace`, and Python's `str.replace` all scan left-to-right
  non-overlapping, so all three segmentations are bit-identical
  (pinned: oracle hash-match + pytest vs a pure-Python reference);
- ties in the pair-count argmax break by (count DESC, left ASC,
  right ASC) in both engines — integer counts, no floats anywhere.

At real tokenizer scale (~30k merges) the per-round latency would be
batched (apply the top-k non-conflicting merges per round); the round
structure and state shapes here are the scale-correct ones, the merge
count is what tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_MERGES = 12


def words_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) frequency table of lowercase [a-z]+ runs — the
    classic BPE training input. One explode + one map-side-combined
    aggregate; the corpus is touched exactly once."""
    return (docs.select(F.explode(
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"))
        .alias("word"))
        .where(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("cnt")))


def _encode(col):
    """word -> '##'-delimited character segmentation ('ab' -> '##a##b##')."""
    return F.concat(F.regexp_replace(col, "(.)", "##$1"), F.lit("##"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, n): total adjacent-pair frequencies under the current
    segmentation, weighted by word count (overlapping positions each
    count, as in reference BPE)."""
    syms = F.filter(F.split("enc", "##"), lambda s: s != F.lit(""))
    return (words.withColumn("syms", syms)
            .select("cnt", F.explode(F.arrays_zip(
                F.slice("syms", 1, F.size("syms") - 1).alias("a"),
                F.slice("syms", 2, F.size("syms") - 1).alias("b")))
                .alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
            .groupBy("a", "b").agg(F.sum("cnt").alias("n")))


def bpe_train(docs: DataFrame, text_col: str = "text",
              n_merges: int = BPE_MERGES):
    """Train `n_merges` BPE merges over the corpus. Returns
    (merges, words): `merges` a list of (rank, left, right, n) driver
    rows (bounded: one per round), `words` the final segmented
    (word, cnt, enc) DataFrame for downstream encoding."""
    words = (words_table(docs, text_col)
             .withColumn("enc", _encode(F.col("word")))
             .localCheckpoint())
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (_pair_counts(words)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1).collect())
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], best[0]["n"]
        merges.append((rank, a, b, int(n)))
        words = (words.withColumn(
            "enc", F.expr(
                f"replace(enc, '#{a}##{b}#', '#{a}{b}#')"))
            .localCheckpoint())
    return merges, words


def bpe_token_counts(docs: DataFrame, words: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_tokens): per-document BPE token count under the trained
    segmentation. The real-scale BPE-apply optimization: documents
    join the DISTINCT-word segmentation table instead of re-running
    merges per token occurrence. Token count per word is pure string
    arithmetic on the encoding (delimiter count / 2 - 1)."""
    n_syms = (F.length("enc")
              - F.length(F.regexp_replace("enc", "#", ""))) / 2 - 1
    seg = words.select("word", n_syms.cast("long").alias("n_syms"))
    doc_words = (docs.select(
        F.col(id_col),
        F.explode(F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"))
        .alias("word"))
        .where(F.col("word") != ""))
    return (docs.select(id_col)
            .join(doc_words.join(seg, on="word")
                  .groupBy(id_col).agg(F.sum("n_syms").alias("n_tokens")),
                  on=id_col, how="left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens")))


def bpe_reference(texts: list[str], n_merges: int = BPE_MERGES):
    """Pure-Python reference implementing the identical recurrence
    (segmentations as symbol tuples, same tiebreak). Used by tests."""
    import re
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        wc.update(re.findall(r"[a-z]+", t.lower()))
    segs = {w: tuple(w) for w in wc}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), n = sorted(pc.items(),
                           key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((rank, a, b, n))
        for w, syms in segs.items():
            # canonical greedy left-to-right non-overlapping merge
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == a and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = tuple(out)
    return merges, segs
