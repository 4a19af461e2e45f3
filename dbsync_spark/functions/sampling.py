"""Deterministic sampling, mixture weighting, and sequence packing for
training-data pipelines.

All sampling here is HASH-based, never rand(): a row's fate is a pure
function of its key, so (a) the sample is reproducible across runs,
engines, and cluster sizes, (b) resampling at a different rate is a
superset/subset (rate 10% ⊂ rate 20%), and (c) there is no RNG state to
coordinate across 1000 executors. This is how production corpus pipelines
sample; rand()-based sampling is not re-runnable and can't be
oracle-checked.

Sequence packing assigns documents to fixed-token-budget packs (context
windows) with a running token count — a window cumsum, not a driver loop,
so it scales to any corpus partitioned by stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsync_spark.functions.text import h15

SAMPLE_MOD = 10_000  # basis points: rates are exact in 0.01% steps


def hash_bucket(key: Column) -> Column:
    """Stable per-key bucket in [0, SAMPLE_MOD): md5-derived so any engine
    reproduces it (h15 spec shared with the DuckDB oracles)."""
    return h15(key.cast("string")) % SAMPLE_MOD


def hash_sample(df: DataFrame, key: str, rate_bp: int) -> DataFrame:
    """Keep rows whose key-bucket falls below rate_bp basis points
    (rate_bp=1000 -> 10% deterministic sample)."""
    return df.where(hash_bucket(F.col(key)) < rate_bp)


def data_split(df: DataFrame, key: str,
               val_bp: int = 500, test_bp: int = 500,
               col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment by key hash: buckets
    [0, val_bp) -> 'val', [val_bp, val_bp+test_bp) -> 'test', the rest
    'train'. Pure scan-side expression — no shuffle, no RNG — so the
    split is identical across runs, engines, and cluster sizes, a row
    never changes split when the corpus grows (its bucket depends only
    on its own key), and the same key always lands in the same split
    across datasets (leakage-safe joins on key)."""
    b = hash_bucket(F.col(key))
    return df.withColumn(col, F.when(b < val_bp, "val")
                         .when(b < val_bp + test_bp, "test")
                         .otherwise("train"))


def stratified_sample(df: DataFrame, key: str, stratum: str,
                      rates_bp: dict[str, int],
                      default_bp: int = 0) -> DataFrame:
    """Per-stratum hash sampling (e.g. keep 80% of 'en', 20% of the rest):
    the rate lookup is a CASE expression — no join, no shuffle, evaluated
    at the scan."""
    rate = F.lit(default_bp)
    for value, bp in rates_bp.items():
        rate = F.when(F.col(stratum) == value, F.lit(bp)).otherwise(rate)
    return df.where(hash_bucket(F.col(key)) < rate)


def mixture_weights(df: DataFrame, stratum: str,
                    target_bp: dict[str, int]) -> DataFrame:
    """Given target mixture proportions (basis points of the output), emit
    per-stratum (n_rows, target_bp, required sampling rate vs the largest
    stratum) — the planning step of corpus mixing. All arithmetic is
    integer/exact until the final ratio division."""
    counts = df.groupBy(stratum).agg(F.count("*").alias("n_rows"))
    tgt = F.lit(0)
    for value, bp in target_bp.items():
        tgt = F.when(F.col(stratum) == value, F.lit(bp)).otherwise(tgt)
    w = counts.withColumn("target_bp", tgt)
    # rows available per basis point; the binding stratum has the minimum
    per_bp = F.col("n_rows").cast("double") / F.col("target_bp")
    scale = w.where(F.col("target_bp") > 0).agg(
        F.min(per_bp).alias("_rows_per_bp"))
    return (w.join(F.broadcast(scale))
            .select(stratum, "n_rows", "target_bp",
                    (F.col("target_bp") * F.col("_rows_per_bp"))
                    .alias("target_rows")))


def weighted_sample(df: DataFrame, key: str, weight: Column,
                    max_weight: int) -> DataFrame:
    """Per-row weighted Bernoulli sampling, deterministically: a row with
    weight w (an integer column, e.g. document length or a quality score)
    is kept iff hash_bucket(key) * max_weight < w * SAMPLE_MOD — i.e. with
    probability w / max_weight, but as a pure function of the key. All
    arithmetic stays integer (no float rates), so any engine reproduces
    the exact keep-set; weights above max_weight clamp to always-keep.

    This is importance sampling for corpus curation (keep long/high-
    quality documents preferentially) with the same scale properties as
    hash_sample: evaluated at the scan, no shuffle, no RNG coordination
    across executors, re-runnable.

    NULL weights drop the row (weight 0): LEAST skips NULLs in both
    Spark and DuckDB, which would silently turn "weight unknown" into
    "always keep" — the opposite of the curation intent.
    """
    w = F.least(F.coalesce(weight.cast("long"), F.lit(0).cast("long")),
                F.lit(max_weight).cast("long"))
    return df.where(
        hash_bucket(F.col(key)) * F.lit(max_weight) < w * F.lit(SAMPLE_MOD))


def pack_sequences(df: DataFrame, id_col: str, len_col: str,
                   budget: int, stream_col: str | None = None) -> DataFrame:
    """Assign each document to a pack (context window) of at most `budget`
    tokens... approximately: pack_id = floor(start_offset / budget), where
    start_offset is the running sum of lengths before this doc (documents
    longer than the budget still get a pack; callers chunk them first).

    One window cumsum per stream — fully parallel across streams. The
    offset-based rule is deterministic and relational (no greedy driver
    loop), the standard scalable approximation of first-fit packing.
    """
    parts = [stream_col] if stream_col else []
    w = (Window.partitionBy(*parts).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    end_offset = F.sum(F.col(len_col)).over(w)
    start_offset = end_offset - F.col(len_col)
    out_cols = ([F.col(stream_col)] if stream_col else []) + [
        F.col(id_col), F.col(len_col),
        start_offset.alias("start_offset"),
        F.floor(start_offset / budget).cast("long").alias("pack_id"),
    ]
    return df.select(*out_cols)


# ---------------------------------------------------------------------------
# DSIR: Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------
#
# Select raw-corpus documents whose hashed-n-gram distribution looks like a
# small TARGET corpus: featurize every document as a bag of unigrams+bigrams
# hashed into DSIR_BUCKETS buckets, fit per-bucket counts on target and raw,
# and score each raw document by how target-like its buckets are. The paper
# scores log( p_target(b) / p_raw(b) ) summed over the document's grams and
# resamples by Gumbel top-k; both are implemented below (dsir_log_weights /
# gumbel_topk). The DEFAULT weight here is the centered integer ratio
#
#     w_b = ((t_b + 1) * DSIR_SCALE) // (r_b + 1)  -  DSIR_SCALE
#
# i.e. DSIR_SCALE * ((t_b+1)/(r_b+1) - 1), the first-order expansion
# ln x ~= x - 1 of the paper's log ratio: target-like buckets score
# positive, raw-like negative, unseen exactly 0 — and every value is
# integer, so scores (not just rankings) reproduce bit-exactly in any
# engine (the DuckDB oracles hash-match them). The global normalization
# constant (R+B)/(T+B) of the true probability ratio multiplies every w_b
# equally and the document score is LINEAR in w_b, so dropping it never
# reorders documents — unlike the log form, where it adds per-gram and
# must be kept.
#
# Scale shape (the reason DSIR is THE data-selection recipe at 100 TB):
# the feature space is a fixed B buckets no matter the corpus size, so the
# fitted "model" is 2*B integers — a broadcast table. Scoring is one scan:
# explode grams, map-side-combined (doc, bucket) counts, broadcast join,
# integer sum. No shuffle wider than one row per (doc, distinct-bucket).

DSIR_BUCKETS = 10_000
DSIR_SCALE = 1 << 20


def _grams(text: Column) -> Column:
    """Unigrams + space-joined bigrams from the shared whitespace
    tokenizer — the paper's feature set. Row-local array ops (codegen;
    no explode until the caller needs one)."""
    t = F.split(text, " ")
    bigrams = F.when(
        F.size(t) >= 2,
        F.zip_with(F.slice(t, 1, F.size(t) - 1),
                   F.slice(t, 2, F.size(t) - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bigrams)


def hashed_gram_buckets(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """One (id, bucket) row per gram occurrence: h15(gram) % n_buckets,
    the engine-portable hashing-trick featurizer (same md5-derived hash
    the oracles reproduce in SQL)."""
    return (df.select(F.col(id_col),
                      F.explode(_grams(F.col(text_col))).alias("_g"))
            .select(id_col,
                    (h15(F.col("_g")) % n_buckets).alias("bucket")))


def dsir_bucket_weights(target: DataFrame, raw: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Fit the bucket model: (bucket, t_n, r_n, weight) with the centered
    integer-ratio weight described in the module note. Both count frames
    are at most n_buckets rows — broadcastable regardless of corpus size."""
    t_cnt = (hashed_gram_buckets(target, id_col, text_col, n_buckets)
             .groupBy("bucket").agg(F.count("*").alias("t_n")))
    r_cnt = (hashed_gram_buckets(raw, id_col, text_col, n_buckets)
             .groupBy("bucket").agg(F.count("*").alias("r_n")))
    return dsir_weights_from_counts(t_cnt, r_cnt)


def dsir_weights_from_counts(t_cnt: DataFrame,
                             r_cnt: DataFrame) -> DataFrame:
    """Counts -> centered integer weights; shared by the one-pass batch
    fit above and the streaming index (streaming/dsir_index.py), whose
    target counts are a sum over epoch deltas — integer addition is
    associative/commutative, so streamed == batch is exact."""
    joined = (t_cnt.join(r_cnt, "bucket", "full_outer")
              .select("bucket",
                      F.coalesce("t_n", F.lit(0)).cast("long").alias("t_n"),
                      F.coalesce("r_n", F.lit(0)).cast("long").alias("r_n")))
    return joined.withColumn(
        "weight",
        F.expr(f"((t_n + 1) * {DSIR_SCALE}) DIV (r_n + 1) - {DSIR_SCALE}"))


def dsir_log_weights(target: DataFrame, raw: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """The paper's weight verbatim: add-1-smoothed log probability ratio
    ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B)) as a double `weight` column.
    Float path — rankings only (ln is not cross-engine bit-exact; the
    pure-python parity and the agreement with the integer surrogate are
    pytest-pinned instead of oracle-checked)."""
    w = dsir_bucket_weights(target, raw, id_col, text_col, n_buckets)
    totals = w.agg(F.sum("t_n").alias("_t_tot"), F.sum("r_n").alias("_r_tot"))
    b = F.lit(float(n_buckets))
    return (w.join(F.broadcast(totals))
            .select("bucket", "t_n", "r_n",
                    (F.log((F.col("t_n") + 1).cast("double")
                           / (F.col("_t_tot").cast("double") + b))
                     - F.log((F.col("r_n") + 1).cast("double")
                             / (F.col("_r_tot").cast("double") + b)))
                    .alias("weight")))


def per_bucket_counts(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(id, bucket, _c) gram-occurrence counts per document — the shared
    featurized form: scoring consumes it directly, and summing it by
    bucket gives the corpus counts, so a fit-and-score over the same
    corpus reads the corpus ONCE (the identical shuffle subtree is
    deduplicated by Spark's ReuseExchange — verified in the q_dsir_select
    physical plan)."""
    return (hashed_gram_buckets(df, id_col, text_col, n_buckets)
            .groupBy(id_col, "bucket").agg(F.count("*").alias("_c")))


def dsir_score(df: DataFrame, weights: DataFrame,
               id_col: str = "doc_id", text_col: str = "text",
               n_buckets: int = DSIR_BUCKETS,
               counts: DataFrame | None = None) -> DataFrame:
    """Score documents against a fitted bucket model: one (id, n_grams,
    score) row per document, score = sum over the doc's gram occurrences
    of the bucket weight. (doc, bucket) counts are pre-aggregated (map-
    side combine) before the broadcast join, so the shuffle carries one
    row per distinct bucket per doc, not one per token. Buckets absent
    from the model contribute 0 — exactly the centered weight of a
    never-seen bucket — so the scorer works unchanged on new corpora.
    Pass `counts` (a per_bucket_counts frame) to score pre-featurized
    documents without re-reading `df`."""
    per_bucket = (counts if counts is not None
                  else per_bucket_counts(df, id_col, text_col, n_buckets))
    # integer surrogate weights -> exact BIGINT scores (oracle-hashable);
    # the float log path keeps double resolution (rankings only)
    w_type = dict(weights.dtypes)["weight"]
    score_type = "long" if w_type in ("bigint", "int", "long") else "double"
    return (per_bucket
            .join(F.broadcast(weights.select("bucket", "weight")),
                  "bucket", "left")
            .groupBy(id_col)
            .agg(F.sum("_c").cast("long").alias("n_grams"),
                 F.sum(F.col("_c")
                       * F.coalesce("weight", F.lit(0)))
                 .cast(score_type).alias("score")))


def dsir_select(raw: DataFrame, target: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """End-to-end DSIR selection: fit weights (target vs raw), score the
    raw corpus, keep the k most target-like documents. Deterministic
    top-k by (score desc, id) — orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k, k-row driver merge),
    never a single-task global window.

    The raw corpus — the 100 TB side — is featurized ONCE: its r_n
    counts are the bucket-sum of the same per-(doc, bucket) frame the
    scorer consumes, so the scan+explode+partial-aggregate subtree is
    shared and Spark's ReuseExchange executes it a single time."""
    raw_counts = per_bucket_counts(raw, id_col, text_col, n_buckets)
    t_cnt = (hashed_gram_buckets(target, id_col, text_col, n_buckets)
             .groupBy("bucket").agg(F.count("*").alias("t_n")))
    r_cnt = raw_counts.groupBy("bucket").agg(F.sum("_c").alias("r_n"))
    w = dsir_weights_from_counts(t_cnt, r_cnt)
    scored = dsir_score(raw, w, id_col, text_col, n_buckets,
                        counts=raw_counts)
    return (scored.orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def dsir_domain_weights(docs: DataFrame, domain_col: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Multi-target DSIR: per-domain centered weights, each domain fit
    one-vs-rest — from ONE corpus pass. The (domain, bucket) counts are
    a single map-side-combined aggregate; the rest-count is
    total_bucket - own_count (no per-domain re-scan), so fitting K
    domains costs the same scan as fitting one. The model is
    <= K * n_buckets rows — still a broadcast table."""
    cnt = (docs.select(F.col(domain_col).alias("domain"),
                       F.explode(_grams(F.col(text_col))).alias("_g"))
           .select("domain", (h15(F.col("_g")) % n_buckets).alias("bucket"))
           .groupBy("domain", "bucket").agg(F.count("*").alias("t_n")))
    tot = cnt.groupBy("bucket").agg(F.sum("t_n").alias("_tot"))
    return (cnt.join(tot, "bucket")
            .select("domain", "bucket", "t_n",
                    (F.col("_tot") - F.col("t_n")).alias("r_n"))
            .withColumn("weight",
                        F.expr(f"((t_n + 1) * {DSIR_SCALE}) DIV (r_n + 1)"
                               f" - {DSIR_SCALE}")))


def dsir_domain_tag(docs: DataFrame, weights: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Tag each document with its best-matching domain (the mixture-
    construction / naive-Bayes-style classification step): score the doc
    against every domain's weights, keep the argmax (ties broken by
    domain name). One (id, bucket) featurization, a broadcast join that
    expands to K rows per (doc, distinct bucket) but partial-aggregates
    before the shuffle (the wire carries K rows per doc), and a window
    PARTITIONED by doc for the argmax — never a global sort. Buckets
    absent from the model contribute 0 to every domain equally (the
    inner join drops them), so tagging unseen corpora is well-defined —
    EXCEPT a document sharing no bucket at all with the model, which is
    omitted from the output (every domain ties at 0; there is no honest
    argmax). Callers needing total coverage anti-join for the dropped
    ids and assign a sentinel."""
    per_bucket = per_bucket_counts(docs, id_col, text_col, n_buckets)
    scored = (per_bucket
              .join(F.broadcast(weights.select("domain", "bucket",
                                               "weight")), "bucket")
              .groupBy(id_col, "domain")
              .agg(F.sum(F.col("_c") * F.col("weight"))
                   .cast("long").alias("score")))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("domain"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(id_col, F.col("domain").alias("tagged_domain"),
                    "score"))


def gumbel_topk(scored: DataFrame, k: int, id_col: str = "doc_id",
                score_col: str = "score", temperature: float = 1.0) -> DataFrame:
    """The paper's Gumbel top-k resampling, deterministically: sample k
    documents without replacement with probability proportional to
    exp(score/temperature) by ranking score/temperature + Gumbel noise,
    where the noise g = -ln(-ln(u)) uses the hash-uniform
    u = (hash_bucket(id)+0.5)/SAMPLE_MOD instead of an RNG — so the
    "sample" is a pure function of the ids (re-runnable, engine-stable
    ranking; float, hence pytest-pinned rather than oracle-hashed)."""
    u = (hash_bucket(F.col(id_col)).cast("double") + F.lit(0.5)) \
        / F.lit(float(SAMPLE_MOD))
    key = (F.col(score_col).cast("double") / F.lit(float(temperature))
           - F.log(-F.log(u)))
    return (scored.withColumn("gumbel_key", key)
            .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
            .limit(k))


def group_sample(df: DataFrame, key: str, group: str, k: int) -> DataFrame:
    """Deterministic per-group sample WITHOUT replacement: keep the k rows
    of each group whose md5-derived key hash ranks smallest (ties broken
    by the key itself). The hash order is uniform and independent of the
    group, so this is a uniform k-sample per group — reproducible across
    runs, engines, and cluster sizes, unlike rand()-based sampling, and
    monotone in k (k=10 ⊆ k=20).

    One shuffle on the group column; the rank window sorts within each
    group partition. For groups with heavy skew (one group = most of the
    corpus) pre-filter with hash_sample to a few-x-k-per-group superset
    first — the hash order is shared, so the composition is exact.

    Precondition: `key` must be unique within each group (like
    pack_sequences' id contract). Rows sharing a key value tie completely
    in the (hash, key) sort, so row_number picks arbitrarily among them
    at the k boundary and reproducibility is lost. Dedup or add a
    tiebreaker column to the key first if keys can repeat."""
    w = Window.partitionBy(group).orderBy(
        h15(F.col(key).cast("string")), F.col(key))
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn"))
