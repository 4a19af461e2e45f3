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
