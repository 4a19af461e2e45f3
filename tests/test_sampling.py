"""Sampling/packing operator properties (beyond the oracle sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from dbsync_spark.functions import sampling as smp
from dbsync_spark.sources.tables import read_table
from tests.compare import assert_matches

TRAINING_ORACLE_BACKED = [
    "q_hash_sample",
    "q_stratified_sample",
    "q_weighted_sample",
    "q_mixture_weights",
    "q_pack_sequences",
    "q_udtf_tokenize",
    "q_higher_order",
    "q_frame_sample",
    "q_group_sample",
]


def test_training_surface_matches_oracle(spark, sf_dir, duck):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    for name in TRAINING_ORACLE_BACKED:
        assert_matches(qs[name](spark, sf_dir), duck, os_[name])


def test_hash_sample_monotone_and_stable(spark, sf_dir):
    """Same key -> same fate: the 10% sample is a subset of the 20%
    sample, and resampling returns identical rows (no RNG state)."""
    docs = read_table(spark, sf_dir, "documents")
    s10 = smp.hash_sample(docs, "doc_id", 1000).select("doc_id")
    s20 = smp.hash_sample(docs, "doc_id", 2000).select("doc_id")
    assert s10.exceptAll(s20).count() == 0  # monotone
    assert s10.count() > 0
    again = smp.hash_sample(docs, "doc_id", 1000).select("doc_id")
    assert s10.exceptAll(again).count() == 0  # reproducible

    # rate is roughly honored (hash uniformity; generous tolerance)
    n, n10 = docs.count(), s10.count()
    assert 0.03 < n10 / n < 0.25


def test_stratified_rates_differ_by_stratum(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = smp.stratified_sample(docs, "doc_id", "lang", {"en": 8000},
                                default_bp=2000)
    kept = {r["lang"]: r["cnt"] for r in
            out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    totals = {r["lang"]: r["cnt"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert kept["en"] / totals["en"] > 0.6
    for lang in kept:
        if lang != "en":
            assert kept[lang] / totals[lang] < 0.45


def test_weighted_sample_properties(spark, sf_dir):
    """Rows at/above max_weight are always kept; the kept-rate of a
    stratum tracks its weight; the sample is reproducible."""
    docs = read_table(spark, sf_dir, "documents")
    out = smp.weighted_sample(docs, "doc_id", F.col("n_chars"), 2000).cache()
    # clamp: every doc with n_chars >= 2000 survives
    big_total = docs.where(F.col("n_chars") >= 2000).count()
    big_kept = out.where(F.col("n_chars") >= 2000).count()
    assert big_kept == big_total
    # short docs are kept at a visibly lower rate than long docs
    short_tot = docs.where(F.col("n_chars") < 500).count()
    if short_tot > 50:
        short_rate = out.where(F.col("n_chars") < 500).count() / short_tot
        assert short_rate < 0.5
    again = smp.weighted_sample(docs, "doc_id", F.col("n_chars"), 2000)
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0
    assert again.select("doc_id").exceptAll(out.select("doc_id")).count() == 0
    # NULL weight means "drop", never "always keep"
    nulled = smp.weighted_sample(
        docs.withColumn("n_chars", F.lit(None).cast("long")),
        "doc_id", F.col("n_chars"), 2000)
    assert nulled.count() == 0


def test_pack_sequences_budget_property(spark, sf_dir):
    """Within a pack, every doc's start offset lies in the pack's window;
    packs per stream are contiguous from 0; per-pack totals stay below
    budget + one max doc (offset packing's bound)."""
    docs = read_table(spark, sf_dir, "documents")
    budget = 2048
    packed = smp.pack_sequences(docs, "doc_id", "n_chars", budget,
                                stream_col="lang").cache()
    bad = packed.where(
        (F.col("start_offset") < F.col("pack_id") * budget)
        | (F.col("start_offset") >= (F.col("pack_id") + 1) * budget))
    assert bad.count() == 0

    per_pack = (packed.groupBy("lang", "pack_id")
                .agg(F.sum("n_chars").alias("total")))
    max_doc = docs.agg(F.max("n_chars")).first()[0]
    assert per_pack.where(F.col("total") > budget + max_doc).count() == 0

    # pack ids are dense from 0 per stream
    ids = (packed.groupBy("lang")
           .agg(F.min("pack_id").alias("lo"),
                F.countDistinct("pack_id").alias("n"),
                F.max("pack_id").alias("hi")))
    assert ids.where((F.col("lo") != 0)
                     | (F.col("hi") != F.col("n") - 1)).count() == 0


def test_pack_sequences_property_random_lengths(spark):
    """Hypothesis: for arbitrary positive lengths, offset packing keeps
    every start_offset inside its pack window and never skips a pack."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=500),
                    min_size=1, max_size=60),
           st.integers(min_value=100, max_value=1000))
    def check(lengths, budget):
        df = spark.createDataFrame(
            [(i, n) for i, n in enumerate(lengths)], "doc_id INT, n INT")
        rows = smp.pack_sequences(df, "doc_id", "n", budget).collect()
        # relational result == sequential reference loop
        offset = 0
        expected = {}
        for i, n in enumerate(lengths):
            expected[i] = (offset, offset // budget)
            offset += n
        for r in rows:
            exp_off, exp_pack = expected[r["doc_id"]]
            assert r["start_offset"] == exp_off
            assert r["pack_id"] == exp_pack

    check()


def test_stratified_equals_union_of_hash_samples(spark, sf_dir):
    """Stratified sampling is definitionally the union of per-stratum hash
    samples — no interaction between strata."""
    docs = read_table(spark, sf_dir, "documents")
    combined = smp.stratified_sample(docs, "doc_id", "lang", {"en": 8000},
                                     default_bp=2000).select("doc_id")
    en = smp.hash_sample(docs.where(F.col("lang") == "en"), "doc_id", 8000)
    rest = smp.hash_sample(docs.where(F.col("lang") != "en"), "doc_id", 2000)
    manual = en.select("doc_id").unionByName(rest.select("doc_id"))
    assert combined.exceptAll(manual).count() == 0
    assert manual.exceptAll(combined).count() == 0


def test_mixture_weights_binding_stratum(spark, sf_dir):
    """No stratum's target exceeds its available rows, and at least one
    stratum is exactly binding (target_rows == n_rows)."""
    docs = read_table(spark, sf_dir, "documents")
    out = smp.mixture_weights(
        docs, "lang", {"en": 5000, "de": 2000, "fr": 1500, "es": 1000,
                       "zh": 500}).collect()
    eps = 1e-9
    assert all(r["target_rows"] <= r["n_rows"] + eps for r in out)
    assert any(abs(r["target_rows"] - r["n_rows"]) < eps for r in out)


def test_group_sample_exact_k_and_monotone(spark, sf_dir):
    """Every group yields exactly min(k, group size) rows; the k=5 sample
    is a subset of the k=10 sample (shared hash order)."""
    from dbsync_spark.functions.sampling import group_sample
    from dbsync_spark.sources.tables import read_table
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents")
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    s10 = group_sample(docs, "doc_id", "lang", 10).select("doc_id", "lang")
    got = {r["lang"]: r["n"] for r in
           s10.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {g: min(10, n) for g, n in sizes.items()}
    s5 = {r["doc_id"] for r in
          group_sample(docs, "doc_id", "lang", 5).collect()}
    assert s5 <= {r["doc_id"] for r in s10.collect()}


def test_data_split_partition_and_growth_stability(spark, sf_dir):
    """The split partitions the corpus (every row exactly one split),
    proportions land near 90/5/5, and a row's split never changes when
    the corpus doubles (bucket depends only on the row's own key)."""
    from pyspark.sql import functions as F

    from dbsync_spark.functions.sampling import data_split
    from dbsync_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    split = data_split(docs, "doc_id").select("doc_id", "split").cache()
    n = docs.count()
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # partition: no row dropped/duped
    assert counts["train"] > counts.get("val", 0)
    assert abs(counts.get("val", 0) / n - 0.05) < 0.03
    assert abs(counts.get("test", 0) / n - 0.05) < 0.03

    grown = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 10_000_000))
    regrown = {r["doc_id"]: r["split"] for r in
               data_split(grown, "doc_id").select("doc_id", "split")
               .where(F.col("doc_id") < 10_000_000).collect()}
    orig = {r["doc_id"]: r["split"] for r in split.collect()}
    assert regrown == orig  # growth never reassigns existing rows
