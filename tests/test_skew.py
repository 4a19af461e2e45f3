from __future__ import annotations

from pyspark.sql import functions as F

from dbsync_spark.operators.apply import last_writer_wins
from dbsync_spark.operators.skew import salted_join, salted_last_writer_wins


def _skewed_changes(spark, n=5000):
    """One hot key receives ~half the changes; id = change order."""
    return spark.range(1, n + 1).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id") % 50).alias("k"),
        F.lit("U").alias("operation"),
        (F.col("id") * 10).alias("v"),
    ).withColumn("operation",
                 F.when(F.col("id") % 997 == 0, "D").otherwise("U"))


def test_salted_lww_equals_plain_lww(spark):
    changes = _skewed_changes(spark).cache()
    plain = last_writer_wins(changes, ["k"])
    salted = salted_last_writer_wins(changes, ["k"], buckets=8)
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_equals_plain_join(spark):
    big = _skewed_changes(spark).select("id", "k", "v")
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], ["k", "label"])
    plain = big.join(small, on="k").select("id", "k", "v", "label")
    salted = salted_join(big, small, on=["k"], buckets=8, id_col="id") \
        .select("id", "k", "v", "label")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0


def test_salted_lww_spreads_hot_key(spark):
    """Phase-1 output carries at most `buckets` rows per key — the hot key
    is genuinely split before the final (tiny) combine."""
    changes = _skewed_changes(spark)
    from dbsync_spark.operators.skew import salt_col
    per_salt = (changes.withColumn("_salt", salt_col(F.col("id"), 8))
                .where(F.col("k") == 7)
                .groupBy("_salt").count())
    rows = per_salt.collect()
    assert len(rows) == 8  # hot key present in every salt bucket
