from __future__ import annotations

from pyspark.sql import functions as F

from dbsync_spark.operators.partition import (
    murmur3_spark_string,
    partition_id,
    partition_id_py,
)


def test_murmur3_python_matches_spark(spark):
    """The declared Q-partition oracle: a pure-Python reimplementation of
    Spark's Murmur3_x86_32 must agree with F.hash on strings."""
    samples = [
        "", "a", "ab", "abc", "abcd", "abcde",
        "public:orders:0", "public:orders:12345",
        "schema:table:k1:k2", "héllo:wörld", "日本語テキスト",
    ] + [f"public:orders:{i}" for i in range(500)]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.hash("s").alias("h")).collect()}
    for s in samples:
        assert murmur3_spark_string(s) == got[s], f"mismatch for {s!r}"


def test_partition_assignment_matches_python(spark):
    keys = [f"public:orders:{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["k"]: r["p"]
        for r in df.select("k", partition_id(F.col("k"), 32).alias("p")).collect()
    }
    for k in keys:
        expect = partition_id_py(k, 32)
        assert got[k] == expect
        assert 0 <= expect < 32


def test_partition_balance(spark):
    """Hash partitioning should spread sequential keys roughly evenly —
    the property the reference relies on for worker parallelism."""
    keys = [f"public:orders:{i}" for i in range(10000)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    counts = (
        df.select(partition_id(F.col("k"), 32).alias("p"))
        .groupBy("p").count().collect()
    )
    sizes = [r["count"] for r in counts]
    assert len(sizes) == 32
    assert max(sizes) < 2 * (10000 / 32)
