"""Fixture table readers.

`events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
vectorized parquet reader rejects. We read it with
spark.sql.legacy.parquet.nanosAsLong and convert to a microsecond
TimestampType JVM-side (`ts DIV 1000` — integer division; a double divide
would lose nanosecond bits on epoch-scale int64s). Sub-microsecond
precision is truncated — declared outputs therefore never emit raw `ts`
(hour buckets and typed payload columns only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
