"""Fixture table readers.

`events.parquet` has shipped with two physical types for `ts` across
fixture generations:

- INT64 TIMESTAMP(NANOS), which Spark's vectorized parquet reader rejects:
  read with spark.sql.legacy.parquet.nanosAsLong and convert to a
  microsecond TimestampType JVM-side (`ts DIV 1000` — integer division; a
  double divide would lose nanosecond bits on epoch-scale int64s).
- timestamp[us] without UTC adjustment, which Spark reads as
  TIMESTAMP_NTZ: cast to TimestampType (session timezone is pinned UTC in
  session.py, so the cast is a re-tag, not a wall-clock shift — matches
  DuckDB's naive TIMESTAMP).

We branch on the dtype Spark actually produced so either generation works.
Sub-microsecond precision is truncated — declared outputs therefore never
emit raw `ts` (hour buckets and typed payload columns only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if isinstance(ts_type, TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
