"""Canonical schemas of the engine's system tables.

Mirrors the reference's system-table DDL (semantics, not storage):
- sync_data      — change log; reference DDL dbopt/PgOperation.scala:285-301
- sync_data_status — per-change status; reference DDL dbopt/PgOperation.scala:310-323
- sync_polled    — extraction marker; reference DDL dbopt/PgOperation.scala:354-363
- sync_trigger_version — capture metadata; dbopt/PgOperation.scala:332-345
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# One row-level change event. `data` is the JSON full-row image (the
# reference produces it with row_to_json / JSON_OBJECT inside the trigger).
SYNC_DATA_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("sourceDb", StringType(), False),
        StructField("targetDb", StringType(), False),
        StructField("schema", StringType(), False),
        StructField("table", StringType(), False),
        StructField("operation", StringType(), False),  # I / U / D
        StructField("data", StringType(), True),
        StructField("createTime", TimestampType(), True),
    ]
)

# Status of one change id. Absent row = pending (reference: the 5-way left
# join in PgOperation.scala:509-547 counts NULL status as pending).
SYNC_STATUS_SCHEMA = StructType(
    [
        StructField("dataId", LongType(), False),
        StructField("status", StringType(), False),  # OK / ERR / BLK
        StructField("message", StringType(), True),
        StructField("retry", IntegerType(), False),
        StructField("createTime", TimestampType(), True),
    ]
)

SYNC_POLLED_SCHEMA = StructType(
    [
        StructField("dataId", LongType(), False),
        StructField("createTime", TimestampType(), True),
    ]
)

SYNC_TRIGGER_VERSION_SCHEMA = StructType(
    [
        StructField("schema", StringType(), False),
        StructField("table", StringType(), False),
        StructField("trigger", StringType(), False),
        StructField("version", StringType(), False),
        StructField("function", StringType(), True),
        StructField("createTime", TimestampType(), True),
    ]
)

STATUS_OK = "OK"
STATUS_ERR = "ERR"
STATUS_BLK = "BLK"
STATUS_PENDING = "PENDING"  # synthetic: absence of a status row
