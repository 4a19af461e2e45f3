"""The hot path as a Structured Streaming query (SURVEY.md §3.2 Spark shape).

One streaming query per sync rule:
  readStream(change log) -> condition filter -> JSON decode ->
  foreachBatch { MERGE snapshot into target; append OK acks }

What Spark gives us for free vs the reference:
- sync_polled + bootstrap recovery (O3/O7) -> checkpoint/offset log
  (sync/DataPoller.scala:41-78, StateManger.scala:85-90);
- adaptive poll pacing (S5, DataPoller.scala:64-69) -> trigger policy +
  maxFilesPerTrigger admission;
- bounded in-flight queues (QueueManager.scala:20-22) -> micro-batch
  admission control.
Cross-batch per-key ordering comes from merge_snapshot's _last_id
watermark (an older change can never clobber a newer row), not from
physical ordered delivery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from dbsync_spark.operators.apply import merge_snapshot, parse_changes
from dbsync_spark.operators.route import SyncRule, apply_conditions
from dbsync_spark.schemas import SYNC_DATA_SCHEMA
from dbsync_spark.sinks.table import ParquetTable


class SyncPipeline:
    """Streaming apply of one sync rule onto one target table."""

    def __init__(self, spark: SparkSession, rule: SyncRule,
                 payload_schema: StructType, log_path: str, target_path: str,
                 status_path: str, checkpoint_path: str,
                 max_files_per_trigger: int | None = None):
        self.spark = spark
        self.rule = rule
        self.payload_schema = payload_schema
        self.log_path = log_path
        self.target = ParquetTable(target_path)
        self.status_path = status_path
        self.checkpoint_path = checkpoint_path
        self.max_files_per_trigger = max_files_per_trigger

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        relevant = batch_df.where(
            (F.col("schema") == self.rule.source_schema)
            & (F.col("table") == self.rule.source_table)
            & (F.col("sourceDb") == self.rule.source_db)
        )
        changes = apply_conditions(
            parse_changes(relevant, self.payload_schema), self.rule)
        changes = changes.localCheckpoint()  # batch is transient; pin it
        snapshot = self.target.read(self.spark)
        merged = merge_snapshot(snapshot, changes, list(self.rule.source_keys))
        self.target.overwrite_with(merged)
        acks = relevant.select(
            F.col("id").alias("dataId"), F.lit("OK").alias("status"),
            F.lit("").alias("message"), F.lit(0).alias("retry"),
            F.current_timestamp().alias("createTime"))
        acks.write.mode("append").parquet(self.status_path)

    def start(self, available_now: bool = True, processing_time: str | None = None):
        reader = self.spark.readStream.schema(SYNC_DATA_SCHEMA)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.parquet(self.log_path)
        writer = (
            stream.writeStream
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_path)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_to_completion(self) -> None:
        q = self.start(available_now=True)
        q.awaitTermination()
