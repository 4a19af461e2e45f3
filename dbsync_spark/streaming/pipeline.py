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

from dbsync_spark.operators.apply import parse_changes
from dbsync_spark.operators.route import SyncRule, apply_conditions
from dbsync_spark.sinks.table import BucketedTable, ParquetTable


# non-retryable dead-letter marker shared by the ack writer and the
# resolver predicate (a malformed payload can never converge)
MALFORMED_MSG = "malformed payload"

class SyncPipeline:
    """Streaming apply of one sync rule onto one target table.

    `target_layout` picks the target store: "bucketed" (default — hash-
    partitioned on the merge key; a batch MERGE touches only the buckets
    its keys hash into, so per-batch cost is independent of target size)
    or "snapshot" (full-rewrite versioned ParquetTable — only for small
    dimension targets / time-travel depth). Both produce identical merged
    state (parity-tested); only the physical write pattern differs."""

    def __init__(self, spark: SparkSession, rule: SyncRule,
                 payload_schema: StructType, log_path: str, target_path: str,
                 status_path: str, checkpoint_path: str,
                 max_files_per_trigger: int | None = None,
                 failure_policy=None, in_batch_retries: int = 1,
                 log_format: str = "parquet", ack_lock=None,
                 target_layout: str = "bucketed",
                 n_buckets: int | None = None,
                 max_retry: int | None = None):
        self.spark = spark
        self.rule = rule
        self.payload_schema = payload_schema
        self.log_path = log_path
        if hasattr(target_layout, "merge_changes"):
            # a pre-built target object (e.g. sinks/jdbc.py::JdbcTable for
            # live-DB delivery) — anything honouring the merge_changes
            # protocol streams micro-batches the same way
            self.target = target_layout
        elif target_layout == "bucketed":
            self.target = BucketedTable(target_path,
                                        list(rule.source_keys), n_buckets)
        elif target_layout == "snapshot":
            self.target = ParquetTable(target_path)
        else:
            raise ValueError(f"unknown target_layout {target_layout!r}")
        self.status_path = status_path
        self.checkpoint_path = checkpoint_path
        self.max_files_per_trigger = max_files_per_trigger
        # failure_policy(changes) -> fail_until Column: injected-failure
        # spec standing in for a flaky target (None = everything lands)
        self.failure_policy = failure_policy
        self.in_batch_retries = in_batch_retries
        self.log_format = log_format
        # pipelines that share one status path (multi-target rules over the
        # same source db) must not append parquet concurrently: the Hadoop
        # output committer's _temporary dir is per-path, and one job's
        # commit cleanup deletes the other's in-flight files
        self.ack_lock = ack_lock
        # ErrorResolver retry budget (sys.maxRetry): ERR rows at
        # retry >= max_retry become dead letters (still visible in the
        # status table, never retried again); None = unbounded
        self.max_retry = max_retry
        # one writer at a time per target: the scheduled retry tick
        # (driver control-loop thread) and the streaming foreachBatch
        # callback both MERGE into the same table — unserialized, their
        # staged writes would race each other's directory swaps
        import threading as _threading

        self._merge_lock = _threading.Lock()
        self.last_query = None  # most recent StreamingQuery from start()

    @property
    def name(self) -> str:
        """Stable display name for endpoints/monitoring payloads AND the
        Spark queryName — must be unique per pipeline, so it includes the
        target db: a 'targetDb: t1,t2' fanout rule builds one pipeline
        per target and Spark refuses two active queries with one name."""
        r = self.rule
        tgt_schema = r.target_schema or r.source_schema
        tgt_table = r.target_table or r.source_table
        return (f"{r.source_db}.{r.source_schema}.{r.source_table}"
                f"->{r.target_db or 'target'}.{tgt_schema}.{tgt_table}")

    def _key(self):
        return F.concat_ws(":", *[F.col(k).cast("string")
                                  for k in self.rule.source_keys])

    def _write_acks(self, acks: DataFrame) -> None:
        if self.ack_lock is not None:
            with self.ack_lock:
                acks.write.mode("append").parquet(self.status_path)
        else:
            acks.write.mode("append").parquet(self.status_path)

    def _relevant(self, batch_df: DataFrame) -> DataFrame:
        """This pipeline's slice of the shared change log. Fan-out happens
        at capture (one row per target, S11); a pipeline serving target T
        consumes only rows addressed to T."""
        pred = (
            (F.col("schema") == self.rule.source_schema)
            & (F.col("table") == self.rule.source_table)
            & (F.col("sourceDb") == self.rule.source_db)
        )
        if self.rule.target_db:
            pred = pred & (F.col("targetDb") == self.rule.target_db)
        return batch_df.where(pred)

    def apply_changes(self, changes: DataFrame) -> None:
        """Apply decoded changes with the ERR/BLK state machine: rows that
        reach the target MERGE in; failures ack ERR and hold back (BLK)
        same-key followers — strict per-key order under failure (O4-O6).
        An optional `_tries0` column seeds per-row retry counters (set by
        retry_pass from the persisted status)."""
        with self._merge_lock:
            self._apply_changes_locked(changes)

    def _apply_changes_locked(self, changes: DataFrame) -> None:
        changes = changes.localCheckpoint()
        has_tries = "_tries0" in changes.columns
        payload = changes.drop("_tries0") if has_tries else changes
        if self.failure_policy is None:
            # payload is (a narrow drop over) the checkpointed batch
            self.target.merge_changes(self.spark, payload,
                                      list(self.rule.source_keys),
                                      pinned=True)
            self._write_acks(payload.select(
                F.col("id").alias("dataId"), F.lit("OK").alias("status"),
                F.lit("").alias("message"), F.lit(0).alias("retry"),
                F.current_timestamp().alias("createTime")))
            return

        from dbsync_spark.operators.retry import apply_with_retry

        state, _ = apply_with_retry(
            changes, key=self._key(),
            fail_until=self.failure_policy(changes),
            max_passes=self.in_batch_retries,
            initial_tries=F.col("_tries0") if has_tries else None)
        ok_ids = state.where(F.col("status") == "OK").select("id")
        applied = payload.join(ok_ids, on="id", how="left_semi")
        self.target.merge_changes(self.spark, applied,
                                  list(self.rule.source_keys))
        self._write_acks(state.select(
            F.col("id").alias("dataId"), F.col("status"),
            F.when(F.col("status") == "OK", "").otherwise("apply failed").alias("message"),
            F.col("tries").alias("retry"),
            F.current_timestamp().alias("createTime")))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from dbsync_spark.operators.apply import split_corrupt

        relevant = self._relevant(batch_df)
        good, bad = split_corrupt(relevant)
        if not bad.isEmpty():
            # reference semantics: unparseable change -> ERR ack (enters
            # the retry surface; it can never converge, but it is visible
            # and counted, never silently null-merged)
            self._write_acks(bad.select(
                F.col("id").alias("dataId"), F.lit("ERR").alias("status"),
                F.lit(MALFORMED_MSG).alias("message"),
                F.lit(0).alias("retry"),
                F.current_timestamp().alias("createTime")))
        changes = apply_conditions(
            parse_changes(good, self.payload_schema), self.rule)
        self.apply_changes(changes)

    def retry_pass(self) -> bool:
        """The ErrorResolver/BlockedHandler loop (O5/O6): re-read ERR/BLK
        rows from the status table, re-apply them from the log in id order
        with their persisted retry counters; newly-converged rows MERGE in
        and ack OK. Returns True if anything was retried."""
        from dbsync_spark.operators.status import current_status

        try:
            acks = self.spark.read.parquet(self.status_path)
        except Exception:  # noqa: BLE001 - nothing acked yet
            return False
        # the reference's resolver predicate (PgOperation.scala:389-405):
        # BLK always re-polls; ERR only while retry < maxRetry — exhausted
        # rows are dead letters, visible but never retried again
        retry_ok = (F.lit(True) if self.max_retry is None
                    else F.col("retry") < self.max_retry)
        # malformed-payload dead letters are non-retryable BY CONSTRUCTION
        # (split_corrupt would drop them again): excluding them here, not
        # just at the join, keeps a corrupt-only backlog from turning
        # every tick into a full log read + an empty ack append forever
        bad = current_status(acks).where(
            ((F.col("status") == "BLK")
             | ((F.col("status") == "ERR") & retry_ok))
            & (F.col("message") != MALFORMED_MSG))
        if bad.isEmpty():
            return False
        from dbsync_spark.sources.log_source import read_log

        from dbsync_spark.operators.apply import split_corrupt

        log = read_log(self.spark, self.log_path, self.log_format)
        # malformed payloads stay ERR forever (visible in the status
        # table); retrying them would merge all-null row images
        retryable, _ = split_corrupt(self._relevant(log))
        rows = retryable.join(
            bad.select(F.col("dataId").alias("id"),
                       F.col("retry").alias("_tries0")),
            on="id")
        changes = apply_conditions(
            parse_changes(rows.drop("_tries0"), self.payload_schema),
            self.rule).join(rows.select("id", "_tries0"), on="id")
        self.apply_changes(changes)
        return True

    def start(self, available_now: bool = True, processing_time: str | None = None):
        from dbsync_spark.sources.log_source import read_log_stream

        stream = read_log_stream(self.spark, self.log_path, self.log_format,
                                 self.max_files_per_trigger)
        writer = (
            stream.writeStream
            .queryName(self.name)  # progress/heartbeat entries carry the
            # pipeline's stable name instead of a per-run UUID
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_path)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        self.last_query = writer.start()
        return self.last_query

    def run_to_completion(self) -> None:
        q = self.start(available_now=True)
        q.awaitTermination()
