"""Delta Lake MERGE sink — the production target-table backend.

`ParquetTable` (sinks/table.py) is the container-testable stand-in: this
module is the swap target on a real cluster where delta-spark is
available. The apply semantics are identical to operators/apply.py
merge_snapshot — last-writer-wins by log id with delete tombstone
semantics collapsing to physical deletes — but expressed as a single
`MERGE INTO`, which Delta executes as a join + rewrite of only the
touched files (with file-skipping on the join keys). Retention/compaction
(reference O8, `job/CleanWorker.scala:27-53`) map to `VACUUM` and
`OPTIMIZE` literally.

Everything is import-gated: in environments without delta-spark the
class raises a clear error at construction, never at import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - exercised only where delta-spark is installed
    from delta.tables import DeltaTable
    HAVE_DELTA = True
except ImportError:
    DeltaTable = None
    HAVE_DELTA = False


class DeltaSink:
    """Same surface as ParquetTable (read / overwrite_with) plus
    merge_changes, so streaming/pipeline.py can swap backends by
    constructor choice alone."""

    def __init__(self, path: str):
        if not HAVE_DELTA:
            raise ImportError(
                "delta-spark is not installed; use sinks.table.ParquetTable "
                "(same interface) or add the delta-spark package + "
                "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
            )
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame | None:
        if not DeltaTable.isDeltaTable(spark, self.path):
            return None
        return spark.read.format("delta").load(self.path)

    def overwrite_with(self, df: DataFrame) -> None:
        df.write.format("delta").mode("overwrite").save(self.path)

    def merge_changes(self, spark: SparkSession, changes: DataFrame,
                      key_cols: list[str], id_col: str = "id",
                      op_col: str = "operation") -> None:
        """Apply an I/U/D micro-batch: reduce the batch last-writer-wins
        per key FIRST (map-side combine, tiny merge source), then one
        MERGE: matched+D -> delete, matched -> update, unmatched+not-D ->
        insert. Out-of-order protection mirrors merge_snapshot: the
        update/delete clauses are conditioned on the incoming id being
        newer than the stored _last_id."""
        from pyspark.sql import functions as F

        from dbsync_spark.operators.apply import LAST_ID_COL

        payload = [c for c in changes.columns if c not in (id_col, op_col)]
        winner = (changes.groupBy(*key_cols).agg(
            F.max_by(F.struct(op_col, *[c for c in payload if c not in key_cols]),
                     F.col(id_col)).alias("_w"),
            F.max(id_col).alias(LAST_ID_COL)))
        src = winner.select(
            *key_cols, F.col(f"_w.{op_col}").alias(op_col), LAST_ID_COL,
            *[F.col(f"_w.{c}").alias(c) for c in payload if c not in key_cols])
        if self.read(spark) is None:
            (src.where(F.col(op_col) != "D").drop(op_col)
             .write.format("delta").save(self.path))
            return
        tgt = DeltaTable.forPath(spark, self.path)
        cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        newer = f"s.{LAST_ID_COL} > t.{LAST_ID_COL}"
        sets = {c: f"s.{c}" for c in payload if c not in key_cols}
        sets[LAST_ID_COL] = f"s.{LAST_ID_COL}"
        (tgt.alias("t").merge(src.alias("s"), cond)
         .whenMatchedDelete(condition=f"s.{op_col} = 'D' AND {newer}")
         .whenMatchedUpdate(condition=f"s.{op_col} != 'D' AND {newer}", set=sets)
         .whenNotMatchedInsert(
             condition=f"s.{op_col} != 'D'",
             values={**{k: f"s.{k}" for k in key_cols}, **sets})
         .execute())

    def maintain(self, spark: SparkSession, retain_hours: int = 168) -> None:
        """Reference O8 retention/maintenance: compact + drop old files."""
        tgt = DeltaTable.forPath(spark, self.path)
        tgt.optimize().executeCompaction()
        tgt.vacuum(retain_hours)
