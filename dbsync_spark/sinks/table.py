"""Versioned parquet table — a minimal MERGE-able snapshot store.

Spark cannot overwrite a parquet path it is reading in the same job, and
this environment has no Delta Lake, so the upsert sink keeps versioned
snapshot directories (v0, v1, ...) with a _CURRENT pointer written last
(atomic enough for a single writer — the reference is also single-writer
per target table). On Delta this whole class collapses to MERGE INTO;
the interface is written so that swap is trivial.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ParquetTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def read(self, spark: SparkSession) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.path, f"v{v}"))

    def overwrite_with(self, df: DataFrame) -> None:
        v = self.current_version()
        nxt = 0 if v is None else v + 1
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v{nxt}"))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self._pointer())
        # retention: keep current + previous snapshot (time travel depth 1)
        for old in range(nxt - 1):
            shutil.rmtree(os.path.join(self.path, f"v{old}"), ignore_errors=True)
