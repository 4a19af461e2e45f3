"""Stream-stream joins and streaming dedup (Structured Streaming).

The reference never joins two change streams (SURVEY.md §2.3 — its only
joins are system anti/status joins), but a multi-source deployment wants
them: correlate the click stream with the purchase stream, dedup an
at-least-once feed. Both are native Structured Streaming operators; the
watermarks bound the join/dedup state so it survives unbounded streams —
without them state grows forever, the classic 100 TB streaming failure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str, right_ts: str, max_delay: str,
                  watermark: str = "1 hour",
                  extra_cond: Column | None = None) -> DataFrame:
    """Inner join of two (possibly streaming) frames on `key` where the
    right event lands within [left_ts, left_ts + max_delay].

    Both sides get event-time watermarks: Spark derives the state
    retention for each side from the watermark + the time-range condition,
    so old join state is evicted instead of accumulating. Columns from the
    right side are suffixed `_r` when they collide.
    """
    lw = left.withWatermark(left_ts, watermark)
    renames = {c: f"{c}_r" for c in right.columns if c in left.columns}
    rw = right.withColumnsRenamed(renames).withWatermark(
        renames.get(right_ts, right_ts), watermark)
    rkey, rts = renames.get(key, key), renames.get(right_ts, right_ts)
    cond = (
        (lw[key] == rw[rkey])
        & (rw[rts] >= lw[left_ts])
        & (rw[rts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lw.join(rw, cond, "inner")


def dedup_within_watermark(stream: DataFrame, keys: list[str],
                           ts_col: str, watermark: str) -> DataFrame:
    """Exactly-once-ification of an at-least-once stream: keep the first
    arrival per key, dropping replays that arrive within the watermark
    horizon. State per key is evicted once the watermark passes it —
    bounded memory, unlike a global dropDuplicates on a stream."""
    return (stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))
