"""Delta sink gating + interface parity with the parquet stand-in."""

from __future__ import annotations

import inspect

import pytest

from dbsync_spark.sinks import delta as ds
from dbsync_spark.sinks.table import ParquetTable


def test_import_is_safe_and_gated(tmp_path):
    """Without delta-spark the module imports fine and fails at
    construction with an actionable message."""
    if ds.HAVE_DELTA:
        pytest.skip("delta-spark installed; gating path not reachable")
    with pytest.raises(ImportError, match="delta-spark is not installed"):
        ds.DeltaSink(str(tmp_path / "t"))


def test_interface_parity_with_parquet_table():
    """DeltaSink is a drop-in for ParquetTable's read/overwrite surface."""
    for name in ("read", "overwrite_with"):
        p = inspect.signature(getattr(ParquetTable, name))
        d = inspect.signature(getattr(ds.DeltaSink, name))
        assert list(p.parameters) == list(d.parameters), name


@pytest.mark.skipif(not ds.HAVE_DELTA, reason="delta-spark not installed")
def test_merge_changes_lww(spark, tmp_path):
    """When delta IS present: I/U/D batch applies last-writer-wins."""
    sink = ds.DeltaSink(str(tmp_path / "t"))
    batch = spark.createDataFrame(
        [(1, "I", 10, "a"), (2, "U", 10, "b"), (3, "D", 11, "x"),
         (4, "I", 11, "y")],
        "id LONG, operation STRING, k LONG, v STRING")
    sink.merge_changes(spark, batch, ["k"])
    rows = {r["k"]: r["v"] for r in sink.read(spark).collect()}
    assert rows == {10: "b", 11: "y"}
