"""Mirror of the driver's Spark-vs-DuckDB comparison: row count, column
set, and order-insensitive value equality (columns sorted by name)."""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        # exact float repr: we verified cross-engine IEEE parity; repr keeps it strict
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return tuple(_norm_cell(x) for x in seq)
    return v


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def assert_matches(spark_df, duck_con, sql: str):
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck_con.execute(sql).fetchdf()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"column mismatch: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), f"row count {len(spark_pdf)} vs {len(duck_pdf)}"
    s_rows, d_rows = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"row {i} differs:\n spark={a}\n duck ={b}"
