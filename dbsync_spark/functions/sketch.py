"""Mergeable-summary (sketch) operators.

Heavy hitters via distributed Misra-Gries: each partition summarizes its
token stream into at most `capacity` counters (one Arrow `mapInPandas`
pass — the classic streaming frequent-items algorithm), and only those
candidates are recounted exactly. The shuffle carries <= capacity rows
per partition instead of the full token cardinality, which is the whole
point at 100 TB: a trillion-token corpus with billions of distinct
tokens shuffles a few thousand candidate rows, then one semi-join +
groupBy over the qualifying subset.

Correctness is partitioning-independent: if a token's global count
exceeds N/capacity, then by pigeonhole its count in some partition p
exceeds n_p/capacity, and Misra-Gries guarantees any such item survives
that partition's summary (estimate >= true - n_p/capacity > 0). The
union of per-partition candidates is therefore a superset of every
qualifying token; the exact recount + integer-threshold filter
(count * capacity > N) removes false candidates, so the OUTPUT is
deterministic even though the candidate set is not. The same
two-phase shape (local summary, exact verify) as the LSH dedup family.

Reference has no sketch family; this extends the engine's corpus-stats
surface (SURVEY.md LLM-data ops; cf. q_hll_distinct/q_quantile_sketch).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbsync_spark.functions.text import tokens


def _misra_gries(stream, capacity: int) -> dict:
    """Textbook Misra-Gries: at most `capacity` counters; decrement-all
    when full. Estimate >= true - n/capacity."""
    counters: dict = {}
    for item in stream:
        if item in counters:
            counters[item] += 1
        elif len(counters) < capacity:
            counters[item] = 1
        else:
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return counters


def heavy_hitters(df: DataFrame, text_col: str = "text",
                  capacity: int = 200) -> DataFrame:
    """Exact tokens with global count > N/capacity, found via
    per-partition Misra-Gries candidate generation + exact recount.
    Returns (tok, n) sorted-free; deterministic (see module docstring).
    """
    toks = (df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
            .where(F.col("tok") != ""))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE MG state across the whole partition: Arrow batches are
        # sub-partition chunks, not independent streams. Sequential
        # per-token loop is inherent to MG (justified Python hot path:
        # output is <= capacity rows per partition, input never leaves
        # the executor).
        import itertools
        counters = _misra_gries(
            itertools.chain.from_iterable(pdf["tok"] for pdf in batches),
            capacity)
        yield pd.DataFrame({"tok": list(counters.keys())})

    cands = toks.mapInPandas(summarize, schema="tok string").distinct()
    total = toks.agg(F.count("*").alias("_n"))
    return (toks.join(F.broadcast(cands), on="tok")
            .groupBy("tok").agg(F.count("*").alias("n"))
            .crossJoin(F.broadcast(total))
            .where(F.col("n") * capacity > F.col("_n"))
            .select("tok", "n"))
