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


# --------------------------------------------------------------------------
# Bloom-prefiltered decontamination
# --------------------------------------------------------------------------

BLOOM_SALTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
               0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _bloom_positions(h, m: int):
    """j deterministic bit positions per 64-bit hash: multiply-shift with
    fixed odd salts (uint64 wraparound is defined in numpy), then mod m.
    Pure function of the hash — identical on every executor/platform."""
    import numpy as np
    h = h.astype(np.uint64)
    return [((h * np.uint64(s)) >> np.uint64(13)) % np.uint64(m)
            for s in BLOOM_SALTS]


def _build_bloom(hashes: DataFrame, m: int) -> bytes:
    """Distributed Bloom build: each partition sets bits into a local
    m/8-byte bitmap (vectorized numpy inside one Arrow mapInPandas pass),
    and the driver ORs the per-partition bitmaps. Driver state is
    bounded at n_partitions x m/8 bytes — the mergeable-sketch shape
    (cf. the k-means C x dim aggregate), never the raw hash set."""
    import numpy as np

    def build(batches):
        bm = np.zeros(m // 8, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["shash"].to_numpy(dtype="int64").astype("uint64")
            for pos in _bloom_positions(h, m):
                idx = (pos >> np.uint64(3)).astype(np.int64)
                bit = np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
                np.bitwise_or.at(bm, idx, bit)
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = hashes.mapInPandas(build, schema="bm binary").collect()
    acc = np.zeros(m // 8, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row["bm"], dtype=np.uint8)
    return acc.tobytes()


def decontaminate(df: DataFrame, test_filter, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3,
                  bloom_bits: int = 1 << 20) -> DataFrame:
    """Training-corpus decontamination with a Bloom prefilter: return the
    train documents (>= k tokens) sharing NO k-gram shingle with the test
    split, as (doc_id, n_shingles distinct).

    Two-phase, exact output: (1) a Bloom filter over the test split's
    distinct shingle hashes (built distributed, broadcast as an m/8-byte
    bitmap) prefilters train shingles in a vectorized Arrow pandas_udf —
    bit tests over numpy arrays, no per-row Python (justified Python
    path: the filter is a closure over an immutable bitmap, membership is
    pure array math); (2) only the flagged shingles — expected
    |true overlaps| + a tiny false-positive tail — enter the exact
    semi-join against the test set, whose hits mark dirty docs. Bloom
    has no false negatives, and false positives are removed by the exact
    verify, so the output equals the plain anti-join semantics the
    oracle states.

    Why this shape at 100 TB: the naive decontamination join shuffles
    EVERY train shingle (trillions of rows) against the test set; here
    the wide join input shrinks to near-zero while the broadcast is a
    fixed 128 KB bitmap regardless of test-set cardinality. Same
    two-phase summary+verify topology as LSH dedup and heavy_hitters.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    from dbsync_spark.functions.dedup import shingles
    from dbsync_spark.functions.text import h15
    from dbsync_spark.sources.tables import fan_out

    m = bloom_bits
    marked = fan_out(df).withColumn("_is_test", test_filter)
    sh = (marked
          .select(F.col(id_col), F.col("_is_test"),
                  F.explode(shingles(F.col(text_col), k)).alias("shingle"))
          .select(id_col, "_is_test", h15(F.col("shingle")).alias("shash"))
          .distinct())
    test_hashes = sh.where(F.col("_is_test")).select("shash").distinct()
    bitmap = _build_bloom(test_hashes, m)
    train_sh = sh.where(~F.col("_is_test")).select(id_col, "shash")
    return bloom_flag_clean(train_sh, test_hashes, bitmap, m, id_col=id_col)


def shingle_hash_rows(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct (id, shash) k-gram shingle-hash rows — the shared
    front end of the decontamination family (h15 keys keep the wire
    narrow; docs shorter than k tokens produce no rows)."""
    from dbsync_spark.functions.dedup import shingles
    from dbsync_spark.functions.text import h15
    from dbsync_spark.sources.tables import fan_out

    return (fan_out(df)
            .select(F.col(id_col),
                    F.explode(shingles(F.col(text_col), k)).alias("shingle"))
            .select(id_col, h15(F.col("shingle")).alias("shash"))
            .distinct())


def bloom_membership_udf(spark, bitmap: bytes, m: int):
    """Vectorized Bloom membership test over a broadcast bitmap —
    numpy bit tests inside an Arrow pandas_udf, no per-row Python."""
    import numpy as np

    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def maybe_member(col: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        h = col.to_numpy(dtype="int64").astype("uint64")
        res = np.ones(len(h), dtype=bool)
        for pos in _bloom_positions(h, m):
            idx = (pos >> np.uint64(3)).astype(np.int64)
            off = (pos & np.uint64(7)).astype(np.uint8)
            res &= ((bm[idx] >> off) & np.uint8(1)).astype(bool)
        return pd.Series(res)

    return maybe_member


def bloom_flag_clean(train_sh: DataFrame, test_hashes: DataFrame,
                     bitmap: bytes, m: int,
                     id_col: str = "doc_id") -> DataFrame:
    """Clean docs from pre-shingled inputs: (id, n_shingles) for every
    train doc whose shingles never hit the exact test set; the Bloom
    bitmap prefilters the verify join so only flagged residue shuffles.
    Shared by the batch operator (decontaminate) and the streaming
    service (streaming/bloom_index.py)."""
    maybe = bloom_membership_udf(train_sh.sparkSession, bitmap, m)
    flagged = train_sh.withColumn("_maybe", maybe(F.col("shash")))
    per_doc = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"))
    dirty = (flagged.where(F.col("_maybe"))
             .join(test_hashes, on="shash", how="semi")
             .select(id_col).distinct())
    return per_doc.join(dirty, on=id_col, how="anti")


# --------------------------------------------------------------------------
# Count-Min sketch
# --------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_col(key, row: int, width: int):
    """Cell column for hash row `row`: h15 of the salted key, mod width.
    Pure md5 arithmetic — bit-identical in Spark and DuckDB, so the whole
    sketch (not just its error bound) is deterministic and
    oracle-checkable."""
    from dbsync_spark.functions.text import h15
    return h15(F.concat(F.lit(f"{row}:"), key.cast("string"))) % width


def count_min_build(df: DataFrame, key_col: str,
                    depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH) -> DataFrame:
    """Build a Count-Min sketch over a key stream: returns the counter
    matrix as (r, c, n) rows, at most depth x width of them regardless
    of input size. One shuffle on (r, c) — the map side pre-aggregates,
    so the shuffle carries <= depth * width rows per task no matter how
    many billions of increments flow in. Counter cells are plain SUMs,
    i.e. the state is mergeable across batches/partitions/days (the same
    associativity argument as the HLL register max)."""
    rows = df.select(F.col(key_col).alias("_k"))
    cells = [rows.select(F.lit(r).alias("r"),
                         _cms_col(F.col("_k"), r, width).alias("c"))
             for r in range(depth)]
    out = cells[0]
    for c in cells[1:]:
        out = out.unionByName(c)
    return out.groupBy("r", "c").agg(F.count("*").alias("n"))


def count_min_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                       depth: int = CMS_DEPTH,
                       width: int = CMS_WIDTH) -> DataFrame:
    """Point-frequency estimates for `keys` from a built sketch: est =
    min over hash rows of the addressed cell (0 when a cell is absent —
    only possible for keys never inserted). Classic CMS guarantee:
    est >= true, and est <= true + eps * N with probability 1 - delta
    (eps = e/width, delta = e^-depth). The sketch side is <= depth*width
    rows, so it broadcasts; the probe is a narrow map + broadcast join
    per hash row + one min-aggregate."""
    probes = None
    for r in range(depth):
        p = keys.select(
            F.col(key_col),
            F.lit(r).alias("r"),
            _cms_col(F.col(key_col), r, width).alias("c"))
        probes = p if probes is None else probes.unionByName(p)
    joined = (probes.join(F.broadcast(sketch), on=["r", "c"], how="left")
              .withColumn("n", F.coalesce(F.col("n"), F.lit(0))))
    return joined.groupBy(key_col).agg(F.min("n").alias("est_n"))


def cms_oracle_sql(source_sql: str, key_expr: str,
                   depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> str:
    """DuckDB SQL computing the identical sketch + estimates for every
    distinct key of the source. `source_sql` is a FROM-able subquery;
    `key_expr` the key column expression within it."""
    def h(r: int, k: str) -> str:
        return (f"(('0x' || substr(md5('{r}:' || CAST({k} AS VARCHAR)),"
                f" 1, 15))::BIGINT % {width})")

    cell_rows = "\n    UNION ALL ".join(
        f"SELECT {r} AS r, {h(r, key_expr)} AS c FROM src"
        for r in range(depth))
    probe_rows = "\n    UNION ALL ".join(
        f"SELECT {key_expr}, {r} AS r, {h(r, key_expr)} AS c FROM keys"
        for r in range(depth))
    return f"""
WITH src AS ({source_sql}),
cells AS (
  SELECT r, c, count(*) AS n FROM (
    {cell_rows}
  ) GROUP BY r, c
),
keys AS (
  SELECT {key_expr}, count(*) AS true_n FROM src GROUP BY {key_expr}
),
probes AS (
    {probe_rows}
),
est AS (
  SELECT {key_expr}, CAST(MIN(COALESCE(cells.n, 0)) AS BIGINT) AS est_n
  FROM probes LEFT JOIN cells USING (r, c) GROUP BY {key_expr}
)
SELECT keys.{key_expr}, est.est_n, keys.true_n
FROM keys JOIN est USING ({key_expr})"""
