"""TPC-DS-shaped analytic queries, adapted to the TPC-H-ish fixtures.

The reference exposes no analytic surface at all (SURVEY.md §2.8); the
TPC-H 22-suite (queries_tpch2.py) covers the join/subquery space, and
this module adds the structurally distinct TPC-DS shapes a warehouse
workload brings on top of it:

- year-over-year self-comparison (DS Q11/Q74)  -> q_yoy_growth
- union-of-channels re-aggregation (DS Q33/Q56)-> q_channel_union_agg
- multi-bucket scalar count row (DS Q88)       -> q_count_buckets
- GROUP BY ... HAVING range + join-back (Q34)  -> q_having_range
- sales-net-of-returns fact-fact join (DS Q93) -> q_returns_net
- dual cumulative series crossover (DS Q51)    -> q_cumulative_crossover
- moving-deviation months (DS Q47)             -> q_moving_dev

Every query keeps the module-wide exactness rules (NOTES.md): money in
integer cents, float work confined to per-row expressions written
identically in both engines, at most ONE division on exact integers per
emitted score. Shapes are chosen Spark-first: where DS prescribes N scans
(union of channels, per-bucket subqueries) and the channels live in one
table, we aggregate in ONE scan with conditional expressions and let the
oracle keep the literal DS formulation — results are provably identical
because every row belongs to exactly one branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsync_spark.queries import _register
from dbsync_spark.queries_analytics import _CENTS, _cents
from dbsync_spark.sources.tables import read_table


# ---------------------------------------------------------------------------
# DS Q11/Q74: year-over-year growth per customer
# ---------------------------------------------------------------------------

@_register(
    "q_yoy_growth",
    f"""
WITH yearly AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(SUM({_CENTS.format(x='o_totalprice')}) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2
)
SELECT cur.o_custkey, cur.yr,
       prev.rev_cents AS prev_rev_cents,
       cur.rev_cents  AS cur_rev_cents,
       CAST(cur.rev_cents AS DOUBLE) / prev.rev_cents AS growth
FROM yearly cur
JOIN yearly prev
  ON cur.o_custkey = prev.o_custkey AND cur.yr = prev.yr + 1
WHERE cur.rev_cents > prev.rev_cents
""",
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q11/Q74 shape: customers whose yearly revenue grew vs the
    immediately preceding year, with the growth ratio.

    The DS formulation self-joins the yearly aggregate; we use lag() over
    (custkey, yr) instead — the aggregate is shuffled ONCE on custkey and
    the consecutive-year pairing happens inside the sorted partition, vs
    a second full shuffle for the self-join. Same result: lag() pairs the
    previous present year, and the `yr = prev_yr + 1` filter keeps
    exactly the consecutive pairs the join would produce. Growth is the
    single float division of two exact integer sums."""
    orders = read_table(spark, sf_dir, "orders")
    yearly = (
        orders.groupBy(
            "o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("rev_cents")))
    w = Window.partitionBy("o_custkey").orderBy("yr")
    return (
        yearly.select(
            "o_custkey", "yr", "rev_cents",
            F.lag("yr").over(w).alias("_prev_yr"),
            F.lag("rev_cents").over(w).alias("prev_rev_cents"))
        .where((F.col("yr") == F.col("_prev_yr") + 1)
               & (F.col("rev_cents") > F.col("prev_rev_cents")))
        .select(
            "o_custkey", "yr", "prev_rev_cents",
            F.col("rev_cents").alias("cur_rev_cents"),
            (F.col("rev_cents").cast("double")
             / F.col("prev_rev_cents")).alias("growth")))


# ---------------------------------------------------------------------------
# DS Q33/Q56: union-of-channels re-aggregation
# ---------------------------------------------------------------------------

_CH_EXPRESS = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
_CH_STANDARD = "o_orderpriority = '3-MEDIUM'"
_CH_ECONOMY = "o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')"


@_register(
    "q_channel_union_agg",
    f"""
WITH per_channel AS (
  SELECT 'express' AS channel, c.c_nationkey,
         SUM({_CENTS.format(x='o.o_totalprice')}) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE {_CH_EXPRESS} GROUP BY 2
  UNION ALL
  SELECT 'standard', c.c_nationkey, SUM({_CENTS.format(x='o.o_totalprice')})
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE {_CH_STANDARD} GROUP BY 2
  UNION ALL
  SELECT 'economy', c.c_nationkey, SUM({_CENTS.format(x='o.o_totalprice')})
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE {_CH_ECONOMY} GROUP BY 2
)
SELECT n.n_name,
       CAST(COALESCE(SUM(CASE WHEN channel = 'express'  THEN cents END), 0) AS BIGINT) AS express_cents,
       CAST(COALESCE(SUM(CASE WHEN channel = 'standard' THEN cents END), 0) AS BIGINT) AS standard_cents,
       CAST(COALESCE(SUM(CASE WHEN channel = 'economy'  THEN cents END), 0) AS BIGINT) AS economy_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM per_channel p JOIN nation n ON p.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_channel_union_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q33/Q56 shape: per-nation revenue broken out by order channel
    (priority bands standing in for store/web/catalog), plus the
    cross-channel total.

    DS unions three per-channel aggregates (three fact scans — necessary
    there because the channels are three different fact TABLES). Our
    channels partition ONE table, so the engine computes all three in a
    single scan with conditional aggregates — one fact shuffle instead of
    three, identical results since each order belongs to exactly one
    channel. The oracle keeps the literal union-then-reaggregate
    formulation as the cross-check. Customer and nation broadcast."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    channel = (
        F.when(F.expr(_CH_EXPRESS), "express")
        .when(F.expr(_CH_STANDARD), "standard")
        .otherwise("economy"))
    cents = _cents(F.col("o_totalprice"))

    def _ch(name):
        return F.coalesce(
            F.sum(F.when(F.col("channel") == name, F.col("cents"))),
            F.lit(0).cast("long")).alias(f"{name}_cents")

    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", channel.alias("channel"), cents.alias("cents"))
        .groupBy("n_name")
        .agg(_ch("express"), _ch("standard"), _ch("economy"),
             F.sum("cents").alias("total_cents")))


# ---------------------------------------------------------------------------
# DS Q88: multi-bucket scalar count row
# ---------------------------------------------------------------------------

_BUCKETS = [
    ("h1", "l_quantity BETWEEN 1 AND 12 AND l_discount < 0.05"),
    ("h2", "l_quantity BETWEEN 1 AND 12 AND l_discount >= 0.05"),
    ("h3", "l_quantity BETWEEN 13 AND 25 AND l_discount < 0.05"),
    ("h4", "l_quantity BETWEEN 13 AND 25 AND l_discount >= 0.05"),
    ("h5", "l_quantity BETWEEN 26 AND 37 AND l_discount < 0.05"),
    ("h6", "l_quantity BETWEEN 26 AND 37 AND l_discount >= 0.05"),
    ("h7", "l_quantity BETWEEN 38 AND 50 AND l_discount < 0.05"),
    ("h8", "l_quantity BETWEEN 38 AND 50 AND l_discount >= 0.05"),
]


@_register(
    "q_count_buckets",
    "SELECT "
    + ", ".join(
        f"CAST(count(*) FILTER (WHERE {cond}) AS BIGINT) AS {name}"
        for name, cond in _BUCKETS)
    + " FROM lineitem",
)
def q_count_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q88 shape: one result row with eight conditional counts
    (quantity band x discount band). DS writes this as eight scalar
    subqueries cross-joined into one row — eight fact scans; the engine
    computes all eight as conditional aggregates in ONE scan with no
    shuffle beyond the single global-aggregate exchange. The oracle uses
    FILTER clauses (DuckDB's one-scan equivalent of the same rewrite)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(*[
        F.count(F.when(F.expr(cond), 1)).alias(name)
        for name, cond in _BUCKETS])


# ---------------------------------------------------------------------------
# DS Q34/Q73: HAVING range + join back to the dimension
# ---------------------------------------------------------------------------

@_register(
    "q_having_range",
    f"""
WITH cnt AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(SUM({_CENTS.format(x='o_totalprice')}) AS BIGINT) AS tot_cents
  FROM orders GROUP BY o_custkey
  HAVING count(*) BETWEEN 8 AND 12
)
SELECT c.c_custkey, c.c_name, cnt.n_orders, cnt.tot_cents
FROM cnt JOIN customer c ON cnt.o_custkey = c.c_custkey
""",
)
def q_having_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q34/Q73 shape: customers with a mid-band order count (HAVING
    BETWEEN), joined back to the customer dimension for display columns.
    The aggregate runs first and the HAVING filter shrinks it before the
    join — at 100 TB the filtered aggregate is the small side, so it
    broadcasts into the customer scan rather than shuffling customer."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    cnt = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"),
             F.sum(_cents(F.col("o_totalprice"))).alias("tot_cents"))
        .where(F.col("n_orders").between(8, 12)))
    return (
        cust.join(F.broadcast(cnt), cust.c_custkey == cnt.o_custkey)
        .select("c_custkey", "c_name", "n_orders", "tot_cents"))


# ---------------------------------------------------------------------------
# DS Q93: sales net of returns (fact-fact left join)
# ---------------------------------------------------------------------------

_NET_EXPR = ("l_extendedprice * (l_quantity - COALESCE(ret_qty, 0.0))"
             " / l_quantity * 100")


@_register(
    "q_returns_net",
    f"""
WITH returns AS (
  SELECT l_orderkey AS r_orderkey, l_linenumber AS r_linenumber,
         l_quantity AS ret_qty
  FROM lineitem WHERE l_returnflag = 'R'
)
SELECT l_suppkey,
       CAST(SUM(CAST(round({_NET_EXPR}, 0) AS BIGINT)) AS BIGINT) AS net_cents,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(ret_qty) AS BIGINT) AS n_returned
FROM lineitem l
LEFT JOIN returns r
  ON l.l_orderkey = r.r_orderkey AND l.l_linenumber = r.r_linenumber
GROUP BY l_suppkey
""",
)
def q_returns_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q93 shape: per-supplier revenue net of returned quantity — a
    fact-to-fact LEFT JOIN on the line-item key (sales x returns), then
    aggregate. Returned rows net to zero, partial semantics mirror DS's
    quantity-minus-returned arithmetic. At scale both sides arrive
    partitioned on the same (orderkey, linenumber) key, so the join is a
    co-located sort-merge with no extra exchange; the per-row float netting
    is written identically in both engines and summed in integer cents."""
    li = read_table(spark, sf_dir, "lineitem")
    returns = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("r_orderkey"),
                F.col("l_linenumber").alias("r_linenumber"),
                F.col("l_quantity").alias("ret_qty")))
    net_cents = F.round(
        F.expr("l_extendedprice * (l_quantity - COALESCE(ret_qty, 0.0))"
               " / l_quantity * 100"), 0).cast("long")
    return (
        li.join(returns,
                (li.l_orderkey == returns.r_orderkey)
                & (li.l_linenumber == returns.r_linenumber), "left")
        .groupBy("l_suppkey")
        .agg(F.sum(net_cents).alias("net_cents"),
             F.count("*").alias("n_items"),
             F.count("ret_qty").alias("n_returned")))


# ---------------------------------------------------------------------------
# DS Q51: dual cumulative series crossover
# ---------------------------------------------------------------------------

@_register(
    "q_cumulative_crossover",
    f"""
WITH a AS (
  SELECT date_trunc('day', ts) AS bucket_day,
         SUM({_CENTS.format(x='value')}) AS a_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
b AS (
  SELECT date_trunc('day', ts) AS bucket_day,
         SUM({_CENTS.format(x='value')}) AS b_cents
  FROM events WHERE event_type = 'click' GROUP BY 1
),
joined AS (
  SELECT COALESCE(a.bucket_day, b.bucket_day) AS bucket_day,
         COALESCE(a_cents, 0) AS a_cents, COALESCE(b_cents, 0) AS b_cents
  FROM a FULL OUTER JOIN b ON a.bucket_day = b.bucket_day
)
SELECT bucket_day,
       CAST(SUM(a_cents) OVER w AS BIGINT) AS cum_purchase_cents,
       CAST(SUM(b_cents) OVER w AS BIGINT) AS cum_click_cents,
       CASE WHEN SUM(a_cents) OVER w > SUM(b_cents) OVER w
            THEN 'purchase' ELSE 'click' END AS leader
FROM joined
WINDOW w AS (ORDER BY bucket_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q_cumulative_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q51 shape: two independently aggregated daily series (purchase
    vs click revenue), FULL OUTER JOINed on the day, with running
    cumulative sums compared to find which series leads each day.

    The unpartitioned window runs over the POST-aggregation frame —
    bounded by calendar days, thousands of rows at any data scale — so
    the single-partition sort is safe; all heavy lifting (the fact scan
    and the two conditional aggregations) is distributed. Cumulative sums
    are exact integer cents, so the leader flag is portable."""
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))

    def side(etype, out):
        return (ev.where(F.col("event_type") == etype)
                .groupBy(day.alias("bucket_day"))
                .agg(F.sum(_cents(F.col("value"))).alias(out)))

    a, b = side("purchase", "a_cents"), side("click", "b_cents")
    joined = (
        a.join(b, "bucket_day", "full")
        .select("bucket_day",
                F.coalesce("a_cents", F.lit(0)).alias("a_cents"),
                F.coalesce("b_cents", F.lit(0)).alias("b_cents")))
    w = (Window.orderBy("bucket_day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_a, cum_b = F.sum("a_cents").over(w), F.sum("b_cents").over(w)
    return joined.select(
        "bucket_day",
        cum_a.alias("cum_purchase_cents"),
        cum_b.alias("cum_click_cents"),
        F.when(cum_a > cum_b, "purchase").otherwise("click").alias("leader"))


# ---------------------------------------------------------------------------
# DS Q67: rollup + rank within category across grouping levels
# ---------------------------------------------------------------------------

@_register(
    "q_rollup_topk",
    f"""
WITH r AS (
  SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(SUM({_CENTS.format(x='o_totalprice')}) AS BIGINT) AS rev_cents
  FROM orders GROUP BY ROLLUP (o_orderpriority, yr)
)
SELECT * FROM (
  SELECT o_orderpriority, yr, rev_cents,
         CAST(row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY rev_cents DESC, yr ASC NULLS FIRST) AS INT) AS rnk
  FROM r
) WHERE rnk <= 3
""",
)
def q_rollup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q67 shape: revenue ROLLUP over (priority, year), then rank
    WITHIN each priority across grouping levels and keep the top 3 —
    the subtotal row (yr NULL) competes with the detail years, exactly
    DS's mixed-level ranking. One shuffle for the rollup (Expand feeds a
    single hash aggregate), one for the rank window; NULL ordering is
    pinned on both sides (Spark defaults nulls-first, DuckDB nulls-last
    — an unpinned ORDER BY here would hash-mismatch)."""
    orders = read_table(spark, sf_dir, "orders")
    r = (orders
         .withColumn("yr", F.year("o_orderdate"))
         .rollup("o_orderpriority", "yr")
         .agg(F.sum(_cents(F.col("o_totalprice"))).alias("rev_cents")))
    w = (Window.partitionBy("o_orderpriority")
         .orderBy(F.col("rev_cents").desc(), F.col("yr").asc_nulls_first()))
    return (r.select("o_orderpriority", "yr", "rev_cents",
                     F.row_number().over(w).alias("rnk"))
            .where(F.col("rnk") <= 3))


# ---------------------------------------------------------------------------
# DS Q47: moving-deviation months (series vs its own category average)
# ---------------------------------------------------------------------------

@_register(
    "q_moving_dev",
    f"""
WITH m AS (
  SELECT l_returnflag,
         date_trunc('month', l_shipdate) AS month_start,
         CAST(sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')})
              AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY 1, 2
),
w AS (
  SELECT *,
         CAST(sum(rev_cents) OVER (PARTITION BY l_returnflag) AS BIGINT)
           AS total_cents,
         count(*) OVER (PARTITION BY l_returnflag) AS n_months
  FROM m
)
SELECT l_returnflag, month_start, rev_cents, total_cents, n_months,
       CASE WHEN 100 * n_months * rev_cents > 110 * total_cents
            THEN 'high' ELSE 'low' END AS dev_dir
FROM w
WHERE 100 * n_months * rev_cents > 110 * total_cents
   OR 100 * n_months * rev_cents < 90 * total_cents
""",
)
def q_moving_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q47 shape: months whose revenue deviates more than 10% from
    their return-flag's average month. The deviation test is pure integer
    cross-multiplication (100*n*rev vs 110*total) — no division, no
    float aggregate, so the flagged set is bit-identical across engines.
    Shape: one shuffle for the monthly aggregate, then a window over the
    TINY per-(mode, month) frame partitioned by mode — the window never
    sees fact rows. At extreme scale the BIGINT cross-products approach
    overflow; swap cents for a DECIMAL(38) there."""
    li = read_table(spark, sf_dir, "lineitem")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    m = (li.groupBy(
            "l_returnflag",
            F.date_trunc("month", F.col("l_shipdate")).alias("month_start"))
         .agg(F.sum(rev).cast("long").alias("rev_cents")))
    w = Window.partitionBy("l_returnflag")
    t = m.select(
        "l_returnflag", "month_start", "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("total_cents"),
        F.count("*").over(w).alias("n_months"))
    hi = 100 * F.col("n_months") * F.col("rev_cents") > 110 * F.col("total_cents")
    lo = 100 * F.col("n_months") * F.col("rev_cents") < 90 * F.col("total_cents")
    return (t.withColumn("dev_dir", F.when(hi, "high").otherwise("low"))
            .where(hi | lo))
