"""Analytic query surface beyond the reference's operator set.

The reference exposes no window functions, user-facing joins, set ops,
grouping sets, or scalar-function library (SURVEY.md §2.8) — everything
here comes from Spark natively and is declared so the DuckDB oracle keeps
us honest. Each query is written for 100 TB shape: broadcast the small
side, pre-aggregate before wide joins, integer-cents money math (float
aggregate trees are not associative across engines — NOTES.md), top-k via
TakeOrderedAndProject, never a driver-side collect in the data path.

Registration reuses queries._register, so the driver contract picks these
up automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsync_spark.queries import _register
from dbsync_spark.sources.tables import read_table

# Money in integer cents: exact, associative, engine-portable.
def _cents(col):
    return F.round(col * 100, 0).cast("long")


_CENTS = "CAST(round({x} * 100, 0) AS BIGINT)"

# Discounted revenue per TPC-H: price * (1 - discount). Left-assoc in both
# engines so the IEEE result is bit-identical before the round.
_REV_CENTS = _CENTS.format(x="l_extendedprice * (1 - l_discount)")


# ---------------------------------------------------------------------------
# Window functions (analytic frames over partitions)
# ---------------------------------------------------------------------------

@_register(
    "q_event_gaps",
    """
SELECT user_id, event_id,
       epoch_us(ts) - lag(epoch_us(ts))
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
""",
)
def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): microsecond gap to the previous event of the same user.
    One shuffle on user_id, per-partition sort — the canonical WindowExec
    shape; at scale the partition key carries the whole frame locally."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "user_id", "event_id",
        (us - F.lag(us).over(w)).alias("gap_us"))


@_register(
    "q_moving_agg",
    f"""
SELECT user_id, event_id,
       CAST(sum({_CENTS.format(x='value')}) OVER w AS BIGINT) AS mov_sum_cents,
       count(*) OVER w AS n_in_frame,
       CAST(sum({_CENTS.format(x='value')}) OVER w AS DOUBLE)
         / count(*) OVER w AS mov_avg_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def q_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 3-row sum/avg per user. Sum runs over integer cents (exact);
    the avg is a single float division of two exact integers — portable."""
    ev = read_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 0))
    mov_sum = F.sum(_cents(F.col("value"))).over(w)
    n = F.count(F.lit(1)).over(w)
    return ev.select(
        "user_id", "event_id",
        mov_sum.alias("mov_sum_cents"),
        n.alias("n_in_frame"),
        (mov_sum.cast("double") / n).alias("mov_avg_cents"))


@_register(
    "q_running_total",
    f"""
SELECT o_custkey, o_orderkey,
       CAST(sum({_CENTS.format(x='o_totalprice')})
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS running_cents
FROM orders
""",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer in order-date order (integer cents)."""
    orders = read_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.sum(_cents(F.col("o_totalprice"))).over(w).alias("running_cents"))


@_register(
    "q_rank_orders",
    """
SELECT o_orderpriority, o_orderkey,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       percent_rank() OVER w AS prnk
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate)
""",
)
def q_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank with genuine peer groups (ordering
    by o_orderdate leaves ties, so the three differ)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    return orders.select(
        "o_orderpriority", "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"))


@_register(
    "q_ntile_customers",
    """
SELECT c_custkey,
       CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT)
         AS balance_quartile
FROM customer
""",
)
def q_ntile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) balance quartiles. NOTE: a global ORDER BY window is a
    single-partition sort — fine for a dimension table, never for a fact
    table (there, bucket by a partition key first)."""
    customer = read_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey", F.ntile(4).over(w).alias("balance_quartile"))


# ---------------------------------------------------------------------------
# User-facing joins the reference lacks (semi / anti) + TPC-H-shape analytics
# ---------------------------------------------------------------------------

@_register(
    "q_exists_semi",
    """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS == LEFT SEMI join. The lineitem side is
    filtered and projected to the join key before the shuffle."""
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = orders.join(
        li, (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate), "left_semi")
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@_register(
    "q_not_exists_anti",
    """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
)
def q_not_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS == LEFT ANTI join: customers with no urgent order. The
    anti side is filtered+projected to the key before the shuffle."""
    customer = read_table(spark, sf_dir, "customer")
    orders = (read_table(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"))
    return (customer
            .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
            .select("c_custkey", "c_mktsegment"))


@_register(
    "q_grouping_sets",
    """
SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
FROM events GROUP BY GROUPING SETS ((event_type), (day))
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with only the marginals — the shape CUBE can't give
    without computing the full cross grid."""
    events = read_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts")))
    return (events
            .groupingSets([["event_type"], ["day"]], "event_type", "day")
            .agg(F.count("*").alias("cnt")))


@_register(
    "q_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum({_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS sum_base_cents,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS sum_disc_cents,
       CAST(sum({_CENTS.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')})
         AS BIGINT) AS sum_charge_cents,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary report). All sums are exact integer
    arithmetic after per-row IEEE expressions; averages are one division of
    exact integers. Plans as scan -> partial agg -> 4-group exchange ->
    final agg: the partial side does nearly all the work."""
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    qty = F.col("l_quantity").cast("long")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("long").alias("sum_qty"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
        F.sum(_cents(disc)).alias("sum_disc_cents"),
        F.sum(_cents(charge)).alias("sum_charge_cents"),
        (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
        F.count("*").alias("count_order")))


@_register(
    "q_top_revenue_orders",
    f"""
SELECT l_orderkey,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS revenue_cents,
       o_orderdate, o_shippriority
FROM (SELECT *, 0 AS o_shippriority FROM orders) o
JOIN customer ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_shippriority
ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): filtered dimension broadcast
    into the fact join, partial-agg before the exchange, top-10 via
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    cust = (read_table(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    orders = (read_table(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
              .withColumn("o_shippriority", F.lit(0)))
    li = (read_table(spark, sf_dir, "lineitem")
          .where(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (orders
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("l_orderkey", "o_orderdate", "o_shippriority")
            .agg(F.sum(rev).alias("revenue_cents"))
            .select("l_orderkey", "revenue_cents", "o_orderdate", "o_shippriority")
            .orderBy(F.col("revenue_cents").desc(), "o_orderdate", "l_orderkey")
            .limit(10))


@_register(
    "q_top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey, CAST(sum({_REV_CENTS}) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_cents
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_cents = (SELECT max(total_cents) FROM rev)
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the scalar max is a 1-row broadcast
    join, not a driver collect — the pattern survives any scale."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    rev = (li.groupBy("l_suppkey")
           .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .alias("total_cents")))
    mx = rev.agg(F.max("total_cents").alias("_mx"))
    supplier = read_table(spark, sf_dir, "supplier")
    return (rev.join(F.broadcast(mx), rev.total_cents == mx._mx)
            .join(supplier, rev.l_suppkey == supplier.s_suppkey)
            .select("s_suppkey", "s_name", "total_cents"))


# ---------------------------------------------------------------------------
# Scalar function suites (string / date / array) — §2.8 gaps, Spark-native
# ---------------------------------------------------------------------------

@_register(
    "q_string_funcs",
    """
SELECT p_partkey,
       upper(p_name) AS uname,
       CAST(length(p_name) AS INT) AS name_len,
       substr(p_name, 1, 5) AS prefix,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
       concat(p_brand, '#', p_type) AS brand_type,
       contains(p_name, 'green') AS has_green
FROM part
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function suite over part: case, length, substring, regex
    replace, concat, containment — all JVM-side, codegen'd."""
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("prefix"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("novowel"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").contains("green").alias("has_green"))


@_register(
    "q_date_funcs",
    """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dom,
       CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
         AS days_to_eoy
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function suite over orders: extract parts, date arithmetic,
    month boundaries, day diffs."""
    orders = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).alias("days_to_eoy"))


@_register(
    "q_array_funcs",
    """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS n_dims,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2_norm,
       list_sum(list_transform(list_slice(embedding::DOUBLE[], 1, 4), x -> x))
         AS head4_sum
FROM embeddings
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function suite over embeddings: size, element access, L2 norm
    via a left-fold (bit-identical to DuckDB's list_dot_product — verified
    float parity, NOTES.md), slice+sum. Scalars out, arrays stay inside."""
    emb = read_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    fold = F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x)
    head4 = F.aggregate(F.slice(e, 1, 4), F.lit(0.0), lambda a, x: a + x)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at(e, 1).alias("first_val"),
        F.sqrt(fold).alias("l2_norm"),
        head4.alias("head4_sum"))


# ---------------------------------------------------------------------------
# Percentiles / histograms / set ops
# ---------------------------------------------------------------------------

@_register(
    "q_percentiles",
    f"""
WITH c AS (SELECT l_returnflag, {_CENTS.format(x='l_extendedprice')} AS cents
           FROM lineitem)
SELECT l_returnflag,
       quantile_cont(cents, 0.25) AS p25_cents,
       quantile_cont(cents, 0.50) AS p50_cents,
       quantile_cont(cents, 0.75) AS p75_cents
FROM c GROUP BY l_returnflag
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of price cents per return flag. Interpolation over
    integer inputs is exact in double, so quantile_cont parity holds. At
    100 TB swap in approx_percentile (t-digest, one pass, bounded error)."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = _cents(F.col("l_extendedprice"))
    return (li.select("l_returnflag", cents.alias("cents"))
            .groupBy("l_returnflag")
            .agg(F.percentile("cents", 0.25).alias("p25_cents"),
                 F.percentile("cents", 0.50).alias("p50_cents"),
                 F.percentile("cents", 0.75).alias("p75_cents")))


@_register(
    "q_histogram",
    """
SELECT CAST(floor(value / 50.0) AS BIGINT) * 50 AS bucket_lo, count(*) AS cnt
FROM events GROUP BY 1
""",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (floor-division binning —
    a pure map-side expression, aggregates to ~10 groups)."""
    ev = read_table(spark, sf_dir, "events")
    bucket = (F.floor(F.col("value") / 50.0).cast("long") * 50)
    return (ev.groupBy(bucket.alias("bucket_lo"))
            .agg(F.count("*").alias("cnt")))


@_register(
    "q_set_ops",
    """
SELECT 'click_no_purchase' AS tag, user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT 'click_and_view' AS tag, user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
)
""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: EXCEPT (clickers who never purchased) and INTERSECT
    (clickers who also viewed), tagged and unioned."""
    ev = read_table(spark, sf_dir, "events")

    def users(et: str) -> DataFrame:
        return ev.where(F.col("event_type") == et).select("user_id").distinct()

    exc = users("click").subtract(users("purchase")).select(
        F.lit("click_no_purchase").alias("tag"), "user_id")
    inter = users("click").intersect(users("view")).select(
        F.lit("click_and_view").alias("tag"), "user_id")
    return exc.unionByName(inter)


# ---------------------------------------------------------------------------
# JSON functions / top-N per group / term stats / multi-way joins
# ---------------------------------------------------------------------------

@_register(
    "q_nation_volume",
    f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS revenue_cents
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the two
    nation legs broadcast, supplier broadcasts, and the orders-lineitem
    fact join carries the only real shuffle."""
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    pair = ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")) | \
           ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (li
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
            .where(pair)
            .withColumn("l_year", F.year("l_shipdate").cast("int"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.sum(rev).alias("revenue_cents")))


@_register(
    "q_shipmode_priority",
    """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority counts per line status): conditional
    integer sums after the fact-fact key join."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    li = (read_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
          .select("l_orderkey", "l_linestatus"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).cast("long")
                 .alias("low_line_count")))


@_register(
    "q_promo_share",
    f"""
SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_CENTS}
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_CENTS}
                     ELSE 0 END) AS DOUBLE)
         / sum({_REV_CENTS}) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion revenue share): part broadcasts into the
    filtered lineitem scan; the share is one division of two exact
    integer sums."""
    li = (read_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
          .select("l_partkey", "l_extendedprice", "l_discount"))
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0)
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.sum(promo).cast("long").alias("promo_cents"),
        F.sum(rev).cast("long").alias("total_cents"),
        (F.sum(promo).cast("double") / F.sum(rev)).alias("promo_share"))


@_register(
    "q_asof_tolerance",
    """
WITH ro AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       CASE WHEN o.o_orderdate >= e.ts - INTERVAL 90 DAY
            THEN o.o_orderkey END AS o_orderkey,
       CASE WHEN o.o_orderdate >= e.ts - INTERVAL 90 DAY
            THEN o.o_orderdate END AS o_orderdate
FROM events e
ASOF LEFT JOIN ro o
  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
""",
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with bounded staleness (tolerance 90 days): a preceding
    order older than the tolerance is no match — the kdb `aj` / pandas
    merge_asof(tolerance=...) semantic. Same one-shuffle union-and-fill
    plan as q_asof_join; the tolerance is a post-fill null-out, not an
    extra join. Oracle: DuckDB ASOF JOIN + staleness CASE."""
    from dbsync_spark.operators.asof import asof_join

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")
    orders = (read_table(spark, sf_dir, "orders")
              .groupBy("o_custkey", "o_orderdate")
              .agg(F.max("o_orderkey").alias("o_orderkey"))
              .withColumnRenamed("o_custkey", "user_id"))
    joined = asof_join(events, orders, on=["user_id"],
                       left_ts="ts", right_ts="o_orderdate",
                       right_cols=["o_orderkey", "o_orderdate"],
                       tolerance="90 days")
    return joined.select("event_id", "user_id", "o_orderkey", "o_orderdate")


@_register(
    "q_large_volume_customers",
    """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 250
)
SELECT o_custkey, o_orderkey, total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
""",
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING over a per-order
    aggregate, then join back to orders. The aggregate shrinks the fact
    table BEFORE the join — the surviving side is tiny, so AQE turns the
    join broadcast at runtime."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
                .alias("total_qty"))
           .where(F.col("total_qty") > 250))
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (big.join(orders, big.l_orderkey == orders.o_orderkey)
            .select("o_custkey", "o_orderkey", "total_qty"))


@_register(
    "q_funnel",
    """
WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CASE
         WHEN t_view IS NOT NULL AND t_click > t_view
              AND t_purchase > t_click THEN 'purchased'
         WHEN t_view IS NOT NULL AND t_click > t_view THEN 'clicked'
         WHEN t_view IS NOT NULL THEN 'viewed'
         ELSE 'none' END AS funnel_stage,
       count(*) AS n_users
FROM stages GROUP BY 1
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (view -> click -> purchase in time order): one
    conditional-min aggregation per user, then a stage classification —
    a single shuffle regardless of funnel depth (never N self-joins,
    the naive funnel join is quadratic in stages)."""
    ev = read_table(spark, sf_dir, "events")

    def first_ts(et: str):
        return F.min(F.when(F.col("event_type") == et, F.col("ts")))

    stages = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"))
    stage = (
        F.when(F.col("t_view").isNotNull()
               & (F.col("t_click") > F.col("t_view"))
               & (F.col("t_purchase") > F.col("t_click")), "purchased")
        .when(F.col("t_view").isNotNull()
              & (F.col("t_click") > F.col("t_view")), "clicked")
        .when(F.col("t_view").isNotNull(), "viewed")
        .otherwise("none"))
    return (stages.select(stage.alias("funnel_stage"))
            .groupBy("funnel_stage").agg(F.count("*").alias("n_users")))


@_register(
    "q_cohort",
    """
WITH firsts AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day, CAST(day_offset AS INT) AS day_offset,
       count(*) AS n_active_users
FROM activity GROUP BY cohort_day, day_offset
""",
)
def q_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted on each
    subsequent active day. The firsts table re-joins the events keyed by
    user — both sides shuffle once on user_id and the join is co-located
    (one exchange each, reused by the groupBys)."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", "cohort_day",
                F.datediff(F.date_trunc("day", F.col("ts")),
                           F.col("cohort_day")).alias("day_offset"))
        .distinct())
    return (activity.groupBy("cohort_day", "day_offset")
            .agg(F.count("*").alias("n_active_users")))


@_register(
    "q_json_funcs",
    """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       json_extract_string(props, '$.k') IS NOT NULL AS has_k,
       CAST(len(json_keys(props)) AS INT) AS n_keys
FROM events
""",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the events.props payload column: typed
    extraction, existence, key enumeration — the schema-on-read path for
    semi-structured columns (all JVM-side, no Python)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        F.size(F.json_object_keys("props")).cast("int").alias("n_keys"))


@_register(
    "q_top_per_group",
    """
SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def q_top_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group (each customer's 3 largest orders): row_number over
    a keyed window then filter. Spark plans the rn<=3 filter as a
    WindowGroupLimit push-down — per-group heaps before the full sort."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey")
    return (orders
            .select("o_custkey", "o_orderkey",
                    F.row_number().over(w).alias("rn"))
            .where(F.col("rn") <= 3))


@_register(
    "q_term_stats",
    """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term,
       count(*) AS tf,
       count(DISTINCT doc_id) AS df,
       CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id) AS tf_per_doc
FROM toks GROUP BY term
""",
)
def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term statistics (the counting core of TF-IDF): global term
    frequency, document frequency, density. explode -> one partial-agg
    shuffle keyed by term; no log() in the declared output because libm
    rounding differs across engines (apply idf = ln(N/df) downstream)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term"))
    return toks.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
        (F.count("*").cast("double") / F.countDistinct("doc_id"))
        .alias("tf_per_doc"))


@_register(
    "q_regional_volume",
    f"""
SELECT n_name,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def q_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): a 6-table join where every
    dimension (supplier, nation, region, filtered) broadcasts — the fact
    tables shuffle once on the join key, the dimension chain costs no
    exchange."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (read_table(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (orders
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(li, orders.o_orderkey == li.l_orderkey)
            .join(F.broadcast(supp),
                  (li.l_suppkey == supp.s_suppkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name").agg(F.sum(rev).alias("revenue_cents")))


@_register(
    "q_above_avg_customers",
    f"""
WITH seg AS (
  SELECT c_mktsegment,
         CAST(sum({_CENTS.format(x='c_acctbal')}) AS BIGINT) AS sum_cents,
         count(*) AS n
  FROM customer GROUP BY c_mktsegment
)
SELECT c_custkey, c.c_mktsegment
FROM customer c JOIN seg s ON c.c_mktsegment = s.c_mktsegment
WHERE {_CENTS.format(x='c_acctbal')} * s.n > s.sum_cents
""",
)
def q_above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar pattern (balance above segment average) without a
    float average: compare cents*n > sum_cents in exact integers. The
    per-segment aggregate is a broadcast back-join, not a subquery per
    row."""
    cust = read_table(spark, sf_dir, "customer")
    seg = cust.groupBy(F.col("c_mktsegment").alias("_seg")).agg(
        F.sum(_cents(F.col("c_acctbal"))).alias("sum_cents"),
        F.count("*").alias("n"))
    return (cust.join(F.broadcast(seg), cust.c_mktsegment == seg._seg)
            .where(_cents(F.col("c_acctbal")) * F.col("n") > F.col("sum_cents"))
            .select("c_custkey", "c_mktsegment"))


@_register(
    "q_forecast_revenue",
    f"""
SELECT CAST(sum({_CENTS.format(x='l_extendedprice * l_discount')}) AS BIGINT)
         AS revenue_cents,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure filter + global agg.
    Everything folds into the scan — three pushed predicates, two read
    columns, one partial-agg exchange of a single row per partition."""
    li = read_table(spark, sf_dir, "lineitem")
    filtered = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    return filtered.agg(
        F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
        .cast("long").alias("revenue_cents"),
        F.count("*").alias("n_items"))


@_register(
    "q_returned_items",
    f"""
SELECT c_custkey, c_name,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS lost_cents,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_cents DESC, c_custkey
LIMIT 20
""",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): fact-fact join on the
    order key, nation broadcast, top-20 via TakeOrderedAndProject."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    orders = (read_table(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    li = (read_table(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (orders
            .join(li, orders.o_orderkey == li.l_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(rev).alias("lost_cents"))
            .select("c_custkey", "c_name", "lost_cents", "n_name")
            .orderBy(F.col("lost_cents").desc(), "c_custkey")
            .limit(20))


@_register(
    "q_order_count_dist",
    """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT n_orders, count(*) AS n_customers
FROM per_cust GROUP BY n_orders
""",
)
def q_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): two stacked
    aggregations — per-customer counts (left join keeps zero-order
    customers), then the histogram of those counts. The second agg's input
    is already tiny; AQE coalesces its exchange."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (read_table(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") != "1-URGENT")
              .select("o_orderkey", "o_custkey"))
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("n_orders")))
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@_register(
    "q_pandas_udf_score",
    f"""
SELECT o_orderkey,
       ({_CENTS.format(x='o_totalprice')} % 97) * 31
         + length(o_orderpriority) AS score
FROM orders
""",
)
def q_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python-UDF escape hatch, done the right way: a vectorized
    @pandas_udf (Arrow batches, no per-row pickling) computing a custom
    score. Declared with a SQL oracle to prove the Arrow path is
    value-exact. Row-at-a-time Python UDFs are banned from hot paths;
    this is the pattern any custom decode/feature-extract op follows
    (functions/multimodal.py does the same over mapInPandas)."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them, which the pandas_udf signature inspector rejects
    def _score(cents, prio):
        return (cents % 97) * 31 + prio.str.len()

    score = pandas_udf(_score, "long")

    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        score(_cents(F.col("o_totalprice")),
              F.col("o_orderpriority")).alias("score"))


@_register(
    "q_regression",
    """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sx,
         sum(CAST(round(l_discount * 10000, 0) AS BIGINT)) AS sy,
         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
         sum(CAST(round(l_discount * 10000, 0) AS BIGINT)
             * CAST(round(l_discount * 10000, 0) AS BIGINT)) AS syy,
         sum(CAST(l_quantity AS BIGINT)
             * CAST(round(l_discount * 10000, 0) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS slope,
       (CAST(sy AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx))
            * CAST(sx AS DOUBLE)) / n AS intercept,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
FROM s
""",
)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression + Pearson r (quantity vs
    discount basis points) from EXACT integer moment sums — never the
    built-in float corr/covar (their incremental update trees are not
    associative across partial aggregates, so they can never hash-match
    another engine). The moments (n, Sx, Sy, Sxx, Syy, Sxy) are int64
    sums with map-side combine; the float formulas run once per group on
    exact inputs, so the doubles are bit-identical on both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_discount") * 10000, 0).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num.cast("double") / dx
    return s.select(
        "l_returnflag", "n",
        slope.alias("slope"),
        ((F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
         / F.col("n")).alias("intercept"),
        (num.cast("double")
         / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))))
        .alias("r"))


@_register(
    "q_downsample",
    f"""
SELECT user_id, date_trunc('hour', ts) AS bucket,
       count(*) AS n_events,
       arg_max({_CENTS.format(x='value')}, ts) AS last_cents,
       min({_CENTS.format(x='value')}) AS min_cents,
       max({_CENTS.format(x='value')}) AS max_cents
FROM events
GROUP BY user_id, date_trunc('hour', ts)
""",
)
def q_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gauge downsampling (the hypertable-rollup primitive):
    per (series, hour) keep the LAST observation plus min/max envelope —
    max_by/arg_max, one keyed shuffle with map-side combine, no window
    sort. (user_id, ts) is unique in the fixture, so last-by-ts is
    deterministic."""
    ev = read_table(spark, sf_dir, "events")
    cents = _cents(F.col("value"))
    return (ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
            .agg(F.count("*").alias("n_events"),
                 F.max_by(cents, F.col("ts")).alias("last_cents"),
                 F.min(cents).alias("min_cents"),
                 F.max(cents).alias("max_cents")))


@_register(
    "q_incremental_join",
    f"""
SELECT o_orderkey, o_custkey, l_linenumber,
       {_REV_CENTS} AS revenue_cents
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
""",
)
def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance: the maintained view after an
    append-only refresh (delta algebra dV = dA⋈B ∪ A⋈dB ∪ dA⋈dB,
    operators/ivm.py) must EXACTLY equal the full-recompute oracle. The
    split plants deltas on both sides (every 4th order, every 3rd
    lineitem order); each delta leg broadcasts, so a refresh costs
    O(delta), not O(base) — the view-level analog of the reference's
    incremental table sync."""
    from dbsync_spark.operators.ivm import refresh

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (read_table(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("o_orderkey"), "l_linenumber",
                  _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .alias("revenue_cents")))
    old_a = orders.where(F.col("o_orderkey") % 4 != 0)
    d_a = orders.where(F.col("o_orderkey") % 4 == 0)
    old_b = li.where(F.col("o_orderkey") % 3 != 0)
    d_b = li.where(F.col("o_orderkey") % 3 == 0)
    view = old_a.join(old_b, on=["o_orderkey"])
    return refresh(view, old_a, d_a, old_b, d_b, on=["o_orderkey"])


@_register(
    "q_grouped_pandas_norm",
    f"""
WITH c AS (
  SELECT event_id, user_id, {_CENTS.format(x='value')} AS cents,
         min({_CENTS.format(x='value')}) OVER (PARTITION BY user_id) AS mn,
         max({_CENTS.format(x='value')}) OVER (PARTITION BY user_id) AS mx
  FROM events
)
SELECT event_id, user_id,
       CASE WHEN mx = mn THEN 0.5
            ELSE CAST(cents - mn AS DOUBLE) / (mx - mn) END AS norm
FROM c
""",
)
def q_grouped_pandas_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas API (applyInPandas): per-user min-max
    normalization computed inside an Arrow-batched pandas function — the
    escape hatch for per-group logic Spark expressions can't state
    (sklearn transforms, per-group model scoring). Here the logic IS
    SQL-expressible, so the oracle verifies the Arrow plumbing end-to-end:
    integer cents in, one float subtract/divide out — bit-identical to
    the window-function formulation on both engines. One shuffle on the
    group key, same as the window plan."""
    import pandas as pd

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", _cents(F.col("value")).alias("cents"))

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["cents"].min(), pdf["cents"].max()
        if hi == lo:
            out = pd.Series(0.5, index=pdf.index)
        else:
            out = (pdf["cents"] - lo) / (hi - lo)
        return pd.DataFrame({"event_id": pdf["event_id"],
                             "user_id": pdf["user_id"], "norm": out})

    return ev.groupBy("user_id").applyInPandas(
        norm, schema="event_id LONG, user_id LONG, norm DOUBLE")


@_register(
    "q_attribution",
    """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d,
         count(*) OVER (PARTITION BY user_id) AS n_ev
  FROM events
),
per_user AS (
  SELECT user_id,
         max(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
         max(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch,
         max(n_ev) AS n_ev
  FROM ranked GROUP BY user_id
)
SELECT first_touch, last_touch,
       count(*) AS n_users,
       CAST(sum(n_ev) AS BIGINT) AS n_events
FROM per_user GROUP BY first_touch, last_touch
""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: per user the first and last
    event type by (ts, event_id), then user counts per (first, last)
    pair. Spark side uses min_by/max_by over a struct ordering key — one
    hash aggregate with map-side partials instead of two window sorts
    (at 100 TB: one shuffle on user_id, no per-partition global sort)."""
    ev = read_table(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    per_user = ev.groupBy("user_id").agg(
        F.min_by("event_type", ordk).alias("first_touch"),
        F.max_by("event_type", ordk).alias("last_touch"),
        F.count("*").alias("n_ev"))
    return (per_user.groupBy("first_touch", "last_touch")
            .agg(F.count("*").alias("n_users"),
                 F.sum("n_ev").alias("n_events")))


@_register(
    "q_gap_fill",
    """
WITH src AS (SELECT * FROM events WHERE value > 95),
cells AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
  FROM src GROUP BY 1, 2
),
spine AS (
  SELECT et.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM src) et
  CROSS JOIN (SELECT unnest(generate_series(
      (SELECT date_trunc('hour', min(ts)) FROM src),
      (SELECT date_trunc('hour', max(ts)) FROM src),
      INTERVAL 1 HOUR)) AS h) g
),
filled AS (
  SELECT s.event_type, s.h, c.cnt
  FROM spine s LEFT JOIN cells c ON s.event_type = c.event_type AND s.h = c.h
)
SELECT event_type, h,
       coalesce(cnt, 0) AS cnt,
       coalesce(last_value(cnt IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS locf_cnt,
       cnt IS NULL AS is_gap
FROM filled
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward
    (the hypertable `time_bucket_gapfill + locf` shape): build the dense
    (event_type x hour) spine, left-join the sparse hourly counts, and
    carry the last non-missing value across gaps with a keyed running
    window. The spine is generated row-locally from one 1-row bounds
    aggregate (broadcast — never a driver loop); the LOCF window is
    partitioned by series key, so no global sort anywhere."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value") > 95)
    cells = (ev.groupBy("event_type",
                        F.date_trunc("hour", F.col("ts")).alias("h"))
             .agg(F.count("*").alias("cnt")))
    bounds = ev.agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
                    F.date_trunc("hour", F.max("ts")).alias("h1"))
    spine_h = bounds.select(F.explode(
        F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"))
    spine = ev.select("event_type").distinct().crossJoin(F.broadcast(spine_h))
    filled = spine.join(cells, on=["event_type", "h"], how="left")
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, 0))
    return filled.select(
        "event_type", "h",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.coalesce(F.last("cnt", ignorenulls=True).over(w), F.lit(0))
        .alias("locf_cnt"),
        F.col("cnt").isNull().alias("is_gap"))


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"]
# min/max rendered only where CAST-to-string is bit-identical across
# engines (integers + plain strings); double/timestamp renderings differ
_PROFILE_MINMAX = ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_orderpriority"]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        if c in _PROFILE_MINMAX:
            mn = f"CAST(min({c}) AS VARCHAR)"
            mx = f"CAST(max({c}) AS VARCHAR)"
        else:
            mn = mx = "CAST(NULL AS VARCHAR)"
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,"
            f" count(*) - count({c}) AS n_nulls,"
            f" count(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_value, {mx} AS max_value FROM orders")
    return "\nUNION ALL\n".join(parts)


@_register("q_profile", _profile_oracle())
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (ANALYZE-style column statistics): per column, the
    row count, null count, exact distinct count, and min/max (rendered as
    strings for the engine-portable types; NULL for double/timestamp whose
    string renderings are not cross-engine stable), computed in ONE scan
    as parallel aggregate expressions and unpivoted to long form. At
    100 TB the exact count_distinct expressions (which expand the
    aggregate input n_cols-fold) would flip to approx_count_distinct —
    same plan shape, sketch merge instead of expand
    (functions/profile.py::profile_table)."""
    from dbsync_spark.functions.profile import profile_table

    orders = read_table(spark, sf_dir, "orders")
    return profile_table(orders, _PROFILE_COLS,
                         minmax_cols=_PROFILE_MINMAX)


@_register(
    "q_set_ops_all",
    """
SELECT user_id, count(*) AS n_excess
FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT ALL
  SELECT user_id FROM events WHERE event_type = 'view'
)
GROUP BY user_id
""",
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — EXCEPT ALL: per user, how many
    click events exceed their view events (multiplicity-aware difference,
    which plain EXCEPT's set semantics would collapse to 0/1). Spark's
    exceptAll plans as an aggregate-count + generate replicate — one
    shuffle on the value key, no join."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    views = ev.where(F.col("event_type") == "view").select("user_id")
    return (clicks.exceptAll(views)
            .groupBy("user_id").agg(F.count("*").alias("n_excess")))


@_register(
    "q_hopping_window",
    """
WITH starts AS (
  SELECT event_type,
         unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS w_start
  FROM events
)
SELECT event_type, w_start, count(*) AS cnt
FROM starts GROUP BY event_type, w_start
""",
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window counts: 2-hour windows advancing every
    hour, so each event lands in exactly two windows — the overlap shape
    tumbling windows can't express (trend smoothing, rate-over-window
    alerting). Spark's window(ts, '2 hours', '1 hour') replicates rows
    into their covering windows before the aggregate; the oracle mirrors
    that expansion explicitly."""
    ev = read_table(spark, sf_dir, "events")
    return (ev.groupBy(
                "event_type",
                F.window("ts", "2 hours", "1 hour").alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select("event_type", F.col("w.start").alias("w_start"), "cnt"))


@_register(
    "q_session_window",
    """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
ids AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM ids GROUP BY user_id, session_id
""",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-minute inactivity gap) per user via
    F.session_window — the aggregate-time session operator (merges
    windows inside the agg, no two-pass gaps-and-islands). The oracle
    reconstructs the same sessions relationally: session_end is
    last_event + gap, exactly Spark's window.end semantics. One shuffle
    on (user_id); the same expression works under readStream with a
    watermark."""
    ev = read_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id",
                       F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events"))


@_register(
    "q_pandas_grouped_agg",
    f"""
SELECT l_returnflag,
       CAST(sum({_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS sum_cents,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (the UDAF surface — distinct from the
    grouped-MAP applyInPandas of q_grouped_pandas_norm): a vectorized
    Arrow aggregate usable inside groupBy().agg() alongside built-ins.
    Summing exact integer cents in numpy keeps the result bit-identical
    to the SQL SUM (int64 addition is associative — this is why the UDF
    sums cents, never float dollars)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module's `from __future__ import
    # annotations` stringifies signatures, which defeats pandas_udf's
    # annotation-based type inference
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def cents_sum(v):
        return int(v.sum())

    # Spark disallows mixing group-agg pandas UDFs with built-in
    # aggregates in one agg(), so the row count is a pandas UDF too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_vals(v):
        return len(v)

    li = read_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (li.select("l_returnflag", cents.alias("_c"))
            .groupBy("l_returnflag")
            .agg(cents_sum(F.col("_c")).alias("sum_cents"),
                 n_vals(F.col("_c")).alias("n_rows")))


# ---------------------------------------------------------------------------
# Robust outlier detection (IQR fences over a heavy-tailed signal)
# ---------------------------------------------------------------------------

@_register(
    "q_outlier_gaps",
    """
WITH gaps AS (
  SELECT user_id, event_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
g AS (SELECT * FROM gaps WHERE gap_us IS NOT NULL),
ranked AS (
  SELECT user_id, event_id, gap_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY gap_us, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM g
),
q AS (
  SELECT user_id,
         MAX(CASE WHEN rn = (n + 3) // 4 THEN gap_us END) AS q1_us,
         MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN gap_us END) AS q3_us
  FROM ranked GROUP BY user_id
)
SELECT g.user_id, g.event_id, g.gap_us, q.q1_us, q.q3_us
FROM g JOIN q ON g.user_id = q.user_id
WHERE 2 * g.gap_us > 2 * q.q3_us + 3 * (q.q3_us - q.q1_us)
""",
)
def q_outlier_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (IQR-fence) outlier detection over per-user inter-event
    gaps: flag gaps above Q3 + 1.5*IQR — inactivity anomalies on a
    heavy-tailed signal where mean/stddev fences would be swamped.

    Quartiles are EXACT discrete percentiles picked by rank (Q1 at
    ceil(n/4), Q3 at ceil(3n/4)) — elements of the data, not
    interpolated floats, so the whole computation stays in BIGINT
    microseconds; the 1.5x fence is cross-multiplied (2*gap > 2*q3 +
    3*iqr) to avoid the only float. Everything partitions by user_id:
    the gap window, the rank window, and the quartile aggregate ride the
    SAME shuffle (one Exchange, three stacked windows/aggs), and the
    per-user quartile frame re-joins broadcast. At 100 TB a user's
    history fits a partition by construction; for percentile over
    billion-row UNGROUPED signals, swap the rank windows for
    approx_percentile."""
    ev = read_table(spark, sf_dir, "events")
    wg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = (ev.select("user_id", "event_id",
                   (us - F.lag(us).over(wg)).alias("gap_us"))
         .where(F.col("gap_us").isNotNull()))
    wr = Window.partitionBy("user_id").orderBy("gap_us", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = g.select(
        "user_id", "event_id", "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"))
    q = (ranked.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 3) div 4"),
                     F.col("gap_us"))).alias("q1_us"),
        F.max(F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"),
                     F.col("gap_us"))).alias("q3_us")))
    return (g.join(F.broadcast(q), "user_id")
            .where(2 * F.col("gap_us")
                   > 2 * F.col("q3_us") + 3 * (F.col("q3_us") - F.col("q1_us")))
            .select("user_id", "event_id", "gap_us", "q1_us", "q3_us"))


# ---------------------------------------------------------------------------
# Burst dedup (telemetry): keep the first event of each activity burst
# ---------------------------------------------------------------------------

@_register(
    "q_burst_dedup",
    """
WITH e AS (
  SELECT user_id, event_type, event_id,
         date_trunc('microseconds', ts) AS ts
  FROM events
),
d AS (
  SELECT user_id, event_type, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE THEN 1
              ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_type, event_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
),
ranked AS (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, event_type, sid
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type, sid) AS n
  FROM s
)
SELECT user_id, event_type, event_id,
       CAST(n - 1 AS BIGINT) AS n_suppressed
FROM ranked WHERE rn = 1
""",
)
def q_burst_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst dedup: within each (user, event_type), events separated by
    less than 5 minutes form one burst; keep the burst's FIRST event and
    report how many it suppressed — the batch analog of
    dropDuplicatesWithinWatermark for repeated-signal telemetry.

    Spark-first: the burst IS a session window, so the engine uses the
    native session_window aggregate (one shuffle; identical code runs as
    a watermarked streaming aggregation). The oracle reconstructs
    sessions via the gaps-and-islands form. min_by over a (ts, event_id)
    struct picks the first event without a second window pass."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "5 minutes"),
                   "user_id", "event_type")
        .agg(F.min_by("event_id",
                      F.struct(F.col("ts"), F.col("event_id")))
             .alias("event_id"),
             (F.count("*") - 1).alias("n_suppressed"))
        .select("user_id", "event_type", "event_id", "n_suppressed"))


# ---------------------------------------------------------------------------
# Path analysis: event-type transition matrix
# ---------------------------------------------------------------------------

@_register(
    "q_path_analysis",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""",
)
def q_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the event-type transition matrix (how often type A
    is immediately followed by type B within a user's stream) — the
    input to Markov-chain navigation/attribution models. One shuffle on
    user_id for the lag window, then a narrow-key count aggregate with
    map-side combine; the matrix is |types|^2 rows regardless of data
    scale."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.select(F.lag("event_type").over(w).alias("prev_type"),
                      F.col("event_type").alias("next_type"))
            .where(F.col("prev_type").isNotNull())
            .groupBy("prev_type", "next_type")
            .agg(F.count("*").alias("n_transitions")))


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------

@_register(
    "q_rfm",
    f"""
WITH m AS (
  SELECT o_custkey,
         CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS last_us,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(SUM({_CENTS.format(x='o_totalprice')}) AS BIGINT) AS monetary_cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, last_us, frequency, monetary_cents,
       CAST(ntile(5) OVER (ORDER BY last_us, o_custkey) AS INT) AS r_score,
       CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS INT) AS f_score,
       CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS INT) AS m_score
FROM m
""",
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (last order), frequency
    (order count), monetary (lifetime cents), each bucketed into
    quintiles — the classic marketing segmentation. Ties broken by
    custkey so ntile is deterministic cross-engine.

    The ntile windows are unpartitioned BUT run over the post-aggregate
    per-customer frame (one row per customer). For catalogs where even
    that frame is too large for one task, the quintile boundaries come
    from approx_percentile and a broadcast join assigns scores — the
    aggregation below is unchanged."""
    orders = read_table(spark, sf_dir, "orders")
    m = (orders.groupBy("o_custkey")
         .agg(F.max(F.unix_micros(
                  F.col("o_orderdate").cast("timestamp"))).alias("last_us"),
              F.count("*").alias("frequency"),
              F.sum(_cents(F.col("o_totalprice"))).alias("monetary_cents")))
    return m.select(
        "o_custkey", "last_us", "frequency", "monetary_cents",
        F.ntile(5).over(Window.orderBy("last_us", "o_custkey")).alias("r_score"),
        F.ntile(5).over(Window.orderBy("frequency", "o_custkey")).alias("f_score"),
        F.ntile(5).over(Window.orderBy("monetary_cents", "o_custkey")).alias("m_score"))


# ---------------------------------------------------------------------------
# Window frame completeness: first/last/nth value, RANGE interval frames
# ---------------------------------------------------------------------------

@_register(
    "q_frame_bounds",
    f"""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey)  OVER w AS last_order,
       nth_value(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_frame_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the full-partition frame
    (explicit UNBOUNDED FOLLOWING — the default frame would make
    last_value the current row, a classic cross-engine trap). One
    shuffle on custkey."""
    orders = read_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"))


@_register(
    "q_rolling_7d",
    f"""
WITH d AS (
  SELECT o_custkey, o_orderkey,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day_no,
         {_CENTS.format(x='o_totalprice')} AS cents
  FROM orders
)
SELECT o_custkey, o_orderkey, day_no,
       CAST(SUM(cents) OVER (
         PARTITION BY o_custkey ORDER BY day_no
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT
       ) AS spend_7d_cents
FROM d
""",
)
def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-DAY spend per customer via a RANGE frame: unlike a ROWS
    frame, the window is defined by the VALUE distance (calendar days),
    so sparse/bursty order histories aggregate correctly — same-day
    orders share one frame, quiet weeks shrink it. The order key is an
    integer epoch-day so Spark's numeric rangeBetween and DuckDB's RANGE
    agree exactly. One shuffle on custkey."""
    orders = read_table(spark, sf_dir, "orders")
    # integer `div`, not float `/`: double rounding at a bucket boundary
    # would silently shift a row's frame membership
    day_no = F.expr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
    w = (Window.partitionBy("o_custkey").orderBy("day_no")
         .rangeBetween(-6, 0))
    return (orders.select(
        "o_custkey", "o_orderkey", day_no.alias("day_no"),
        _cents(F.col("o_totalprice")).alias("cents"))
        .select("o_custkey", "o_orderkey", "day_no",
                F.sum("cents").over(w).alias("spend_7d_cents")))


# ---------------------------------------------------------------------------
# Time-series similarity search (EDBT'19 streaming-similarity shape)
# ---------------------------------------------------------------------------

@_register(
    "q_ts_similarity",
    f"""
WITH series AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         CAST(SUM({_CENTS.format(x='value')}) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
q AS (SELECT bucket, v AS qv FROM series WHERE user_id = 1),
qn AS (SELECT SUM(qv * qv) AS nq FROM q),
dots AS (
  SELECT s.user_id, CAST(SUM(s.v * q.qv) AS BIGINT) AS dot
  FROM series s JOIN q ON s.bucket = q.bucket
  WHERE s.user_id <> 1
  GROUP BY s.user_id
),
norms AS (
  SELECT user_id, CAST(SUM(v * v) AS BIGINT) AS na
  FROM series GROUP BY user_id
)
SELECT d.user_id, d.dot, n.na,
       CAST(d.dot AS DOUBLE) / (sqrt(CAST(n.na AS DOUBLE))
         * sqrt(CAST((SELECT nq FROM qn) AS DOUBLE))) AS cosine_sim
FROM dots d JOIN norms n ON d.user_id = n.user_id
""",
)
def q_ts_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search: cosine similarity between the
    hourly activity series of a query user (user 1) and every other
    user — 'which users behave like this one'. Series are exact integer
    vectors (hourly cents); dot products and norms are BIGINT sums, so
    the only float work is two IEEE-correctly-rounded sqrts and one
    division (bit-identical cross-engine, same guarantee as the L2 norm
    in q_array_funcs).

    Scale: the bucketed series is a narrow aggregate (one shuffle); the
    query series broadcasts into the dot-product join keyed on bucket;
    norms ride the same series aggregate. For all-pairs similarity at
    scale, bucket users by SRP of their series vector first (the ANN
    path) — this query is the verify kernel of that pipeline."""
    ev = read_table(spark, sf_dir, "events")
    series = (ev.groupBy("user_id",
                         F.date_trunc("hour", F.col("ts")).alias("bucket"))
              .agg(F.sum(_cents(F.col("value"))).alias("v")))
    q = (series.where(F.col("user_id") == 1)
         .select("bucket", F.col("v").alias("qv")))
    nq = q.agg(F.sum(F.col("qv") * F.col("qv"))).first()[0]
    if nq is None:
        raise ValueError("query user 1 has no events in this fixture — "
                         "q_ts_similarity needs a non-empty query series")
    dots = (series.where(F.col("user_id") != 1)
            .join(F.broadcast(q), "bucket")
            .groupBy("user_id")
            .agg(F.sum(F.col("v") * F.col("qv")).alias("dot")))
    norms = series.groupBy("user_id").agg(
        F.sum(F.col("v") * F.col("v")).alias("na"))
    return (dots.join(norms, "user_id")
            .select("user_id", "dot", "na",
                    (F.col("dot").cast("double")
                     / (F.sqrt(F.col("na").cast("double"))
                        * F.sqrt(F.lit(float(nq))))).alias("cosine_sim")))


@_register("q_ts_dtw")  # rows-only: DTW's DP is not SQL-expressible;
def q_ts_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW distance from user 1's hourly activity series to every other
    user's — the alignment-tolerant sibling of q_ts_similarity (a user
    doing the same things two hours later still matches). Pandas-UDF
    custom operator (functions/timeseries.py): the DP runs banded
    (Sakoe-Chiba radius 24h) and vectorized per row; exactness against
    a pure-python reference DP is pytest-verified (the declared check
    is rows-only)."""
    from dbsync_spark.functions import timeseries as ts

    ev = read_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    # dense hourly spine over the global range: every user's series has
    # one slot per wall-clock hour (0 = inactive), so the banded DP's
    # radius means hours of shift and series lengths always match
    b0, b1 = ev.agg(F.min(bucket), F.max(bucket)).first()
    spine = F.sequence(F.lit(b0), F.lit(b1), F.expr("INTERVAL 1 HOUR"))
    series = ts.series_arrays(
        ev, "user_id", bucket, _cents(F.col("value")), spine=spine)
    qrow = series.where(F.col("user_id") == 1).select("values").first()
    if qrow is None:
        raise ValueError("query user 1 has no events in this fixture — "
                         "q_ts_dtw needs a non-empty query series")
    others = series.where(F.col("user_id") != 1)
    return ts.dtw_to_query(others, qrow[0], "user_id", radius=24)


@_register("q_streaming_dtw")  # rows-only: stateful streaming DP; the
# batch==stream invariance contract is pytest-pinned (test_dtw_monitor)
def q_streaming_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window DTW maintained INCREMENTALLY from a 3-micro-batch
    event stream (streaming/dtw_monitor.py): per batch, only the touched
    keys' last-24h dense series are re-scored against a fixed pattern;
    the per-key anchor makes every stored score current. Final distances
    equal the single-batch run (pinned in tests)."""
    from dbsync_spark.streaming.state import scratch_dir

    from dbsync_spark.streaming.dtw_monitor import StreamingDtwMonitor

    ev = (read_table(spark, sf_dir, "events")
          .where(F.col("user_id") < 50)
          .select("user_id", "ts", _cents(F.col("value")).alias("value")))
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    pattern = [float((i * 7) % 13) for i in range(24)]
    mon = StreamingDtwMonitor(
        spark, scratch_dir(prefix="dbsync_dtwmon_q_"), pattern,
        id_col="user_id", ts_col="ts", val_col=F.col("value"),
        radius=6, window_buckets=24, bucket="hour")
    batches = [
        ev.where(F.col("ts") < F.lit(lo + span)),
        ev.where((F.col("ts") >= F.lit(lo + span))
                 & (F.col("ts") < F.lit(lo + 2 * span))),
        ev.where(F.col("ts") >= F.lit(lo + 2 * span)),
    ]
    for i, b in enumerate(batches):
        mon.process_batch(b, epoch_id=i)
    return mon.distances()


# ---------------------------------------------------------------------------
# Data-quality / referential-integrity audit
# ---------------------------------------------------------------------------

@_register(
    "q_integrity_audit",
    """
SELECT 'orphan_orders' AS check_name,
       CAST(count(*) AS BIGINT) AS n_violations
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'orphan_lineitems',
       CAST(count(*) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'dup_lineitem_keys',
       CAST(count(*) AS BIGINT)
FROM (
  SELECT l_orderkey, l_linenumber FROM lineitem
  GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
)
UNION ALL
SELECT 'null_order_dates',
       CAST(count(*) AS BIGINT)
FROM orders WHERE o_orderdate IS NULL
""",
)
def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity / constraint audit — the validation pass a
    sync engine runs against its TARGETS (the reference trusts the
    source DB's constraints; on a lake there is no enforcement, so the
    engine provides the check): FK orphans via anti-joins (never a row
    explosion), duplicate-key detection via HAVING, NOT NULL scans.
    Each check is an independent aggregate; Spark runs the four branches
    as one job over broadcast/anti-join plans."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    li = read_table(spark, sf_dir, "lineitem")

    def one(name, cnt_df):
        return cnt_df.select(F.lit(name).alias("check_name"),
                             F.count("*").alias("n_violations"))

    orphan_orders = orders.join(cust, orders.o_custkey == cust.c_custkey,
                                "anti")
    orphan_li = li.join(orders.select("o_orderkey"),
                        li.l_orderkey == F.col("o_orderkey"), "anti")
    dup_keys = (li.groupBy("l_orderkey", "l_linenumber")
                .agg(F.count("*").alias("_n")).where(F.col("_n") > 1))
    null_dates = orders.where(F.col("o_orderdate").isNull())
    return (one("orphan_orders", orphan_orders)
            .unionByName(one("orphan_lineitems", orphan_li))
            .unionByName(one("dup_lineitem_keys", dup_keys))
            .unionByName(one("null_order_dates", null_dates)))


# ---------------------------------------------------------------------------
# Approximate sketches (rows-only by nature: sketch internals are
# engine-specific, so no cross-engine hash parity exists; accuracy vs the
# exact answers is pytest-pinned instead — test_analytics.py)
# ---------------------------------------------------------------------------

@_register("q_hll_distinct")  # rows-only: HLL register layouts differ per
# engine; |approx-exact|/exact <= rsd bound pytest-pinned
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event type
    (approx_count_distinct, rsd=2%) next to the exact count — the
    cardinality sketch every 100 TB profiling pass starts with: one pass,
    fixed memory per group, mergeable across partitions (the partial
    sketches combine in the map-side aggregate, so the shuffle carries
    one sketch per group per task, not the values)."""
    ev = read_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02)
                 .alias("approx_users"),
                 F.countDistinct("user_id").alias("exact_users"))
            .orderBy("event_type"))


@_register("q_quantile_sketch")  # rows-only: quantile-sketch
# interpolation differs per engine; rank-error bound pytest-pinned
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of integer-cents event value per event type
    (percentile_approx, accuracy 10000 -> rank error <= 1/10000) — the
    distribution profile for quality gating (e.g. token-length cutoffs)
    at a fixed memory budget; sketches merge across partitions like HLL."""
    ev = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (ev.groupBy("event_type")
            .agg(F.percentile_approx(cents, [0.5, 0.9, 0.99], 10000)
                 .alias("p50_p90_p99"))
            .select("event_type",
                    F.col("p50_p90_p99")[0].alias("p50_cents"),
                    F.col("p50_p90_p99")[1].alias("p90_cents"),
                    F.col("p50_p90_p99")[2].alias("p99_cents"))
            .orderBy("event_type"))


@_register(
    "q_quantile_exact",
    f"""
WITH c AS (SELECT event_type, {_CENTS.format(x="value")} AS cents
           FROM events),
r AS (SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents) AS rn
      FROM c),
n AS (SELECT event_type, count(*) AS n FROM c GROUP BY event_type)
SELECT r.event_type,
       max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS p50_cents,
       max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS p90_cents,
       max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END)
         AS p99_cents
FROM r JOIN n USING (event_type)
GROUP BY r.event_type
ORDER BY r.event_type
""",
)
def q_quantile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 per event type — the oracle-checked twin of
    q_quantile_sketch (whose GK sketch internals are rows-only by
    nature): discrete quantile at rank ceil(p*n), all integer (rank
    arithmetic is (k*n + k) DIV m, the value is an actual data point —
    no interpolation floats), so the quantiles hash-match SQL and
    double as the sketch's accuracy oracle (the pytest rank-error bound
    compares against these). Scale shape: one shuffle on the group key;
    the rank window is PARTITIONED by group (never a global sort) —
    at 100 TB you'd reach for the sketch, and this exact pass is how
    you validate it on a sampled slice."""
    ev = read_table(spark, sf_dir, "events")
    base = ev.select("event_type", _cents(F.col("value")).alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents")
    ranked = base.withColumn("rn", F.row_number().over(w))
    counts = base.groupBy("event_type").agg(F.count("*").alias("n"))
    j = ranked.join(F.broadcast(counts), "event_type")
    pick = [("p50_cents", "(n + 1) DIV 2"),
            ("p90_cents", "(9 * n + 9) DIV 10"),
            ("p99_cents", "(99 * n + 99) DIV 100")]
    return (j.where(" OR ".join(f"rn = {r}" for _, r in pick))
            .groupBy("event_type")
            .agg(*[F.max(F.when(F.expr(f"rn = {r}"), F.col("cents")))
                   .alias(name) for name, r in pick])
            .orderBy("event_type"))


@_register(
    "q_channel_cumulative",
    """
WITH e AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_no
  FROM events
),
clicks AS (
  SELECT user_id, day_no, CAST(count(*) AS BIGINT) AS n
  FROM e WHERE event_type = 'click' GROUP BY user_id, day_no
),
views AS (
  SELECT user_id, day_no, CAST(count(*) AS BIGINT) AS n
  FROM e WHERE event_type = 'view' GROUP BY user_id, day_no
),
cc AS (
  SELECT user_id, day_no,
         CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY day_no
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM clicks
),
cv AS (
  SELECT user_id, day_no,
         CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY day_no
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM views
),
j AS (
  SELECT COALESCE(cc.user_id, cv.user_id) AS user_id,
         COALESCE(cc.day_no, cv.day_no) AS day_no,
         cc.cum AS click_cum, cv.cum AS view_cum
  FROM cc FULL OUTER JOIN cv
    ON cc.user_id = cv.user_id AND cc.day_no = cv.day_no
),
f AS (
  SELECT user_id, day_no,
         MAX(click_cum) OVER (PARTITION BY user_id ORDER BY day_no
                              ROWS UNBOUNDED PRECEDING) AS cum_clicks,
         MAX(view_cum) OVER (PARTITION BY user_id ORDER BY day_no
                             ROWS UNBOUNDED PRECEDING) AS cum_views
  FROM j
)
SELECT user_id, day_no, cum_clicks, cum_views
FROM f WHERE cum_clicks > cum_views
""",
)
def q_channel_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape on the event stream: per-user daily click and
    view counts become two per-channel cumulative series, FULL OUTER
    joined on (user, day); each channel's gaps are then filled with a
    running MAX over the joined frame (Q51's trick — a day present in
    only one channel inherits the other channel's last cumulative), and
    the result keeps days where cumulative clicks exceed cumulative
    views. Two shuffles (one per channel aggregate), a key-aligned outer
    join, and windows all partitioned on the same user key — the join
    and both window passes reuse one partitioning, so AQE plans a single
    exchange chain. NULL semantics are load-bearing twice: MAX ignores
    NULLs (gap fill), and `> NULL` filters users before their first
    click — identical in both engines."""
    ev = read_table(spark, sf_dir, "events")
    day_no = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    e = ev.select("user_id", "event_type", day_no.alias("day_no"))
    wc = (Window.partitionBy("user_id").orderBy("day_no")
          .rowsBetween(Window.unboundedPreceding, 0))

    def channel(tp: str, out: str) -> DataFrame:
        daily = (e.where(F.col("event_type") == tp)
                 .groupBy("user_id", "day_no").count())
        return daily.select("user_id", "day_no",
                            F.sum("count").over(wc).alias(out))

    cc = channel("click", "click_cum")
    cv = channel("view", "view_cum")
    j = cc.join(cv, on=["user_id", "day_no"], how="full")
    f = j.select(
        "user_id", "day_no",
        F.max("click_cum").over(wc).alias("cum_clicks"),
        F.max("view_cum").over(wc).alias("cum_views"))
    return f.where(F.col("cum_clicks") > F.col("cum_views"))



@_register(
    "q_outlier_mad",
    f"""
WITH c AS (SELECT event_id, event_type, {_CENTS.format(x='value')} AS cents
           FROM events),
m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
      FROM c GROUP BY event_type),
d AS (SELECT c.event_id, c.event_type, c.cents, m.med,
             abs(c.cents - m.med) AS dev
      FROM c JOIN m USING (event_type)),
s AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM d GROUP BY event_type)
SELECT d.event_id, d.event_type, d.cents, d.med, d.dev, s.mad
FROM d JOIN s USING (event_type)
WHERE d.dev > 3 * s.mad
""",
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: |value - median| > 3 *
    MAD (median absolute deviation) — the heavy-tail-safe alternative to
    z-scores for corpus/stream quality screens. Exactness: values are
    integer cents, so both medians interpolate over exactly-representable
    doubles (midpoints are multiples of 0.5/0.25 — no rounding), making
    the flagged set bit-identical across engines. Shape: two tiny
    per-type aggregates broadcast back onto the fact scan — two shuffles
    total regardless of data size; at 100 TB swap the exact percentile
    for approx_percentile (t-digest) with the same plan."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.select("event_id", "event_type", _cents(F.col("value")).alias("cents"))
    m = c.groupBy("event_type").agg(F.percentile("cents", 0.5).alias("med"))
    d = (c.join(F.broadcast(m), on="event_type")
         .select("event_id", "event_type", "cents", "med",
                 F.abs(F.col("cents") - F.col("med")).alias("dev")))
    s = d.groupBy("event_type").agg(F.percentile("dev", 0.5).alias("mad"))
    return (d.join(F.broadcast(s), on="event_type")
            .select("event_id", "event_type", "cents", "med", "dev", "mad")
            .where(F.col("dev") > 3 * F.col("mad")))


@_register("q_streaming_hll")  # rows-only: DataSketches HLL binaries are
# engine-side; stream==batch EXACT equality and accuracy-vs-exact are
# pytest-pinned (register-max union is batching-invariant)
def q_streaming_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming distinct-count SERVICE: per-day user sketches
    maintained across three micro-batches (streaming/distinct_index.py,
    HLL union state — a few KB per bucket forever). The emitted estimate
    is identical to the one-shot batch sketch because HLL union is
    register-wise max: associative, commutative, idempotent."""
    from dbsync_spark.streaming.state import scratch_dir

    from dbsync_spark.streaming.distinct_index import StreamingDistinctIndex

    events = read_table(spark, sf_dir, "events")
    idx = StreamingDistinctIndex(
        spark, scratch_dir(prefix="dbsync_hll_q_"))
    for epoch in range(3):
        idx.process_batch(events.where(F.col("event_id") % 3 == epoch),
                          epoch_id=epoch)
    return idx.estimates()


def _trending_oracle(capacity: int = 3, n_epochs: int = 3, k: int = 3) -> str:
    """Unrolled per-bucket Misra-Gries recurrence over the events stream:
    epoch e consumes event_id % n_epochs == e, buckets are days, the
    compression decrement is per (bucket, epoch) — mirrors
    streaming/topk_index.py::StreamingTrendingIndex exactly."""
    parts = ["""WITH tk AS (
  SELECT event_id, date_trunc('day', ts) AS bucket, event_type AS tok
  FROM events WHERE event_type <> ''
)"""]
    prev = None
    for e in range(n_epochs):
        parts.append(f""",
b{e} AS (SELECT bucket, tok, count(*) AS bn FROM tk
        WHERE event_id % {n_epochs} = {e} GROUP BY bucket, tok),
t{e} AS (SELECT bucket, CAST(count(*) AS BIGINT) AS bt FROM tk
        WHERE event_id % {n_epochs} = {e} GROUP BY bucket)""")
        if prev is None:
            parts.append(f""",
m{e} AS (SELECT bucket, tok, CAST(bn AS BIGINT) AS nhat FROM b{e}),
meta_in{e} AS (SELECT bucket, CAST(0 AS BIGINT) AS total_n,
                      CAST(0 AS BIGINT) AS err FROM t{e} WHERE 1 = 0)""")
        else:
            parts.append(f""",
m{e} AS (
  SELECT coalesce(s.bucket, b.bucket) AS bucket,
         coalesce(s.tok, b.tok) AS tok,
         CAST(coalesce(s.nhat, 0) + coalesce(b.bn, 0) AS BIGINT) AS nhat
  FROM s{prev} s FULL JOIN b{e} b
    ON s.bucket = b.bucket AND s.tok = b.tok
),
meta_in{e} AS (SELECT bucket, total_n, err FROM meta{prev})""")
        parts.append(f""",
r{e} AS (SELECT bucket, tok, nhat,
                row_number() OVER (PARTITION BY bucket
                                   ORDER BY nhat DESC, tok) AS rn
         FROM m{e}),
d{e} AS (SELECT bucket, nhat AS d FROM r{e} WHERE rn = {capacity + 1}),
s{e} AS (
  SELECT m.bucket, m.tok,
         CAST(m.nhat - coalesce(d.d, 0) AS BIGINT) AS nhat
  FROM m{e} m LEFT JOIN d{e} d ON m.bucket = d.bucket
  WHERE m.nhat - coalesce(d.d, 0) > 0
),
meta{e} AS (
  SELECT coalesce(p.bucket, t.bucket) AS bucket,
         CAST(coalesce(p.total_n, 0) + coalesce(t.bt, 0) AS BIGINT)
           AS total_n,
         CAST(coalesce(p.err, 0) + coalesce(d.d, 0) AS BIGINT) AS err
  FROM meta_in{e} p
  FULL JOIN t{e} t ON p.bucket = t.bucket
  LEFT JOIN d{e} d ON coalesce(p.bucket, t.bucket) = d.bucket
)""")
        prev = e
    last = n_epochs - 1
    parts.append(f"""
SELECT s.bucket, s.tok, s.nhat, m.err, m.total_n, rk.rank
FROM s{last} s
JOIN meta{last} m ON s.bucket = m.bucket
JOIN (SELECT bucket, tok,
             CAST(row_number() OVER (PARTITION BY bucket
                                     ORDER BY nhat DESC, tok) AS INT)
               AS rank
      FROM s{last}) rk
  ON s.bucket = rk.bucket AND s.tok = rk.tok
WHERE rk.rank <= {k}""")
    return "".join(parts)


@_register("q_trending", _trending_oracle())
def q_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day trending event types: the windowed heavy-hitters SERVICE
    (streaming/topk_index.py::StreamingTrendingIndex, per-bucket
    mergeable Misra-Gries state, capacity 3) fed three micro-batches,
    hash-checked against the identical per-bucket recurrence unrolled
    into a CTE chain. Per-day state stays bounded by capacity forever;
    a hot day's compression never touches a quiet day."""
    from dbsync_spark.streaming.state import scratch_dir

    from dbsync_spark.streaming.topk_index import StreamingTrendingIndex

    events = read_table(spark, sf_dir, "events")
    idx = StreamingTrendingIndex(
        spark, scratch_dir(prefix="dbsync_trend_q_"), capacity=3)
    for epoch in range(3):
        # pre_tokenized: each event_type value IS one token — parity with
        # the oracle's `event_type AS tok` no longer depends on the
        # fixture values being space-free (ADVICE r3)
        idx.process_batch(events.where(F.col("event_id") % 3 == epoch),
                          epoch_id=epoch, text_col="event_type",
                          pre_tokenized=True)
    return (idx.trending(k=3)
            .select("bucket", "tok", "nhat", "err", "total_n",
                    F.col("rank").cast("int").alias("rank")))


@_register(
    "q_changepoint",
    f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM({_CENTS.format(x='value')}) AS BIGINT) AS v_cents
  FROM events GROUP BY 1, 2
),
tgt AS (
  SELECT event_type,
         CAST(SUM(v_cents) // COUNT(*) AS BIGINT) AS _target,
         CAST((SUM(v_cents) // COUNT(*)) // 20 AS BIGINT) AS _slack
  FROM daily GROUP BY 1
),
d AS (
  SELECT daily.*, tgt._slack, v_cents - tgt._target - tgt._slack AS _dev
  FROM daily JOIN tgt USING (event_type)
),
p AS (
  SELECT *, CAST(SUM(_dev) OVER w AS BIGINT) AS _pre
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT *, _pre - LEAST(0, CAST(MIN(_pre) OVER w2 AS BIGINT)) AS cusum_cents
  FROM p
  WINDOW w2 AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, v_cents, cusum_cents
FROM s WHERE cusum_cents > 8 * _slack
""",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection per event-type revenue series: days
    where cumulative drift above (mean + 5% slack) exceeds 8x slack.
    The sequential-looking recurrence distributes as two stacked
    per-key window passes via the prefix-sum/running-min closed form
    (functions/timeseries.py::cusum_changepoints) — exact BIGINT cents,
    hash-matched against the identical SQL windows."""
    from dbsync_spark.functions import timeseries as ts

    ev = read_table(spark, sf_dir, "events")
    daily = (ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(_cents(F.col("value"))).alias("v_cents")))
    return ts.cusum_changepoints(daily, "event_type", "day", "v_cents",
                                 slack_div=20, threshold_mult=8)


from dbsync_spark.functions.sketch import cms_oracle_sql as _cms_oracle


@_register(
    "q_cms_freq",
    _cms_oracle("SELECT user_id FROM events", "user_id"),
)
def q_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point-frequency estimates for every user's event
    count, alongside the exact count: the sketch state is depth x width
    = 1024 counter cells no matter how many billion increments flow in,
    and the cells are plain SUMs — mergeable across batches and days.
    Because the hash rows are md5-derived (functions/sketch.py), the
    ENTIRE sketch is deterministic and hash-matches the SQL oracle —
    the estimates themselves, not just their error bound. CMS guarantee
    est_n >= true_n is additionally pinned in pytest."""
    from dbsync_spark.functions import sketch as sk

    ev = read_table(spark, sf_dir, "events").select("user_id")
    sketch = sk.count_min_build(ev, "user_id")
    keys = ev.groupBy("user_id").agg(F.count("*").alias("true_n"))
    est = sk.count_min_estimate(sketch, keys.select("user_id"), "user_id")
    return keys.join(est, on="user_id").select("user_id", "est_n", "true_n")


@_register(
    "q_streaming_cms",
    _cms_oracle("SELECT user_id FROM events", "user_id"),
)
def q_streaming_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min service (streaming/cms_index.py) fed three
    micro-batches of the event stream, then probed for every user:
    because counter cells are plain mergeable SUMs maintained under the
    cumulative epoch-overwrite discipline, the streamed sketch equals
    the one-pass batch sketch EXACTLY — so this streaming query
    hash-matches the very same SQL oracle as q_cms_freq."""
    from dbsync_spark.streaming.state import scratch_dir

    from dbsync_spark.streaming.cms_index import StreamingCmsIndex

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id")
    idx = StreamingCmsIndex(
        spark, scratch_dir(prefix="dbsync_cms_q_"), key_col="user_id")
    for epoch in range(3):
        idx.process_batch(ev.where(F.col("event_id") % 3 == epoch),
                          epoch_id=epoch)
    keys = ev.groupBy("user_id").agg(F.count("*").alias("true_n"))
    est = idx.estimates(keys.select("user_id"))
    return keys.join(est, on="user_id").select("user_id", "est_n", "true_n")


@_register(
    "q_winsorize",
    f"""
WITH v AS (
  SELECT event_id, event_type, {_CENTS.format(x="value")} AS v_cents
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY v_cents, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
q AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 19) // 20 THEN v_cents END) AS p5,
         MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN v_cents END) AS p95
  FROM ranked GROUP BY event_type
)
SELECT v.event_id, v.event_type, v.v_cents,
       least(greatest(v.v_cents, q.p5), q.p95) AS v_winsorized
FROM v JOIN q USING (event_type)
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clamp at exact rank-picked P5/P95 per event type) —
    the robust feature-prep step before scale-sensitive models. The
    percentiles are ELEMENTS of the data chosen by rank (ceil(n/20),
    ceil(19n/20)), never interpolated floats, so everything stays in
    BIGINT cents. Rank window, count window, and percentile aggregate
    ride ONE event_type exchange; the per-type clamp frame joins back
    broadcast. For ungrouped billion-row signals swap the rank window
    for approx_percentile — this shape is for partitioned features."""
    from pyspark.sql.window import Window as W

    ev = read_table(spark, sf_dir, "events")
    v = ev.select("event_id", "event_type",
                  _cents(F.col("value")).alias("v_cents"))
    wr = W.partitionBy("event_type").orderBy("v_cents", "event_id")
    ranked = (v.withColumn("rn", F.row_number().over(wr))
              .withColumn("n", F.count("*").over(
                  W.partitionBy("event_type"))))
    q = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.floor((F.col("n") + 19) / 20),
                     F.col("v_cents"))).alias("p5"),
        F.max(F.when(F.col("rn") == F.floor((19 * F.col("n") + 19) / 20),
                     F.col("v_cents"))).alias("p95"))
    return (v.join(F.broadcast(q.select("event_type", "p5", "p95")),
                   on="event_type")
            .select("event_id", "event_type", "v_cents",
                    F.least(F.greatest(F.col("v_cents"), F.col("p5")),
                            F.col("p95")).alias("v_winsorized")))


@_register(
    "q_minmax_scale",
    f"""
WITH v AS (
  SELECT event_id, event_type, {_CENTS.format(x="value")} AS v_cents
  FROM events
),
b AS (
  SELECT event_type, min(v_cents) AS lo, max(v_cents) AS hi
  FROM v GROUP BY event_type
)
SELECT v.event_id, v.event_type, v.v_cents,
       CASE WHEN b.hi = b.lo THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(v.v_cents - b.lo AS DOUBLE) / (b.hi - b.lo)
       END AS v_scaled
FROM v JOIN b USING (event_type)
""",
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max feature scaling per event type: (x - min) / (max - min)
    with exact integer bounds and ONE IEEE division per row (the only
    float, bit-identical cross-engine; z-score needs a float mean/std
    aggregate and can never hash-match — this is the exact-checkable
    normalization). Bounds are a tiny broadcast aggregate; the scan
    stays narrow."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.select("event_id", "event_type",
                  _cents(F.col("value")).alias("v_cents"))
    b = v.groupBy("event_type").agg(F.min("v_cents").alias("lo"),
                                    F.max("v_cents").alias("hi"))
    return (v.join(F.broadcast(b), on="event_type")
            .select("event_id", "event_type", "v_cents",
                    F.when(F.col("hi") == F.col("lo"),
                           F.lit(0.0).cast("double"))
                    .otherwise((F.col("v_cents") - F.col("lo"))
                               .cast("double")
                               / (F.col("hi") - F.col("lo")))
                    .alias("v_scaled")))
