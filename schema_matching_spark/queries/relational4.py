"""Driver-facing oracle query pack, batch 4 — multidimensional
aggregation, pivots, exact percentiles/statistics, correlated
subqueries, and further TPC-H-style joins (SURVEY.md §2.C categories:
grouping sets / rollup / cube, window frames, scalar statistics,
semi-join subqueries).

Same contract as relational.py: each (spark, sf_dir) -> DataFrame
callable has a DuckDB oracle with identically-aliased columns.  Floats
that accumulate across partitions are rounded on BOTH sides so the
order-insensitive value hash is stable.

Plan hygiene: dimension tables (part, customer, nation, region,
supplier) are broadcast; conditional aggregation replaces PIVOT so the
same shuffle-free map-side partial agg applies; correlated subqueries
are de-correlated into semi-joins/aggregation joins explicitly rather
than trusting dialect-specific rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ----------------------------------------------------- multidimensional aggs

def q_cube_revenue(spark, sf_dir):
    """CUBE over (l_returnflag, l_linestatus) with grand/partial totals.

    Scale note: cube = groupBy with 4 grouping sets; Spark expands them
    in ONE Expand+hash-agg pass (map-side partials intact), not four
    scans.  Null group keys are coalesced to 'ALL' so the total rows
    hash identically across engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n",
        )
    )


SQL_CUBE_REVENUE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS ((status, priority), (status), ()) via the
    SQL surface (F.grouping_sets has no DataFrame equivalent in 4.1.2 —
    SURVEY.md §2.C)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def q_pivot_segment_priority(spark, sf_dir):
    """Pivot orders×customers: revenue per priority (rows) × market
    segment (columns).  Expressed as conditional aggregation — the
    shape PIVOT compiles to — so it stays one broadcast join + one
    hash agg and the oracle is dialect-neutral."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        *[
            F.round(
                F.sum(F.when(F.col("c_mktsegment") == s, F.col("o_totalprice"))), 2
            ).alias(s.lower())
            for s in segs
        ]
    )


SQL_PIVOT_SEGMENT_PRIORITY = """
SELECT o_orderpriority AS priority,
       round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN o_totalprice END), 2) AS automobile,
       round(sum(CASE WHEN c_mktsegment = 'BUILDING'   THEN o_totalprice END), 2) AS building,
       round(sum(CASE WHEN c_mktsegment = 'FURNITURE'  THEN o_totalprice END), 2) AS furniture,
       round(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN o_totalprice END), 2) AS household,
       round(sum(CASE WHEN c_mktsegment = 'MACHINERY'  THEN o_totalprice END), 2) AS machinery
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderpriority
"""


# ------------------------------------------------------- exact stats

def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per order status (F.percentile is
    the exact single-pass aggregate; approx_percentile is the sketch
    path already covered by approx_distinct's category)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


SQL_PERCENTILES = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       round(min(o_totalprice), 4) AS lo,
       round(max(o_totalprice), 4) AS hi
FROM orders
GROUP BY o_orderstatus
"""


def q_corr_stats(spark, sf_dir):
    """Statistical aggregates: corr / covar / stddev / skew-free single
    pass (partial+final merging of moment sketches)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 5).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 3).alias("covar_qp"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_discount"), 7).alias("var_disc"),
    )


SQL_CORR_STATS = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 5) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 3) AS covar_qp,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(var_samp(l_discount), 7) AS var_disc
FROM lineitem
GROUP BY l_returnflag
"""


def q_arg_extremes(spark, sf_dir):
    """max_by / min_by (DuckDB arg_max / arg_min): per nation, which
    supplier holds the extreme account balance.  One hash agg — the
    classic 'top-1 per group without a window sort'."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("s_name", "s_acctbal").alias("richest"),
            F.min_by("s_name", "s_acctbal").alias("poorest"),
            F.round(F.max("s_acctbal"), 2).alias("max_bal"),
        )
    )


SQL_ARG_EXTREMES = """
SELECT n_name,
       arg_max(s_name, s_acctbal) AS richest,
       arg_min(s_name, s_acctbal) AS poorest,
       round(max(s_acctbal), 2) AS max_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# -------------------------------------------------- subqueries / TPC-H joins

def q_order_priority(spark, sf_dir):
    """TPC-H Q4 style: EXISTS correlated subquery, de-correlated into a
    left-semi join (the plan Catalyst would produce from the SQL form;
    written explicitly so the intent is visible in the DataFrame API)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 style: promo revenue share — broadcast part join +
    conditional-sum ratio in one agg (no second scan)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


SQL_PROMO_REVENUE = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q_returned_items(spark, sf_dir):
    """TPC-H Q10 style: revenue lost to returns per customer, top 20.
    Deterministic under ties via (revenue DESC, c_custkey) ordering."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_RETURNED_ITEMS = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 style: revenue from orders below 20% of the part's
    average quantity.  The correlated scalar subquery is de-correlated
    into an aggregate + equi-join: per-part avg (one hash agg on the
    fact table) joined back — two shuffles total, both on l_partkey, so
    AQE can reuse the exchange."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.a_partkey)
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


SQL_SMALL_QTY_REVENUE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_small
FROM lineitem l1
WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = l1.l_partkey)
"""


def q_nation_market_share(spark, sf_dir):
    """TPC-H Q8 flavor: each nation's share of total revenue within its
    region, per year — nested aggregation with a window over groups."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.year("l_shipdate").alias("yr"),
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
        )
    )
    w = Window.partitionBy("yr", "region")
    return rev.select(
        "yr",
        "region",
        "nation",
        F.round("_rev", 2).alias("revenue"),
        F.round(F.col("_rev") / F.sum("_rev").over(w), 6).alias("share"),
    )


SQL_NATION_MARKET_SHARE = """
WITH rev AS (
  SELECT year(l_shipdate) AS yr, r_name AS region, n_name AS nation,
         sum(l_extendedprice * (1 - l_discount)) AS _rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3
)
SELECT yr, region, nation, round(_rev, 2) AS revenue,
       round(_rev / sum(_rev) OVER (PARTITION BY yr, region), 6) AS share
FROM rev
"""


def q_in_subquery(spark, sf_dir):
    """IN / NOT IN subqueries over the SQL surface (Catalyst rewrites
    to semi/anti joins — the null-safe NOT IN case is the tricky one,
    exercised here with a provably null-free subquery)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_sq_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               round(avg(c_acctbal), 4) AS avg_bal
        FROM _sq_customer
        WHERE c_custkey IN (SELECT o_custkey FROM _sq_orders
                            WHERE o_totalprice > 400000)
          AND c_custkey NOT IN (SELECT o_custkey FROM _sq_orders
                                WHERE o_orderstatus = 'P')
        GROUP BY c_mktsegment
        """
    )


SQL_IN_SUBQUERY = """
SELECT c_mktsegment, count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_bal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
GROUP BY c_mktsegment
"""


# -------------------------------------------------------- window frames

def q_lag_lead_sessions(spark, sf_dir):
    """lag/lead/ntile over per-user event streams: inter-event gap
    seconds and activity quartile.  One shuffle on user_id; the sort
    inside each partition feeds all three window functions."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("ts"),
        # ts is TIMESTAMP_NTZ (no direct cast to double); the micros
        # difference is timezone-free.  Emitted as integer microseconds —
        # a rounded double gap sat on a HALF_UP knife edge for 1/10000
        # rows in round 1; integers cannot tie.
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts", 1).over(w).cast("timestamp"))
        ).alias("gap_us"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.ntile(4).over(w).alias("quartile"),
    )


SQL_LAG_LEAD_SESSIONS = """
SELECT user_id, event_id, ts,
       epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us,
       lead(event_type, 1) OVER w AS next_type,
       ntile(4) OVER w AS quartile
FROM events
WHERE user_id < 200
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_range_frame(spark, sf_dir):
    """RANGE frame: per-customer running order value over a ±15-day
    value window keyed on the order date (rangeBetween on epoch days —
    a peer-inclusive frame a ROWS frame cannot express)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 300)
    day = F.unix_timestamp("o_orderdate") / 86400
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-15, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("od"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_15d"),
        F.count("*").over(w).alias("n_in_window"),
    )


SQL_RANGE_FRAME = """
SELECT o_custkey, o_orderkey, o_orderdate AS od,
       round(sum(o_totalprice) OVER w, 2) AS trailing_15d,
       count(*) OVER w AS n_in_window
FROM orders
WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(epoch(o_orderdate) / 86400 AS BIGINT)
             RANGE BETWEEN 15 PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "cube_revenue": q_cube_revenue,
    "grouping_sets": q_grouping_sets,
    "pivot_segment_priority": q_pivot_segment_priority,
    "percentiles": q_percentiles,
    "corr_stats": q_corr_stats,
    "arg_extremes": q_arg_extremes,
    "order_priority": q_order_priority,
    "promo_revenue": q_promo_revenue,
    "returned_items": q_returned_items,
    "small_qty_revenue": q_small_qty_revenue,
    "nation_market_share": q_nation_market_share,
    "in_subquery": q_in_subquery,
    "lag_lead_sessions": q_lag_lead_sessions,
    "range_frame": q_range_frame,
}

ORACLE = {
    "cube_revenue": SQL_CUBE_REVENUE,
    "grouping_sets": SQL_GROUPING_SETS,
    "pivot_segment_priority": SQL_PIVOT_SEGMENT_PRIORITY,
    "percentiles": SQL_PERCENTILES,
    "corr_stats": SQL_CORR_STATS,
    "arg_extremes": SQL_ARG_EXTREMES,
    "order_priority": SQL_ORDER_PRIORITY,
    "promo_revenue": SQL_PROMO_REVENUE,
    "returned_items": SQL_RETURNED_ITEMS,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "nation_market_share": SQL_NATION_MARKET_SHARE,
    "in_subquery": SQL_IN_SUBQUERY,
    "lag_lead_sessions": SQL_LAG_LEAD_SESSIONS,
    "range_frame": SQL_RANGE_FRAME,
}
