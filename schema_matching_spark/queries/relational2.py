"""Second relational query-pack module: event-time windows, as-of join,
explode/unnest, math functions, approximate aggregates (SURVEY.md §2.C
streaming-adjacent + scalar-fn rows)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour event-time windows (the batch shape of the
    streaming windowed agg used by the CDC pipeline's metrics)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("w_start", "event_type")
    )


SQL_TUMBLING = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
       event_type, count(*) AS n, round(sum(value), 3) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY w_start, event_type
"""


def q_sliding_window(spark, sf_dir):
    """Sliding windows: 2-hour width, 1-hour slide — each event lands in
    two windows.

    Hash-stability note (round-1 fix): the old `round(avg(value), 4)`
    output sat exactly on a rounding half for 3/721 windows, so Spark
    (HALF_UP) and DuckDB disagreed on the last digit. The aggregate is
    now tie-free: per-row quantize to integer milli-units, then an exact
    integer sum — associative, order-independent, bit-stable."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias(
                "sum_value_milli"
            ),
        )
        .select(F.col("w.start").alias("w_start"), "n", "sum_value_milli")
        .orderBy("w_start")
    )


SQL_SLIDING = """
SELECT w_start, count(*) AS n,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM (
  SELECT time_bucket(INTERVAL '1 hour', ts) - (o * INTERVAL '1 hour') AS w_start,
         value
  FROM events, (SELECT unnest([0, 1]) AS o)
)
GROUP BY 1
ORDER BY w_start
"""


def q_asof_join(spark, sf_dir):
    """Keyed as-of join: for each event, the most recent order (same key
    bucket) with o_orderdate <= event ts.

    Spark-first implementation: no per-row lookup, no range cross-join —
    union both sides tagged on the time axis, one window pass per key
    (partitioned sort, scalable), `last(ignorenulls)` carries the most
    recent order forward onto each event row."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events").select(
        F.pmod("user_id", F.lit(50)).alias("k"),
        F.col("ts").alias("t"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey_in"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.pmod("o_custkey", F.lit(50)).alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("o_orderkey_in"),
    )
    # orders sort before events at identical timestamps (is_event=1 last)
    unioned = e.unionByName(o).withColumn(
        "is_event", F.col("event_id").isNotNull().cast("int")
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", "o_orderkey_in")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "last_orderkey", F.last("o_orderkey_in", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("is_event") == 1).select(
        "event_id", F.col("last_orderkey").alias("asof_orderkey")
    )
    return (
        out.groupBy()
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("asof_orderkey").isNull(), 1).otherwise(0)).alias(
                "n_no_match"
            ),
            F.sum("asof_orderkey").alias("sum_orderkey"),
        )
    )


SQL_ASOF = """
WITH e AS (SELECT user_id % 50 AS k, ts, event_id FROM events),
     o AS (SELECT o_custkey % 50 AS k, o_orderdate, o_orderkey FROM orders),
     j AS (
       SELECT e.event_id,
              (SELECT o_orderkey FROM o
               WHERE o.k = e.k AND o.o_orderdate <= e.ts
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               LIMIT 1) AS asof_orderkey
       FROM e
     )
SELECT count(*) AS n_events,
       CAST(sum(CASE WHEN asof_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_match,
       CAST(sum(asof_orderkey) AS BIGINT) AS sum_orderkey
FROM j
"""


def q_explode_tokens(spark, sf_dir):
    """explode/unnest surface: top-20 document tokens by frequency."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


SQL_EXPLODE = """
SELECT tok, count(*) AS n
FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents)
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
"""


def q_math_functions(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
            F.round(F.pow("l_discount", 2), 8).alias("disc_sq"),
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            F.pmod("l_partkey", F.lit(7)).alias("pk_mod"),
            F.ceil("l_tax").alias("tax_ceil"),
            F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


SQL_MATH = """
SELECT l_orderkey, l_linenumber,
       round(ln(l_extendedprice + 1), 6) AS log_price,
       round(pow(l_discount, 2), 8) AS disc_sq,
       abs(l_quantity - 25) AS qty_dev,
       l_partkey % 7 AS pk_mod,
       CAST(ceil(l_tax) AS BIGINT) AS tax_ceil,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k
FROM lineitem
WHERE l_orderkey <= 200
ORDER BY l_orderkey, l_linenumber
"""


def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL) next to the exact count — the approx
    value is engine-specific, so rows-only; the test checks relative
    error < 5% against the exact column."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


QUERIES = {
    "tumbling_window": q_tumbling_window,
    "sliding_window": q_sliding_window,
    "asof_join": q_asof_join,
    "explode_tokens": q_explode_tokens,
    "math_functions": q_math_functions,
    "approx_distinct": q_approx_distinct,
}

ORACLE = {
    "tumbling_window": SQL_TUMBLING,
    "sliding_window": SQL_SLIDING,
    "asof_join": SQL_ASOF,
    "explode_tokens": SQL_EXPLODE,
    "math_functions": SQL_MATH,
    # approx_distinct: HLL sketch values are engine-specific — rows-only
}
