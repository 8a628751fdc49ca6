"""Driver-facing oracle query pack, batch 5 — heavier TPC-H-style
analytics: HAVING over join aggregates, scalar-subquery thresholds,
max-over-aggregate selection, anti-join cohorts.  Same contract as
relational.py (identically-aliased DuckDB oracles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_large_orders(spark, sf_dir):
    """TPC-H Q18 style: customers with orders above a bulk-quantity
    threshold (HAVING over a join aggregate), top 10 by value."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("odate"),
            F.round("o_totalprice", 2).alias("price"),
            F.round("sum_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("price"), "o_orderkey")
        .limit(10)
    )


SQL_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate AS odate,
       round(o_totalprice, 2) AS price, round(sum_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY price DESC, o_orderkey
LIMIT 10
"""


def q_top_revenue_suppliers(spark, sf_dir):
    """TPC-H Q15 style: suppliers achieving the maximum quarterly
    revenue — aggregate, take max via a scalar subquery, select the
    achievers (handles ties exactly like the SQL form)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_rev == max_rev.m)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


SQL_TOP_REVENUE_SUPPLIERS = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
"""


def q_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 flavor: above-average-balance customers with no orders
    after a cutoff — scalar-subquery threshold + left-anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # scalar threshold stays in-plan: a broadcast 1-row cross join keeps
    # the whole query one job (a driver-side collect() here would add a
    # separate blocking job per run — flagged r1)
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    recent = o.where(F.col("o_orderdate") >= F.lit("2000-01-01")).select(
        "o_custkey"
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_idle_rich"),
            F.round(F.sum("c_acctbal"), 2).alias("idle_capital"),
        )
        .orderBy("c_mktsegment")
    )


SQL_IDLE_RICH = """
SELECT c_mktsegment, count(*) AS n_idle_rich,
       round(sum(c_acctbal), 2) AS idle_capital
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_order_value_distribution(spark, sf_dir):
    """Histogram via width_bucket-style banding: order values bucketed
    into 10k-wide bands, count + share per band (the data-profiling
    shape every ingest pipeline needs)."""
    o = _t(spark, sf_dir, "orders")
    band = (F.floor(F.col("o_totalprice") / 100000) * 100000).cast("long")
    # total via a window over the banded aggregate (25-ish rows), not a
    # separate o.count() job (flagged r1)
    from pyspark.sql.window import Window

    banded = o.select(band.alias("band")).groupBy("band").agg(
        F.count("*").alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    return (
        banded.select(
            "band",
            "n",
            F.round(F.col("n") / total, 6).alias("share"),
        )
        .orderBy("band")
    )


SQL_ORDER_VALUE_DISTRIBUTION = """
SELECT CAST(floor(o_totalprice / 100000) * 100000 AS BIGINT) AS band,
       count(*) AS n,
       round(count(*) / (SELECT count(*)::DOUBLE FROM orders), 6) AS share
FROM orders
GROUP BY 1
ORDER BY band
"""


def q_unpivot_metrics(spark, sf_dir):
    """UNPIVOT (wide → long): per-nation supplier metrics melted into
    (nation, metric, value) rows — the reshape a profiling pipeline
    runs before generic per-metric aggregation.  Uses the native
    DataFrame.unpivot (Spark's melt)."""
    s = _t(spark, sf_dir, "supplier")
    wide = s.groupBy("s_nationkey").agg(
        F.count("*").cast("double").alias("n_suppliers"),
        F.round(F.avg("s_acctbal"), 4).alias("avg_bal"),
        F.round(F.max("s_acctbal"), 4).alias("max_bal"),
    )
    return (
        wide.unpivot(
            ids=["s_nationkey"],
            values=["n_suppliers", "avg_bal", "max_bal"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("s_nationkey", "metric")
    )


SQL_UNPIVOT_METRICS = """
WITH wide AS (
  SELECT s_nationkey,
         CAST(count(*) AS DOUBLE) AS n_suppliers,
         round(avg(s_acctbal), 4) AS avg_bal,
         round(max(s_acctbal), 4) AS max_bal
  FROM supplier GROUP BY s_nationkey
)
SELECT s_nationkey, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_suppliers, avg_bal, max_bal))
ORDER BY s_nationkey, metric
"""


def q_window_ranks(spark, sf_dir):
    """The remaining rank-family window functions in one pass:
    percent_rank / cume_dist / nth_value over per-nation customer
    balances (one shuffle on the partition key feeds all three)."""
    from pyspark.sql.window import Window

    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_custkey", 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("second_poorest"),
    ).orderBy("c_nationkey", "c_custkey")


SQL_WINDOW_RANKS = """
SELECT c_nationkey, c_custkey,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       nth_value(c_custkey, 2) OVER (
         PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_poorest
FROM customer
WHERE c_custkey <= 300
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
ORDER BY c_nationkey, c_custkey
"""


def q_json_struct_parse(spark, sf_dir):
    """Schema-full JSON parsing (`from_json` → typed struct → field
    access) — the structured path, vs json_events' schemaless
    get_json_object; malformed input yields NULL struct (PERMISSIVE),
    counted explicitly."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("p").isNull(), 1).otherwise(0)).alias(
                "n_unparsed"
            ),
            F.min("p.k").alias("min_k"),
            F.max("p.k").alias("max_k"),
            F.sum("p.k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


SQL_JSON_STRUCT_PARSE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unparsed,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM (
  SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


def q_bitwise_aggregates(spark, sf_dir):
    """Bitwise aggregate surface: bit_and / bit_or / bit_xor of order
    keys per status, plus scalar shiftleft/bitwise-& in the projection."""
    o = _t(spark, sf_dir, "orders")
    masked = o.select(
        "o_orderstatus",
        (F.col("o_orderkey").bitwiseAND(F.lit(0xFFFF))).alias("k16"),
        (F.shiftleft(F.col("o_custkey"), 1)).alias("ck2"),
    )
    return (
        masked.groupBy("o_orderstatus")
        .agg(
            F.bit_and("k16").alias("and_k"),
            F.bit_or("k16").alias("or_k"),
            F.bit_xor("k16").alias("xor_k"),
            F.sum("ck2").alias("sum_ck2"),
        )
        .orderBy("o_orderstatus")
    )


SQL_BITWISE = """
SELECT o_orderstatus,
       bit_and(k16) AS and_k,
       bit_or(k16) AS or_k,
       bit_xor(k16) AS xor_k,
       CAST(sum(ck2) AS BIGINT) AS sum_ck2
FROM (
  SELECT o_orderstatus,
         o_orderkey & 65535 AS k16,
         o_custkey << 1 AS ck2
  FROM orders
)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q_map_functions(spark, sf_dir):
    """MAP-typed surface: per customer nation, build a
    status→order-count MAP in-plan (collect_list of structs →
    map_from_entries), then interrogate it with map_keys /
    element_at / size.  Output is scalar columns so the oracle stays
    engine-neutral (map rendering differs between engines; map
    SEMANTICS don't)."""
    o = _t(spark, sf_dir, "orders")
    per_status = (
        o.groupBy(F.pmod("o_custkey", F.lit(10)).alias("cust_band"),
                  "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    mapped = (
        per_status.groupBy("cust_band")
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct("o_orderstatus", "n"))
                )
            ).alias("m")
        )
    )
    return mapped.select(
        "cust_band",
        F.size("m").alias("n_statuses"),
        F.coalesce(F.element_at("m", "O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.element_at("m", "F"), F.lit(0)).alias("n_finished"),
        F.coalesce(F.element_at("m", "P"), F.lit(0)).alias("n_pending"),
        F.array_join(F.map_keys("m"), ",").alias("statuses"),
    ).orderBy("cust_band")


SQL_MAP_FUNCTIONS = """
SELECT o_custkey % 10 AS cust_band,
       count(DISTINCT o_orderstatus) AS n_statuses,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_open,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_finished,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pending,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
           AS statuses
FROM orders
GROUP BY 1
ORDER BY cust_band
"""


def q_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT type over semi-structured JSON: parse_json →
    binary variant → typed path extraction (variant_get) + missing-path
    safety (try_variant_get).  VARIANT is the engine-native way to scan
    heterogeneous JSON at scale — the shredded binary encoding avoids
    re-parsing the JSON text per field access (one parse, N typed
    gets), unlike get_json_object chains."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ex = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.absent", "bigint").alias("absent"),
    )
    return (
        ex.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("absent").isNull().cast("long")).alias("n_absent"),
        )
        .orderBy("event_type")
    )


SQL_VARIANT_EXTRACT = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       count(*) AS n_absent
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "large_orders": q_large_orders,
    "top_revenue_suppliers": q_top_revenue_suppliers,
    "idle_rich_customers": q_idle_rich_customers,
    "order_value_distribution": q_order_value_distribution,
    "unpivot_metrics": q_unpivot_metrics,
    "window_ranks": q_window_ranks,
    "map_functions": q_map_functions,
    "json_struct_parse": q_json_struct_parse,
    "bitwise_aggregates": q_bitwise_aggregates,
    "variant_extract": q_variant_extract,
}

ORACLE = {
    "large_orders": SQL_LARGE_ORDERS,
    "top_revenue_suppliers": SQL_TOP_REVENUE_SUPPLIERS,
    "idle_rich_customers": SQL_IDLE_RICH,
    "order_value_distribution": SQL_ORDER_VALUE_DISTRIBUTION,
    "unpivot_metrics": SQL_UNPIVOT_METRICS,
    "window_ranks": SQL_WINDOW_RANKS,
    "map_functions": SQL_MAP_FUNCTIONS,
    "json_struct_parse": SQL_JSON_STRUCT_PARSE,
    "bitwise_aggregates": SQL_BITWISE,
    "variant_extract": SQL_VARIANT_EXTRACT,
}
