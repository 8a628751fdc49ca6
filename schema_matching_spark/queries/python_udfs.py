"""Python UDF surface demonstrations, each oracle-checked (SURVEY.md
§2.C "UDF / UDAF / UDTF surface"; input_hint mandate: pandas/Arrow
only, no per-row Python).

* grouped-aggregate ``pandas_udf`` (vectorized UDAF over Arrow batches)
* grouped-map ``applyInPandas`` (per-group numpy transform)
* Python UDTF (table function) — the one row-expanding Python surface,
  used off the hot path by design

Each has a plain-SQL DuckDB oracle, so the Python implementations are
verified against relational semantics, not just smoke-tested.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_pandas_udaf_weighted(spark, sf_dir):
    """Grouped-agg pandas_udf: quantity-weighted average extended price
    per return flag — one Arrow batch per group partition, numpy math,
    no per-row Python."""

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    @pandas_udf("long")
    def n_rows(qty: pd.Series) -> int:
        # pandas grouped-agg UDFs cannot mix with JVM aggregates in one
        # agg() (INVALID_PANDAS_UDF_PLACEMENT) — count is a UDAF too
        return int(len(qty))

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_avg(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("w_avg_price"),
            n_rows(F.col("l_quantity")).alias("n"),
        )
        .orderBy("l_returnflag")
    )


SQL_PANDAS_UDAF = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
           AS w_avg_price,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_grouped_map_zscore(spark, sf_dir):
    """Grouped-map applyInPandas: z-score customer balances within each
    nation (vectorized per-group numpy), then aggregate the extremes —
    the 'custom per-group transform Spark lacks' pattern."""
    cust = _t(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        pdf = pdf.assign(z=(pdf["c_acctbal"] - mu) / sd if sd > 0 else 0.0)
        return pdf[["c_nationkey", "c_custkey", "z"]]

    scored = cust.groupBy("c_nationkey").applyInPandas(
        zscore, schema="c_nationkey int, c_custkey long, z double"
    )
    return (
        scored.groupBy("c_nationkey")
        .agg(
            # + 0.0 normalizes IEEE signed zero: mean-centered aggregates
            # round to ±0.0 depending on summation order, and -0.0 vs 0.0
            # renders differently in the driver's value hash
            (F.round(F.max("z"), 4) + F.lit(0.0)).alias("max_z"),
            (F.round(F.min("z"), 4) + F.lit(0.0)).alias("min_z"),
            (F.round(F.avg("z"), 4) + F.lit(0.0)).alias("mean_z"),
            F.count("*").alias("n"),
        )
        .orderBy("c_nationkey")
    )


SQL_GROUPED_MAP_ZSCORE = """
WITH scored AS (
  SELECT c_nationkey,
         (c_acctbal - avg(c_acctbal) OVER w) / stddev_samp(c_acctbal) OVER w AS z
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey)
)
SELECT c_nationkey,
       round(max(z), 4) + 0.0 AS max_z,
       round(min(z), 4) + 0.0 AS min_z,
       round(avg(z), 4) + 0.0 AS mean_z,
       count(*) AS n
FROM scored
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q_udtf_bigrams(spark, sf_dir):
    """Python UDTF: expand each document into word-bigram rows, then
    count the globally most frequent bigrams.  UDTFs are the
    off-hot-path Python surface (per-row fan-out); the relational
    reduction around them stays JVM-side."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            # split(" ") (not split()) — keeps empty tokens exactly like
            # the oracle's regexp_split_to_array(text, ' ')
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                yield (f"{a} {b}",)

    spark.udtf.register("doc_bigrams", Bigrams)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT b.bigram, count(*) AS n
        FROM _udtf_docs d, LATERAL doc_bigrams(d.text) b
        GROUP BY b.bigram
        HAVING count(*) >= 20
        ORDER BY n DESC, bigram
        LIMIT 50
        """
    )


SQL_UDTF_BIGRAMS = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS t FROM documents
), bigrams AS (
  SELECT t[CAST(u AS INT)] || ' ' || t[CAST(u AS INT) + 1] AS bigram
  FROM (SELECT t, unnest(range(1, len(t))) AS u FROM toks)
)
SELECT bigram, count(*) AS n
FROM bigrams
GROUP BY bigram
HAVING count(*) >= 20
ORDER BY n DESC, bigram
LIMIT 50
"""


def q_cogrouped_asof(spark, sf_dir):
    """Co-grouped applyInPandas (``groupBy().cogroup(...)``): the
    two-sided Arrow surface — per customer-key, a pandas ``merge_asof``
    aligns each order to the most recent event of the same key bucket.
    This is the canonical custom-op shape Spark lacks natively (keyed
    as-of between two frames) done the input_hint way: both sides
    arrive as pandas frames per key, vectorized merge, no per-row
    Python.  Oracle: correlated max-under-bound subquery."""
    ev = _t(spark, sf_dir, "events").select(
        F.pmod("user_id", F.lit(50)).alias("k"),
        F.col("ts").cast("timestamp").alias("ets"),
        "event_id",
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.pmod("o_custkey", F.lit(50)).alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("ots"),
        "o_orderkey",
    )

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["k", "o_orderkey", "last_event_id"]
            ).astype({"k": "int64", "o_orderkey": "int64", "last_event_id": "float64"})
        left = left.sort_values("ots", kind="mergesort")
        # secondary event_id sort: merge_asof takes the LAST row at
        # equal ts, so this pins ties to max event_id (oracle mirrors)
        right = right.sort_values(["ets", "event_id"], kind="mergesort")
        m = pd.merge_asof(
            left,
            right[["ets", "event_id"]],
            left_on="ots",
            right_on="ets",
            direction="backward",
        )
        return m[["k", "o_orderkey"]].assign(last_event_id=m["event_id"])

    out = (
        ev.groupBy("k")
        .cogroup(orders.groupBy("k"))
        .applyInPandas(
            lambda ev_pdf, o_pdf: asof(o_pdf, ev_pdf),
            schema="k int, o_orderkey long, last_event_id double",
        )
    )
    return (
        out.groupBy()
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("last_event_id").isNull(), 1).otherwise(0)).alias(
                "n_no_event"
            ),
            F.sum(F.col("last_event_id").cast("long")).alias("event_id_sum"),
        )
    )


SQL_COGROUPED_ASOF = """
WITH e AS (SELECT user_id % 50 AS k, ts, event_id FROM events),
     o AS (SELECT o_custkey % 50 AS k, CAST(o_orderdate AS TIMESTAMP) AS ots,
                  o_orderkey FROM orders),
     j AS (
       SELECT o.o_orderkey,
              (SELECT event_id FROM e
               WHERE e.k = o.k AND e.ts <= o.ots
               ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS last_event_id
       FROM o
     )
SELECT count(*) AS n_orders,
       CAST(sum(CASE WHEN last_event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_no_event,
       CAST(sum(last_event_id) AS BIGINT) AS event_id_sum
FROM j
"""


QUERIES = {
    "pandas_udaf_weighted": q_pandas_udaf_weighted,
    "grouped_map_zscore": q_grouped_map_zscore,
    "udtf_bigrams": q_udtf_bigrams,
    "cogrouped_asof": q_cogrouped_asof,
}

ORACLE = {
    "pandas_udaf_weighted": SQL_PANDAS_UDAF,
    "grouped_map_zscore": SQL_GROUPED_MAP_ZSCORE,
    "udtf_bigrams": SQL_UDTF_BIGRAMS,
    "cogrouped_asof": SQL_COGROUPED_ASOF,
}
