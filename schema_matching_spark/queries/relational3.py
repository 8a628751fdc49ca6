"""Third relational query-pack module: session windows, string-distance
functions, array higher-order ops (SURVEY.md §2.C)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_session_windows(spark, sf_dir):
    """Per-user session windows (30-minute inactivity gap) — the batch
    shape of Structured Streaming's session_window; expressed with the
    native session_window operator.  DuckDB oracle uses the classic
    gaps-and-islands formulation, which is semantically identical."""
    e = _t(spark, sf_dir, "events")
    sessions = e.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("total_events"),
        )
        .orderBy("user_id")
    )


SQL_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM islands GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       max(n_events) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS total_events
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


def q_string_distance(spark, sf_dir):
    """levenshtein + soundex-free string similarity over part names."""
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 100)
    a = p.select(
        F.col("p_partkey").alias("k_a"), F.col("p_name").alias("name_a")
    )
    b = p.select(
        (F.col("p_partkey") - 1).alias("k_a"), F.col("p_name").alias("name_b")
    )
    return (
        a.join(b, "k_a")
        .select(
            "k_a",
            F.levenshtein("name_a", "name_b").alias("lev"),
            F.length("name_a").alias("len_a"),
        )
        .orderBy("k_a")
    )


SQL_STRING_DISTANCE = """
SELECT a.p_partkey AS k_a,
       levenshtein(a.p_name, b.p_name) AS lev,
       length(a.p_name) AS len_a
FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
WHERE a.p_partkey <= 100 AND b.p_partkey <= 100
ORDER BY k_a
"""


def q_array_ops(spark, sf_dir):
    """Array surface over embeddings: slice, element_at, sort, filter,
    higher-order transform."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    v = F.transform("embedding", lambda x: F.round(x.cast("double"), 4))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(v, 1), 4).alias("first_c"),
        F.round(F.array_max(v), 4).alias("max_c"),
        F.round(F.array_min(v), 4).alias("min_c"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("sum_first8"),
    ).orderBy("vec_id")


SQL_ARRAY_OPS = """
SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 4) AS first_c,
       round(list_max([round(CAST(x AS DOUBLE), 4) for x in embedding]), 4) AS max_c,
       round(list_min([round(CAST(x AS DOUBLE), 4) for x in embedding]), 4) AS min_c,
       len(list_filter([round(CAST(x AS DOUBLE), 4) for x in embedding],
           x -> x > 0)) AS n_positive,
       round(list_sum([round(CAST(x AS DOUBLE), 4) for x in embedding[1:8]]), 4)
           AS sum_first8
FROM embeddings
WHERE vec_id < 50
ORDER BY vec_id
"""


QUERIES = {
    "session_windows": q_session_windows,
    "string_distance": q_string_distance,
    "array_ops": q_array_ops,
}

ORACLE = {
    "session_windows": SQL_SESSIONS,
    "string_distance": SQL_STRING_DISTANCE,
    "array_ops": SQL_ARRAY_OPS,
}
