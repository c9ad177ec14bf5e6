"""Event-analytics registry queries (operators/funnel.py) with DuckDB
oracle twins: ordered funnel reach and weekly cohort retention over the
events table.

Engine-added family — the reference (five Kafka scripts; SURVEY.md §2) has
no analytics surface. Both oracles replicate the chained-conditional-window
formulation in ANSI SQL, so the family is fully hash-verified."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.funnel import cohort_retention, funnel_reach
from pyspark_etl_twitter_spark.session import pin_oracle_confs
from pyspark_etl_twitter_spark.sources.catalog import load_table

FUNNEL_STEPS = ("view", "click", "purchase")


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_oracle_confs(spark)
    return load_table(spark, sf_dir, "events")


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase ordered funnel: one events shuffle total
    (chained conditional window mins share the user_id partitioning)."""
    return funnel_reach(_ev(spark, sf_dir), FUNNEL_STEPS)


ORACLE_FUNNEL_VIEW_CLICK_PURCHASE = """
WITH s0 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t0
  FROM events
), s1 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t0 THEN ts END)
              OVER (PARTITION BY user_id) AS t1
  FROM s0
), s2 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM s1
), per_user AS (
  SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
  FROM s2 GROUP BY user_id
), counts AS (
  SELECT count(t0) AS n0, count(t1) AS n1, count(t2) AS n2 FROM per_user
)
SELECT 0 AS step_index, 'view' AS step, n0 AS n_users FROM counts
UNION ALL SELECT 1, 'click', n1 FROM counts
UNION ALL SELECT 2, 'purchase', n2 FROM counts
"""


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle over events (cohort = first-seen
    week; two exchanges: user_id window + (cohort, offset) aggregate)."""
    return cohort_retention(_ev(spark, sf_dir))


ORACLE_COHORT_RETENTION_WEEKLY = """
WITH c AS (
  SELECT user_id, ts,
         date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cohort_week
  FROM events
)
SELECT CAST(cohort_week AS DATE) AS cohort_week,
       CAST(floor(date_diff('day', CAST(cohort_week AS DATE),
                            CAST(date_trunc('week', ts) AS DATE)) / 7.0)
            AS BIGINT) AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM c
GROUP BY 1, 2
"""


def session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized conversion: of all user sessions (30-min gap rule, the
    sessionize operator), how many contain a purchase — per event-volume
    band of the session. Composes sessionization with conditional
    aggregation; one user_id exchange for the windows, one tiny band
    aggregate."""
    from pyspark_etl_twitter_spark.plans.relational import sessionize

    ev = _ev(spark, sf_dir)
    labeled = sessionize(ev)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("pts"))
    )
    conv = labeled.join(
        purchases,
        (labeled.user_id == purchases.user_id)
        & (F.col("pts") >= F.col("session_start"))
        & (F.col("pts") <= F.col("session_end")),
        "left_semi",
    )
    band = F.when(F.col("n_events") == 1, "single").when(
        F.col("n_events") == 2, "double"
    ).otherwise("multi")
    total = labeled.groupBy(band.alias("session_band")).agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    converted = conv.groupBy(band.alias("session_band")).agg(
        F.count(F.lit(1)).alias("n_converted")
    )
    return total.join(converted, "session_band", "left").select(
        "session_band",
        "n_sessions",
        F.coalesce("n_converted", F.lit(0)).alias("n_converted"),
    )


ORACLE_SESSION_CONVERSION_RATE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_type,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
), sessions AS (
  SELECT user_id, session_id, count(*) AS n_events,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
              AS INTEGER) AS converted
  FROM numbered GROUP BY user_id, session_id
)
SELECT CASE WHEN n_events = 1 THEN 'single'
            WHEN n_events = 2 THEN 'double'
            ELSE 'multi' END AS session_band,
       count(*) AS n_sessions,
       CAST(sum(converted) AS BIGINT) AS n_converted
FROM sessions
GROUP BY 1
"""
