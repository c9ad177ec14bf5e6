"""Event-analytics registry queries (operators/funnel.py) with DuckDB
oracle twins: ordered funnel reach and weekly cohort retention over the
events table.

Engine-added family — the reference (five Kafka scripts; SURVEY.md §2) has
no analytics surface. Both oracles replicate the chained-conditional-window
formulation in ANSI SQL, so the family is fully hash-verified."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
       CAST((epoch(date_trunc('week', ts)) - epoch(cohort_week)) / 604800
            AS BIGINT) AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM c
GROUP BY 1, 2
"""
