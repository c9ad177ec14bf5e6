"""Second relational pack: scalar math, array functions, percentiles,
subquery patterns, ALL-variant set ops, null-handling conditionals.
Same conventions as relational.py (UTC pinned, floats rounded on both
sides, total orders everywhere)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import pin_oracle_confs
from pyspark_etl_twitter_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_oracle_confs(spark)
    return load_table(spark, sf_dir, name)


def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(price - 50000.0), 4).alias("abs_centered"),
        F.ceil(price).alias("price_ceil"),
        F.floor(price).alias("price_floor"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price + 1.0), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


ORACLE_MATH_FUNCS_LINEITEM = """
SELECT l_orderkey, l_linenumber,
       round(abs(l_extendedprice - 50000.0), 4)   AS abs_centered,
       CAST(ceil(l_extendedprice) AS BIGINT)      AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT)     AS price_floor,
       round(sqrt(l_extendedprice), 6)            AS price_sqrt,
       round(ln(l_extendedprice + 1.0), 6)        AS price_ln,
       round(pow(l_discount, 2), 6)               AS disc_sq,
       CAST(l_quantity AS BIGINT) % 7             AS qty_mod7
FROM lineitem
"""


def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). The exact form needs a per-group sort — use
    ``approx_percentile`` (see approx_summary) when 100 TB group sizes make
    that a memory hazard."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
    )


ORACLE_PERCENTILE_PRICES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6)  AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem GROUP BY l_returnflag
"""


def array_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("first3"),
        F.array_contains(toks, "table").alias("mentions_table"),
        F.concat_ws(" ", F.slice(F.sort_array(toks), 1, 2)).alias("min2_sorted"),
        F.element_at(toks, -1).alias("last_token"),
    )


ORACLE_ARRAY_FUNCS_DOCUMENTS = """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents)
SELECT doc_id,
       CAST(len(list_distinct(toks)) AS INTEGER)        AS n_distinct_tokens,
       array_to_string(toks[1:3], ' ')                  AS first3,
       list_contains(toks, 'table')                     AS mentions_table,
       array_to_string(list_sort(toks)[1:2], ' ')       AS min2_sorted,
       toks[-1]                                         AS last_token
FROM base
"""


def orders_with_many_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING on a join-aggregate (correlated-EXISTS-with-count pattern)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") >= 5)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_orderkey"), F.col("n_items"), F.round("o_totalprice", 4).alias("price"))
    )


ORACLE_ORDERS_WITH_MANY_ITEMS = """
SELECT o_orderkey, n_items, round(o_totalprice, 4) AS price
FROM orders
JOIN (SELECT l_orderkey, count(*) AS n_items FROM lineitem
      GROUP BY l_orderkey HAVING count(*) >= 5) t
  ON l_orderkey = o_orderkey
"""


def orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: compare each row to a global aggregate.
    The aggregate is a 1-row DataFrame broadcast into a cross join — no
    driver-side collect, works at any scale."""
    orders = _t(spark, sf_dir, "orders")
    avg_df = orders.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", F.round("o_totalprice", 4).alias("price"))
    )


ORACLE_ORDERS_ABOVE_AVG = """
SELECT o_orderkey, round(o_totalprice, 4) AS price
FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
"""


def intersect_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (duplicate-preserving)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_quantity").alias("qty"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_quantity").alias("qty"))
    return a.intersectAll(b)


ORACLE_INTERSECT_ALL_QUANTITIES = """
SELECT l_quantity AS qty FROM lineitem WHERE l_returnflag = 'A'
INTERSECT ALL
SELECT l_quantity AS qty FROM lineitem WHERE l_returnflag = 'R'
"""


def except_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_quantity").alias("qty"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_quantity").alias("qty"))
    return a.exceptAll(b)


ORACLE_EXCEPT_ALL_QUANTITIES = """
SELECT l_quantity AS qty FROM lineitem WHERE l_returnflag = 'A'
EXCEPT ALL
SELECT l_quantity AS qty FROM lineitem WHERE l_returnflag = 'R'
"""


def union_by_name_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName across differently-ordered projections (dup-preserving)."""
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    a = cust.select(
        F.col("c_acctbal").alias("acctbal"), F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
    )
    b = sup.select(
        F.lit("supplier").alias("kind"), F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return a.unionByName(b).select("kind", "name", F.round("acctbal", 4).alias("acctbal"))


ORACLE_UNION_BY_NAME_ACCOUNTS = """
SELECT kind, name, round(acctbal, 4) AS acctbal FROM (
  SELECT 'customer' AS kind, c_name AS name, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_name AS name, s_acctbal AS acctbal FROM supplier)
"""


def null_conditionals_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("~none~")).alias(
            "seg_or_none"
        ),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1000"),
        F.when(bal < 0, "overdrawn").when(bal < 5000, "normal").otherwise("rich").alias("bal_band"),
    )


ORACLE_NULL_CONDITIONALS_CUSTOMER = """
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '~none~') AS seg_or_none,
       greatest(c_acctbal, 0.0)  AS bal_floor0,
       least(c_acctbal, 1000.0)  AS bal_cap1000,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 5000 THEN 'normal'
            ELSE 'rich' END AS bal_band
FROM customer
"""


def window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking-function family over one window spec: rank/dense_rank/
    percent_rank/ntile/lag-default — one shuffle on the partition key."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderstatus",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.lag("o_totalprice", 1, 0.0).over(w), 4).alias("prev_price"),
    ).filter(F.col("rnk") <= 50)


ORACLE_WINDOW_RANK_STATS = """
SELECT * FROM (
  SELECT o_orderstatus, o_orderkey,
         rank()         OVER w AS rnk,
         dense_rank()   OVER w AS drnk,
         round(percent_rank() OVER w, 6) AS prnk,
         CAST(ntile(4) OVER w AS INTEGER) AS quartile,
         round(lag(o_totalprice, 1, 0.0) OVER w, 4) AS prev_price
  FROM orders
  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey))
WHERE rnk <= 50
"""


def date_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic across the orders⋈lineitem shuffle join: ship delay
    stats per status."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.avg(delay), 6).alias("avg_ship_delay_days"),
            F.max(delay).alias("max_ship_delay_days"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_DATE_ARITHMETIC_ORDERS = """
SELECT o_orderstatus,
       round(avg(CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) AS DOUBLE)), 6)
         AS avg_ship_delay_days,
       CAST(max(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(l_shipdate AS DATE))) AS INTEGER)
         AS max_ship_delay_days,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: parse the props JSON into map<string,int>, then
    explode entries — the generic path for semi-structured key spaces
    (vs get_json_object for known keys)."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    entry = F.explode(m)
    return (
        ev.select("event_type", entry.alias("k", "v"))
        .groupBy("event_type", "k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


ORACLE_MAP_FUNCS_EVENTS = """
WITH kv AS (
  SELECT event_type, unnest(json_keys(props)) AS k, props FROM events
)
SELECT event_type, k, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.' || k) AS INTEGER))
            AS BIGINT) AS sum_v,
       CAST(min(CAST(json_extract_string(props, '$.' || k) AS INTEGER))
            AS INTEGER) AS min_v,
       CAST(max(CAST(json_extract_string(props, '$.' || k) AS INTEGER))
            AS INTEGER) AS max_v
FROM kv GROUP BY event_type, k
"""


def regex_extract_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group extraction: first word and trailing digits (if any)
    of part names — regexp_extract with group indices."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", r"(\d+)$", 1).alias("brand_num"),
        F.regexp_extract("p_type", r"^(\w+)\s+(\w+)", 2).alias("second_type_word"),
    )


ORACLE_REGEX_EXTRACT_PART = r"""
SELECT p_partkey,
       coalesce(regexp_extract(p_name, '^(\w+)', 1), '') AS first_word,
       coalesce(regexp_extract(p_brand, '(\d+)$', 1), '') AS brand_num,
       coalesce(regexp_extract(p_type, '^(\w+)\s+(\w+)', 2), '') AS second_type_word
FROM part
"""


def data_quality_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass expectation report over the fact table (pre-flight gate)."""
    from pyspark_etl_twitter_spark.operators.quality_checks import data_quality_report

    li = _t(spark, sf_dir, "lineitem")
    return data_quality_report(
        li,
        not_null=["l_orderkey", "l_shipdate"],
        unique=["l_orderkey"],
        ranges={"l_discount": (0.0, 0.1), "l_quantity": (1.0, 50.0)},
    )


ORACLE_DATA_QUALITY_LINEITEM = """
SELECT count(*) AS n_rows,
       count(CASE WHEN l_orderkey IS NULL THEN 1 END)  AS null_l_orderkey,
       count(CASE WHEN l_shipdate IS NULL THEN 1 END)  AS null_l_shipdate,
       CAST(count(*) - count(DISTINCT l_orderkey) AS BIGINT) AS dup_l_orderkey,
       count(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 END)
         AS oob_l_discount,
       count(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 END)
         AS oob_l_quantity
FROM lineitem
"""


def approx_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates (HLL++ distinct, t-digest-style percentile).
    No oracle: sketch implementations differ across engines by design —
    accuracy is property-tested against the exact queries instead
    (tests/test_relational_props.py)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.round(F.expr("approx_percentile(l_extendedprice, 0.5)"), 4).alias("approx_p50"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def customers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (compare each row to ITS group's
    aggregate), decorrelated the way Catalyst would: group-aggregate the
    correlation key, broadcast the tiny per-nation averages back, filter.
    No per-row subquery execution at any scale."""
    cust = _t(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("nat_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nat_avg"))
        .select(
            "c_custkey", "c_nationkey", F.round("c_acctbal", 4).alias("acctbal")
        )
    )


ORACLE_CUSTOMERS_ABOVE_NATION_AVG = """
SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS acctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
"""


def salted_join_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue through the explicit salted join (operators/skew.py):
    the dim side replicated per salt, fact rows salted randomly, join on
    (key, salt) — every hot part key spreads across n_salts reducers. The
    salt must not change the ANSWER; this query pins that against the
    plain-join oracle."""
    from pyspark_etl_twitter_spark.operators.skew import salted_broadcast_left

    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_broadcast_left(li, part, "p_partkey", how="inner")
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("p_brand")
    )


ORACLE_SALTED_JOIN_BRAND_REVENUE = """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand
"""


def stats_aggregates_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate pack: per-returnflag sample stddev, Pearson
    correlation, and discounted-share mean. Rounding is magnitude-aware
    (DESIGN.md §5): corr is in [-1,1] → 6dp; stddev(qty) ~1e1 → 6dp;
    stddev(price) ~3e4 → 2dp — both engines run numerically stable
    one-pass moment algorithms that agree far below these scales."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("stddev_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
    )


ORACLE_STATS_AGGREGATES_LINEITEM = """
SELECT l_returnflag,
       count(*) AS n_rows,
       round(stddev_samp(l_quantity), 6) AS stddev_qty,
       round(stddev_samp(l_extendedprice), 2) AS stddev_price,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(avg(l_discount), 6) AS avg_discount
FROM lineitem
GROUP BY l_returnflag
"""


def null_safe_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): a nullable
    derived key joined against its own distinct dimension — the NULL dim
    row must match the NULL fact rows, which a plain equi-join silently
    drops. Completes the join-semantics surface (SURVEY.md §2.3)."""
    cust = _t(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    )
    dim = cust.select(F.col("seg").alias("dim_seg")).distinct()
    return (
        cust.join(F.broadcast(dim), F.expr("seg <=> dim_seg"))
        .groupBy("dim_seg")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORACLE_NULL_SAFE_JOIN_SEGMENTS = """
WITH c AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg FROM customer),
d AS (SELECT DISTINCT seg AS dim_seg FROM c)
SELECT dim_seg, count(*) AS n_customers
FROM c JOIN d ON c.seg IS NOT DISTINCT FROM d.dim_seg
GROUP BY dim_seg
"""


def minmax_by_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selector-aggregate pack: max_by/min_by (argmax/argmin without a
    window or self-join — one hash aggregate carries the (key, value)
    pair) plus count_if. Per order priority: which order carries the
    max/min total price, and how many high-value orders exist. Tie-safe:
    o_totalprice has duplicates, so selectors pick among ties by max/min
    orderkey via a packed struct comparison."""
    orders = _t(spark, sf_dir, "orders")
    # pack (price-cents, orderkey) into one BIGINT so ties resolve
    # deterministically on both engines (DuckDB's arg_max rejects struct
    # keys): cents*1e10 + orderkey, exact for orderkeys < 1e10
    key = F.expr(
        "cast(round(o_totalprice * 100) as bigint) * 10000000000 + o_orderkey"
    )
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("max_price_orderkey"),
        F.min_by("o_orderkey", key).alias("min_price_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.count_if(F.col("o_totalprice") > 300000).alias("n_high_value"),
        F.count(F.lit(1)).alias("n_orders"),
    )


ORACLE_MINMAX_BY_ORDERS = """
SELECT o_orderpriority,
       arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey) AS max_price_orderkey,
       arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey) AS min_price_orderkey,
       round(max(o_totalprice), 2) AS max_price,
       count(*) FILTER (WHERE o_totalprice > 300000) AS n_high_value,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


def stratified_exact_n_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling: rank docs within each source by a
    deterministic md5 order and keep the first 10 — the fixed-quota
    variant of training_mix (rate-based). One window over the stratum
    partitioning; selection is stable for a given corpus (adding docs can
    change ranks, unlike the rate-based variant — use training_mix for
    incremental stability, this for exact quotas)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("strat-v1"))),
        "doc_id",
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


ORACLE_STRATIFIED_EXACT_N_DOCS = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat-v1'), doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= 10
GROUP BY source
"""


def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile (the data-engineering 'describe table'
    that drives partition/broadcast planning): per column null count,
    exact distinct count, and range — computed in a SINGLE aggregate scan
    (Catalyst expands the distincts via one Expand node), then unpivoted
    to (column, metric rows) for a stable narrow schema."""
    orders = _t(spark, sf_dir, "orders")
    prof = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)).alias(
            "nulls_priority"
        ),
        F.countDistinct("o_orderpriority").alias("nd_priority"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return prof.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("metric"), F.col(m).cast("double").alias("value")
                    )
                    for m in [
                        "n_rows",
                        "nulls_priority",
                        "nd_priority",
                        "nd_status",
                        "nd_custkey",
                        "min_price",
                        "max_price",
                    ]
                ]
            )
        ).alias("s")
    ).select("s.metric", "s.value")


ORACLE_PROFILE_ORDERS_COLUMNS = """
WITH prof AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_rows,
         CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           AS nulls_priority,
         CAST(count(DISTINCT o_orderpriority) AS DOUBLE) AS nd_priority,
         CAST(count(DISTINCT o_orderstatus) AS DOUBLE) AS nd_status,
         CAST(count(DISTINCT o_custkey) AS DOUBLE) AS nd_custkey,
         round(min(o_totalprice), 2) AS min_price,
         round(max(o_totalprice), 2) AS max_price
  FROM orders
)
SELECT 'n_rows' AS metric, n_rows AS value FROM prof
UNION ALL SELECT 'nulls_priority', nulls_priority FROM prof
UNION ALL SELECT 'nd_priority', nd_priority FROM prof
UNION ALL SELECT 'nd_status', nd_status FROM prof
UNION ALL SELECT 'nd_custkey', nd_custkey FROM prof
UNION ALL SELECT 'min_price', min_price FROM prof
UNION ALL SELECT 'max_price', max_price FROM prof
"""


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan counts for every
    FK edge of the star (lineitem→orders/part/supplier, orders→customer)
    as left-anti probes in one result row. Each anti-join broadcasts the
    key side when small or shuffles on the key — either way the audit
    never materializes matched rows, only counts misses."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")

    def orphans(fact, key, dim, dim_key):
        return (
            fact.select(F.col(key))
            .join(dim.select(F.col(dim_key).alias(key)), key, "left_anti")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    a = orphans(li, "l_orderkey", orders, "o_orderkey").select(
        F.col("n").alias("li_orphan_orders")
    )
    b = orphans(li, "l_partkey", part, "p_partkey").select(
        F.col("n").alias("li_orphan_parts")
    )
    c = orphans(li, "l_suppkey", supp, "s_suppkey").select(
        F.col("n").alias("li_orphan_supps")
    )
    d = orphans(orders, "o_custkey", cust, "c_custkey").select(
        F.col("n").alias("ord_orphan_custs")
    )
    return a.crossJoin(b).crossJoin(c).crossJoin(d)


ORACLE_REFERENTIAL_INTEGRITY_AUDIT = """
SELECT
  (SELECT count(*) FROM lineitem l
     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE l.l_orderkey = o.o_orderkey))
    AS li_orphan_orders,
  (SELECT count(*) FROM lineitem l
     WHERE NOT EXISTS (SELECT 1 FROM part p WHERE l.l_partkey = p.p_partkey))
    AS li_orphan_parts,
  (SELECT count(*) FROM lineitem l
     WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE l.l_suppkey = s.s_suppkey))
    AS li_orphan_supps,
  (SELECT count(*) FROM orders o
     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE o.o_custkey = c.c_custkey))
    AS ord_orphan_custs
"""


def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue: aggregate first (orders → weekly cents,
    exact bigint), THEN window over the tiny aggregate output — the
    window's single partition holds one row per week, so the
    'no-partition window' warning that matters on fact tables is
    irrelevant here (≤ a few hundred rows at any scale). WoW delta in
    exact per-mille (integer div on cents) keeps the hash cross-engine
    stable."""
    orders = _t(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week")
    ).agg(
        F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)")).alias("_cents")
    )
    w = Window.orderBy("week")
    prev = F.lag("_cents").over(w)
    return weekly.select(
        "week",
        (F.col("_cents") / F.lit(100.0)).alias("revenue"),
        # floor (not cast) on both sides: Spark's bigint cast truncates
        # toward zero while DuckDB's rounds — floor agrees everywhere
        F.when(
            prev.isNotNull(),
            F.floor(((F.col("_cents") - prev) * 1000) / prev),
        )
        .cast("bigint")
        .alias("wow_permille"),
    )


ORACLE_WEEKLY_REVENUE_WOW = """
WITH weekly AS (
  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
)
SELECT week,
       cents / 100.0 AS revenue,
       CASE WHEN lag(cents) OVER (ORDER BY week) IS NOT NULL
            THEN CAST(floor(((cents - lag(cents) OVER (ORDER BY week)) * 1000)
                            / lag(cents) OVER (ORDER BY week)) AS BIGINT)
       END AS wow_permille
FROM weekly
"""


def hof_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function pack over token arrays: exists / forall /
    filter+size / aggregate (fold) — all lambda expressions evaluated
    JVM-side inside codegen, zero Python. Complements
    array_funcs_documents (slice/sort/contains pack)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    toks = F.filter(toks, lambda t: t != "")
    return docs.select(
        "doc_id",
        F.exists(toks, lambda t: F.length(t) > 8).alias("has_long_token"),
        F.forall(toks, lambda t: F.length(t) < 20).alias("all_short"),
        F.size(F.filter(toks, lambda t: F.length(t) >= 5)).alias("n_5plus"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
    )


ORACLE_HOF_FUNCS_DOCUMENTS = """
SELECT doc_id,
       len(list_filter(toks, t -> length(t) > 8)) > 0 AS has_long_token,
       len(list_filter(toks, t -> length(t) >= 20)) = 0 AS all_short,
       CAST(len(list_filter(toks, t -> length(t) >= 5)) AS INTEGER) AS n_5plus,
       CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT)
         AS total_chars
FROM (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
)
"""


def snapshot_diff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation demo on deterministic synthetic drift: the
    'new' snapshot drops ~2% of orders (md5 bucket) and bumps ~2% of
    prices. One full-outer join on the key with 32-byte fingerprints —
    row width never shuffles (operators/scd2.snapshot_diff)."""
    from pyspark_etl_twitter_spark.operators.scd2 import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    bkt = F.conv(
        F.substring(F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":snap"))), 1, 8),
        16,
        10,
    ).cast("long") % 100
    new = (
        orders.withColumn("_b", bkt)
        .filter(F.col("_b") >= 2)  # drop 2%
        .withColumn(
            "o_totalprice",
            F.when(F.col("_b") < 4, F.round(F.col("o_totalprice") + 1.0, 2)).otherwise(
                F.col("o_totalprice")
            ),
        )
        .drop("_b")
    )
    diff = snapshot_diff(
        orders, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n_keys"))


ORACLE_SNAPSHOT_DIFF_COUNTS = """
WITH bkt AS (
  SELECT *, CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':snap'), 1, 8)) AS BIGINT) % 100 AS b
  FROM orders
),
new_snap AS (
  SELECT o_orderkey,
         CASE WHEN b < 4 THEN round(o_totalprice + 1.0, 2) ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM bkt WHERE b >= 2
),
o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
j AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
         o.o_orderkey IS NULL AS is_added,
         n.o_orderkey IS NULL AS is_removed,
         o.o_totalprice IS DISTINCT FROM n.o_totalprice
           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus AS is_changed
  FROM o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
)
SELECT CASE WHEN is_added THEN 'added'
            WHEN is_removed THEN 'removed'
            WHEN is_changed THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       count(*) AS n_keys
FROM j GROUP BY 1
"""


def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (percentile-clipped) robust statistics per return flag —
    the outlier-tolerant aggregate a quality pipeline uses where a raw
    mean is hostage to extreme rows. Group [p05, p95] bounds come from
    one exact-percentile aggregate over ≤ |groups| rows and broadcast
    back; the clip itself is a row-local least/greatest, so the fact
    table shuffles only for the two aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("_lo"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("_hi"),
    )
    clipped = li.join(F.broadcast(pct), "l_returnflag").select(
        "l_returnflag",
        "l_extendedprice",
        F.least(
            F.greatest(F.col("l_extendedprice"), F.col("_lo")), F.col("_hi")
        ).alias("_w"),
        ((F.col("l_extendedprice") < F.col("_lo"))
         | (F.col("l_extendedprice") > F.col("_hi"))).alias("_clip"),
    )
    return clipped.groupBy("l_returnflag").agg(
        F.round(F.avg("_w"), 6).alias("winsorized_avg"),
        F.round(F.stddev_samp("_w"), 6).alias("winsorized_std"),
        F.count(F.when(F.col("_clip"), 1)).alias("n_clipped"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_WINSORIZED_PRICE_STATS = """
WITH pct AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       round(avg(least(greatest(l_extendedprice, lo), hi)), 6) AS winsorized_avg,
       round(stddev_samp(least(greatest(l_extendedprice, lo), hi)), 6) AS winsorized_std,
       count(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi THEN 1 END) AS n_clipped,
       count(*) AS n_rows
FROM lineitem l JOIN pct USING (l_returnflag)
GROUP BY l.l_returnflag
"""


def equidepth_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals WITHOUT a global
    ntile window (which single-partitions the table): the nine interior
    decile boundaries come from one exact-percentile aggregate (1-row
    broadcast), bin assignment is a row-local comparison chain, and the
    per-bin stats are one grouped aggregate. Ties across a boundary land
    in the lower bin on both engines (<= comparisons), so bins are
    deterministic even though raw ntile's row-split of ties would not
    be."""
    orders = _t(spark, sf_dir, "orders")
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = orders.agg(
        *[
            F.expr(f"percentile(o_totalprice, {q})").alias(f"_b{i}")
            for i, q in enumerate(qs, start=1)
        ]
    )
    bin_col = F.lit(10)
    for i in range(9, 0, -1):
        bin_col = F.when(
            F.col("o_totalprice") <= F.col(f"_b{i}"), F.lit(i)
        ).otherwise(bin_col)
    return (
        orders.join(F.broadcast(bounds))
        .select(bin_col.alias("decile"), "o_totalprice")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("decile")
    )


ORACLE_EQUIDEPTH_PRICE_DECILES = """
WITH bounds AS (
  SELECT {bs} FROM orders
)
SELECT CASE {cases} ELSE 10 END AS decile,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders, bounds
GROUP BY 1
ORDER BY decile
""".format(
    bs=", ".join(
        f"quantile_cont(o_totalprice, {i / 10.0}) AS b{i}" for i in range(1, 10)
    ),
    cases=" ".join(
        f"WHEN o_totalprice <= b{i} THEN {i}" for i in range(1, 10)
    ),
)


def approx_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog distinct-count (md5 registers) next to the
    exact answer — makes the sketch tier itself hash-verifiable, the
    same md5-twin precedent as the portable MinHash/SimHash rows
    (`approx_summary`'s HLL++/t-digest stays rows-only by design;
    this row proves the sketch MATH, that one exercises the engine
    built-ins)."""
    from pyspark_etl_twitter_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    li = _t(spark, sf_dir, "lineitem")
    est = hll_estimate(
        hll_registers(li, "l_partkey", group_cols=["l_returnflag"]),
        group_cols=["l_returnflag"],
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return est.join(exact, "l_returnflag")


_HLL_A_M2 = repr(0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0)

ORACLE_APPROX_DISTINCT_PORTABLE = f"""
WITH h AS (
  SELECT l_returnflag AS grp,
         CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 2))
              AS BIGINT) AS bucket,
         CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 3, 8))
              AS BIGINT) AS w
  FROM lineitem
),
regs AS (
  SELECT grp, bucket,
         max(CASE WHEN w = 0 THEN 33
                  ELSE 32 - CAST(floor(log2(w)) AS INTEGER) END) AS register
  FROM h GROUP BY grp, bucket
),
agg AS (
  SELECT grp, count(*) AS n, sum(power(2.0, -register)) AS s
  FROM regs GROUP BY grp
),
ex AS (
  SELECT l_returnflag AS grp, count(DISTINCT l_partkey) AS exact_distinct
  FROM lineitem GROUP BY grp
)
SELECT a.grp AS l_returnflag,
       round(CASE WHEN {_HLL_A_M2} / (a.s + (256.0 - a.n)) <= 640.0
                   AND (256.0 - a.n) > 0
                  THEN 256.0 * ln(256.0 / (256.0 - a.n))
                  ELSE {_HLL_A_M2} / (a.s + (256.0 - a.n)) END, 4)
         AS hll_distinct,
       e.exact_distinct
FROM agg a JOIN ex e USING (grp)
"""


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE Count-Min Sketch (Cormode & Muthukrishnan 2005) heavy
    hitters: sketch the documents token stream into a 4×1024 md5-bucket
    counter relation, then point-estimate the top-20 exact tokens —
    each row shows exact count, CMS estimate (one-sided: est >= exact),
    and rank. The HLL-twin precedent extended to the FREQUENCY sketch
    tier: every stage (hashing, counters, min-over-rows) replays in
    DuckDB, so the sketch math itself is hash-verified."""
    from pyspark_etl_twitter_spark.operators.sketches import (
        cms_portable_build,
        cms_portable_lookup,
    )
    from pyspark_etl_twitter_spark.operators.textstats import ws_tokens
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(ws_tokens("text")).alias("token"))
    sketch = cms_portable_build(tok, "token")
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # vocab-bounded relation -> the single-partition rank window is a
    # bounded frontier, not a corpus sort
    top = (
        exact.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("exact_cnt").desc(), "token")
            ),
        )
        .filter(F.col("rank") <= 20)
    )
    est = cms_portable_lookup(sketch, top.select("token"), "token").withColumnRenamed(
        "item", "token"
    )
    return top.join(est, "token").select(
        "token",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        "cms_est",
        F.col("rank").cast("int").alias("rank"),
    )


ORACLE_CMS_HEAVY_HITTERS = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
rows_(r) AS (VALUES (0), (1), (2), (3)),
hashed AS (
  SELECT r,
         ('0x' || substr(md5(r::VARCHAR || ':' || token), 1, 8))::BIGINT % 1024 AS bucket
  FROM tok CROSS JOIN rows_
),
sketch AS (SELECT r, bucket, count(*) AS cnt FROM hashed GROUP BY r, bucket),
exact AS (SELECT token, count(*) AS exact_cnt FROM tok GROUP BY token),
top AS (
  SELECT token, exact_cnt,
         row_number() OVER (ORDER BY exact_cnt DESC, token) AS rank
  FROM exact QUALIFY rank <= 20
),
probe AS (
  SELECT t.token, t.exact_cnt, t.rank, s.cnt
  FROM top t CROSS JOIN rows_ r2
  JOIN sketch s
    ON s.r = r2.r
   AND s.bucket = ('0x' || substr(md5(r2.r::VARCHAR || ':' || t.token), 1, 8))::BIGINT % 1024
)
SELECT token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(min(cnt) AS BIGINT) AS cms_est,
       CAST(rank AS INTEGER) AS rank
FROM probe GROUP BY token, exact_cnt, rank
"""


def benford_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford leading-digit conformity of order prices per status — the
    fabricated/truncated-data ruler next to the KS/PSI drift rows
    (``quality_checks.benford_profile``): first significant digit taken
    from the integer CENTS string (never log10 — last-ulp safe), digits
    zero-filled, conformity = max absolute deviation vs log10(1 + 1/d).
    Synthetic uniform-ish prices are expected to FAIL conformity
    (max_dev >> 0.03) — the row pins that the ruler detects it."""
    from pyspark_etl_twitter_spark.operators.quality_checks import (
        benford_profile,
    )

    orders = _t(spark, sf_dir, "orders")
    return benford_profile(
        orders, "o_totalprice", group_cols=["o_orderstatus"]
    )


# expected proportions are repr()'d from the SAME Python-computed
# doubles the Spark literals use (the JL-plane trick)
ORACLE_BENFORD_ORDER_PRICES = """
WITH pos AS (
  SELECT o_orderstatus,
         CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  -- sub-cent exclusion mirrors benford_profile: rows rounding to 0
  -- cents carry no first digit and leave both n_d and n
  FROM orders WHERE o_totalprice IS NOT NULL
    AND CAST(round(o_totalprice * 100) AS BIGINT) >= 1
),
counts AS (
  SELECT o_orderstatus, digit, count(*) AS n_d FROM pos GROUP BY 1, 2
),
expd(digit, exp_p) AS (
  VALUES (CAST(1 AS INTEGER), 0.3010299956639812),
           (CAST(2 AS INTEGER), 0.17609125905568124),
           (CAST(3 AS INTEGER), 0.12493873660829992),
           (CAST(4 AS INTEGER), 0.09691001300805642),
           (CAST(5 AS INTEGER), 0.07918124604762482),
           (CAST(6 AS INTEGER), 0.06694678963061322),
           (CAST(7 AS INTEGER), 0.05799194697768673),
           (CAST(8 AS INTEGER), 0.05115252244738129),
           (CAST(9 AS INTEGER), 0.04575749056067514)
),
frame AS (
  SELECT g.o_orderstatus, e.digit, CAST(e.exp_p AS DOUBLE) AS exp_p
  FROM (SELECT DISTINCT o_orderstatus FROM counts) g CROSS JOIN expd e
),
fullf AS (
  SELECT f.o_orderstatus, f.digit, f.exp_p, coalesce(c.n_d, 0) AS n_d,
         sum(coalesce(c.n_d, 0)) OVER (PARTITION BY f.o_orderstatus) AS n
  FROM frame f LEFT JOIN counts c
    ON c.o_orderstatus = f.o_orderstatus AND c.digit = f.digit
),
dev AS (
  SELECT *,
         max(abs(CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE) - exp_p))
           OVER (PARTITION BY o_orderstatus) AS max_dev
  FROM fullf
)
SELECT o_orderstatus, digit,
       CAST(n_d AS BIGINT) AS n_d,
       round(CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_p,
       round(exp_p, 6) AS exp_p,
       round(max_dev, 6) AS max_dev,
       max_dev <= 0.03 AS benford_ok
FROM dev
"""


def ks_drift_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift check per order status: does
    the order-price distribution differ between odd and even order
    years? Exact integer cross-multiplied D (see
    ``quality_checks.ks_two_sample``), dollar quantization, asymptotic
    5% critical value — the distribution-level data-quality gate next to
    the mean/stddev checks of ``data_quality_lineitem``."""
    from pyspark_etl_twitter_spark.operators.quality_checks import (
        ks_two_sample,
    )

    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderstatus",
        "o_totalprice",
        (F.year("o_orderdate").cast("long") % 2 == 1).alias("is_odd_year"),
    )
    return ks_two_sample(
        base,
        "o_totalprice",
        "is_odd_year",
        group_cols=["o_orderstatus"],
        round_dp=0,
    )


ORACLE_KS_DRIFT_ORDER_PRICES = """
WITH base AS (
  SELECT o_orderstatus, round(o_totalprice, 0) AS v,
         (CAST(year(o_orderdate) AS BIGINT) % 2 = 1) AS b
  FROM orders WHERE o_totalprice IS NOT NULL
),
pv AS (
  SELECT o_orderstatus, v,
         sum(CASE WHEN NOT b THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN b THEN 1 ELSE 0 END) AS cb
  FROM base GROUP BY o_orderstatus, v
),
cum AS (
  SELECT o_orderstatus, v,
         sum(ca) OVER (PARTITION BY o_orderstatus ORDER BY v) AS cuma,
         sum(cb) OVER (PARTITION BY o_orderstatus ORDER BY v) AS cumb,
         sum(ca) OVER (PARTITION BY o_orderstatus) AS na,
         sum(cb) OVER (PARTITION BY o_orderstatus) AS nb
  FROM pv
),
sc AS (
  SELECT o_orderstatus, na, nb, v,
         abs(cuma * nb - cumb * na) AS dnum,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY abs(cuma * nb - cumb * na) DESC, v) AS rn
  FROM cum
)
SELECT o_orderstatus,
       CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       round(dnum::DOUBLE / (na * nb), 6) AS ks_d,
       v AS ks_at,
       round(1.358 * sqrt((na + nb)::DOUBLE / (na * nb)), 6) AS crit_05,
       (dnum::DOUBLE / (na * nb) > 1.358 * sqrt((na + nb)::DOUBLE / (na * nb))) AS drifted
FROM sc WHERE rn = 1
"""


def kmv_profile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable KMV (bottom-k) sketch profile of the price domain per
    return flag: distinct-count estimate vs exact, plus the sampled
    domain median vs the exact domain median — the third portable
    sketch tier (HLL distinct / CMS frequency / KMV distinct+sample).
    Prices are hashed as CENTS integers (the md5 idiom's string-render
    contract) and reported back in dollars."""
    from pyspark_etl_twitter_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    li = _t(spark, sf_dir, "lineitem")
    cents = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    sk = kmv_sketch(cents, "cents", k=256, group_cols=["l_returnflag"])
    est = kmv_estimate(
        sk, k=256, group_cols=["l_returnflag"], quantiles=(0.5,)
    )
    exact = cents.groupBy("l_returnflag").agg(
        F.countDistinct("cents").cast("long").alias("exact_distinct"),
        F.round(
            F.expr("percentile(DISTINCT cents, 0.5)") / 100.0, 2
        ).alias("exact_domain_median"),
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag",
        "kmv_distinct",
        "exact_distinct",
        F.round(F.col("q_50") / 100.0, 2).alias("kmv_domain_median"),
        "exact_domain_median",
    )


ORACLE_KMV_PROFILE_PRICES = """
WITH cents AS (
  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
),
d AS (SELECT DISTINCT l_returnflag, v FROM cents),
hashed AS (
  SELECT l_returnflag, v,
         ('0x' || substr(md5(v::VARCHAR), 1, 8))::BIGINT AS h
  FROM d
),
sk AS (
  SELECT * FROM (
    SELECT l_returnflag, v, h,
           row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS rnk
    FROM hashed) r
  WHERE rnk <= 256
),
st AS (
  SELECT l_returnflag, v, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS vr,
         count(*) OVER (PARTITION BY l_returnflag) AS n,
         max(h) OVER (PARTITION BY l_returnflag) AS hk
  FROM sk
),
est AS (
  SELECT l_returnflag,
         min(CASE WHEN n >= 256
                  THEN round(255.0 * 4294967296.0 / hk, 4)
                  ELSE n::DOUBLE END) AS kmv_distinct,
         min(CASE WHEN vr = greatest(CAST(ceil(0.5 * n) AS INTEGER), 1)
                  THEN v END) AS q50c
  FROM st GROUP BY l_returnflag
),
ex AS (
  SELECT l_returnflag,
         CAST(count(DISTINCT v) AS BIGINT) AS exact_distinct,
         round(median(DISTINCT v) / 100.0, 2) AS exact_domain_median
  FROM cents GROUP BY l_returnflag
)
SELECT est.l_returnflag, est.kmv_distinct, ex.exact_distinct,
       round(est.q50c / 100.0, 2) AS kmv_domain_median,
       ex.exact_domain_median
FROM est JOIN ex USING (l_returnflag)
"""


def psi_drift_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per order status over $10k price bins,
    same odd-vs-even-year split as ``ks_drift_order_prices`` — the two
    standard drift rulers side by side: KS finds the worst single ECDF
    gap, PSI integrates shift across all bins (Laplace-smoothed, so
    one-sided-empty bins stay finite and deterministic)."""
    from pyspark_etl_twitter_spark.operators.quality_checks import (
        psi_two_sample,
    )

    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderstatus",
        "o_totalprice",
        (F.year("o_orderdate").cast("long") % 2 == 1).alias("is_odd_year"),
    )
    return psi_two_sample(
        base,
        "o_totalprice",
        "is_odd_year",
        bin_width=10_000.0,
        group_cols=["o_orderstatus"],
    )


ORACLE_PSI_DRIFT_ORDER_PRICES = """
WITH base AS (
  SELECT o_orderstatus,
         CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bin,
         (CAST(year(o_orderdate) AS BIGINT) % 2 = 1) AS b
  FROM orders WHERE o_totalprice IS NOT NULL
),
pb AS (
  SELECT o_orderstatus, bin,
         sum(CASE WHEN NOT b THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN b THEN 1 ELSE 0 END) AS cb
  FROM base GROUP BY o_orderstatus, bin
),
st AS (
  SELECT o_orderstatus, ca, cb,
         sum(ca) OVER (PARTITION BY o_orderstatus) AS na,
         sum(cb) OVER (PARTITION BY o_orderstatus) AS nb,
         count(*) OVER (PARTITION BY o_orderstatus) AS k
  FROM pb
),
terms AS (
  SELECT o_orderstatus, na, nb, k,
         ((ca + 0.5) / (na + 0.5 * k) - (cb + 0.5) / (nb + 0.5 * k))
           * ln(((ca + 0.5) / (na + 0.5 * k)) / ((cb + 0.5) / (nb + 0.5 * k))) AS t
  FROM st
),
agg AS (
  SELECT o_orderstatus, na, nb, k, round(sum(t), 6) AS psi
  FROM terms GROUP BY o_orderstatus, na, nb, k
)
SELECT o_orderstatus,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(k AS BIGINT) AS n_bins, psi,
       CASE WHEN psi > 0.25 THEN 'major'
            WHEN psi > 0.1 THEN 'moderate'
            ELSE 'stable' END AS shift
FROM agg
"""
