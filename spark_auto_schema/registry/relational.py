"""Core relational operator queries (joins, windows, rollup/cube, sessionize, sampling splits).

Mechanically split from __spark_entry__.py (round 11); no semantic change.
Assembled by __spark_entry__.queries() / oracle_sql() — the single driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession
from pyspark.sql.window import Window
from spark_auto_schema.io import read_table
from spark_auto_schema.ops import relational
from spark_auto_schema.ops import sampling

# ---------------------------------------------------------------------------
# relational operator queries
# ---------------------------------------------------------------------------


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def _q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


_TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey LIMIT 10
"""


def _q_region_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_REGION_CUSTOMERS_SQL = """
SELECT r_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def _q_error_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.where((F.col("event_type") == "error") & (F.col("value") > 100)).select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("epoch_us"),
        F.round("value", 2).alias("value"),
    )


_ERROR_EVENTS_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS epoch_us, round(value, 2) AS value
FROM events WHERE event_type = 'error' AND value > 100
"""


def _q_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("user_id", "event_id", F.round("value", 2).alias("value"), "rn")
    )


_TOP_EVENTS_SQL = """
SELECT user_id, event_id, round(value, 2) AS value, rn FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= 2
"""


def _q_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


_MONTHLY_ORDERS_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""


def _q_distinct_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()


def _q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey")


def _q_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


def _q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


_ROLLUP_ORDERS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def _q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.cube("event_type", F.date_format("ts", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n_events")
    )


_CUBE_EVENTS_SQL = """
SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS n_events
FROM events GROUP BY CUBE(event_type, strftime(ts, '%Y-%m'))
"""


def _q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select("c_custkey")


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    is_new = F.when(
        F.lag("us").over(w).isNull()
        | ((F.col("us") - F.lag("us").over(w)) > 1_800_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(run))
        .select("user_id", "event_id", "session_id")
    )


_SESSIONIZE_SQL = """
WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events),
     l AS (SELECT user_id, event_id, us,
                  lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
           FROM e),
     n AS (SELECT user_id, event_id, us,
                  CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM l)
SELECT user_id, event_id,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_id
FROM n
"""


def _q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, small dim broadcast, agg + top-k."""
    c = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


_SHIPPING_PRIORITY_SQL = """
SELECT o_orderkey, revenue, orderdate, o_orderpriority FROM (
  SELECT o_orderkey, o_orderpriority,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY o_orderkey, o_orderdate, o_orderpriority
) ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def _q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join with customer-nation == supplier-nation."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


_LOCAL_SUPPLIER_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def _q_asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event picks the latest click by the same user
    at-or-before its timestamp (oracle: DuckDB's native ASOF LEFT JOIN)."""
    e = read_table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = relational.asof_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="click_ts"
    )
    return joined.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


_ASOF_PRIOR_CLICK_SQL = """
SELECT l.event_id, l.user_id, epoch_us(l.ts) - epoch_us(r.click_ts) AS gap_us
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN
     (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click') r
ON l.user_id = r.user_id AND l.ts >= r.click_ts
"""


def _q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    out = relational.time_bucket_agg(
        e,
        ts_col="ts",
        bucket="day",
        dims=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )
    return out.select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        "sum_value",
    )


_TIME_BUCKET_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def _q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    kx = F.get_json_object("props", "$.k")
    return e.groupBy("event_type").agg(
        F.sum(kx.cast("long")).alias("sum_k"), F.count(kx).alias("n_k")
    )


# CAST(sum(...) AS BIGINT): DuckDB aggregates integer sums to HUGEINT, which
# surfaces as decimal128 in Arrow output and hash-diverges from Spark's int64
# across DuckDB/pyarrow versions; n_k counts the pre-cast extraction so both
# engines agree on rows where $.k exists but is not numeric.
_JSON_PROPS_SQL = """
SELECT event_type, CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       count(props->>'k') AS n_k
FROM events GROUP BY event_type
"""


def _q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return sampling.hash_sample(d, "doc_id", 0.1).select("doc_id")


def _hash_sample_oracle_sql() -> str:
    t = sampling.fraction_threshold(0.1)
    return (
        "SELECT doc_id FROM documents "
        f"WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{t}'"
    )


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    samp = sampling.stratified_sample(o, "o_orderstatus", "o_orderkey", 0.05)
    return samp.select("o_orderkey", "o_orderstatus")


def _stratified_sample_oracle_sql() -> str:
    return """
WITH ranked AS (
  SELECT o_orderkey, o_orderstatus,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4),
                                     o_orderkey) AS rk,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders)
SELECT o_orderkey, o_orderstatus FROM ranked WHERE rk <= ceil(n * 0.05)
"""


def _q_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    train, ev = sampling.split_train_eval(d, "doc_id", 0.1)
    return train.select("doc_id", F.lit("train").alias("split")).unionByName(
        ev.select("doc_id", F.lit("eval").alias("split"))
    )


def _train_eval_oracle_sql() -> str:
    t = sampling.fraction_threshold(0.1)
    return (
        "SELECT doc_id, CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) "
        f"< '{t}' THEN 'eval' ELSE 'train' END AS split FROM documents"
    )


