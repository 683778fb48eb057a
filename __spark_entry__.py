"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (weekly OHLC resample + lag
returns — the reference's downloader_wmy.py:39-58 semantics) on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented SURVEY.md §2
operator for the DuckDB correctness harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.functions.buckets import month_end, week_ending_friday
from global_stock_data_warehouse_spark.functions.normalize import (
    canonical_id,
    default_if_missing,
    status_flag,
    zero_pad,
)
from global_stock_data_warehouse_spark.operators.joins import (
    anti_missing,
    broadcast_lookup,
    semi_active,
)
from global_stock_data_warehouse_spark.operators.resample import ohlc_resample
from global_stock_data_warehouse_spark.operators.returns import with_date_gap, with_period_return
from global_stock_data_warehouse_spark.operators.upsert import dedup_last_writer


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    # rejects; read it as raw nanos (legacy conf) and convert to micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def _event_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a bar stream: user_id=entity, ts=time, value=price."""
    return _t(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("event_id"),
        F.col("ts"),
        F.to_date("ts").alias("d"),
        F.col("value"),
    )


# ---------------------------------------------------------------------------
# Flagship: weekly OHLC resample + period returns (A5 + W1 + W3)
# ---------------------------------------------------------------------------


def _wmy_resample_returns(spark: SparkSession, sf_dir: str, freq: str) -> DataFrame:
    bars = _event_bars(spark, sf_dir)
    r = ohlc_resample(
        bars,
        freq,
        time_col="d",
        key_cols=("user_id",),
        open_col="value",
        high_col="value",
        low_col="value",
        close_col="value",
        volume_col="value",
        tiebreak_cols=("ts", "event_id"),
    ).withColumnRenamed("volume", "sum_value")
    out = with_period_return(r, key_cols=("user_id",)).drop("freq")
    return out.select(
        "user_id", "period_end", "open", "high", "low", "close", "sum_value", "period_return"
    )


def _wmy_oracle(freq: str) -> str:
    if freq == "W":
        bucket = "CAST(ts AS DATE) + CAST((5 - isodow(CAST(ts AS DATE)) + 7) % 7 AS INTEGER)"
    elif freq == "M":
        bucket = "last_day(CAST(ts AS DATE))"
    else:
        bucket = "make_date(year(ts), 12, 31)"
    return f"""
WITH bars AS (
  SELECT user_id,
         {bucket} AS period_end,
         first(value ORDER BY ts, event_id) AS open,
         max(value) AS high,
         min(value) AS low,
         last(value ORDER BY ts, event_id) AS close,
         sum(value) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT user_id, period_end, open, high, low, close, sum_value,
       round(close / lag(close) OVER (PARTITION BY user_id ORDER BY period_end) - 1, 4)
         AS period_return
FROM bars
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _wmy_resample_returns(spark, "/root/testdata/sf0.001", "W")


# ---------------------------------------------------------------------------
# Operator queries (SURVEY.md §2) over the driver tables
# ---------------------------------------------------------------------------


def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4: single-pass COUNT DISTINCT + MAX + COUNT(*) (main.py:118)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5-analog grouped multi-agg with arithmetic (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_dedup_last_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/K1: last-writer-wins keyed dedup via row_number window."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "_v", F.struct("l_shipdate", "l_orderkey", "l_linenumber")
    )
    out = dedup_last_writer(li, ("l_partkey", "l_suppkey"), "_v")
    return out.select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate")


def q_filter_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4-P7 + F1/F2: predicate chain + canonicalization on part."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(
            (F.col("p_size") >= 4)
            & F.col("p_brand").rlike("^[A-Za-z0-9#]+$")
            & ~F.upper(F.col("p_type")).rlike("ANODIZED|BURNISHED")
        )
        .select(
            "p_partkey",
            canonical_id("p_brand").alias("brand_id"),
            zero_pad("p_size", 3).alias("size_code"),
            F.substring_index("p_type", " ", 1).alias("type_head"),
        )
    )


def q_join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast dim lookup + coalesce default (KR industry join)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation_name")
    )
    out = broadcast_lookup(
        cust,
        nation,
        on="c_nationkey",
        coalesce_cols={"nation": ("nation_name", "c_mktsegment", "Unknown")},
    )
    return out.select("c_custkey", "nation")


def q_join_facts_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: fact x dim equi-join + grouped rollup (orders x customer)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


def q_join_anti_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers with zero orders (coverage/fail_list)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_missing(c, o, "c_custkey")


def q_join_semi_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: suppliers with at least one lineitem."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("s_suppkey"))
    return semi_active(s, li, "s_suppkey")


def q_win_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op win_rank_topk: top-3 orders per priority by totalprice."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
    )


def q_agg_gap_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+A9: max day-gap between consecutive events per user."""
    ev = _event_bars(spark, sf_dir)
    gaps = with_date_gap(ev, date_col="d", key_cols=("user_id",))
    return gaps.groupBy("user_id").agg(F.max("gap_days").alias("max_gap_days"))


def q_agg_boolean_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per-group boolean gates (any(cond)) as max(when)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("l_discount") > 0.08, 1).otherwise(0)).cast("boolean").alias("any_deep_discount"),
        F.max(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).cast("boolean").alias("any_nonpositive_qty"),
    )


def q_agg_groupwise_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+F10+F12: success counts, 2-dp rate, status flag per group."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("finished"),
    )
    agg = agg.withColumn("success_rate", F.round(F.col("finished") / F.col("total") * 100, 2))
    return agg.withColumn("status", status_flag("success_rate", 30.0))


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2: union frames then distinct keys."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


def q_scalar_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F9: string/date/math scalar expressions in one projection."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.trim(F.col("o_orderpriority"))).alias("prio_canon"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.substring_index(F.col("o_orderpriority"), "-", 1).alias("prio_code"),
        F.to_date("o_orderdate").alias("order_date"),
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("order_date_str"),
        F.round(F.col("o_totalprice") / 7.0, 4).alias("price_per_week"),
        week_ending_friday(F.to_date("o_orderdate")).alias("week_end"),
        month_end(F.to_date("o_orderdate")).alias("month_end"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: JSON path extraction + grouped count on events.props."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: global deterministic sort + limit."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    )


def q_filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: partition-prunable date-range filter + monthly rollup."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1996-01-01"))
        .groupBy(F.trunc(F.to_date("l_shipdate"), "month").alias("ship_month"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )


def q_summary_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_db_summary composite (A1-A4+A6+F12): per-nation coverage report."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    joined = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
    agg = (
        joined.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("expected"),
            F.sum(F.when(F.col("n_orders").isNotNull(), 1).otherwise(0)).alias("active"),
        )
    )
    agg = agg.withColumn("coverage", F.round(F.col("active") / F.col("expected") * 100, 2))
    return agg.withColumn("status", status_flag("coverage", 80.0))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wmy_weekly_resample_returns": lambda s, d: _wmy_resample_returns(s, d, "W"),
        "wmy_monthly_resample_returns": lambda s, d: _wmy_resample_returns(s, d, "M"),
        "wmy_yearly_resample_returns": lambda s, d: _wmy_resample_returns(s, d, "Y"),
        "agg_multi": q_agg_multi,
        "agg_pricing_summary": q_agg_pricing_summary,
        "dedup_last_writer": q_dedup_last_writer,
        "filter_normalize": q_filter_normalize,
        "join_broadcast_lookup": q_join_broadcast_lookup,
        "join_facts_dim": q_join_facts_dim,
        "join_anti_missing": q_join_anti_missing,
        "join_semi_active": q_join_semi_active,
        "win_rank_topk": q_win_rank_topk,
        "agg_gap_max": q_agg_gap_max,
        "agg_boolean_any": q_agg_boolean_any,
        "agg_groupwise_stats": q_agg_groupwise_stats,
        "union_distinct": q_union_distinct,
        "scalar_chain": q_scalar_chain,
        "json_extract": q_json_extract,
        "sort_limit_topk": q_sort_limit_topk,
        "filter_date_range": q_filter_date_range,
        "summary_coverage": q_summary_coverage,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "wmy_weekly_resample_returns": _wmy_oracle("W"),
        "wmy_monthly_resample_returns": _wmy_oracle("M"),
        "wmy_yearly_resample_returns": _wmy_oracle("Y"),
        "agg_multi": """
SELECT count(DISTINCT l_partkey) AS n_parts, max(l_shipdate) AS max_shipdate,
       count(*) AS n_rows FROM lineitem
""",
        "agg_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       avg(l_quantity) AS avg_qty,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "dedup_last_writer": """
SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_shipdate
FROM (SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_shipdate,
             row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                ORDER BY (l_shipdate, l_orderkey, l_linenumber) DESC) AS rn
      FROM lineitem) WHERE rn = 1
""",
        "filter_normalize": """
SELECT p_partkey,
       upper(trim(p_brand)) AS brand_id,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_code,
       split_part(p_type, ' ', 1) AS type_head
FROM part
WHERE p_size >= 4
  AND regexp_matches(p_brand, '^[A-Za-z0-9#]+$')
  AND NOT regexp_matches(upper(p_type), 'ANODIZED|BURNISHED')
""",
        "join_broadcast_lookup": """
SELECT c_custkey, coalesce(n_name, c_mktsegment, 'Unknown') AS nation
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
""",
        "join_facts_dim": """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
        "join_anti_missing": """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
        "join_semi_active": """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
""",
        "win_rank_topk": """
SELECT o_orderpriority, rk, o_orderkey, o_totalprice
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders) WHERE rk <= 3
""",
        "agg_gap_max": """
WITH g AS (
  SELECT user_id,
         date_diff('day',
                   lag(CAST(ts AS DATE)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE)),
                   CAST(ts AS DATE)) AS gap_days
  FROM events)
SELECT user_id, max(gap_days) AS max_gap_days FROM g GROUP BY user_id
""",
        "agg_boolean_any": """
SELECT l_returnflag,
       max(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) = 1 AS any_deep_discount,
       max(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) = 1 AS any_nonpositive_qty
FROM lineitem GROUP BY l_returnflag
""",
        "agg_groupwise_stats": """
SELECT o_orderpriority, total, finished, success_rate,
       CASE WHEN success_rate >= 30.0 THEN 'OK' ELSE 'WARN' END AS status
FROM (SELECT o_orderpriority, count(*) AS total,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS finished,
             round(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 100.0 / count(*), 2)
               AS success_rate
      FROM orders GROUP BY o_orderpriority)
""",
        "union_distinct": """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
""",
        "scalar_chain": """
SELECT o_orderkey,
       upper(trim(o_orderpriority)) AS prio_canon,
       lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
       split_part(o_orderpriority, '-', 1) AS prio_code,
       CAST(o_orderdate AS DATE) AS order_date,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
       round(o_totalprice / 7.0, 4) AS price_per_week,
       CAST(o_orderdate AS DATE)
         + CAST((5 - isodow(CAST(o_orderdate AS DATE)) + 7) % 7 AS INTEGER) AS week_end,
       last_day(CAST(o_orderdate AS DATE)) AS month_end
FROM orders
""",
        "json_extract": """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
FROM events GROUP BY 1
""",
        "sort_limit_topk": """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
""",
        "filter_date_range": """
SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS ship_month,
       count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY 1
""",
        "summary_coverage": """
WITH per_cust AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
SELECT n_name AS nation, count(*) AS expected,
       sum(CASE WHEN n_orders IS NOT NULL THEN 1 ELSE 0 END) AS active,
       round(sum(CASE WHEN n_orders IS NOT NULL THEN 1 ELSE 0 END) * 100.0 / count(*), 2)
         AS coverage,
       CASE WHEN round(sum(CASE WHEN n_orders IS NOT NULL THEN 1 ELSE 0 END) * 100.0
                       / count(*), 2) >= 80.0 THEN 'OK' ELSE 'WARN' END AS status
FROM customer
LEFT JOIN per_cust ON c_custkey = o_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    }
