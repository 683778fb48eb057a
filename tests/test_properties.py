"""Property-based invariants (SURVEY §5): OHLC sanity, resample volume
conservation, upsert idempotency, dedup stability — on generated series.

One shared SparkSession (conftest), small generated frames, bounded
examples: each property runs a handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.resample import ohlc_resample
from global_stock_data_warehouse_spark.operators.upsert import dedup_last_writer

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from global_stock_data_warehouse_spark.session import get_spark

        _spark = get_spark("gsdw-props")
    return _spark


bars_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(min_value=0, max_value=120),  # day offset from 2024-01-01
        st.floats(min_value=0.5, max_value=1000.0, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _mk_bars(rows):
    base = dt.date(2024, 1, 1)
    data = [
        (sym, base + dt.timedelta(days=off), float(px), float(px), float(px), float(px), 1)
        for sym, off, px in rows
    ]
    return _get_spark().createDataFrame(
        data,
        "symbol string, date date, open double, high double, low double, "
        "close double, volume bigint",
    )


@given(bars_strategy)
@SLOW
def test_resample_ohlc_invariants(rows):
    bars = _mk_bars(rows)
    for freq in ("W", "M"):
        out = ohlc_resample(bars, freq).collect()
        for r in out:
            assert r.low <= r.open <= r.high
            assert r.low <= r.close <= r.high
        # volume conservation: buckets partition the rows
        assert sum(r.volume for r in out) == len(rows)
        # bucket labels are canonical period ENDS
        for r in out:
            if freq == "W":
                assert r.period_end.isoweekday() == 5  # Friday
            else:
                nxt = r.period_end + dt.timedelta(days=1)
                assert nxt.day == 1  # last day of month
        # label never precedes its members: the earliest label covers the
        # earliest raw date, the latest label the latest raw date
        min_d = min(r.date for r in _mk_bars(rows).select("date").collect())
        assert all(r.period_end >= min_d for r in out)


@given(bars_strategy)
@SLOW
def test_dedup_last_writer_is_idempotent_and_keyed(rows):
    df = _mk_bars(rows).withColumn("_v", F.col("volume"))
    once = dedup_last_writer(df, ("symbol", "date"), "close")
    # exactly one row per key
    n_keys = df.select("symbol", "date").distinct().count()
    assert once.count() == n_keys
    # applying again changes nothing
    twice = dedup_last_writer(once, ("symbol", "date"), "close")
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))
    # winner is the max close per key
    max_close = {
        (r.symbol, r.date): r.mx
        for r in df.groupBy("symbol", "date").agg(F.max("close").alias("mx")).collect()
    }
    for r in once.collect():
        assert r.close == max_close[(r.symbol, r.date)]


def test_sql_view_surface(spark):
    """register_views exposes every table to spark.sql."""
    import os

    from global_stock_data_warehouse_spark.sources.registry import register_views

    register_views(spark, os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001"))
    row = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer GROUP BY c_mktsegment ORDER BY n DESC LIMIT 1
        """
    ).first()
    assert row.n > 0
