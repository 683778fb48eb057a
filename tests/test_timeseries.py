"""Market indicator battery: hand-computed and pandas-oracle checks."""

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.timeseries import (
    daily_close,
    drawdown_stats,
    tech_indicators,
    with_ewma,
)


def _bars(spark, vals, user=1):
    rows = [
        (user, i, dt.datetime(2024, 1, 1 + i, 12, 0), float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def test_daily_close_last_by_tiebreak(spark):
    rows = [
        (1, 10, dt.datetime(2024, 1, 1, 9), 5.0),
        (1, 11, dt.datetime(2024, 1, 1, 16), 7.0),  # later ts wins
        (1, 13, dt.datetime(2024, 1, 2, 9), 3.0),
        (1, 12, dt.datetime(2024, 1, 2, 9), 2.0),  # same ts: higher event_id wins
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.d.isoformat(): r.close for r in daily_close(df).collect()}
    assert out == {"2024-01-01": 7.0, "2024-01-02": 3.0}


def test_ewma_matches_pandas_adjusted(spark):
    vals = [100.0, 102.0, 99.0, 105.0, 103.0, 108.0]
    d = daily_close(_bars(spark, vals))
    got = [
        r.ewma
        for r in with_ewma(d, alpha=0.1, window=20).orderBy("d").collect()
    ]
    # series shorter than the frame == pandas ewm(adjust=True) exactly
    want = pd.Series(vals).ewm(alpha=0.1, adjust=True).mean().tolist()
    assert got == pytest.approx(want, rel=1e-12)


def test_rsi_pinned_at_100_for_monotonic_rise(spark):
    d = tech_indicators(_bars(spark, [10, 11, 12, 13, 14, 15]))
    rows = d.orderBy("d").collect()
    # first row has no diff -> null RSI; all-gain series pins at 100 after
    assert rows[0].rsi14 is None
    assert all(r.rsi14 == 100.0 for r in rows[1:])


def test_drawdown_and_cum_return_hand_computed(spark):
    d = daily_close(_bars(spark, [100.0, 120.0, 90.0, 110.0]))
    row = drawdown_stats(d).collect()[0]
    assert row.max_drawdown == pytest.approx(90.0 / 120.0 - 1, abs=1e-6)
    assert row.cum_return == pytest.approx(0.1, abs=1e-6)


def test_bollinger_brackets_the_mean(spark):
    out = tech_indicators(_bars(spark, [10.0, 12.0, 11.0, 13.0, 12.0])).collect()
    for r in out[1:]:  # from the 2nd row the stddev is defined
        assert r.boll_dn < r.boll_mid < r.boll_up
        assert r.boll_mid - r.boll_dn == pytest.approx(r.boll_up - r.boll_mid, abs=1e-9)


def test_battery_single_shuffle_plan(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    plan = (
        tech_indicators(ev.select("user_id", "event_id", "ts", "value"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
