"""range_join boundary semantics + multi-resolution rollup invariants."""

import datetime as dt

from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.joins import range_join
from global_stock_data_warehouse_spark.operators.rollup import multi_resolution_rollup


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_range_join_half_open_and_no_duplicates(spark):
    points = spark.createDataFrame(
        [(1, _ts(1)), (2, _ts(5)), (3, _ts(8)), (4, _ts(15))],
        "pid long, t timestamp",
    )
    # interval B spans two 7-day buckets; A ends exactly at point 3's time
    ivals = spark.createDataFrame(
        [("A", _ts(1), _ts(8)), ("B", _ts(5), _ts(16))],
        "iid string, s timestamp, e timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(points, ivals, "t", "s", "e", bucket_seconds=7 * 86400).collect()
    )
    # start inclusive (1 in A), end exclusive (8 not in A), multi-bucket
    # interval B catches 5, 8, 15 exactly once each
    assert got == [(1, "A"), (2, "A"), (2, "B"), (3, "B"), (4, "B")]


def test_range_join_with_extra_keys(spark):
    points = spark.createDataFrame(
        [(1, "x", _ts(2)), (2, "y", _ts(2))], "pid long, k string, t timestamp"
    )
    ivals = spark.createDataFrame(
        [("A", "x", _ts(1), _ts(3))], "iid string, k string, s timestamp, e timestamp"
    )
    got = range_join(points, ivals, "t", "s", "e", extra_keys=("k",)).collect()
    assert [(r.pid, r.iid) for r in got] == [(1, "A")]


def test_multi_res_rollup_resolutions_consistent(spark):
    rows = [
        (1, _ts(1, 6), 10.0),   # Mon Jan 1
        (1, _ts(1, 18), 20.0),
        (1, _ts(3), 5.0),       # Wed same ISO week
        (1, _ts(10), 7.0),      # next week
        (2, _ts(1), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = multi_resolution_rollup(df).collect()
    by = {(r.user_id, r.resolution, r.bucket_start.date().isoformat()): r for r in out}
    assert by[(1, "day", "2024-01-01")].sum_value == 30.0
    assert by[(1, "week", "2024-01-01")].n_rows == 3
    assert by[(1, "month", "2024-01-01")].sum_value == 42.0
    assert by[(2, "month", "2024-01-01")].n_rows == 1
    # every resolution's totals agree
    for res in ("day", "week", "month"):
        tot = sum(r.sum_value for r in out if r.resolution == res)
        assert tot == 43.0


def test_multi_res_rollup_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 1.0)], "user_id long, ts timestamp, value double"
    )
    plan = (
        multi_resolution_rollup(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Expand" in plan
