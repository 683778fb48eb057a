"""Behavioral analytics ops (cohort retention, transition matrix,
hopping windows, MAD outliers, histograms) plus inverted-index keyword
retrieval: semantics on hand-built frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.behavior import (
    cohort_retention,
    event_transitions,
    histogram_fixed,
    hopping_window_agg,
    mad_outliers,
)
from global_stock_data_warehouse_spark.operators.corpus import (
    inverted_index,
    keyword_search,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_cohort_retention_offsets_and_alignment(spark):
    # user 1 first touches in week of Mon 2024-01-01, returns 2 weeks later;
    # user 2 joins the same cohort week; user 3 a later cohort.
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-02T10:00:00")),
            (1, _ts("2024-01-16T10:00:00")),
            (2, _ts("2024-01-03T09:00:00")),
            (3, _ts("2024-01-10T09:00:00")),
        ],
        ["user_id", "ts"],
    )
    rows = {
        (r.cohort_start.isoformat(), r.period_offset): r.n_users
        for r in cohort_retention(ev, period_days=7).collect()
    }
    # 2024-01-01 is a Monday -> cohort starts align to Mondays
    assert rows[("2024-01-01", 0)] == 2
    assert rows[("2024-01-01", 2)] == 1
    assert rows[("2024-01-08", 0)] == 1
    assert len(rows) == 3


def test_event_transitions_probabilities_row_normalize(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T00:00:00"), "a"),
            (1, 2, _ts("2024-01-01T00:01:00"), "b"),
            (1, 3, _ts("2024-01-01T00:02:00"), "a"),
            (1, 4, _ts("2024-01-01T00:03:00"), "c"),
            (2, 5, _ts("2024-01-01T00:00:00"), "a"),
            (2, 6, _ts("2024-01-01T00:01:00"), "b"),
        ],
        ["user_id", "event_id", "ts", "event_type"],
    )
    out = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in event_transitions(ev).collect()
    }
    # from 'a': a->b twice, a->c once
    assert out[("a", "b")] == (2, 0.666667)
    assert out[("a", "c")] == (1, 0.333333)
    # from 'b': b->a once (user 1 only; user 2's 'b' is terminal)
    assert out[("b", "a")] == (1, 1.0)
    assert len(out) == 3


def test_hopping_window_each_event_in_two_windows(spark):
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-03T00:00:00"), 10.0), (2, _ts("2024-01-20T00:00:00"), 5.0)],
        ["event_id", "ts", "value"],
    )
    out = hopping_window_agg(ev, size="14 days", slide="7 days")
    rows = out.collect()
    # size/slide = 2 -> every event lands in exactly 2 windows
    assert sum(r.n_events for r in rows) == 4
    for r in rows:
        assert (r.window_end - r.window_start).days == 14
        # epoch-aligned starts: whole multiples of 7 days since 1970-01-01
        assert (r.window_start - _ts("1970-01-01T00:00:00")).days % 7 == 0


def test_mad_outliers_flags_far_point(spark):
    df = spark.createDataFrame(
        [("s", v) for v in [10, 10, 11, 9, 10, 100]] + [("t", 5), ("t", 7)],
        ["source", "n_chars"],
    )
    out = {r.source: r for r in mad_outliers(df, ["source"], "n_chars", k=3.0).collect()}
    assert out["s"].med == 10.0
    assert out["s"].mad == 0.5
    assert out["s"].n_outliers == 1  # only the 100
    assert out["s"].n == 6
    # two-point group: med=6, mad=1, no point beyond 3*mad
    assert out["t"].n_outliers == 0


def test_histogram_fixed_bins_and_bounds(spark):
    df = spark.createDataFrame([(0.5,), (499.99,), (500.0,), (1250.0,)], ["v"])
    out = {r.bin_id: r for r in histogram_fixed(df, "v", 500.0).collect()}
    assert out[0].n == 2 and out[0].min_v == 0.5 and out[0].max_v == 499.99
    assert out[1].n == 1 and out[1].bin_lo == 500.0
    assert out[2].n == 1


def test_keyword_search_and_semantics_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark hash spark"),
            (2, "spark only here"),
            (3, "hash spark hash hash"),
            (4, "nothing relevant"),
        ],
        ["doc_id", "text"],
    )
    idx = inverted_index(docs)
    # df rides the posting build: 'spark' appears in 3 docs
    df_spark = idx.filter(F.col("term") == "spark").select("df").distinct().collect()
    assert [r.df for r in df_spark] == [3]
    out = keyword_search(idx, ["spark", "hash"], k=10).collect()
    # AND semantics: doc 2 (no 'hash') and doc 4 excluded; score = total tf
    assert [(r.doc_id, r.score) for r in out] == [(3, 4), (1, 3)]
    # require_all=False admits doc 2
    out_or = keyword_search(idx, ["spark", "hash"], k=10, require_all=False).collect()
    assert {r.doc_id for r in out_or} == {1, 2, 3}


def test_inverted_index_min_df_prunes(spark):
    docs = spark.createDataFrame(
        [(1, "rare shared"), (2, "shared")], ["doc_id", "text"]
    )
    kept = {r.term for r in inverted_index(docs, min_df=2).collect()}
    assert kept == {"shared"}


def test_rfm_segments_scores_and_tiebreaks(spark):
    import datetime as dt

    from global_stock_data_warehouse_spark.operators.behavior import rfm_segments

    d = dt.date(2024, 1, 1)
    rows = []
    for c in range(1, 11):
        # customer c: c orders of 100 each, last order day c
        for i in range(c):
            rows.append((c, d + dt.timedelta(days=c), 100.0))
    orders = spark.createDataFrame(rows, ["o_custkey", "o_orderdate", "o_totalprice"])
    out = {r.custkey: r for r in rfm_segments(orders, n_tiles=5).collect()}
    # customer 10: most recent, most frequent, highest spend -> all 1s
    assert (out[10].r_score, out[10].f_score, out[10].m_score) == (1, 1, 1)
    # customer 1: oldest, least frequent, lowest spend -> all 5s
    assert (out[1].r_score, out[1].f_score, out[1].m_score) == (5, 5, 5)
    assert out[10].frequency == 10 and out[10].monetary == 1000.0
    # ntile(5) over 10 rows: exactly 2 customers per tile
    from collections import Counter

    assert Counter(r.r_score for r in out.values()) == {t: 2 for t in range(1, 6)}


def test_rolling_distinct_users_window_counts(spark):
    import datetime as dt

    from global_stock_data_warehouse_spark.operators.behavior import (
        rolling_distinct_users,
    )

    t0 = dt.datetime(2024, 5, 1)
    ev = spark.createDataFrame(
        [
            (1, t0),
            (2, t0),
            (1, t0 + dt.timedelta(days=3)),
            (3, t0 + dt.timedelta(days=9)),
        ],
        ["user_id", "ts"],
    )
    out = {r.day.isoformat(): r.users_7d for r in rolling_distinct_users(ev, 7).collect()}
    assert out["2024-05-01"] == 2          # users 1,2
    assert out["2024-05-04"] == 2          # day-1 events still in window + day-4 event
    assert out["2024-05-08"] == 1          # only the day-4 event remains (day-1 aged out)
    assert out["2024-05-10"] == 2          # user 3 joins while day-4 event of user 1 in window
    # clipped at the observed max day: no day beyond 2024-05-10
    assert max(out) == "2024-05-10"


def test_attribution_last_touch_credits_and_lookback(spark):
    from global_stock_data_warehouse_spark.operators.behavior import (
        attribution_last_touch,
    )

    t0 = dt.datetime(2024, 6, 1)
    ev = spark.createDataFrame(
        [
            (1, 1, t0, "view"),
            (2, 1, t0 + dt.timedelta(hours=1), "click"),
            (3, 1, t0 + dt.timedelta(hours=2), "purchase"),     # -> click (2)
            (4, 1, t0 + dt.timedelta(days=20), "purchase"),     # stale -> NULL
            (5, 2, t0, "purchase"),                              # no touch -> NULL
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    out = {r.conversion_id: r for r in attribution_last_touch(ev).collect()}
    assert out[3].touch_id == 2 and out[3].gap_sec == 3600
    assert out[4].touch_id is None and out[4].gap_sec is None
    assert out[5].touch_id is None
    assert set(out) == {3, 4, 5}


def test_gap_fill_linear_interpolates_interior_ffills_tail(spark):
    from global_stock_data_warehouse_spark.operators.timeseries import gap_fill_ffill

    d = dt.date(2024, 3, 1)
    df = spark.createDataFrame(
        [("a", d, 1.0), ("a", d + dt.timedelta(days=4), 9.0)],
        ["user_id", "d", "close"],
    )
    rows = sorted(
        gap_fill_ffill(df, method="linear").collect(), key=lambda r: r.d
    )
    assert [r.close for r in rows] == [1.0, 3.0, 5.0, 7.0, 9.0]
    assert [r.is_filled for r in rows] == [False, True, True, True, False]


def test_max_concurrency_sweep_and_ties(spark):
    from global_stock_data_warehouse_spark.operators.behavior import max_concurrency

    t0 = dt.datetime(2024, 1, 1)

    def iv(s_h, e_h):
        return (t0 + dt.timedelta(hours=s_h), t0 + dt.timedelta(hours=e_h))

    # overlap pattern: peak of 3 during [2h, 3h); a later separate peak of 3
    # at 10h — earliest instant must win
    ivs = [iv(0, 4), iv(1, 3), iv(2, 5), iv(10, 12), iv(10, 12), iv(10, 12)]
    df = spark.createDataFrame(ivs, ["session_start", "session_end"])
    row = max_concurrency(df).first()
    assert row.max_concurrent == 3
    assert row.at_ts == t0 + dt.timedelta(hours=2)
    # closed semantics (default): two closed intervals meeting at a point
    # overlap there; half-open (closed=False) never double-counts
    df2 = spark.createDataFrame([iv(0, 1), iv(1, 2)], ["session_start", "session_end"])
    assert max_concurrency(df2).first().max_concurrent == 2
    assert max_concurrency(df2, closed=False).first().max_concurrent == 1
    # zero-length intervals (single-event sessions) count at their instant
    df3 = spark.createDataFrame(
        [iv(5, 5), iv(5, 5), iv(5, 5)], ["session_start", "session_end"]
    )
    assert max_concurrency(df3).first().max_concurrent == 3
    assert max_concurrency(df3, closed=False).first().max_concurrent == 0
    # bucket boundaries do not corrupt the global running sum
    wide = [iv(0, 24 * 30), iv(24 * 8, 24 * 9)]  # spans multiple 7d buckets
    assert max_concurrency(
        spark.createDataFrame(wide, ["session_start", "session_end"])
    ).first().max_concurrent == 2


def test_basket_rules_counts_and_lift(spark):
    from global_stock_data_warehouse_spark.operators.behavior import basket_rules

    rows = [
        (1, "beer"), (1, "chips"),
        (2, "beer"), (2, "chips"),
        (3, "beer"), (3, "soda"),
        (4, "soda"),
        (2, "beer"),           # duplicate item in a basket: counted once
    ]
    df = spark.createDataFrame(rows, ["basket_id", "item"])
    out = {(r.item_a, r.item_b): r for r in basket_rules(df, min_pair_count=1).collect()}
    bc = out[("beer", "chips")]
    assert bc.n_ab == 2
    assert bc.support == 0.5                       # 2 of 4 baskets
    assert bc.confidence == round(2 / 3, 6)        # beer in 3 baskets
    assert bc.lift == round(2 * 4 / (3 * 2), 6)    # > 1: positive association
    bs = out[("beer", "soda")]
    assert bs.n_ab == 1 and bs.lift == round(1 * 4 / (3 * 2), 6)  # < 1
    assert ("chips", "soda") not in out


def test_cohort_retention_pre_anchor_floor_division(spark):
    # dates BEFORE the 1970-01-05 anchor must floor (bucket 1969-12-29),
    # not truncate toward zero (which would bucket them AFTER the event)
    ev = spark.createDataFrame(
        [(1, dt.datetime(1970, 1, 2, 12, 0, 0))], ["user_id", "ts"]
    )
    rows = cohort_retention(ev, period_days=7).collect()
    assert len(rows) == 1
    assert rows[0].cohort_start.isoformat() == "1969-12-29"
    assert rows[0].period_offset == 0


def test_max_concurrency_empty_input_yields_no_rows(spark):
    from pyspark.sql.types import StructField, StructType, TimestampType

    from global_stock_data_warehouse_spark.operators.behavior import max_concurrency

    schema = StructType(
        [
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
        ]
    )
    empty = spark.createDataFrame([], schema)
    assert max_concurrency(empty).count() == 0


def test_decayed_totals_exact_dyadic_weights(spark):
    """Known ages -> known halving counts; the decayed sum is exact
    integer arithmetic (value 10.00 at age 0/7/14 days with halflife 7
    -> weights 1, 1/2, 1/4)."""
    import datetime as dt

    from global_stock_data_warehouse_spark.operators.behavior import decayed_totals

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        ("buy", base, 10.0),
        ("buy", base - dt.timedelta(days=7), 10.0),
        ("buy", base - dt.timedelta(days=14), 10.0),
        ("view", base - dt.timedelta(days=200), 4.0),  # past the cap
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {r.event_type: r for r in decayed_totals(df).collect()}
    assert out["buy"].n_events == 3
    assert out["buy"].raw_total == 30.0
    assert out["buy"].decayed_total == 10.0 + 5.0 + 2.5
    # age 200d = 28 halvings, capped at 10 -> weight 2^-10
    assert out["view"].decayed_total == round(4.0 / 1024, 6)
    # empty input: no rows, no divide-by-zero
    assert decayed_totals(df.limit(0)).count() == 0


def test_decayed_totals_excludes_null_ts_and_value(spark):
    """NULL ts would otherwise silently take the CAP weight (Spark least()
    skips NULLs) and NULL value would inflate n_events while feeding
    neither sum — both excluded up front."""
    import datetime as dt

    from global_stock_data_warehouse_spark.operators.behavior import decayed_totals

    base = dt.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [("buy", base, 10.0), ("buy", None, 99.0), ("buy", base, None)],
        "event_type string, ts timestamp, value double",
    )
    out = decayed_totals(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 1 and r.raw_total == 10.0 and r.decayed_total == 10.0


def test_cohort_and_transitions_exclude_null_keys(spark):
    """NULL user/ts/type rows are excluded uniformly: no NULL-offset
    retention rows, no NULL Markov states, NULL user never counted."""
    import datetime as dt

    from global_stock_data_warehouse_spark.operators.behavior import (
        cohort_retention,
        event_transitions,
    )

    t = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, t, 1, "view"),
        (2, t + dt.timedelta(minutes=9), 1, "purchase"),
        (3, t, None, "view"),
        (4, None, 2, "view"),
        (5, t, 2, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    ret = cohort_retention(ev).collect()
    assert all(r.period_offset is not None for r in ret)
    assert sum(r.n_users for r in ret if r.period_offset == 0) == 2  # users 1,2
    tr = event_transitions(ev).collect()
    assert all(r.from_type is not None and r.to_type is not None for r in tr)
    assert {(r.from_type, r.to_type) for r in tr} == {("view", "purchase")}
