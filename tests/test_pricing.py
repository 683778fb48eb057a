"""Corporate-action / price-quality battery: hand-computed checks for
split inference + backward adjustment, range position, overnight vs
intraday decomposition, liquidity deciles, and stale-run detection."""

import datetime as dt

from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.pricing import (
    infer_split_ratios,
    liquidity_screen,
    overnight_intraday_split,
    range_position_summary,
    split_adjusted_prices,
    stale_price_runs,
)
from global_stock_data_warehouse_spark.operators.timeseries import daily_close


def _bars(spark, vals, user=1):
    rows = [
        (user, i, dt.datetime(2024, 1, 1 + i, 12, 0), float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def _daily(spark, vals, user=1):
    return daily_close(_bars(spark, vals, user=user))


# --- split inference + adjustment ------------------------------------------


def test_split_detected_only_near_integer_ratio(spark):
    # 100 -> 50 is a clean 2:1; 100 -> 57 (ratio 1.75) and 100 -> 47
    # (ratio 2.13, off by >2%) are ordinary moves, not splits.
    d = _daily(spark, [100.0, 50.0, 57.0, 47.0])
    ratios = [r.split_ratio for r in infer_split_ratios(d).orderBy("d").collect()]
    assert ratios == [1, 2, 1, 1]


def test_split_ratio_bounds_respected(spark):
    # 100 -> 5 is 20:1 — outside [2, 10]; treated as a crash, not a split.
    d = _daily(spark, [100.0, 5.0])
    ratios = [r.split_ratio for r in infer_split_ratios(d).orderBy("d").collect()]
    assert ratios == [1, 1]


def test_backward_adjustment_factor_and_price(spark):
    # Two splits: 2:1 on day 2 (120 -> 60) and 3:1 on day 4 (66 -> 22).
    # Days before BOTH splits carry factor 6, between them factor 3,
    # after the last factor 1 — and the adjusted series is continuous.
    d = _daily(spark, [120.0, 60.0, 66.0, 22.0, 23.0])
    out = split_adjusted_prices(d).orderBy("d").collect()
    assert [r.split_ratio for r in out] == [1, 2, 1, 3, 1]
    assert [r.adj_factor for r in out] == [6, 3, 3, 1, 1]
    assert [r.adj_close for r in out] == [20.0, 20.0, 22.0, 22.0, 23.0]


def test_no_splits_factor_is_one(spark):
    d = _daily(spark, [10.0, 11.0, 12.0])
    out = split_adjusted_prices(d).orderBy("d").collect()
    assert all(r.adj_factor == 1 for r in out)
    assert [r.adj_close for r in out] == [10.0, 11.0, 12.0]


# --- range position ---------------------------------------------------------


def test_range_position_counts_and_last_pos(spark):
    # closes 10, 20, 15, 5, 20: new highs at d0 (degenerate), d1, d4;
    # new lows at d0, d3. Last close 20 == trailing high -> pos 1.0.
    d = _daily(spark, [10.0, 20.0, 15.0, 5.0, 20.0])
    r = range_position_summary(d, window=20).collect()[0]
    assert r.n_days == 5
    assert r.n_new_highs == 3
    assert r.n_new_lows == 2
    assert r.last_pos == 1.0


def test_range_position_degenerate_channel_pins_half(spark):
    # single bar: frame = itself, hi == lo -> pos pinned at 0.5
    d = _daily(spark, [42.0])
    r = range_position_summary(d, window=20).collect()[0]
    assert r.last_pos == 0.5


# --- overnight / intraday --------------------------------------------------


def test_overnight_intraday_decomposition(spark):
    # day1: open 100 close 110 (intraday +10%); day2: open 121 (overnight
    # +10% over close 110), close 121 (intraday 0%).
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 9), 100.0),
        (1, 1, dt.datetime(2024, 1, 1, 16), 110.0),
        (1, 2, dt.datetime(2024, 1, 2, 9), 121.0),
        (1, 3, dt.datetime(2024, 1, 2, 16), 121.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    r = overnight_intraday_split(df).collect()[0]
    assert r.n_intraday == 2
    assert r.n_overnight == 1
    assert r.mean_intraday == 0.05  # (10% + 0%) / 2
    assert r.mean_overnight == 0.1


# --- liquidity screen -------------------------------------------------------


def test_liquidity_screen_deciles_and_flag(spark):
    # 10 entities with dollar volume 1000, 900, ..., 100 on one day each:
    # deciles 1..10 in that order, only the heaviest flagged liquid.
    rows = [
        (u, u, dt.datetime(2024, 1, 1, 12), float(1000 - 100 * u))
        for u in range(10)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.user_id: r for r in liquidity_screen(df, window=20, n_tiles=10).collect()}
    assert [out[u].adv_decile for u in range(10)] == list(range(1, 11))
    assert [out[u].is_liquid for u in range(10)] == [1] + [0] * 9
    assert out[0].adv == 1000.0


def test_liquidity_screen_trailing_mean_at_latest_day(spark):
    # one entity, daily volumes 100 then 300: ADV at the latest day = 200
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 12), 100.0),
        (1, 1, dt.datetime(2024, 1, 2, 12), 300.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    r = liquidity_screen(df, window=20, n_tiles=10).collect()[0]
    assert r.adv == 200.0
    assert r.as_of == dt.date(2024, 1, 2)


# --- stale runs -------------------------------------------------------------


def test_stale_runs_detected_on_quantized_grid(spark):
    # grid 1.0: closes 10.0, 10.2, 10.4, 12.0, 12.0, 15.0 quantize to
    # 10,10,10,12,12,15 -> runs [3, 2, 1]: 3 stale days total, 2 runs,
    # max run 3.
    d = _daily(spark, [10.0, 10.2, 10.4, 12.0, 12.0, 15.0])
    r = stale_price_runs(d, grid=1.0, min_run=2).collect()[0]
    assert r.n_stale_days == 3
    assert r.n_stale_runs == 2
    assert r.max_run_len == 3


def test_stale_runs_none_when_always_moving(spark):
    d = _daily(spark, [10.0, 20.0, 30.0])
    r = stale_price_runs(d, grid=1.0, min_run=2).collect()[0]
    assert r.n_stale_days == 0
    assert r.n_stale_runs == 0
    assert r.max_run_len == 1


def test_stale_runs_fully_halted_series(spark):
    d = _daily(spark, [10.0, 10.0, 10.0, 10.0])
    r = stale_price_runs(d, grid=1.0, min_run=2).collect()[0]
    assert r.n_stale_days == 3
    assert r.n_stale_runs == 1
    assert r.max_run_len == 4


# --- index daily return ------------------------------------------------------


def test_index_return_weighted_mean_exact(spark):
    import datetime as dt

    # two entities, one return day each: A first close 100 (weight 100),
    # +10%; B first close 300 (weight 300), -10%. Weighted mean =
    # (100*0.1 + 300*-0.1)/400 = -0.05.
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 12), 100.0),
        (1, 1, dt.datetime(2024, 1, 2, 12), 110.0),
        (2, 2, dt.datetime(2024, 1, 1, 12), 300.0),
        (2, 3, dt.datetime(2024, 1, 2, 12), 270.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    from global_stock_data_warehouse_spark.operators.pricing import (
        index_daily_return,
    )
    from global_stock_data_warehouse_spark.operators.timeseries import daily_close

    out = index_daily_return(daily_close(df)).collect()
    assert len(out) == 1  # day 1 has no previous close
    r = out[0]
    assert r.n_members == 2
    assert r.n_advancers == 1 and r.n_decliners == 1
    assert r.index_return == -0.05


def test_index_return_penny_stock_floor_weight(spark):
    import datetime as dt

    # a 0.2-dollar stock floors to weight 1 instead of 0 (would divide
    # by zero in a single-member cross-section)
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 12), 0.2),
        (1, 1, dt.datetime(2024, 1, 2, 12), 0.3),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    from global_stock_data_warehouse_spark.operators.pricing import (
        index_daily_return,
    )
    from global_stock_data_warehouse_spark.operators.timeseries import daily_close

    r = index_daily_return(daily_close(df)).collect()[0]
    assert r.index_return == 0.5


# --- factor rank IC ----------------------------------------------------------


def test_rank_ic_perfect_persistence(spark):
    # three entities whose return ORDER is identical today and tomorrow
    # -> tie-broken Spearman exactly 1.
    import datetime as dt

    rows = []
    eid = 0
    # entity u: closes 100, 100*(1+u*0.01), that*(1+u*0.01) -> ret order
    # by u on both days
    for u in range(1, 4):
        c = 100.0
        for day in range(3):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
            eid += 1
            c = c * (1 + u * 0.01)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    from global_stock_data_warehouse_spark.operators.pricing import factor_rank_ic
    from global_stock_data_warehouse_spark.operators.timeseries import daily_close

    out = factor_rank_ic(daily_close(df), min_members=3).collect()
    assert len(out) == 1
    assert out[0].n_members == 3
    assert out[0].rank_ic == 1.0


def test_rank_ic_perfect_reversal(spark):
    # return order today is exactly reversed tomorrow -> Spearman -1
    import datetime as dt

    seqs = {1: [100.0, 101.0, 104.0], 2: [100.0, 102.0, 103.0], 3: [100.0, 103.0, 103.1]}
    rows = []
    eid = 0
    for u, closes in seqs.items():
        for day, c in enumerate(closes):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    from global_stock_data_warehouse_spark.operators.pricing import factor_rank_ic
    from global_stock_data_warehouse_spark.operators.timeseries import daily_close

    out = factor_rank_ic(daily_close(df), min_members=3).collect()
    assert len(out) == 1
    assert out[0].rank_ic == -1.0


def test_rank_ic_min_members_drops_small_dates(spark):
    import datetime as dt

    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 12), 100.0),
        (1, 1, dt.datetime(2024, 1, 2, 12), 110.0),
        (1, 2, dt.datetime(2024, 1, 3, 12), 120.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    from global_stock_data_warehouse_spark.operators.pricing import factor_rank_ic
    from global_stock_data_warehouse_spark.operators.timeseries import daily_close

    assert factor_rank_ic(daily_close(df), min_members=3).count() == 0


# --- boundary edges (r9 discipline: test the exact constants) ----------------


def test_split_tolerance_just_inside_boundary_kept(spark):
    # |r - k| <= 0.02*k: a ratio of 2.0399 (inside the 2% band) is a
    # split. (The EXACT boundary 2.04 is not float-representable after
    # the prev/close round-trip — it lands a half-ulp outside and is
    # correctly rejected; the inclusive <= only matters for exact
    # decimals, which doubles here never are.)
    prev, k = 100.0, 2
    cl = prev / (k * 1.01995)
    d = _daily(spark, [prev, cl])
    ratios = [r.split_ratio for r in infer_split_ratios(d).orderBy("d").collect()]
    assert ratios == [1, 2]


def test_split_tolerance_just_past_boundary_rejected(spark):
    prev, k = 100.0, 2
    cl = prev / (k * 1.021)  # ratio 2.042: just past the 2% tolerance
    d = _daily(spark, [prev, cl])
    ratios = [r.split_ratio for r in infer_split_ratios(d).orderBy("d").collect()]
    assert ratios == [1, 1]


def test_liquidity_tied_adv_breaks_by_key(spark):
    # two entities with IDENTICAL ADV: the (adv desc, key) tiebreak puts
    # the smaller key in the earlier tile deterministically
    rows = [
        (7, 0, dt.datetime(2024, 1, 1, 12), 100.0),
        (3, 1, dt.datetime(2024, 1, 1, 12), 100.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.user_id: r.adv_decile for r in liquidity_screen(df, n_tiles=2).collect()}
    assert out == {3: 1, 7: 2}


def test_overnight_single_day_has_no_overnight_leg(spark):
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 9), 100.0),
        (1, 1, dt.datetime(2024, 1, 1, 16), 110.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    r = overnight_intraday_split(df).collect()[0]
    assert r.n_overnight == 0
    assert r.mean_overnight is None
    assert r.mean_intraday == 0.1


def test_rank_ic_exactly_min_members_kept(spark):
    from global_stock_data_warehouse_spark.operators.pricing import factor_rank_ic

    # 3 entities x 3 days -> one IC date with n_members == 3 == min_members
    rows = []
    eid = 0
    for u in range(1, 4):
        c = 100.0
        for day in range(3):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
            eid += 1
            c *= 1 + u * 0.01
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = factor_rank_ic(daily_close(df), min_members=3).collect()
    assert len(out) == 1 and out[0].n_members == 3


# --- beta vs index ------------------------------------------------------------


def test_beta_of_index_replica_is_one(spark):
    from global_stock_data_warehouse_spark.operators.pricing import beta_vs_index

    # two identical entities: each IS the index, so beta == 1, alpha == 0
    rows = []
    eid = 0
    for u in (1, 2):
        c = 100.0
        for day, mult in enumerate([1.0, 1.01, 0.99, 1.02, 0.98, 1.03, 0.97]):
            c *= mult
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = beta_vs_index(daily_close(df), min_days=5).collect()
    for r in out:
        assert r.beta == 1.0
        assert r.alpha == 0.0


def test_beta_min_days_guard(spark):
    from global_stock_data_warehouse_spark.operators.pricing import beta_vs_index

    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 12), 100.0),
        (1, 1, dt.datetime(2024, 1, 2, 12), 101.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    r = beta_vs_index(daily_close(df), min_days=5).collect()[0]
    assert r.beta is None and r.alpha is None


def test_beta_winsorization_clamps_extreme_moves(spark):
    from global_stock_data_warehouse_spark.operators.pricing import beta_vs_index

    # a 100x move (999,900 bp) must enter the sums as the +-50,000 bp
    # clamp, keeping every OLS sum inside int64; with one entity the
    # entity IS the index, so beta stays exactly 1 even at the clamp
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 12), 1.0),
        (1, 1, dt.datetime(2024, 1, 2, 12), 100.0),
        (1, 2, dt.datetime(2024, 1, 3, 12), 1.0),
        (1, 3, dt.datetime(2024, 1, 4, 12), 100.0),
        (1, 4, dt.datetime(2024, 1, 5, 12), 1.0),
        (1, 5, dt.datetime(2024, 1, 6, 12), 100.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    r = beta_vs_index(daily_close(df), min_days=5).collect()[0]
    assert r.beta == 1.0


# --- calendar anomalies --------------------------------------------------------


def test_calendar_iso_dow_mapping_and_means(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        calendar_anomalies,
    )

    # 2024-01-01 is a Monday; the return lands on Tuesday (iso_dow 2)
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 12), 100.0),  # Mon
        (1, 1, dt.datetime(2024, 1, 2, 12), 110.0),  # Tue: +10%
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.iso_dow: r for r in calendar_anomalies(daily_close(df)).collect()}
    assert set(out) == {2}
    assert out[2].n_obs == 1
    assert out[2].mean_return == 0.1
    assert out[2].up_share == 1.0


# --- market regime streaks ------------------------------------------------------


def test_regime_streaks_runs_and_longest(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        market_regime_streaks,
    )

    # 3 entities; day d return sign pattern: ++-, ++-, --+, ++- ->
    # regimes: on, on, off, on -> risk_on: 3 days in 2 runs (longest 2),
    # risk_off: 1 day 1 run
    patterns = {
        1: [100, 101, 102, 101.0, 102],
        2: [100, 101, 102, 101.5, 103],
        3: [100, 99, 98, 99.0, 98],
    }
    rows = []
    eid = 0
    for u, closes in patterns.items():
        for day, c in enumerate(closes):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), float(c)))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.regime: r for r in market_regime_streaks(daily_close(df)).collect()}
    assert out["risk_on"].n_days == 3
    assert out["risk_on"].n_runs == 2
    assert out["risk_on"].longest_run == 2
    assert out["risk_off"].n_days == 1
    assert out["risk_off"].n_runs == 1


# --- decile spread backtest -----------------------------------------------------


def test_decile_spread_top_bottom_means(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        decile_spread_backtest,
    )

    # 10 entities, 3 days; entity u's return each day is u% (persistent
    # momentum): top quintile (u=10,9) fwd mean = 9.5%, bottom (u=1,2)
    # = 1.5%, spread 8%.
    rows = []
    eid = 0
    for u in range(1, 11):
        c = 100.0
        for day in range(3):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
            eid += 1
            c *= 1 + u / 100.0
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = decile_spread_backtest(daily_close(df), n_tiles=5, min_members=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_members == 10
    assert r.top_tile_return == 0.095
    assert r.bottom_tile_return == 0.015
    assert r.spread == 0.08


def test_decile_spread_min_members_guard(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        decile_spread_backtest,
    )

    rows = []
    eid = 0
    for u in (1, 2):
        for day, c in enumerate([100.0, 110.0, 121.0]):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    assert (
        decile_spread_backtest(daily_close(df), n_tiles=5, min_members=10).count()
        == 0
    )


# --- risk summary ---------------------------------------------------------------


def test_risk_summary_hand_computed_moments(spark):
    import math

    from global_stock_data_warehouse_spark.operators.pricing import risk_summary

    # returns exactly +1%, -1%, +1%, -1%, +1% (bp x = [100,-100,100,-100,100])
    closes = [100.0]
    for r in [0.01, -0.01, 0.01, -0.01, 0.01]:
        closes.append(closes[-1] * (1 + r))
    d = _daily(spark, closes)
    r = risk_summary(d, min_days=5).collect()[0]
    assert r.n_days == 5
    xs = [100, -100, 100, -100, 100]
    n = 5
    mean = sum(xs) / n
    var = (n * sum(v * v for v in xs) - sum(xs) ** 2) / (n * (n - 1))
    assert r.mean_return == round(mean / 1e4, 6)
    assert abs(r.volatility - math.sqrt(var) / 1e4) < 1e-6
    assert abs(r.sharpe - mean / math.sqrt(var)) < 1e-6


def test_risk_summary_zero_vol_guards(spark):
    from global_stock_data_warehouse_spark.operators.pricing import risk_summary

    # perfectly constant returns: vol 0 -> sharpe/skew NULL, never NaN
    closes = [100.0 * (1.01 ** i) for i in range(7)]
    d = _daily(spark, closes)
    r = risk_summary(d, min_days=5).collect()[0]
    assert r.volatility == 0.0
    assert r.sharpe is None and r.skewness is None
    assert r.mean_return == 0.01


def test_risk_summary_winsorizes_100x_move(spark):
    from global_stock_data_warehouse_spark.operators.pricing import risk_summary

    # a 100x day clamps to +100% in the moment sums (VaR, on raw
    # returns, still sees the truth)
    d = _daily(spark, [1.0, 100.0, 100.0, 100.0, 100.0, 100.0, 100.0])
    r = risk_summary(d, min_days=5).collect()[0]
    assert r.mean_return == round(10000 / 6 / 1e4, 6)  # one clamped +1e4 bp over 6 days


# --- r10 boundary edges (VERDICT r9 item 5) --------------------------------


def test_risk_summary_exactly_min_days_boundary(spark):
    from global_stock_data_warehouse_spark.operators.pricing import risk_summary

    # entity 1: exactly min_days return observations -> sharpe/skew
    # populated; entity 2: min_days - 1 -> row present (n_days >= 2)
    # but sharpe/skew NULL. Same +-1% alternation so variance > 0.
    def closes(n_rets):
        cs = [100.0]
        for i in range(n_rets):
            cs.append(cs[-1] * (1.01 if i % 2 == 0 else 0.99))
        return cs

    rows = []
    eid = 0
    for u, n_rets in ((1, 5), (2, 4)):
        for day, c in enumerate(closes(n_rets)):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), float(c)))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.user_id: r for r in risk_summary(daily_close(df), min_days=5).collect()}
    assert out[1].n_days == 5
    assert out[1].sharpe is not None and out[1].skewness is not None
    assert out[2].n_days == 4
    assert out[2].sharpe is None and out[2].skewness is None
    assert out[2].volatility is not None  # n>=2 moments still reported


def test_risk_summary_var95_interpolation_boundary(spark):
    from global_stock_data_warehouse_spark.operators.pricing import risk_summary

    # percentile(., 0.05) interpolates at position 0.05*(n-1).
    # n=21 returns -> position exactly 1.0: var95 IS the second-smallest
    # return, no interpolation.
    rets_21 = [-0.10, -0.05] + [0.001 * (i + 1) for i in range(19)]
    cs = [100.0]
    for r in rets_21:
        cs.append(cs[-1] * (1 + r))
    r21 = risk_summary(_daily(spark, cs), min_days=5).collect()[0]
    assert r21.n_days == 21
    assert r21.var95 == -0.05
    # n=11 returns -> position 0.5: exact midpoint of the two smallest.
    rets_11 = [-0.10, -0.05] + [0.001 * (i + 1) for i in range(9)]
    cs = [100.0]
    for r in rets_11:
        cs.append(cs[-1] * (1 + r))
    r11 = risk_summary(_daily(spark, cs), min_days=5).collect()[0]
    assert r11.n_days == 11
    assert r11.var95 == -0.075


def test_decile_spread_fewer_entities_than_tiles(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        decile_spread_backtest,
    )

    # 3 entities into 5 tiles: ntile assigns 1..3, tile 5 is EMPTY ->
    # bottom leg (and spread) NULL, top leg still real. No crash, no
    # division blowup.
    rows = []
    eid = 0
    for u, mult in ((1, 1.03), (2, 1.02), (3, 1.01)):
        c = 100.0
        for day in range(3):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
            eid += 1
            c *= mult
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = decile_spread_backtest(
        daily_close(df), n_tiles=5, min_members=1
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_members == 3
    assert r.top_tile_return == 0.03  # entity 1 persists at +3%
    assert r.bottom_tile_return is None and r.spread is None


def test_decile_spread_all_equal_returns_zero_spread(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        decile_spread_backtest,
    )

    # every entity moves identically: tie-broken tiles are arbitrary but
    # forward returns are equal everywhere -> spread exactly 0.
    rows = []
    eid = 0
    for u in range(1, 11):
        c = 100.0
        for day in range(3):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
            eid += 1
            c *= 1.02
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = decile_spread_backtest(daily_close(df), n_tiles=5, min_members=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.top_tile_return == r.bottom_tile_return == 0.02
    assert r.spread == 0.0


def test_beta_clamp_boundary_exactly_500pct(spark):
    from global_stock_data_warehouse_spark.operators.pricing import beta_vs_index

    # winsor boundary is +50,000 bp = +500%. A x6 day sits EXACTLY on
    # the boundary (kept as 50,000, not altered); any overshoot (x7)
    # clamps back to the identical 50,000 -> the whole OLS output must
    # be bit-identical between the two datasets. A below-boundary x5.5
    # day (45,000 bp) must differ.
    def universe(extreme_mult):
        rows = []
        eid = 0
        series = {
            1: [1.0, extreme_mult, 0.5, 2.0, 0.8, 1.5],  # the jumpy name
            2: [1.0, 1.01, 0.99, 1.02, 0.98, 1.03],      # index ballast
            3: [1.0, 0.99, 1.01, 0.98, 1.02, 0.97],
        }
        for u, mults in series.items():
            c = 100.0
            for day, m in enumerate(mults):
                c *= m
                rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
                eid += 1
        return spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, value double"
        )

    def betas(mult):
        return {
            r.user_id: (r.beta, r.alpha)
            for r in beta_vs_index(daily_close(universe(mult)), min_days=5).collect()
        }

    at_boundary, overshoot, below = betas(6.0), betas(7.0), betas(5.5)
    assert at_boundary == overshoot
    assert at_boundary != below


def test_regime_streaks_tie_date_is_flat(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        market_regime_streaks,
    )

    # day 2: one advancer, one decliner -> advancers == decliners ->
    # "flat" regime; day 3: both up -> risk_on.
    patterns = {1: [100.0, 101.0, 102.0], 2: [100.0, 99.0, 101.0]}
    rows = []
    eid = 0
    for u, closes in patterns.items():
        for day, c in enumerate(closes):
            rows.append((u, eid, dt.datetime(2024, 1, 1 + day, 12), c))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.regime: r for r in market_regime_streaks(daily_close(df)).collect()}
    assert out["flat"].n_days == 1
    assert out["flat"].n_runs == 1
    assert out["flat"].longest_run == 1
    assert out["risk_on"].n_days == 1


# --- r10 additions: amihud / underwater / turn-of-month --------------------


def test_amihud_hand_computed(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        amihud_illiquidity,
    )

    # one event per day: closes 100 -> 110 -> 99, dollar vol = the close.
    # day2: |ret|=10% on $110 -> 1000bp*1e10 // 11000c = 909_090_909
    # day3: |ret|=10% on $99  -> 1000bp*1e10 //  9900c = 1_010_101_010
    df = _bars(spark, [100.0, 110.0, 99.0])
    r = amihud_illiquidity(df).collect()[0]
    assert r.n_days == 2
    day2, day3 = 10**13 // 11000, 10**13 // 9900
    assert r.amihud_worst_day == day3 / 1e6
    import math

    assert r.amihud == math.floor((day2 + day3) / 2 + 0.5) / 1e6


def test_amihud_zero_volume_days_drop(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        amihud_illiquidity,
    )

    # a day whose traded value sums to zero cents contributes no ratio
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 12), 100.0),
        (1, 1, dt.datetime(2024, 1, 2, 12), 0.0),  # close 0, dvol 0
        (1, 2, dt.datetime(2024, 1, 3, 12), 100.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = amihud_illiquidity(df).collect()
    # day2: prev>0 but dvol_c=0 -> drops; day3: prev=0 -> ret NULL -> drops
    assert out == []


def test_underwater_spells_hand_computed(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        underwater_spells,
    )

    # peaks: 100,100,100,101,101,101,102 -> uw: 0,1,1,0,1,1,0
    d = _daily(spark, [100.0, 90.0, 95.0, 101.0, 100.0, 99.0, 102.0])
    r = underwater_spells(d).collect()[0]
    assert r.n_underwater_days == 4
    assert r.n_spells == 2
    assert r.longest_spell == 2


def test_underwater_never_below_peak(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        underwater_spells,
    )

    # monotone rising series: zero underwater days, zero spells
    d = _daily(spark, [100.0, 101.0, 102.0, 103.0])
    r = underwater_spells(d).collect()[0]
    assert r.n_underwater_days == 0
    assert r.n_spells == 0
    assert r.longest_spell == 0


def test_turn_of_month_buckets_and_counts(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        turn_of_month_effect,
    )

    # Jan 1-10 + Feb 1-4, every day +1%. Jan day1 has no return.
    # first3: Jan 2,3 + Feb 1 (rn=1 in a 4-day month, rnd=4) = 3 obs
    # middle: Jan 4-7 = 4 obs
    # last3:  Jan 8,9,10 + Feb 2,3,4 = 6 obs (short-month last-overrides)
    rows = []
    c = 100.0
    eid = 0
    days = [dt.datetime(2024, 1, d, 12) for d in range(1, 11)] + [
        dt.datetime(2024, 2, d, 12) for d in range(1, 5)
    ]
    for t in days:
        rows.append((1, eid, t, c))
        eid += 1
        c *= 1.01
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.month_bucket: r for r in turn_of_month_effect(daily_close(df)).collect()}
    assert out["first3"].n_obs == 3
    assert out["middle"].n_obs == 4
    assert out["last3"].n_obs == 6
    for b in out.values():
        assert b.mean_return == 0.01
        assert b.up_share == 1.0


def test_calendar_coverage_vs_market_calendar(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        trading_calendar_coverage,
    )

    # market calendar = days 1..5 (union over entities).
    # u1 trades all 5 -> 1.0; u2 trades 1,3,5 (span 1..5) -> 3/5 = 0.6;
    # u3 trades 2,3 (span idx 2..3) -> 2/2 = 1.0
    rows = []
    eid = 0
    series = {1: [1, 2, 3, 4, 5], 2: [1, 3, 5], 3: [2, 3]}
    for u, days in series.items():
        for day in days:
            rows.append((u, eid, dt.datetime(2024, 1, day, 12), 100.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {
        r.user_id: r
        for r in trading_calendar_coverage(daily_close(df), min_coverage=0.95).collect()
    }
    assert (out[1].n_days, out[1].n_expected, out[1].coverage, out[1].is_complete) == (5, 5, 1.0, 1)
    assert (out[2].n_days, out[2].n_expected, out[2].coverage, out[2].is_complete) == (3, 5, 0.6, 0)
    assert (out[3].n_days, out[3].n_expected, out[3].coverage, out[3].is_complete) == (2, 2, 1.0, 1)


def test_volume_profile_shares(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        volume_profile_by_hour,
    )

    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 9, 5), 100.0),
        (2, 1, dt.datetime(2024, 1, 1, 9, 40), 50.0),
        (1, 2, dt.datetime(2024, 1, 2, 15, 10), 50.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.hour_of_day: r for r in volume_profile_by_hour(df).collect()}
    assert (out[9].n_events, out[9].dollar_volume, out[9].volume_share) == (2, 150.0, 0.75)
    assert (out[15].n_events, out[15].dollar_volume, out[15].volume_share) == (1, 50.0, 0.25)


def test_calendar_coverage_single_bar_entity(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        trading_calendar_coverage,
    )

    # boundary: u2 has exactly ONE bar, so _lo == _hi and the expected
    # span is 1 day — coverage must be exactly 1.0 (div by 1, never 0);
    # u1 spans the FULL market calendar with no gaps (the other edge).
    rows = []
    eid = 0
    for day in (1, 2, 3):
        rows.append((1, eid, dt.datetime(2024, 1, day, 12), 100.0))
        eid += 1
    rows.append((2, eid, dt.datetime(2024, 1, 2, 12), 55.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {
        r.user_id: r for r in trading_calendar_coverage(daily_close(df)).collect()
    }
    assert (out[2].n_days, out[2].n_expected, out[2].coverage, out[2].is_complete) == (1, 1, 1.0, 1)
    assert (out[1].n_days, out[1].n_expected, out[1].coverage, out[1].is_complete) == (3, 3, 1.0, 1)


def test_calendar_coverage_threshold_fixed_point(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        trading_calendar_coverage,
    )

    # r10 ADVICE contract pin: the threshold rides the floor(x*scale+0.5)
    # idiom (bare int(0.29*1e6) truncates to 289999). An entity at
    # EXACTLY the threshold (29/100 days vs min_coverage=0.29 -> fx
    # 290000 vs 290000) is complete; one day fewer is not. The 1-fx-unit
    # truncation gap itself is unreachable for spans < 1e6 days, so this
    # pins the >=-at-exact-threshold contract the idiom guarantees.
    rows = []
    eid = 0
    # u1 defines a 100-day market calendar (days 0..99 of 2024)
    base = dt.datetime(2024, 1, 1, 12)
    for d in range(100):
        rows.append((1, eid, base + dt.timedelta(days=d), 100.0))
        eid += 1
    # u2: first + last bar pin the full span; 29 days present total
    for d in [0, 99] + list(range(1, 28)):
        rows.append((2, eid, base + dt.timedelta(days=d), 50.0))
        eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {
        r.user_id: r
        for r in trading_calendar_coverage(
            daily_close(df), min_coverage=0.29
        ).collect()
    }
    assert (out[2].n_days, out[2].n_expected) == (29, 100)
    assert out[2].is_complete == 1  # exactly at threshold -> complete
    out = {
        r.user_id: r
        for r in trading_calendar_coverage(
            daily_close(df), min_coverage=0.30
        ).collect()
    }
    assert out[2].is_complete == 0  # 0.29 coverage < 0.30 threshold


def test_volume_profile_single_hour_and_zero_total(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        volume_profile_by_hour,
    )

    # all volume in ONE hour: that hour's share is exactly 1.0
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 9, 5), 100.0),
        (2, 1, dt.datetime(2024, 1, 2, 9, 40), 50.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.hour_of_day: r for r in volume_profile_by_hour(df).collect()}
    assert set(out) == {9}
    assert (out[9].n_events, out[9].dollar_volume, out[9].volume_share) == (2, 150.0, 1.0)

    # zero grand total (every event under half a cent): the share is
    # NULL on the div-nullif branch, never a crash or a 0-division
    rows = [
        (1, 0, dt.datetime(2024, 1, 1, 9, 5), 0.001),
        (2, 1, dt.datetime(2024, 1, 1, 15, 40), 0.004),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r.hour_of_day: r for r in volume_profile_by_hour(df).collect()}
    assert set(out) == {9, 15}
    for h in (9, 15):
        assert out[h].dollar_volume == 0.0
        assert out[h].volume_share is None


def test_amihud_tiebreak_cols_frame_without_event_id(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        amihud_illiquidity,
    )

    # r10 ADVICE: the daily-close tiebreak used to hardcode event_id and
    # threw AnalysisException on frames lacking that column. A frame
    # with a seq column instead must work via tiebreak_cols, and the
    # last-in-tiebreak-order bar must win the daily close.
    rows = [
        # day 1: closes at 100 (seq 2 wins over seq 1's 90)
        (1, dt.datetime(2024, 1, 1, 10), 1, 90.0),
        (1, dt.datetime(2024, 1, 1, 10), 2, 100.0),
        # day 2: close 110 -> +10% return, dollar vol 110
        (1, dt.datetime(2024, 1, 2, 10), 3, 110.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, seq long, value double"
    )
    out = amihud_illiquidity(df, tiebreak_cols=("ts", "seq")).collect()
    assert len(out) == 1 and out[0].n_days == 1
    # |ret_bp| = 1000; dvol_c sums ALL bars of day 2 = 11000 cents;
    # amihud_e6 = 1000 * 1e10 div 11000 / 1e6 = 909.090909
    assert abs(out[0].amihud - 909.090909) < 1e-6


def test_turn_of_month_labels_follow_edge_days(spark):
    from global_stock_data_warehouse_spark.operators.pricing import (
        turn_of_month_effect,
    )

    # r10 ADVICE: edge_days=5 must emit first5/last5, not first3/last3
    rows = []
    c, eid = 100.0, 0
    for d in range(1, 21):
        rows.append((1, eid, dt.datetime(2024, 1, d, 12), c))
        eid += 1
        c *= 1.01
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {
        r.month_bucket: r
        for r in turn_of_month_effect(daily_close(df), edge_days=5).collect()
    }
    assert set(out) == {"first5", "middle", "last5"}
    # 20 trading days, day 1 has no return: first5 = days 2-5 (4 obs),
    # last5 = days 16-20 (5 obs), middle = days 6-15 (10 obs)
    assert out["first5"].n_obs == 4
    assert out["middle"].n_obs == 10
    assert out["last5"].n_obs == 5
