"""Corporate-action / price-quality operators: split-adjusted prices,
trailing range position, overnight-vs-intraday return decomposition,
liquidity (ADV) screening, stale-price run detection.

The reference warehouse stores RAW vendor closes and recomputes period
returns from them (`downloader_wmy.py:54-58`); every real consumer of
that table immediately needs the adjusted series (splits poison raw
returns), a liquidity screen (thin names poison factor studies), and a
staleness audit (halted/stale ticks poison everything). This module is
that post-ingest battery, built on the same `daily_close` bar root as
the indicator battery in `timeseries.py`.

Scale design (same contract as `timeseries.py`):

- ONE hash exchange per query: every operator partitions by the entity
  key once; all windows and final aggregates reuse that clustering.
- Bounded or running frames only — O(1)/O(frame) state per row, no
  per-entity collect.
- Cross-engine exactness: split factors are exact small integers
  (recovered via round(exp(sum ln)) — the product is integer-valued and
  far below 2^53, so the float error of the log-sum cannot move the
  rounded result); money sums ride fixed-point bigints; final floats
  are rounded with the engine-shared floor(x*scale + 0.5)/scale idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fx(col, scale: float = 1e6):
    """floor(x*scale + 0.5)/scale — half-up rounding that both Spark and
    DuckDB evaluate identically (F.round is HALF_UP here, banker's
    there; floor sidesteps the divergence)."""
    return F.floor(col * scale + F.lit(0.5)) / scale


def infer_split_ratios(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
    min_ratio: int = 2,
    max_ratio: int = 10,
    tol: float = 0.02,
) -> DataFrame:
    """Flag forward-split days from the raw close series: a day whose
    previous close is within ``tol`` (relative) of an integer multiple
    k in [min_ratio, max_ratio] of today's close is inferred as a k:1
    split. Adds an integer ``split_ratio`` column (1 = no split).

    The strict integer-proximity test keeps false positives (ordinary
    crashes) out and bounds the cumulative factor: real splits are
    2:1..10:1, and a product of a handful of small integers stays far
    below 2^53 — the property `split_adjusted_prices` relies on to
    recover the factor exactly from a log-sum.
    """
    w = Window.partitionBy(key_col).orderBy("d")
    prev = F.lag(value_col).over(w)
    r = prev / F.col(value_col)
    k = F.floor(r + F.lit(0.5))
    is_split = (
        prev.isNotNull()
        & (F.col(value_col) > 0)
        & k.between(min_ratio, max_ratio)
        & (F.abs(r - k) <= F.lit(tol) * k)
    )
    return daily.withColumn(
        "split_ratio", F.when(is_split, k.cast("bigint")).otherwise(F.lit(1).cast("bigint"))
    )


def split_adjusted_prices(
    daily: DataFrame, key_col: str = "user_id", value_col: str = "close"
) -> DataFrame:
    """Backward split adjustment: every close BEFORE a k:1 split is
    divided by the product of all future split ratios, yielding the
    continuous adjusted series (what every charting/return pipeline
    consumes; the reference's raw `Close` column leaves this to the
    reader, `downloader_wmy.py:54-58`).

    adj_factor(t) = prod(split_ratio(s) for s > t), computed as a
    DESC-ordered running log-sum over rows strictly before the current
    frame row (i.e. strictly-future days), exponentiated and rounded
    back to the exact integer — valid because the true product is an
    integer << 2^53 while the log-sum's float error is ~1e-13 relative.
    One window over the same (key, d) clustering as the split
    inference: no extra exchange.
    """
    with_ratio = infer_split_ratios(daily, key_col=key_col, value_col=value_col)
    w_future = (
        Window.partitionBy(key_col)
        .orderBy(F.col("d").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    log_sum = F.sum(F.log(F.col("split_ratio").cast("double"))).over(w_future)
    factor = F.floor(F.exp(F.coalesce(log_sum, F.lit(0.0))) + F.lit(0.5)).cast("bigint")
    return (
        with_ratio.withColumn("adj_factor", factor)
        .withColumn("adj_close", _fx(F.col(value_col) / F.col("adj_factor")))
    )


def range_position_summary(
    daily: DataFrame,
    window: int = 20,
    key_col: str = "user_id",
    value_col: str = "close",
) -> DataFrame:
    """Trailing N-day high/low channel: per entity, how many closes set
    a new trailing high / new trailing low, and where the latest close
    sits inside its channel (0 = at the low, 1 = at the high; pinned to
    0.5 when the channel is degenerate hi == lo — each entity's first
    bar always is, its frame being just itself, and a NULL here would
    drag engine-divergent NULL-skip semantics of last/max_by into the
    hash).

    min/max window aggregates are order-independent (exact on both
    engines), the position is one IEEE division of two exact inputs —
    bit-identical cross-engine — so the whole summary is hash-safe.
    """
    frame = (
        Window.partitionBy(key_col).orderBy("d").rowsBetween(-(window - 1), 0)
    )
    hi = F.max(value_col).over(frame)
    lo = F.min(value_col).over(frame)
    pos = F.when(hi > lo, _fx((F.col(value_col) - lo) / (hi - lo))).otherwise(
        F.lit(0.5)
    )
    enriched = (
        daily.withColumn("_hi", hi)
        .withColumn("_lo", lo)
        .withColumn("_pos", pos)
        .withColumn("_new_high", (F.col(value_col) >= F.col("_hi")).cast("int"))
        .withColumn("_new_low", (F.col(value_col) <= F.col("_lo")).cast("int"))
    )
    return enriched.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_new_high").alias("n_new_highs"),
        F.sum("_new_low").alias("n_new_lows"),
        F.max_by("_pos", "d").alias("last_pos"),
    )


def overnight_intraday_split(
    bars: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Decompose each entity's daily return into the overnight gap
    (open / previous close - 1) and the intraday move (close / open
    - 1) and report per-entity means — the classic microstructure
    question "does the return accrue while the market is open?".

    Each day's return legs are rounded to 1e-8 fixed-point bigints
    BEFORE the per-entity sum, making the mean an exact
    integer-sum / count — order-independent, hash-safe. One groupBy +
    one window + one final agg, all on HashPartitioning(key): a single
    exchange end-to-end.
    """
    daily = (
        bars.filter(
            F.col(key_col).isNotNull()
            & F.col(time_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .repartition(key_col)
        .groupBy(F.col(key_col), F.to_date(time_col).alias("d"))
        .agg(
            F.min_by(value_col, F.struct(*tiebreak_cols)).alias("open"),
            F.max_by(value_col, F.struct(*tiebreak_cols)).alias("close"),
        )
    )
    w = Window.partitionBy(key_col).orderBy("d")
    prev_close = F.lag("close").over(w)
    intraday_fx = F.when(
        F.col("open") > 0,
        F.floor((F.col("close") / F.col("open") - 1.0) * 1e8 + F.lit(0.5)).cast("bigint"),
    )
    overnight_fx = F.when(
        prev_close > 0,
        F.floor((F.col("open") / prev_close - 1.0) * 1e8 + F.lit(0.5)).cast("bigint"),
    )
    legs = daily.withColumn("_intra", intraday_fx).withColumn("_over", overnight_fx)
    return legs.groupBy(key_col).agg(
        F.count("_intra").alias("n_intraday"),
        F.count("_over").alias("n_overnight"),
        _fx(F.sum("_intra") / F.count("_intra") / 1e8).alias("mean_intraday"),
        _fx(F.sum("_over") / F.count("_over") / 1e8).alias("mean_overnight"),
    )


def liquidity_screen(
    bars: DataFrame,
    window: int = 20,
    n_tiles: int = 10,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Average-daily-volume screen: trailing N-day mean of each
    entity's daily dollar volume (cents-exact bigint sums), evaluated
    at the entity's latest day, then decile-ranked across the universe.
    flag = 1 marks the top tile — the "liquid enough to trade" set.

    The cross-entity ntile window runs over ONE ROW PER ENTITY (the
    latest-day snapshot), so the single-partition sort is bounded by
    the universe size (thousands), not the bar count — the same
    bounded-by-contract shape as the 64-row stratum windows in
    `corpus.py`. Ties are broken (adv, key) so the tile assignment is
    deterministic on both engines.
    """
    daily = (
        bars.filter(
            F.col(key_col).isNotNull()
            & F.col(time_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .repartition(key_col)
        .groupBy(F.col(key_col), F.to_date(time_col).alias("d"))
        # cents via the module-wide floor(x*scale + 0.5) idiom (see _fx):
        # F.round is engine-divergent on half-way cases vs DuckDB round.
        .agg(
            F.sum(
                F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
            ).alias("dvol_c")
        )
    )
    frame = Window.partitionBy(key_col).orderBy("d").rowsBetween(-(window - 1), 0)
    trailing = daily.withColumn(
        "_adv_c", F.sum("dvol_c").over(frame) / F.count(F.lit(1)).over(frame)
    )
    latest = trailing.groupBy(key_col).agg(
        F.max("d").alias("as_of"),
        F.max_by("_adv_c", "d").alias("_adv_c"),
    )
    rank_w = Window.orderBy(F.col("_adv_c").desc(), F.col(key_col))
    return (
        latest.withColumn("adv_decile", F.ntile(n_tiles).over(rank_w))
        .withColumn("adv", _fx(F.col("_adv_c") / 100.0, 1e4))
        .withColumn("is_liquid", (F.col("adv_decile") == 1).cast("int"))
        .select(key_col, "as_of", "adv", "adv_decile", "is_liquid")
    )


def index_daily_return(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
) -> DataFrame:
    """Cap-weighted market index, one row per date: member count,
    advancer/decliner counts, and the weighted mean period return
    (weight = the entity's first observed close — the float-cap proxy
    available without a shares table; documented, deterministic).

    Exactness: each entity's period return is rounded to a 1e-6
    fixed-point bigint and its weight to WHOLE DOLLARS (floored at 1 so
    a penny stock still participates) BEFORE the cross-sectional sum,
    so the weighted mean is exact-integer arithmetic until one final
    division. Product bound: |ret_fx| <= ~5e10 (a 5e4x move on this
    price domain) x weight <= ~5e4 = 2.5e15 per member — thousands of
    members away from int64, the reason the weight is dollars and not
    cents (cents would overflow at ~150 members on the same domain).

    One hash exchange on the entity key serves the lag window and the
    first-close window; the per-date rollup is the only other shuffle
    (group-bounded: one row per date).
    """
    w = Window.partitionBy(key_col).orderBy("d")
    w_all = Window.partitionBy(key_col)
    prev = F.lag(value_col).over(w)
    ret_fx = F.when(
        prev > 0,
        F.floor((F.col(value_col) / prev - 1.0) * 1e6 + F.lit(0.5)).cast("bigint"),
    )
    weight_d = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor(F.min_by(value_col, "d").over(w_all) + F.lit(0.5)).cast("bigint"),
    )
    legs = (
        daily.withColumn("_ret_fx", ret_fx)
        .withColumn("_w_d", weight_d)
        .filter(F.col("_ret_fx").isNotNull())
    )
    return (
        legs.groupBy(F.col("d"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum((F.col("_ret_fx") > 0).cast("int")).alias("n_advancers"),
            F.sum((F.col("_ret_fx") < 0).cast("int")).alias("n_decliners"),
            _fx(
                F.sum(F.col("_w_d") * F.col("_ret_fx"))
                / F.sum("_w_d")
                / F.lit(1e6)
            ).alias("index_return"),
        )
    )


def factor_rank_ic(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
    min_members: int = 3,
) -> DataFrame:
    """Daily rank information coefficient of a momentum factor: the
    Spearman correlation (tie-broken variant) between today's
    cross-sectional return ranks and TOMORROW's — the one-number answer
    to "does today's winner win again tomorrow?".

    spearman = 1 - 6 * sum(d_i^2) / (n * (n^2 - 1)) with d_i the rank
    difference — ALL integer arithmetic until one final division, so
    the IC is engine-exact with no float-sum ordering anywhere. Ranks
    are row_number with an (value, key) tiebreak (tie-broken Spearman,
    not average-rank Spearman — documented, and identical on both
    engines). Dates with fewer than ``min_members`` joint observations
    are dropped (the denominator needs n >= 2; tiny cross-sections are
    noise).

    Shuffles: one on the entity key (lag + lead windows), one on the
    date (two rank windows + final rollup share it).
    """
    w = Window.partitionBy(key_col).orderBy("d")
    prev = F.lag(value_col).over(w)
    ret = F.when(prev > 0, F.col(value_col) / prev - 1.0)
    with_ret = daily.withColumn("_ret", ret)
    fwd = F.lead("_ret").over(w)
    both = (
        with_ret.withColumn("_fwd", fwd)
        .filter(F.col("_ret").isNotNull() & F.col("_fwd").isNotNull())
    )
    rank_now = F.row_number().over(
        Window.partitionBy("d").orderBy(F.col("_ret"), F.col(key_col))
    )
    rank_fwd = F.row_number().over(
        Window.partitionBy("d").orderBy(F.col("_fwd"), F.col(key_col))
    )
    ranked = both.withColumn(
        "_dd", (rank_now - rank_fwd).cast("bigint")
    )
    agg = ranked.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("_dd") * F.col("_dd")).alias("_sd2"),
    )
    n = F.col("n_members").cast("bigint")
    ic = 1.0 - 6.0 * F.col("_sd2") / (n * (n * n - 1))
    return (
        agg.filter(F.col("n_members") >= min_members)
        .select("d", "n_members", _fx(ic).alias("rank_ic"))
    )


def beta_vs_index(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
    winsor_bp: int = 50_000,
    min_days: int = 5,
) -> DataFrame:
    """Per-entity market beta against the cap-weighted index: OLS slope
    of the entity's daily return on the index's, both in WINSORIZED
    basis points (clamped to ±``winsor_bp`` — ±500% default, the
    standard outlier guard every production beta uses), so every OLS
    sum is exact bigint arithmetic: Sxy <= n * winsor_bp^2 = 2.5e9*n —
    orders of magnitude inside int64 — and the slope/alpha are single
    closed-form double divisions (engine-identical). Degenerate
    entities (index variance 0 over their dates, or < ``min_days``
    joint observations) return NULL beta.

    Two shuffles: the entity-keyed lag window (shared with the index
    legs), and the date-keyed index aggregate (group-bounded, one row
    per date) that broadcasts back onto the legs.
    """
    w = Window.partitionBy(key_col).orderBy("d")
    w_all = Window.partitionBy(key_col)
    prev = F.lag(value_col).over(w)
    ret_bp = F.when(
        prev > 0,
        F.greatest(
            F.lit(-winsor_bp).cast("bigint"),
            F.least(
                F.lit(winsor_bp).cast("bigint"),
                F.floor((F.col(value_col) / prev - 1.0) * 1e4 + F.lit(0.5)).cast(
                    "bigint"
                ),
            ),
        ),
    )
    weight_d = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor(F.min_by(value_col, "d").over(w_all) + F.lit(0.5)).cast("bigint"),
    )
    legs = (
        daily.withColumn("_y", ret_bp)
        .withColumn("_w_d", weight_d)
        .filter(F.col("_y").isNotNull())
    )
    idx = legs.groupBy("d").agg(
        F.floor(
            F.sum(F.col("_w_d") * F.col("_y")) / F.sum("_w_d") + F.lit(0.5)
        )
        .cast("bigint")
        .alias("_x")
    )
    joined = legs.join(F.broadcast(idx), "d")
    agg = joined.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    n = F.col("n_days").cast("bigint")
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    beta = F.when(
        (F.col("n_days") >= min_days) & (den > 0),
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den,
    )
    alpha_bp = (F.col("_sy") - beta * F.col("_sx")) / n
    return agg.select(
        key_col,
        "n_days",
        _fx(beta).alias("beta"),
        _fx(alpha_bp / 1e4).alias("alpha"),
    )


def decile_spread_backtest(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
    n_tiles: int = 5,
    min_members: int = 10,
) -> DataFrame:
    """Long-short factor backtest, the end of the classic pipeline: per
    date, rank entities into ``n_tiles`` by TODAY's return (the
    momentum factor), hold the top and bottom tiles for one period, and
    report each date's equal-weighted top-tile / bottom-tile FORWARD
    return and the long-short spread.

    Selection is ntile over a (ret, key)-tiebroken order (integer,
    deterministic); forward returns ride 1e-6 fixed-point bigints so
    the tile means are exact integer sums with one division each.
    Dates with fewer than ``min_members`` joint observations drop (a
    3-name cross-section has no deciles worth reading).

    Shuffles: the entity-keyed lag/lead window, then the date-keyed
    rank window + rollup (shared date clustering). Per-date partitions
    grow with the universe — same O(n log n)-per-date shape and
    range-partition escape lever as `factor_rank_ic` (SCALE.md r9).
    """
    w = Window.partitionBy(key_col).orderBy("d")
    prev = F.lag(value_col).over(w)
    ret = F.when(prev > 0, F.col(value_col) / prev - 1.0)
    with_ret = daily.withColumn("_ret", ret)
    fwd_fx = F.when(
        F.lead("_ret").over(w).isNotNull(),
        F.floor(F.lead("_ret").over(w) * 1e6 + F.lit(0.5)).cast("bigint"),
    )
    paired = with_ret.withColumn("_fwd_fx", fwd_fx).filter(
        F.col("_ret").isNotNull() & F.col("_fwd_fx").isNotNull()
    )
    tile = F.ntile(n_tiles).over(
        Window.partitionBy("d").orderBy(F.col("_ret").desc(), F.col(key_col))
    )
    tiled = paired.withColumn("_tile", tile)
    agg = tiled.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.when(F.col("_tile") == 1, F.col("_fwd_fx"))).alias("_top_sum"),
        F.sum((F.col("_tile") == 1).cast("int")).alias("_top_n"),
        F.sum(F.when(F.col("_tile") == n_tiles, F.col("_fwd_fx"))).alias(
            "_bot_sum"
        ),
        F.sum((F.col("_tile") == n_tiles).cast("int")).alias("_bot_n"),
    )
    top = F.col("_top_sum") / F.col("_top_n") / F.lit(1e6)
    bot = F.col("_bot_sum") / F.col("_bot_n") / F.lit(1e6)
    return (
        agg.filter(F.col("n_members") >= min_members)
        .select(
            "d",
            "n_members",
            _fx(top).alias("top_tile_return"),
            _fx(bot).alias("bottom_tile_return"),
            _fx(top - bot).alias("spread"),
        )
    )


def risk_summary(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
    winsor_bp: int = 10_000,
    min_days: int = 5,
) -> DataFrame:
    """Per-entity return-risk report: mean daily return, sample
    volatility, Sharpe (mean/vol), skewness, and the 5% historical VaR
    — the risk columns every screen joins onto the universe.

    Exactness design: moments come from EXACT bigint power sums of
    winsorized basis-point returns (+-100% clamp keeps |x|<=1e4, so
    Sx^3 terms stay far inside int64 for any realistic history), and
    the variance/skew closed forms are evaluated from those identical
    integers on both engines — no engine-internal stddev/skew whose
    partial-sum order could drift. VaR interpolates the RAW return
    doubles (identical IEEE values both sides) with
    percentile/quantile_cont — the `stats_moments` pairing already
    pinned in the driver window. One entity-keyed exchange end-to-end.
    """
    w = Window.partitionBy(key_col).orderBy("d")
    prev = F.lag(value_col).over(w)
    ret = F.when(prev > 0, F.col(value_col) / prev - 1.0)
    x = F.greatest(
        F.lit(-winsor_bp).cast("bigint"),
        F.least(
            F.lit(winsor_bp).cast("bigint"),
            F.floor(ret * 1e4 + F.lit(0.5)).cast("bigint"),
        ),
    )
    legs = (
        daily.withColumn("_ret", ret)
        .withColumn("_x", x)
        .filter(F.col("_ret").isNotNull())
    )
    agg = legs.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_x") * F.col("_x")).alias("_sxxx"),
        F.percentile("_ret", F.lit(0.05)).alias("_var95"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxxx = F.col("_sxxx").cast("double")
    mean_bp = sx / n
    # sample variance in bp^2 from exact sums
    var_bp2 = F.when(
        F.col("n_days") >= 2, (n * sxx - sx * sx) / (n * (n - 1.0))
    )
    vol_bp = F.sqrt(var_bp2)
    # population skewness g1 = m3 / m2^1.5 from exact power sums
    m2 = sxx / n - mean_bp * mean_bp
    m3 = sxxx / n - 3.0 * mean_bp * sxx / n + 2.0 * mean_bp * mean_bp * mean_bp
    g1 = F.when((F.col("n_days") >= min_days) & (m2 > 0), m3 / F.pow(m2, 1.5))
    sharpe = F.when((F.col("n_days") >= min_days) & (vol_bp > 0), mean_bp / vol_bp)
    return agg.filter(F.col("n_days") >= 2).select(
        key_col,
        "n_days",
        _fx(mean_bp / 1e4).alias("mean_return"),
        _fx(vol_bp / 1e4).alias("volatility"),
        _fx(sharpe).alias("sharpe"),
        _fx(g1).alias("skewness"),
        _fx(F.col("_var95")).alias("var95"),
    )


def calendar_anomalies(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
) -> DataFrame:
    """Weekday-seasonality report: per day-of-week, the observation
    count, mean daily return, and the share of positive returns — the
    turn-of-week anomaly screen. Returns ride 1e-6 fixed-point bigints
    before the sums (exact), divisions happen once per output row.
    Group-bounded output: seven rows, ever."""
    w = Window.partitionBy(key_col).orderBy("d")
    prev = F.lag(value_col).over(w)
    ret_fx = F.when(
        prev > 0,
        F.floor((F.col(value_col) / prev - 1.0) * 1e6 + F.lit(0.5)).cast("bigint"),
    )
    legs = daily.withColumn("_ret_fx", ret_fx).filter(F.col("_ret_fx").isNotNull())
    # dayofweek: Spark is 1=Sunday; normalize to ISO 1=Monday..7=Sunday
    # (matches DuckDB isodow) so the oracle shares the domain
    dow = ((F.dayofweek("d") + 5) % 7) + 1
    return (
        legs.groupBy(dow.alias("iso_dow"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            _fx(F.sum("_ret_fx") / F.count(F.lit(1)) / F.lit(1e6)).alias(
                "mean_return"
            ),
            F.sum((F.col("_ret_fx") > 0).cast("int")).alias("n_up"),
            _fx(
                F.sum((F.col("_ret_fx") > 0).cast("int")) / F.count(F.lit(1))
            ).alias("up_share"),
        )
    )


def market_regime_streaks(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
) -> DataFrame:
    """Breadth-momentum regimes: each date is risk-on (more advancers
    than decliners), risk-off, or flat; report per-regime day counts
    and the LONGEST consecutive run of each regime — the market-health
    summary a breadth dashboard leads with.

    Builds on the same per-date advancer/decliner counts as
    `index_daily_return`; the run-length encoding (running sum over
    regime-change flags) operates on the one-row-per-date frame, so the
    single-partition window is bounded by the calendar, not the bar
    count — the same bounded-by-contract shape as the breadth rollup
    itself."""
    w = Window.partitionBy(key_col).orderBy("d")
    prev = F.lag(value_col).over(w)
    ret_fx = F.when(
        prev > 0,
        F.floor((F.col(value_col) / prev - 1.0) * 1e6 + F.lit(0.5)).cast("bigint"),
    )
    legs = daily.withColumn("_ret_fx", ret_fx).filter(F.col("_ret_fx").isNotNull())
    per_date = legs.groupBy("d").agg(
        F.sum((F.col("_ret_fx") > 0).cast("int")).alias("_adv"),
        F.sum((F.col("_ret_fx") < 0).cast("int")).alias("_dec"),
    )
    regime = (
        F.when(F.col("_adv") > F.col("_dec"), F.lit("risk_on"))
        .when(F.col("_adv") < F.col("_dec"), F.lit("risk_off"))
        .otherwise(F.lit("flat"))
    )
    wd = Window.orderBy("d")
    tagged = per_date.withColumn("_regime", regime).withColumn(
        "_chg",
        (
            F.lag("_regime").over(wd).isNull()
            | (F.col("_regime") != F.lag("_regime").over(wd))
        ).cast("bigint"),
    )
    runs = tagged.withColumn(
        "_run", F.sum("_chg").over(wd.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_run = runs.groupBy("_regime", "_run").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        per_run.groupBy(F.col("_regime").alias("regime"))
        .agg(
            F.sum("run_len").alias("n_days"),
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("longest_run"),
        )
    )


def stale_price_runs(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
    grid: float = 1.0,
    min_run: int = 2,
) -> DataFrame:
    """Stale-quote audit: quantize closes to a tick grid, then find
    maximal runs of consecutive days whose quantized close never moves
    — the signature of a halted listing or a dead vendor feed. Per
    entity: stale-day count, number of qualifying runs (length >=
    min_run counting the anchor day), and the longest run.

    Run detection is the running-sum-over-change-flags pattern
    (`q_sessionize`): one window to mark changes, a groupBy on the
    derived run id, a per-entity rollup — all on one hash exchange.
    Quantized comparison is integer equality: engine-exact.
    """
    w = Window.partitionBy(key_col).orderBy("d")
    q = F.floor(F.col(value_col) / F.lit(grid) + F.lit(0.5)).cast("bigint")
    d = daily.withColumn("_q", q)
    changed = (
        F.lag("_q").over(w).isNull() | (F.col("_q") != F.lag("_q").over(w))
    ).cast("bigint")
    runs = d.withColumn(
        "_run",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_run = runs.groupBy(key_col, "_run").agg(F.count(F.lit(1)).alias("run_len"))
    # n_stale_days is threshold-FREE by definition: a stale day is any day
    # repeating the prior quantized close, i.e. run_len - 1 per run (zero
    # for singleton runs). Only n_stale_runs applies the min_run qualifier.
    return per_run.groupBy(key_col).agg(
        F.sum(F.col("run_len") - F.lit(1)).alias("n_stale_days"),
        F.sum((F.col("run_len") >= min_run).cast("int")).alias("n_stale_runs"),
        F.max("run_len").alias("max_run_len"),
    )


def amihud_illiquidity(
    bars: DataFrame,
    winsor_bp: int = 10_000,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Amihud (2002) illiquidity: per entity, the mean over days of
    |daily return| per million dollars traded (x1e6, the standard
    scaling) plus the worst single day — the price-impact twin of
    `liquidity_screen`'s volume screen. The reference stores raw bars
    (`downloader_wmy.py:54-58`); this is the first screen any factor
    study runs on them after ADV.

    Exactness: returns ride winsorized 1e-4 basis points (the
    `risk_summary` clamp — |x| <= winsor_bp), dollar volume rides
    cents bigints, and each day's ratio is computed as ONE bigint
    floor-division ``(aret_bp * 1e10) div dvol_c`` (numerator
    <= 1e14, far inside int64), so the per-day values and their sum
    are exact integers on both engines; the mean is one final double
    division. Days with zero/negative traded value drop (no volume,
    no impact estimate). ONE entity-keyed exchange serves the daily
    rollup, the lag window, and the final aggregate. The daily-close
    tiebreak is parameterized like `daily_close`'s (``tiebreak_cols``,
    default ``("ts", "event_id")``) so frames without an event_id
    column can supply their own deterministic order (r10 ADVICE).
    """
    daily = (
        bars.filter(
            F.col(key_col).isNotNull()
            & F.col(time_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .repartition(key_col)
        .groupBy(F.col(key_col), F.to_date(time_col).alias("d"))
        .agg(
            F.max_by(value_col, F.struct(*tiebreak_cols)).alias("close"),
            F.sum(
                F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
            ).alias("dvol_c"),
        )
    )
    w = Window.partitionBy(key_col).orderBy("d")
    prev = F.lag("close").over(w)
    ret_bp = F.when(
        prev > 0,
        F.greatest(
            F.lit(-winsor_bp).cast("bigint"),
            F.least(
                F.lit(winsor_bp).cast("bigint"),
                F.floor((F.col("close") / prev - 1.0) * 1e4 + F.lit(0.5)).cast(
                    "bigint"
                ),
            ),
        ),
    )
    legs = (
        daily.withColumn("_ret_bp", ret_bp)
        .filter(F.col("_ret_bp").isNotNull() & (F.col("dvol_c") > 0))
        # amihud_e6_day = 1e6 * |ret| / dollars = 1e4 * |ret_bp| / dvol_c;
        # at 1e-6 fixed point that is (|ret_bp| * 1e10) div dvol_c — exact
        .withColumn(
            "_day_fx",
            F.expr("abs(_ret_bp) * cast(10000000000 as bigint) div dvol_c"),
        )
    )
    return legs.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        _fx(F.sum("_day_fx") / F.count(F.lit(1)) / 1e6).alias("amihud"),
        _fx(F.max("_day_fx") / 1e6).alias("amihud_worst_day"),
    )


def underwater_spells(
    daily: DataFrame,
    key_col: str = "user_id",
    value_col: str = "close",
) -> DataFrame:
    """Drawdown-duration report: per entity, how many days the close sat
    strictly below its running peak, in how many distinct underwater
    spells, and the longest spell — the time dimension `drawdown_stats`'
    depth numbers miss (a -5% that lasts two years hurts differently
    than a -20% flash).

    Underwater is a strict double comparison against ``max() over`` the
    running frame — identical IEEE inputs on both engines, so the flag,
    the run-length encoding over it (the `stale_price_runs`
    change-flag pattern), and every output are exact integers. One
    entity-keyed exchange end-to-end.
    """
    w = Window.partitionBy(key_col).orderBy("d")
    run_frame = w.rowsBetween(Window.unboundedPreceding, 0)
    d = daily.withColumn(
        "_uw", (F.col(value_col) < F.max(value_col).over(run_frame)).cast("int")
    )
    changed = (
        F.lag("_uw").over(w).isNull() | (F.col("_uw") != F.lag("_uw").over(w))
    ).cast("bigint")
    runs = d.withColumn("_run", F.sum(changed).over(run_frame))
    per_run = runs.groupBy(key_col, "_run").agg(
        F.max("_uw").alias("_is_uw"),  # constant within a run
        F.count(F.lit(1)).alias("run_len"),
    )
    return per_run.groupBy(key_col).agg(
        F.sum(F.when(F.col("_is_uw") == 1, F.col("run_len")).otherwise(0)).alias(
            "n_underwater_days"
        ),
        F.sum((F.col("_is_uw") == 1).cast("int")).alias("n_spells"),
        F.max(F.when(F.col("_is_uw") == 1, F.col("run_len")).otherwise(0)).alias(
            "longest_spell"
        ),
    )


def turn_of_month_effect(
    daily: DataFrame,
    edge_days: int = 3,
    key_col: str = "user_id",
    value_col: str = "close",
) -> DataFrame:
    """Turn-of-month seasonality: classify each trading day as one of
    the month's last ``edge_days`` (``last{edge_days}``), first
    ``edge_days`` (``first{edge_days}``), or 'middle', and report
    each bucket's observation
    count, mean daily return, and up-day share — the month-boundary
    twin of `calendar_anomalies`' weekday screen.

    Day indexing is row_number within (entity, calendar month) over the
    trading dates actually present — calendar-aware without a calendar
    table. A short month (< 2*edge_days trading days) resolves
    last-over-first (the month-end flow effect dominates empirically;
    deterministic either way). Returns ride 1e-6 fixed-point bigints;
    output is three rows, ever.
    """
    w = Window.partitionBy(key_col).orderBy("d")
    month = F.trunc("d", "month")
    rn = F.row_number().over(Window.partitionBy(key_col, month).orderBy("d"))
    rn_desc = F.row_number().over(
        Window.partitionBy(key_col, month).orderBy(F.col("d").desc())
    )
    prev = F.lag(value_col).over(w)
    ret_fx = F.when(
        prev > 0,
        F.floor((F.col(value_col) / prev - 1.0) * 1e6 + F.lit(0.5)).cast("bigint"),
    )
    # labels derive from edge_days (r10 ADVICE: hardcoded 'first3'/'last3'
    # misnamed the buckets for any non-default window)
    bucket = (
        F.when(rn_desc <= edge_days, F.lit(f"last{edge_days}"))
        .when(rn <= edge_days, F.lit(f"first{edge_days}"))
        .otherwise(F.lit("middle"))
    )
    legs = (
        daily.withColumn("_ret_fx", ret_fx)
        .withColumn("_bucket", bucket)
        .filter(F.col("_ret_fx").isNotNull())
    )
    return legs.groupBy(F.col("_bucket").alias("month_bucket")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        _fx(F.sum("_ret_fx") / F.count(F.lit(1)) / F.lit(1e6)).alias("mean_return"),
        _fx(
            F.sum((F.col("_ret_fx") > 0).cast("int")) / F.count(F.lit(1))
        ).alias("up_share"),
    )


def trading_calendar_coverage(
    daily: DataFrame,
    min_coverage: float = 0.95,
    key_col: str = "user_id",
) -> DataFrame:
    """Data-completeness audit against the MARKET calendar: for each
    entity, how many of the trading days the whole universe traded
    (between the entity's first and last bar) does the entity actually
    have? This is the engine form of the reference's coverage
    monitoring (`main.py:126-133` flags a market below 80% of its
    expected symbol count; this flags a SYMBOL below its expected day
    count — the per-series twin).

    The naive form is a (entity-span x calendar) range join — a
    BroadcastNestedLoopJoin that explodes at scale. Instead the
    calendar (one row per distinct trading date — bounded by the
    calendar, the `market_regime_streaks` contract) is row_number-
    indexed once, and each entity's expected-day count is
    idx(last_d) - idx(first_d) + 1 via TWO broadcast EQUI-joins: no
    NL join anywhere. Coverage is one bigint floor-division; all
    outputs exact integers + one 1e-6 fixed-point ratio.
    """
    cal = daily.select("d").distinct()
    # global row_number over the calendar: single-partition by design,
    # bounded by the number of trading dates ever (thousands), the same
    # bounded-by-contract shape as market_regime_streaks' date window.
    # localCheckpoint: the index is consumed by TWO join branches (span
    # start + span end); without the cut each branch would recompute the
    # distinct over the full daily frame — two redundant scans at scale.
    cal_idx = cal.withColumn(
        "_idx", F.row_number().over(Window.orderBy("d"))
    ).localCheckpoint(eager=True)
    per = daily.groupBy(key_col).agg(
        F.min("d").alias("_first_d"),
        F.max("d").alias("_last_d"),
        F.count(F.lit(1)).alias("n_days"),
    )
    lo = cal_idx.select(F.col("d").alias("_first_d"), F.col("_idx").alias("_lo"))
    hi = cal_idx.select(F.col("d").alias("_last_d"), F.col("_idx").alias("_hi"))
    joined = per.join(F.broadcast(lo), "_first_d").join(F.broadcast(hi), "_last_d")
    n_expected = F.col("_hi") - F.col("_lo") + F.lit(1)
    cov_fx = F.expr("n_days * cast(1000000 as bigint) div (_hi - _lo + 1)")
    # floor(x*scale+0.5) — the module's fixed-point idiom; bare int()
    # truncates (int(0.29*1e6)=289999), silently shifting the threshold
    # by one fixed-point unit for many non-default values (r10 ADVICE).
    min_fx = int(min_coverage * 1e6 + 0.5)
    return joined.select(
        key_col,
        "n_days",
        n_expected.cast("bigint").alias("n_expected"),
        (cov_fx / 1e6).alias("coverage"),
        (cov_fx >= F.lit(min_fx)).cast("int").alias("is_complete"),
    )


def volume_profile_by_hour(
    bars: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Intraday volume seasonality: per hour-of-day, the event count,
    total traded dollars, and each hour's share of the day's total —
    the U-shape every execution scheduler needs. The hour-of-day twin
    of `calendar_anomalies` (day-of-week) and `turn_of_month`.

    Dollar sums ride cents bigints; the share is one bigint
    floor-division against the grand total carried onto the 24-row
    aggregate by a single-partition window (24 rows, ever — group-
    bounded by the clock). The share numerator is scaled to WHOLE
    DOLLARS first (cents div 100): hourly_dollars * 1e6 must stay
    inside int64, which holds to ~$9.2 trillion PER HOUR — cents would
    cut that headroom 100x. A zero grand total (every event under half
    a cent) yields NULL shares on both engines (div nullif). One
    map-side-combinable exchange.
    """
    legs = bars.filter(
        F.col(key_col).isNotNull()
        & F.col(time_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    per_hour = legs.groupBy(F.hour(time_col).alias("hour_of_day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
        ).alias("_cents"),
    )
    dollars = F.expr("_cents div cast(100 as bigint)")
    return (
        per_hour.withColumn("_dollars", dollars)
        .withColumn(
            "_total_d", F.sum("_dollars").over(Window.partitionBy())
        )
        .withColumn(
            "_share_fx",
            F.expr("_dollars * cast(1000000 as bigint) div nullif(_total_d, 0)"),
        )
        .select(
            "hour_of_day",
            "n_events",
            _fx(F.col("_cents") / 100.0, 1e4).alias("dollar_volume"),
            (F.col("_share_fx") / 1e6).alias("volume_share"),
        )
    )
