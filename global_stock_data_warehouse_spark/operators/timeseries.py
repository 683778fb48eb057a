"""Market time-series indicators: EWMA, rolling volatility, RSI,
Bollinger bands, drawdown / cumulative return.

These are the queries a stock data warehouse exists to serve (the
reference stops at period returns, `downloader_wmy.py:54-58`; this module
is the natural extension of that surface — W1's lag-return generalized to
the standard indicator battery).

Scale design:

- ONE shuffle for the whole battery: callers `repartition(key)` once;
  `HashPartitioning(key)` satisfies the daily-bar `groupBy(key, day)`
  (subset clustering) AND every per-key window that follows, so the
  entire chain — daily close -> diffs -> four indicator frames — runs
  without another exchange.
- All bounded ROWS frames (20/14 rows), so per-row state is O(frame),
  never O(partition): no skew amplification for long histories.
- Pure native expressions (window aggs + one `aggregate` lambda for the
  EWMA dot product over a collected frame) — whole-stage codegen, no
  Python in the loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_close(
    bars: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    tiebreak_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Last value per (key, calendar day): the close of each daily bar.

    `max_by` with a struct tiebreak makes "last" deterministic (bare
    F.last is order-nondeterministic under parallel aggregation).

    NULL key/time/value rows are excluded at this root — a tick without
    an entity, a timestamp, or a price is not a tick (same uniform
    policy as the `_event_bars` loader; every consumer's oracle carries
    the matching `WHERE ... IS NOT NULL` clause). Without the filter a
    NULL ts seeds a NULL day bucket and a NULL value silently vanishes
    from max_by while still, in an engine whose last() keeps NULLs,
    overwriting the day's close.
    """
    return (
        bars.filter(
            F.col(key_col).isNotNull()
            & F.col(time_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .repartition(key_col)
        .groupBy(F.col(key_col), F.to_date(time_col).alias("d"))
        .agg(F.max_by(value_col, F.struct(*tiebreak_cols)).alias("close"))
    )


def _frame(key_col: str, n: int) -> Window:
    return Window.partitionBy(key_col).orderBy("d").rowsBetween(-(n - 1), 0)


def with_ewma(
    df: DataFrame,
    alpha: float = 0.1,
    window: int = 20,
    key_col: str = "user_id",
    value_col: str = "close",
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average over a bounded ROWS frame.

    ewma_t = sum_j decay^j * x_{t-j} / sum_j decay^j  (j = 0..window-1,
    decay = 1 - alpha). The frame values are collected oldest->newest and
    reduced with one ``aggregate`` lambda (weights decay^(n-1-i)); the
    denominator has the closed form (1 - decay^n) / alpha. Bounded frame
    keeps it numerically stable (no decay^-t rescaling blowup) and O(1)
    state per row.
    """
    decay = 1.0 - alpha
    df = df.withColumn("_vals", F.collect_list(value_col).over(_frame(key_col, window)))
    n = F.size("_vals")
    num = F.aggregate(
        "_vals",
        F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("i")),
        lambda acc, x: F.struct(
            (acc["s"] + x * F.pow(F.lit(decay), (n - 1 - acc["i"]).cast("double"))).alias("s"),
            (acc["i"] + 1).alias("i"),
        ),
        lambda acc: acc["s"],
    )
    den = (1.0 - F.pow(F.lit(decay), n.cast("double"))) / F.lit(alpha)
    return df.withColumn(out_col, num / den).drop("_vals")


def with_log_return(
    df: DataFrame, key_col: str = "user_id", value_col: str = "close"
) -> DataFrame:
    w = Window.partitionBy(key_col).orderBy("d")
    prev = F.lag(value_col).over(w)
    lr = F.when(
        (F.col(value_col) > 0) & (prev > 0), F.log(F.col(value_col) / prev)
    )
    return df.withColumn("log_return", lr)


def with_rolling_volatility(
    df: DataFrame, window: int = 20, key_col: str = "user_id", out_col: str = "volatility"
) -> DataFrame:
    """Sample stddev of log returns over a bounded frame (needs
    ``with_log_return`` upstream); null until 2 returns exist."""
    return df.withColumn(
        out_col, F.stddev_samp("log_return").over(_frame(key_col, window))
    )


def with_rsi(
    df: DataFrame,
    period: int = 14,
    key_col: str = "user_id",
    value_col: str = "close",
    out_col: str = "rsi",
) -> DataFrame:
    """Relative Strength Index (simple-average variant): 100 - 100/(1+RS),
    RS = avg gain / avg loss over the last `period` diffs. First row's
    diff is null and is skipped by avg on both engines; zero avg loss
    pins RSI to 100."""
    w = Window.partitionBy(key_col).orderBy("d")
    diff = F.col(value_col) - F.lag(value_col).over(w)
    # null-safe split: null diff stays null (not zero) so avg skips it
    gain = F.when(diff > 0, diff).otherwise(F.when(diff.isNotNull(), F.lit(0.0)))
    loss = F.when(diff < 0, -diff).otherwise(F.when(diff.isNotNull(), F.lit(0.0)))
    fr = _frame(key_col, period)
    ag, al = F.avg(gain).over(fr), F.avg(loss).over(fr)
    rsi = F.when(al == 0, F.lit(100.0)).otherwise(100.0 - 100.0 / (1.0 + ag / al))
    return df.withColumn(out_col, rsi)


def with_bollinger(
    df: DataFrame,
    window: int = 20,
    k: float = 2.0,
    key_col: str = "user_id",
    value_col: str = "close",
) -> DataFrame:
    """Bollinger bands: mid = rolling mean, bands = mid +/- k * rolling
    sample stddev (null until the frame has 2 rows)."""
    fr = _frame(key_col, window)
    mid = F.avg(value_col).over(fr)
    sd = F.stddev_samp(value_col).over(fr)
    return (
        df.withColumn("boll_mid", mid)
        .withColumn("boll_up", mid + k * sd)
        .withColumn("boll_dn", mid - k * sd)
    )


def tech_indicators(
    bars: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    tiebreak_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """The composed battery over raw ticks: daily close -> EWMA(20, a=.1),
    20-day volatility, RSI(14), Bollinger(20, 2). One shuffle total."""
    d = daily_close(bars, time_col, key_col, value_col, tiebreak_cols)
    d = with_ewma(d, alpha=0.1, window=20, key_col=key_col)
    d = with_log_return(d, key_col=key_col)
    d = with_rolling_volatility(d, window=20, key_col=key_col)
    d = with_rsi(d, period=14, key_col=key_col)
    d = with_bollinger(d, window=20, k=2.0, key_col=key_col)
    return d.select(
        key_col,
        "d",
        F.round("close", 6).alias("close"),
        F.round("ewma", 6).alias("ewma20"),
        F.round("volatility", 6).alias("vol20"),
        F.round("rsi", 6).alias("rsi14"),
        F.round("boll_mid", 6).alias("boll_mid"),
        F.round("boll_up", 6).alias("boll_up"),
        F.round("boll_dn", 6).alias("boll_dn"),
    )


def drawdown_stats(
    daily: DataFrame, key_col: str = "user_id", value_col: str = "close"
) -> DataFrame:
    """Per key: maximum drawdown (min of close/running-peak - 1) and
    total cumulative return (last close / first close - 1). The running
    max is an unbounded-preceding window — O(1) state — and the final
    aggregate reuses the same hash partitioning: no extra shuffle."""
    w = (
        Window.partitionBy(key_col)
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = F.col(value_col) / F.max(value_col).over(w) - 1.0
    return (
        daily.withColumn("_dd", dd)
        .groupBy(key_col)
        .agg(
            F.round(F.min("_dd"), 6).alias("max_drawdown"),
            F.round(
                F.max_by(value_col, "d") / F.min_by(value_col, "d") - 1.0, 6
            ).alias("cum_return"),
        )
    )


def sessionize_two_phase(
    events: DataFrame,
    gap_sec: int = 2 * 86400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    bucket_sec: int = 30 * 86400,
) -> DataFrame:
    """Gap-based sessionization with BOUNDED per-task work under key skew.

    A single ``Window.partitionBy(user)`` session fold puts a power-law
    user's entire event stream into one task — at 100x data one hot key
    serializes the stage. This variant runs the sequential fold at TWO
    levels so no task ever sees more than one (key, time-bucket) slice:

    1. heavy pass — window over ``(key, bucket)`` where
       ``bucket = floor(epoch(ts)/bucket_sec)``: within-bucket gap flags
       and a within-bucket running count of session starts. Per-task rows
       are bounded by the hot key's events per ``bucket_sec`` window, a
       knob the caller sizes to the key's hotness (cf. ``skew.py``'s
       factor).
    2. light pass — ONE ROW PER (key, bucket) (min/max ts, starts count)
       flows into a per-key window ordered by bucket: whether each
       bucket's first event continues the previous bucket's session
       (boundary gap <= gap_sec) and the running sum of prior session
       starts. Rows here are O(buckets per key), thousands of times
       smaller than the event stream.

    session_id = (prior buckets' starts) + (within-bucket running count),
    with the first in-bucket event's flag corrected by the boundary gap —
    identical output to the single-window formulation, verified by test
    against it on streams spanning bucket boundaries.
    """
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_sec))
    ev = events.withColumn("_bkt", bucket)

    w_in = Window.partitionBy(key_col, "_bkt").orderBy(ts_col, tiebreak_col)
    in_gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(F.col(ts_col)).over(w_in)
    )
    # first event of a bucket: tentatively a session start; fixed up below
    # with the cross-bucket boundary gap
    is_first = F.row_number().over(w_in) == 1
    flagged = ev.withColumn(
        "_new_in",
        F.when(is_first | (in_gap > gap_sec), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("_first", is_first.cast("int"))
    run_in = F.sum("_new_in").over(
        w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = flagged.withColumn("_run_in", run_in)

    per_bucket = flagged.groupBy(key_col, "_bkt").agg(
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
        F.sum("_new_in").alias("_starts"),
    )
    w_b = Window.partitionBy(key_col).orderBy("_bkt")
    prev_last = F.lag("_last_ts").over(w_b)
    # does this bucket's first event CONTINUE the previous bucket's last
    # session? then its tentative start flag was wrong: subtract 1 from
    # everything in this bucket and renumber from the previous base
    cont = (
        prev_last.isNotNull()
        & (
            (F.unix_timestamp(F.col("_first_ts")) - F.unix_timestamp(prev_last))
            <= gap_sec
        )
    ).cast("int")
    adj = per_bucket.withColumn("_cont", cont).withColumn(
        "_eff_starts", F.col("_starts") - F.col("_cont")
    )
    base = F.coalesce(
        F.sum("_eff_starts").over(
            w_b.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    adj = adj.select(key_col, "_bkt", "_cont", base.alias("_base"))

    out = flagged.join(adj, [key_col, "_bkt"]).withColumn(
        "session_id", F.col("_base") + F.col("_run_in") - F.col("_cont")
    )
    return out.drop("_bkt", "_new_in", "_first", "_run_in", "_cont", "_base")


def trend_ols(
    daily: DataFrame,
    key_col: str = "user_id",
    time_col: str = "d",
    value_col: str = "close",
    value_scale: int = 100,
) -> DataFrame:
    """Per-key ordinary-least-squares trend of value over time (epoch
    days): slope, intercept, and R² — the grouped-regression shape
    (screen every symbol for drift in one pass).

    One hash shuffle with map-side partials. Instead of the engine's
    covariance aggregates (incremental mean updates whose float error
    depends on partial-sum order), the five OLS sums are accumulated over
    INTEGER-VALUED doubles (x = epoch day, y scaled by ``value_scale``):
    integer sums are exact and order-independent below 2^53, so slope /
    intercept / R² are each a single closed-form expression over exact
    inputs — bit-stable across engines. At 100 TB the guard is the 2^53
    headroom: x*y*scale per row up to ~1e12 leaves ~8000x in row count
    per group before precision loss; shrink ``value_scale`` (or demean
    keys upstream) beyond that.
    """
    x = F.datediff(F.col(time_col), F.lit("1970-01-01").cast("date")).cast("double")
    y = F.round(F.col(value_col) * value_scale, 0)
    sums = daily.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # den_x == 0 (single day / single row): the trend is undefined — NULL,
    # never NaN/Inf (which would poison downstream comparisons)
    slope = F.when(den_x > 0, cov_n / den_x / value_scale)
    intercept = F.when(
        den_x > 0, (F.col("sy") / value_scale - slope * F.col("sx")) / F.col("n")
    )
    r2 = F.when(
        (den_x > 0) & (den_y > 0), (cov_n * cov_n) / (den_x * den_y)
    )
    return sums.select(
        F.col(key_col),
        F.col("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def gap_fill_ffill(
    daily: DataFrame,
    key_col: str = "user_id",
    time_col: str = "d",
    value_cols: Sequence[str] = ("close",),
    method: str = "ffill",
) -> DataFrame:
    """Regularize each key's daily series onto a complete date spine and
    forward-fill missing days (pandas ``asfreq('D')`` + ``ffill``, the
    reference's resample-prep step, distributed).

    The spine is ``sequence(min_d, max_d)`` per key — generated FROM the
    per-key aggregate (one row per key explodes into its own span), so
    spine construction shuffles one row per key, not one per day. The
    left join back and the ignore-nulls ``last`` window both reuse the
    key hash partitioning. ``is_filled`` marks synthesized rows.

    ``method="linear"`` interpolates interior gaps instead (pandas
    ``interpolate(method="time")``): prev/next anchors come from
    ignore-nulls last/first windows over the SAME partitioning, and the
    tail (no next anchor) forward-fills. The spine spans each key's
    observed [min_d, max_d], so every gap has a prev anchor.
    """
    spine = (
        daily.groupBy(key_col)
        .agg(F.min(time_col).alias("d0"), F.max(time_col).alias("d1"))
        .select(
            key_col,
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias(time_col),
        )
    )
    joined = spine.join(
        daily.withColumn("_present", F.lit(1)), [key_col, time_col], "left_outer"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined
    if method == "ffill":
        for c in value_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    elif method == "linear":
        fwd = (
            Window.partitionBy(key_col)
            .orderBy(time_col)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        for c in value_cols:
            # anchor DATES share the value column's non-null condition —
            # keying them off _present would pair a present-but-NULL row's
            # date with an older row's value and bend the interpolation line
            prev_v = F.last(c, ignorenulls=True).over(w)
            prev_d = F.last(
                F.when(F.col(c).isNotNull(), F.col(time_col)),
                ignorenulls=True,
            ).over(w)
            next_v = F.first(c, ignorenulls=True).over(fwd)
            next_d = F.first(
                F.when(F.col(c).isNotNull(), F.col(time_col)),
                ignorenulls=True,
            ).over(fwd)
            frac = F.datediff(F.col(time_col), prev_d) / F.datediff(next_d, prev_d)
            interp = prev_v + (next_v - prev_v) * frac
            out = out.withColumn(
                c,
                F.when(F.col("_present").isNotNull(), F.col(c))
                .when(next_d.isNotNull(), interp)
                .otherwise(prev_v),
            )
    else:
        raise ValueError(f"unknown gap-fill method: {method!r}")
    return out.withColumn("is_filled", F.col("_present").isNull()).drop("_present")


def autocorrelation(
    daily: DataFrame,
    lags: tuple[int, ...] = (1, 2, 3, 5),
    key_col: str = "user_id",
    value_col: str = "close",
) -> DataFrame:
    """Per-key autocorrelation function: Pearson correlation of the daily
    series with its lag-``k`` shift, for each ``k`` in ``lags`` — the
    standard mean-reversion / momentum diagnostic (and the sanity check
    before fitting anything AR-shaped).

    ONE window shuffle builds every lag column (same HashPartitioning(key)
    ordering serves all lags), and one grouped aggregate computes every
    corr — the per-key agg reuses the window's partitioning, so the whole
    diagnostic is a single exchange regardless of how many lags are
    requested. corr() accumulates floats in partition order -> compared
    under EPS, like rolling_beta.
    """
    w = Window.partitionBy(key_col).orderBy("d")
    out = daily
    for k in lags:
        out = out.withColumn(f"_lag{k}", F.lag(value_col, k).over(w))
    aggs = [F.count(F.lit(1)).alias("n_days")] + [
        F.round(F.corr(value_col, f"_lag{k}"), 4).alias(f"acf{k}") for k in lags
    ]
    return out.groupBy(key_col).agg(*aggs).orderBy(key_col)


# ---------------------------------------------------------------------------
# hash-exact fixed-point twins of the EPS-only float diagnostics
# ---------------------------------------------------------------------------

_DEC = "decimal(38,0)"


def _fx6(col):
    """floor(x*1e6 + 0.5): 6dp round-half-up-toward-+inf on BOTH engines
    (Spark round() is HALF_UP, DuckDB's double round is banker's-ish —
    floor(x + 0.5) is the one formulation they share bit-for-bit)."""
    return F.floor(col * 1e6 + F.lit(0.5)) / 1e6


def autocorrelation_fx(
    daily: DataFrame,
    lags: tuple[int, ...] = (1, 2, 3, 5),
    key_col: str = "user_id",
    value_col: str = "close",
) -> DataFrame:
    """Hash-exact twin of ``autocorrelation``: same Pearson ACF semantics,
    but every accumulation is integer so the result is bit-identical on
    any engine / partitioning / summation order (the driver's value-hash
    gate has no tolerance, so the EPS-compared float original can never
    produce driver-grade evidence — this twin can).

    Trick (same family as ``class_centroids``): quantize the daily close
    to integer cents once (``floor(close*100 + 0.5)`` — deterministic on
    the shared input doubles), then corr = (n*Sxy - Sx*Sy) /
    (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2)) from pure integer sums
    (decimal(38,0) headroom; DuckDB's HUGEINT is the oracle twin).
    Integer sums are associative in any order; casting an exact integer
    to double, IEEE division and IEEE sqrt are all correctly-rounded and
    engine-identical — unlike ln(), there is no libm in this formula.
    Same plan shape as the original: ONE window exchange serves every
    lag, the final per-key agg reuses its partitioning.
    """
    w = Window.partitionBy(key_col).orderBy("d")
    x = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    out = daily.withColumn("_x", x)
    for k in lags:
        out = out.withColumn(f"_y{k}", F.lag("_x", k).over(w))

    def _corr_fx(k: int):
        xk = F.when(F.col(f"_y{k}").isNotNull(), F.col("_x"))
        yk = F.col(f"_y{k}")
        n = F.count(yk)
        sx = F.sum(xk).cast(_DEC)
        sy = F.sum(yk).cast(_DEC)
        sxy = F.sum((xk.cast(_DEC) * yk))
        sxx = F.sum((xk.cast(_DEC) * xk))
        syy = F.sum((yk.cast(_DEC) * yk))
        num = (n * sxy - sx * sy).cast("double")
        dx = (n * sxx - sx * sx).cast("double")
        dy = (n * syy - sy * sy).cast("double")
        return F.when(
            (dx > 0) & (dy > 0), _fx6(num / (F.sqrt(dx) * F.sqrt(dy)))
        ).alias(f"acf{k}")

    aggs = [F.count(F.lit(1)).alias("n_days")] + [_corr_fx(k) for k in lags]
    return out.groupBy(key_col).agg(*aggs).orderBy(key_col)


def rolling_beta_fx(
    bars: DataFrame,
    window: int = 20,
    min_obs: int = 5,
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Hash-exact twin of the EPS-only ``rolling_beta`` query: rolling
    ``window``-day beta and correlation of each entity's daily CLOSE
    against the cross-sectional market index (sum of all entities' closes
    that day — an equal-weight index level), from integer-cents sums only.

    Same fixed-point argument as ``autocorrelation_fx``; the market index
    is itself an exact integer (sum of cents), so x*m / m*m products stay
    integral (decimal(38,0) — at 1e6 entities the index is ~1e13 cents
    and m^2 ~1e26, far past bigint but comfortably inside 38 digits).
    Plan: daily-close agg and index agg share one scan, index broadcast
    back (|days| rows), ONE window exchange computes every running sum.
    """
    d = daily_close(bars, time_col=time_col, key_col=key_col, value_col=value_col)
    d = d.withColumn("_x", F.floor(F.col("close") * 100 + F.lit(0.5)).cast("long"))
    idx = d.groupBy("d").agg(F.sum("_x").alias("_m"))
    j = d.join(F.broadcast(idx), "d")
    w = (
        Window.partitionBy(key_col)
        .orderBy("d")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("_x").over(w).cast(_DEC)
    sm = F.sum("_m").over(w).cast(_DEC)
    sxm = F.sum(F.col("_x").cast(_DEC) * F.col("_m")).over(w)
    sxx = F.sum(F.col("_x").cast(_DEC) * F.col("_x")).over(w)
    smm = F.sum(F.col("_m").cast(_DEC) * F.col("_m")).over(w)
    num = (n * sxm - sx * sm).cast("double")
    dx = (n * sxx - sx * sx).cast("double")
    dm = (n * smm - sm * sm).cast("double")
    return (
        j.select(
            F.col(key_col),
            "d",
            F.when(dm > 0, _fx6(num / dm)).alias("beta"),
            F.when((dx > 0) & (dm > 0), _fx6(num / (F.sqrt(dx) * F.sqrt(dm)))).alias(
                "corr_vm"
            ),
            n.alias("n_obs"),
        )
        .filter(F.col("n_obs") >= min_obs)
        .orderBy(key_col, "d")
    )
