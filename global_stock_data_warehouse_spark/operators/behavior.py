"""Event-stream behavioral analytics: cohort retention, transition
matrices, hopping (sliding) windows, RFM segmentation, sliding-window
distinct counts, last-touch attribution, sweep-line peak concurrency,
plus robust outlier profiles and histograms.

The reference's event-shaped workloads stop at per-symbol resampling
(`transformer.py` resample loops); an analytics warehouse serving the
same data also needs the user-journey shapes every product team runs.
These are built on the `events` stream (user_id / ts / event_type /
value).

Scale notes (100 TB):
- ``cohort_retention`` is two hash shuffles on ``user_id`` (first-touch
  agg, then the fact re-join) that share a partitioning, plus a final
  tiny (cohort, offset) agg whose partial absorbs map-side.
- ``event_transitions`` is one window shuffle on ``user_id``; the
  transition matrix itself is |event_type|^2 rows — the probability
  normalization window runs on that tiny aggregate, not the fact table.
- ``hopping_window_agg`` uses Spark's native ``window(ts, size, slide)``
  generator: each event is replicated size/slide times map-side BEFORE
  the partial aggregation, so the shuffle carries per-(window, key)
  partials, never the replicated events.
- ``rfm_segments`` / ``rolling_distinct_users`` / ``attribution_last_touch``
  each spend exactly one fact-table shuffle; their second-stage windows
  and rollups run over per-customer / per-day / per-conversion rows.
- ``max_concurrency`` replaces the naive global sweep (a single-task
  window) with the two-phase prefix sum: bounded per-bucket windows plus
  a one-row-per-bucket offset pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Classic cohort-retention triangle.

    A user's cohort is the ``period_days``-aligned bucket (anchored at
    1970-01-05, a Monday) of their FIRST event date; every later event
    lands at integer offset ``floor(days_since_first / period_days)``.
    Output: one row per (cohort_start, period_offset) with the distinct
    active-user count.

    Deterministic across engines: dates + integer arithmetic only.
    """
    # NULL user/ts rows are excluded uniformly: a NULL user would be
    # counted as one "user" by the groupBy while a NULL ts has no cohort
    # date and previously surfaced as a period_offset=NULL matrix row
    events = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    d = F.to_date(ts_col)
    firsts = events.groupBy(user_col).agg(F.min(d).alias("first_d"))
    # anchor 1970-01-05 is a Monday, so period_days=7 cohorts align to
    # ISO weeks; integer floor-division keeps the bucketing exact
    anchor = F.lit("1970-01-05").cast("date")
    # FLOOR division (not cast-to-int truncation): truncation rounds
    # toward zero, so pre-anchor dates (negative datediff) would bucket
    # one period too late and diverge from SQL's floor `//` semantics
    cohort = F.date_add(
        anchor,
        (F.floor(F.datediff(F.col("first_d"), anchor) / period_days) * period_days)
        .cast("int"),
    )
    joined = events.select(F.col(user_col), d.alias("d")).join(firsts, user_col)
    return (
        joined.withColumn("cohort_start", cohort)
        .withColumn(
            "period_offset",
            F.floor(F.datediff(F.col("d"), F.col("first_d")) / period_days).cast("int"),
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences.

    One window shuffle on ``user_col`` orders each user's stream; the
    (from, to) bigram counts aggregate with map-side partials, and the
    row-normalized probability is a window over the tiny matrix itself.
    ``p`` is a single integer division — order-independent, so it is
    exact across engines.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *tiebreak_cols)
    # NULL states/users/timestamps are noise, not Markov states: a NULL
    # event_type previously emitted a from_type=NULL matrix row
    events = events.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    pairs = (
        events.withColumn("to_type", F.lead(type_col).over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_total = Window.partitionBy("from_type")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(row_total), 6)
    )


def hopping_window_agg(
    events: DataFrame,
    size: str = "14 days",
    slide: str = "7 days",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Overlapping (hopping) time-window aggregation via Spark's native
    ``window()`` generator — each event contributes to size/slide
    consecutive windows, aligned to the 1970-01-01 epoch.

    The per-window sum uses the engine's fixed-point idiom (sum of
    ``round(value*100)`` integer-valued doubles) so the result is
    independent of partial-sum order and bit-exact across engines.
    """
    # NULL ts has no window (Spark's hopping generator silently emits
    # zero rows for it while SQL time_bucket keeps a NULL bucket) and a
    # NULL value would count in n_events without contributing to the
    # sum — excluded uniformly, same policy as decayed_totals
    events = events.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    win = F.window(F.col(ts_col), size, slide)
    return (
        events.select(win.alias("w"), F.col(value_col))
        .groupBy(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col(value_col) * 100, 0)) / 100.0).alias("sum_value"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier profile: median, MAD (median absolute
    deviation), and the count of points beyond ``k * MAD``.

    Two grouped exact-percentile aggregations (median, then MAD) — each a
    single hash shuffle on ``group_cols``, reusing the same partitioning —
    then a map-side flag re-join. Order statistics, not accumulations:
    ``percentile`` averages at most two values, so results are exact
    across engines (no float-summation drift).

    At 100 TB exact percentile holds the group's values per-partition
    buffer-side; for billion-row groups swap ``F.percentile`` for
    ``F.percentile_approx`` (same plan shape, bounded memory).
    """
    keys = [F.col(c) for c in group_cols]
    med = df.groupBy(*keys).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("med")
    )
    with_med = df.join(med, list(group_cols))
    mad = with_med.groupBy(*keys).agg(
        F.percentile(F.abs(F.col(value_col) - F.col("med")), F.lit(0.5)).alias("mad"),
        F.first("med").alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    flagged = with_med.drop("med").join(mad, list(group_cols))
    return (
        flagged.withColumn(
            "is_outlier",
            (F.abs(F.col(value_col) - F.col("med")) > F.lit(k) * F.col("mad")).cast("int"),
        )
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.first("n").alias("n"),
            F.sum("is_outlier").alias("n_outliers"),
        )
    )


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    width: float,
) -> DataFrame:
    """Fixed-width histogram: bin id = floor(value / width).

    Map-only binning + one tiny agg; the division is a single IEEE-754
    operation so bin assignment is bit-identical across engines.
    """
    bin_id = F.floor(F.col(value_col) / F.lit(width)).cast("long")
    return (
        df.select(bin_id.alias("bin_id"), F.col(value_col))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
        .withColumn("bin_lo", F.col("bin_id") * F.lit(width))
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary each
    scored into ``n_tiles`` quantile buckets via ``ntile``.

    One fact shuffle for the per-customer aggregate; the three ntile
    windows run over ONE ROW PER CUSTOMER (orders of magnitude smaller
    than the fact table) — a global sort each, made deterministic by the
    customer-id tiebreak in every ORDER BY (ntile assignment is
    order-sensitive; an untiebroken sort would be engine-dependent).
    Monetary uses the fixed-point integer-sum idiom for cross-engine
    exactness.
    """
    per_cust = orders.groupBy(F.col(customer_col).alias("custkey")).agg(
        F.max(date_col).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        (F.sum(F.round(F.col(amount_col) * 100, 0)) / 100.0).alias("monetary"),
    )
    r_w = Window.orderBy(F.col("last_order").desc(), F.col("custkey"))
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("custkey"))
    m_w = Window.orderBy(F.col("monetary").desc(), F.col("custkey"))
    return per_cust.select(
        "custkey",
        "last_order",
        "frequency",
        "monetary",
        F.ntile(n_tiles).over(r_w).alias("r_score"),
        F.ntile(n_tiles).over(f_w).alias("f_score"),
        F.ntile(n_tiles).over(m_w).alias("m_score"),
    )


def rolling_distinct_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing ``window_days``-day distinct-user count per calendar day
    — the sliding-distinct shape windows can't express (COUNT DISTINCT
    has no mergeable frame state).

    Replicate-then-aggregate: each event fans out map-side to the
    ``window_days`` window-end days it influences (a bounded x7
    replication, absorbed by countDistinct's partial dedup before the
    single day-keyed shuffle), clipped to the observed [min_d, max_d]
    span via a broadcast 1-row bounds aggregate. At 100 TB the
    alternative — a per-day self-join over the spine — shuffles the fact
    table ``window_days`` times; this shuffles (day, user) partials
    once.
    """
    d = F.to_date(ts_col)
    bounds = events.agg(F.min(d).alias("d0"), F.max(d).alias("d1"))
    fan = events.select(F.col(user_col), d.alias("d")).crossJoin(
        F.broadcast(bounds)
    )
    exploded = fan.select(
        user_col,
        F.explode(
            F.expr(f"sequence(d, least(date_add(d, {window_days - 1}), d1))")
        ).alias("day"),
    )
    return exploded.groupBy("day").agg(
        F.countDistinct(user_col).alias(f"users_{window_days}d")
    )


def attribution_last_touch(
    events: DataFrame,
    touch_types: Sequence[str] = ("view", "click"),
    conversion_type: str = "purchase",
    lookback_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch marketing attribution: each conversion is credited to
    the user's most recent touch event within ``lookback_days``.

    One window shuffle on ``user_col``: the carry-forward of the last
    touch is ``last(CASE..., ignorenulls)`` over the ordered stream —
    touch id and touch ts ride the SAME frame/condition so they always
    come from the same row. Conversions outside the lookback keep NULL
    attribution (never silently credit a stale touch).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_touch = F.col(type_col).isin(list(touch_types))
    touch_id = F.last(F.when(is_touch, F.col(id_col)), ignorenulls=True).over(w)
    touch_ts = F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True).over(w)
    gap = F.col(ts_col).cast("long") - F.col("_touch_ts").cast("long")
    in_window = F.col("_touch_ts").isNotNull() & (
        gap <= lookback_days * 86400
    )
    return (
        events.withColumn("_touch_id", touch_id)
        .withColumn("_touch_ts", touch_ts)
        .filter(F.col(type_col) == conversion_type)
        .select(
            F.col(id_col).alias("conversion_id"),
            F.col(user_col),
            F.col(ts_col).alias("conversion_ts"),
            F.when(in_window, F.col("_touch_id")).alias("touch_id"),
            F.when(in_window, F.col("_touch_ts")).alias("touch_ts"),
            F.when(in_window, gap).alias("gap_sec"),
        )
    )


def max_concurrency(
    intervals: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_days: int = 7,
    closed: bool = True,
) -> DataFrame:
    """Peak concurrency over a set of [start, end) intervals (max
    simultaneously-open sessions) and the earliest instant it is reached
    — the sweep-line problem, DISTRIBUTED.

    A naive sweep is a running sum over one global ordering — a
    single-task window at any scale. This runs the classic two-phase
    prefix sum instead (same discipline as ``sessionize_two_phase``):

    1. endpoint deltas (+1 start / -1 end) bucket by coarse time; a
       per-bucket window (bounded rows) computes local running sums and
       each bucket's total.
    2. ONE ROW PER BUCKET flows into a tiny cumulative-offset window;
       offsets broadcast-join back, making every point's global running
       sum exact without any global sort of the points.

    ``closed=True`` (default) treats intervals as closed [start, end]:
    starts sort before coincident ends, so a zero-length interval
    (start == end — e.g. a single-event session) still counts 1 at its
    instant, and two closed intervals meeting at a point overlap there.
    ``closed=False`` gives half-open [start, end) semantics (ends sort
    first; back-to-back intervals never double-count, but zero-length
    intervals are invisible). Ties on the peak resolve to the earliest
    timestamp. Output: one row (max_concurrent, at_ts).
    """
    starts = intervals.select(F.col(start_col).alias("ts"), F.lit(1).alias("delta"))
    ends = intervals.select(F.col(end_col).alias("ts"), F.lit(-1).alias("delta"))
    pts = starts.unionByName(ends).withColumn(
        "bucket", F.floor(F.col("ts").cast("long") / (bucket_days * 86400))
    )
    delta_order = F.col("delta").desc() if closed else F.col("delta").asc()
    wloc = (
        Window.partitionBy("bucket")
        .orderBy(F.col("ts"), delta_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # referenced by both the bucket-total aggregate and the final join:
    # materialize once so the caller's interval-building lineage (often a
    # sessionize pass) isn't re-executed per consumer
    local = pts.withColumn("local_run", F.sum("delta").over(wloc)).localCheckpoint(
        eager=True
    )
    totals = local.groupBy("bucket").agg(F.sum("delta").alias("bucket_total"))
    woff = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("bucket_total").over(woff), F.lit(0))
    ).select("bucket", "offset")
    runs = local.join(F.broadcast(offsets), "bucket").withColumn(
        "run", F.col("local_run") + F.col("offset")
    )
    # peak + earliest instant in ONE aggregation: min_by over the key
    # (-run, ts) picks the row with the largest run, earliest ts — no
    # second pass over `runs` and no peak-value re-join; the isNotNull
    # filter preserves the empty-input contract (0 rows, not 1 null row)
    return runs.agg(
        F.max("run").alias("max_concurrent"),
        F.expr("min_by(ts, named_struct('nr', -run, 'ts', ts))").alias("at_ts"),
    ).filter(F.col("max_concurrent").isNotNull())


def sorted_array_pairs(arr, a_name: str = "a", b_name: str = "b"):
    """All unordered pairs (arr[i], arr[j]), i < j, as an array of structs
    — map-side combination expansion for per-group pair generation (the
    join-free alternative to a group-keyed self-join: one groupBy shuffle
    builds the sorted array, pairs expand in the projection). Quadratic
    only in ARRAY size; callers bound group size by construction."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )


def basket_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_pair_count: int = 2,
) -> DataFrame:
    """Market-basket association rules over (basket, item) rows:
    co-occurrence count, support, confidence, and lift per item pair
    (item_a < item_b canonical).

    Pair generation is NOT a self-join: ONE groupBy(basket) shuffle
    builds the per-basket distinct item set (collect_set dedups in the
    aggregate, so no pre-distinct shuffle either), and pairs expand
    map-side from the sorted array — quadratic only in basket SIZE
    (bounded ~items-per-order), linear in baskets. Item supports derive
    from the same aggregate, so the basket exchange is computed once and
    reused. Supports broadcast back over the pair counts. Every metric
    is a single division of exact integer counts — engine-exact at 6dp.
    """
    basket_items = (
        # r13 NOTE: a pinned-wide keyed exchange here (fan_keyed) was
        # A/B-measured SLOWER (0.84 -> 1.39 s warm at sf0.1): the 32-way
        # exchange of the raw (basket, item) rows costs more than the
        # narrow aggregate it widens saves. Left on the AQE-managed plan.
        baskets.select(F.col(basket_col).alias("bid"), F.col(item_col).alias("item"))
        .groupBy("bid")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
        # three consumers (totals, item supports, pairs) would each
        # re-execute the caller's scan + this aggregation; materialize it
        # once (at 100 TB: persist the basketized frame)
        .localCheckpoint(eager=True)
    )
    # basket total as a 1-row broadcast scalar (bm25_score pattern): no
    # driver-side count() job, and the basket exchange is shared with the
    # pair/item aggregations below via ReuseExchange
    totals = basket_items.agg(F.count(F.lit(1)).alias("_n_baskets"))
    item_counts = (
        basket_items.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pair_structs = sorted_array_pairs(F.col("items"), "item_a", "item_b")
    pairs = (
        basket_items.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.item_a").alias("item_a"), F.col("p.item_b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "item_a",
        "item_b",
        "n_ab",
        F.round(F.col("n_ab") / F.col("_n_baskets").cast("double"), 6).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
        F.round(
            F.col("n_ab") * F.col("_n_baskets").cast("double")
            / (F.col("n_a") * F.col("n_b")),
            6,
        ).alias("lift"),
    )


def decayed_totals(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_days: int = 7,
    max_halvings: int = 10,
    cents_scale: int = 100,
) -> DataFrame:
    """Exponential time-decay weighted totals per group — the recency-
    weighted revenue/engagement rollup behind trend dashboards and
    feature-store freshness signals (weight halves every
    ``halflife_days``, anchored to the frame's OWN max date so the
    result is a pure function of the data, not of wall-clock time).

    Bit-exactness via DYADIC fixed-point: the weight is 2^-h with
    h = min(floor(age_days / halflife_days), max_halvings) — an INTEGER
    halving count — so each contribution is
    round(value * cents_scale) << (max_halvings - h): an exact BIGINT.
    The sum is integer arithmetic (order-independent, overflow-checked by
    Spark), divided ONCE at the end by cents_scale * 2^max_halvings.
    No transcendental, no float summation order dependence — engines
    agree to the last bit where exp(-lambda*t) weighting never can.
    Ages past ``max_halvings`` halvings keep the floor weight
    2^-max_halvings (~1/1000 at the default) rather than dropping to
    zero: the total remains monotone in the data.

    Plan: one scalar max-date action folded into a broadcast cross join
    (no single-partition window over the fact table), then ONE hash agg
    on ``group_col`` whose partials absorb map-side. The fact table is
    scanned once and never shuffled wider than (group, 2 bigints)."""
    # NULL ts or value rows are EXCLUDED up front: a NULL age would
    # otherwise silently take the cap weight (Spark's least() skips
    # NULLs: least(NULL, 10) = 10) and a NULL value would count in
    # n_events while contributing to neither sum — both silent skews.
    events = events.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    anchor = events.agg(F.max(F.to_date(ts_col)).alias("_anchor"))
    h = F.least(
        F.floor(
            F.datediff(F.col("_anchor"), F.to_date(ts_col)) / F.lit(halflife_days)
        ),
        F.lit(max_halvings),
    ).cast("int")
    # half-up floor, not round(): Spark rounds HALF_UP, DuckDB banker's —
    # floor(x + 0.5) is the same expression on both engines
    cents = F.floor(F.col(value_col) * cents_scale + F.lit(0.5)).cast("long")
    denom = float(cents_scale) * float(1 << max_halvings)
    anchored = events.crossJoin(F.broadcast(anchor)).select(
        F.col(group_col),
        cents.alias("_cents"),
        h.alias("_h"),
    )
    contrib = F.expr(
        f"_cents * shiftleft(CAST(1 AS BIGINT), {int(max_halvings)} - _h)"
    )
    return (
        anchored.groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("_cents").cast("double") / cents_scale, 2).alias(
                "raw_total"
            ),
            F.round(F.sum(contrib).cast("double") / denom, 6).alias("decayed_total"),
        )
        .orderBy(group_col)
    )
