"""One-pass data-quality profiling.

Generalizes the reference's monitoring aggregates (`get_db_summary`,
main.py:114-137) into a per-column profile: null count, distinct count,
min/max — ONE scan, one aggregation producing every column's stats as a
single wide row, then unpivoted with ``stack`` (a zero-shuffle local
expand). The naive per-column loop would scan the table N_cols times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: Sequence[str] | None = None, approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    column; min/max rendered as strings so heterogeneous column types fit
    one result schema.

    ``approx=True`` is the routine-profile scale path: HyperLogLog++
    ``approx_count_distinct`` (rsd 2%) sketches for every column ride ONE
    normal partial/final aggregation — single pass, NO Expand (asserted in
    tests/test_plan_quality.py).

    ``approx=False`` (exact, oracle-comparable) runs ONE aggregation PER
    COLUMN and unions the 1-row results. N sibling ``countDistinct``s in
    a single agg would compile to an Expand replicating every scanned row
    N_cols times; a lone ``countDistinct`` instead uses the two-phase
    partial-distinct strategy, and each per-column plan scans ONLY its own
    column — on columnar storage the N plans together read exactly the
    same bytes as the one-pass version, while shuffling distinct values
    instead of N_cols x |rows| expanded rows.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if approx:
        aggs: list = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            aggs += [
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{c}"),
                F.approx_count_distinct(c, 0.02).alias(f"_dist_{c}"),
                F.min(c).cast("string").alias(f"_min_{c}"),
                F.max(c).cast("string").alias(f"_max_{c}"),
            ]
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', _nulls_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
        )
        return wide.select(
            F.col("_n").alias("n_rows"),
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS "
                "(column_name, n_nulls, n_distinct, min_value, max_value)"
            ),
        ).select(
            "column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
        )

    per_col = [
        df.select(F.col(c)).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(c).isNull(), 1)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        ).select(
            F.lit(c).alias("column_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_value",
            "max_value",
        )
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


def skew_report(
    df: DataFrame,
    keys: Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Join/shuffle-key skew diagnostic — the pre-flight check before
    keying a 100 TB shuffle: per-key concentration statistics as ONE row
    (n_rows, n_keys, max_key_rows, p50_key_rows, top1_share, topN_share,
    skew_ratio = max / mean). A skew_ratio in the hundreds says "salt
    this key or let AQE split it" before the job, not after the straggler.

    One shuffle (the per-key count, map-side partials); the stats and
    top-N sides both read the counts frame, so it is checkpointed and
    computed once. The top-N sum compiles to TakeOrderedAndProject; the
    median of key sizes is exact (one task over n_keys rows — fine for
    realistic key cardinalities; swap to approx_percentile beyond ~10^8
    keys). All shares are single divisions of exact counts -> 6dp
    engine-exact.
    """
    kcols = [F.col(c) for c in keys]
    counts = (
        df.groupBy(*kcols)
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key_rows"),
        F.expr("percentile(n, 0.5)").alias("p50_key_rows"),
    )
    topn = (
        counts.orderBy(F.col("n").desc(), *[F.col(c).asc() for c in keys])
        .limit(top_n)
        .agg(F.sum("n").alias("_top_rows"))
    )
    return (
        totals.crossJoin(F.broadcast(topn))
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("max_key_rows").cast("long").alias("max_key_rows"),
            F.round("p50_key_rows", 6).alias("p50_key_rows"),
            F.round(F.col("max_key_rows") / F.col("n_rows"), 6).alias("top1_share"),
            F.round(F.col("_top_rows") / F.col("n_rows"), 6).alias("topn_share"),
            F.round(
                F.col("max_key_rows").cast("double") * F.col("n_keys") / F.col("n_rows"),
                6,
            ).alias("skew_ratio"),
        )
    )


# Benford first-digit probabilities log10(1 + 1/d), pre-evaluated to fixed
# literals so both engines compare against the IDENTICAL constants (no
# runtime log10, no libm-ulp divergence).
BENFORD_P = {
    1: 0.301029995664,
    2: 0.176091259056,
    3: 0.124938736608,
    4: 0.096910013008,
    5: 0.079181246048,
    6: 0.066946789631,
    7: 0.057991946978,
    8: 0.051152522447,
    9: 0.045757490561,
}


def benford_audit(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Benford's-law first-digit audit of a positive monetary column — the
    classic fabricated-numbers / corrupted-feed screen for financial data
    (naturally occurring amounts follow P(d) = log10(1 + 1/d); flat or
    spiky digit histograms flag synthetic or truncated sources).

    Bit-exactness: the value is first quantized to integer minor units
    (round(x * scale) as BIGINT) and the leading digit read from the
    INTEGER's decimal string — integers stringify identically on every
    engine, unlike doubles. Expected shares are fixed literal constants.
    Always EXACTLY 9 output rows — a digit that never occurs, the
    strongest fabrication signal of all, still reports n=0, observed=0,
    deviation=expected rather than silently vanishing.

    Plan (r6 rewrite): ONE scan, ONE global aggregate of nine conditional
    sums + the total, then an explode of nine literal structs — no digit
    domain frame, no broadcast join, no window. The r5 shape
    (groupBy(digit) -> outer join vs a createDataFrame domain -> single-
    partition total window) was structurally single-scan but still paid
    ~0.7s of fixed machinery per run at sf0.1: the Python-built domain
    plans as a Scan ExistingRDD (driver-side Python evaluation per
    action), plus a BroadcastExchange and an AQE-planned join for two
    <= 9-row sides. Digit-conditional partial sums ride the SAME
    map-side pass a groupBy would use; everything after the one
    single-row exchange is constant work. Measured at sf0.1: 1.02s ->
    0.58s warm median; the plan is 1 scan + 1 exchange total.
    """
    fx = F.round(F.col(value_col).cast("double") * scale, 0).cast("long")
    digits = (
        df.select(fx.alias("fx"))
        .filter(F.col("fx") > 0)
        .select(F.substring(F.col("fx").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    one_row = digits.agg(
        F.count(F.lit(1)).alias("_total"),
        *[
            # coalesce: sum over ZERO rows is NULL, and the empty-input
            # contract above promises n=0 / observed=0 / deviation=expected
            # (count-based _total is already 0-safe).
            F.coalesce(
                F.sum(F.when(F.col("digit") == d, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"_n{d}")
            for d in sorted(BENFORD_P)
        ],
    )
    per_digit = one_row.select(
        "_total",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("digit"),
                        F.col(f"_n{d}").alias("n"),
                        F.lit(BENFORD_P[d]).alias("_p"),
                    )
                    for d in sorted(BENFORD_P)
                ]
            )
        ).alias("s"),
    ).select("_total", "s.digit", "s.n", "s._p")
    obs = F.round(F.col("n") / F.greatest(F.col("_total"), F.lit(1)), 6)
    exp = F.round(F.col("_p"), 6)
    return per_digit.select(
        "digit",
        "n",
        obs.alias("observed"),
        exp.alias("expected"),
        F.round(F.abs(obs - exp), 6).alias("deviation"),
    ).orderBy("digit")


def ks_drift(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift per group vs the pooled
    corpus: D = max_v |F_group(v) - F_corpus(v)| — the NONPARAMETRIC
    member of the drift-monitor family (source_kl needs a token model,
    source_chi2_drift a term domain; KS sees any shift in a numeric
    distribution — doc lengths collapsing, a feed truncating, a scraper
    suddenly emitting boilerplate stubs — with no binning choices).

    Exactness: ECDF values are integer cumulative counts divided once;
    both engines compute identical doubles, so the max and its argmax
    (the smallest value attaining D, reported as ``at_value``) agree
    bit-for-bit; D is rounded at 6dp for the report.

    Scale: the only corpus-sized pass is the (group, value) count agg —
    map-side partials absorb the fact stream, and everything after runs
    on the |groups| x |distinct values| grid (value domains of real
    numeric profile columns — lengths, token counts, prices-in-cents —
    are bounded, so the grid does not grow with the corpus). The dense
    grid (every group needs an ECDF step at EVERY corpus value) is a
    broadcast cross join of two tiny frames, and the cumulative windows
    partition by group over that grid, never over the corpus."""
    counts = (
        # NULL groups/values are excluded: a NULL value has no place on
        # an ECDF axis (and engines disagree on NULL ORDER BY placement),
        # and a NULL group would be a groupBy-group the equi-join grid
        # silently drops — filter once, uniformly.
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .filter(F.col("grp").isNotNull() & F.col("v").isNotNull())
        .groupBy("grp", "v")
        .agg(F.count(F.lit(1)).alias("n_gv"))
        .localCheckpoint(eager=True)
    )
    domain = counts.groupBy("v").agg(F.sum("n_gv").alias("n_v"))
    grp_tot = counts.groupBy("grp").agg(F.sum("n_gv").alias("n_g"))
    n_total = counts.agg(F.sum("n_gv").alias("n_total"))
    dom_cum = domain.select(
        "v",
        F.sum("n_v").over(Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )).alias("cum_v"),
    )
    grid = grp_tot.crossJoin(F.broadcast(dom_cum)).join(
        counts, ["grp", "v"], "left"
    ).fillna({"n_gv": 0})
    cum_g = F.sum("n_gv").over(
        Window.partitionBy("grp").orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    ecdf = grid.withColumn("cum_g", cum_g).crossJoin(F.broadcast(n_total))
    d = F.abs(
        F.col("cum_g").cast("double") / F.col("n_g").cast("double")
        - F.col("cum_v").cast("double") / F.col("n_total").cast("double")
    )
    return (
        ecdf.select(F.col("grp").alias(group_col), "v", d.alias("_d"), "n_g")
        .groupBy(group_col)
        .agg(
            F.max("n_g").cast("long").alias("n_docs"),
            F.round(F.max("_d"), 6).alias("ks_d"),
            F.expr("min_by(v, struct(-_d, v))").alias("at_value"),
        )
        .orderBy(group_col)
    )
