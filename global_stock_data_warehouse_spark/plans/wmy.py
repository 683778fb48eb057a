"""The flagship pipeline: validate -> quarantine -> W/M/Y resample -> returns.

Re-expresses the reference's per-file thread-pool pipeline
(downloader_wmy.py:130-179) as ONE distributed job:

    daily bars ──gate_summary──> per-symbol verdicts (tiny)
        │                             │
        └──quarantine (broadcast anti-join)──> clean bars
                │
                ├─ ohlc_resample 'W' ─┐
                ├─ ohlc_resample 'M' ─┼─ unionByName ─ with_period_return ─> gold
                └─ ohlc_resample 'Y' ─┘

Semantics order matters and matches the reference: returns are computed
AFTER quarantine, per (stock, freq), on the resampled series
(downloader_wmy.py:111-117), and the OHLC-violation gate runs on the
RESAMPLED frames (downloader_wmy.py:118-122), not the raw bars — a raw-level
check would be strictly stronger (resampled close>max(high) implies some raw
close>high, not vice versa) and would quarantine symbols the reference
keeps. A symbol violating in ANY frequency frame is dropped from ALL
frequencies, like the reference's whole-file skip.

Scale: one shuffle on (symbol) for gates, one hash-agg shuffle per freq on
(symbol, bucket) with map-side partials, one window shuffle on (symbol) for
the post-resample OHLC gate which the returns window then reuses
(HashPartitioning(stock_id) satisfies ClusteredDistribution(stock_id, freq)).
The verdict join broadcasts. No driver-side loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.resample import ohlc_resample
from global_stock_data_warehouse_spark.operators.returns import with_period_return
from global_stock_data_warehouse_spark.operators.validate import gate_summary, quarantine


def wmy_pipeline(
    bars: DataFrame,
    time_col: str = "date",
    key_col: str = "symbol",
    freqs: Sequence[str] = ("W", "M", "Y"),
    gap_since: str = "2024-01-01",
    max_gap_days: int = 14,
    tiebreak_cols: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """Return (gold, verdicts).

    gold: period_end, open, high, low, close, volume, freq, stock_id,
    period_return — the reference's W/M/Y parquet schema (FIXTURES.md §B4).
    verdicts: one row per symbol with gate booleans (feeds the audit table).
    """
    # Single hash partition on the symbol: HashPartitioning(symbol) satisfies
    # the clustering requirement of the gate aggregation AND every per-freq
    # resample agg (grouping keys are supersets of the partition key), so
    # the whole validate->resample fan-out shares one exchange.
    bars = bars.repartition(key_col)
    raw_verdicts = gate_summary(
        bars,
        key_cols=(key_col,),
        date_col=time_col,
        gap_since=gap_since,
        max_gap_days=max_gap_days,
    )
    # pre-resample gates only (empty/price/gap); OHLC is checked on the
    # resampled frames below, matching the reference's gate order
    pre = raw_verdicts.withColumn(
        "passed", ~F.col("invalid_price") & ~F.col("gap_too_large")
    )
    clean, _ = quarantine(bars, pre, key_cols=(key_col,))

    resampled = None
    for freq in freqs:
        r = ohlc_resample(
            clean,
            freq,
            time_col=time_col,
            key_cols=(key_col,),
            tiebreak_cols=tiebreak_cols,
        )
        resampled = r if resampled is None else resampled.unionByName(r)

    # post-resample OHLC gate (downloader_wmy.py:118-122): any violating
    # bucket in ANY freq drops the symbol everywhere. Whole-partition max
    # over a window keyed on the symbol — computed in the same pass as the
    # resample output, no second scan of the raw bars.
    ohlc_bad = F.max(
        F.when(
            (F.col("close") > F.col("high")) | (F.col("close") < F.col("low")), 1
        ).otherwise(0)
    ).over(Window.partitionBy(key_col))
    kept = (
        resampled.withColumn("_ohlc_viol", ohlc_bad)
        .filter(F.col("_ohlc_viol") == 0)
        .drop("_ohlc_viol")
    )

    gold = with_period_return(
        kept.withColumnRenamed(key_col, "stock_id"),
        key_cols=("stock_id", "freq"),
    )

    # verdict dim (monitoring path): fold the post-resample OHLC verdict in;
    # quarantined symbols were never resampled -> ohlc_violation = False,
    # exactly like the reference (gate 4 only runs past gates 1-3)
    post = resampled.groupBy(key_col).agg(
        F.max(
            F.when(
                (F.col("close") > F.col("high")) | (F.col("close") < F.col("low")), 1
            ).otherwise(0)
        )
        .cast("boolean")
        .alias("ohlc_violation")
    )
    verdicts = (
        pre.drop("ohlc_violation")
        .join(post, key_col, "left")
        .withColumn("ohlc_violation", F.coalesce("ohlc_violation", F.lit(False)))
        .withColumn("passed", F.col("passed") & ~F.col("ohlc_violation"))
    )
    return gold, verdicts


def incremental_wmy(
    bars: DataFrame,
    delta: DataFrame,
    gold_prev: DataFrame,
    verdicts_prev: DataFrame,
    key_col: str = "symbol",
    **wmy_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Incremental gold refresh: recompute ONLY symbols present in the new
    ``delta`` batch; splice everything else through from the previous run.

    The reference re-runs the whole per-file conversion on every sync
    (downloader_wmy.py:130-179 loops every input file); its only
    incrementality is the driver-level watermark skip (main.py:101-112).
    This plan makes incrementality symbol-grained: resample buckets,
    period returns, and validation gates are all per-symbol functions of
    that symbol's FULL history, so the changed-symbol set is the exact
    recompute frontier — results are bit-identical to a full rerun
    (asserted in tests/test_wmy_pipeline.py).

    Scale: the changed-symbol dim is tiny (one row per touched symbol) ->
    broadcast semi-join prunes the fact scan to changed partitions;
    untouched gold/verdict rows pass through with an equally broadcast
    anti-join. Work scales with the delta, not the table.
    """
    changed = delta.select(key_col).distinct()
    changed_b = F.broadcast(changed)
    gold_changed, verdicts_changed = wmy_pipeline(
        bars.join(changed_b, key_col, "left_semi"), key_col=key_col, **wmy_kwargs
    )
    gold_kept = gold_prev.join(
        changed_b.withColumnRenamed(key_col, "stock_id"), "stock_id", "left_anti"
    )
    verdicts_kept = verdicts_prev.join(changed_b, key_col, "left_anti")
    return (
        gold_kept.unionByName(gold_changed),
        verdicts_kept.unionByName(verdicts_changed),
    )


def audit_record(verdicts: DataFrame, market_id: str) -> DataFrame:
    """One audit row from the verdict dim (K3 / wmy_conversion_audit).

    total = success + skip; success_rate = round(success/total*100, 2);
    execution_time in UTC+8 (downloader_wmy.py:62-83 semantics).
    """
    return verdicts.agg(
        F.lit(market_id).alias("market_id"),
        F.count(F.lit(1)).alias("total_files"),
        F.sum(F.col("passed").cast("long")).alias("success_count"),
        F.sum((~F.col("passed")).cast("long")).alias("skip_count"),
        F.round(F.sum(F.col("passed").cast("long")) * 100.0 / F.count(F.lit(1)), 2).alias(
            "success_rate"
        ),
    ).withColumn(
        "execution_time", F.from_utc_timestamp(F.current_timestamp(), "Asia/Taipei")
    )
