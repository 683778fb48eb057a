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
(downloader_wmy.py:111-117). The OHLC-violation gate is a pre-check on raw
bars here (close>high | close<low can only hold post-resample if it held on
some raw row, since high=max, low=min, close=one of the raw closes — so the
raw-level check subsumes the reference's post-resample check).

Scale: one shuffle on (symbol) for gates, one hash-agg shuffle per freq on
(symbol, bucket) with map-side partials, window on (stock_id, freq) for
returns. The verdict join broadcasts. No driver-side loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
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
    verdicts = gate_summary(
        bars,
        key_cols=(key_col,),
        date_col=time_col,
        gap_since=gap_since,
        max_gap_days=max_gap_days,
    )
    clean, _ = quarantine(bars, verdicts, key_cols=(key_col,))

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

    gold = with_period_return(
        resampled.withColumnRenamed(key_col, "stock_id"),
        key_cols=("stock_id", "freq"),
    )
    return gold, verdicts


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
        F.round(F.sum(F.col("passed").cast("long")) / F.count(F.lit(1)) * 100, 2).alias(
            "success_rate"
        ),
    ).withColumn(
        "execution_time", F.from_utc_timestamp(F.current_timestamp(), "Asia/Taipei")
    )
