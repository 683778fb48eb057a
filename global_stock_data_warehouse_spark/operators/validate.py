"""Per-entity data-quality gates + quarantine (A8/A9 + the wmy SKIP gates).

The reference validates each symbol's series before resampling and silently
skips failures (downloader_wmy.py:94-122):
  gate 2: any(close <= 0)                      -> invalid_price
  gate 3: max date-gap since 2024-01-01 > 14d  -> gap_too_large
  gate 4: any(close > high or close < low)     -> ohlc_violation  (post-resample)
(gate 1, empty file, is vacuous in a table-scan world: no rows, no group.)

Spark-first: gates are ONE grouped aggregation producing a per-entity
verdict dim; quarantine is a broadcast anti-join of facts against the failed
set. At scale the verdict table is tiny (one row per symbol), so the
anti-join broadcasts — no second shuffle of the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def gate_summary(
    df: DataFrame,
    key_cols: Sequence[str] = ("symbol",),
    date_col: str = "date",
    close_col: str = "close",
    high_col: str = "high",
    low_col: str = "low",
    gap_since: str = "2024-01-01",
    max_gap_days: int = 14,
) -> DataFrame:
    """One row per entity with boolean gate columns and a pass verdict.

    Gap semantics mirror the reference exactly (downloader_wmy.py:103-107):
    the series is FIRST restricted to dates >= ``gap_since`` and gaps are
    diffs WITHIN that subset — the boundary gap from the last pre-cutoff
    bar is never counted, and a subset with <2 rows yields no gap at all.
    Because dates are monotone under the window order, "previous row is
    also post-cutoff" (lag(date) >= gap_since) selects exactly the
    subset-internal diffs without a second pass over the data.
    """
    w = Window.partitionBy(*key_cols).orderBy(date_col)
    prev = F.lag(F.col(date_col)).over(w)
    gap = F.when(prev >= F.lit(gap_since), F.datediff(F.col(date_col), prev))
    with_gap = df.withColumn("_gap", gap)
    agg = with_gap.groupBy(*key_cols).agg(
        F.max(F.when(F.col(close_col) <= 0, 1).otherwise(0)).cast("boolean").alias("invalid_price"),
        F.coalesce(F.max("_gap") > max_gap_days, F.lit(False)).alias("gap_too_large"),
        F.max(
            F.when((F.col(close_col) > F.col(high_col)) | (F.col(close_col) < F.col(low_col)), 1).otherwise(0)
        )
        .cast("boolean")
        .alias("ohlc_violation"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return agg.withColumn(
        "passed",
        ~F.col("invalid_price") & ~F.col("gap_too_large") & ~F.col("ohlc_violation"),
    )


def freshness_watermark(
    df: DataFrame,
    date_col: str = "date",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """MAX(date) freshness watermark (A2 / main.py:101-112 intent) —
    overall, or per key when ``key_cols`` given. The driver-side
    incremental gate: skip (or bound) the ingest job when the watermark is
    already current. One aggregate; on a date-partitioned table Catalyst
    answers it from partition metadata without scanning rows."""
    if key_cols:
        return df.groupBy(*key_cols).agg(F.max(date_col).alias("watermark"))
    return df.agg(F.max(date_col).alias("watermark"))


def needs_update(df: DataFrame, as_of, date_col: str = "date") -> bool:
    """True if the table's watermark is strictly behind ``as_of``. Empty
    table -> True (never synced). NOT swallowed on error — a broken scan
    must fail the run, unlike the reference's bare ``except: return True``
    (main.py:112), which silently re-ran a possibly-corrupt pipeline."""
    row = freshness_watermark(df, date_col).first()
    return row is None or row.watermark is None or row.watermark < as_of


def quarantine(
    facts: DataFrame,
    verdicts: DataFrame,
    key_cols: Sequence[str] = ("symbol",),
) -> tuple[DataFrame, DataFrame]:
    """Split facts into (clean, quarantined) by the verdict dim.

    The verdict side is per-entity (small) -> broadcast semi/anti join,
    which AQE would pick anyway but we pin it for plan stability.
    """
    failed = broadcast(verdicts.filter(~F.col("passed")).select(*key_cols))
    clean = facts.join(failed, list(key_cols), "left_anti")
    bad = facts.join(failed, list(key_cols), "left_semi")
    return clean, bad
