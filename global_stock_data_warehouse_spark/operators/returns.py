"""Lag-based period returns (W1) and date-gap detection (W2).

pandas semantics to match: ``close.pct_change().round(4)`` per stock ordered
by period (downloader_wmy.py:54-58); ``date.diff().dt.days`` per stock
(downloader_wmy.py:103-107).

Scale note: the window partitions by the entity key, so the shuffle is the
same one the resample already did — co-partitioned plans can reuse the
exchange. Per-entity history is small (thousands of rows), so no frame
spilling concerns even at a 100 TB total.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_period_return(
    df: DataFrame,
    value_col: str = "close",
    order_col: str = "period_end",
    key_cols: Sequence[str] = ("stock_id", "freq"),
    out_col: str = "period_return",
    ndigits: int = 4,
) -> DataFrame:
    """Fractional change vs previous row within each key, 4-dp rounded.

    First row per key -> NULL (pandas pct_change head NaN).
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn(out_col, F.round(F.col(value_col) / prev - 1, ndigits))


def with_date_gap(
    df: DataFrame,
    date_col: str = "date",
    key_cols: Sequence[str] = ("symbol",),
    out_col: str = "gap_days",
) -> DataFrame:
    """Day distance from the previous row per key (first row -> NULL)."""
    w = Window.partitionBy(*key_cols).orderBy(date_col)
    return df.withColumn(out_col, F.datediff(F.col(date_col), F.lag(F.col(date_col)).over(w)))
