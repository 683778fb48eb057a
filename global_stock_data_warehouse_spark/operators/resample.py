"""Calendar OHLC resample — the reference's core analytic (A5/W3).

pandas semantics to match (downloader_wmy.py:39-52):
    open   -> first value in bucket (by time)
    high   -> max
    low    -> min
    close  -> last value in bucket (by time)
    volume -> sum
    bucket label = period end (W-FRI / month-end / year-end)
    empty buckets dropped (automatic: groupBy only sees observed rows)

Spark-first design: ONE hash aggregate per (key, bucket) — no window, no
sort. first/last are expressed with ``min_by``/``max_by`` keyed on a
deterministic ordering struct, which (a) is order-insensitive and therefore
safe under Spark's unordered shuffle, unlike bare ``F.first``, and (b) gets
partial aggregation (map-side combine) for free, so at 100 TB the shuffle
carries one row per (symbol, bucket) per map task — not the raw bars.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.functions.buckets import BUCKETERS


def ohlc_resample(
    df: DataFrame,
    freq: str,
    time_col: str = "date",
    key_cols: Sequence[str] = ("symbol",),
    open_col: str = "open",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    volume_col: str = "volume",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Aggregate bars into calendar buckets.

    freq: 'W' (week ending Friday), 'M' (month end), 'Y' (year end).
    ``tiebreak_cols`` extend the first/last ordering beyond ``time_col`` for
    inputs where the time column alone is not unique.
    """
    if freq not in BUCKETERS:
        raise ValueError(f"freq must be one of {sorted(BUCKETERS)}, got {freq!r}")
    bucket: Column = BUCKETERS[freq](time_col)
    order = F.struct(*[F.col(time_col), *[F.col(c) for c in tiebreak_cols]])
    return (
        df.groupBy(*key_cols, bucket.alias("period_end"))
        .agg(
            F.min_by(F.col(open_col), order).alias("open"),
            F.max(F.col(high_col)).alias("high"),
            F.min(F.col(low_col)).alias("low"),
            F.max_by(F.col(close_col), order).alias("close"),
            F.sum(F.col(volume_col)).alias("volume"),
        )
        .withColumn("freq", F.lit(freq))
    )
