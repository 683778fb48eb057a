"""Hypertable-style continuous rollup: one scan, every resolution.

The reference materializes weekly/monthly/yearly gold tables with three
separate pandas resamples over the same daily bars
(`downloader_wmy.py:110-117` — three passes). The Spark-native
generalization is a single GROUPING SETS aggregation: day/week/month
buckets computed once, one shuffle, map-side partial aggregation shared
across resolutions. At 100 TB this is the difference between scanning the
fact table R times and once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESOLUTIONS = ("day", "week", "month")


def multi_resolution_rollup(
    df: DataFrame,
    time_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    value_col: str = "value",
    resolutions: Sequence[str] = RESOLUTIONS,
) -> DataFrame:
    """Aggregate (count, sum, min, max) per key at every resolution in ONE
    grouping-sets pass. ``date_trunc`` buckets are ISO (week starts
    Monday) on both Spark and DuckDB, so the oracle is exact. Each output
    row's resolution is recovered from ``grouping()`` bits; its bucket is
    the coalesce of the trunc columns (exactly one is non-grouped per
    set)."""
    keys = list(key_cols)
    trunc_cols = {f"_r_{r}": F.date_trunc(r, F.col(time_col)) for r in resolutions}
    base = df.withColumns(trunc_cols)
    sets = [[F.col(k) for k in keys] + [F.col(f"_r_{r}")] for r in resolutions]
    grouped = base.groupingSets(
        sets, *[F.col(k) for k in keys], *[F.col(c) for c in trunc_cols]
    )
    resolution = None
    for r in resolutions[:-1]:
        cond = F.grouping(f"_r_{r}") == 0
        resolution = (
            F.when(cond, F.lit(r)) if resolution is None else resolution.when(cond, F.lit(r))
        )
    resolution = resolution.otherwise(F.lit(resolutions[-1]))
    bucket = F.coalesce(*[F.col(f"_r_{r}") for r in resolutions])
    # grouping() is only legal inside the agg list of a grouping-sets
    # aggregation, so resolution/bucket are emitted there, then projected
    return grouped.agg(
        resolution.alias("resolution"),
        bucket.alias("bucket_start"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(value_col), 6).alias("sum_value"),
        F.round(F.min(value_col), 6).alias("min_value"),
        F.round(F.max(value_col), 6).alias("max_value"),
    ).select(
        *keys,
        "resolution",
        "bucket_start",
        "n_rows",
        "sum_value",
        "min_value",
        "max_value",
    )
