"""Bucketed-table storage: co-located, shuffle-free fact joins.

At 100 TB the dominant cost of a fact-x-fact equi-join (e.g. prices x
corporate-actions, both keyed by symbol) is shuffling both sides. Writing
both tables bucketed by the join key with the same bucket count makes the
join a zero-exchange zip of pre-sorted buckets: Catalyst recognizes the
output partitioning of both scans as HashPartitioning(key, n) and skips
the Exchange entirely (verified by the bucketing test, which asserts the
joined plan contains NO shuffle).

This is the Spark-native successor to the reference's per-market SQLite
sharding (main.py:153): the shard key becomes a declared physical layout
the optimizer can exploit, instead of six opaque files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    ``sort_cols`` additionally sorts within buckets, upgrading downstream
    sort-merge joins to skip the sort too. Bucket count must match on both
    sides of a co-located join — pick once per subject area and keep it.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
