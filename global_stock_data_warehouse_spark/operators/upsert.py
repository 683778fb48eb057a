"""Keyed upsert / last-writer-wins dedup (K1/A7).

The reference's storage contract is ``INSERT OR REPLACE`` on PK
``(date, symbol)`` (downloader_tw.py:118-120): re-ingesting a batch is
idempotent and newer writes win. Spark-first equivalents, preferred order:

1. Delta ``MERGE INTO`` when delta-spark is importable (true in-place upsert,
   transactional, scales via partition pruning on the merge condition);
2. plain-Parquet fallback: union old+new, keep the winner per key via a
   ``row_number`` window ordered by a version/ingest column, overwrite.

``dedup_last_writer`` (the window kernel) is also exposed standalone — it is
the engine's general keyed-dedup operator. At scale the window shuffle
partitions by the PK, the same partitioning the table layout should use, so
a bucketed/partitioned layout makes this shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def delta_available() -> bool:
    try:  # delta-spark is optional in this environment
        import delta  # noqa: F401

        return True
    except Exception:
        return False


def dedup_last_writer(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Sequence[str],
    descending: bool = True,
) -> DataFrame:
    """Keep exactly one row per key: the max (default) of ``order_col``
    (lexicographic when a sequence). Pass the tiebreak columns as a
    SEQUENCE, not a pre-built struct column: a struct duplicates its
    fields through the window shuffle when they are also output columns
    (measured 21.2 -> 12.9 MB on the sf0.1 lineitem dedup)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    order = [
        F.col(c).desc() if descending else F.col(c).asc() for c in order_cols
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def upsert_keyed(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    key_cols: Sequence[str],
    order_col: str = "_ingest_ts",
) -> None:
    """Idempotent last-writer-wins upsert of ``new_rows`` into ``path``.

    Adds ``order_col`` (ingest timestamp) if absent. Prefers Delta MERGE;
    falls back to read-union-dedup-overwrite on plain Parquet.
    """
    if order_col not in new_rows.columns:
        new_rows = new_rows.withColumn(order_col, F.current_timestamp())

    if delta_available():
        from delta.tables import DeltaTable

        if DeltaTable.isDeltaTable(spark, path):
            target = DeltaTable.forPath(spark, path)
            cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
            (
                target.alias("t")
                .merge(new_rows.alias("s"), cond)
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            return
        new_rows.write.format("delta").mode("overwrite").save(path)
        return

    # Parquet fallback: read-modify-overwrite with window dedup.
    try:
        existing = spark.read.parquet(path)
    except Exception:
        existing = None
    combined = new_rows if existing is None else existing.unionByName(new_rows, allowMissingColumns=True)
    deduped = dedup_last_writer(combined, key_cols, order_col)
    # Materialize before overwrite: lazy plans must not read the path being
    # replaced mid-write. localCheckpoint severs lineage to the source files.
    deduped.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
