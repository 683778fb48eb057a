"""Columnar interchange scans/sinks beyond parquet: ORC.

The reference's persistence is SQLite + CSV snapshots (storage.py,
snapshot exports); this engine's native store is parquet. ORC is the one
other columnar format large Spark estates actually exchange (Hive-era
warehouses hand ORC to Spark daily), and Spark's native vectorized ORC
reader gives it the same predicate-pushdown / column-pruning / partition-
pruning properties as the parquet scan — so the engine exposes it as a
first-class landing format rather than forcing a pre-conversion hop.

Scale notes: identical to the parquet path — explicit schema (never
infer), pushdown verified by plan tests, `spark.sql.files.maxPartitionBytes`
governs split sizing. Writes go through the same partitionBy contract as
`sink_parquet` so downstream partition pruning works unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def scan_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Scan an ORC directory/file. Pass the schema explicitly in
    pipelines (schema drift should fail loudly at the scan, and ORC
    footers are still one extra read per file at 100 TB); ``None`` reads
    the embedded schema for exploration."""
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        reader = reader.schema(schema)
    return reader.orc(path)


def sink_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write ORC with the engine's standard sink contract (explicit mode,
    optional hive-style partition columns for downstream pruning)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
