"""Table registry for the driver's synthetic parquet tables.

One ``spark.read.parquet`` per table; parquet carries the authoritative
schema (TESTDATA.md / FIXTURES.md §A). Loading is lazy and per-path, so the
scan node Catalyst builds gets column pruning and filter pushdown for free —
``.explain`` on any engine query should show ``PushedFilters`` and a narrow
``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one table. Parquet scan => vectorized reader + pushdown.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    outright; read it as raw nanos (legacy conf) and convert with integer
    DIV (float division loses sub-us precision at 1e18 nanos).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
