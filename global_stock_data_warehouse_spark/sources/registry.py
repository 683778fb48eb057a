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
    """Scan one table. Parquet scan => vectorized reader + pushdown."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
