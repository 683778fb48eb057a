"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced with a noop write
(full execution, no driver collect — measures the engine, not py4j
serialization).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from global_stock_data_warehouse_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("gsdw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Generic warmup: JVM/codegen/parquet-reader init, not the benched
    # queries — touch every input table's reader (incl. the events
    # TIMESTAMP(NANOS) conversion path) so per-query timings measure the
    # queries, not one-time reader initialization.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Warm the reusable Python UDF worker pool (fork + numpy/pandas import
    # per worker — one-time cost that would otherwise land on whichever
    # Arrow-batched query happens to run first).
    def _warm_workers(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(256).repartition(n_cpus).mapInPandas(_warm_workers, "id long").count()

    # Warm the JVM's codegen/JIT paths for the common physical shapes
    # (shuffle agg, broadcast join, window) on synthetic data — one-time
    # compiler init, nothing from the benched queries.
    from pyspark.sql import Window, functions as F

    base = spark.range(10_000).selectExpr("id", "id % 7 AS k", "id * 1.5 AS v")
    dim = spark.range(7).selectExpr("id AS k", "id * 2 AS w")
    (
        base.join(F.broadcast(dim), "k")
        .withColumn("r", F.sum("v").over(Window.partitionBy("k").orderBy("id")))
        .groupBy("k")
        .agg(F.sum("r"), F.avg("v"), F.max("w"))
        .collect()
    )

    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        try:
            entrymod._t(spark, sf_dir, t).limit(1024).collect()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
