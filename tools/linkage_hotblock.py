#!/usr/bin/env python
"""record_linkage hot-block sweep: where does the quadratic bite, and
where does the armed-by-default tripwire fire?

The main scale harness (tools/scale_slope.py) measures record_linkage
under a GROWING corpus with CONSTANT block sizes — the operator's design
regime, measured linear. This sweep holds the corpus fixed (60k records,
healthy blocks of ~8 rows) and grows ONE degenerate block (the
NULL/default-key failure the tripwire exists for) from 0.8% to 53% of
the corpus, with the tripwire disarmed, so SCALE.md can document:

- measured wall/shuffle/pair growth as the hot block grows (the pair
  count is ~h^2/2 — the quadratic the caller would otherwise discover
  as tasks that "just run for hours");
- the exact sweep point where the default "auto" rule
  (worst^2/2 > 32 * n AND worst > 10_000) starts refusing.

Usage: python tools/linkage_hotblock.py   # prints one JSON line per size
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import importlib.util

spec = importlib.util.spec_from_file_location(
    "scale_slope", os.path.join(_REPO, "tools", "scale_slope.py")
)
_h = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_h)

N = 60_000
HOT_SIZES = [500, 2_000, 8_000, 16_000, 32_000]


def main() -> None:
    from global_stock_data_warehouse_spark.operators.dedup import record_linkage

    spark = _h.get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = _h.gen_people(spark, N).localCheckpoint(eager=True)
    for hot in HOT_SIZES:
        df = base.withColumn(
            "blk",
            F.when(F.col("doc_id") < hot, F.lit(-1).cast("long")).otherwise(
                F.col("blk")
            ),
        )
        # the armed default's verdict — the probe runs eagerly inside the
        # call, so a refused plan raises right here
        try:
            record_linkage(df, "name", ["blk"], max_distance=2)
            fired = False
        except ValueError:
            fired = True
        # measured cost with the tripwire explicitly disarmed
        sb0 = _h.shuffle_write_bytes(spark)
        t0 = time.time()
        out = record_linkage(
            df, "name", ["blk"], max_distance=2, max_block_rows=None
        )
        n_pairs = out.count()
        wall = time.time() - t0
        sb1 = _h.shuffle_write_bytes(spark)
        print(
            json.dumps(
                {
                    "hot_block_rows": hot,
                    "hot_share": round(hot / N, 3),
                    "tripwire_fires": fired,
                    "sec": round(wall, 2),
                    "shuffle_mb": round((sb1 - sb0) / 1e6, 1)
                    if sb0 >= 0 and sb1 >= 0
                    else None,
                    "n_pairs": n_pairs,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
