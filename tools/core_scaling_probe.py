#!/usr/bin/env python
"""Core-scaling probe: the heavy operator family at sf1+-equivalent scale,
measured at two core counts (VERDICT r12 item 4).

Why this exists: the sf0.1 bench cannot evidence parallel scaling — its
per-query walls are dominated by fixed per-query driver work (planning,
codegen, probe jobs), so 8 cores ties or beats 32 and the "fast at 100 TB"
story rests on plan-shape arguments alone. This probe reuses the
scale-slope harness's deterministic fixtures (tools/scale_slope.py) at a
scale where KERNEL time dominates (default 30x = 150k docs, ~30x the
sf0.1 corpus), runs the kernel-bound family with the noop sink, and
reports wall seconds per core count. A healthy kernel-bound operator
shows time(8 cores) / time(32 cores) approaching 4; orchestration-bound
compositions sit lower, and the number quantifies exactly how much of
each wall parallelizes.

One process measures ONE core count (the Spark master is fixed at JVM
start): run it once per count and merge, e.g.

  SPARK_GRAFT_CPUS=32 python tools/core_scaling_probe.py --out /tmp/c32.json
  SPARK_GRAFT_CPUS=8  python tools/core_scaling_probe.py --out /tmp/c8.json
  python tools/core_scaling_probe.py --merge /tmp/c32.json /tmp/c8.json \
      --out SCALING_r13.json

Methodology mirrors the bench: construction + noop write timed together,
repeat sweeps round-robin, per-op MIN reported alongside all sweeps (the
min is the contention-robust statistic for a ratio; medians carry JVM
weather). Fixtures are materialized parquet (read like the bench, not
in-memory lineage) and are generated once per scale under
.scale_fixtures/ before any timing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

DEFAULT_OPS = [
    # kernel-bound family (dedup / similarity / classify / corpus)
    "ngram_jaccard_neardup",
    "minhash_neardup",
    "simhash_multi_index",
    "remove_duplicate_spans",
    "record_linkage",
    "dedup_components",
    "incremental_minhash",
    "token_vote_classify",
    "dsir_select",
    "embedding_neardup_lsh",
    # compositions (orchestration share expected higher)
    "llm_gold_pipeline",
    "training_prep",
]


def measure(ops: list[str], scale: int, repeat: int) -> dict:
    import scale_slope as sl

    spark = sl.get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _warm(b):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from b

    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(256).repartition(n_cpus).mapInPandas(_warm, "id long").count()

    registry = sl._ops()
    missing = [o for o in ops if o not in registry]
    if missing:
        raise SystemExit(f"unknown ops (not in scale_slope registry): {missing}")

    # materialize fixtures before timing
    for kind in ("docs", "vecs", "cvecs", "people", "edges"):
        sl.fixture(spark, kind, scale)

    runs: dict[str, list[float]] = {o: [] for o in ops}
    for sweep in range(repeat):
        for o in ops:
            build = registry[o][0]
            spark.sparkContext.setJobDescription(f"core-probe {o} sweep{sweep}")
            t0 = time.time()
            df = build(spark, scale)
            df.write.format("noop").mode("overwrite").save()
            runs[o].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    return {
        "cpus": n_cpus,
        "scale": scale,
        "repeat": repeat,
        "load_avg": list(os.getloadavg()),
        "runs": runs,
        "min": {o: min(ts) for o, ts in runs.items()},
    }


def merge(paths: list[str]) -> dict:
    parts = [json.load(open(p)) for p in paths]
    parts.sort(key=lambda d: -d["cpus"])
    hi, lo = parts[0], parts[-1]
    core_ratio = hi["cpus"] / lo["cpus"]
    out = {
        "scale": hi["scale"],
        "cpus": [p["cpus"] for p in parts],
        "core_ratio": core_ratio,
        "per_op": {},
    }
    for o, thi in hi["min"].items():
        tlo = lo["min"].get(o)
        if tlo is None:
            continue
        out["per_op"][o] = {
            f"c{hi['cpus']}_min_s": thi,
            f"c{lo['cpus']}_min_s": tlo,
            "speedup_hi_over_lo": round(tlo / thi, 2) if thi else None,
            "runs_hi": hi["runs"][o],
            "runs_lo": lo["runs"][o],
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default=",".join(DEFAULT_OPS))
    ap.add_argument("--scale", type=int, default=30)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--out", required=True)
    ap.add_argument("--merge", nargs="*", default=None,
                    help="merge per-CPU artifacts instead of measuring")
    args = ap.parse_args()
    if args.merge:
        result = merge(args.merge)
    else:
        result = measure(args.ops.split(","), args.scale, args.repeat)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result.get("min") or result.get("per_op"), indent=1))


if __name__ == "__main__":
    main()
