"""Degenerate-axis sweep for the 21 rows-only queries (VERDICT r8 item 6).

The NULL/empty sweeps (tools/null_sweep.py, tools/empty_sweep.py) compare
spark vs oracle — unavailable for the rows-only queries (xxhash64
signatures, LSH buckets, kmeans centroids, BPE merges have no DuckDB
twin). But the snapshot harness gives a comparison target the oracle
can't: on each degenerate axis the query must (a) NOT THROW — a crash on
NULL-carrying or empty input is a real robustness bug (first run of an
incremental pipeline, a filter that eliminated everything), (b) return
the SAME SCHEMA as its pinned clean-input snapshot
(ROWSONLY_SNAPSHOTS.json), and (c) be DETERMINISTIC (two runs, identical
value-md5 — seeded hyperplanes and md5-order selection must not wobble
when NULL rows enter the frame).

Usage: python tools/rowsonly_sweep.py [--axis null|empty] [name ...]
       (default: both axes over every rows-only query)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from global_stock_data_warehouse_spark.session import get_spark  # noqa: E402

from empty_sweep import build_empty_dir  # noqa: E402
from null_sweep import build_null_dir  # noqa: E402
from snapshot_rowsonly import snapshot_df  # noqa: E402

SNAP_PATH = os.path.join(REPO, "ROWSONLY_SNAPSHOTS.json")


def sweep_axis(spark, axis: str, targets: list[str], qs, snaps) -> list[str]:
    out = tempfile.mkdtemp(prefix=f"rowsonly_{axis}_")
    (build_null_dir if axis == "null" else build_empty_dir)(spark, out)
    failures = []
    for name in targets:
        t0 = time.time()
        try:
            h1, n1, cols1 = snapshot_df(qs[name](spark, out))
            h2, n2, _ = snapshot_df(qs[name](spark, out))
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name} [{axis}]: threw: {str(e)[:300]}")
            continue
        pinned_cols = snaps.get(name, {}).get("cols")
        if pinned_cols is not None and cols1 != pinned_cols:
            failures.append(name)
            print(f"FAIL {name} [{axis}]: SCHEMA {cols1} vs pinned {pinned_cols}")
        elif (h1, n1) != (h2, n2):
            failures.append(name)
            print(
                f"FAIL {name} [{axis}]: NONDETERMINISTIC "
                f"{h1}/{n1} vs {h2}/{n2}"
            )
        else:
            print(f"OK   {name} [{axis}] ({n1} rows, {time.time()-t0:.1f}s)")
    shutil.rmtree(out, ignore_errors=True)
    return failures


def main(argv: list[str]) -> int:
    axes = ["null", "empty"]
    if argv[:2] and argv[0] == "--axis":
        axes = [argv[1]]
        argv = argv[2:]
    spark = get_spark("rowsonly-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    targets = argv or [n for n in qs if n not in oracles]
    snaps = json.load(open(SNAP_PATH)) if os.path.exists(SNAP_PATH) else {}
    all_failures = []
    for axis in axes:
        print(f"--- axis: {axis} ({len(targets)} rows-only queries) ---")
        all_failures += [
            f"{n}[{axis}]" for n in sweep_axis(spark, axis, targets, qs, snaps)
        ]
    total = len(targets) * len(axes)
    print(f"\n{total - len(all_failures)}/{total} clean across axes {axes}")
    if all_failures:
        print("failing:", " ".join(all_failures))
    return 1 if all_failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
