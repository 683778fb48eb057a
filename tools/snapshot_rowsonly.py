"""Pin the rows-only queries' outputs as deterministic value snapshots.

The 21 rows-only queries (hash-value-specific: xxhash64 signatures,
LSH buckets, kmeans centroids, ...) have no DuckDB oracle, so the
driver's gate only checks their ROW COUNTS — a regression that changes
their VALUES while keeping the count would pass silently. Every one of
them is nevertheless DETERMINISTIC by design (seeded hyperplanes,
md5-order selection, fixed-point accumulation), so their sf0.001
outputs can be pinned: this script runs each twice (determinism check),
records md5(sorted rows) + row count into ROWSONLY_SNAPSHOTS.json, and
tests/test_rowsonly_snapshot.py replays the comparison in-suite.

Intentional output changes: re-run this script and commit the new JSON
alongside the change (the test failure message says exactly that).

Usage: python tools/snapshot_rowsonly.py [name ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from global_stock_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(REPO, "ROWSONLY_SNAPSHOTS.json")


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return round(v, 9 - int(math.floor(math.log10(abs(v)))) - 1)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def snapshot_df(df) -> tuple[str, int, list[str]]:
    rows = sorted(
        (tuple(_norm_cell(v) for v in row) for row in df.collect()),
        key=repr,
    )
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return h, len(rows), sorted(c.lower() for c in df.columns)


def main(names: list[str]) -> int:
    spark = get_spark("rowsonly-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    targets = names or [n for n in qs if n not in oracles]
    snaps = {}
    rc = 0
    for name in targets:
        h1, n1, cols = snapshot_df(qs[name](spark, SF_DIR))
        h2, n2, _ = snapshot_df(qs[name](spark, SF_DIR))
        if (h1, n1) != (h2, n2):
            print(f"NONDETERMINISTIC {name}: {h1}/{n1} vs {h2}/{n2} — NOT pinned")
            rc = 1
            continue
        snaps[name] = {"value_md5": h1, "rows": n1, "cols": cols}
        print(f"PINNED {name}: rows={n1} md5={h1}")
    existing = {}
    if os.path.exists(OUT) and names:
        existing = json.load(open(OUT))
    existing.update(snaps)
    with open(OUT, "w") as f:
        json.dump(existing if names else snaps, f, indent=1, sort_keys=True)
    print(f"\nwrote {OUT} ({len(existing if names else snaps)} snapshots)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
