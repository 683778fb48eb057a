"""Value snapshots for the rows-only queries.

The 21 rows-only queries have no DuckDB oracle (hash-value-specific
outputs), so the driver's gate checks only their row counts — a value
regression would pass silently. They are all deterministic by design,
so this test replays the pinned sf0.001 snapshots
(ROWSONLY_SNAPSHOTS.json, written by tools/snapshot_rowsonly.py).

If you changed a rows-only query's output ON PURPOSE, regenerate:
    python tools/snapshot_rowsonly.py [name]
and commit the updated JSON with your change."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

SNAPS = json.load(open(os.path.join(REPO, "ROWSONLY_SNAPSHOTS.json")))


@pytest.mark.parametrize("name", sorted(SNAPS))
def test_rowsonly_snapshot(spark, name):
    import __spark_entry__ as entrymod
    from snapshot_rowsonly import snapshot_df

    assert name not in entrymod.oracle_sql(), (
        f"{name} gained an oracle — drop it from ROWSONLY_SNAPSHOTS.json"
    )
    h, n, cols = snapshot_df(entrymod.queries()[name](spark, "/root/testdata/sf0.001"))
    exp = SNAPS[name]
    assert (h, n, cols) == (exp["value_md5"], exp["rows"], exp["cols"]), (
        f"{name}: snapshot mismatch (rows {n} vs {exp['rows']}). If this "
        "change is intentional, regenerate with "
        f"`python tools/snapshot_rowsonly.py {name}` and commit the JSON."
    )
