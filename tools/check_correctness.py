"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, column names, and
order-insensitive values (floats rounded to 6 significant-ish digits).

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

import __spark_entry__ as entrymod
from global_stock_data_warehouse_spark.session import get_spark

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
# CHECK_EXACT=1: bit-exact float comparison (mirrors the driver's value
# hash, which has NO tolerance); default rounds to ~9 significant digits.
EXACT = os.environ.get("CHECK_EXACT", "0") == "1"


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, int) and EXACT:
        # driver-parity: DuckDB HUGEINT/int vs Spark bigint both land here;
        # floats must stay floats (int 5 != float 5.0 under a value hash)
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        if EXACT:
            return v
        # ~9 significant digits: loose enough for double-sum drift,
        # tight enough to catch real bugs.
        return round(v, 9 - int(math.floor(math.log10(abs(v)))) - 1)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def _normalize(rows, cols):
    # NULL-safe total order: sort on the repr of each normalized cell.
    return sorted(
        (tuple(_norm_cell(v) for v in row) for row in rows),
        key=lambda r: tuple(repr(v) for v in r),
    ), sorted(c.lower() for c in cols)


def main(names: list[str]) -> int:
    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    targets = names or list(qs)
    failures = []
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            if EXACT:
                # the driver materializes the oracle through pandas, where
                # HUGEINT (DuckDB's integer-sum result type) becomes float64
                # and hash-mismatches Spark's bigint even for equal values —
                # flag any oracle emitting one
                desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
                huge = [r[0] for r in desc if "HUGEINT" in str(r[1]).upper()]
                if huge:
                    failures.append(name)
                    print(f"FAIL {name}: oracle emits HUGEINT columns {huge} "
                          "(float64 under the driver's pandas fetch)")
                    continue
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sn, sc = _normalize(srows, scols)
        dn, dc = _normalize(drows, dcols)
        status = "OK"
        if sc != dc:
            status = f"SCHEMA MISMATCH spark={sc} duck={dc}"
        elif len(sn) != len(dn):
            status = f"ROWCOUNT MISMATCH spark={len(sn)} duck={len(dn)}"
        elif sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            status = f"VALUE MISMATCH first-diffs={diffs}"
        if status != "OK":
            failures.append(name)
            print(f"FAIL {name}: {status}")
        else:
            print(f"OK   {name} ({len(sn)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(targets) - len(failures)}/{len(targets)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
