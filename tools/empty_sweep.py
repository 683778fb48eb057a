"""Empty-corpus sweep: run every oracled query against 0-row copies of
all ten fixture tables and compare spark vs oracle.

The companion of tools/null_sweep.py on the other degenerate axis: an
empty table exercises every driver-side `.collect()[0]` scalar probe,
every `min/max` anchor, every quota derivation, and every window over
an empty frame. A CRASH here is a real robustness bug (an incremental
pipeline's first run, a filter that eliminated everything, an empty
landing partition); a value divergence is an oracle-contract gap
(e.g. one engine emits a 0-count row where the other emits nothing).

Usage: python tools/empty_sweep.py [name ...]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from global_stock_data_warehouse_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return round(v, 9 - int(math.floor(math.log10(abs(v)))) - 1)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def _normalize(rows, cols):
    return sorted(
        (tuple(_norm_cell(v) for v in row) for row in rows),
        key=lambda r: tuple(repr(v) for v in r),
    ), sorted(c.lower() for c in cols)


def build_empty_dir(spark, out: str) -> None:
    for t in TABLES:
        df = (
            entrymod._t(spark, SRC, t)
            if t == "events"
            else spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        )
        df.limit(0).write.parquet(
            os.path.join(out, f"{t}.parquet"), mode="overwrite"
        )


def main(names: list[str]) -> int:
    spark = get_spark("empty-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="emptysweep_")
    build_empty_dir(spark, out)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{out}/{t}.parquet/*.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    targets = names or [n for n in qs if n in oracles]
    failures = []
    report = {}
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, out)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: SPARK CRASH: {str(e)[:200]}")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            continue
        sn, sc = _normalize(srows, scols)
        dn, dc = _normalize(drows, dcols)
        if sc != dc:
            failures.append(name)
            report[name] = {"status": "SCHEMA_MISMATCH"}
            print(f"FAIL {name}: SCHEMA {sc} vs {dc}")
        elif len(sn) != len(dn):
            failures.append(name)
            report[name] = {"status": "ROWS_MISMATCH", "spark": len(sn), "duck": len(dn)}
            print(f"FAIL {name}: ROWS spark={len(sn)} duck={len(dn)}")
        elif sn != dn:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:2]
            report[name] = {"status": "VALUES_MISMATCH"}
            print(f"FAIL {name}: VALUES {diffs}")
        else:
            report[name] = {"status": "OK", "rows": len(sn)}
            print(f"OK   {name} ({len(sn)} rows, {time.time()-t0:.1f}s)")
    shutil.rmtree(out, ignore_errors=True)
    print(f"\n{len(targets) - len(failures)}/{len(targets)} clean on empty tables")
    if failures:
        print("failing:", " ".join(failures))
    out_path = os.environ.get("EMPTY_SWEEP_REPORT")
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump(
                {"sf_dir": SRC, "n_clean": len(targets) - len(failures),
                 "n_total": len(targets), "results": report},
                fh, indent=1, default=str)
        print(f"report -> {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
