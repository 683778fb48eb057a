"""Constant-corpus sweep: run oracled queries against ALL-IDENTICAL
documents/events rows — the third degenerate axis after NULL injection
(tools/null_sweep.py) and empty tables (tools/empty_sweep.py).

Every doc shares one text (one giant dedup group, maximal pair volume),
every event shares one user/ts/type/value (one session, one cohort
cell, a single hot key). Exercises: single-group pair joins, window
folds over one partition key, tripwire thresholds, zero-variance
statistics, and division-by-range guards.

Usage: python tools/const_sweep.py [name ...]  (default: EVERY
registered query — full-surface parity with the NULL and empty sweeps
per VERDICT r9 item 4; rows-only queries run crash-detection-only and
print SKIP). CONST_REPORT=path persists the per-query outcome JSON.
r9 baseline: 55/55 clean on the curated subset; r10: full surface.
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
sys.path.insert(0, os.path.join(REPO, "tools"))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from null_sweep import _normalize  # noqa: E402

from global_stock_data_warehouse_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")

# r10: the default is the FULL registered surface (VERDICT r9 item 4);
# the curated r9 subset is gone — pass names explicitly for a subset.


def build_const_dir(spark, out: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet")).select(
        "doc_id",
        F.lit("the same exact text for every single document here").alias(
            "text"
        ),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(50).alias("n_chars"),
    )
    docs.write.parquet(os.path.join(out, "documents.parquet"))
    ev = entrymod._t(spark, SRC, "events").select(
        "event_id",
        F.lit("2024-03-01 12:00:00").cast("timestamp").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(10.0).alias("value"),
        "props",
    )
    ev.write.parquet(os.path.join(out, "events.parquet"))
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings",
    ):
        os.symlink(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )


def main(names: list[str]) -> int:
    spark = get_spark("const-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="constsweep_")
    build_const_dir(spark, out)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        p = os.path.join(out, f"{t}.parquet")
        glob = f"{p}/*.parquet" if os.path.isdir(p) and not os.path.islink(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    targets = names or list(qs)
    failures = []
    report: dict = {}
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, out)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:
            failures.append(name)
            report[name] = {"status": f"SPARK_CRASH: {str(ex)[:200]}"}
            print(f"FAIL {name}: SPARK CRASH: {str(ex)[:200]}")
            continue
        if name not in oracles:
            report[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
            print(f"SKIP {name} (rows-only: {len(srows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:
            failures.append(name)
            report[name] = {"status": f"DUCK_ERROR: {str(ex)[:200]}"}
            print(f"FAIL {name}: duck: {str(ex)[:200]}")
            continue
        sn, sc = _normalize(srows, scols)
        dn, dc = _normalize(drows, dcols)
        if sc != dc:
            failures.append(name)
            report[name] = {"status": f"FAIL: SCHEMA {sc} vs {dc}"[:220]}
            print(f"FAIL {name}: SCHEMA {sc} vs {dc}")
        elif len(sn) != len(dn):
            failures.append(name)
            report[name] = {"status": f"FAIL: ROWS {len(sn)} vs {len(dn)}"}
            print(f"FAIL {name}: ROWS {len(sn)} vs {len(dn)}")
        elif sn != dn:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:2]
            report[name] = {"status": "FAIL: VALUES"}
            print(f"FAIL {name}: VALUES {diffs}")
        else:
            report[name] = {"status": "OK", "rows": len(sn)}
            print(f"OK   {name} ({len(sn)} rows, {time.time()-t0:.1f}s)")
    shutil.rmtree(out, ignore_errors=True)
    print(f"\n{len(targets) - len(failures)}/{len(targets)} clean on constant corpus")
    if failures:
        print("failing:", " ".join(failures))
    out_path = os.environ.get("CONST_REPORT")
    if out_path:
        payload = {
            "src": SRC,
            "n_targets": len(targets),
            "n_clean": len(targets) - len(failures),
            "results": report,
        }
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"report -> {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
