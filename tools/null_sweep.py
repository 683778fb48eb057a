"""Exploratory NULL-contract sweep: run every oracled query against a
tmp sf-dir whose documents/events tables carry injected NULL rows, and
report which spark/oracle pairs diverge.

The driver fixtures have no NULLs in the text-pipeline columns, so an
operator and its oracle can encode different NULL contracts and still
pass the gate (the r8 ADVICE proved it for four queries). This sweep is
the systematic version: it reuses the checker's normalization and
prints FAIL lines for triage — each find becomes either an oracle
mirror fix or an operator contract fix plus a pinned test in
tests/test_null_mirror.py.

Usage: python tools/null_sweep.py [name ...]   (default: every oracled
query that reads documents or events; TPC-H tables are left pristine.)
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


def build_null_dir(spark, out: str) -> None:
    import datetime

    from pyspark.sql import functions as F  # noqa: F401

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    null_docs = spark.createDataFrame(
        [
            (900001, "null source doc words here", "en", None, 25),
            (900002, "null nchars doc", "en", "web", None),
            (900003, None, "en", "web", 0),
            (900004, "fully null meta", None, None, None),
            (900005, "   ", "en", "web", 3),
        ],
        docs.schema,
    )
    docs.unionByName(null_docs).write.parquet(
        os.path.join(out, "documents.parquet"), mode="overwrite"
    )
    ev = entrymod._t(spark, SRC, "events")
    null_ev = spark.createDataFrame(
        [
            (900001, None, 1, "click", 50.0, "{}"),
            (900002, datetime.datetime(2024, 1, 2), 1, "click", None, "{}"),
            (900003, None, None, None, None, None),
            (900004, datetime.datetime(2024, 1, 3), None, None, 5.0, None),
            # NULL-value row holding the CORPUS-MAX timestamp: anchors
            # (max-date subqueries) must exclude it like the operators do
            (900005, datetime.datetime(2031, 12, 31), 2, "click", None, "{}"),
        ],
        ev.schema,
    )
    ev.unionByName(null_ev).write.parquet(
        os.path.join(out, "events.parquet"), mode="overwrite"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings",
    ):
        os.symlink(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )


def main(names: list[str]) -> int:
    spark = get_spark("null-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="nullsweep_")
    build_null_dir(spark, out)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(out, f"{t}.parquet")
        glob = f"{p}/*.parquet" if os.path.isdir(p) and not os.path.islink(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

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
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            report[name] = {"status": "ERROR", "detail": str(e)[:300]}
            print(f"FAIL {name}: error: {str(e)[:300]}")
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
    print(f"\n{len(targets) - len(failures)}/{len(targets)} clean under NULL injection")
    if failures:
        print("failing:", " ".join(failures))
    out_path = os.environ.get("NULL_SWEEP_REPORT")
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
