"""Singleton degenerate sweep: run every oracled query against a tmp
sf-dir where events hold exactly ONE row per entity, documents exactly
ONE per source, and embeddings exactly ONE per label — the fourth
degenerate axis after NULL / empty / constant.

Why singletons: every lag/window/return operator has a "no previous
row" branch (returns NULL-return legs, drawdowns with no history,
resamples with one bar, coverage spans of length 1, per-source stats
over one doc). The boundary tests pin a handful of these by hand; this
sweep checks the WHOLE oracled surface systematically — spark and the
DuckDB oracle must take the same branch on every query, because both
run on the same mutated parquet.

Reduction is deterministic (row_number over a total order, keep rank 1)
so the sweep is reproducible run-to-run. TPC-H tables stay pristine
(symlinks), mirroring tools/null_sweep.py.

Usage: python tools/singleton_sweep.py [name ...]   (default: every
oracled query; SINGLETON_SWEEP_REPORT=path persists the outcome JSON.)
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


def build_singleton_dir(spark, out: str) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    w = Window.partitionBy("source").orderBy("doc_id")
    docs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop(
        "_rn"
    ).write.parquet(os.path.join(out, "documents.parquet"), mode="overwrite")

    ev = entrymod._t(spark, SRC, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop(
        "_rn"
    ).write.parquet(os.path.join(out, "events.parquet"), mode="overwrite")

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    w = Window.partitionBy("label").orderBy("vec_id")
    emb.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop(
        "_rn"
    ).write.parquet(os.path.join(out, "embeddings.parquet"), mode="overwrite")

    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    ):
        os.symlink(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )


def main(names: list[str]) -> int:
    spark = get_spark("singleton-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="singletonsweep_")
    build_singleton_dir(spark, out)

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
            report[name] = {"status": "VALUES_MISMATCH"}
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:2]
            print(f"FAIL {name}: VALUES {diffs}")
        else:
            report[name] = {"status": "OK", "rows": len(sn)}
            print(f"OK   {name} ({len(sn)} rows, {time.time()-t0:.1f}s)")
    shutil.rmtree(out, ignore_errors=True)
    print(f"\n{len(targets) - len(failures)}/{len(targets)} clean on singleton tables")
    if failures:
        print("failing:", " ".join(failures))
    out_path = os.environ.get("SINGLETON_SWEEP_REPORT")
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
