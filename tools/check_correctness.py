"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, column names, and
order-insensitive values (floats rounded to 6 significant-ish digits).

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import json
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

# Queries whose float columns are ROUNDED INSIDE the query (e.g. 4dp):
# Spark's moving-frame covar/var/corr and DuckDB's segment-tree window
# aggregates sum in different orders, so a value sitting exactly on a
# rounding boundary can flip its last digit between engines on unlucky
# data. These queries live OUTSIDE the driver's hash window by design;
# compare their float cells with a one-last-digit epsilon instead of
# bit equality so the local mirror isn't flaky.
EPS_QUERIES = {"rolling_beta": 2e-4, "unigram_logprob": 2e-4, "source_kl": 2e-4, "autocorrelation": 2e-4, "dsir_weights": 2e-4, "nb_self_loglik": 2e-4}


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


def _eps_compare(srows, scols, drows, dcols, eps):
    """Row-aligned epsilon comparison: non-float cells form the row key
    (must match exactly); float cells must agree within ``eps``. Returns
    None when equal, else a mismatch description."""

    def split(rows, cols):
        idx = sorted(range(len(cols)), key=lambda i: cols[i].lower())
        out = {}
        for row in rows:
            key, vals = [], []
            for i in idx:
                v = row[i]
                if isinstance(v, float):
                    vals.append(v)
                else:
                    key.append(repr(_norm_cell(v)))
            out.setdefault(tuple(key), []).append(vals)
        return out

    smap, dmap = split(srows, scols), split(drows, dcols)
    if set(smap) != set(dmap):
        extra = list(set(smap) ^ set(dmap))[:2]
        return f"KEY MISMATCH (e.g. {extra})"
    for k, svals in smap.items():
        dvals = dmap[k]
        if len(svals) != len(dvals):
            return f"ROWCOUNT at key {k}"
        for va, vb in zip(sorted(svals), sorted(dvals)):
            for x, y in zip(va, vb):
                both_nan = (
                    isinstance(x, float) and isinstance(y, float)
                    and math.isnan(x) and math.isnan(y)
                )
                if both_nan:
                    continue
                if x is None or y is None:
                    if x is not y:
                        return f"NULL MISMATCH at {k}: {x} vs {y}"
                    continue
                if abs(x - y) > eps:
                    return f"VALUE at {k}: {x} vs {y} (eps={eps})"
    return None


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
    # CHECK_REPORT=path: persist a per-query JSON record so mirror-only
    # verification claims are auditable in-repo (r9 ADVICE), not just
    # stdout lines lost to the session.
    report: dict = {}
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            report[name] = {"status": f"SPARK_ERROR: {str(e)[:200]}"}
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            report[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
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
                    report[name] = {"status": f"HUGEINT: {huge}"}
                    print(f"FAIL {name}: oracle emits HUGEINT columns {huge} "
                          "(float64 under the driver's pandas fetch)")
                    continue
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            report[name] = {"status": f"DUCK_ERROR: {str(e)[:200]}"}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sn, sc = _normalize(srows, scols)
        dn, dc = _normalize(drows, dcols)
        status = "OK"
        if sc != dc:
            status = f"SCHEMA MISMATCH spark={sc} duck={dc}"
        elif len(sn) != len(dn):
            status = f"ROWCOUNT MISMATCH spark={len(sn)} duck={len(dn)}"
        elif name in EPS_QUERIES:
            err = _eps_compare(srows, scols, drows, dcols, EPS_QUERIES[name])
            if err:
                status = f"EPS MISMATCH {err}"
        elif sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            status = f"VALUE MISMATCH first-diffs={diffs}"
        report[name] = {"status": status if status == "OK" else f"FAIL: {status[:200]}",
                        "rows": len(sn)}
        if name in EPS_QUERIES and status == "OK":
            report[name]["eps"] = EPS_QUERIES[name]
        if status != "OK":
            failures.append(name)
            print(f"FAIL {name}: {status}")
        else:
            print(f"OK   {name} ({len(sn)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(targets) - len(failures)}/{len(targets)} passed")
    out_path = os.environ.get("CHECK_REPORT")
    if out_path:
        payload = {
            "sf_dir": SF_DIR,
            "exact": EXACT,
            "n_targets": len(targets),
            "n_passed": len(targets) - len(failures),
            "results": report,
        }
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"report -> {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
