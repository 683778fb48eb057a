"""Adversarial-unicode contract sweep (sixth degenerate axis, VERDICT
r11 item 4): run every oracled query against a tmp sf-dir whose
documents/events tables carry injected adversarial-unicode rows, and
report which spark/oracle pairs diverge.

The driver fixtures are plain-ASCII in every text column, so a text
operator and its oracle can disagree on multibyte handling (token
splits, length counting, case folding, JSON escapes) and still pass the
gate. tests/test_unicode_contract.py pins the PRIMITIVES; this sweep is
the surface-wide version: inject whole documents/events made of the
adversarial classes the r8/r9 probes showed AGREE between engines —
NBSP / ideographic space / ZWSP / CRLF+tab+formfeed / fullwidth /
emoji-ZWJ / combining marks / regex metacharacters / astral plane /
CJK / RTL / NULL-lookalike strings / quote+backslash soup — and demand
bit-agreement on all 187 oracled queries.

The three ENGINE-DIVERGING primitives (Turkish dotted İ, Greek capital
sigma in final position, vertical tab U+000B — see
tests/test_unicode_contract.py for why) are EXCLUDED by design: they
bound the oracle's domain, and their Spark-side behavior is pinned by
the contract tests instead. Injecting them here would report the
documented domain boundary as a failure.

Usage: python tools/unicode_sweep.py [name ...]   (default: every
oracled query; TPC-H tables are symlinked pristine, so TPC-H-only
queries pass trivially and the text/event family does the work.)
Report via UNICODE_SWEEP_REPORT=path.
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

# One document per adversarial class. Every string below is from the
# ENGINE-AGREEING set (probed r8/r9, pinned in
# tests/test_unicode_contract.py::test_benign_unicode_is_engine_stable
# and ::test_length_counts_code_points_like_duckdb). n_chars is
# len(text) — Python len() counts code points exactly like both
# engines' length().
ADVERSARIAL_DOCS = [
    # NBSP binds (not \s in either engine's tokenizer regex)
    "alpha bound beta gamma the data table",
    # ideographic space U+3000 binds
    "词　组 spark data merge join window",
    # ZWSP binds
    "zero​width word join test batch stream",
    # CR/LF/TAB/FF all split in both engines (U+000B excluded: diverges)
    "line1\r\nline2\tcol\x0cpage the fast sort key",
    # fullwidth letters lowercase in place in both engines
    "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ here data spark window",
    # emoji ZWJ sequences stay intact single tokens
    "\U0001f469‍\U0001f680 emoji family \U0001f468‍\U0001f469‍\U0001f467‍\U0001f466 test data",
    # decomposed combining marks count as separate code points
    "café decomposed naïve résumé marks data",
    # regex metacharacters must never reach an unescaped regex
    "a.b*c (paren) [brack] {brace} pipe| ^caret $dollar plus+ q? back\\slash",
    # astral plane (surrogate pairs in UTF-16 Java; 4-byte UTF-8 duck)
    "\U0001d56c\U0001d593\U0001d586 astral \U00010300\U00010301 plane data",
    # CJK no-case scripts
    "中文文本处理 日本語のテキスト 한국어 데이터",
    # RTL scripts
    "مرحبا بالعالم שלום עולם data",
    # lowercase Greek (capital final-position sigma excluded: diverges)
    "αλφα βητα γαμμα data table",
    # Turkish WITHOUT the dotted capital (İ excluded: diverges)
    "istanbul türkiye ğüşöç straße data",
    # NULL-lookalike strings must stay ordinary tokens
    "None null NULL NaN nan data value",
    # quote and escape soup (JSON-adjacent but in a plain text column)
    "he said \"quoted\" and 'single' and \\ backslash {\"not\": \"json\"}",
]


def build_unicode_dir(spark, out: str) -> None:
    import datetime

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    langs = ["en", "zh", "es", "de", "fr"]
    sources = ["src0", "src1", "web"]
    uni_docs = spark.createDataFrame(
        [
            (910001 + i, t, langs[i % len(langs)], sources[i % len(sources)], len(t))
            for i, t in enumerate(ADVERSARIAL_DOCS)
        ],
        docs.schema,
    )
    docs.unionByName(uni_docs).write.parquet(
        os.path.join(out, "documents.parquet"), mode="overwrite"
    )
    ev = entrymod._t(spark, SRC, "events")
    # event_type with multibyte values; props with unicode JSON values —
    # both engines must group/extract them identically. Timestamps stay
    # inside the fixture's range so max-date anchors don't move.
    uni_ev = spark.createDataFrame(
        [
            (910001, datetime.datetime(2024, 1, 2, 10), 7, "点击", 12.5,
             '{"k": "值", "n": 1}'),
            (910002, datetime.datetime(2024, 1, 3, 11), 7, "café_view", 3.25,
             '{"k": "ümläut", "n": 2}'),
            (910003, datetime.datetime(2024, 1, 4, 12), 8, "αβγ", 9.0,
             '{"k": "emoji \U0001f680", "n": 3}'),
        ],
        ev.schema,
    )
    ev.unionByName(uni_ev).write.parquet(
        os.path.join(out, "events.parquet"), mode="overwrite"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings",
    ):
        os.symlink(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )


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


def main(names: list[str]) -> int:
    spark = get_spark("unicode-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="unisweep_")
    build_unicode_dir(spark, out)

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
    print(
        f"\n{len(targets) - len(failures)}/{len(targets)} clean under "
        f"adversarial-unicode injection"
    )
    if failures:
        print("failing:", " ".join(failures))
    out_path = os.environ.get("UNICODE_SWEEP_REPORT")
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
