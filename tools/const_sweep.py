"""Constant-corpus sweep: run oracled queries against ALL-IDENTICAL
documents/events rows — the third degenerate axis after NULL injection
(tools/null_sweep.py) and empty tables (tools/empty_sweep.py).

Every doc shares one text (one giant dedup group, maximal pair volume),
every event shares one user/ts/type/value (one session, one cohort
cell, a single hot key). Exercises: single-group pair joins, window
folds over one partition key, tripwire thresholds, zero-variance
statistics, and division-by-range guards.

Usage: python tools/const_sweep.py [name ...]  (default: the heavy
dedup/session/stats subset; pass names for others). r8 baseline: 38/38
clean.
"""

from __future__ import annotations

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

DEFAULT_TARGETS = [
    # r9 batteries (pricing + curation)
    "line_boilerplate", "quality_gate", "novelty_timeline", "zipf_slope",
    "split_adjusted_prices", "stale_price_runs", "range_position",
    "overnight_intraday", "liquidity_screen", "index_daily_return",
    "factor_rank_ic", "beta_vs_index", "calendar_anomalies",
    "market_regime_streaks", "dup_cluster_stats", "packing_efficiency", "decile_spread", "risk_summary",
    "dedup_exact", "ngram_jaccard_neardup", "dedup_components",
    "dedup_keep_best", "paragraph_dedup", "remove_duplicate_spans",
    "duplicate_spans", "dedup_funnel", "incremental_dedup", "sessionize",
    "sessionize_skewsafe", "session_paths", "max_concurrency",
    "cohort_retention", "event_transitions", "scd2_history", "text_stats",
    "corpus_clean", "tfidf_topterms", "bm25_score", "term_chi2",
    "length_ks_drift", "bigram_prob_score", "decay_weighted",
    "hopping_window", "window_tumbling_7d", "wmy_weekly_resample_returns",
    "agg_gap_max", "drift_alert_report", "pps_weighted_sample",
    "temperature_sample", "rebalance_sample", "dsir_select",
    "token_vote_classify", "classifier_confusion",
    "classifier_calibration", "llm_gold_pipeline", "record_linkage",
]


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
    targets = names or DEFAULT_TARGETS
    failures = []
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, out)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: SPARK CRASH: {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"SKIP {name} (rows-only: {len(srows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duck: {str(ex)[:200]}")
            continue
        sn, sc = _normalize(srows, scols)
        dn, dc = _normalize(drows, dcols)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: SCHEMA {sc} vs {dc}")
        elif len(sn) != len(dn):
            failures.append(name)
            print(f"FAIL {name}: ROWS {len(sn)} vs {len(dn)}")
        elif sn != dn:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:2]
            print(f"FAIL {name}: VALUES {diffs}")
        else:
            print(f"OK   {name} ({len(sn)} rows, {time.time()-t0:.1f}s)")
    shutil.rmtree(out, ignore_errors=True)
    print(f"\n{len(targets) - len(failures)}/{len(targets)} clean on constant corpus")
    if failures:
        print("failing:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
