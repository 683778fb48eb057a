"""Streaming stale-feed monitor: flat-quote streaks across micro-
batches, ledger replay safety."""

from __future__ import annotations

import datetime as dt

import pytest

from global_stock_data_warehouse_spark.streaming.pipeline import (
    read_bar_stream,
    stale_feed_sink,
)

SCHEMA = "symbol long, ts timestamp, close double"


def _write_file(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _drain(spark, src, state, alerts, ckpt, min_flat=3):
    stream = read_bar_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    q = stale_feed_sink(
        stream, state, alerts, ckpt, grid=1.0, min_flat_batches=min_flat
    ).start()
    q.awaitTermination(180)


def _alerts(spark, path):
    try:
        return {
            (r.sym, r._batch_id): r.streak
            for r in spark.read.parquet(path).collect()
        }
    except Exception:
        return {}


def test_flat_feed_alerts_after_k_batches(spark, tmp_path):
    src, state, alerts, ckpt = (
        str(tmp_path / p) for p in ("src", "st", "al", "ck")
    )
    t = dt.datetime(2024, 1, 1, 9, 0)
    # symbol 1 frozen at 50.0 for 3 batches; symbol 2 moves every batch
    for b in range(3):
        _write_file(
            spark,
            src,
            [
                (1, t + dt.timedelta(minutes=b), 50.0),
                (2, t + dt.timedelta(minutes=b), 50.0 + 10 * b),
            ],
        )
    _drain(spark, src, state, alerts, ckpt, min_flat=3)
    got = _alerts(spark, alerts)
    # only symbol 1, only at batch 2 (streak reaches 3)
    assert got == {(1, 2): 3}


def test_moving_feed_never_alerts(spark, tmp_path):
    src, state, alerts, ckpt = (
        str(tmp_path / p) for p in ("src", "st", "al", "ck")
    )
    t = dt.datetime(2024, 1, 1, 9, 0)
    for b in range(4):
        _write_file(spark, src, [(1, t + dt.timedelta(minutes=b), 10.0 * (b + 1))])
    _drain(spark, src, state, alerts, ckpt, min_flat=2)
    assert _alerts(spark, alerts) == {}


def test_level_change_restarts_streak(spark, tmp_path):
    src, state, alerts, ckpt = (
        str(tmp_path / p) for p in ("src", "st", "al", "ck")
    )
    t = dt.datetime(2024, 1, 1, 9, 0)
    # flat at 50 for 2 batches, then flat at 80 for 2 batches: neither
    # run reaches 3 — a new level must RESTART, not continue, the streak
    for b, px in enumerate([50.0, 50.0, 80.0, 80.0]):
        _write_file(spark, src, [(1, t + dt.timedelta(minutes=b), px)])
    _drain(spark, src, state, alerts, ckpt, min_flat=3)
    assert _alerts(spark, alerts) == {}


def test_replay_is_idempotent(spark, tmp_path):
    src, state, alerts, ckpt1, ckpt2 = (
        str(tmp_path / p) for p in ("src", "st", "al", "ck1", "ck2")
    )
    t = dt.datetime(2024, 1, 1, 9, 0)
    for b in range(3):
        _write_file(spark, src, [(1, t + dt.timedelta(minutes=b), 50.0)])
    _drain(spark, src, state, alerts, ckpt1, min_flat=2)
    first = _alerts(spark, alerts)
    assert first  # streaks 2 and 3 alerted
    # fresh checkpoint = full replay; dynamic overwrite must rewrite the
    # same per-batch partitions, leaving alerts identical
    _drain(spark, src, state, alerts, ckpt2, min_flat=2)
    assert _alerts(spark, alerts) == first


def test_dead_feed_alerts_via_absence(spark, tmp_path):
    src, state, alerts, ckpt = (
        str(tmp_path / p) for p in ("src", "st", "al", "ck")
    )
    t = dt.datetime(2024, 1, 1, 9, 0)
    # symbol 1 sends flat 50.0 in batches 0-1, then STOPS ENTIRELY;
    # symbol 2 keeps the later batches non-empty. Absence must continue
    # the streak (a fully dead vendor feed), so streak hits 3 at batch 2
    # and keeps climbing at batch 3.
    _write_file(spark, src, [(1, t, 50.0), (2, t, 10.0)])
    _write_file(
        spark,
        src,
        [(1, t + dt.timedelta(minutes=1), 50.0), (2, t + dt.timedelta(minutes=1), 20.0)],
    )
    _write_file(spark, src, [(2, t + dt.timedelta(minutes=2), 30.0)])
    _write_file(spark, src, [(2, t + dt.timedelta(minutes=3), 40.0)])
    _drain(spark, src, state, alerts, ckpt, min_flat=3)
    got = _alerts(spark, alerts)
    assert got == {(1, 2): 3, (1, 3): 4}


def test_absent_state_expires_after_cap(spark, tmp_path):
    src, state, alerts, ckpt = (
        str(tmp_path / p) for p in ("src", "st", "al", "ck")
    )
    t = dt.datetime(2024, 1, 1, 9, 0)
    # symbol 1 flat at 50.0 in batches 0-1 then vanishes; symbol 2 keeps
    # batches 2-5 non-empty. With max_absent_batches=2 the carried state
    # writes absent=1 (batch 2) and absent=2 (batch 3), then EXPIRES:
    # batches 4-5 write no state row and no alert for symbol 1 — ledger
    # growth and alert noise are bounded (r10 ADVICE).
    _write_file(spark, src, [(1, t, 50.0), (2, t, 10.0)])
    _write_file(
        spark,
        src,
        [(1, t + dt.timedelta(minutes=1), 50.0), (2, t + dt.timedelta(minutes=1), 20.0)],
    )
    for b in range(2, 6):
        _write_file(spark, src, [(2, t + dt.timedelta(minutes=b), 10.0 * (b + 1))])
    stream = read_bar_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    q = stale_feed_sink(
        stream, state, alerts, ckpt, grid=1.0, min_flat_batches=3,
        max_absent_batches=2,
    ).start()
    q.awaitTermination(180)
    # alerts: streak hits 3 at batch 2 (absent=1) and 4 at batch 3
    # (absent=2), then silence — no batch-4/5 pages for the dead symbol
    assert _alerts(spark, alerts) == {(1, 2): 3, (1, 3): 4}
    # state ledger: symbol 1 has rows only through batch 3
    st = spark.read.parquet(state)
    sym1_batches = sorted(r._batch_id for r in st.filter("sym = 1").collect())
    assert sym1_batches == [0, 1, 2, 3]


@pytest.mark.slow  # 10+ min soak; default tier keeps the per-scenario
# ledger/expiry tests above, and the soak ran green in the r13 full-tier
# run (OPTIMIZATION_r13.md "Test-suite wall time")
def test_soak_churn_universe_ledger_stays_bounded(spark, tmp_path):
    """Soak (VERDICT r11 item 8): 100 micro-batches over a CHURNING
    symbol universe — 18 symbols, each live for a 15-batch window
    staggered by 5, then gone forever. Every symbol is FLAT (worst
    case: every live batch extends a streak, every dead batch would
    page forever without expiry). With max_absent_batches=5 the
    ledger must stay bounded by construction:

      per symbol: state rows == live_span + cap (15 + 5 = 20),
      alerts    == (live_span + cap) - min_flat + 1 (18),
      and NOTHING more than cap batches after the symbol's death —
    i.e. total cardinality is symbols x (span + cap), not
    batches x all-time universe (the unbounded-ledger failure mode
    the r10 expiry fix closed)."""
    src, state, alerts, ckpt = (
        str(tmp_path / p) for p in ("src", "st", "al", "ck")
    )
    t = dt.datetime(2024, 1, 1, 9, 0)
    n_sym, span, stagger, cap, min_flat = 18, 15, 5, 5, 3
    n_batches = (n_sym - 1) * stagger + span  # == 100, coverage gapless
    assert n_batches == 100
    for b in range(n_batches):
        rows = [
            (s, t + dt.timedelta(minutes=b), 100.0 * (s + 1))
            for s in range(n_sym)
            if s * stagger <= b < s * stagger + span
        ]
        _write_file(spark, src, rows)
    stream = read_bar_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    q = stale_feed_sink(
        stream, state, alerts, ckpt, grid=1.0, min_flat_batches=min_flat,
        max_absent_batches=cap,
    ).start()
    q.awaitTermination(900)

    st = spark.read.parquet(state).collect()
    al = spark.read.parquet(alerts).collect()
    state_per_sym = {}
    last_state_batch = {}
    for r in st:
        state_per_sym[r.sym] = state_per_sym.get(r.sym, 0) + 1
        last_state_batch[r.sym] = max(last_state_batch.get(r.sym, -1), r._batch_id)
    alerts_per_sym = {}
    for r in al:
        alerts_per_sym[r.sym] = alerts_per_sym.get(r.sym, 0) + 1
    for s in range(n_sym):
        death = s * stagger + span  # first absent batch
        trailing = min(cap, n_batches - death)  # last symbol: 0
        assert state_per_sym[s] == span + trailing, s
        assert alerts_per_sym[s] == span + trailing - min_flat + 1, s
        # nothing later than cap batches after death — dead symbols
        # go SILENT, they don't ride the ledger to batch 99
        assert last_state_batch[s] == death + trailing - 1, s
    assert len(st) == sum(state_per_sym.values()) == (n_sym - 1) * (span + cap) + span


def test_reappearing_symbol_starts_fresh_after_expiry(spark, tmp_path):
    src, state, alerts, ckpt = (
        str(tmp_path / p) for p in ("src", "st", "al", "ck")
    )
    t = dt.datetime(2024, 1, 1, 9, 0)
    # symbol 1 flat at 50.0 in batch 0, absent batches 1-3: absence
    # carries the streak to 3 (absent=2) at batch 2, then expiry drops
    # the batch-3 row. Reappearing flat at 50.0 in batch 4, the
    # pre-expiry streak must NOT resume — fresh state restarts the
    # streak at 1, so min_flat_batches=4 never alerts (a resumed
    # streak would have hit 4 here).
    _write_file(spark, src, [(1, t, 50.0), (2, t, 10.0)])
    for b in range(1, 4):
        _write_file(spark, src, [(2, t + dt.timedelta(minutes=b), 10.0 * (b + 1))])
    _write_file(
        spark,
        src,
        [(1, t + dt.timedelta(minutes=4), 50.0), (2, t + dt.timedelta(minutes=4), 60.0)],
    )
    stream = read_bar_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    q = stale_feed_sink(
        stream, state, alerts, ckpt, grid=1.0, min_flat_batches=4,
        max_absent_batches=2,
    ).start()
    q.awaitTermination(180)
    assert _alerts(spark, alerts) == {}
    st = spark.read.parquet(state)
    # expiry dropped the batch-3 row entirely
    assert st.filter("sym = 1 and _batch_id = 3").count() == 0
    row = st.filter("sym = 1 and _batch_id = 4").collect()
    assert len(row) == 1 and row[0].streak == 1 and row[0].absent == 0
