"""Streaming market-breadth ledger: windowed OHLC -> per-window
contribution partitions -> associative read-time fold; replay must not
double-count.

Append-mode emission mechanics: a window emits only once the watermark
passes its end, and the watermark advances BETWEEN batches — so each
test writes its bars as file 1, a far-future sentinel bar as file 2,
and drains with maxFilesPerTrigger=1 (file = batch): batch 0 sets the
watermark, batch 1 flushes the closed windows. The sentinel's own
window never closes and never reaches the ledger."""

from __future__ import annotations

import datetime as dt

from global_stock_data_warehouse_spark.streaming.pipeline import (
    breadth_sink,
    read_bar_stream,
    read_breadth,
    windowed_ohlc,
)

SCHEMA = "symbol long, ts timestamp, close double"
SENTINEL = [(999, dt.datetime(2024, 6, 1, 12, 0), 1.0)]


def _write_file(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _drain(spark, src, breadth, ckpt):
    stream = read_bar_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    ohlc = windowed_ohlc(
        stream, window="1 day", watermark="0 seconds", key_cols=("symbol",)
    )
    q = breadth_sink(ohlc, breadth, ckpt).start()
    q.awaitTermination(180)


def test_breadth_counts_and_weighted_return(spark, tmp_path):
    src, breadth, ckpt = (str(tmp_path / p) for p in ("src", "b", "ckpt"))
    t = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        # symbol 1: open 100 -> close 110 (+10%, weight 100)
        (1, t, 100.0),
        (1, t + dt.timedelta(hours=2), 110.0),
        # symbol 2: open 300 -> close 270 (-10%, weight 300)
        (2, t, 300.0),
        (2, t + dt.timedelta(hours=3), 270.0),
        # symbol 3: flat (weight 50)
        (3, t, 50.0),
    ]
    _write_file(spark, src, rows)
    _write_file(spark, src, SENTINEL)
    _drain(spark, src, breadth, ckpt)

    out = read_breadth(spark, breadth).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_members == 3
    assert r.n_advancers == 1
    assert r.n_decliners == 1
    # (100*0.1 + 300*-0.1 + 50*0) / 450 = -0.0444444...
    assert abs(r.index_return - (-20.0 / 450.0)) < 2e-6


def test_breadth_replay_is_idempotent(spark, tmp_path):
    """A FRESH checkpoint replays both batches; dynamic partition
    overwrite must rewrite the same _batch_id partition, not append a
    duplicate contribution."""
    src, breadth, ckpt1, ckpt2 = (
        str(tmp_path / p) for p in ("src", "b", "ckpt1", "ckpt2")
    )
    t = dt.datetime(2024, 1, 1, 9, 0)
    _write_file(
        spark,
        src,
        [(1, t, 100.0), (1, t + dt.timedelta(hours=1), 110.0), (2, t, 200.0)],
    )
    _write_file(spark, src, SENTINEL)
    _drain(spark, src, breadth, ckpt1)
    first = {
        (r.window_start, r.window_end): r
        for r in read_breadth(spark, breadth).collect()
    }
    assert first  # the day window did flush
    # fresh checkpoint = full replay of both batches
    _drain(spark, src, breadth, ckpt2)
    second = {
        (r.window_start, r.window_end): r
        for r in read_breadth(spark, breadth).collect()
    }
    assert set(first) == set(second)
    for k in first:
        assert first[k].n_members == second[k].n_members
        assert first[k].index_return == second[k].index_return


def test_breadth_multi_day_windows(spark, tmp_path):
    src, breadth, ckpt = (str(tmp_path / p) for p in ("src", "b", "ckpt"))
    t1 = dt.datetime(2024, 1, 1, 9, 0)
    t2 = dt.datetime(2024, 1, 2, 9, 0)
    rows = [
        (1, t1, 100.0),
        (1, t1 + dt.timedelta(hours=1), 120.0),
        (1, t2, 120.0),
        (1, t2 + dt.timedelta(hours=1), 90.0),
    ]
    _write_file(spark, src, rows)
    _write_file(spark, src, SENTINEL)
    _drain(spark, src, breadth, ckpt)
    out = {r.window_start.date(): r for r in read_breadth(spark, breadth).collect()}
    assert len(out) == 2
    assert out[dt.date(2024, 1, 1)].n_advancers == 1
    assert out[dt.date(2024, 1, 2)].n_decliners == 1
