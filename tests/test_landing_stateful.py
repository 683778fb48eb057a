"""Tests: JSON landing scan with quarantine, header detection, and the
stateful streaming gap detector (state must survive micro-batches)."""

from __future__ import annotations

import datetime as dt

import pytest

from global_stock_data_warehouse_spark.sources.landing import (
    detect_header_rows,
    grid_to_records,
    scan_json,
)
from global_stock_data_warehouse_spark.streaming.stateful import detect_gaps_stateful


def test_scan_json_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "landing.jsonl"
    p.write_text(
        '{"symbol": "AAPL", "name": "Apple", "px": 1.5}\n'
        '{"symbol": "MSFT", "name": "Microsoft", "px": 2.5}\n'
        "this is not json at all\n"
    )
    clean, dead = scan_json(spark, str(p), "symbol string, name string, px double")
    rows = {r.symbol: r.px for r in clean.collect()}
    assert rows == {"AAPL": 1.5, "MSFT": 2.5}
    dead_rows = dead.collect()
    assert len(dead_rows) == 1 and "not json" in dead_rows[0]._corrupt_record


def test_detect_header_rows_hkex_shape():
    grid = [
        ["List of Securities", "", ""],
        ["updated: 2024-01-01", "", ""],
        ["Stock Code", "Short\xa0Name", "Category"],
        ["00001", "CKH HOLDINGS", "Equity"],
        ["00002", "CLP HOLDINGS", "Equity"],
    ]
    assert detect_header_rows(grid, ["stock code", "short name"]) == 2
    cols, rows = grid_to_records(grid, ["stock code", "short name"])
    assert cols == ["Stock Code", "Short Name", "Category"]
    assert rows[0][0] == "00001" and len(rows) == 2


def test_detect_header_rows_missing_raises():
    with pytest.raises(ValueError, match="no header row"):
        detect_header_rows([["a", "b"]], ["stock code"])


def test_stateful_gap_detection_across_batches(spark, tmp_path):
    src = str(tmp_path / "bars")
    out = str(tmp_path / "gaps")
    ckpt = str(tmp_path / "ck")

    def write_bars(rows, mode):
        spark.createDataFrame(rows, "symbol string, d date").coalesce(1).write.mode(
            mode
        ).parquet(src)

    def run_once():
        stream = spark.readStream.schema("symbol string, d date").parquet(src)
        gaps = detect_gaps_stateful(stream, max_gap_days=14)

        def sink(batch, _id):
            if not batch.isEmpty():
                batch.write.mode("append").parquet(out)

        q = (
            gaps.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: contiguous-ish series, one 20-day in-batch gap for B
    write_bars(
        [
            ("A", dt.date(2024, 1, 1)),
            ("A", dt.date(2024, 1, 8)),
            ("B", dt.date(2024, 1, 1)),
            ("B", dt.date(2024, 1, 21)),
        ],
        "overwrite",
    )
    run_once()
    # batch 2: A returns 30 days later -> CROSS-BATCH gap needs kept state
    write_bars([("A", dt.date(2024, 2, 7))], "append")
    run_once()

    got = {(r.symbol, r.gap_days) for r in spark.read.parquet(out).collect()}
    assert got == {("B", 20), ("A", 30)}
