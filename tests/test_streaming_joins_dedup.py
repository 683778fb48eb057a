"""Streaming dedup (bounded state) and stream-stream interval join."""

from __future__ import annotations

import datetime as dt

from global_stock_data_warehouse_spark.streaming.pipeline import (
    dedup_stream,
    enrich_stream_stream,
    read_bar_stream,
)

BAR_SCHEMA = "ts timestamp, symbol string, close double"


def _write(spark, path, rows, schema=BAR_SCHEMA, mode="overwrite"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(path)


def _run(df, out, ckpt, mode="append"):
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedup_stream_drops_replayed_keys(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    t = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (t, "A", 100.0),
        (t, "A", 100.0),  # exact replay inside one batch
        (t + dt.timedelta(minutes=5), "B", 7.0),
    ]
    _write(spark, src, rows)
    stream = dedup_stream(
        read_bar_stream(spark, src, BAR_SCHEMA),
        key_cols=("ts", "symbol"),
        watermark="1 hour",
    )
    _run(stream, out, ckpt)
    got = spark.read.parquet(out).collect()
    assert sorted((r.symbol, r.close) for r in got) == [("A", 100.0), ("B", 7.0)]


def test_stream_stream_join_within_interval(spark, tmp_path):
    vsrc, csrc, out, ckpt = (
        str(tmp_path / p) for p in ("views", "clicks", "out", "ckpt")
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    _write(spark, vsrc, [(t0, "u1", 1.0), (t0, "u2", 2.0)])
    clicks = [
        (t0 + dt.timedelta(minutes=30), "u1", 10.0),  # inside 1h window
        (t0 + dt.timedelta(hours=2), "u2", 20.0),  # outside -> dropped
    ]
    _write(
        spark,
        csrc,
        clicks,
        schema="r_ts timestamp, symbol string, value double",
    )
    views = read_bar_stream(spark, vsrc, BAR_SCHEMA)
    cstream = read_bar_stream(
        spark, csrc, "r_ts timestamp, symbol string, value double"
    )
    joined = enrich_stream_stream(
        views, cstream, on="symbol", left_ts="ts", right_ts="r_ts", within="1 hour"
    )
    _run(joined, out, ckpt)
    got = spark.read.parquet(out).collect()
    assert [(r.symbol, r.close, r.value) for r in got] == [("u1", 1.0, 10.0)]
