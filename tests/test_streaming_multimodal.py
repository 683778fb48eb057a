"""Tests: streaming availableNow pipeline, upsert sink idempotency, and
multimodal feature-extraction plumbing with an injected fake decoder."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
)
from global_stock_data_warehouse_spark.operators.upsert import upsert_keyed
from global_stock_data_warehouse_spark.streaming.pipeline import (
    read_bar_stream,
    upsert_sink,
    windowed_ohlc,
)

BAR_SCHEMA = "ts timestamp, symbol string, close double"


def _write_bars(spark, path, rows, mode="overwrite"):
    spark.createDataFrame(rows, BAR_SCHEMA).coalesce(1).write.mode(mode).parquet(path)


def test_streaming_windowed_ohlc_available_now(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    import datetime as dt

    def run_once():
        stream = read_bar_stream(spark, src, BAR_SCHEMA)
        assert stream.isStreaming
        agg = windowed_ohlc(stream, window="7 days", watermark="0 seconds")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rows = [
        (dt.datetime(2024, 1, 1 + d, 12, 0), "A", 100.0 + d) for d in range(10)
    ]
    _write_bars(spark, src, rows)
    run_once()
    # In append mode a window only emits once the watermark passes its end.
    # Batch 1 sets the watermark to Jan 10; a second availableNow pass with a
    # later bar advances it and flushes the first (epoch-aligned) window
    # [Dec 28, Jan 4) deterministically.
    _write_bars(spark, src, [(dt.datetime(2024, 1, 30, 12, 0), "A", 200.0)], mode="append")
    run_once()
    got = {r.window_start.date().isoformat(): r for r in spark.read.parquet(out).collect()}
    w1 = got["2023-12-28"]  # holds Jan 1-3 bars
    assert w1.n_bars == 3
    assert (w1.open, w1.high, w1.low, w1.close) == (100.0, 102.0, 100.0, 102.0)


def test_streaming_upsert_sink_idempotent(spark, tmp_path):
    src = str(tmp_path / "src2")
    tgt = str(tmp_path / "tgt")
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1), "A", 1.0),
        (dt.datetime(2024, 1, 1), "A", 2.0),  # same key: last writer wins
        (dt.datetime(2024, 1, 2), "B", 3.0),
    ]
    _write_bars(spark, src, rows)
    stream = read_bar_stream(spark, src, BAR_SCHEMA)
    q = upsert_sink(stream, tgt, ("ts", "symbol"), str(tmp_path / "ck1")).start()
    q.awaitTermination(120)
    first = spark.read.parquet(tgt)
    assert first.count() == 2  # (Jan1,A) deduped, (Jan2,B)
    # re-run the same data through a NEW stream (replay) -> still 2 rows
    q2 = upsert_sink(read_bar_stream(spark, src, BAR_SCHEMA), tgt, ("ts", "symbol"), str(tmp_path / "ck2")).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(tgt).count() == 2


def test_upsert_keyed_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "upsert_tbl")
    df1 = spark.createDataFrame(
        [("2024-01-01", "A", 1.0, 1), ("2024-01-02", "B", 2.0, 1)],
        "date string, symbol string, close double, v int",
    )
    upsert_keyed(spark, df1, path, ("date", "symbol"), order_col="v")
    df2 = spark.createDataFrame(
        [("2024-01-01", "A", 9.0, 2), ("2024-01-03", "C", 3.0, 2)],
        "date string, symbol string, close double, v int",
    )
    upsert_keyed(spark, df2, path, ("date", "symbol"), order_col="v")
    got = {(r.date, r.symbol): r.close for r in spark.read.parquet(path).collect()}
    assert got == {
        ("2024-01-01", "A"): 9.0,  # updated
        ("2024-01-02", "B"): 2.0,  # untouched
        ("2024-01-03", "C"): 3.0,  # inserted
    }


def _media_df(spark):
    rows = [
        (1, "image", bytearray(b"\x01\x02\x03\x04"), '{"w": 2, "h": 2}'),
        (2, "audio", bytearray(b"\x05\x06"), '{"sr": 16000}'),
        (3, "video", bytearray(b"\x07" * 8), '{"n_frames": 25}'),
        (4, "image", None, "{}"),
    ]
    return spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, meta string"
    )


def test_multimodal_default_decoder_rejects_unknown_formats(spark):
    # fixture payloads are junk bytes (no PPM/WAV magic): the default
    # decoder must fail LOUDLY, never emit a silent zero feature
    with pytest.raises(Exception) as ei:
        extract_features(_media_df(spark)).collect()
    assert "undecodable" in str(ei.value) or "decode" in str(ei.value)


def test_multimodal_fake_decoder_plumbing(spark):
    def fake_decode(raw: bytes, mtype: str) -> np.ndarray:
        return np.frombuffer(raw, dtype=np.uint8).astype(np.float64)

    out = {r.media_id: r for r in extract_features(_media_df(spark), decode=fake_decode, feature_dim=4).collect()}
    assert out[1].n_bytes == 4 and len(out[1].feature) == 4
    assert out[1].feature == [1.0, 2.0, 3.0, 4.0]  # mean-pool of 4 bytes into 4 buckets
    assert out[4].n_bytes == 0 and out[4].feature == [0.0, 0.0, 0.0, 0.0]
    assert out[3].media_type == "video"


def test_frame_sample_plan(spark):
    got = frame_sample_plan(_media_df(spark), every_n=10).collect()
    assert [(r.media_id, r.frame_idx) for r in got] == [(3, 0), (3, 10), (3, 20)]


def test_streaming_session_window(spark, tmp_path):
    import datetime as dt
    from global_stock_data_warehouse_spark.streaming.pipeline import sessionized_activity

    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ck")
    base = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        # burst 1: 3 events within 10 min -> one session
        (base, "A", 1.0),
        (base + dt.timedelta(minutes=5), "A", 2.0),
        (base + dt.timedelta(minutes=10), "A", 3.0),
        # 2h quiet -> burst 2
        (base + dt.timedelta(hours=2), "A", 4.0),
        # late-watermark flusher event far in the future
        (base + dt.timedelta(days=1), "A", 9.0),
    ]
    _write_bars(spark, src, rows)
    stream = read_bar_stream(spark, src, BAR_SCHEMA)
    q = (
        sessionized_activity(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # second pass flushes whatever the advanced watermark closed
    _write_bars(spark, src, [(base + dt.timedelta(days=2), "A", 0.0)], mode="append")
    q2 = (
        sessionized_activity(read_bar_stream(spark, src, BAR_SCHEMA), gap="30 minutes", watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = {r.session_start.isoformat(): r for r in spark.read.parquet(out).collect()}
    s1 = got["2024-01-01T09:00:00"]
    assert s1.n_events == 3 and s1.sum_value == 6.0
    assert s1.session_end.isoformat() == "2024-01-01T09:40:00"  # last event + gap
    s2 = got["2024-01-01T11:00:00"]
    assert s2.n_events == 1 and s2.sum_value == 4.0


def test_streaming_semantic_decontaminate(spark, tmp_path):
    """semantic_decontaminate is a stateless map (broadcast eval matrix +
    mapInPandas, zero shuffle), so the SAME operator must run unchanged
    over a stream — decontaminating embeddings as they land, no
    watermark or state store needed. availableNow drain, parquet sink."""
    from pyspark.sql import functions as F

    from global_stock_data_warehouse_spark.operators.similarity import (
        semantic_decontaminate,
    )

    src = tmp_path / "vecs_in"
    out = str(tmp_path / "vecs_scored")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [3.0, 3.0]), (3, [0.0, -1.0])],
        "vec_id long, embedding array<float>",
    ).write.parquet(str(src))
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(str(src))
    q = (
        semantic_decontaminate(stream, ev, threshold=0.99)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.vec_id: r for r in spark.read.parquet(out).collect()}
    assert len(got) == 3
    assert got[1].contaminated and got[1].nearest_eval_id == 100
    assert not got[3].contaminated  # cos vs best eval is 0 or negative


def test_synth_media_fixture_roundtrip_closed_form(spark):
    """synth_media_fixture bytes must decode back to the closed-form
    pixel/sample sequences the DuckDB oracle predicts — the contract that
    makes multimodal_features driver-oracle-able."""
    from global_stock_data_warehouse_spark.operators.media_codecs import (
        decode_ppm,
        decode_wav,
    )
    from global_stock_data_warehouse_spark.operators.multimodal import (
        extract_features_typed,
        synth_media_fixture,
    )

    ids = spark.createDataFrame([(4,), (7,)], "doc_id long")
    rows = {r.media_id: r for r in synth_media_fixture(ids).collect()}

    # even id -> PPM whose pixels follow (id*31 + i*7) % 256
    img = decode_ppm(bytes(rows[4].payload))
    h, w = 8 + 4 % 5, 8 + 4 % 7
    assert img.shape == (h, w, 3)
    i = np.arange(h * w * 3, dtype=np.int64)
    assert np.array_equal(img.ravel(), ((4 * 31 + i * 7) % 256).astype(np.uint8))

    # odd id -> WAV whose samples follow (id*7 + i*13) % 4096 - 2048
    x = decode_wav(bytes(rows[7].payload))
    n = 256 + 7 % 64
    j = np.arange(n, dtype=np.int64)
    expect = ((7 * 7 + j * 13) % 4096 - 2048) / 32768.0
    assert x.size == n and np.array_equal(x, expect)

    # featurize end-to-end: image channel means equal the integer-exact
    # closed form; audio RMS equals the dyadic-exact closed form
    feats = {
        r.media_id: np.asarray(r.feature)
        for r in extract_features_typed(synth_media_fixture(ids)).collect()
    }
    v = ((4 * 31 + i * 7) % 256).astype(np.float64).reshape(h, w, 3)
    assert feats[4][0] == np.float32(v[:, :, 0].mean())
    s = (7 * 7 + j * 13) % 4096 - 2048
    rms = np.sqrt(((s / 32768.0) ** 2).mean())
    assert feats[7][0] == np.float32(rms)


def test_extract_features_never_mutates_session_conf(spark):
    """Regression: extract_features once set the session-wide Arrow
    maxRecordsPerBatch to its tiny media batch size and never restored
    it, silently making every LATER pandas-UDF query in the session ~5x
    slower (64-row Arrow batches). Memory bounding must happen inside
    the kernel (per-slice decode), never via shared session state."""
    from global_stock_data_warehouse_spark.operators.multimodal import (
        extract_features_typed,
        synth_media_fixture,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key)
    ids = spark.range(10).withColumnRenamed("id", "doc_id")
    out = extract_features_typed(synth_media_fixture(ids), target_rows_per_batch=3)
    assert out.count() == 10  # 3-row slices reassemble the full frame
    assert spark.conf.get(key) == before
