"""Scale-slope regression gate: a cheap in-suite version of
tools/scale_slope.py. Each case runs one operator at 1x and 4x synthetic
input and asserts the SHUFFLE-WRITE growth stays in a linear band — a
quadratic candidate blowup would show ~16x and fail loudly. Wall time is
too noisy for a gate; shuffle bytes are deterministic (see SCALE.md).
"""

from __future__ import annotations

import importlib.util
import os

import pytest

# in-suite scale SWEEP (1x/4x slope gates): slow tier — the full-scale
# evidence lives in SCALE.md / tools/scale_slope.py runs
pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _harness():
    spec = importlib.util.spec_from_file_location(
        "scale_slope", os.path.join(_REPO, "tools", "scale_slope.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _shuffle_delta(spark, run):
    h = _harness()
    before = h.shuffle_write_bytes(spark)
    if before < 0:
        pytest.skip("Spark UI metrics endpoint unavailable in this session")
    run()
    after = h.shuffle_write_bytes(spark)
    return after - before


def _ratio(spark, build, scales=(1, 4)):
    deltas = []
    for s in scales:
        df = build(s)
        deltas.append(_shuffle_delta(spark, lambda: df.write.format("noop").mode("overwrite").save()))
    if deltas[0] <= 0:
        pytest.skip("no measurable shuffle at base scale")
    return deltas[1] / deltas[0]


def test_duplicate_spans_shuffle_grows_linearly(spark):
    from global_stock_data_warehouse_spark.operators.corpus import duplicate_spans

    h = _harness()

    def build(s):
        return duplicate_spans(h.gen_docs(spark, 2000 * s), n=4, min_docs=2)

    r = _ratio(spark, build)
    # 4x input: linear band with generous headroom; a quadratic pair
    # explosion would land ~16x
    assert 2.0 <= r <= 8.0, r


def test_wmy_pipeline_shuffle_grows_linearly(spark):
    from global_stock_data_warehouse_spark.plans.wmy import wmy_pipeline

    h = _harness()

    def build(s):
        gold, _ = wmy_pipeline(
            h.gen_bars(spark, 20_000 * s),
            time_col="date",
            key_col="symbol",
            freqs=("W", "M"),
            gap_since="2024-01-01",
            max_gap_days=14,
            tiebreak_cols=("ts", "event_id"),
        )
        return gold

    r = _ratio(spark, build)
    assert 2.0 <= r <= 8.0, r


def test_simhash_multi_index_shuffle_grows_linearly(spark):
    """The r5 multi-index Hamming path exists precisely to stay linear
    where the fixed chunk key space quadratizes — gate its shuffle
    growth in-suite (the full 1x..300x measurement lives in SCALE.md)."""
    from global_stock_data_warehouse_spark.operators.dedup import simhash_neardup

    h = _harness()

    def build(s):
        return simhash_neardup(
            h.gen_docs(spark, 2000 * s), max_hamming=3, strategy="multi_index"
        )

    r = _ratio(spark, build)
    assert 2.0 <= r <= 8.0, r
