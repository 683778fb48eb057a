"""Hash-exact fixed-point twins of the EPS-only float diagnostics (r6).

Each twin must (a) agree with its float original up to the cents/grid
quantization it introduces, and (b) satisfy the algebraic identities that
make it a faithful stand-in (chi2 >= KL; probabilities in (0, 1]; corr in
[-1, 1]). Bit-exactness vs DuckDB is carried by tools/check_correctness.py
(CHECK_EXACT=1) — these tests pin the SEMANTICS.
"""

import datetime as dt
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.corpus import (
    source_chi2_drift,
    source_kl_divergence,
    unigram_logprob,
    unigram_prob_score,
)
from global_stock_data_warehouse_spark.operators.timeseries import (
    autocorrelation_fx,
    daily_close,
    rolling_beta_fx,
)


def _bars(spark, series):
    """series: {user: [v0, v1, ...]} one bar per consecutive day."""
    rows = [
        (u, 100 * u + i, dt.datetime(2024, 1, 1 + i, 12, 0), float(v))
        for u, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def _docs(spark, texts):
    rows = [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_autocorrelation_fx_matches_numpy(spark):
    vals = [100 + 5 * math.sin(i / 2.0) + (i % 3) for i in range(25)]
    out = autocorrelation_fx(daily_close(_bars(spark, {1: vals}))).collect()
    assert len(out) == 1 and out[0].n_days == 25
    cents = np.array([math.floor(v * 100 + 0.5) for v in vals], dtype=np.float64)
    for k in (1, 2, 3, 5):
        expect = np.corrcoef(cents[k:], cents[:-k])[0, 1]
        got = getattr(out[0], f"acf{k}")
        assert got is not None and abs(got - expect) < 1e-6, (k, got, expect)
        assert -1.0 <= got <= 1.0


def test_autocorrelation_fx_constant_series_null(spark):
    out = autocorrelation_fx(daily_close(_bars(spark, {1: [50.0] * 10}))).collect()
    assert out[0].acf1 is None  # zero variance -> undefined, not NaN/crash


def test_rolling_beta_fx_two_entity_algebra(spark):
    # entity 2 = exactly 3x entity 1 -> index m = 4x entity 1's cents;
    # beta(entity1) = cov(x, 4x)/var(4x) = 1/4, corr = 1, at every row
    vals = [100 + 7 * math.sin(i / 1.5) + i * 0.3 for i in range(15)]
    df = _bars(spark, {1: vals, 2: [3 * v for v in vals]})
    rows = rolling_beta_fx(df, window=10, min_obs=5).collect()
    assert rows, "expected windows with >= 5 obs"
    for r in rows:
        if r.user_id == 1:
            assert abs(r.beta - 0.25) < 2e-4, r  # cents quantization only
            assert abs(r.corr_vm - 1.0) < 2e-4, r


def test_rolling_beta_fx_close_to_float_original_shape(spark):
    # same window bounds/filters as q_rolling_beta: n_obs floor respected
    df = _bars(spark, {1: [100 + i for i in range(8)], 2: [200 - i for i in range(8)]})
    rows = rolling_beta_fx(df, window=20, min_obs=5).collect()
    assert {r.user_id for r in rows} == {1, 2}
    assert all(r.n_obs >= 5 for r in rows)


def test_source_chi2_upper_bounds_kl(spark):
    texts = [
        "alpha beta gamma delta epsilon",
        "alpha alpha beta zeta eta theta",
        "gamma gamma gamma iota kappa",
        "alpha beta beta beta mu nu xi",
    ]
    docs = _docs(spark, texts)
    chi2 = {r.source: r.chi2 for r in source_chi2_drift(docs).collect()}
    kl = {r.source: r.kl_nats for r in source_kl_divergence(docs).collect()}
    assert set(chi2) == set(kl) == {"s0", "s1"}
    for s in chi2:
        # Pearson chi^2 >= KL (both in nats); 1e-3 slack for the two grids
        assert chi2[s] >= kl[s] - 1e-3, (s, chi2[s], kl[s])
        assert chi2[s] >= 0


def test_source_chi2_identical_distribution_is_zero(spark):
    # both sources emit the same bag -> p == q -> chi2 == 0 exactly
    docs = _docs(spark, ["a b c", "a b c"])
    for r in source_chi2_drift(docs).collect():
        assert r.chi2 == 0.0, r


def test_unigram_prob_score_matches_hand_model(spark):
    texts = ["a a b", "b c"]
    out = {r.doc_id: r for r in unigram_prob_score(_docs(spark, texts), vocab_size=2).collect()}
    # corpus: a->2, b->2, c->1; vocab top-2 (count desc, tok asc) = {a, b};
    # N=5, denom = 5 + 3 = 8; p(a)=3/8, p(b)=3/8, p(c)=OOV=1/8
    g = 1e-12  # quantization grid
    doc0 = (2 * math.floor(3 / 8 * 1e12 + 0.5) + math.floor(3 / 8 * 1e12 + 0.5)) / 3
    assert abs(out[0].mean_prob - doc0 * g) < 2e-9
    assert out[0].n_tokens == 3 and out[1].n_tokens == 2
    doc1 = (math.floor(3 / 8 * 1e12 + 0.5) + math.floor(1 / 8 * 1e12 + 0.5)) / 2
    assert abs(out[1].mean_prob - doc1 * g) < 2e-9


def test_unigram_prob_score_ranks_like_logprob(spark):
    # typical text scores above rare-token text under BOTH formulations
    texts = [
        "the cat sat on the mat",
        "the dog ran to the cat",
        "zyx qwv jkl pqr",  # all-OOV junk
        "the the the the",
    ]
    docs = _docs(spark, texts)
    prob = {r.doc_id: r.mean_prob for r in unigram_prob_score(docs, vocab_size=4).collect()}
    logp = {r.doc_id: r.avg_logprob for r in unigram_logprob(docs, vocab_size=4).collect()}
    # junk doc is the minimum under both scores
    assert min(prob, key=prob.get) == 2
    assert min(logp, key=logp.get) == 2
    for v in prob.values():
        assert 0.0 < v <= 1.0
