"""Classifier operators: token-vote (hash-exact) and NB self-log-lik are
checked against an independently-written pure-Python reference on a
hand-built corpus, plus separation, totality, and determinism cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.classify import (
    nb_self_loglik,
    token_vote_classify,
)

DOCS = [
    # two cleanly-separable classes + one doc of mixed vocabulary
    (0, "apple apple banana", "fruit"),
    (1, "apple banana banana apple", "fruit"),
    (2, "stone iron iron", "metal"),
    (3, "iron stone stone iron", "metal"),
    (4, "apple iron", "fruit"),  # mixed: one vote each way
]


def _ref_counts(docs, vocab_size):
    toks = [(d, lab, t) for d, txt, lab in docs for t in txt.lower().split()]
    freq: dict[str, int] = {}
    for _, _, t in toks:
        freq[t] = freq.get(t, 0) + 1
    vocab = set(
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    ctc: dict[tuple[str, str], int] = {}
    for _, lab, t in toks:
        if t in vocab:
            ctc[(t, lab)] = ctc.get((t, lab), 0) + 1
    return toks, vocab, ctc


def _ref_vote(docs, vocab_size):
    toks, vocab, ctc = _ref_counts(docs, vocab_size)
    classes = sorted({lab for (t, lab) in ctc})
    ct = {t: sum(c for (tt, _), c in ctc.items() if tt == t) for t in vocab}
    out = {}
    for d, txt, lab in docs:
        scores = {c: 0 for c in classes}
        n_scored = 0
        for t in txt.lower().split():
            if t not in vocab:
                continue
            n_scored += 1
            for c in classes:
                v = (ctc.get((t, c), 0) + 1) / (ct[t] + len(classes))
                scores[c] += math.floor(v * 1e12 + 0.5)
        if n_scored == 0:
            out[d] = (lab, None, None, 0)
        else:
            pred = min(classes, key=lambda c: (-scores[c], c))
            out[d] = (lab, pred, scores[pred], n_scored)
    return out


def test_token_vote_matches_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    got = {
        r["doc_id"]: (
            r["source"],
            r["pred_source"],
            r["score_fx"],
            r["n_scored"],
        )
        for r in token_vote_classify(df, vocab_size=10).collect()
    }
    assert got == _ref_vote(DOCS, 10)


def test_token_vote_separable_classes_all_correct(spark):
    df = spark.createDataFrame(DOCS[:4], ["doc_id", "text", "source"])
    rows = token_vote_classify(df, vocab_size=10).collect()
    assert all(r["is_correct"] for r in rows)


def test_token_vote_oov_doc_keeps_null_row(spark):
    docs = DOCS + [(5, "zzz qqq", "metal")]  # vocab_size=4 keeps top-4 only
    df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    rows = {r["doc_id"]: r for r in token_vote_classify(df, vocab_size=4).collect()}
    assert len(rows) == 6
    assert rows[5]["pred_source"] is None and rows[5]["n_scored"] == 0
    assert rows[5]["is_correct"] is None


def test_token_vote_deterministic_under_repartition(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    a = token_vote_classify(df, vocab_size=10).collect()
    b = token_vote_classify(df.repartition(7), vocab_size=10).collect()
    assert a == b


def test_nb_self_loglik_matches_reference(spark):
    V = 10
    toks, vocab, ctc = _ref_counts(DOCS, V)
    n_c = {}
    for (t, lab), c in ctc.items():
        n_c[lab] = n_c.get(lab, 0) + c
    n_docs = {}
    for _, _, lab in DOCS:
        n_docs[lab] = n_docs.get(lab, 0) + 1
    expect = {}
    for d, txt, lab in DOCS:
        ll = math.log(n_docs[lab] / len(DOCS))
        n_tok = 0
        for t in txt.lower().split():
            n_tok += 1
            c = ctc.get((t, lab), 0) if t in vocab else 0
            ll += math.log((c + 1) / (n_c.get(lab, 0) + V + 1))
        expect[d] = (lab, n_tok, round(ll, 4))
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["loglik"])
        for r in nb_self_loglik(df, vocab_size=V).collect()
    }
    assert set(got) == set(expect)
    for d in expect:
        lab_e, n_e, ll_e = expect[d]
        lab_g, n_g, ll_g = got[d]
        assert (lab_g, n_g) == (lab_e, n_e)
        assert ll_g == pytest.approx(ll_e, abs=2e-4)


def test_classifiers_total_on_empty_and_null_text(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert token_vote_classify(empty).collect() == []
    assert nb_self_loglik(empty).collect() == []
    nulls = spark.createDataFrame(
        [(0, None, "a"), (1, "x x", "a"), (2, "x y", "b")],
        "doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: r for r in token_vote_classify(nulls, vocab_size=4).collect()}
    assert len(rows) == 3 and rows[0]["n_scored"] == 0
    nb = {r["doc_id"]: r for r in nb_self_loglik(nulls, vocab_size=4).collect()}
    assert len(nb) == 3 and nb[0]["n_tokens"] == 0
    # empty-text doc's loglik is exactly its class prior
    assert nb[0]["loglik"] == pytest.approx(math.log(2 / 3), abs=2e-4)
