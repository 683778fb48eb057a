"""Incremental (cross-run) dedup against a fingerprint store, and DSIR
importance resampling (Xie et al., NeurIPS 2023): semantics on hand-built
frames, a from-scratch numpy/hashlib reference for the DSIR weight, twin
monotonicity, deterministic Gumbel resampling, and plan-shape gates."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.corpus import dsir_weights
from global_stock_data_warehouse_spark.operators.dedup import (
    fingerprint_store,
    incremental_dedup,
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# incremental dedup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def _inc(spark):
    store_docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, "ALPHA   beta"),  # store dup (normalization collapses case/ws)
            (11, "epsilon zeta"),  # fresh, but duplicated in-batch by 12
            (12, "epsilon zeta"),
            (13, "eta theta"),  # fresh and unique
        ],
        ["doc_id", "text"],
    )
    store = fingerprint_store(store_docs)
    return {r["doc_id"]: r for r in incremental_dedup(batch, store).collect()}


def test_incremental_dedup_is_total_and_routes_correctly(_inc):
    assert set(_inc) == {10, 11, 12, 13}  # every batch doc gets a verdict
    assert _inc[10].dup_of_store and not _inc[10].keep
    assert not _inc[11].dup_of_store and not _inc[11].dup_in_batch and _inc[11].keep
    assert _inc[12].dup_in_batch and not _inc[12].keep  # 11 is the min-id winner
    assert _inc[13].keep and not _inc[13].dup_of_store and not _inc[13].dup_in_batch


def test_incremental_dedup_store_dup_can_also_be_batch_dup(_inc):
    # 10 is alone in its batch group: store-dup yes, batch-dup no
    assert _inc[10].dup_of_store and not _inc[10].dup_in_batch


def test_fingerprint_store_counts_multiplicity(spark):
    df = spark.createDataFrame(
        [(5, "x y"), (7, "x  Y"), (9, "z")], ["doc_id", "text"]
    )
    rows = {r.first_id: r.n_seen for r in fingerprint_store(df).collect()}
    assert rows == {5: 2, 9: 1}


def test_incremental_dedup_batch_shuffles_once(spark):
    """The in-batch window's fp hash-partitioning must be reused by the
    store-probe join: the batch side crosses the wire exactly once."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), (F.col("id") % 50).cast("string")).alias("text"),
    )
    out = incremental_dedup(docs, fingerprint_store(docs.limit(50)))
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    # one exchange for the window + one for the store side; the join's
    # batch side must NOT re-exchange (ReusedExchange or direct reuse)
    n_exchange = len(re.findall(r"\bExchange hashpartitioning", plan))
    assert n_exchange <= 3, plan


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


_B = 64  # tiny bucket space so the reference model is easy to audit


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % _B


def _grams(text: str) -> list[str]:
    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_weights(raw: dict[int, str], target: dict[int, str]) -> dict[int, float]:
    """From-scratch DSIR log importance weights (hashed uni+bigram bag,
    add-one smoothing) — independent of every Spark code path."""
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for text in target.values():
        for g in _grams(text):
            b = _bucket(g)
            ct[b] = ct.get(b, 0) + 1
    for text in raw.values():
        for g in _grams(text):
            b = _bucket(g)
            cr[b] = cr.get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    out = {}
    for did, text in raw.items():
        w = 0.0
        for g in _grams(text):
            b = _bucket(g)
            w += math.log((ct.get(b, 0) + 1) / (nt + _B))
            w -= math.log((cr.get(b, 0) + 1) / (nr + _B))
        out[did] = w
    return out


@pytest.fixture(scope="module")
def _dsir(spark):
    target = {
        100: "the cat sat on the mat",
        101: "the dog sat on the rug",
        102: "a cat and a dog sat together",
    }
    raw = {
        1: "the cat sat on the mat today",  # near-verbatim target text
        2: "the dog sat on a mat",  # target-like
        3: "stocks rallied as yields fell sharply",  # off-target
        4: "quarterly earnings beat analyst estimates",  # off-target
        5: "",  # empty doc: weight 0 by contract
    }
    tdf = spark.createDataFrame(list(target.items()), ["doc_id", "text"])
    rdf = spark.createDataFrame(list(raw.items()), ["doc_id", "text"])
    got = {
        r.doc_id: r
        for r in dsir_weights(rdf, tdf, n_buckets=_B).collect()
    }
    return got, _ref_weights(raw, target)


def test_dsir_logw_matches_numpy_reference(_dsir):
    got, ref = _dsir
    for did, expected in ref.items():
        assert got[did].logw == pytest.approx(expected, abs=1e-5), did


def test_dsir_target_like_docs_outrank_off_target(_dsir):
    got, _ = _dsir
    assert min(got[1].logw, got[2].logw) > max(got[3].logw, got[4].logw)
    assert min(got[1].score_fx, got[2].score_fx) > max(
        got[3].score_fx, got[4].score_fx
    )


def test_dsir_fx_twin_argsort_agrees_with_logw(_dsir):
    got, _ = _dsir
    docs = [d for d in got if got[d].n_grams > 0]
    by_logw = sorted(docs, key=lambda d: (-got[d].logw, d))
    by_fx = sorted(docs, key=lambda d: (-got[d].score_fx, d))
    assert by_logw == by_fx


def test_dsir_empty_doc_total_function(_dsir):
    got, _ = _dsir
    assert got[5].logw == 0.0 and got[5].score_fx == 0 and got[5].n_grams == 0


def test_dsir_gumbel_resample_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"token{i} filler text common words") for i in range(40)],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame([(99, "common words")], ["doc_id", "text"])
    a = dsir_weights(docs, target, n_buckets=_B, sample_k=10, seed=7)
    b = dsir_weights(docs, target, n_buckets=_B, sample_k=10, seed=7)
    ra, rb = a.collect(), b.collect()
    assert len(ra) == 10 and [r.doc_id for r in ra] == [r.doc_id for r in rb]
    c = dsir_weights(docs, target, n_buckets=_B, sample_k=10, seed=8).collect()
    assert {r.doc_id for r in c} != {r.doc_id for r in ra} or [
        r.doc_id for r in c
    ] != [r.doc_id for r in ra]


def test_dsir_plan_broadcasts_model_no_python(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 9).cast("string"), F.lit(" common")).alias(
            "text"
        ),
    )
    out = dsir_weights(docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1"))
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# incremental MinHash near-dup (store/probe)
# ---------------------------------------------------------------------------

from global_stock_data_warehouse_spark.operators.dedup import (  # noqa: E402
    incremental_minhash_dedup,
    minhash_neardup,
    minhash_store,
)


def _texts(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk_text(seed, n=30, mutate=0):
    # seed-namespaced words: disjoint vocabularies across seeds
    words = [f"w{seed}_{i}" for i in range(n)]
    for j in range(mutate):
        words[j] = f"mut{seed}_{j}"
    return " ".join(words)


def test_incremental_minhash_store_and_batch_verdicts(spark):
    corpus = _texts(spark, [(i, _mk_text(i)) for i in range(20)])
    store = minhash_store(corpus).localCheckpoint(eager=True)
    batch = _texts(
        spark,
        [
            # 100: near-dup of store doc 3 (2 of 30 words mutated)
            (100, _mk_text(3, mutate=2)),
            # 101/102: near-dups of each other, novel vs store
            (101, _mk_text(777)),
            (102, _mk_text(777, mutate=2)),
            # 103: novel
            (103, _mk_text(888)),
            # 104: zero shingles
            (104, ""),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in incremental_minhash_dedup(batch, store, threshold=0.5).collect()
    }
    assert len(out) == 5, "verdict must be total over the batch"
    assert out[100]["dup_of_store"] and out[100]["store_match_id"] == 3
    assert not out[100]["keep"]
    assert out[101]["keep"] and not out[101]["dup_of_store"]
    # greedy smaller-id policy: 102 dups 101, 101 is kept
    assert out[102]["dup_in_batch"] and out[102]["batch_match_id"] == 101
    assert not out[102]["keep"]
    assert out[103]["keep"]
    assert out[104]["keep"] and not out[104]["dup_of_store"]


def test_incremental_minhash_empty_store_matches_batch_pairs(spark):
    """With an empty store, the keep set must equal the greedy
    smaller-id reduction of minhash_neardup's pair list (same params)."""
    batch = _texts(
        spark,
        [(i, _mk_text(i // 3, mutate=i % 3)) for i in range(30)],
    )
    empty = minhash_store(batch.limit(0))
    out = incremental_minhash_dedup(batch, empty, threshold=0.5).collect()
    pairs = minhash_neardup(batch, threshold=0.5).collect()
    has_smaller = {p["id_b"] for p in pairs}
    for r in out:
        assert r["dup_in_batch"] == (r["doc_id"] in has_smaller)
        assert r["keep"] == (r["doc_id"] not in has_smaller)
        assert not r["dup_of_store"]


def test_incremental_minhash_repartition_deterministic(spark):
    corpus = _texts(spark, [(i, _mk_text(i)) for i in range(15)])
    batch = _texts(spark, [(100 + i, _mk_text(i, mutate=1)) for i in range(10)])
    a = sorted(
        map(tuple, incremental_minhash_dedup(batch, minhash_store(corpus)).collect())
    )
    b = sorted(
        map(
            tuple,
            incremental_minhash_dedup(
                batch.repartition(7), minhash_store(corpus.repartition(5))
            ).collect(),
        )
    )
    assert a == b


def test_incremental_minhash_rejects_mismatched_store_params(spark):
    """A ledger built with num_hashes=16 probed at num_hashes=32 must
    raise instead of silently null-padding signatures through zip_with
    and deflating every jaccard estimate (r6 ADVICE)."""
    import pytest

    corpus = _texts(spark, [(i, _mk_text(i)) for i in range(5)])
    store16 = minhash_store(corpus, num_hashes=16, bands=8)
    batch = _texts(spark, [(100, _mk_text(0, mutate=1))])
    with pytest.raises(ValueError, match="signature length"):
        incremental_minhash_dedup(batch, store16, num_hashes=32, bands=8)
    # matching params still fine; empty store skips the probe entirely
    incremental_minhash_dedup(batch, store16, num_hashes=16, bands=8).collect()
    empty = minhash_store(corpus.limit(0), num_hashes=16, bands=8)
    incremental_minhash_dedup(batch, empty, num_hashes=32, bands=8).collect()
