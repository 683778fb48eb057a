"""Training-corpus preparation ops: decontamination, PII scrub, BM25,
sequence packing, corpus n-grams — semantics on hand-built frames plus
plan-shape gates (broadcast eval side, no Python in the hot path)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.corpus import (
    bm25_score,
    decontaminate,
    ngram_topk,
    pack_sequences,
    pii_scrub,
    word_ngrams,
)
from global_stock_data_warehouse_spark.operators.text import tokens


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_word_ngrams_short_doc_yields_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c",)], ["text"])
    out = df.select(F.size(word_ngrams(tokens("text"), 3)).alias("n")).collect()
    assert [r.n for r in out] == [0, 1]


def test_decontaminate_flags_shared_ngram(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "totally unrelated content with zero overlap here"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "we say the quick brown fox jumps far away")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in decontaminate(train, ev, n=5).collect()}
    assert out[1].contaminated and out[1].n_collisions == 1  # the 5-gram
    assert not out[2].contaminated and out[2].n_collisions == 0


def test_decontaminate_eval_side_broadcasts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(
        decontaminate(
            docs.filter("doc_id % 20 != 0"), docs.filter("doc_id % 20 = 0"), n=5
        )
    )
    assert "BroadcastHashJoin" in plan, plan


def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io or 10.0.0.1 or 555-123-4567 end")],
        ["doc_id", "text"],
    )
    r = pii_scrub(df).first()
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)
    assert r.clean_text == "mail [EMAIL] or [IP] or [PHONE] end"


def test_pii_scrub_email_wins_over_ip_fragment(spark):
    # domain contains a dotted digit run; email replacement must consume it
    df = spark.createDataFrame([(1, "u@h1.2x.com")], ["doc_id", "text"])
    r = pii_scrub(df).first()
    assert r.clean_text == "[EMAIL]" and r.n_ips == 0


def test_bm25_matches_local_formula(spark):
    rows = [(1, "spark spark runs fast"), (2, "hash table"), (3, "no match here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.score for r in bm25_score(df, ["spark", "hash"]).collect()}
    n, avgdl = 3, (4 + 2 + 3) / 3
    k1, b = 1.2, 0.75

    def score(tf, dl, dfreq):
        idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    assert out[1] == pytest.approx(score(2, 4, 1))  # "spark" x2
    assert out[2] == pytest.approx(score(1, 2, 1))  # "hash" x1
    assert 3 not in out  # zero-score docs filtered


def test_bm25_single_stats_row_broadcasts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(bm25_score(docs, ["spark", "hash"]))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_pack_sequences_spans_boundaries(spark):
    # shard s: 3 docs of 40 tokens -> cum 40/80/120 over ctx 64
    rows = [(i, "t " * 40, "s") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.doc_id: r for r in pack_sequences(df, ctx_len=64).collect()}
    assert (out[0].seq_first, out[0].seq_last, out[0].n_seqs) == (0, 0, 1)
    assert (out[1].seq_first, out[1].seq_last, out[1].n_seqs) == (0, 1, 2)  # straddles
    assert (out[2].seq_first, out[2].seq_last, out[2].n_seqs) == (1, 1, 1)


def test_pack_sequences_shards_independent(spark):
    rows = [(1, "a b c", "s1"), (2, "d e", "s2")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.doc_id: r for r in pack_sequences(df, ctx_len=4).collect()}
    # each shard's cumsum restarts
    assert out[1].cum_tokens == 3 and out[2].cum_tokens == 2
    assert out[1].seq_first == 0 and out[2].seq_first == 0


def test_duplicate_spans_counts_distinct_docs(spark):
    from global_stock_data_warehouse_spark.operators.corpus import duplicate_spans

    rows = [
        (1, "copy right footer text here plus unique one"),
        (2, "copy right footer text here plus unique two"),
        (3, "copy right footer text here copy right footer text here"),  # internal repeat
        (4, "completely different content"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.span: r for r in duplicate_spans(df, n=4, min_docs=2, k=10).collect()}
    r = out["copy right footer text"]
    # doc 3 repeats the span internally but counts ONCE
    assert r.n_docs == 3 and r.members == "1,2,3"
    assert all(r.n_docs >= 2 for r in out.values())


def test_duplicate_spans_member_cap(spark):
    from global_stock_data_warehouse_spark.operators.corpus import duplicate_spans

    df = spark.createDataFrame(
        [(i, "the same boilerplate span") for i in range(30)], ["doc_id", "text"]
    )
    r = duplicate_spans(df, n=4, min_docs=2, k=5, max_members=10).first()
    assert r.n_docs == 30  # true spread kept
    assert r.members == ",".join(str(i) for i in range(10))  # capped + sorted


def test_rebalance_sample_quotas_and_determinism(spark):
    from global_stock_data_warehouse_spark.operators.corpus import rebalance_sample

    rows = [(i, "en" if i < 20 else ("de" if i < 26 else "xx")) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_sample(df, {"en": 5, "de": 10}, group_col="lang")
    got = out.collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert len(by_lang["en"]) == 5  # capped
    assert len(by_lang["de"]) == 6  # quota above group size -> whole group
    assert "xx" not in by_lang  # unlisted languages dropped
    # deterministic: same selection on re-run
    again = {(r.lang, r.doc_id) for r in rebalance_sample(df, {"en": 5, "de": 10}, group_col="lang").collect()}
    assert again == {(r.lang, r.doc_id) for r in got}


def test_rebalance_sample_prune_is_exact_and_selective(spark):
    """The analytic md5-cutoff pre-prune (VERDICT r2 item 3) must (a) keep
    the result bit-identical to an independent Python oracle — top-quota by
    md5(doc_id) order — and (b) actually shrink the window's sort input on
    a big group instead of sorting every row."""
    import hashlib

    from pyspark.sql import functions as F

    from global_stock_data_warehouse_spark.operators.corpus import rebalance_sample

    n, quota = 20_000, 10
    df = spark.createDataFrame([(i, "en") for i in range(n)], "doc_id long, lang string")
    got = sorted(
        (r.rn, r.doc_id)
        for r in rebalance_sample(
            df, {"en": quota}, min_prune_rows=1000, min_prune_bytes=0
        ).collect()
    )
    expected_ids = [
        i for _, i in sorted((hashlib.md5(str(i).encode()).hexdigest(), i) for i in range(n))
    ][:quota]
    assert got == [(rn, i) for rn, i in zip(range(1, quota + 1), expected_ids)]

    # prune selectivity: the analytic cutoff admits ~quota+16*sqrt(quota)+256
    # of 20k rows into the window, not all of them (binomial around ~316)
    cut = (quota + 16.0 * (quota**0.5) + 256.0) / n
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 13), 16, 10
    ).cast("double") / float(16**13)
    survivors = df.filter(u <= F.lit(cut)).count()
    assert quota <= survivors < 1000, survivors
    # and the physical plan carries that prune as a Filter below the Window
    plan = (
        rebalance_sample(df, {"en": quota}, min_prune_rows=1000, min_prune_bytes=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "conv(substring(md5" in plan
    # below the absolute floor the prune stays OUT of the plan (the sort is
    # cheaper than the prune machinery at small scale)
    plain = (
        rebalance_sample(df, {"en": quota})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "conv(substring(md5" not in plain


def test_temperature_sample_flattens_mixture(spark):
    """alpha < 1 must give low-resource groups a LARGER share than their
    natural proportion (the multilingual-LM upsampling property), alpha=1
    must be proportional, and quotas never exceed group size."""
    from global_stock_data_warehouse_spark.operators.corpus import temperature_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    def shares(alpha):
        out = temperature_sample(df, budget=100, alpha=alpha).collect()
        by = {}
        for r in out:
            by[r.lang] = by.get(r.lang, 0) + 1
        return by

    flat = shares(0.3)
    prop = shares(1.0)
    # natural share of 'small' is 10%; alpha=0.3 boosts it well above that
    assert flat["small"] / (flat["small"] + flat["big"]) > 0.25
    # proportional: 90/10 within floor rounding
    assert prop["big"] in (89, 90) and prop["small"] in (9, 10)
    # uniform at alpha=0: both groups get equal quota
    uni = shares(0.0)
    assert uni["big"] == uni["small"] == 50
    # quota caps at group size when the budget exceeds it
    capped = temperature_sample(df, budget=5000, alpha=0.3).collect()
    assert len([r for r in capped if r.lang == "small"]) == 100


def test_with_split_deterministic_and_group_safe(spark):
    """Split assignment must be a pure function of the key (identical on
    re-run), respect the weight ranges, and — with key_col — put every
    member of a group in the SAME split (near-dup leakage guard)."""
    import pytest as _pytest

    from global_stock_data_warehouse_spark.operators.corpus import with_split

    df = spark.createDataFrame(
        [(i, i // 10) for i in range(1000)], "doc_id long, cluster long"
    )
    a = {r.doc_id: r.split for r in with_split(df).collect()}
    b = {r.doc_id: r.split for r in with_split(df).collect()}
    assert a == b  # deterministic
    shares = {s: sum(1 for v in a.values() if v == s) for s in set(a.values())}
    assert set(shares) == {"train", "val", "test"}
    assert shares["train"] > 900  # 98% nominal, md5-uniform

    by_cluster = {}
    for r in with_split(df, key_col="cluster").collect():
        by_cluster.setdefault(r.cluster, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())  # group-coherent

    with _pytest.raises(ValueError, match="sum to 100"):
        with_split(df, {"train": 50, "val": 10})


def test_leakage_safe_split_no_pair_straddles(spark):
    """End-to-end leakage guard: near-dup pairs -> components -> split.
    EVERY pair (even transitively connected ones) must land in one
    split; unpaired docs keep the per-doc hash assignment. The naive
    per-doc split demonstrably straddles at least one pair on the same
    fixture (i.e. the guard is not vacuous)."""
    from global_stock_data_warehouse_spark.operators.corpus import (
        leakage_safe_split,
        with_split,
    )

    docs = spark.range(400).select(F.col("id").alias("doc_id"))
    # chains 0-1-2, 10-11, ... : transitive components, not just pairs
    pairs = spark.createDataFrame(
        [(10 * g, 10 * g + 1) for g in range(40)]
        + [(10 * g + 1, 10 * g + 2) for g in range(40)],
        "id_a long, id_b long",
    )
    out = {
        r.doc_id: r for r in leakage_safe_split(docs, pairs).collect()
    }
    assert len(out) == 400
    for g in range(40):
        trio = {out[10 * g + i].split for i in range(3)}
        assert len(trio) == 1, (g, trio)
        assert out[10 * g].group_key == 10 * g  # component min id
    # unpaired docs hash on their own id -> identical to plain with_split
    plain = {
        r.doc_id: r.split for r in with_split(docs.withColumnRenamed("doc_id", "doc_id")).collect()
    }
    for i, r in out.items():
        if i % 10 > 2:
            assert r.group_key == i
            assert r.split == plain[i]
    # non-vacuous: the naive split DOES straddle some chained trio
    straddled = any(
        len({plain[10 * g], plain[10 * g + 1], plain[10 * g + 2]}) > 1
        for g in range(40)
    )
    assert straddled


def test_ngram_topk_deterministic_order(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c d"), (2, "a b c d")], ["doc_id", "text"]
    )
    out = [(r.gram, r.n) for r in ngram_topk(df, n=2, k=3, min_count=2).collect()]
    # "a b" x3; then ties at 2 break by gram ASC
    assert out == [("a b", 3), ("b c", 2), ("c d", 2)]


def test_ngram_topk_is_take_ordered(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(ngram_topk(docs, n=2, k=25, min_count=2))
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan, plan  # map-side combine before the shuffle


def test_unigram_logprob_hand_computed(spark):
    import math

    from global_stock_data_warehouse_spark.operators.corpus import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id long, text string"
    )
    # counts: a=2, b=1, c=1; N=4; vocab_size=1 -> vocab={a}; denom=4+1*2=6
    out = {r.doc_id: r for r in unigram_logprob(df, vocab_size=1).collect()}
    lp_a, lp_oov = math.log(3 / 6), math.log(1 / 6)
    assert out[1].n_tokens == 3 and out[2].n_tokens == 1
    assert out[1].avg_logprob == round((2 * lp_a + lp_oov) / 3, 4)
    assert out[2].avg_logprob == round(lp_oov, 4)
    # the common-token doc scores strictly higher than the OOV-only doc
    assert out[1].avg_logprob > out[2].avg_logprob


def test_ngram_topk_sketch_matches_exact_with_headroom(spark):
    from global_stock_data_warehouse_spark.operators.corpus import (
        ngram_topk,
        ngram_topk_sketch,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {'alpha beta ' * (i % 4)}end") for i in range(60)],
        ["doc_id", "text"],
    )
    exact = [(r.gram, r.n) for r in ngram_topk(docs, n=2, k=10).collect()]
    approx = [(r.gram, r.n) for r in ngram_topk_sketch(docs, n=2, k=10).collect()]
    assert approx == exact


def test_ngram_topk_sketch_recovers_heavy_hitters_when_lossy(spark):
    from global_stock_data_warehouse_spark.operators.corpus import ngram_topk_sketch

    # one overwhelming bigram + a long unique tail; capacity far below the
    # tail's distinct count forces real truncation
    rows = [(i, "hot gram") for i in range(400)]
    rows += [(1000 + i, f"u{i} v{i}") for i in range(300)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    out = ngram_topk_sketch(docs, n=2, k=1, min_count=2, capacity=16).collect()
    assert [(r.gram, r.n) for r in out] == [("hot gram", 400)]


# ---------------------------------------------------------------------------
# remove_duplicate_spans (exact substring dedup rewrite)
# ---------------------------------------------------------------------------


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    from global_stock_data_warehouse_spark.operators.corpus import (
        remove_duplicate_spans,
    )

    # doc 0 holds the first occurrence of the 3-token span "x y z";
    # doc 1 repeats it verbatim -> those 3 tokens are cut from doc 1 only.
    df = spark.createDataFrame(
        [(0, "x y z tail"), (1, "head x y z")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_duplicate_spans(df, n=3, min_count=2).collect()
    }
    assert out[0] == ("x y z tail", 0)
    assert out[1] == ("head", 3)


def test_remove_duplicate_spans_overlapping_spans_union_coverage(spark):
    from global_stock_data_warehouse_spark.operators.corpus import (
        remove_duplicate_spans,
    )

    # "a b a b a b" vs itself in doc 1: every position of doc 1 is covered
    # by some duplicated span -> doc 1 empties entirely but keeps its row.
    df = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "a b a b a b")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_duplicate_spans(df, n=2, min_count=2).collect()
    }
    assert out[1] == ("", 6)
    # doc 0: internal repeats ("a b" occurs 3x within doc 0 itself) —
    # only the globally-first occurrence at pos 0 survives untouched;
    # later in-doc repeats are cut too (Lee et al. semantics, not per-doc).
    assert out[0][0].startswith("a b")
    assert out[0][1] > 0


def test_remove_duplicate_spans_short_docs_untouched(spark):
    from global_stock_data_warehouse_spark.operators.corpus import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame([(0, "one two"), (1, "one two")], ["doc_id", "text"])
    out = remove_duplicate_spans(df, n=4, min_count=2).collect()
    assert all(r.n_removed == 0 for r in out)
    assert sorted(r.clean_text for r in out) == ["one two", "one two"]


def test_remove_duplicate_spans_hash_spans_equivalence(spark):
    # hash_spans=True keys the corpus-wide shuffle on xxhash64(span)
    # instead of the raw string (the 100 TB shuffle-width form) — output
    # must be identical to the string-keyed reference path.
    import random

    from global_stock_data_warehouse_spark.operators.corpus import (
        remove_duplicate_spans,
    )

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    boiler = "the quick brown fox jumps over"
    rows = []
    for i in range(60):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 25)))
        rows.append((i, body if i % 3 else f"{body} {boiler}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(
        remove_duplicate_spans(df, n=3, min_count=2, hash_spans=False).collect()
    )
    b = sorted(
        remove_duplicate_spans(df, n=3, min_count=2, hash_spans=True).collect()
    )
    assert a == b
    assert any(r.n_removed > 0 for r in a)
    # auto dispatch: small corpora keep raw (debuggable, zero-collision)
    # span keys; past auto_hash_docs the plan keys the shuffle on xxhash64
    small_plan = (
        remove_duplicate_spans(df, n=3, min_count=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "xxhash64" not in small_plan
    big_plan = (
        remove_duplicate_spans(df, n=3, min_count=2, auto_hash_docs=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "xxhash64" in big_plan
    auto = sorted(remove_duplicate_spans(df, n=3, min_count=2, auto_hash_docs=10).collect())
    assert auto == a


def test_remove_duplicate_spans_64bit_doc_ids(spark):
    # first-occurrence identity is min(struct(doc_id, pos)) — the packed
    # doc_id*2^32+pos BIGINT key would overflow for doc_id >= 2^31 and
    # pick a wrong 'first'. 64-bit hash-style ids must order correctly.
    from global_stock_data_warehouse_spark.operators.corpus import (
        remove_duplicate_spans,
    )

    lo, hi = 7, (1 << 62) + 11
    df = spark.createDataFrame(
        [(lo, "x y z tail"), (hi, "head x y z")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_duplicate_spans(df, n=3, min_count=2).collect()
    }
    # lower doc_id holds the first occurrence; the huge id gets the cut
    assert out[lo] == ("x y z tail", 0)
    assert out[hi] == ("head", 3)


# ---------------------------------------------------------------------------
# bpe_merge_candidates
# ---------------------------------------------------------------------------


def test_bpe_merge_candidates_weighted_by_word_frequency(spark):
    from global_stock_data_warehouse_spark.operators.corpus import (
        bpe_merge_candidates,
    )

    # "ab" appears 3x as a word -> pair "ab" weight 3; "abc" once -> pairs
    # "ab"+1, "bc"+1. Single-char words contribute nothing.
    df = spark.createDataFrame([("ab ab ab abc a",)], ["text"])
    out = {r.pair: r.n for r in bpe_merge_candidates(df, k=10).collect()}
    assert out == {"ab": 4, "bc": 1}


def test_source_kl_zero_for_identical_distributions(spark):
    from global_stock_data_warehouse_spark.operators.corpus import (
        source_kl_divergence,
    )

    # identical sources match the corpus distribution exactly -> KL == 0
    same = spark.createDataFrame(
        [(0, "a b", "s1"), (1, "a b", "s2")], ["doc_id", "text", "source"]
    )
    out = {r.source: (r.n_tokens, r.kl_nats) for r in source_kl_divergence(same).collect()}
    assert out == {"s1": (2, 0.0), "s2": (2, 0.0)}

    # skew: corpus is a:6 b:2 -> q=(0.75, 0.25); s1's p=(0.5, 0.5):
    # KL = 0.5 ln(0.5/0.75) + 0.5 ln(0.5/0.25) = 0.1438 nats
    skewed = spark.createDataFrame(
        [(0, "a b", "s1"), (1, "a b", "s2"), (2, "a a a a", "s3")],
        ["doc_id", "text", "source"],
    )
    out = {r.source: r.kl_nats for r in source_kl_divergence(skewed).collect()}
    assert out["s1"] == 0.1438 == out["s2"]
    assert out["s3"] > 0  # 1.0 ln(4/6 / 0.75) ... a-only source diverges too


def test_source_overlap_exact_counts(spark):
    from global_stock_data_warehouse_spark.operators.corpus import (
        source_overlap_exact,
    )

    df = spark.createDataFrame(
        [
            (0, "a b c", "s1"),
            (1, "b c d", "s2"),
            (2, "x y", "s3"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {(r.src_a, r.src_b): (r.n_inter, r.n_union, r.jaccard)
           for r in source_overlap_exact(df).collect()}
    assert out[("s1", "s2")] == (2, 4, 0.5)  # {b,c} of {a,b,c,d}
    # disjoint pairs don't appear at all (inner join semantics — at scale
    # the zero rows would be |S|^2 noise)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_source_overlap_kmv_tracks_exact_jaccard(spark):
    import random

    from global_stock_data_warehouse_spark.operators.corpus import (
        source_overlap_exact,
        source_overlap_kmv,
    )

    # two sources sharing ~half their vocabulary; with k >= |union| the
    # KMV sketch IS the full hash set, so the estimate must be exact.
    rng = random.Random(3)
    shared = [f"w{i}" for i in range(60)]
    only_a = [f"a{i}" for i in range(30)]
    only_b = [f"b{i}" for i in range(30)]
    rows = []
    for i in range(40):
        rows.append((i, " ".join(rng.sample(shared + only_a, 8)), "sa"))
        rows.append((100 + i, " ".join(rng.sample(shared + only_b, 8)), "sb"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    exact = source_overlap_exact(df).collect()[0].jaccard
    full = source_overlap_kmv(df, k=1000).collect()[0].est_jaccard
    assert abs(full - exact) < 1e-9
    # bounded-k sketch: estimate within the standard KMV error envelope
    est = source_overlap_kmv(df, k=64).collect()[0].est_jaccard
    assert abs(est - exact) < 0.25


# ---------------------------------------------------------------------------
# collocations / vocab_growth
# ---------------------------------------------------------------------------


def test_collocations_window_counts(spark):
    from global_stock_data_warehouse_spark.operators.corpus import collocations

    # "a b c a" with window=2: pairs (a,b) (a,c)@off2, (b,c) (a,b)@off2,
    # (a,c)@off1 -> (a,b)x2, (a,c)x2, (b,c)x1; doc 1 adds (x,y) once.
    df = spark.createDataFrame([(0, "a b c a"), (1, "x y")], ["doc_id", "text"])
    out = {(r.a, r.b): r.n for r in collocations(df, window=2, min_count=1).collect()}
    assert out[("a", "b")] == 2 and out[("a", "c")] == 2 and out[("b", "c")] == 1
    assert out[("x", "y")] == 1
    # pairs never cross documents
    assert ("a", "x") not in out and ("c", "x") not in out
    # canonicalization: identical-token bigram counts under (t, t)
    df2 = spark.createDataFrame([(0, "t t t")], ["doc_id", "text"])
    out2 = {(r.a, r.b): r.n for r in collocations(df2, window=1, min_count=1).collect()}
    assert out2 == {("t", "t"): 2}


def test_collocations_min_count_and_topk_order(spark):
    from global_stock_data_warehouse_spark.operators.corpus import collocations

    df = spark.createDataFrame(
        [(i, "p q filler" + str(i)) for i in range(5)] + [(9, "r s")],
        ["doc_id", "text"],
    )
    rows = collocations(df, window=1, min_count=2, k=10).collect()
    # only (p,q) survives min_count=2; (r,s) and fillers appear once
    assert [(r.a, r.b, r.n) for r in rows] == [("p", "q", 5)]


def test_vocab_growth_hapax_and_ttr(spark):
    from global_stock_data_warehouse_spark.operators.corpus import vocab_growth

    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat", "sa"),
            (1, "the dog", "sa"),
            (2, "aaa aaa aaa aaa", "sb"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {r.source: r for r in vocab_growth(df).collect()}
    # sa: 8 tokens, vocab {the,cat,sat,on,mat,dog}=6, hapax = all but 'the' = 5
    assert out["sa"].n_tokens == 8 and out["sa"].n_vocab == 6
    assert out["sa"].n_hapax == 5
    assert out["sa"].ttr == round(6 / 8, 6)
    # sb: degenerate template source -> hapax share collapses to 0
    assert out["sb"].n_vocab == 1 and out["sb"].n_hapax == 0
    assert out["sb"].hapax_ratio == 0.0


def test_source_mix_report(spark):
    """Shares sum to 1; proportional effective epochs = budget/total for
    every source; zero-token sources don't divide by zero."""
    from global_stock_data_warehouse_spark.operators.corpus import source_mix_report

    df = spark.createDataFrame(
        [(1, "a b c", "web"), (2, "d e", "web"), (3, "f g h i j", "books"),
         (4, "", "empty")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in source_mix_report(df, token_budget=100).collect()}
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-6
    assert out["web"].n_docs == 2 and out["web"].n_tokens == 5
    assert out["books"].n_tokens == 5
    # proportional sampling: every non-empty source repeats budget/total x
    assert abs(out["web"].effective_epochs - 10.0) < 1e-6
    assert abs(out["books"].effective_epochs - 10.0) < 1e-6
    assert out["empty"].n_tokens == 0 and out["empty"].effective_epochs == 0.0


def test_shard_shuffle_is_a_deterministic_permutation(spark):
    """(shard, pos) is a partition of the input into dense 1..n_s runs,
    identical under repartitioning, and a seed change permutes it."""
    from global_stock_data_warehouse_spark.operators.corpus import shard_shuffle

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = shard_shuffle(df, n_shards=4, seed=7).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(200))
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    again = shard_shuffle(df.repartition(7), n_shards=4, seed=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    reseeded = shard_shuffle(df, n_shards=4, seed=8).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, reseeded))
    # the shuffle actually shuffles: within some shard, order != id order
    ids_in_pos_order = [
        r["doc_id"] for r in sorted(out, key=lambda r: (r["shard"], r["pos"]))
    ]
    assert ids_in_pos_order != sorted(ids_in_pos_order)


def test_shard_shuffle_rejects_bad_shard_count(spark):
    from global_stock_data_warehouse_spark.operators.corpus import shard_shuffle

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        shard_shuffle(df, n_shards=0)


def test_term_class_chi2_discriminative_terms(spark):
    """A term occurring in every class-A doc and nowhere else maxes the
    chi-square for class A; presence semantics (repeats in one doc count
    once); min_df prunes rare terms."""
    from global_stock_data_warehouse_spark.operators.corpus import term_class_chi2

    rows = []
    for i in range(10):
        # 'alpha' only in class A (repeated -> presence counted once);
        # 'common' everywhere; 'rare' in one doc only
        rows.append((i, "alpha alpha common filler%d" % i, "A"))
        rows.append((100 + i, "beta common filler%d rare" % i if i == 0
                     else "beta common filler%d" % i, "B"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = term_class_chi2(df, top_k=3, min_df=2)
    rows_a = [r for r in out.collect() if r.cls == "A"]
    assert rows_a[0].term in ("alpha", "beta")  # both perfectly discriminative
    by_term = {r.term: r for r in rows_a}
    assert "alpha" in by_term and by_term["alpha"].df_in_class == 10
    # perfect 10/0 vs 0/10 split over N=20: chi2 == N
    assert by_term["alpha"].chi2 == 20.0
    # 'rare' (df=1) pruned by min_df=2; 'common' has chi2 == 0
    terms = {r.term for r in out.collect()}
    assert "rare" not in terms


def test_bloom_decontaminate_superset_of_exact(spark):
    """The bloom path NEVER misses a true contamination (one-sided
    error), its per-doc hit count upper-bounds the exact collision
    count, and a tiny bitmap degrades to over-flagging, never leaks."""
    from global_stock_data_warehouse_spark.operators.corpus import (
        bloom_decontaminate,
        decontaminate,
    )

    def text(seed, n=12):
        return " ".join(f"w{seed}_{i}" for i in range(n))

    train = spark.createDataFrame(
        [(i, text(i)) for i in range(40)]
        + [(100, text(3)), (101, text(7)), (200, "too short")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(900, text(3)), (901, text(7)), (902, text(999))],
        "doc_id long, text string",
    )
    exact = {r.doc_id: r for r in decontaminate(train, ev, n=5).collect()}
    bloom = {r.doc_id: r for r in bloom_decontaminate(train, ev, n=5).collect()}
    assert set(exact) == set(bloom), "verdict must be total over train"
    assert not bloom[200].contaminated and bloom[200].n_gram_hits == 0
    for d, r in exact.items():
        if r.contaminated:
            assert bloom[d].contaminated, f"bloom missed true hit {d}"
        assert bloom[d].n_gram_hits >= r.n_collisions
    assert exact[3].contaminated and exact[100].contaminated
    # m = 64 bits: everything collides -> still a valid upper bound
    tiny = {r.doc_id: r for r in
            bloom_decontaminate(train, ev, n=5, m_bits=64).collect()}
    for d, r in exact.items():
        if r.contaminated:
            assert tiny[d].contaminated
    # empty eval set -> empty bitmap -> nothing flagged
    clear = bloom_decontaminate(train, ev.limit(0), n=5).collect()
    assert all(not r.contaminated for r in clear)


def test_term_class_chi2_empty_and_single_class(spark):
    """Empty corpus -> empty frame; a single class makes every chi2 zero
    (no between-class signal: c_n == n, so b*c == a*d degenerates)."""
    from global_stock_data_warehouse_spark.operators.corpus import term_class_chi2

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert term_class_chi2(empty).count() == 0
    one = spark.createDataFrame(
        [(i, "tok%d common" % i, "only") for i in range(8)],
        "doc_id long, text string, source string",
    )
    rows = term_class_chi2(one, top_k=5, min_df=1).collect()
    assert rows and all(r.chi2 == 0.0 for r in rows)


def test_bigram_prob_score_detects_word_salad(spark):
    """Same unigrams, scrambled order: the bigram score must drop while
    unigram_prob_score cannot tell them apart; sub-2-token docs are
    absent (no bigram positions); probabilities are exact ratios."""
    from global_stock_data_warehouse_spark.operators.corpus import (
        bigram_prob_score,
        unigram_prob_score,
    )

    natural = "the cat sat on the mat " * 10
    salad = "the the cat mat sat on " + "mat the on sat cat the " * 9
    docs = spark.createDataFrame(
        [(1, natural), (2, salad), (3, "single")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           bigram_prob_score(docs, vocab_size=8, bigram_size=16).collect()}
    assert 3 not in out, "a 1-token doc has no bigram positions"
    assert out[1].n_bigrams == 59 and out[2].n_bigrams == 59
    assert out[1].mean_bigram_prob > out[2].mean_bigram_prob
    uni = {r.doc_id: r.mean_prob for r in
           unigram_prob_score(docs, vocab_size=8).collect()}
    assert uni[1] == uni[2], "unigram twin is order-blind by design"


def test_text_ops_handle_unicode_and_degenerate_docs(spark):
    """Unicode tokens (CJK, accents, emoji), a doc that is ONE giant
    repeated token, and whitespace-only text flow through the r7 text
    operators without error and with sane shapes."""
    from global_stock_data_warehouse_spark.operators.corpus import (
        bigram_prob_score,
        term_class_chi2,
    )

    docs = spark.createDataFrame(
        [
            (1, "héllo wörld héllo wörld naïve", "a"),
            (2, "株式 市場 データ 株式 市場", "a"),
            (3, "🚀 to the 🌕 and back 🚀", "b"),
            (4, ("mono " * 50).strip(), "b"),
            (5, "   \t  ", "b"),  # whitespace-only -> zero tokens
        ],
        "doc_id long, text string, source string",
    )
    chi = term_class_chi2(docs, top_k=50, min_df=1).collect()
    assert {r.cls for r in chi} <= {"a", "b"}
    assert any(r.term == "株式" for r in chi), "CJK tokens must survive"
    assert any(r.term == "🚀" for r in chi), "emoji tokens must survive"
    bi = {
        r.doc_id: r
        for r in bigram_prob_score(docs, vocab_size=8, bigram_size=16).collect()
    }
    assert 5 not in bi and 1 in bi and 3 in bi
    assert bi[4].n_bigrams == 49  # mono x50 -> 49 bigram positions
    # the mono doc's bigram (mono,mono) dominates the model -> high prob
    assert bi[4].mean_bigram_prob > bi[3].mean_bigram_prob


def test_term_class_chi2_null_class_uniformly_excluded(spark):
    """NULL-class docs must not sit inside N while missing from every
    class: with two clean docs per class plus NULL-source noise docs,
    chi2 must equal the noise-free computation."""
    from global_stock_data_warehouse_spark.operators.corpus import term_class_chi2

    clean = [(1, "alpha x", "a"), (2, "alpha y", "a"),
             (3, "beta x", "b"), (4, "beta y", "b")]
    noise = [(10 + i, "alpha beta junk%d" % i, None) for i in range(6)]
    base = spark.createDataFrame(clean, "doc_id long, text string, source string")
    noisy = spark.createDataFrame(clean + noise,
                                  "doc_id long, text string, source string")
    a = sorted(map(tuple, term_class_chi2(base, top_k=10, min_df=1).collect()))
    b = sorted(map(tuple, term_class_chi2(noisy, top_k=10, min_df=1).collect()))
    assert a == b


def test_null_text_behaves_as_empty_everywhere(spark):
    """NULL text == empty text at the tokens()/fingerprint() root: no
    -1 sizes, no crashes, no NULL fingerprint groups; the n-gram pair
    join previously crashed outright on a NULL text row."""
    from global_stock_data_warehouse_spark.operators.dedup import (
        dedup_exact,
        ngram_jaccard_pairs,
    )
    from global_stock_data_warehouse_spark.operators.text import (
        chunk_documents,
        text_stats,
    )

    docs = spark.createDataFrame(
        [(1, "hello world foo bar"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    st = {r.doc_id: r for r in text_stats(docs).collect()}
    assert st[2].n_tokens == 0 and st[3].n_tokens == 0
    assert st[2].fingerprint == st[3].fingerprint, "NULL == empty contract"
    assert all(r.n_chunk_tokens >= 0 for r in chunk_documents(docs).collect())
    groups = {r.fp: r for r in dedup_exact(docs).collect()}
    assert all(fp is not None for fp in groups)
    # NULL and empty docs share one content group (keep = min id = 2)
    assert any(r.n_dups == 2 and r.keep_id == 2 for r in groups.values())
    assert ngram_jaccard_pairs(docs, threshold=0.1).count() == 0


# ---------------------------------------------------------------------------
# r9 additions: gopher flags / mixture plan / exact-quota split
# ---------------------------------------------------------------------------


def test_gopher_quality_flags_rule_boundaries(spark):
    """Each Gopher rule at its published threshold: exactly min_words
    passes, min_words-1 fails; mean word length exactly 3.0 and 10.0
    pass; symbol ratio exactly at 0.1 passes, above fails; stopword
    count exactly 2 passes, 1 fails; NULL text is all-zero metrics and
    fails via word count."""
    from pyspark.sql import functions as F  # noqa: F401

    from global_stock_data_warehouse_spark.operators.text import (
        gopher_quality_flags,
    )

    docs = [
        # 54 words, mean word length 23/6≈3.83, alpha 1.0, 27 stopword
        # hits -> passes everything
        (1, "the quick and brave of tiger " * 9),
        (2, "word " * 49),            # 49 words: word-count fails at 50
        (3, "word " * 50),            # exactly 50: passes word count
        (4, "ab " * 60),              # mean_word_len 2.0 < 3: fails
        (5, ("abcdefghij " * 60)),    # mean exactly 10.0: passes bound
        (6, ("abcdefghijk " * 60)),   # mean 11.0: fails
        (7, None),                    # NULL text
        # exactly 10% symbol ratio: 60 words, 6 '#' chars
        (8, "the and of to a word7 " * 10 + "######"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}

    assert out[1].passes_gopher
    assert not out[2].flag_word_count and out[3].flag_word_count
    assert out[4].mean_word_len == 2.0 and not out[4].flag_mean_word_len
    assert out[5].mean_word_len == 10.0 and out[5].flag_mean_word_len
    assert out[6].mean_word_len == 11.0 and not out[6].flag_mean_word_len
    assert out[7].n_words == 0 and not out[7].passes_gopher
    assert out[7].mean_word_len == 0.0 and out[7].alpha_share == 0.0
    # doc 8: 61 words (60 real + '######'), 6 hashes -> 6/61 < 0.1 pass;
    # recompute to the operator's exact fixed-point contract
    assert out[8].flag_symbol == (out[8].symbol_ratio <= 0.1)


def test_gopher_quality_flags_line_rules(spark):
    """Bullet and ellipsis line shares: a doc of 10 lines with 9 bullets
    sits exactly ON the 0.9 boundary (passes), 10/10 fails; ellipsis
    exactly 0.3 passes, above fails; unicode bullet/ellipsis count."""
    from global_stock_data_warehouse_spark.operators.text import (
        gopher_quality_flags,
    )

    bullets9 = "\n".join(["- item"] * 9 + ["closing line"])
    bullets10 = "\n".join(["* item"] * 5 + ["• item"] * 5)
    ell3 = "\n".join(["line one..."] * 3 + ["plain"] * 7)
    ell4 = "\n".join(["line one…"] * 4 + ["plain"] * 6)
    df = spark.createDataFrame(
        [(1, bullets9), (2, bullets10), (3, ell3), (4, ell4)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert out[1].bullet_share == 0.9 and out[1].flag_bullet
    assert out[2].bullet_share == 1.0 and not out[2].flag_bullet
    assert out[3].ellipsis_share == 0.3 and out[3].flag_ellipsis
    assert out[4].ellipsis_share == 0.4 and not out[4].flag_ellipsis


def test_mixture_epoch_plan_exact_arithmetic(spark):
    """BIGINT-exact plan: allocated = budget*w DIV W, epochs =
    ceil(allocated/avail), absent-source weight 0 row kept, NULL source
    excluded, budget 0 all-zero, negative budget raises."""
    import pytest

    from global_stock_data_warehouse_spark.operators.corpus import (
        mixture_epoch_plan,
    )

    df = spark.createDataFrame(
        [(1, "a", "t1 t2 t3"), (2, "a", "t1 t2"), (3, "b", "t1"),
         (4, "c", "x y z w"), (5, None, "ignored")],
        "doc_id long, source string, text string",
    )
    out = {
        r.source: r
        for r in mixture_epoch_plan(
            df, token_budget=100, weights={"a": 3, "b": 1}
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    # W=4 (c weighted 0): a -> 75 alloc / 5 avail = 15 epochs exactly
    assert out["a"].avail_tokens == 5 and out["a"].allocated_tokens == 75
    assert out["a"].epochs == 15 and out["a"].sample_rate == 15.0
    # b -> 25 alloc / 1 avail = 25 epochs
    assert out["b"].allocated_tokens == 25 and out["b"].epochs == 25
    assert out["c"].weight == 0 and out["c"].allocated_tokens == 0
    assert out["c"].epochs == 0 and out["c"].sample_rate == 0.0

    zero = mixture_epoch_plan(df, token_budget=0, weights={"a": 1}).collect()
    assert all(r.allocated_tokens == 0 and r.epochs == 0 for r in zero)
    with pytest.raises(ValueError, match="token_budget"):
        mixture_epoch_plan(df, token_budget=-1)
    # uniform default: every present source weight 1
    uni = {r.source: r.weight for r in mixture_epoch_plan(df, 100).collect()}
    assert uni == {"a": 1, "b": 1, "c": 1}


def test_stratified_quota_split_exact_counts(spark):
    """The defining guarantee vs with_split: per-stratum split counts
    are EXACTLY the ceil brackets — 100 docs at 100/50 per-mille give
    val 10, test 5, train 85 in every stratum, every run; full
    coverage (no doc unassigned); determinism; quota validation."""
    import pytest

    from global_stock_data_warehouse_spark.operators.corpus import (
        stratified_quota_split,
    )

    rows = [(i, f"s{i % 3}") for i in range(300)] + [(1000, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_quota_split(df, quotas={"val": 100, "test": 50})
    counts = {
        (r.source, r.split): r["count"]
        for r in out.groupBy("source", "split").count().collect()
    }
    for s in ("s0", "s1", "s2"):
        assert counts[(s, "val")] == 10
        assert counts[(s, "test")] == 5
        assert counts[(s, "train")] == 85
    # NULL stratum is a real 1-doc stratum: ceil puts it in 'test'
    # (first sorted split) by the documented bracket contract
    assert counts[(None, "test")] == 1
    assert out.count() == 301  # full coverage
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            stratified_quota_split(df, quotas={"val": 100, "test": 50}).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="per-mille"):
        stratified_quota_split(df, quotas={"val": -1})
    with pytest.raises(ValueError, match="1000"):
        stratified_quota_split(df, quotas={"val": 600, "test": 600})
    with pytest.raises(ValueError, match="remainder"):
        stratified_quota_split(df, quotas={"train": 10})
