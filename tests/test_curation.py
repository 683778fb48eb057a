"""Corpus-curation analytics: hand-computed checks for boilerplate
frequency stats, per-source quality gating, novelty timeline, and the
Zipf slope regression."""

import math

import pytest

from global_stock_data_warehouse_spark.operators.curation import (
    line_boilerplate_stats,
    novelty_timeline,
    quality_percentile_gate,
    zipf_slope,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# --- line boilerplate -------------------------------------------------------


def test_boilerplate_threshold_counts(spark):
    # "foot" appears in 3 docs -> boilerplate at min_docs=3; "body1..3"
    # are unique.
    df = _docs(
        spark,
        [
            (1, "body1\nfoot", "a"),
            (2, "body2\nfoot", "a"),
            (3, "body3\nfoot", "a"),
        ],
    )
    out = {r.doc_id: r for r in line_boilerplate_stats(df, sep="\n", min_docs=3).collect()}
    assert all(out[d].n_segs == 2 and out[d].n_boiler == 1 for d in (1, 2, 3))
    # body5 + foot4 = 9 chars, 4 of them boilerplate
    assert out[1].total_chars == 9
    assert out[1].boiler_chars == 4
    assert out[1].boiler_ratio == pytest.approx(4 / 9, abs=1e-6)


def test_boilerplate_distinct_doc_counting(spark):
    # a segment repeated twice INSIDE one doc counts that doc once:
    # "x" occurs in 2 distinct docs < min_docs=3 -> not boilerplate
    df = _docs(spark, [(1, "x\nx", "a"), (2, "x", "a")])
    out = {r.doc_id: r for r in line_boilerplate_stats(df, sep="\n", min_docs=3).collect()}
    assert out[1].n_boiler == 0 and out[2].n_boiler == 0


def test_boilerplate_empty_segments_dropped(spark):
    df = _docs(spark, [(1, "a\n\n\nb", "s")])
    r = line_boilerplate_stats(df, sep="\n", min_docs=2).collect()[0]
    assert r.n_segs == 2  # blanks between separators vanish


# --- quality gate -----------------------------------------------------------


def test_quality_gate_keeps_top_frac_per_source(spark):
    # source "a": 4 docs scored by length 40 > 30 > 20 > 10; keep_frac
    # 0.5 -> ceil(0.5*4)=2 kept (40, 30).
    df = _docs(
        spark,
        [(i, "z" * (10 * (4 - i)), "a") for i in range(4)]
        + [(10, "hello", "b")],
    )
    out = {r.source: r for r in quality_percentile_gate(df, keep_frac=0.5).collect()}
    assert out["a"].n_docs == 4
    assert out["a"].n_kept == 2
    assert out["a"].min_kept_score == 30
    assert out["a"].mean_kept_score == 35.0
    # a 1-doc source keeps its doc (ceil)
    assert out["b"].n_kept == 1


def test_quality_gate_stopword_bonus(spark):
    # "the the the" = 11 chars + 3 stopwords * 10 = 41
    df = _docs(spark, [(1, "the the the", "s")])
    r = quality_percentile_gate(df, keep_frac=1.0).collect()[0]
    assert r.min_kept_score == 41


# --- novelty timeline -------------------------------------------------------


def test_novelty_first_occurrence_and_buckets(spark):
    # ids 0..9 -> 10 buckets of one doc each; texts repeat in pairs so
    # every even id is novel, every odd id is a duplicate.
    rows = [(i, f"t{i // 2}", "s") for i in range(10)]
    out = {r.bucket: r for r in novelty_timeline(_docs(spark, rows), n_buckets=10).collect()}
    assert len(out) == 10
    assert [out[b].n_new for b in range(1, 11)] == [1, 0] * 5
    assert out[10].cum_distinct == 5
    assert out[2].dup_rate == 1.0
    assert out[1].dup_rate == 0.0


def test_novelty_single_bucket_totals(spark):
    rows = [(i, "same", "s") for i in range(4)]
    out = novelty_timeline(_docs(spark, rows), n_buckets=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 4 and r.n_new == 1 and r.cum_distinct == 1
    assert r.dup_rate == 0.75


# --- zipf slope -------------------------------------------------------------


def test_zipf_slope_exact_power_law(spark):
    # counts 64, 32, 16, 8 at ranks 1..4: ln(cnt) = ln(64) - ln(2)*ln-
    # linear? cnt = 64 * r^(-s) only for specific s; instead use counts
    # c_r = 100 / r exactly -> slope must be exactly -1 in OLS on logs.
    words = []
    vocab = ["w%d" % i for i in range(4)]
    for r, w in enumerate(vocab, start=1):
        words += [w] * (120 // r)  # 120, 60, 40, 30 = 120 / r
    df = _docs(spark, [(1, " ".join(words), "s")])
    out = zipf_slope(df, top_n=10).collect()[0]
    assert out.n_terms == 4
    assert out.slope == pytest.approx(-1.0, abs=1e-6)
    assert out.intercept == pytest.approx(math.log(120.0), abs=1e-6)


def test_zipf_top_n_truncates(spark):
    df = _docs(spark, [(1, "a a a b b c", "s")])
    out = zipf_slope(df, top_n=2).collect()[0]
    assert out.n_terms == 2


def test_zipf_degenerate_single_term_is_null(spark):
    # one distinct term: OLS denominator 0 -> slope/intercept NULL (not
    # NaN — Spark floor(BIGINT) and DuckDB floor(DOUBLE) disagree on NaN)
    df = _docs(spark, [(1, "a a a", "s")])
    r = zipf_slope(df, top_n=10).collect()[0]
    assert r.n_terms == 1
    assert r.slope is None and r.intercept is None


# --- boundary edges (r9 discipline) ------------------------------------------


def test_novelty_bucket_edges_are_integer_exact(spark):
    # ids 0..99, 10 buckets: id 9 -> bucket 1, id 10 -> bucket 2 (the
    # integer-DIV edge), id 99 -> bucket 10
    rows = [(i, f"t{i}", "s") for i in range(100)]
    from pyspark.sql import functions as F

    nt = novelty_timeline(_docs(spark, rows), n_buckets=10)
    per = {r.bucket: r.n_docs for r in nt.collect()}
    assert per == {b: 10 for b in range(1, 11)}


def test_quality_gate_ceil_boundary_exact_fraction(spark):
    # 5 docs at keep_frac=0.4: ceil(2.0) = 2 exactly (not 3)
    df = _docs(spark, [(i, "z" * (10 + i), "a") for i in range(5)])
    r = quality_percentile_gate(df, keep_frac=0.4).collect()[0]
    assert r.n_kept == 2


def test_boilerplate_min_docs_exact_threshold(spark):
    # segment in exactly min_docs distinct docs IS boilerplate (>=)
    df = _docs(spark, [(1, "x", "s"), (2, "x", "s"), (3, "y", "s")])
    out = {r.doc_id: r.n_boiler for r in line_boilerplate_stats(df, sep="\n", min_docs=2).collect()}
    assert out[1] == 1 and out[2] == 1 and out[3] == 0


# --- packing efficiency + dup cluster stats (r9) ------------------------------


def test_packing_efficiency_arithmetic(spark):
    from global_stock_data_warehouse_spark.operators.corpus import (
        packing_efficiency,
    )

    # 1 shard, ctx 10: docs of 7 + 6 = 13 tokens -> 2 seqs, 1 full,
    # 7 pad tokens, fill 13/20
    df = _docs(spark, [(1, " ".join(["a"] * 7), "s"), (2, " ".join(["b"] * 6), "s")])
    r = packing_efficiency(df, ctx_len=10, n_shards=1).collect()[0]
    assert r.n_docs == 2
    assert r.total_tokens == 13
    assert r.n_seqs == 2
    assert r.n_full_seqs == 1
    assert r.pad_waste == 7
    assert abs(r.fill_rate - 0.65) < 1e-6


def test_packing_efficiency_exact_multiple_no_waste(spark):
    from global_stock_data_warehouse_spark.operators.corpus import (
        packing_efficiency,
    )

    df = _docs(spark, [(1, " ".join(["a"] * 20), "s")])
    r = packing_efficiency(df, ctx_len=10, n_shards=1).collect()[0]
    assert r.n_seqs == 2 and r.n_full_seqs == 2 and r.pad_waste == 0
    assert r.fill_rate == 1.0


def test_dup_cluster_stats_sizes(spark):
    import __spark_entry__  # noqa: F401 — q_ wrapper exercised via operators

    from pyspark.sql import functions as F

    from global_stock_data_warehouse_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from global_stock_data_warehouse_spark.operators.graph import dedup_groups

    # docs 1,2,3 identical (cluster of 3); 4,5 identical (cluster of 2);
    # 6 unique (no cluster)
    same_a = "alpha beta gamma delta epsilon zeta"
    same_b = "one two three four five six seven"
    df = _docs(
        spark,
        [(1, same_a, "s"), (2, same_a, "s"), (3, same_a, "s"),
         (4, same_b, "s"), (5, same_b, "s"), (6, "totally different text here", "s")],
    )
    pairs = ngram_jaccard_pairs(df, threshold=0.2)
    stats = {
        r.cluster_size: r
        for r in dedup_groups(pairs)
        .groupBy(F.col("group_size").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            (F.count(F.lit(1)) * F.col("group_size").cast("bigint")).alias("n_docs"),
            (F.count(F.lit(1)) * (F.col("group_size").cast("bigint") - 1)).alias("n_removable"),
        )
        .collect()
    }
    assert stats[3].n_clusters == 1 and stats[3].n_removable == 2
    assert stats[2].n_clusters == 1 and stats[2].n_removable == 1
    assert 1 not in stats  # singletons never form a component


# --- r10: lexical diversity (TTR) -------------------------------------------


def test_lexical_diversity_hand_computed(spark):
    from global_stock_data_warehouse_spark.operators.curation import (
        lexical_diversity,
    )

    rows = [
        (1, "x x x x", "a"),        # ttr 1/4 -> 250000 fx (low)
        (2, "a b c d", "a"),        # ttr 1   -> 1000000 fx
        (3, "", "b"),               # zero tokens -> excluded
        (4, "the the cat", "b"),    # ttr 2/3 -> 666666 fx
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in lexical_diversity(df, low_ttr=0.5).collect()}
    assert out["a"].n_docs == 2
    assert out["a"].mean_ttr == 0.625
    assert out["a"].low_diversity_share == 0.5
    assert out["b"].n_docs == 1
    assert out["b"].mean_ttr == 0.666666  # (2*1e6)//3 = 666666 fx
    assert out["b"].low_diversity_share == 0.0


def test_lexical_diversity_case_folding(spark):
    from global_stock_data_warehouse_spark.operators.curation import (
        lexical_diversity,
    )

    # tokenizer lowercases: "The the THE" is ONE type, three tokens
    df = spark.createDataFrame(
        [(1, "The the THE", "a")], "doc_id long, text string, source string"
    )
    r = lexical_diversity(df).collect()[0]
    assert r.mean_ttr == 0.333333
    assert r.low_diversity_share == 1.0


def test_lang_confusion_matrix(spark):
    from global_stock_data_warehouse_spark.operators.text import lang_confusion

    rows = [
        (1, "the cat and the dog", "en"),   # detected en -> match
        (2, "el la y los de", "en"),        # detected es -> MISMATCH cell
        (3, None, None),                    # und/und -> match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r.declared, r.detected): r for r in lang_confusion(df).collect()}
    assert out[("en", "en")].n_docs == 1 and out[("en", "en")].is_match == 1
    assert out[("en", "es")].n_docs == 1 and out[("en", "es")].is_match == 0
    assert out[("und", "und")].n_docs == 1 and out[("und", "und")].is_match == 1


def test_lang_confusion_marker_tie_is_deterministic(spark):
    from global_stock_data_warehouse_spark.operators.text import lang_confusion

    # "la" is a marker for BOTH es and fr (1 hit each): the greatest-of-
    # structs argmax must break the tie toward the alphabetically-LAST
    # code — fr — on every engine, every run. "the und" ties en/de the
    # same way (en wins). A declared tag matching the tie winner flags
    # is_match accordingly.
    df = spark.createDataFrame(
        [("la", "fr"), ("la", "es"), ("the und maschine", "de")],
        "text string, lang string",
    )
    out = {(r.declared, r.detected): r for r in lang_confusion(df).collect()}
    assert out[("fr", "fr")].n_docs == 1 and out[("fr", "fr")].is_match == 1
    assert out[("es", "fr")].n_docs == 1 and out[("es", "fr")].is_match == 0
    assert out[("de", "en")].n_docs == 1 and out[("de", "en")].is_match == 0
