"""Driver-contract smoke: every queries() entry must run and produce a
stable schema; oracle_sql() keys must be a subset of queries() keys.

This is the cheap tripwire for contract breaks — full value parity vs the
DuckDB oracle runs in tools/check_correctness.py at sf0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs, f"oracles without queries: {oracles - qs}"
    # every non-oracle query is a documented approximate/sketch op
    approx_ok = {
        "minhash_neardup",
        "simhash_neardup",
        "simhash_multi_index",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "approx_distinct",
        "winnow_fingerprints",
        "embedding_neardup_lsh",
        "semantic_dedup",
        "pagerank",
        "ann_projected_topk",
        "k_core",
        "source_overlap_kmv",
        "bpe_vocab",
        "bpe_encode_stats",
        "kmeans_clusters",
        "cluster_balanced_sample",
        "training_prep",
        "pca_variance",
        "incremental_minhash",
        "bloom_decontaminate",
    }
    assert qs - oracles <= approx_ok, f"missing oracles: {qs - oracles - approx_ok}"


def test_oracled_queries_lead_the_dict():
    """The driver checks the FIRST 50 queries() entries: that window must
    be 100% oracled, and every oracled query must precede every rows-only
    one (oracled entries past 50 are verified locally by
    tools/check_correctness.py — still ahead of the approximate tail)."""
    qs = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    window = qs[:50]
    assert all(q in oracles for q in window), [q for q in window if q not in oracles]
    n_oracled = len(oracles)
    assert set(qs[:n_oracled]) == oracles, (
        f"oracled queries after rows-only ones: {oracles - set(qs[:n_oracled])}"
    )


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.columns == [
        "user_id", "period_end", "open", "high", "low", "close", "sum_value", "period_return",
    ]
    assert df.count() > 0


@pytest.mark.slow  # full-surface sweep (~2.5 min): the driver itself runs
# every declared query (bench + oracle steps) and the per-round
# CHECK_EXACT mirror artifacts cover the same ground; slow tier keeps it
# runnable standalone
def test_every_query_runs_at_sf0001(spark, sf_dir):
    failures = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            assert n >= 0 and len(df.columns) > 0
        except Exception as exc:  # collect all breaks, report once
            failures[name] = f"{type(exc).__name__}: {exc}"
    assert not failures, failures


@pytest.mark.slow  # full-surface sweep (~1.5 min): representative empty-
# input pins stay in tests/test_empty_mirror.py and the 155-query sweep
# is the committed tools/empty_sweep.py artifact (EMPTY_SWEEP_r11.json)
def test_every_query_is_total_on_empty_tables(spark, tmp_path, sf_dir):
    """Totality gate: all declared queries must run (returning 0+ rows,
    never raising) against schemally-identical but EMPTY input tables —
    the empty-partition / empty-source edge every production pipeline
    eventually feeds an operator."""
    src = sf_dir
    dst = str(tmp_path / "sf_empty")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        entrymod._t(spark, src, t).limit(0).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, dst).write.format("noop").mode("overwrite").save()
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(ex).__name__}: {str(ex).splitlines()[0][:90]}")
    assert not failures, "queries not total on empty input:\n" + "\n".join(failures)


def test_vector_and_text_queries_survive_null_cells(spark, tmp_path, sf_dir):
    """Null-robustness gate: the similarity/corpus queries must not crash
    when documents.text / embeddings.embedding contain NULLs (the
    malformed-upstream-row edge). Crash-only check — null-row semantics
    (drop) are asserted at the operator level."""
    from pyspark.sql import functions as F

    src = sf_dir
    dst = str(tmp_path / "sf_nulls")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        df = entrymod._t(spark, src, t)
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("text")),
            )
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 11 == 0, None).otherwise(F.col("embedding")),
            )
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    targets = [
        "ann_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_projected_topk",
        "embedding_neardup", "embedding_neardup_lsh", "semantic_dedup",
        "class_centroids", "quantize_embeddings", "centroid_outliers",
        "dedup_exact", "minhash_neardup", "text_stats", "remove_duplicate_spans",
    ]
    failures = []
    qs = entrymod.queries()
    for name in targets:
        try:
            qs[name](spark, dst).write.format("noop").mode("overwrite").save()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}")
    assert not failures, "queries crashed on null cells: " + ", ".join(failures)


def test_lang_marker_lists_match_oracle_stopwords():
    """r10: lang_confusion's oracle re-encodes the stopword marker lists
    as SQL literals (_STOP); if the engine's LANG_MARKERS ever drift from
    them the oracle would diverge silently — pin them equal."""
    from global_stock_data_warehouse_spark.operators.text import LANG_MARKERS

    assert {k: tuple(v) for k, v in LANG_MARKERS.items()} == {
        k: tuple(v) for k, v in entrymod._STOP.items()
    }
