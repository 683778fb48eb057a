#!/usr/bin/env python
"""Scale-slope harness: measure the ten heaviest operators at 1x/10x/100x
synthetic scale and check the wall-time / shuffle-byte growth against each
operator's documented complexity.

Why this exists: sf0.1 timings plus design arguments say "bucketed,
near-linear at 100 TB" — this harness MEASURES the slope. For each
operator we generate deterministic synthetic fixtures (expression-only,
no driver loops) whose 1x point matches the sf0.1 input volume, then run
the REAL operator at 1x/10x/100x and record wall seconds and total
shuffle-write bytes (from Spark's stage metrics REST API). The measured
exponent between the 10x and 100x points (log-ratio of times over
log-ratio of scales) is the empirical complexity — ~1.0 for the bucketed
ops, <= 1.5 for triangle counting (the O(m^1.5) wedge bound).

Fixture realism choices that keep the slopes honest:
- vocabulary grows WITH the corpus (Heaps'-law-style) so per-token
  document frequency stays constant — fixed vocab would densify every
  inverted-index block and misattribute quadratic candidate growth to
  the operator;
- near-dup pair density is constant (10% of docs form adjacent-id pairs)
  so the true-positive workload scales linearly;
- blocking keys scale in COUNT with constant expected block size (the
  documented discipline for record_linkage);
- graphs grow in nodes at constant average degree;
- semantic_dedup's n_cells scales ~n/2000 per its docstring (cell size
  constant — the published SemDeDup recipe).
- graph ops run with driver_max_edges=0: the size-gated driver twin would
  otherwise absorb the small scales and hide the DISTRIBUTED slope this
  harness exists to measure.

Usage:
  python tools/scale_slope.py                  # all ops, scales 1,10,100
  python tools/scale_slope.py --ops pagerank,k_core --scales 1,10
  python tools/scale_slope.py --md SCALE.md    # also rewrite the report

Writes one JSON line per (op, scale) to stdout and, with --md, the full
SCALE.md report table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

FIXTURE_ROOT = os.path.join(_REPO, ".scale_fixtures")

# 1x sizes ~= the sf0.1 input volumes of the covering bench queries.
BASE_DOCS = 5_000
BASE_VECS = 2_000
BASE_SBARS = 100_000
BASE_PEOPLE = 15_000
BASE_NODES = 5_000
AVG_DEG = 3  # directed edges per node => 3n edges, 6n after symmetrize
BASE_WIDE = 15_000  # ~ sf0.1 orders
BASE_BARS = 100_000  # 1000 symbols x 100 days (sf0.1 events volume)


def get_spark() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gsdw-scale-slope")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "20000")
        .getOrCreate()
    )


def shuffle_write_bytes(spark: SparkSession) -> int:
    """Total shuffle-write bytes across all completed stages so far (the
    harness diffs this around each run). Reads Spark's own REST metrics —
    the same numbers the UI's stage table shows."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return -1
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages?status=complete", timeout=30
            )
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


# ---------------------------------------------------------------------------
# fixture generators — deterministic, expression-only (no driver data)
# ---------------------------------------------------------------------------


def _tok(seed_col, i, vocab: int):
    return F.concat(
        F.lit("w"), F.pmod(F.xxhash64(seed_col * 97 + i), F.lit(vocab)).cast("string")
    )


def gen_docs(spark: SparkSession, n: int) -> DataFrame:
    """Corpus of n docs, 40 tokens each, vocab = 4n (Heaps-ish growth).
    10% of docs form adjacent-id near-dup pairs (ids 0,1 mod 10 share a
    seed; the odd member appends one unique token). Every third doc
    carries a fixed 8-token boilerplate suffix (the duplicated-span
    workload)."""
    vocab = 4 * n
    base = spark.range(n).withColumn(
        "seed",
        F.when(F.pmod("id", F.lit(10)) < 2, F.col("id") - F.pmod("id", F.lit(2))).otherwise(
            F.col("id")
        ),
    )
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(39)), lambda i: _tok(F.col("seed"), i, vocab)
    )
    boiler = " b0 b1 b2 b3 b4 b5 b6 b7"
    return base.select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array_join(toks, " "),
            F.when(F.pmod("id", F.lit(10)) == 1, F.concat(F.lit(" u"), F.col("id").cast("string"))).otherwise(F.lit("")),
            F.when(F.pmod("id", F.lit(3)) == 0, F.lit(boiler)).otherwise(F.lit("")),
        ).alias("text"),
    )


def gen_vecs(spark: SparkSession, n: int) -> DataFrame:
    """n embeddings, dim 16, uniform in [-1, 1); 10% adjacent-id exact
    duplicates (cosine 1.0) so the dedup workload is non-empty."""
    base = spark.range(n).withColumn(
        "seed",
        F.when(F.pmod("id", F.lit(10)) < 2, F.col("id") - F.pmod("id", F.lit(2))).otherwise(
            F.col("id")
        ),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("seed") * 16 + i), F.lit(2001)) - 1000) / 1000.0
        ).cast("float"),
    )
    return base.select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def gen_cvecs(spark: SparkSession, n: int) -> DataFrame:
    """CLUSTERED embeddings (how real embedding corpora look, and what
    LSH/IVF are built for): n/50 centroids (cluster size constant as the
    corpus grows), each vector = its centroid + 5% hash noise — intra-
    cluster cosines land near 1, inter-cluster spread out."""
    n_cent = max(4, n // 50)
    base = spark.range(n).withColumn("cent", F.pmod("id", F.lit(n_cent)))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("cent") * 16 + i), F.lit(2001)) - 1000) / 1000.0
            + (F.pmod(F.xxhash64(F.col("id") * 16 + i), F.lit(2001)) - 1000) / 20000.0
        ).cast("float"),
    )
    return base.select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def gen_sbars(spark: SparkSession, n: int) -> DataFrame:
    """POWER-LAW event stream for the skew harness: HALF of all events
    belong to user 0 (the hot key), the rest spread uniformly over
    n/200 cold users. Timestamps span one year at second granularity
    (hash-scattered), so gap>2d sessionization produces real session
    structure on both the hot and cold keys."""
    n_users = max(2, n // 200)
    base = spark.range(n).select(
        F.when(F.pmod("id", F.lit(2)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_users)))
        .alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200)  # 2024-01-01
            + F.pmod(F.xxhash64(F.col("id") + 7), F.lit(365 * 86400))
        ).alias("ts"),
        (F.pmod(F.xxhash64(F.col("id") + 13), F.lit(10000)) / 100.0).alias(
            "value"
        ),
    )
    return base


def gen_people(spark: SparkSession, n: int) -> DataFrame:
    """n structured records with a blocking key of constant expected block
    size 8 (key count scales with n) and 10% adjacent-id fuzzy-match pairs
    (edit distance 1)."""
    base = spark.range(n).withColumn(
        "seed",
        F.when(F.pmod("id", F.lit(10)) < 2, F.col("id") - F.pmod("id", F.lit(2))).otherwise(
            F.col("id")
        ),
    )
    name = F.concat(
        F.lit("nm"),
        F.pmod(F.xxhash64(F.col("seed") * 7 + 1), F.lit(100000)).cast("string"),
        F.lit("x"),
        F.pmod(F.xxhash64(F.col("seed") * 11 + 3), F.lit(10000)).cast("string"),
        F.when(F.pmod("id", F.lit(10)) == 1, F.lit("q")).otherwise(F.lit("")),
    )
    return base.select(
        F.col("id").alias("doc_id"),
        name.alias("name"),
        F.pmod(F.xxhash64(F.col("seed") * 3 + 5), F.lit(max(n // 8, 1))).alias("blk"),
    )


def gen_bars(spark: SparkSession, n_rows: int) -> DataFrame:
    """Daily OHLCV bar stream: n_rows/100 symbols x 100 days (scaling grows
    the SYMBOL UNIVERSE at fixed history depth — how a market warehouse
    actually grows). Every 20th symbol has a 21-day hole (exercises the
    gap gate + quarantine); prices positive."""
    days = 100
    base = spark.range(n_rows).select(
        (F.col("id") / days).cast("long").alias("symbol"),
        F.pmod("id", F.lit(days)).alias("day"),
        F.col("id").alias("event_id"),
    )
    val = (F.lit(1.0) + F.pmod(F.xxhash64("event_id"), F.lit(1000)) / 100.0).alias("v")
    d = F.date_add(F.lit("2024-01-01").cast("date"), F.col("day").cast("int"))
    return (
        base.select("symbol", "event_id", d.alias("date"), val)
        .filter(
            ~((F.pmod("symbol", F.lit(20)) == 0) & F.col("date").between("2024-02-01", "2024-02-21"))
        )
        .select(
            "symbol",
            "date",
            F.to_timestamp("date").alias("ts"),
            "event_id",
            F.col("v").alias("open"),
            F.col("v").alias("high"),
            F.col("v").alias("low"),
            F.col("v").alias("close"),
            F.col("v").alias("volume"),
        )
    )


def gen_edges(spark: SparkSession, n_nodes: int) -> DataFrame:
    """Directed random graph, AVG_DEG edges per node (constant degree as
    the node count grows), self-loops dropped."""
    m = n_nodes * AVG_DEG
    return (
        spark.range(m)
        .select(
            F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") * 2 + 2), F.lit(n_nodes)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def gen_wide(spark: SparkSession, n: int) -> DataFrame:
    """Wide keyed snapshot for the CDC harness: unique BIGINT pk + 12
    payload columns (~150B/row). Deterministic values derived from the
    pk so old/new slices with a fixed 1% churn can be carved by
    expression."""
    cols = [F.col("id").alias("pk")]
    for i in range(8):
        cols.append((F.xxhash64(F.col("id"), F.lit(i)) % 100000).alias(f"v{i}"))
    for i in range(4):
        cols.append(
            F.concat(F.lit(f"s{i}_"), (F.xxhash64(F.col("id"), F.lit(100 + i)) % 1000)).alias(f"s{i}")
        )
    return spark.range(n).select(*cols)


def fixture(spark: SparkSession, kind: str, scale: int) -> DataFrame:
    """Materialize (once) and read back the parquet fixture — reads, not
    in-memory lineage, so every run starts from a scan like the bench."""
    path = os.path.join(FIXTURE_ROOT, f"{kind}_x{scale}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        gen = {
            "docs": lambda: gen_docs(spark, BASE_DOCS * scale),
            "vecs": lambda: gen_vecs(spark, BASE_VECS * scale),
            "people": lambda: gen_people(spark, BASE_PEOPLE * scale),
            "edges": lambda: gen_edges(spark, BASE_NODES * scale),
            "bars": lambda: gen_bars(spark, BASE_BARS * scale),
            "sbars": lambda: gen_sbars(spark, BASE_SBARS * scale),
            "cvecs": lambda: gen_cvecs(spark, BASE_VECS * scale),
            "wide": lambda: gen_wide(spark, BASE_WIDE * scale),
        }[kind]
        gen().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# the ten operators under measurement
# ---------------------------------------------------------------------------


def _ops():
    from global_stock_data_warehouse_spark.operators import (
        classify,
        corpus,
        dedup,
        graph,
        similarity,
    )
    from global_stock_data_warehouse_spark.plans.wmy import wmy_pipeline

    def ngram_jaccard(spark, s):
        df = fixture(spark, "docs", s)
        return dedup.ngram_jaccard_pairs(df, n=2, threshold=0.5)

    def minhash(spark, s):
        df = fixture(spark, "docs", s)
        return dedup.minhash_neardup(df, threshold=0.5)

    def minhash_auto(spark, s):
        # bands=None: plan_lsh_bands derives the banding from the
        # threshold. At 0.5 the planner reproduces the hand default
        # (8x4 — identical plan, nothing to measure); 0.3 is the
        # planner's stress direction: 16 bands x 2 rows = double the
        # hand default's banded-row volume and the loosest buckets.
        df = fixture(spark, "docs", s)
        return dedup.minhash_neardup(df, threshold=0.3, bands=None)

    def dup_spans(spark, s):
        df = fixture(spark, "docs", s)
        return corpus.duplicate_spans(df, n=4, min_docs=2)

    def rm_spans(spark, s):
        df = fixture(spark, "docs", s)
        # hash_spans=True IS the 100 TB form this harness certifies
        return corpus.remove_duplicate_spans(df, n=4, min_count=2, hash_spans=True)

    def simhash(spark, s):
        df = fixture(spark, "docs", s)
        return dedup.simhash_neardup(df, max_hamming=6, strategy="chunk")

    def simhash_mi(spark, s):
        # the past-10M-docs scale path: 2x32-bit chunks + radius-1 balls
        # (Norouzi et al. CVPR'12) — key space 2^32/chunk, so bucket
        # occupancy stays << 1 at any measurable fixture size
        df = fixture(spark, "docs", s)
        return dedup.simhash_neardup(df, max_hamming=3, strategy="multi_index")

    def linkage(spark, s):
        df = fixture(spark, "people", s)
        return dedup.record_linkage(df, "name", ["blk"], max_distance=2)

    def keep_best(spark, s):
        # pairs -> components -> max_by winner election + verdict join,
        # over the same docs fixture (score = doc length proxy)
        df = fixture(spark, "docs", s).withColumn("n_chars", F.length("text"))
        pairs = dedup.ngram_jaccard_pairs(df, n=2, threshold=0.5)
        return graph.dedup_keep_best(df, pairs, score_col="n_chars")

    def components(spark, s):
        e = fixture(spark, "edges", s)
        return graph.connected_components(
            e, src="src", dst="dst", driver_max_edges=0
        )

    def kcore(spark, s):
        e = fixture(spark, "edges", s)
        return graph.k_core(e, k=3, driver_max_edges=0)

    def triangles(spark, s):
        e = fixture(spark, "edges", s)
        return graph.triangle_count(e, k=20)

    def prank(spark, s):
        e = fixture(spark, "edges", s)
        return graph.pagerank(e, max_iter=8, tol=0.0, driver_max_edges=0)

    def emb_neardup(spark, s):
        # CLUSTERED fixture: LSH's working regime (uniform random vectors
        # are its adversarial case — every bucket-mate is a false
        # candidate). strategy='lsh' pins ONE code path across scales;
        # planes/tables derive from the corpus count (occupancy-bounded).
        df = fixture(spark, "cvecs", s)
        return similarity.embedding_neardup(df, threshold=0.95, strategy="lsh")

    def ann_ivf(spark, s):
        df = fixture(spark, "cvecs", s)
        q = df.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding")
        )
        # n_cells ~ n/500 keeps cell size constant (IVF discipline)
        return similarity.ivf_topk(
            df, q, k=5, n_cells=max(16, (BASE_VECS * s) // 500), n_probe=4
        )

    def llm_gold(spark, s):
        # the documents-table flagship: gate -> dedup -> decontaminate ->
        # near-dup components -> leakage-safe split, one composed plan
        from global_stock_data_warehouse_spark.plans.llm_gold import (
            llm_gold_pipeline,
        )

        df = fixture(spark, "docs", s)
        return llm_gold_pipeline(df, eval_pred=F.col("doc_id") % 20 == 0)

    def funnel(spark, s):
        # dedup_funnel composition: exact dedup -> survivors checkpoint ->
        # near-dup components -> one summary row (mirrors q_dedup_funnel)
        from global_stock_data_warehouse_spark.operators.graph import dedup_groups

        df = fixture(spark, "docs", s)
        groups = dedup.dedup_exact(df)
        survivors = df.join(
            groups.select(F.col("keep_id").alias("doc_id")), "doc_id"
        ).localCheckpoint(eager=True)
        nd = dedup_groups(dedup.ngram_jaccard_pairs(survivors, threshold=0.2))
        exact_stats = groups.agg(
            F.count(F.lit(1)).alias("_groups"),
            F.sum("n_dups").cast("long").alias("_docs"),
        )
        nd_stats = nd.agg(
            F.coalesce(F.sum(F.col("group_size") - 1), F.lit(0))
            .cast("long")
            .alias("_nd_removed")
        )
        return exact_stats.crossJoin(F.broadcast(nd_stats))

    def contamination(spark, s):
        # contamination_report composition: n-gram decontaminate (docs) +
        # semantic decontaminate (vecs), left-joined per doc (mirrors
        # q_contamination_report). The eval side is FIXED at the 1x size
        # (250 docs / 100 vecs): a benchmark suite does not grow with the
        # training corpus — that is the operators' documented contract
        # (eval << train, eval broadcast/collected). Growing eval
        # proportionally instead makes the semantic BLAS pass O(n*eval)
        # = O(n^2) BY CONSTRUCTION (first measured here at wall exp 1.8,
        # 100x in 170s) — a workload-shape fact, not a plan defect; the
        # harness measures the contract shape.
        df = fixture(spark, "docs", s)
        emb = fixture(spark, "vecs", s)
        n_eval_docs, n_eval_vecs = BASE_DOCS // 20, BASE_VECS // 20
        ng = corpus.decontaminate(
            df.filter(F.col("doc_id") >= n_eval_docs),
            df.filter(F.col("doc_id") < n_eval_docs),
            n=5,
        )
        sem = similarity.semantic_decontaminate(
            emb.filter(F.col("vec_id") >= n_eval_vecs),
            emb.filter(F.col("vec_id") < n_eval_vecs),
            threshold=0.3,
        )
        ng2 = ng.select(
            "doc_id", "n_collisions", F.col("contaminated").alias("ngram_c")
        )
        sem2 = sem.select("vec_id", F.col("contaminated").alias("sem_c"))
        return ng2.join(sem2, ng2.doc_id == sem2.vec_id, "left").select(
            "doc_id",
            "n_collisions",
            (F.col("ngram_c") | F.coalesce("sem_c", F.lit(False))).alias(
                "any_contaminated"
            ),
        )

    def wmy_gold(spark, s):
        bars = fixture(spark, "bars", s)
        gold, _ = wmy_pipeline(
            bars,
            time_col="date",
            key_col="symbol",
            freqs=("W", "M"),
            gap_since="2024-01-01",
            max_gap_days=14,
            tiebreak_cols=("ts", "event_id"),
        )
        return gold

    def stream_ohlc(spark, s):
        # Structured Streaming over the SAME bars fixture: availableNow
        # drains the whole directory through the watermarked windowed
        # OHLC aggregate (state ~ symbols x open windows, bounded).
        from global_stock_data_warehouse_spark.streaming import pipeline as sp

        fixture(spark, "bars", s)  # ensure parquet exists
        path = os.path.join(FIXTURE_ROOT, f"bars_x{s}")
        stream = sp.read_bar_stream(
            spark,
            path,
            "symbol long, date date, ts timestamp, event_id long, "
            "open double, high double, low double, close double, volume double",
        )
        return sp.windowed_ohlc(
            stream, window="7 days", watermark="14 days", value_col="close"
        )

    def semdedup(spark, s):
        df = fixture(spark, "vecs", s)
        # n_cells ~ n/2000 keeps the per-cell quadratic term constant
        return similarity.semantic_dedup(
            df, threshold=0.95, n_cells=max(8, (BASE_VECS * s) // 2000)
        )

    def inc_dedup(spark, s):
        df = fixture(spark, "docs", s)
        store = dedup.fingerprint_store(df.filter(F.col("doc_id") % 3 == 0))
        return dedup.incremental_dedup(df.filter(F.col("doc_id") % 3 != 0), store)

    def dsir(spark, s):
        df = fixture(spark, "docs", s)
        # the DSIR shape: target sample stays FIXED SIZE while the raw
        # pool grows — the model fit must stay O(pool), never O(pool^2)
        target = df.filter(F.col("doc_id") < BASE_DOCS // 10)
        return corpus.dsir_weights(df.filter(F.col("doc_id") % 7 != 0), target)

    def packed(spark, s):
        df = fixture(spark, "docs", s)
        order = corpus.shard_shuffle(df, n_shards=64)
        return corpus.pack_token_sequences(df.join(order, "doc_id"), ctx_len=512)

    def pca(spark, s):
        from global_stock_data_warehouse_spark.operators.similarity import (
            pca_variance,
        )

        df = fixture(spark, "vecs", s)
        return pca_variance(df, k=8)

    def inc_minhash(spark, s):
        df = fixture(spark, "docs", s)
        store = dedup.minhash_store(df.filter(F.col("doc_id") % 3 == 0))
        return dedup.incremental_minhash_dedup(
            df.filter(F.col("doc_id") % 3 != 0), store, threshold=0.5
        )

    def bpe(spark, s):
        df = fixture(spark, "docs", s)
        # the trainable-at-100TB property under test: ONE corpus-sized
        # word agg, then every merge round runs on the word VOCABULARY.
        # max_words is the documented sampling lever — this fixture's
        # vocab grows ~4n (adversarial worst case; real corpora are
        # Zipf-bounded), so the capped form IS the scale configuration:
        # rounds run on a fixed 100k-word frame at every scale.
        merges, vocab = corpus.bpe_train(
            df, n_merges=32, min_count=2, max_words=100_000
        )
        return vocab

    _bpe_merges_1x: list = []

    def bpe_enc(spark, s):
        df = fixture(spark, "docs", s)
        if not _bpe_merges_1x:
            # fixed merge table (trained once at 1x) — encode is the op
            # under measurement, and its merge list size is scale-free
            m, _ = corpus.bpe_train(fixture(spark, "docs", 1), n_merges=32)
            _bpe_merges_1x.extend(m)
        return corpus.bpe_encode(df, list(_bpe_merges_1x))

    def kmeans_op(spark, s):
        df = fixture(spark, "cvecs", s)
        # driver_max_rows=None forces the DISTRIBUTED Lloyd path (the
        # driver twin is equivalence-tested separately)
        return similarity.kmeans(df, k=16, n_iter=6, driver_max_rows=None)

    def cbs(spark, s):
        df = fixture(spark, "cvecs", s)
        # DataComp shape: per-cluster cap FIXED while the corpus grows
        return similarity.cluster_balanced_sample(
            df, per_cluster=BASE_VECS // 32, k=16, n_iter=4
        )

    def tvote(spark, s):
        df = fixture(spark, "docs", s).withColumn(
            "source", F.pmod(F.col("doc_id"), F.lit(5)).cast("string")
        )
        return classify.token_vote_classify(df, vocab_size=2048)

    def shard(spark, s):
        df = fixture(spark, "docs", s)
        return corpus.shard_shuffle(df, n_shards=64)

    def tprep(spark, s):
        from global_stock_data_warehouse_spark.plans.training_prep import (
            training_prep_pipeline,
        )

        df = fixture(spark, "docs", s)
        return training_prep_pipeline(
            df, ctx_len=512, n_merges=16, n_shards=64, max_words=100_000
        )

    def _wide_snapshots(spark, s):
        df = fixture(spark, "wide", s)
        old = df.filter(F.pmod("pk", F.lit(997)) != 0)  # ~0.1% deletes
        new = df.filter(F.pmod("pk", F.lit(991)) != 0).withColumn(
            "v0",
            F.when(F.pmod("pk", F.lit(100)) == 0, F.col("v0") + 1).otherwise(
                F.col("v0")
            ),
        )  # ~1% updates, ~0.1% inserts
        return old, new

    def sdiff_plain(spark, s):
        from global_stock_data_warehouse_spark.operators import cdc

        old, new = _wide_snapshots(spark, s)
        return cdc.snapshot_diff(old, new, ["pk"])

    def sdiff_hashed(spark, s):
        from global_stock_data_warehouse_spark.operators import cdc

        old, new = _wide_snapshots(spark, s)
        return cdc.snapshot_diff_hashed(old, new, ["pk"])

    def linkpred(spark, s):
        e = fixture(spark, "edges", s)
        return graph.link_prediction(e, k=25, min_common=2)

    def bloomdecon(spark, s):
        # same contract shape as contamination: the eval side is FIXED at
        # the 1x size (a benchmark suite doesn't grow with the corpus);
        # the bitmap is constant m_bits regardless of scale, so the probe
        # side must stay a linear map-side scan.
        df = fixture(spark, "docs", s)
        ev = df.filter(F.col("doc_id") < BASE_DOCS // 20)
        return corpus.bloom_decontaminate(df.filter(F.col("doc_id") % 7 != 0), ev)

    def termchi2(spark, s):
        df = fixture(spark, "docs", s).withColumn(
            "source", F.pmod(F.col("doc_id"), F.lit(20)).cast("string")
        )
        return corpus.term_class_chi2(df, top_k=10, min_df=5)

    # maintain_agg's claim is O(|changes|), base-table-size-independent:
    # the changeset scales with s while the BASE AGGREGATE is held at its
    # 1x group cardinality. The diff feeding it is materialized in
    # `prepare` (untimed) so the measurement isolates the maintenance.
    _maint_cache: dict = {}

    def maint_prepare(spark, s):
        from global_stock_data_warehouse_spark.operators import cdc

        if s in _maint_cache:
            return _maint_cache[s][1]
        old, new = _wide_snapshots(spark, s)
        grp = F.pmod("pk", F.lit(10_000)).alias("g")
        base = (
            old.groupBy(grp)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("v0").cast("long")).alias("v0"),
            )
            .localCheckpoint(eager=True)
        )
        changes = cdc.snapshot_diff(
            old.withColumn("g", F.pmod("pk", F.lit(10_000))),
            new.withColumn("g", F.pmod("pk", F.lit(10_000))),
            ["pk"],
        ).localCheckpoint(eager=True)
        _maint_cache[s] = (base, changes)
        return changes

    def maint(spark, s):
        from global_stock_data_warehouse_spark.operators import cdc

        maint_prepare(spark, s)
        base, changes = _maint_cache[s]
        return cdc.maintain_agg(base, changes, ["g"], ["v0"], count_col="n_rows")

    # drift_alerts: the drift monitor's per-batch plan (batch agg + state
    # agg + few-groups join), measured outside the sink's checkpoint
    # plumbing. Batch AND ledger scale with s; groups stay constant (20),
    # matching a feed where batches grow but the source set doesn't.
    def drift(spark, s):
        from global_stock_data_warehouse_spark.streaming.pipeline import (
            drift_alerts,
        )

        bars = fixture(spark, "bars", s)
        batch = bars.select(
            F.pmod(F.col("symbol"), F.lit(20)).cast("string").alias("source"),
            (F.col("close") * 100).cast("long").alias("n_chars"),
        )
        cur = (
            batch.filter(
                F.col("source").isNotNull() & F.col("n_chars").isNotNull()
            )
            .groupBy(F.col("source").alias("grp"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("n_chars").cast("long")).alias("vsum"),
            )
        )
        # trailing ledger: 20 prior batches' worth of contributions
        state = (
            batch.withColumn(
                "_batch_id", F.pmod(F.col("n_chars"), F.lit(20))
            )
            .groupBy(F.col("source").alias("grp"), "_batch_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("n_chars").cast("long")).alias("vsum"),
            )
            .groupBy("grp")
            .agg(F.sum("n").alias("base_n"), F.sum("vsum").alias("base_vsum"))
        )
        return drift_alerts(cur, state, 0.25, 20, "source")

    def _asof_bars(spark, s):
        from global_stock_data_warehouse_spark.operators.joins import asof_join

        bars = fixture(spark, "bars", s)
        # weekly close per symbol = the right (dimension-ish) side; the
        # full bar stream asof-probes it
        wk = bars.groupBy(
            "symbol",
            F.date_add(
                F.col("date"),
                ((5 - F.dayofweek("date") + 7) % 7).cast("int"),
            ).alias("period_end"),
        ).agg(F.max("close").alias("bar_close"))
        return asof_join(
            bars.select("symbol", "event_id", "date", "close"),
            wk,
            on="symbol",
            left_ts="date",
            right_ts="period_end",
        )

    def _sess_agg(sess):
        return sess.groupBy("user_id", "session_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )

    def _sess_one_window(spark, s):
        from pyspark.sql import Window

        ev = fixture(spark, "sbars", s)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        is_new = F.when(gap.isNull() | (gap > 2 * 86400), 1).otherwise(0)
        sess = ev.withColumn(
            "session_id",
            F.sum(is_new).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        return _sess_agg(sess)

    def _sess_two_phase(spark, s):
        from global_stock_data_warehouse_spark.operators.timeseries import (
            sessionize_two_phase,
        )

        ev = fixture(spark, "sbars", s)
        return _sess_agg(sessionize_two_phase(ev, gap_sec=2 * 86400))

    def _with_source(df):
        # 64 constant sources as scale grows — the group-bounded shape
        # the mixture/quota claims are about
        return df.withColumn(
            "source", F.pmod(F.col("doc_id"), F.lit(64)).cast("string")
        )

    def _gopher(spark, s):
        from global_stock_data_warehouse_spark.operators.text import (
            gopher_quality_flags,
        )

        return gopher_quality_flags(fixture(spark, "docs", s))

    def _line_boiler(spark, s):
        from global_stock_data_warehouse_spark.operators.curation import (
            line_boilerplate_stats,
        )

        # sep=" " makes every token a segment: the worst-case segment
        # volume (40x the doc count) with Heaps vocab keeping per-segment
        # df constant
        return line_boilerplate_stats(fixture(spark, "docs", s), sep=" ", min_docs=3)

    def _novelty(spark, s):
        from global_stock_data_warehouse_spark.operators.curation import (
            novelty_timeline,
        )

        return novelty_timeline(fixture(spark, "docs", s), n_buckets=10)

    def _zipf(spark, s):
        from global_stock_data_warehouse_spark.operators.curation import zipf_slope

        return zipf_slope(fixture(spark, "docs", s), top_n=200)

    def _pricing_daily(spark, s):
        from global_stock_data_warehouse_spark.operators.timeseries import (
            daily_close,
        )

        bars = fixture(spark, "bars", s)
        return daily_close(
            bars,
            time_col="ts",
            key_col="symbol",
            value_col="close",
            tiebreak_cols=("ts", "event_id"),
        )

    def _split_adj(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            split_adjusted_prices,
        )

        return split_adjusted_prices(_pricing_daily(spark, s), key_col="symbol")

    def _amihud(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            amihud_illiquidity,
        )

        return amihud_illiquidity(
            fixture(spark, "bars", s),
            key_col="symbol",
            time_col="ts",
            value_col="close",
        )

    def _underwater(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            underwater_spells,
        )

        return underwater_spells(_pricing_daily(spark, s), key_col="symbol")

    def _tom(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            turn_of_month_effect,
        )

        return turn_of_month_effect(_pricing_daily(spark, s), key_col="symbol")

    def _lexdiv(spark, s):
        from global_stock_data_warehouse_spark.operators.curation import (
            lexical_diversity,
        )

        return lexical_diversity(_with_source(fixture(spark, "docs", s)))

    def _calcov(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            trading_calendar_coverage,
        )

        return trading_calendar_coverage(_pricing_daily(spark, s), key_col="symbol")

    def _volprof(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            volume_profile_by_hour,
        )

        return volume_profile_by_hour(
            fixture(spark, "bars", s),
            key_col="symbol",
            time_col="ts",
            value_col="close",
        )

    def _langconf(spark, s):
        from global_stock_data_warehouse_spark.operators.text import lang_confusion

        df = fixture(spark, "docs", s)
        # derive a declared-lang column the same way the source column is
        # derived for the grouped curation ops: constant cardinality
        df = df.withColumn(
            "lang",
            F.element_at(
                F.array(F.lit("en"), F.lit("es"), F.lit("de"), F.lit("fr")),
                (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"),
            ),
        )
        return lang_confusion(df)

    def _rank_ic(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            factor_rank_ic,
        )

        # the bars fixture grows the SYMBOL UNIVERSE at fixed history
        # depth, so the per-date cross-sectional rank window is exactly
        # the dimension that scales — the honest stress for this op
        return factor_rank_ic(_pricing_daily(spark, s), key_col="symbol")

    def _qgate(spark, s):
        from global_stock_data_warehouse_spark.operators.curation import (
            quality_percentile_gate,
        )

        return quality_percentile_gate(_with_source(fixture(spark, "docs", s)))

    def _packeff(spark, s):
        from global_stock_data_warehouse_spark.operators.corpus import (
            packing_efficiency,
        )

        return packing_efficiency(fixture(spark, "docs", s), ctx_len=512, n_shards=64)

    def _idxret(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            index_daily_return,
        )

        return index_daily_return(_pricing_daily(spark, s), key_col="symbol")

    def _overnight(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            overnight_intraday_split,
        )

        return overnight_intraday_split(
            fixture(spark, "bars", s),
            key_col="symbol",
            time_col="ts",
            value_col="close",
        )

    def _liq(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            liquidity_screen,
        )

        return liquidity_screen(
            fixture(spark, "bars", s),
            key_col="symbol",
            time_col="ts",
            value_col="close",
        )

    def _stale(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            stale_price_runs,
        )

        return stale_price_runs(_pricing_daily(spark, s), key_col="symbol", grid=2.0)

    def _beta(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            beta_vs_index,
        )

        return beta_vs_index(_pricing_daily(spark, s), key_col="symbol")

    def _decile(spark, s):
        from global_stock_data_warehouse_spark.operators.pricing import (
            decile_spread_backtest,
        )

        return decile_spread_backtest(_pricing_daily(spark, s), key_col="symbol")

    def _mixplan(spark, s):
        from global_stock_data_warehouse_spark.operators.corpus import (
            mixture_epoch_plan,
        )

        docs = _with_source(fixture(spark, "docs", s))
        return mixture_epoch_plan(
            docs, token_budget=10**9, weights={str(i): i + 1 for i in range(64)}
        )

    def _quota_split(spark, s):
        from global_stock_data_warehouse_spark.operators.corpus import (
            stratified_quota_split,
        )

        return stratified_quota_split(
            _with_source(fixture(spark, "docs", s)),
            quotas={"val": 10, "test": 10},
        )

    # (runner, expected exponent, what the expectation comes from)
    return {
        "ngram_jaccard_neardup": (ngram_jaccard, 1.0, "PPJoin prefix blocks, constant df/token"),
        "minhash_neardup": (minhash, 1.0, "banded LSH, constant pair density"),
        "minhash_autoband": (minhash_auto, 1.0, "plan_lsh_bands(0.3, 32) auto-banding: 16 bands x 2 rows (2x the hand default's band volume); must track the hand-banded slope"),
        "duplicate_spans": (dup_spans, 1.0, "span-count agg + top-k broadcast"),
        "remove_duplicate_spans": (rm_spans, 1.0, "hashed span shuffle + doc-keyed rebuild"),
        "record_linkage": (linkage, 1.0, "constant block size, block count ~ n"),
        "simhash_neardup": (simhash, 1.0, "4x16-bit chunk blocks; valid regime n << 10M (ceiling documented)"),
        "simhash_multi_index": (simhash_mi, 1.0, "Norouzi multi-index: 2x32-bit chunks + radius-1 balls, occupancy ~ 33n/2^32"),
        "dedup_components": (components, 1.0, "hash-to-min rounds ~ log(diameter)"),
        "dedup_keep_best": (keep_best, 1.0, "pairs + components + one map-side-combinable max_by election"),
        "k_core": (kcore, 1.0, "peeling rounds bounded by peel depth"),
        "triangle_count": (triangles, 1.5, "wedge volume O(m^1.5) worst case"),
        "pagerank": (prank, 1.0, "fixed 8 rounds x (dst,contrib) shuffle"),
        "semantic_dedup": (semdedup, 1.0, "cell count ~ n, cell size constant"),
        "wmy_gold_pipeline": (wmy_gold, 1.0, "one symbol-keyed exchange shared by gates+resamples"),
        "llm_gold_pipeline": (llm_gold, 1.0, "gate+dedup share one scan; eval grams + components broadcast; stage-wise linear"),
        "dedup_funnel": (funnel, 1.0, "exact groups agg + near-dup components over survivors; summary crossJoin is 1-row broadcast"),
        "contamination_report": (contamination, 1.0, "broadcast eval grams + map-only BLAS semantic pass; left join keyed on doc id"),
        "stream_windowed_ohlc": (stream_ohlc, 1.0, "availableNow drain; state ~ symbols x open windows"),
        "embedding_neardup_lsh": (emb_neardup, 1.0, "hyperplane buckets, constant dup density"),
        "incremental_dedup": (inc_dedup, 1.0, "md5 fp window + store probe share one hash partitioning"),
        "dsir_select": (dsir, 1.0, "two B-row bucket aggs + broadcast model over re-derived gram stream"),
        "ann_ivf_topk": (ann_ivf, 1.0, "cell count ~ n, probe fraction constant"),
        "bpe_train": (bpe, 1.0, "one corpus-sized word agg; 32 merge rounds on the CAPPED top-100k word frame (max_words, the documented sampling lever)", lambda spark, s: fixture(spark, "docs", s)),
        "bpe_encode": (bpe_enc, 0.0, "broadcast ranks, ONE map-only Arrow pass, zero shuffle by design", lambda spark, s: fixture(spark, "docs", s)),
        "kmeans_clusters": (kmeans_op, 0.0, "shuffle bounded: rounds x partitions x (k x dim) partial rows, independent of corpus rows", lambda spark, s: fixture(spark, "cvecs", s)),
        "cluster_balanced_sample": (cbs, 1.0, "kmeans rounds + one cluster-keyed count agg; md5 quota prune is map-only", lambda spark, s: fixture(spark, "cvecs", s)),
        "token_vote_classify": (tvote, 1.0, "broadcast vote table; one (doc,class) shuffle of |docs| x C"),
        "shard_shuffle": (shard, 1.0, "one hash shuffle on shard + within-shard sort, no global order"),
        "training_prep": (tprep, 1.0, "gate+dedup share one scan; BPE word agg + shard/pack exchanges all linear; rounds capped", lambda spark, s: fixture(spark, "docs", s)),
        "incremental_minhash": (inc_minhash, 1.0, "banded batch crosses once ((band,bucket) partitioning shared by store probe + self-join); constant dup density"),
        "packed_sequences": (packed, 1.0, "each token shuffles exactly once keyed (shard, seq_id); offsets are a narrow count cumsum"),
        "pca_variance": (pca, 0.0, "moment partials bounded: (d^2+d+1) rows per batch regardless of corpus rows", lambda spark, s: fixture(spark, "vecs", s)),
        "link_prediction": (linkpred, 1.0, "all-wedge volume ~ n*avg_deg^2: linear at constant degree (hub-cap is the documented lever when degree grows)"),
        "bloom_decontaminate": (bloomdecon, 1.0, "constant-size bitmap broadcast; probe is one map-side gram scan + (doc,bool) agg"),
        "term_chi2": (termchi2, 1.0, "one (class,term) shuffle; Heaps vocab keeps per-term df constant"),
        "snapshot_diff_plain": (sdiff_plain, 1.0, "full-outer join shuffles BOTH wide payloads — linear but wide (the comparison row for the hashed variant)"),
        "snapshot_diff_hashed": (sdiff_hashed, 1.0, "narrow (pk, hash) shuffle + broadcast-semi churn fetch: linear in ROWS, payload-width-independent"),
        "maintain_agg": (maint, 1.0, "O(|changes|): one changeset groupBy + one join against the FIXED base aggregate (diff materialized untimed in prepare)", maint_prepare),
        "asof_join_bars": (
            _asof_bars,
            1.0,
            "union + running-last window: ONE symbol-keyed shuffle, O(n log n) per key, zero range-join pair explosion",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "sessionize_one_window": (
            _sess_one_window,
            1.0,
            "single per-user window: the hot key serializes into ONE task — the skew COMPARISON row, expected to degrade",
            lambda spark, s: fixture(spark, "sbars", s),
        ),
        "sessionize_two_phase": (
            _sess_two_phase,
            1.0,
            "(user, 30d-bucket) heavy pass + per-user bucket-summary pass: per-task rows bounded by the hot key's events per bucket",
            lambda spark, s: fixture(spark, "sbars", s),
        ),
        "pps_weighted_sample": (
            lambda spark, s: __import__(
                "global_stock_data_warehouse_spark.operators.corpus",
                fromlist=["pps_systematic_sample"],
            ).pps_systematic_sample(
                fixture(spark, "docs", s), k=100, weight_col="doc_id"
            ),
            1.0,
            "per-stratum cumsum windows + 64-row broadcast offsets: one hash exchange, no global running sum",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "drift_alerts": (drift, 1.0, "two single-pass aggs (batch + ledger) + a |groups|-row join; groups constant as batches grow", lambda spark, s: fixture(spark, "bars", s)),
        "gopher_quality_flags": (
            _gopher,
            1.0,
            "map-only single scan, pure column expressions, ZERO shuffle at any scale",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "mixture_epoch_plan": (
            _mixplan,
            1.0,
            "one source-keyed agg with map-side combine (64 sources constant) + broadcast weight join: shuffle rows ~ tasks x sources, group-bounded",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "stratified_quota_split": (
            _quota_split,
            1.0,
            "one stratum-keyed window (64 strata): rank + count over n/64-row partitions, O(n log n) per stratum",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "line_boilerplate": (
            _line_boiler,
            1.0,
            "segment-fingerprint groupBy + join reuse one hash clustering; Heaps vocab keeps per-segment df constant (NEW r9)",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "novelty_timeline": (
            _novelty,
            1.0,
            "md5 first-occurrence window + 10-row bucket rollup; bucket edges from a broadcast min/max (NEW r9)",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "zipf_slope": (
            _zipf,
            1.0,
            "one term-count exchange + TakeOrderedAndProject(200); regression on <=200 rows (NEW r9)",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "split_adjusted_prices": (
            _split_adj,
            1.0,
            "one symbol-keyed exchange serves daily groupBy + lag + desc factor windows (NEW r9)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "amihud_illiquidity": (
            _amihud,
            1.0,
            "one symbol-keyed exchange: daily rollup + lag window + final agg; per-day ratio is map-side bigint div (NEW r10)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "underwater_spells": (
            _underwater,
            1.0,
            "one symbol-keyed exchange: running-max + change-flag run encoding + two group-bounded rollups (NEW r10)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "turn_of_month": (
            _tom,
            1.0,
            "symbol-keyed lag + (symbol,month) row_number windows; 3-row output agg is map-side combinable (NEW r10)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "lexical_diversity": (
            _lexdiv,
            1.0,
            "map-only token math + one group-bounded source agg with map-side combine (NEW r10)",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "calendar_coverage": (
            _calcov,
            1.0,
            "one symbol-keyed exchange + checkpointed calendar index + two broadcast equi-joins; NO range/NL join (NEW r10)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "volume_profile": (
            _volprof,
            1.0,
            "one 24-group agg with map-side combine + 24-row share window (NEW r10)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "lang_confusion": (
            _langconf,
            1.0,
            "pure-expression argmax + one |langs|^2-group agg with map-side combine (NEW r10)",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "factor_rank_ic": (
            _rank_ic,
            1.0,
            "symbol-keyed lag/lead + date-keyed rank windows: per-date partitions grow with the universe, O(n log n) per date (NEW r9)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "beta_vs_index": (
            _beta,
            1.0,
            "symbol-keyed lag window + group-bounded per-date index agg broadcast back; OLS sums map-side (NEW r9)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "decile_spread": (
            _decile,
            1.0,
            "symbol-keyed lag/lead + ONE date-keyed ntile window; same per-date O(n log n) shape as factor_rank_ic (NEW r9)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "quality_gate": (
            _qgate,
            1.0,
            "source-keyed rank windows (64 sources): O(n log n) per source partition, one exchange (NEW r9)",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "packing_efficiency": (
            _packeff,
            1.0,
            "count-only: md5 shard assignment + narrow (doc, count) join + 64-row rollup; no token ever shuffles (NEW r9)",
            lambda spark, s: fixture(spark, "docs", s),
        ),
        "index_daily_return": (
            _idxret,
            1.0,
            "symbol-keyed windows + group-bounded per-date rollup (dates constant as the universe grows) (NEW r9)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "overnight_intraday": (
            _overnight,
            1.0,
            "one symbol exchange: daily min_by/max_by agg + lag window + per-symbol rollup (NEW r9)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "liquidity_screen": (
            _liq,
            1.0,
            "symbol exchange for daily volumes + trailing frame; final ntile over ONE ROW PER SYMBOL (NEW r9)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
        "stale_price_runs": (
            _stale,
            1.0,
            "one symbol exchange: quantize + change-flag window + run rollup (NEW r9)",
            lambda spark, s: fixture(spark, "bars", s),
        ),
    }


def run(op_names, scales, md_path):
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    ops = _ops()
    results = {}  # (op, scale) -> dict
    for name in op_names:
        entry = ops[name]
        runner, expected, why = entry[:3]
        # eager ops (driver-loop trainers) declare a cheap `prepare` that
        # only materializes the fixture; lazy ops just run the builder
        prepare = entry[3] if len(entry) > 3 else runner
        for s in scales:
            # fixture built outside the timed window
            prepare(spark, s)
            spark.sparkContext.setJobGroup(f"{name}_x{s}", f"{name} at {s}x")
            sb0 = shuffle_write_bytes(spark)
            t0 = time.time()
            df = runner(spark, s)
            if df.isStreaming:
                import shutil
                import tempfile

                ckpt = tempfile.mkdtemp(prefix="_ckpt_", dir=FIXTURE_ROOT)
                q = (
                    df.writeStream.format("noop")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                shutil.rmtree(ckpt, ignore_errors=True)
            else:
                df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            sb1 = shuffle_write_bytes(spark)
            rec = {
                "op": name,
                "scale": s,
                "sec": round(wall, 2),
                "shuffle_mb": round((sb1 - sb0) / 1e6, 1) if sb0 >= 0 and sb1 >= 0 else None,
            }
            results[(name, s)] = rec
            print(json.dumps(rec), flush=True)
    spark.stop()
    if md_path:
        write_md(md_path, op_names, scales, results, ops)
    return results


def _slope(results, name, a, b, key):
    ra, rb = results.get((name, a)), results.get((name, b))
    if not ra or not rb or not ra.get(key) or not rb.get(key) or ra[key] <= 0 or rb[key] <= 0:
        return None
    return math.log(rb[key] / ra[key]) / math.log(b / a)


def write_md(path, op_names, scales, results, ops):
    lines = [
        f"# SCALE — measured scale slopes for the {len(op_names)} heaviest operators",
        "",
        "Produced by `tools/scale_slope.py` (see its docstring for fixture",
        "design). Each operator runs on synthetic fixtures whose 1x point",
        "matches the sf0.1 input volume; `exp(t)` is the measured wall-time",
        "exponent between the largest two scale points",
        "(log t-ratio / log scale-ratio; 1.0 = linear), `exp(shuffle)` the",
        "same for shuffle-write bytes. Graph ops run with",
        "`driver_max_edges=0` so the DISTRIBUTED path is what gets",
        "measured at every scale. Wall times at the 1x point are mostly",
        "fixed job overhead, so the 10x->100x segment carries the slope",
        "signal.",
        "",
        "| op | " + " | ".join(f"{s}x sec" for s in scales) + " | "
        + " | ".join(f"{s}x shMB" for s in scales)
        + " | exp(t) | exp(shuffle) | expected | why |",
        "| --- |" + " --- |" * (2 * len(scales) + 4),
    ]
    # slope needs two scale points; with one, emit '-' instead of crashing
    a, b = (scales[-2], scales[-1]) if len(scales) >= 2 else (None, None)
    for name in op_names:
        _, expected, why = ops[name][:3]
        secs = [results.get((name, s), {}).get("sec", "-") for s in scales]
        mbs = [results.get((name, s), {}).get("shuffle_mb", "-") for s in scales]
        et = _slope(results, name, a, b, "sec") if b is not None else None
        es = _slope(results, name, a, b, "shuffle_mb") if b is not None else None
        lines.append(
            "| {} | {} | {} | {} | {} | {} | {} |".format(
                name,
                " | ".join(str(x) for x in secs),
                " | ".join(str(x) for x in mbs),
                f"{et:.2f}" if et is not None else "-",
                f"{es:.2f}" if es is not None else "-",
                f"<= {expected}",
                why,
            )
        )
    lines.append("")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default=",".join(_ops_keys := [
        "ngram_jaccard_neardup", "minhash_neardup", "duplicate_spans",
        "remove_duplicate_spans", "record_linkage", "dedup_components",
        "k_core", "triangle_count", "pagerank", "semantic_dedup",
        "wmy_gold_pipeline",
    ]))
    ap.add_argument("--scales", default="1,10,100")
    ap.add_argument("--md", default=None)
    args = ap.parse_args()
    run(
        [o for o in args.ops.split(",") if o],
        [int(s) for s in args.scales.split(",")],
        args.md,
    )
