"""Similarity search over embedding columns (array<float>).

Two tiers:

- **brute-force cosine top-k** (the exactness baseline): the query set is
  small by contract — it is broadcast to executors and each corpus
  partition is scored with one BLAS matmul inside ``mapInPandas`` (Arrow
  batches, no per-row Python). Each batch emits only its local top-k per
  query, so the final global top-k window sees k x partitions x queries
  rows, not |corpus| x |queries|.
- **LSH-bucketed (random hyperplane)**: corpus and queries hash to
  sign-pattern buckets (one matmul against a deterministic hyperplane
  matrix); only same-bucket pairs are scored. Sub-linear candidates at
  100 TB, recall tunable via plane count (fewer planes = bigger buckets).

Scalar expression helpers (``dot``/``l2_norm``/``cosine``) stay available
for composing cosine into plain DataFrame plans; the operators below use
numpy because per-pair ``zip_with`` folds materialize a 64-element array
per comparison — fine per row, ruinous across 10^7+ pairs.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# expression helpers (composable in pure DataFrame plans)
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (fold over zip_with; double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------


def _stack(series: pd.Series) -> np.ndarray:
    if len(series) == 0:  # np.stack raises on an empty list
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _vecs(df: DataFrame, vec_col: str) -> DataFrame:
    """Drop rows with a NULL vector — a null embedding cannot participate
    in any similarity computation, and np.stack would otherwise fail on
    the first null batch. Applied at every vector-operator entry so the
    policy is uniform (callers wanting to AUDIT nulls should count them
    upstream, e.g. via profile_table)."""
    return df.filter(F.col(vec_col).isNotNull())


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must carry (query_id_col, vec_col) and be small (it is
    collected and broadcast, like the build side of a broadcast join).
    Deterministic: ties broken by neighbor id.
    """
    spark = corpus.sparkSession
    q_rows = _vecs(queries, vec_col).select(query_id_col, vec_col).collect()
    if not q_rows:  # total on empty query sets: typed empty result
        return spark.createDataFrame(
            [], f"{query_id_col} long, rank int, neighbor_id long, cosine_sim double"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = _normalize(_stack(pd.Series([r[1] for r in q_rows])))
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = _normalize(_stack(pdf[vec_col])) @ mat_q.T  # |batch| x |q|
            for qi, qid in enumerate(ids_q):
                col = sims[:, qi]
                mask = c_ids != qid
                cand_ids, cand_sims = c_ids[mask], col[mask]
                if cand_ids.size == 0:
                    continue
                # local top-k: global top-k is a subset of batch top-ks
                take = min(k, cand_ids.size)
                idx = np.argpartition(-cand_sims, take - 1)[:take]
                yield pd.DataFrame(
                    {
                        query_id_col: qid,
                        "neighbor_id": cand_ids[idx],
                        "cosine_sim": np.round(cand_sims[idx], 6),
                    }
                )

    scored = _vecs(corpus, vec_col).select(id_col, vec_col).mapInPandas(
        score, schema=f"{query_id_col} long, neighbor_id long, cosine_sim double"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_sim")
    )


def _derive_n_blocks(n_docs: int, block_rows: int = 4096) -> int:
    """Blocks for the exact blocked all-pairs path, sized so one block is
    at most ``block_rows`` vectors — per-task score matrix is then bounded
    by block_rows^2 * 8 bytes (~134 MB at the 4096 default) regardless of
    corpus size. Parallelism (n_blocks*(n_blocks+1)/2 tasks) grows
    quadratically with corpus size, so big corpora saturate executors
    without any replication waste on small ones."""
    return max(1, -(-n_docs // block_rows))


def _derive_lsh_params(
    n: int,
    threshold: float,
    target_bucket_rows: int = 64,
    target_recall: float = 0.9,
    max_tables: int = 16,
    probe_bits: int = 0,
) -> tuple[int, int]:
    """Size the hyperplane LSH to the corpus: planes grow with log2(n) so
    EXPECTED BUCKET OCCUPANCY stays ~``target_bucket_rows`` (fixed planes
    mean buckets grow linearly with n and same-bucket candidate pairs grow
    QUADRATICALLY — the classic LSH scale mistake, caught by the r4 scale
    harness); tables grow to hold the design recall against the lower
    per-table collision rate (recall = 1-(1-p_eff)^tables with
    p = 1 - theta/pi, Charikar 2002), capped at ``max_tables``.

    ``probe_bits`` > 0 models multi-probe LSH (Lv et al., VLDB'07): the
    probe side also checks the buckets reached by flipping its
    ``probe_bits`` SMALLEST-|margin| sign bits, so a pair separated by
    exactly one disagreeing hyperplane can still collide. The
    exactly-one-mismatch mass is ``planes * p^(planes-1) * (1-p)``; a
    near pair's single disagreeing plane is overwhelmingly the
    smallest-margin one for both vectors, but we credit each probed bit
    only HALF that mass (conservative — validated by the recall-floor
    test, which measures well above the design floor) so derived table
    counts never overshoot recall downward."""
    planes = max(8, math.ceil(math.log2(max(n, 1) / target_bucket_rows)) if n > target_bucket_rows else 8)
    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    per_table = p**planes
    if per_table <= 0.0:
        # threshold <= -1.0 -> collision probability 0: the recall formula
        # divides by log(1 - per_table) == 0. A cosine threshold of -1
        # means "every pair matches" — not a near-dup query at all.
        raise ValueError(
            f"_derive_lsh_params: threshold={threshold} gives zero hyperplane "
            "collision probability; use a threshold in (-1, 1]."
        )
    if probe_bits > 0:
        one_mismatch = planes * p ** (planes - 1) * (1.0 - p)
        # geometric credit: bit 1 captures ~half the mass, each further
        # bit half of the remainder (margin ranking concentrates the
        # disagreeing plane in the first few probes)
        credit = one_mismatch * (1.0 - 0.5 ** min(probe_bits, 4))
        per_table = min(1.0, per_table + credit)
    if per_table >= 1.0:
        tables = 1
    else:
        tables = min(
            max_tables,
            max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - per_table))),
        )
    return planes, tables


def embedding_neardup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    strategy: str = "auto",
    exact_max_docs: int = 200_000,
    block_rows: int = 4096,
    dim: int | None = None,
    planes: int | None = None,
    tables: int | None = None,
    probe_bits: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b,
    round(cos, 6) >= threshold), physical strategy picked by corpus size.

    ``strategy='auto'`` runs a cheap planner-stats probe (``count()`` —
    parquet metadata, no scan) and dispatches, mirroring
    ``ngram_jaccard_pairs``'s auto-strategy:

    - at or below ``exact_max_docs``: the EXACT blocked all-pairs path
      (``strategy='exact'``) with ``n_blocks`` derived from the count so
      each block holds <= ``block_rows`` vectors — the O(n^2) score volume
      is affordable and per-task memory stays bounded as data grows;
    - above it: ``embedding_neardup_lsh`` (``strategy='lsh'``) — the
      sub-quadratic candidates-then-verify path, because at 100x corpus
      size exact all-pairs FLOPs (not memory — blocking already bounds
      that) become the wall. ``dim`` is probed from the first row when not
      given; ``planes``/``tables`` pass through.

    Explicit ``strategy='exact'``/``'lsh'`` skips the probe (callers who
    know their corpus, and the oracle harness which needs the exact form).
    """
    corpus = _vecs(corpus, vec_col)  # null vectors never participate
    if strategy == "auto":
        n_docs = corpus.count()
        strategy = "exact" if n_docs <= exact_max_docs else "lsh"
        if strategy == "exact" and n_blocks is None:
            # parallelism-floored block derivation (r12): pair count is the
            # matmul stage's parallelism, so small corpora get enough
            # blocks to occupy every core; at scale the memory bound
            # (block_rows) dominates and the count is unchanged
            from global_stock_data_warehouse_spark.operators.dedup import (
                _derive_pair_blocks,
            )

            n_blocks = _derive_pair_blocks(n_docs, block_rows, corpus.sparkSession)
        if strategy == "lsh" and (planes is None or tables is None):
            d_planes, d_tables = _derive_lsh_params(
                n_docs, threshold, probe_bits=probe_bits or 0
            )
            planes = d_planes if planes is None else planes
            tables = d_tables if tables is None else tables
    if strategy == "lsh":
        if dim is None:
            first = corpus.select(F.size(F.col(vec_col))).first()
            if first is None:  # empty corpus: no pairs
                return corpus.sparkSession.createDataFrame(
                    [], "id_a long, id_b long, cosine_sim double"
                )
            dim = first[0]
        return embedding_neardup_lsh(
            corpus, threshold, dim, id_col, vec_col, planes, tables,
            probe_bits=probe_bits,
        )
    if strategy != "exact":
        raise ValueError(f"unknown strategy {strategy!r} (auto|exact|lsh)")
    return _embedding_neardup_exact(
        corpus, threshold, id_col, vec_col, n_blocks if n_blocks is not None else 8
    )


def _embedding_neardup_exact(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (id_a < id_b,
    round(cos, 6) >= threshold) — fully distributed, NO driver collect.

    Blocked all-pairs: every vector hashes to one of ``n_blocks`` blocks;
    ONE shuffle packs each block's (id, vec) structs into a single row;
    the n*(n+1)/2 upper-triangle block pairs are formed by an explode +
    equi-join of the packed rows and ROUND-ROBIN repartitioned one pair
    per task (r12: pair rows are tiny in bytes but carry the stage's
    whole quadratic FLOP volume — the shape AQE's byte-based coalescing
    mis-sizes; the former per-row replication join + applyInPandas
    grouping also paid two pickled-``createDataFrame`` broadcast builds
    per run, ~0.7 s each, now zero). Each task computes ONE |A| x |B|
    BLAS matmul, emitting only above-threshold pairs. Per-task memory is
    O((block_rows)^2) scores — ``embedding_neardup`` derives n_blocks so
    a block fits executor memory; the O(n^2) score count is inherent to
    EXACT all-pairs (for sub-quadratic scale use
    ``embedding_neardup_lsh``, which trades recall for candidates).
    """
    src = _vecs(corpus, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    blocks = (
        src.withColumn("blk", F.pmod(F.hash(F.col("id")), F.lit(n_blocks)).cast("int"))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("id", "vec")).alias("docs"))
        # both sides of the block-pair join read this (tiny: <= n_blocks
        # rows of packed arrays); cut so the pack shuffle runs once
        .localCheckpoint(eager=True)
    )
    lhs = blocks.select(
        F.col("blk").alias("blk_a"),
        F.col("docs").alias("docs_a"),
        F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1))).alias("blk_b"),
    )
    n_pairs = n_blocks * (n_blocks + 1) // 2
    block_pairs = (
        lhs.join(
            blocks.select(F.col("blk").alias("blk_b"), F.col("docs").alias("docs_b")),
            "blk_b",
        )
        .select("blk_a", "blk_b", "docs_a", "docs_b")
        # round-robin: one compute-heavy pair row per task (hashing the
        # pair key would collide pairs onto shared tasks — guide §2.5)
        .repartition(n_pairs)
    )

    def unpack(docs) -> tuple[np.ndarray, np.ndarray]:
        ids = np.fromiter((d["id"] for d in docs), dtype=np.int64, count=len(docs))
        return ids, _normalize(np.stack([np.asarray(d["vec"], dtype=np.float64) for d in docs]))

    def run(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                # each unordered cross-block pair {x, y} meets in EXACTLY
                # one pair row (min(bx,by), max(bx,by)), so emitting every
                # above-threshold hit with (min_id, max_id) yields each
                # pair once; diagonal rows self-pair (id_a < id_b dedups)
                diag = row["blk_a"] == row["blk_b"]
                a_ids, a_mat = unpack(row["docs_a"])
                if diag:
                    b_ids, b_mat = a_ids, a_mat
                else:
                    b_ids, b_mat = unpack(row["docs_b"])
                if a_ids.size == 0 or b_ids.size == 0:
                    continue
                sims = a_mat @ b_mat.T
                rounded = np.round(sims, 6)
                mask = rounded >= threshold
                if diag:
                    mask &= a_ids[:, None] < b_ids[None, :]
                ai, bj = np.nonzero(mask)
                if ai.size == 0:
                    continue
                yield pd.DataFrame(
                    {
                        "id_a": np.minimum(a_ids[ai], b_ids[bj]),
                        "id_b": np.maximum(a_ids[ai], b_ids[bj]),
                        "cosine_sim": rounded[ai, bj],
                    }
                )

    return block_pairs.mapInPandas(
        run, schema="id_a long, id_b long, cosine_sim double"
    )


def embedding_neardup_lsh(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
    tables: int | None = None,
    carry_vectors: bool | None = None,
    carry_max_bytes: int = 256 << 20,
    probe_bits: int | None = None,
) -> DataFrame:
    """APPROXIMATE near-dup pairs: LSH-bucketed candidate generation +
    exact cosine verify — the sub-quadratic scale path.

    ``tables`` independent hyperplane tables (different seeds) each bucket
    the corpus; candidates are same-bucket pairs in ANY table (union +
    distinct), verified with the exact zip_with cosine and thresholded.
    Recall ~= 1 - (1 - p^planes)^tables with p = 1 - theta/pi; more tables
    -> higher recall, more candidates. Candidate volume is sum of squared
    bucket sizes — sub-quadratic ONLY if bucket occupancy is bounded, so
    when ``planes``/``tables`` are not given they are DERIVED from a
    corpus-count probe (``_derive_lsh_params``): planes ~ log2(n/256)
    keeps expected bucket size flat as the corpus grows (a fixed plane
    count silently re-quadratizes candidates at 100x — measured by the r4
    scale harness before this fix), and tables grow to hold ~0.9 design
    recall against the lower per-table collision rate.

    All ``tables`` bucket ids are computed in ONE Arrow pass (one matmul
    against the stacked hyperplanes of every table) and exploded to
    (table, bucket) rows — not one corpus scan + Python kernel per table;
    the self-join key is (table, bucket), so tables cannot cross-match.

    Candidate-row layout is stats-dispatched (``carry_vectors``, auto by
    EXPECTED CANDIDATE BYTES, not corpus count): tiny candidate sets keep
    the vectors RIDING the candidate join — the two fetch joins would be
    pure fixed overhead — while everything else shrinks candidates to
    (id_a, id_b) ONLY (16 bytes) through the bucket join and cross-table
    dedup, fetching vectors AFTER dedup (broadcast fetch while the vector
    frame fits, shuffle-hash past that — never sort-merge, which would
    sort the candidate stream twice). Carrying both vectors through the
    candidate shuffle multiplied its width ~10x at the 100x harness point
    (measured 27 GB -> 1.2 GB). The dispatch estimate is the uniform-
    bucket lower bound ``tables * n^2 / 2^planes`` pairs x both vectors'
    width vs ``carry_max_bytes``. The 256 MiB default is MEASURED, not
    assumed (tools/lsh_crossover.py -> LSH_CROSSOVER.json, r8): sweeping
    n = 2k..32k at derived params, the carried layout wins wall while
    expected candidate bytes stay under ~1-2 GB (8k vectors: 1.97 s /
    242 MB carried vs 2.86 s / 23 MB narrow) and loses decisively past
    it (32k: 14.0 s / 2.5 GB carried vs 9.3 s / 252 MB narrow) — the
    two fetch joins are a ~0.5-1 s fixed cost that tiny candidate sets
    should never pay (the r7 4 MiB cap sent the sf0.1 bench query,
    136 MB expected, down the narrow path and regressed its wall
    1.6 -> 3.4 s to save a 46 MB shuffle). 256 MiB sits ~4-8x below the
    measured wall crossover because the estimate is a LOWER bound: real
    bucket skew only ever INCREASES candidate volume over it, so the
    margin errs toward the narrow layout — the safe side. The 100x
    harness point (27 GB expected) stays narrow under any sane cap.

    MULTI-PROBE (``probe_bits``, Lv et al. VLDB'07 adapted to hyperplane
    signs): besides its own bucket, the probe side of the candidate join
    also posts the buckets reached by flipping its ``probe_bits``
    SMALLEST-|margin| sign bits — the bits a true neighbor is most
    likely to disagree on. Each probed bit raises per-table recall (the
    exactly-one-mismatch collision mass, credited conservatively in
    ``_derive_lsh_params``), so the DERIVED table count shrinks
    (8 -> 4 at 200k vectors, 10 -> 5 at 600k).

    DEFAULT OFF FOR THIS SELF-JOIN — measured, not assumed: in a
    SELF-join both sides scale with n, so expanding the probe side
    multiplies per-(table,bucket) candidate pairs by the expansion
    factor squared-ish (exact o x probe 2o = 2o^2 vs o^2/2 for the
    id-ordered base join); halving the tables only halves that back.
    The r5 harness measured the probed default at the 100x point:
    2335.5 MB shuffle / 87.0 s vs 1194.6 MB / 69.1 s for the base
    scheme — a 2x shuffle REGRESSION, so the derived-path default stays
    ``probe_bits=0``. The trade DOES pay where expansion is asymmetric —
    a small query side against a large indexed corpus (``lsh_topk``):
    probing multiplies only the tiny query side while the corpus-side
    emission (the dominant term) halves with the table count. Recall
    effects are validated either way by
    tests/test_dedup_similarity.py::test_lsh_multi_probe_superset_and_fewer_tables.
    With probing the pair canonicalization moves AFTER the join (probe
    sets are per-vector, not symmetric, so both directions must be
    joinable; cosine is symmetric, so the unswapped vector columns
    still verify correctly).
    """
    if probe_bits is None:
        probe_bits = 0  # self-join: probing measured as a shuffle loss
    n = None
    if planes is None or tables is None:
        n = corpus.count()
        d_planes, d_tables = _derive_lsh_params(n, threshold, probe_bits=probe_bits)
        planes = d_planes if planes is None else planes
        tables = d_tables if tables is None else tables

    def add_buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hps = [_hyperplanes(planes, dim, seed=42 + t) for t in range(tables)]
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _stack(pdf[vec_col])
            out = pdf.copy()
            bases, probes = [], []
            for hp in hps:
                scores = mat @ hp.T
                signs = scores >= 0
                weights = 1 << np.arange(hp.shape[0], dtype=np.int64)
                base = (signs.astype(np.int64) * weights).sum(axis=1)
                bases.append(base)
                if probe_bits > 0:
                    # q smallest-|margin| bits per row, flipped one at a time
                    order = np.argsort(np.abs(scores), axis=1)[:, :probe_bits]
                    variants = [base] + [
                        base ^ (np.int64(1) << order[:, j].astype(np.int64))
                        for j in range(order.shape[1])
                    ]
                    probes.append(np.stack(variants, axis=1))
            out["buckets"] = list(np.stack(bases, axis=1).tolist())
            if probe_bits > 0:
                out["probes"] = [
                    [list(tbl) for tbl in row]
                    for row in np.stack(probes, axis=1).tolist()
                ]
            yield out

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    src = _vecs(corpus, vec_col).select(id_col, vec_col)
    fields = list(src.schema.fields) + [StructField("buckets", ArrayType(LongType()))]
    if probe_bits > 0:
        fields.append(StructField("probes", ArrayType(ArrayType(LongType()))))
    schema = StructType(fields)
    if carry_vectors is None:
        if n is None:
            n = src.count()
        exp_pairs = tables * n * n / float(1 << min(planes, 62))
        carry_vectors = exp_pairs * 2 * (16 + 4 * dim) <= carry_max_bytes
    bucketed = src.mapInPandas(add_buckets, schema=schema)
    if probe_bits > 0:
        # bucketed is consumed by BOTH join sides; cut the kernel lineage
        bucketed = bucketed.localCheckpoint(eager=True)

    def _candidates(keep_vec: bool) -> DataFrame:
        """(id_a, id_b [, _va, _vb]) canonicalized candidate pairs."""
        vcols_a = [F.col(vec_col).alias("_va")] if keep_vec else []
        vcols_b = [F.col(vec_col).alias("_vb")] if keep_vec else []
        ex = bucketed.select(
            F.col(id_col).alias("id_a"), *vcols_a,
            F.posexplode("buckets").alias("tbl", "bucket"),
        )
        if probe_bits == 0:
            # symmetric base-base join: id_a < id_b INSIDE the join keeps
            # each unordered pair once — no post-join canonicalization
            pr = bucketed.select(
                F.col(id_col).alias("id_b"), *vcols_b,
                F.posexplode("buckets").alias("tbl", "bucket"),
            )
            return (
                ex.join(pr, ["tbl", "bucket"])
                .filter(F.col("id_a") < F.col("id_b"))
                .drop("tbl", "bucket")
                .dropDuplicates(["id_a", "id_b"])
            )
        pr = (
            bucketed.select(
                F.col(id_col).alias("id_b"), *vcols_b,
                F.posexplode("probes").alias("tbl", "pvals"),
            )
            .select("id_b", *(["_vb"] if keep_vec else []), "tbl",
                    F.explode("pvals").alias("bucket"))
        )
        # probe sets are asymmetric: (a,b) may only be reachable as
        # exact(a) in probes(b) — join both orders, canonicalize after.
        # cosine is symmetric, so _va/_vb need no swap.
        return (
            ex.join(pr, ["tbl", "bucket"])
            .filter(F.col("id_a") != F.col("id_b"))
            .drop("tbl", "bucket")
            .withColumn("_lo", F.least("id_a", "id_b"))
            .withColumn("_hi", F.greatest("id_a", "id_b"))
            .drop("id_a", "id_b")
            .withColumnsRenamed({"_lo": "id_a", "_hi": "id_b"})
            .dropDuplicates(["id_a", "id_b"])
        )

    if carry_vectors:
        # small-corpus layout: vectors ride the candidate join (candidate
        # volume is tiny; separate fetch joins would be pure overhead)
        joined = _candidates(keep_vec=True)
    else:
        dedup = _candidates(keep_vec=False)
        if n is None:
            n = src.count()
        vec_bytes = n * (16 + 4 * dim)
        fetch = "broadcast" if vec_bytes <= (256 << 20) else "shuffle_hash"
        va = src.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")).hint(fetch)
        vb = src.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")).hint(fetch)
        joined = dedup.join(va, "id_a").join(vb, "id_b")
    return (
        joined.withColumn(
            "cosine_sim", F.round(cosine(F.col("_va"), F.col("_vb")), 6)
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# LSH: random-hyperplane sign buckets
# ---------------------------------------------------------------------------


def _hyperplanes(planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic hyperplane matrix — regenerated identically on every
    executor from the seed; nothing to ship."""
    return np.random.default_rng(seed).standard_normal((planes, dim))


def _bucket_of(mat: np.ndarray, hp: np.ndarray) -> np.ndarray:
    signs = (mat @ hp.T) >= 0  # |rows| x planes
    weights = (1 << np.arange(hp.shape[0], dtype=np.int64))
    return (signs.astype(np.int64) * weights).sum(axis=1)


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    planes: int = 10,
    vec_col: str = "embedding",
    out_col: str = "bucket",
    seed: int = 42,
) -> DataFrame:
    """Attach the sign-pattern LSH bucket id (bigint) to every row."""

    def add_bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hp = _hyperplanes(planes, dim, seed)
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf.copy()
            out[out_col] = _bucket_of(_stack(pdf[vec_col]), hp)
            yield out

    # Fresh StructType: StructType.add() mutates in place, and mutating
    # df.schema's cached object corrupts df.columns.
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])
    return df.mapInPandas(add_bucket, schema=schema)


def with_lsh_probe_buckets(
    df: DataFrame,
    dim: int,
    planes: int = 10,
    vec_col: str = "embedding",
    out_col: str = "buckets",
    seed: int = 42,
    probe_bits: int = 2,
) -> DataFrame:
    """Attach the multi-probe bucket SET (array<bigint>): the sign bucket
    plus the buckets reached by flipping each of the ``probe_bits``
    smallest-|margin| bits (Lv et al., VLDB'07) — the buckets a true
    neighbor most plausibly landed in. Meant for the QUERY side of an
    asymmetric candidate join (``lsh_topk``): expanding the tiny side
    buys per-table recall without growing the corpus-side index."""

    def add_buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hp = _hyperplanes(planes, dim, seed)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _stack(pdf[vec_col])
            scores = mat @ hp.T
            weights = 1 << np.arange(hp.shape[0], dtype=np.int64)
            base = ((scores >= 0).astype(np.int64) * weights).sum(axis=1)
            q = min(probe_bits, hp.shape[0])
            order = np.argsort(np.abs(scores), axis=1)[:, :q]
            variants = [base] + [
                base ^ (np.int64(1) << order[:, j].astype(np.int64))
                for j in range(q)
            ]
            out = pdf.copy()
            out[out_col] = list(np.stack(variants, axis=1).tolist())
            yield out

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(LongType()))]
    )
    return df.mapInPandas(add_buckets, schema=schema)


# ---------------------------------------------------------------------------
# IVF: inverted-file index with a sample-trained coarse quantizer
# ---------------------------------------------------------------------------


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 4096,
) -> np.ndarray:
    """Spherical k-means centroids trained on a bounded deterministic
    sample (hash-ordered, like FAISS's train-on-sample IVF practice —
    coarse quantizers don't need the full corpus, so training cost is
    O(sample) regardless of corpus scale). Returns a normalized
    (n_cells, dim) matrix."""
    rows = (
        _vecs(corpus, vec_col).select(id_col, vec_col)
        .orderBy(F.pmod(F.hash(F.col(id_col)), F.lit(1 << 31)), F.col(id_col))
        .limit(sample_cap)
        .collect()
    )
    mat = _normalize(_stack(pd.Series([r[1] for r in rows])))
    if mat.shape[0] == 0:  # empty corpus: no centroids (callers guard)
        return mat
    cents = mat[: min(n_cells, len(rows))].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def with_ivf_cell(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Attach the nearest-centroid cell id — one matmul per Arrow batch."""
    bc = df.sparkSession.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf.copy()
            out[out_col] = np.argmax(
                _normalize(_stack(pdf[vec_col])) @ cents.T, axis=1
            ).astype(np.int64)
            yield out

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])
    return df.mapInPandas(assign, schema=schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int = 4,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: score only corpus vectors whose cell is among
    each query's ``n_probe`` nearest centroids. With n_probe == n_cells
    this is EXACTLY brute force (the test exploits that); smaller n_probe
    trades recall for a 1/(n_cells/n_probe) scan fraction. The cell column
    doubles as a partition key at rest: a corpus stored partitioned by
    cell turns each probe into partition pruning instead of a filter.

    ``n_cells=None`` derives ~sqrt(n) cells from a corpus-count probe
    (the FAISS sizing rule, clamped to [16, 65536]): a FIXED cell count
    scans a fixed FRACTION of the corpus per probe — linear but wasteful
    at 100x — while sqrt sizing keeps the probed row count ~n_probe*sqrt(n),
    sublinear in corpus size (same defect family as the fixed-planes LSH
    the r4 harness caught, here a constant factor rather than quadratic).
    """
    # collect the (small-by-contract) query side FIRST: an empty query set
    # must not pay the corpus-wide centroid-training job
    q_rows = _vecs(queries, vec_col).select(query_id_col, vec_col).collect()
    empty = f"{query_id_col} long, rank int, neighbor_id long, cosine_sim double"
    if not q_rows:
        return corpus.sparkSession.createDataFrame([], empty)
    if n_cells is None:
        n_cells = int(min(65536, max(16, round(math.sqrt(corpus.count())))))
    cents = train_centroids(corpus, n_cells, iters, id_col, vec_col)
    if cents.shape[0] == 0:  # empty corpus
        return corpus.sparkSession.createDataFrame([], empty)
    assigned = with_ivf_cell(_vecs(corpus, vec_col).select(id_col, vec_col), cents, vec_col)

    q_mat = _normalize(_stack(pd.Series([r[1] for r in q_rows])))
    order = np.argsort(-(q_mat @ cents.T), axis=1)[:, : min(n_probe, cents.shape[0])]
    probe_rows = [
        (int(r[0]), [float(x) for x in r[1]], [int(c) for c in cells])
        for r, cells in zip(q_rows, order)
    ]
    probes = corpus.sparkSession.createDataFrame(
        probe_rows, f"{query_id_col} long, _qvec array<double>, _cells array<bigint>"
    ).select(query_id_col, "_qvec", F.explode("_cells").alias("cell"))

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_sim")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    probe_bits: int = 2,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket(s). At scale run multiple tables (different seeds) and union.

    MULTI-PROBE (Lv et al., VLDB'07): the query side also probes the
    buckets reached by flipping its ``probe_bits`` smallest-|margin|
    sign bits. THIS is the asymmetric shape where probing pays (unlike
    the self-join ``embedding_neardup_lsh``, where it measured as a 2x
    shuffle loss — see that docstring): the corpus-side index emission
    (the term that scales with n) is untouched; only the tiny broadcast
    query side fans out, and each probe bucket recovers neighbors a
    single-bucket lookup misses — recall-floor-tested at a higher floor
    than the unprobed r4 path sustained. ``probe_bits=0`` restores the
    single-bucket behavior."""
    cb = with_lsh_bucket(_vecs(corpus, vec_col).select(id_col, vec_col), dim, planes, vec_col, "bucket", seed)
    q_src = _vecs(queries, vec_col).select(query_id_col, vec_col)
    if probe_bits > 0:
        qb = (
            with_lsh_probe_buckets(
                q_src, dim, planes, vec_col, "buckets", seed, probe_bits
            )
            .select(
                query_id_col,
                F.col(vec_col).alias("_qvec"),
                F.explode("buckets").alias("bucket"),
            )
            .dropDuplicates([query_id_col, "bucket"])
        )
    else:
        qb = with_lsh_bucket(
            q_src, dim, planes, vec_col, "bucket", seed
        ).select(query_id_col, F.col(vec_col).alias("_qvec"), "bucket")
    candidates = cb.join(F.broadcast(qb), "bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    if probe_bits > 0:
        # a corpus vector can sit in several probed buckets of one query;
        # with probe_bits=0 each (query, corpus) pair collides at most
        # once, so the dedup would only add a full-stream exchange
        candidates = candidates.dropDuplicates([query_id_col, id_col])
    scored = (
        candidates
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_sim")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    chunk_rows: int = 2048,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster embeddings with the sample-trained spherical k-means coarse
    quantizer, then WITHIN each cluster greedily drop every item whose
    cosine to any lower-id item of the same cluster reaches ``threshold``
    (min-id representative survives — the same keep-first convention as
    ``dedup_exact``/``paragraph_dedup``, chain semantics included).

    Returns ``(id_col, cell, max_prev_sim, keep)`` for every input row —
    callers semi-join ``keep`` to filter their corpus.

    Scale design: the cell assignment is one broadcast matmul per Arrow
    batch; the pairwise pass runs per-cell via ``applyInPandas``, so the
    shuffle key is the cell id and the quadratic term is bounded by the
    largest CELL, not the corpus — with n_cells scaled ~n/5k the per-task
    cost stays flat as the corpus grows (the published recipe: SemDeDup
    uses k=11k clusters for LAION-440M). The in-task matmul runs in
    ``chunk_rows`` row blocks so memory is O(chunk x cell), not O(cell^2).
    Near-dups that land in DIFFERENT cells are missed — the documented
    recall trade every clustered semantic-dedup makes; raise n_cells'
    sibling knob (train quality) or run the exact ``embedding_neardup``
    below its size ceiling when that matters.
    """
    if centroids is None:
        if n_cells is None:
            # SemDeDup sizing (docstring): cells ~ n/2000 keeps the
            # per-cell quadratic term constant as the corpus grows — a
            # FIXED cell count re-quadratizes the within-cell pass.
            n_cells = max(8, corpus.count() // 2000)
        centroids = train_centroids(
            corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col
        )
    elif n_cells is None:
        n_cells = centroids.shape[0] or 1
    if centroids.shape[0] == 0:  # empty corpus: typed empty result
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, cell long, max_prev_sim double, keep boolean"
        )
    assigned = with_ivf_cell(
        _vecs(corpus, vec_col).select(id_col, vec_col), centroids, vec_col=vec_col, out_col="cell"
    )

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cell", LongType()),
            StructField("max_prev_sim", DoubleType()),
            StructField("keep", BooleanType()),
        ]
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"), "cell": pd.Series(dtype="int64"),
                 "max_prev_sim": pd.Series(dtype="float64"), "keep": pd.Series(dtype="bool")}
            )
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        mat = _normalize(_stack(pdf[vec_col]))
        n = len(pdf)
        max_prev = np.zeros(n, dtype=np.float64)
        for lo in range(1, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            # rows lo..hi against ALL earlier rows 0..hi-1; mask j >= i
            sims = mat[lo:hi] @ mat[:hi].T
            for i in range(lo, hi):
                max_prev[i] = sims[i - lo, :i].max()
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                "cell": pdf["cell"].astype("int64"),
                "max_prev_sim": np.round(max_prev, 6),
                "keep": max_prev < threshold,
            }
        )

    return assigned.groupBy("cell").applyInPandas(dedup_cell, schema=out_schema)


# ---------------------------------------------------------------------------
# embedding statistics & compression
# ---------------------------------------------------------------------------


def class_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-class centroid (prototype) computation — the building block for
    nearest-class-mean classifiers, SemDeDup cell seeding, and dataset
    cartography. Output is long-format (label, dim, centroid).

    Bit-exactness trick: float summation is order-dependent, so a naive
    avg() would drift between engines/partitionings. Each component is
    first quantized to a fixed-point BIGINT (round(v * scale)); integer
    sums are associative in any order, and the final divide happens once
    on the driver-visible aggregate. One shuffle, map-side partials; the
    per-dim result set is |labels| x dim — tiny, whatever the corpus size.
    """
    fx = F.round(F.col("v").cast("double") * scale, 0).cast("long")
    return (
        df.select(F.col(label_col).alias("label"), F.posexplode(vec_col).alias("dim", "v"))
        .select("label", "dim", fx.alias("fx"))
        .groupBy("label", "dim")
        .agg(
            F.round(
                F.sum("fx") / (F.count(F.lit(1)) * F.lit(float(scale))), 6
            ).alias("centroid"),
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
        )
        .orderBy("label", "dim")
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Global per-dimension min/max scalar quantization (the int8 encoding
    step of an SQ-compressed ANN index, cf. FAISS ScalarQuantizer). Codes:
    floor((v - lo) / (hi - lo) * (2^bits - 1) + 0.5), constant dims -> 0.

    Scale shape: the stats pass reduces the whole corpus to ONE row per
    dimension (map-side partial min/max), which broadcasts back; the
    encode pass is map-only. floor(x + 0.5) is used instead of round()
    so half-way ties break identically on every engine. Output is
    long-format (id, dim, code) — integral, bit-exact, and directly
    joinable as a compressed column store; at deployment you would
    re-assemble per-row int arrays with a vectorized kernel instead of
    paying this explode, but the stats/encode split is the same.
    """
    levels = (1 << bits) - 1
    dims = df.select(F.col(id_col), F.posexplode(vec_col).alias("dim", "v"))
    stats = dims.groupBy("dim").agg(
        F.min(F.col("v").cast("double")).alias("lo"),
        F.max(F.col("v").cast("double")).alias("hi"),
    )
    span = F.col("hi") - F.col("lo")
    code = F.when(span == 0, F.lit(0)).otherwise(
        F.floor(
            (F.col("v").cast("double") - F.col("lo")) / span * levels + F.lit(0.5)
        )
    )
    return (
        dims.join(F.broadcast(stats), "dim")
        .select(F.col(id_col), "dim", code.cast("int").alias("code"))
        .orderBy(id_col, "dim")
    )


def centroid_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 25,
    scale: int = 1_000_000,
) -> DataFrame:
    """Label-noise / outlier detection: distance of each vector to its own
    class centroid, top-``k`` farthest (the confident-mislabel heuristic
    behind cleanlab-style auditing and coreset pruning).

    Composes ``class_centroids``: both vector components and centroids
    live in the same fixed-point BIGINT space, so the squared distance
    sum((fx_v - fx_c)^2) is integer arithmetic — associative in any
    order, bit-exact on any engine — and only the final sqrt/scale
    division touches floats (once, deterministically). The centroid side
    is |labels| x dim rows and broadcasts; the per-vector pass is
    map-only after one explode. Top-k compiles to TakeOrderedAndProject.
    """
    fx = F.round(F.col("v").cast("double") * scale, 0).cast("long")
    dims = df.select(
        F.col(id_col), F.col(label_col).alias("label"), F.posexplode(vec_col).alias("dim", "v")
    ).select(F.col(id_col), "label", "dim", fx.alias("fxv"))
    cents = class_centroids(df, vec_col=vec_col, label_col=label_col, scale=scale).select(
        "label",
        "dim",
        F.round(F.col("centroid") * scale, 0).cast("long").alias("fxc"),
    )
    d = F.col("fxv") - F.col("fxc")
    return (
        dims.join(F.broadcast(cents), ["label", "dim"])
        .groupBy(F.col(id_col), "label")
        .agg(F.sum(d * d).alias("dist2_fx"))
        .select(
            F.col(id_col),
            "label",
            F.round(F.sqrt(F.col("dist2_fx")) / scale, 6).alias("dist"),
        )
        .orderBy(F.col("dist").desc(), F.col(id_col).asc())
        .limit(k)
    )


def semantic_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
) -> DataFrame:
    """Fuzzy benchmark decontamination over EMBEDDINGS: for every train
    vector, the max cosine against ANY eval vector, flagged when it
    clears ``threshold`` — the semantic counterpart of the n-gram
    ``decontaminate`` (corpus.py), catching paraphrased / reformatted /
    translated eval leakage that exact n-gram overlap misses (the
    fuzzy-contamination check the GPT-3/PaLM appendices describe for
    train-test overlap; reference has no analogue — its universe is
    keyed symbol rows, downloader_tw.py:118-120).

    Scale shape: eval sets are benchmark-sized (<< train), so the eval
    matrix is COLLECTED, sorted by id, L2-normalized once, and broadcast
    (same contract as ``brute_force_topk``'s query side); the train side
    is ONE map-only Arrow pass — a |batch| x |eval| BLAS matmul, then a
    per-row max/argmax — ZERO shuffle, linear in train rows at any
    corpus size. Every train row stays in the output (audit-friendly:
    the decision threshold can be re-applied downstream without
    re-scoring).

    Determinism: cosines are rounded to 6dp BEFORE the argmax; ties
    break to the LOWEST eval id (eval rows sorted by id + numpy
    first-occurrence argmax), mirroring the oracle's
    ``ORDER BY cos DESC, eval_id ASC`` exactly.

    Returns (``id_col``, nearest_eval_id, max_cosine, contaminated).
    """
    spark = train.sparkSession
    eval_id = eval_id_col or id_col
    id_type = train.schema[id_col].dataType.simpleString()
    eval_id_type = _vecs(eval_df, vec_col).schema[eval_id].dataType.simpleString()
    if eval_id_type not in ("tinyint", "smallint", "int", "bigint"):
        # the eval ids ride a numpy int64 array through the broadcast and
        # nearest_eval_id is emitted as long — a string/decimal id would
        # die later in an opaque numpy cast; refuse up front instead
        raise ValueError(
            "semantic_decontaminate requires an integral eval id column "
            f"(got {eval_id!r}: {eval_id_type}); map ids to integers first "
            "(e.g. dense_ids) or pass eval_id_col naming an integral column"
        )
    schema = (
        f"{id_col} {id_type}, nearest_eval_id long, "
        "max_cosine double, contaminated boolean"
    )
    e_rows = sorted(
        _vecs(eval_df, vec_col).select(eval_id, vec_col).collect(),
        key=lambda r: r[0],
    )
    if not e_rows:
        # empty eval set: nothing can be contaminated, scores are NULL
        return _vecs(train, vec_col).select(
            F.col(id_col),
            F.lit(None).cast("long").alias("nearest_eval_id"),
            F.lit(None).cast("double").alias("max_cosine"),
            F.lit(False).alias("contaminated"),
        )
    e_ids = np.array([r[0] for r in e_rows], dtype=np.int64)
    e_mat = _normalize(_stack(pd.Series([r[1] for r in e_rows])))
    bc = spark.sparkContext.broadcast((e_ids, e_mat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_e, mat_e = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            sims = np.round(_normalize(_stack(pdf[vec_col])) @ mat_e.T, 6)
            best = sims.argmax(axis=1)  # first occurrence = lowest eval id
            mx = sims[np.arange(sims.shape[0]), best]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "nearest_eval_id": ids_e[best],
                    "max_cosine": mx,
                    "contaminated": mx >= threshold,
                }
            )

    return (
        _vecs(train, vec_col)
        .select(id_col, vec_col)
        .mapInPandas(score, schema=schema)
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: compress ``vec_col`` to
    ``out_dim`` dimensions with a seeded Gaussian matrix scaled by
    1/sqrt(out_dim), preserving pairwise distances within (1 +/- eps)
    w.h.p. — the standard pre-ANN / pre-clustering compression step.

    Scale shape: the projection matrix is a pure function of
    (seed, in_dim, out_dim), so every task REBUILDS it locally from the
    seed — nothing is collected, broadcast, or shuffled; the whole
    operator is one map-only Arrow pass with a single BLAS matmul per
    batch. Output floats are rounded to 6dp so downstream exact
    comparisons are reproducible, but the operator is approximate by
    construction (rows-only check; distance-preservation property test
    carries correctness)."""

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = None
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _stack(pdf[vec_col])
            if proj is None or proj.shape[0] != mat.shape[1]:
                rng = np.random.default_rng(seed)
                proj = rng.standard_normal((mat.shape[1], out_dim)) / np.sqrt(out_dim)
            low = np.round(mat.astype(np.float64) @ proj, 6)
            out = {id_col: pdf[id_col].to_numpy()}
            for c in keep_cols:
                out[c] = pdf[c].to_numpy()
            out[vec_col] = list(low.astype(np.float32))
            yield pd.DataFrame(out)

    keep_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in keep_cols
    )
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}{keep_schema}, {vec_col} array<float>"
    return _vecs(df, vec_col).select(id_col, *keep_cols, vec_col).mapInPandas(project, schema=schema)


# ---------------------------------------------------------------------------
# full-corpus k-means (Lloyd), deterministic
# ---------------------------------------------------------------------------


def _lloyd_step(
    sums_fx: np.ndarray, counts: np.ndarray, prev: np.ndarray, scale: float
) -> np.ndarray:
    """New centroids from integer partial sums: (sum/scale)/n, renormalize;
    empty clusters keep their previous centroid. Identical on the driver
    and distributed paths by construction (the sums are order-independent
    int64s; everything after is one numpy expression on the driver)."""
    cents = prev.copy()
    nz = counts > 0
    cents[nz] = (sums_fx[nz] / scale) / counts[nz, None]
    return _normalize(cents)


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1e6,
    driver_max_rows: int | None = 200_000,
) -> DataFrame:
    """FULL-corpus spherical k-means (Lloyd) -> ``(id, cluster)``. Unlike
    ``train_centroids`` (the FAISS-style coarse quantizer trained on a
    bounded sample), this clusters EVERY vector — the data-map /
    cluster-balanced-sampling use case where the assignment of each of
    10^10 vectors is the product.

    Deterministic at every step, independent of partitioning and Arrow
    batch boundaries: seeds are the ``k`` first vectors in hash-of-id
    order (ties by id); assignment is a row-independent argmax of the
    cosine against broadcast centroids (numpy argmax takes the FIRST max
    -> lowest cluster index on ties); the centroid update accumulates
    1e6-quantized int64 partial sums (order-independent — the
    ``class_centroids`` fixed-point trick), and the division/renormalize
    runs once on the driver. Early-stops when centroids are exactly
    unchanged. Empty clusters keep their previous centroid.

    Scale plan: centroids (k x dim floats) broadcast each round; each
    round is ONE Arrow-batched map pass emitting per-batch (cluster,
    dim, sum_fx, n) partials — k x dim rows per batch, NOT |corpus| —
    plus one tiny (cluster, dim)-keyed aggregation whose result
    (k x dim rows) collects to the driver. The corpus is checkpointed
    once and re-scanned per round (cache it for real on a cluster). The
    final labeling is one more map-only pass. Small inputs
    (``driver_max_rows``) dispatch to an in-memory loop with the SAME
    quantized math — bit-identical output (equivalence-tested), no
    per-round job overhead.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    id_type = corpus.schema[id_col].dataType.simpleString()
    vecs = _vecs(corpus, vec_col).select(id_col, vec_col)
    spark = corpus.sparkSession

    seeds = (
        vecs.orderBy(F.pmod(F.hash(F.col(id_col)), F.lit(1 << 31)), F.col(id_col))
        .limit(k)
        .collect()
    )
    if not seeds:
        return spark.createDataFrame([], f"{id_col} {id_type}, cluster long")
    cents = _normalize(_stack(pd.Series([r[1] for r in seeds])))
    kk, dim = cents.shape

    use_driver = False
    if driver_max_rows is not None:
        vecs = vecs.localCheckpoint(eager=True)
        use_driver = vecs.count() <= driver_max_rows

    if use_driver:
        rows = vecs.collect()
        mat = _normalize(_stack(pd.Series([r[1] for r in rows])))
        for _ in range(n_iter):
            assign = np.argmax(mat @ cents.T, axis=1)
            q = np.rint(mat * scale).astype(np.int64)
            sums = np.zeros((kk, dim), dtype=np.int64)
            counts = np.zeros(kk, dtype=np.int64)
            np.add.at(sums, assign, q)
            np.add.at(counts, assign, 1)
            new = _lloyd_step(sums, counts, cents, scale)
            if np.array_equal(new, cents):
                break
            cents = new
    else:
        for _ in range(n_iter):
            bc = spark.sparkContext.broadcast(cents)

            def partials(
                batches: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                c = bc.value
                nk, nd = c.shape
                for pdf in batches:
                    if pdf.empty:
                        continue
                    mat = _normalize(_stack(pdf[vec_col]))
                    assign = np.argmax(mat @ c.T, axis=1)
                    q = np.rint(mat * scale).astype(np.int64)
                    sums = np.zeros((nk, nd), dtype=np.int64)
                    counts = np.zeros(nk, dtype=np.int64)
                    np.add.at(sums, assign, q)
                    np.add.at(counts, assign, 1)
                    present = np.nonzero(counts)[0]
                    cl = np.repeat(present, nd)
                    dims = np.tile(np.arange(nd), len(present))
                    yield pd.DataFrame(
                        {
                            "cluster": cl,
                            "dim": dims,
                            "s_fx": sums[present].ravel(),
                            "n": np.repeat(counts[present], nd),
                        }
                    )

            agg = (
                vecs.mapInPandas(
                    partials, schema="cluster long, dim long, s_fx long, n long"
                )
                .groupBy("cluster", "dim")
                .agg(F.sum("s_fx").alias("s_fx"), F.sum("n").alias("n"))
                .collect()
            )
            sums = np.zeros((kk, dim), dtype=np.int64)
            counts = np.zeros(kk, dtype=np.int64)
            for r in agg:
                sums[r["cluster"], r["dim"]] = r["s_fx"]
                counts[r["cluster"]] = r["n"]
            new = _lloyd_step(sums, counts, cents, scale)
            if np.array_equal(new, cents):
                break
            cents = new

    return with_ivf_cell(vecs, cents, vec_col, out_col="cluster").select(
        F.col(id_col), F.col("cluster")
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    per_cluster: int,
    k: int = 8,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-preserving corpus pruning (the DataComp / SemDeDup-family
    selection shape): full-corpus k-means, then cap every semantic
    cluster at ``per_cluster`` survivors — so no single dense region of
    embedding space dominates the training mix the way a global
    quality-score cut lets it.

    Pure composition of two measured operators: ``kmeans`` (deterministic
    Lloyd) + ``corpus.rebalance_sample`` (md5-order quotas with the
    analytic big-group prune), so selection is bit-reproducible across
    runs, engines, and partitionings. Output ``(id, cluster)`` survivors.
    """
    from global_stock_data_warehouse_spark.operators.corpus import rebalance_sample

    labels = kmeans(
        corpus, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    ).withColumn("cluster", F.col("cluster").cast("string"))
    quotas = {str(c): per_cluster for c in range(k)}
    return rebalance_sample(
        labels, quotas, group_col="cluster", id_col=id_col
    ).select(F.col(id_col), F.col("cluster").cast("long").alias("cluster"))


# ---------------------------------------------------------------------------
# PCA: exact distributed moments -> driver eigendecomposition
# ---------------------------------------------------------------------------


def _pca_moments(
    vecs: DataFrame, vec_col: str, scale: float
) -> tuple[int, np.ndarray, np.ndarray]:
    """EXACT second-moment pass: ``(n, sum_fx, gram_fx)`` where
    ``sum_fx[i] = sum(rint(x_i * scale))`` and
    ``gram_fx[i, j] = sum(rint(x_i * scale) * rint(x_j * scale))``.

    One Arrow map pass emits per-batch int64 partials (d^2 + d + 1 rows
    per batch, NEVER |corpus|); Spark aggregates them as DECIMAL(38,0),
    so the global sums are exact integers with ~1e38 headroom — no
    overflow at any realistic corpus size and no float-order
    nondeterminism: the moments are bit-identical under any partitioning,
    which makes everything derived from them (eigenvalues, components,
    projections) reproducible run-to-run."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _stack(pdf[vec_col]).astype(np.float64)
            q = np.rint(mat * scale).astype(np.int64)
            g = q.T @ q  # int64-exact: |q| <= scale, batch rows bounded
            s = q.sum(axis=0)
            d = q.shape[1]
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate([ii.ravel(), np.arange(d), [-1]]),
                    "j": np.concatenate([jj.ravel(), np.full(d, -1), [-1]]),
                    "v": np.concatenate([g.ravel(), s, [len(q)]]),
                }
            )

    rows = (
        vecs.mapInPandas(partials, schema="i long, j long, v long")
        .groupBy("i", "j")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("v"))
        .collect()
    )
    if not rows:
        return 0, np.zeros(0, dtype=object), np.zeros((0, 0), dtype=object)
    d = max(r["i"] for r in rows) + 1
    n = 0
    sums = np.zeros(d, dtype=np.float64)
    gram = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        v = float(r["v"])
        if r["i"] < 0:
            n = int(r["v"])
        elif r["j"] < 0:
            sums[r["i"]] = v
        else:
            gram[r["i"], r["j"]] = v
    return n, sums, gram


def pca_fit(
    corpus: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    scale: float = 1e6,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA over the FULL corpus: returns ``(mean, components,
    explained_ratio)`` with ``components`` as a (k, d) row matrix sorted
    by descending eigenvalue. The data-dependent twin of
    ``random_projection`` (JL): same map-only projection cost downstream,
    but axes chosen by the corpus' actual covariance.

    Scale plan: ONE exact distributed moment pass (see ``_pca_moments`` —
    d^2 partials per batch, decimal-exact aggregation), then the (d x d)
    eigendecomposition runs on the driver: d is the embedding width
    (16-4096), so the driver work is microseconds and independent of
    corpus size. Determinism: the covariance matrix is a pure function of
    exact integer moments -> ``eigh`` sees bit-identical input under any
    partitioning; each component's sign is fixed by making its
    largest-|coefficient| entry positive (first index on ties)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    vecs = _vecs(corpus, vec_col)
    n, sums, gram = _pca_moments(vecs, vec_col, scale)
    if n == 0:
        return np.zeros(0), np.zeros((0, 0)), np.zeros(0)
    d = len(sums)
    mean = sums / (n * scale)
    cov = gram / (n * scale * scale) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: min(k, d)]
    comps = evecs[:, order].T.copy()
    top = np.abs(comps).argmax(axis=1)
    flip = comps[np.arange(len(comps)), top] < 0
    comps[flip] *= -1.0
    total = float(evals.clip(min=0.0).sum())
    ratio = (
        evals[order].clip(min=0.0) / total if total > 0 else np.zeros(len(order))
    )
    return mean, comps, ratio


def pca_project(
    df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1e6,
    fit: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """Project every vector onto the top-``k`` principal axes:
    ``(id, vec_col array<float>)`` rounded to 6dp. ``fit`` reuses a
    ``pca_fit`` result (e.g. fit on yesterday's corpus, project today's
    increment); otherwise the corpus is fit first. The projection itself
    is one map-only Arrow pass with the (k x d) component matrix carried
    in the task closure — zero shuffle, like ``random_projection``."""
    mean, comps, _ = fit if fit is not None else pca_fit(df, k, vec_col, scale)
    if comps.size == 0:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {df.schema[id_col].dataType.simpleString()}, {vec_col} array<float>"
        )

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _stack(pdf[vec_col]).astype(np.float64)
            low = np.round((mat - mean) @ comps.T, 6)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: list(low.astype(np.float32)),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return (
        _vecs(df, vec_col)
        .select(id_col, vec_col)
        .mapInPandas(project, schema=f"{id_col} {id_type}, {vec_col} array<float>")
    )


def pca_variance(
    corpus: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    scale: float = 1e6,
) -> DataFrame:
    """Explained-variance report: one row per principal component with
    its eigenvalue, variance ratio, and cumulative ratio (6dp) — the
    how-compressible-is-this-embedding-space diagnostic that sizes
    ``pca_project``'s k (and arbitrates PCA vs JL for a given corpus)."""
    _, _, ratio = pca_fit(corpus, k, vec_col, scale)
    cum = 0.0
    rows = []
    for i, r in enumerate(ratio):
        cum += float(r)
        rows.append((i, round(float(r), 6), round(cum, 6)))
    return corpus.sparkSession.createDataFrame(
        rows, "component int, explained_ratio double, cum_ratio double"
    )
