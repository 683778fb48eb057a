"""Iterative graph operators: connected components for dedup clustering.

Pairwise near-dup detection (dedup.py) yields EDGES; a training-data
pipeline needs GROUPS — "these 5 docs are all the same article, keep one".
That grouping is connected components over the similarity graph.

Implemented as distributed min-label propagation: each node's component
label is the smallest node id it can reach; per round every node takes the
min of its own and its neighbors' labels. Rounds = graph diameter, and
near-dup clusters are dense little cliques (diameter 1-3), so convergence
is a handful of rounds even at corpus scale. Each round is one
shuffle-join + one grouped min — all DataFrame ops; ``localCheckpoint``
truncates the plan lineage every round so the job graph stays flat
(an un-checkpointed loop doubles the plan each round and the 10th
iteration recompiles a 1000-node tree).

This is the standard "hash-to-min" scheme; for graphs with huge-diameter
paths (not similarity graphs) you'd switch to large-star/small-star
(Kiveris et al., 2014) — same building blocks, fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_components(rows: list, spark) -> DataFrame:
    """Driver-side union-find for SMALL edge sets (size-gated by the
    caller): O(E α(E)) with zero further Spark jobs — a 260-edge near-dup
    graph should not pay 4 rounds x 4 distributed jobs of scheduling
    overhead. Labels match the distributed path exactly: component =
    min node id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # root = smaller id
    import pandas as pd

    out = pd.DataFrame(
        {"id": list(parent), "comp": [find(n) for n in parent]}, dtype="int64"
    )
    # Arrow-path createDataFrame: one record batch, no pickled-row
    # parallelize job (the row-based form cost ~0.7s of 32-task pickle
    # scatter per call — measured r12, guide §6 Arrow-for-driver-transfers)
    return spark.createDataFrame(out, "id long, comp long")


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    driver_max_edges: int = 200_000,
) -> DataFrame:
    """(node_id, component) where component = min node id in the component.

    Isolated nodes don't appear (no edges -> their component is
    themselves; union them in at the call site if needed).

    Stats-dispatched like the near-dup operators: a bounded limit-collect
    on the materialized directed edge list (never more than
    ``driver_max_edges``+1 rows cross to the driver, at any graph scale;
    the 200k default costs tens of MB of driver heap once Row/int boxing
    is counted, well inside any real driver) routes small graphs to a
    driver-side union-find, and big ones to distributed hash-to-min —
    which is the only path that pays the symmetrize shuffle. Identical
    labels either way.
    """
    # Materialize the DIRECTED edge list once; the dispatch probe is a
    # bounded limit-collect on it (r12: one job instead of the former
    # symmetrize-shuffle + count + collect chain — union-find needs no
    # symmetrization, and the size gate on directed edges is the same
    # dispatch semantics at half the row count).
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .localCheckpoint(eager=True)
    )
    probe = e.limit(driver_max_edges + 1).collect()
    if len(probe) <= driver_max_edges:
        return _union_find_components(
            [(r[0], r[1]) for r in probe], edges.sparkSession
        )
    sym = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = sym.join(labels, sym.s == labels.id).select(
            F.col("d").alias("id"), F.col("comp"), F.lit(None).cast("bigint").alias("own")
        )
        # each node's OWN previous label rides the union tagged in `own`,
        # so convergence (no label decreased) is read off the aggregated
        # frame itself — no per-round old-vs-new join job
        new_labels = (
            labels.select("id", "comp", F.col("comp").alias("own"))
            .union(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"), F.min("own").alias("own"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.filter(F.col("comp") < F.col("own")).limit(1).count()
        )
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    else:
        # min-labels travel ONE hop per round: a graph whose diameter
        # exceeds max_iter would silently return split components — fail
        # loudly and point at the logarithmic-round alternative.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter too large) — use connected_components_star"
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node_id, component) via alternating large-star/small-star rounds
    (Kiveris et al., *Connected Components in MapReduce and Beyond*, 2014).

    Hash-to-min (``connected_components``) moves the min label one hop per
    round — diameter rounds, perfect for clique-ish near-dup clusters but
    wrong-by-timeout on long-path graphs. Star operations instead rewire
    the graph toward its component-minimum star and converge in
    O(log diameter) rounds: large-star hangs every larger neighbor off the
    local minimum; small-star re-parents the smaller ones. Each round is
    two grouped mins + two projections — same shuffle building blocks,
    exponentially fewer rounds.

    Convergence is detected structurally (edge multiset signature stable),
    checkpointed per round to keep lineage flat. Isolated nodes don't
    appear (no edges), matching ``connected_components``.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iter):
        # --- large-star: ∀v ∈ Γ(u), v > u: (v, m) where m = min(Γ(u) ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        joined = sym.join(mins, "u")
        e = (
            joined.filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star on oriented edges (u > v): ∀v ∈ Γ(u) ∪ {u} \ {m}: (v, m)
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins2 = o.groupBy("u").agg(F.min("v").alias("m"))  # all v < u, so min(Γ ∪ {u}) = min(v)
        e = (
            o.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig = tuple(e.agg(F.count(F.lit(1)), F.sum(F.xxhash64("u", "v"))).first())
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"star rounds did not converge in {max_iter} iterations")
    # converged edges form stars (child -> component root); roots label themselves
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("comp"))
    roots = labels.select("comp").distinct().select(
        F.col("comp").alias("id"), F.col("comp")
    )
    return labels.union(roots).distinct()


def dedup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs -> one row per duplicate GROUP: the kept (min) doc
    id, group size, and the sorted member list. The canonical last step of
    a corpus dedup pipeline: everything not in ``members`` minus ``keep_id``
    survives."""
    cc = connected_components(pairs, id_a, id_b)
    return (
        cc.groupBy("comp")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.sort_array(F.collect_list("id")).alias("members"),
        )
        .select("keep_id", "group_size", "members")
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-aware dedup verdicts: near-dup pairs -> components -> keep
    the HIGHEST-``score_col`` member of each cluster (ties -> lowest id),
    not the min-id member ``dedup_groups`` keeps — the policy real corpus
    pipelines want (when a page was scraped twice, keep the longer /
    higher-quality capture; C4 and Dolma both keep by a quality signal).

    One row per input doc: (id, group_key, keep_id, kept, group_size);
    docs in no pair form their own singleton group (kept=true), so the
    output is a total verdict over the corpus, filterable downstream
    with ``WHERE kept``.

    Scale shape: components from the stats-dispatched
    ``connected_components``; the winner election is ONE ``max_by`` over
    a (score, -id) struct — a map-side-combinable aggregation, no window
    sort; the verdict join back is group-keyed (components frame << docs
    under realistic dup rates, AQE broadcasts it).
    """
    cc = connected_components(pairs, id_a, id_b)
    labeled = (
        docs.select(F.col(id_col), F.col(score_col))
        .join(cc, docs[id_col] == cc["id"], "left")
        .select(
            F.col(id_col),
            F.col(score_col),
            F.coalesce(F.col("comp"), F.col(id_col).cast("long")).alias("group_key"),
        )
    )
    winners = labeled.groupBy("group_key").agg(
        F.max_by(
            F.col(id_col),
            F.struct(F.col(score_col).alias("s"), (-F.col(id_col)).alias("negid")),
        ).alias("keep_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return labeled.join(winners, "group_key").select(
        F.col(id_col),
        "group_key",
        "keep_id",
        (F.col(id_col) == F.col("keep_id")).alias("kept"),
        "group_size",
    )


def _pagerank_driver(
    e: DataFrame, spark, damping: float, max_iter: int, tol: float
) -> DataFrame:
    """Driver-side power iteration for SMALL edge sets (size-gated by the
    caller, same dispatch discipline as ``connected_components``): a
    5M-edge graph is a few hundred MB of numpy, and one vectorized
    iteration beats 2 distributed jobs/round of scheduling overhead by
    ~100x. Edges land via Arrow (columnar, no per-row boxing) and ids are
    densified with one factorize pass. Identical update rule to the
    distributed path."""
    import numpy as np
    import pandas as pd

    pdf = e.toArrow().to_pandas()
    both = pd.concat([pdf["s"], pdf["d"]], ignore_index=True)
    codes, uniques = pd.factorize(both, sort=True)
    m = len(pdf)
    s = codes[:m].astype(np.int64)
    d = codes[m:].astype(np.int64)
    n = len(uniques)
    deg = np.bincount(s, minlength=n).astype(np.float64)
    rank = np.ones(n, dtype=np.float64)
    dangling_mask = deg == 0
    for _ in range(max_iter):
        dangling = rank[dangling_mask].sum()
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, d, rank[s] / deg[s])
        new_rank = (1.0 - damping) + damping * (contrib + dangling / n)
        delta = np.abs(new_rank - rank).max()
        rank = new_rank
        if delta <= tol:
            break
    out = pd.DataFrame({"node": uniques, "rank": rank})
    return spark.createDataFrame(out)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    driver_max_edges: int = 5_000_000,
) -> DataFrame:
    """Distributed PageRank over a directed edge list — the link-quality
    signal CommonCrawl-derived corpus pipelines use for host-level doc
    filtering (alongside the dedup/quality ops in this package).

    Semantics: the ``sum(rank) == n_nodes`` convention,
    ``r(v) = (1-d) + d * (sum_{u->v} r(u)/deg(u) + dangling_mass/n)``,
    with dangling (no-outlink) mass redistributed uniformly so total rank
    is conserved every round. Stops early when no node moves more than
    ``tol``.

    Scale design: the edge list is repartitioned on ``src`` ONCE and
    checkpointed outside the loop; each round is one co-partitioned
    rank-join + grouped sum (map-side partials absorb multi-edges) plus a
    SINGLE scalar aggregate that returns both the convergence max-delta
    and the NEXT round's dangling mass (the two were separate jobs before
    round 4 — fusing them halves per-round job-scheduling overhead at
    high iteration counts; the initial dangling mass is a count of
    zero-out-degree nodes, folded into the node-count action).
    ``localCheckpoint`` per round keeps the plan flat (same discipline as
    ``connected_components``). Rank state is 2 columns/node — at 100 TB
    of edges the per-round shuffle carries only (dst, partial-contrib)
    pairs.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .repartition("s")
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    if n_edges == 0:
        # empty graph: empty (node, rank) result, not a divide-by-zero
        return e.select(
            F.col("s").alias("node"), F.lit(0.0).alias("rank")
        ).limit(0)
    if n_edges <= driver_max_edges:
        return _pagerank_driver(e, edges.sparkSession, damping, max_iter, tol)
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("out_deg"))
    base = (
        nodes.join(deg, "node", "left_outer")
        .fillna({"out_deg": 0})
        .repartition("node")
        .localCheckpoint(eager=True)
    )
    # initial state: rank=1.0 everywhere, so the first round's dangling
    # mass is just the zero-out-degree node count — ride it on the same
    # action as the node count instead of a separate job.
    n, dangling = base.agg(
        F.count(F.lit(1)),
        F.sum(F.when(F.col("out_deg") == 0, 1.0).otherwise(0.0)),
    ).first()
    dangling = dangling or 0.0
    ranks = base.withColumn("rank", F.lit(1.0)).localCheckpoint(eager=True)
    for _ in range(max_iter):
        contribs = (
            e.join(
                ranks.filter(F.col("out_deg") > 0).select(
                    F.col("node"), (F.col("rank") / F.col("out_deg")).alias("c")
                ),
                e.s == F.col("node"),
            )
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            ranks.join(contribs, "node", "left_outer")
            .withColumn(
                "new_rank",
                (1.0 - damping)
                + damping * (F.coalesce(F.col("contrib"), F.lit(0.0)) + dangling / n),
            )
            .select(
                "node",
                "out_deg",
                F.col("new_rank").alias("rank"),
                (F.abs(F.col("new_rank") - F.col("rank"))).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        # ONE scalar action per round: convergence delta + next round's
        # dangling mass read off the just-checkpointed frame together.
        max_delta, dangling = new_ranks.agg(
            F.max("delta"),
            F.sum(F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(0.0)),
        ).first()
        dangling = dangling or 0.0
        ranks = new_ranks.drop("delta")
        if max_delta is not None and max_delta <= tol:
            break
    return ranks.select("node", "rank")


def _canonical_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected edge list (a < b, loops dropped, distinct),
    materialized once — shared preamble of the multi-reference graph
    operators (every consumer would otherwise re-execute the caller's
    edge-building lineage)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst", k: int = 20
) -> DataFrame:
    """Per-node triangle participation counts (top-``k``) via the
    degree-ordered node-iterator algorithm (Schank & Wagner 2005; the
    MapReduce formulation is Suri & Vassilvitskii, WWW'11).

    Why degree orientation matters at 100 TB: a naive wedge join explodes
    on hubs (a degree-d node spawns d^2 wedges — a celebrity node in a
    co-purchase graph with d=10^6 would emit 10^12 rows). Orienting every
    edge from the (degree, id)-smaller endpoint to the larger one turns
    the graph into a DAG where each node's OUT-degree is O(sqrt(m)), so
    total wedge volume is bounded by sum(outdeg^2) <= O(m^1.5) — the
    optimal bound — and each triangle is generated exactly once (at its
    lowest-ranked corner). The total order is the LEXICOGRAPHIC
    (degree, id) pair compared directly as a struct — no global rank
    window (a row_number over all nodes would funnel the node set
    through one task; struct comparison keeps the orientation map-side).
    Pipeline: canonicalize + distinct, degree agg (joined back — AQE
    broadcasts it when small), wedge self-join on the low corner,
    closing-edge semi join, 3-way explode for per-node counts.
    Integer counts -> bit-exact across engines."""
    # The triangle machinery references the edge set many times (degree
    # union x2, orientation join, wedge self-join x2, closing side):
    # without a cut, EVERY reference re-executes the caller's whole edge-
    # building lineage (the audited plan had 60 exchanges from subtree
    # duplication). localCheckpoint materializes the canonical and
    # oriented edge lists exactly once — at 100 TB you'd persist the edge
    # list to storage for the same reason.
    und = _canonical_undirected(edges, src, dst)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    a_first = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    e = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
        .localCheckpoint(eager=True)
    )
    e1 = e.select("u", F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    e2 = e.select("u", F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    wedges = e1.join(e2, "u").filter(
        F.struct(F.col("dv1"), F.col("v1")) < F.struct(F.col("dv2"), F.col("v2"))
    )
    closing = e.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"], "left_semi").select("u", "v1", "v2")
    corners = (
        tris.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return corners.orderBy(F.col("n_triangles").desc(), F.col("node").asc()).limit(k)


def _k_core_driver(rows: list, k: int, spark, node_type: str) -> DataFrame:
    """Driver-side peeling for SMALL edge sets (size-gated by the caller):
    a graph of a few thousand edges should not pay dozens of distributed
    rounds of job-scheduling overhead. Labels match the distributed path
    exactly."""
    und = {(a, b) for a, b in rows}
    while True:
        deg: dict = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            break
        und = {(a, b) for a, b in und if a not in drop and b not in drop}
    out: dict = {}
    for a, b in und:
        out[a] = out.get(a, 0) + 1
        out[b] = out.get(b, 0) + 1
    import pandas as pd

    items = sorted(out.items(), key=lambda t: (-t[1], t[0]))
    # Arrow-path createDataFrame (r12): one record batch, no pickled-row
    # parallelize job — same as _union_find_components
    pdf = pd.DataFrame(
        {"node": [n for n, _ in items], "core_degree": [d for _, d in items]}
    )
    df = spark.createDataFrame(pdf, schema=f"node {node_type}, core_degree bigint")
    return df.orderBy(F.col("core_degree").desc(), F.col("node").asc())


def k_core(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_max_edges: int = 200_000,
) -> DataFrame:
    """Nodes of the ``k``-core: the maximal subgraph where every node has
    degree >= ``k`` (Seidman 1983) — the standard trim for spam rings /
    boilerplate clusters in similarity graphs (peripheral nodes peel
    away; the dense core survives).

    Iterative peeling: drop nodes with current degree < k, recompute
    degrees on the induced subgraph, repeat to fixpoint. Each round is
    one degree aggregation + two semi joins — all DataFrame ops, keyed
    on node ids (no global ordering anywhere); ``localCheckpoint`` per
    round keeps the plan flat. NOTE: parallel peeling removes all
    sub-``k`` nodes per round, so round count is the graph's "peeling
    cascade depth" — small for dense/clustered graphs, but O(n) worst
    case on long chains (a path peels only its endpoints each round at
    k=2); raise ``max_iter`` for such graphs. Raises on non-convergence
    rather than returning a wrong subgraph. Each round's checkpoint
    stays materialized for the job's lifetime (two frames per round);
    for very deep peels prefer a larger ``driver_max_edges`` or peel in
    coarser k-stages.

    Stats-dispatched like ``connected_components``: the canonical edge
    count (free — the frame is already checkpointed) routes small graphs
    to driver-side peeling (identical result, no per-round scheduling
    overhead); big ones run the distributed loop.
    """
    und = _canonical_undirected(edges, src, dst)
    # bounded limit-collect probe (r12, same shape as connected_components):
    # one job decides the dispatch AND delivers the driver path's input —
    # never more than driver_max_edges+1 rows cross to the driver
    probe = und.limit(driver_max_edges + 1).collect()
    if len(probe) <= driver_max_edges:
        return _k_core_driver(
            [(r[0], r[1]) for r in probe],
            k,
            edges.sparkSession,
            und.schema["a"].dataType.simpleString(),
        )
    cur = und
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionAll(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node").localCheckpoint(eager=True)
        nxt = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == cur.count():
            cur = nxt
            break
        cur = nxt
    else:
        raise RuntimeError(
            f"k_core did not converge in {max_iter} peeling rounds; raise "
            "max_iter (chain-heavy graphs can need O(n) rounds — parallel "
            "peeling is NOT bounded by degeneracy)"
        )
    return (
        cur.select(F.col("a").alias("node"))
        .unionAll(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .orderBy(F.col("core_degree").desc(), F.col("node").asc())
    )


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 25,
    min_common: int = 2,
) -> DataFrame:
    """Common-neighbors link prediction: the top-``k`` NON-adjacent node
    pairs ranked by neighborhood Jaccard — "parts bought with the same
    things but never together", the candidate-edge miner for
    recommendation / missing-link repair (Liben-Nowell & Kleinberg,
    CIKM'03; the same wedge machinery as :func:`triangle_count` but
    keeping the OPEN wedges a triangle census throws away).

    Pipeline: canonical undirected edges (checkpointed once) -> map-side
    adjacency union -> wedge self-join keyed on the shared CENTER node ->
    per-pair common-neighbor count -> anti-join against the edge set
    (adjacent pairs are predictions of nothing) -> degree join ->
    jaccard = cn / (deg_u + deg_v - cn). Integer counts; the one float
    is a single correctly-rounded division, rounded to 6dp -> engine
    bit-exact. Total order (jaccard DESC, cn DESC, u ASC, v ASC).

    Scale note: common-neighbor counting needs ALL wedges (sum of
    deg(center)^2), so unlike the triangle census degree-orientation
    cannot bound the volume — a degree-10^6 hub emits 10^12 wedge rows.
    At 100 TB cap the center fan-out explicitly (drop or sample centers
    above ~10^4 degree — a hub that common-neighbors half the catalog
    carries no signal — or move to minhash neighborhood sketches); the
    cap is a documented recall trade the exact sf-scale oracle does not
    take. ``min_common`` prunes the pair tail before the anti-join and
    rank."""
    und = _canonical_undirected(edges, src, dst)
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("w"), F.col("a").alias("n"))
    )
    x = adj.select("w", F.col("n").alias("u"))
    y = adj.select("w", F.col("n").alias("v"))
    cn = (
        x.join(y, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= min_common)
    )
    open_pairs = cn.join(
        und,
        (cn.u == und.a) & (cn.v == und.b),
        "left_anti",
    )
    deg = adj.groupBy(F.col("w").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    scored = (
        open_pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            "deg_u",
            "deg_v",
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(),
        F.col("common_neighbors").desc(),
        F.col("u").asc(),
        F.col("v").asc(),
    ).limit(k)
