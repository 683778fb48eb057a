"""Connected components / dedup groups: hand-checkable graphs."""

import random

import pytest

from global_stock_data_warehouse_spark.operators.graph import (
    connected_components,
    connected_components_star,
    dedup_groups,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_cc_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter 3) + clique {10,11,12} + pair {20,21}
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    comp = {r.id: r.comp for r in connected_components(e).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_long_path_converges(spark):
    # path of 12 nodes — needs ~11 propagation rounds; driver_max_edges=0
    # forces the DISTRIBUTED loop (auto would route this tiny graph to the
    # driver-side union-find)
    e = _edges(spark, [(i, i + 1) for i in range(12)])
    comp = {
        r.id: r.comp
        for r in connected_components(e, driver_max_edges=0).collect()
    }
    assert set(comp.values()) == {0} and len(comp) == 13


def test_cc_raises_instead_of_wrong_labels_on_timeout(spark):
    # a 12-path cannot converge in 3 hash-to-min rounds: silent split
    # components would be a correctness bug — must raise (distributed path
    # forced; union-find has no iteration limit to hit)
    e = _edges(spark, [(i, i + 1) for i in range(12)])
    with pytest.raises(RuntimeError, match="star"):
        connected_components(e, max_iter=3, driver_max_edges=0)


def test_star_long_path_logarithmic_rounds(spark):
    # 40-path: diameter 40 — hash-to-min would need 40 rounds; star
    # variants converge within the default 20 (O(log d))
    e = _edges(spark, [(i, i + 1) for i in range(40)])
    comp = {r.id: r.comp for r in connected_components_star(e).collect()}
    assert set(comp.values()) == {0} and len(comp) == 41


def test_star_matches_hash_to_min_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(50 + 10 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        e = _edges(spark, edges)
        a = {
            r.id: r.comp
            for r in connected_components(e, max_iter=80, driver_max_edges=0).collect()
        }
        b = {r.id: r.comp for r in connected_components_star(e).collect()}
        assert a == b, f"trial {trial}: {a} != {b}"
        # the auto-dispatched union-find must agree with both distributed paths
        c = {r.id: r.comp for r in connected_components(e).collect()}
        assert a == c, f"trial {trial}: union-find diverged"


def test_cc_dispatch_boundary_equivalence(spark, monkeypatch):
    """VERDICT r8 item 7: the driver/distributed dispatch boundary.
    With sym.count() == driver_max_edges the driver union-find runs;
    at driver_max_edges - 1 the distributed hash-to-min runs — and both
    produce IDENTICAL labels on the same irregular graph. The spy
    asserts which path actually executed (plans alone can't tell:
    both return LogicalRDD-backed frames)."""
    import global_stock_data_warehouse_spark.operators.graph as g

    rng = random.Random(11)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(60)})
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    # r12: the dispatch statistic is the DIRECTED edge count (the probe is
    # a bounded limit-collect on the materialized edge list; union-find
    # needs no symmetrization)
    sym_n = len(pairs)

    calls = []
    real_uf = g._union_find_components

    def spy(rows, spark_):
        calls.append(len(rows))
        return real_uf(rows, spark_)

    monkeypatch.setattr(g, "_union_find_components", spy)

    # == boundary: driver path (<= contract)
    drv = {
        r.id: r.comp
        for r in g.connected_components(e, driver_max_edges=sym_n).collect()
    }
    assert calls == [sym_n]
    # one under: distributed path, identical labels
    dist = {
        r.id: r.comp
        for r in g.connected_components(
            e, driver_max_edges=sym_n - 1
        ).collect()
    }
    assert calls == [sym_n]  # spy NOT called again
    assert drv == dist


def test_cc_200k_edge_crossover_takes_distributed_path(spark, monkeypatch):
    """The DEFAULT crossover, exercised for real: 200,001 disjoint-pair
    directed edges — one over the 200,000 default cap (r12: the gate
    statistic is the directed edge count) — so the distributed
    hash-to-min must run (spy asserts the driver union-find is never
    invoked) and its labels must equal the driver path's on the
    identical graph."""
    import global_stock_data_warehouse_spark.operators.graph as g

    n_pairs = 200_001
    e = spark.range(n_pairs).selectExpr(
        "id * 2 as id_a", "id * 2 + 1 as id_b"
    )

    calls = []
    real_uf = g._union_find_components

    def spy(rows, spark_):
        calls.append(len(rows))
        return real_uf(rows, spark_)

    monkeypatch.setattr(g, "_union_find_components", spy)

    dist = g.connected_components(e)  # default driver_max_edges=200_000
    dist_rows = {r.id: r.comp for r in dist.collect()}
    assert calls == []  # distributed path taken at 200,001 > 200,000
    assert len(dist_rows) == 2 * n_pairs
    # every pair labels to its even (min) node
    assert all(
        dist_rows[2 * i] == 2 * i and dist_rows[2 * i + 1] == 2 * i
        for i in range(0, n_pairs, 9973)
    )
    # equivalence at the crossover: raise the cap so the SAME graph
    # routes to the driver union-find, labels must be identical
    drv = {
        r.id: r.comp
        for r in g.connected_components(
            e, driver_max_edges=300_000
        ).collect()
    }
    assert calls and calls[0] == n_pairs
    assert drv == dist_rows


def test_k_core_dispatch_boundary_equivalence(spark, monkeypatch):
    """Same boundary contract for k_core: == cap runs the driver peeler,
    cap-1 runs the distributed loop, results identical."""
    import global_stock_data_warehouse_spark.operators.graph as g
    from global_stock_data_warehouse_spark.operators.graph import k_core

    rng = random.Random(13)
    pairs = list({(rng.randrange(25), rng.randrange(25)) for _ in range(50)})
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    und_n = g._canonical_undirected(e, "id_a", "id_b").count()

    calls = []
    real = g._k_core_driver

    def spy(rows, k, spark_, t):
        calls.append(len(rows))
        return real(rows, k, spark_, t)

    monkeypatch.setattr(g, "_k_core_driver", spy)

    drv = sorted(
        map(tuple, k_core(e, k=2, src="id_a", dst="id_b", driver_max_edges=und_n).collect())
    )
    assert calls == [und_n]
    dist = sorted(
        map(tuple, k_core(e, k=2, src="id_a", dst="id_b", driver_max_edges=und_n - 1).collect())
    )
    assert calls == [und_n]
    assert drv == dist


def test_dedup_groups_shape(spark):
    e = _edges(spark, [(5, 3), (3, 9), (100, 101)])
    got = {
        r.keep_id: (r.group_size, list(r.members))
        for r in dedup_groups(e).collect()
    }
    assert got == {3: (3, [3, 5, 9]), 100: (2, [100, 101])}


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_cycle_is_uniform(spark):
    from global_stock_data_warehouse_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    ranks = {r.node: r.rank for r in pagerank(edges).collect()}
    assert len(ranks) == 3
    for v in ranks.values():
        assert abs(v - 1.0) < 1e-5


def test_pagerank_conserves_mass_with_dangling(spark):
    from global_stock_data_warehouse_spark.operators.graph import pagerank

    # b is dangling (no out-edges): its mass must be redistributed, not lost
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    rows = pagerank(edges, max_iter=50, tol=1e-10).collect()
    ranks = {r.node: r.rank for r in rows}
    assert abs(sum(ranks.values()) - 2.0) < 1e-6
    assert ranks[2] > ranks[1]
    # closed form: r2 = 1.85 * r1 at the fixed point
    assert abs(ranks[2] - 1.85 * ranks[1]) < 1e-5


def test_pagerank_hub_outranks_leaves(spark):
    from global_stock_data_warehouse_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(i, 0) for i in range(1, 6)], ["src", "dst"])
    ranks = {r.node: r.rank for r in pagerank(edges).collect()}
    assert all(ranks[0] > ranks[i] for i in range(1, 6))
    assert abs(sum(ranks.values()) - 6.0) < 1e-4


def test_pagerank_distributed_matches_driver(spark):
    import random

    from global_stock_data_warehouse_spark.operators.graph import pagerank

    rng = random.Random(7)
    pairs = list({(rng.randrange(12), rng.randrange(12)) for _ in range(40)})
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    drv = {r.node: r.rank for r in pagerank(edges, tol=1e-9, max_iter=60).collect()}
    dist = {
        r.node: r.rank
        for r in pagerank(
            edges, tol=1e-9, max_iter=60, driver_max_edges=0
        ).collect()
    }
    assert drv.keys() == dist.keys()
    for k in drv:
        assert abs(drv[k] - dist[k]) < 1e-6


def test_pagerank_empty_edges_returns_empty(spark):
    from global_stock_data_warehouse_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(edges)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_triangle_count_known_graph(spark):
    from global_stock_data_warehouse_spark.operators.graph import triangle_count

    # K4 on {a,b,c,d} has 4 triangles; each node sits in 3 of them.
    # Pendant node e-a joins no triangle and must not appear.
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"), ("e", "a"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_count_ignores_direction_dupes_and_loops(spark):
    from global_stock_data_warehouse_spark.operators.graph import triangle_count

    edges = [
        ("a", "b"), ("b", "a"), ("a", "b"),  # one undirected edge
        ("b", "c"), ("c", "a"), ("a", "a"),  # loop dropped
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}


def test_k_core_peels_to_dense_core(spark):
    from global_stock_data_warehouse_spark.operators.graph import k_core

    # K4 core ({a,b,c,d}, all degree 3) plus a pendant chain e-f hanging
    # off a: chain peels away at k=2, the K4 survives with degree 3.
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("a", "e"), ("e", "f"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.core_degree for r in k_core(df, k=2).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}
    # k above the max degree peels everything
    assert k_core(df, k=4).count() == 0


def test_k_core_matches_brute_force_peeling(spark):
    import random

    from global_stock_data_warehouse_spark.operators.graph import k_core

    rng = random.Random(11)
    pairs = {(rng.randint(0, 14), rng.randint(0, 14)) for _ in range(45)}
    df = spark.createDataFrame(sorted(pairs), ["src", "dst"])
    out = {r.node: r.core_degree for r in k_core(df, k=3).collect()}

    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    while True:
        deg: dict[int, int] = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < 3}
        if not drop:
            break
        und = {(a, b) for a, b in und if a not in drop and b not in drop}
    expected: dict[int, int] = {}
    for a, b in und:
        expected[a] = expected.get(a, 0) + 1
        expected[b] = expected.get(b, 0) + 1
    assert out == expected


def test_k_core_driver_and_distributed_paths_agree(spark):
    import random

    from global_stock_data_warehouse_spark.operators.graph import k_core

    rng = random.Random(23)
    pairs = sorted({(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(70)})
    df = spark.createDataFrame(pairs, ["src", "dst"])
    small = {(r.node, r.core_degree) for r in k_core(df, k=3).collect()}
    big = {
        (r.node, r.core_degree)
        for r in k_core(df, k=3, driver_max_edges=0).collect()
    }
    assert small == big


def test_link_prediction_common_neighbors(spark):
    """Handcrafted graph: hub wedges score non-adjacent pairs; adjacent
    pairs are excluded; jaccard = cn/(du+dv-cn)."""
    from global_stock_data_warehouse_spark.operators.graph import link_prediction

    # star around 0 (neighbors 1,2,3) plus edge 1-4: pairs (1,2),(1,3),
    # (2,3) share neighbor 0 only -> cn=1, pruned by min_common=2 unless
    # lowered; make 1 and 2 also share neighbor 5.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 4), (5, 1), (5, 2)], ["src", "dst"]
    )
    out = {
        (r.u, r.v): r
        for r in link_prediction(edges, k=10, min_common=2).collect()
    }
    # (1,2) share {0,5}; (0,5) share {1,2} — the only cn>=2 pairs
    assert set(out) == {(1, 2), (0, 5)}
    r = out[(1, 2)]
    # deg(1)={0,4,5}=3, deg(2)={0,5}=2, cn=2 -> jaccard=2/(3+2-2)
    assert r.common_neighbors == 2
    assert (r.deg_u, r.deg_v) == (3, 2)
    assert abs(r.jaccard - round(2 / 3, 6)) < 1e-12
    # with min_common=1 the cn=1 pairs appear, but NEVER adjacent ones
    all_pairs = link_prediction(edges, k=100, min_common=1).collect()
    adjacent = {(0, 1), (0, 2), (0, 3), (1, 4), (1, 5), (2, 5)}
    assert all((p.u, p.v) not in adjacent for p in all_pairs)
    assert (2, 3) in {(p.u, p.v) for p in all_pairs}  # cn=1 via node 0


def test_link_prediction_degenerate_graphs(spark):
    """Empty edges, single edge (no wedges), and a fully-connected
    triangle (every pair adjacent -> nothing to predict) all yield empty
    predictions without errors."""
    from global_stock_data_warehouse_spark.operators.graph import link_prediction

    empty = spark.createDataFrame([], "src int, dst int")
    assert link_prediction(empty, k=5, min_common=1).count() == 0
    one = spark.createDataFrame([(1, 2)], ["src", "dst"])
    assert link_prediction(one, k=5, min_common=1).count() == 0
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    assert link_prediction(tri, k=5, min_common=1).count() == 0
