"""Connected components / dedup groups: hand-checkable graphs."""

from global_stock_data_warehouse_spark.operators.graph import (
    connected_components,
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
    # path of 12 nodes — needs ~11 propagation rounds, exercises the loop
    e = _edges(spark, [(i, i + 1) for i in range(12)])
    comp = {r.id: r.comp for r in connected_components(e).collect()}
    assert set(comp.values()) == {0} and len(comp) == 13


def test_dedup_groups_shape(spark):
    e = _edges(spark, [(5, 3), (3, 9), (100, 101)])
    got = {
        r.keep_id: (r.group_size, list(r.members))
        for r in dedup_groups(e).collect()
    }
    assert got == {3: (3, [3, 5, 9]), 100: (2, [100, 101])}
