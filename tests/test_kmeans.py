"""Full-corpus k-means: the distributed partial-sum rounds must be
BIT-identical to the driver loop (shared quantized math), clusters must
recover separated blobs, and the result must not depend on partitioning."""

from __future__ import annotations

import numpy as np
import pytest

from global_stock_data_warehouse_spark.operators.similarity import kmeans


def _blob_df(spark, n_per=40, dim=8, seed=3):
    """Three well-separated unit blobs on distinct axes."""
    rng = np.random.default_rng(seed)
    rows = []
    for b in range(3):
        base = np.zeros(dim)
        base[b] = 10.0
        for i in range(n_per):
            v = base + rng.normal(0, 0.05, dim)
            rows.append((b * n_per + i, [float(x) for x in v], b))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, blob int"
    )


def test_kmeans_distributed_equals_driver(spark):
    df = _blob_df(spark)
    drv = sorted(
        tuple(r) for r in kmeans(df, k=3, n_iter=8, driver_max_rows=10**6).collect()
    )
    dist = sorted(
        tuple(r) for r in kmeans(df, k=3, n_iter=8, driver_max_rows=None).collect()
    )
    assert drv == dist


def test_kmeans_recovers_separated_blobs(spark):
    df = _blob_df(spark)
    out = kmeans(df, k=3, n_iter=10).collect()
    truth = {r["vec_id"]: r["blob"] for r in df.collect()}
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(truth[r["vec_id"]])
    # each cluster is pure (one blob) and all three blobs are found
    assert len(by_cluster) == 3
    assert all(len(blobs) == 1 for blobs in by_cluster.values())


def test_kmeans_deterministic_under_repartition(spark):
    df = _blob_df(spark)
    a = sorted(tuple(r) for r in kmeans(df, k=3, n_iter=5, driver_max_rows=None).collect())
    b = sorted(
        tuple(r)
        for r in kmeans(
            df.repartition(7), k=3, n_iter=5, driver_max_rows=None
        ).collect()
    )
    assert a == b


def test_kmeans_total_on_empty_and_null_vectors(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans(empty, k=4).collect() == []
    nulls = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = kmeans(nulls, k=2, n_iter=3).collect()
    assert sorted(r["vec_id"] for r in out) == [1, 2]  # null vec dropped
    assert len({r["cluster"] for r in out}) == 2


def test_kmeans_rejects_bad_k(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        kmeans(df, k=0)


def test_kmeans_k_larger_than_corpus(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    out = kmeans(df, k=5, n_iter=3).collect()
    assert sorted(r["vec_id"] for r in out) == [0, 1]


def test_cluster_balanced_sample_caps_every_cluster(spark):
    from global_stock_data_warehouse_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    df = _blob_df(spark, n_per=40)
    out = cluster_balanced_sample(df, per_cluster=10, k=3, n_iter=8).collect()
    sizes: dict[int, int] = {}
    for r in out:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
    assert len(sizes) == 3 and all(n == 10 for n in sizes.values())
    # selection is deterministic
    again = cluster_balanced_sample(df, per_cluster=10, k=3, n_iter=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
