"""PCA (exact distributed moments -> driver eigendecomposition).

The moment pass is the distributed part — it must be bit-identical under
any partitioning (decimal-exact integer accumulation) and equal to a
straight numpy reference using the same quantization. Everything after
is driver numpy, so distributed-vs-reference equality is EXACT, not
approximate. Plus the spectral properties a PCA must satisfy: component
orthonormality, descending explained ratios, low-rank structure
recovery, and projection = centered data @ components.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.similarity import (
    pca_fit,
    pca_project,
    pca_variance,
)

SCALE = 1e6


def _make(spark, n=400, dim=8, planted=2):
    """Deterministic vectors with variance concentrated in `planted`
    directions (coordinates 0..planted-1 get 10x the spread)."""
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((n, dim)) * 0.05
    mat[:, :planted] += rng.standard_normal((n, planted)) * 1.5
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        np.array(
            [np.asarray(r[1], dtype=np.float32) for r in rows], dtype=np.float64
        ),
    )


def _ref_fit(mat, k, scale=SCALE):
    """Independent reference with the SAME fixed-point quantization."""
    q = np.rint(mat * scale).astype(np.int64)
    n = len(q)
    sums = q.sum(axis=0).astype(np.float64)
    gram = (q.T @ q).astype(np.float64)
    mean = sums / (n * scale)
    cov = gram / (n * scale * scale) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    top = np.abs(comps).argmax(axis=1)
    flip = comps[np.arange(len(comps)), top] < 0
    comps[flip] *= -1.0
    total = float(evals.clip(min=0.0).sum())
    return mean, comps, evals[order].clip(min=0.0) / total


def test_fit_equals_reference_exactly(spark):
    df, mat = _make(spark)
    mean, comps, ratio = pca_fit(df, k=4)
    rmean, rcomps, rratio = _ref_fit(mat, 4)
    # the moments are integer-exact, so the derived floats are BIT-equal
    assert np.array_equal(mean, rmean)
    assert np.array_equal(comps, rcomps)
    assert np.array_equal(ratio, rratio)


def test_repartition_invariance(spark):
    df, _ = _make(spark)
    a = pca_fit(df, k=3)
    b = pca_fit(df.repartition(13, "vec_id"), k=3)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_components_orthonormal_and_ratios_sorted(spark):
    df, _ = _make(spark)
    _, comps, ratio = pca_fit(df, k=5)
    assert np.allclose(comps @ comps.T, np.eye(len(comps)), atol=1e-9)
    assert all(ratio[i] >= ratio[i + 1] - 1e-12 for i in range(len(ratio) - 1))


def test_planted_low_rank_recovered(spark):
    df, _ = _make(spark, planted=2)
    _, _, ratio = pca_fit(df, k=8)
    # the two planted directions carry nearly all the variance
    assert ratio[0] + ratio[1] > 0.95
    # and the top-2 subspace is spanned by coordinates 0 and 1
    _, comps, _ = pca_fit(df, k=2)
    mass = np.abs(comps[:, :2]).sum() / np.abs(comps).sum()
    assert mass > 0.95


def test_projection_matches_reference(spark):
    df, mat = _make(spark, n=100)
    out = {
        r["vec_id"]: np.asarray(r["embedding"])
        for r in pca_project(df, k=3).collect()
    }
    mean, comps, _ = _ref_fit(mat, 3)
    # projection floats pass through float32 output — compare at 5dp
    for i in range(100):
        expect = np.round((mat[i] - mean) @ comps.T, 6)
        assert np.allclose(out[i], expect, atol=1e-4)


def test_variance_report_shape(spark):
    df, _ = _make(spark)
    rows = pca_variance(df, k=4).collect()
    assert [r["component"] for r in rows] == [0, 1, 2, 3]
    assert rows[-1]["cum_ratio"] <= 1.0 + 1e-9
    assert abs(sum(r["explained_ratio"] for r in rows) - rows[-1]["cum_ratio"]) < 1e-5


def test_empty_and_bad_k(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    mean, comps, ratio = pca_fit(empty, k=3)
    assert comps.size == 0 and pca_project(empty, k=3).count() == 0
    with pytest.raises(ValueError):
        pca_fit(empty, k=0)
