"""Distributed PCA/whitening (`operators/pca.py`): agreement with a
single-node numpy reference, the whitening/decorrelation invariants
the self-audit query enforces, and the declared error surface."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators import pca


def _toy_frame(spark, n=400, d=8, seed=7):
    """Deterministic anisotropic cloud: distinct per-axis scales so
    the eigenvalue order is unambiguous (no near-ties to flip)."""
    rng = np.random.default_rng(seed)
    scales = np.linspace(3.0, 0.3, d)
    x = rng.normal(size=(n, d)) * scales + rng.normal(size=d)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id: long, embedding: array<double>"),
        x,
    )


def _numpy_pca(x: np.ndarray, p: int):
    mean = x.mean(axis=0)
    c = x - mean
    cov = (c.T @ c) / len(x)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:p]
    comps = vecs[:, order].T
    for i in range(p):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order], float(np.trace(cov))


def test_fit_matches_numpy_reference(spark):
    df, x = _toy_frame(spark)
    p = 3
    model = pca.fit_pca(df, n_components=p, whiten=False)
    mean, comps, vals, total = _numpy_pca(x, p)
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(model.eigvals, vals, atol=1e-9)
    assert np.allclose(model.components, comps, atol=1e-8)
    assert model.total_var == pytest.approx(total, abs=1e-9)
    assert 0.0 < model.explained_variance_ratio <= 1.0


def test_components_orthonormal_and_fit_deterministic(spark):
    df, _ = _toy_frame(spark)
    model = pca.fit_pca(df, n_components=4, whiten=False)
    b = np.array(model.components)
    assert np.allclose(b @ b.T, np.eye(4), atol=1e-10)
    again = pca.fit_pca(df, n_components=4, whiten=False)
    assert again == model  # bit-identical refit (dataclass equality)


def test_projection_matches_numpy_and_unwhitened_variance(spark):
    df, x = _toy_frame(spark)
    p = 3
    model = pca.fit_pca(df, n_components=p, whiten=False)
    out = (
        pca.project_embeddings(df, model)
        .select("vec_id", "pca")
        .orderBy("vec_id")
        .collect()
    )
    got = np.array([r["pca"] for r in out])
    mean, comps, vals, _ = _numpy_pca(x, p)
    want = (x - mean) @ comps.T
    assert np.allclose(got, np.round(want, 6), atol=1.5e-6)
    # unwhitened component variance == its eigenvalue
    assert np.allclose(got.var(axis=0), vals, atol=1e-4)


def test_whitened_projection_invariants(spark):
    df, _ = _toy_frame(spark)
    p = 4
    model = pca.fit_pca(df, n_components=p, whiten=True)
    got = np.array(
        [
            r["pca"]
            for r in pca.project_embeddings(df, model)
            .select("pca")
            .collect()
        ]
    )
    assert np.allclose(got.mean(axis=0), 0.0, atol=1e-5)
    assert np.allclose(got.var(axis=0), 1.0, atol=1e-3)
    corr = np.corrcoef(got.T)
    off = corr[~np.eye(p, dtype=bool)]
    assert np.max(np.abs(off)) < 1e-3


def test_null_vectors_ignored_and_errors(spark):
    df, x = _toy_frame(spark, n=50)
    with_null = df.unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id: long, embedding: array<double>"
        )
    )
    model = pca.fit_pca(with_null, n_components=2)
    ref = pca.fit_pca(df, n_components=2)
    assert model == ref
    with pytest.raises(ValueError, match="exceeds embedding dim"):
        pca.fit_pca(df, n_components=x.shape[1] + 1)
    with pytest.raises(ValueError, match="n_components must be >= 1"):
        pca.fit_pca(df, n_components=0)
    with pytest.raises(ValueError, match="no non-null vectors"):
        pca.fit_pca(df.filter(F.lit(False)), n_components=2)


def test_audit_query_bounds_on_fixture(spark):
    """The declared self-audit query satisfies its registered bounds
    at the test scale factor (the same checks tools/check_oracle.py
    enforces at sf0.01/sf0.1)."""
    from prioritizing_event_processing_with_apache_kafka_spark.inventory_pipeline import (
        q_embedding_pca_audit,
    )
    from tests.conftest import SF_DIR

    row = q_embedding_pca_audit(spark, SF_DIR).collect()[0]
    assert row["n_vecs"] > 0
    assert abs(row["max_abs_mean"]) <= 1e-4
    assert 0.98 <= row["min_comp_var"] <= row["max_comp_var"] <= 1.02
    assert abs(row["max_offdiag_corr"]) <= 0.02
    assert row["evr_margin"] >= -1e-6


def test_property_matches_numpy_on_random_data(spark):
    """Hypothesis: for arbitrary small (n, d, p, seed) the distributed
    fit agrees with single-node numpy PCA on the same data, and the
    projection invariants hold."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.integers(min_value=8, max_value=40),
        st.integers(min_value=2, max_value=6),
        st.integers(min_value=0, max_value=10_000),
    )
    def run(n, d, seed):
        rng = np.random.default_rng(seed)
        # distinct per-axis scales keep eigenvalues separated so the
        # component comparison is well-posed (no degenerate subspaces)
        x = rng.normal(size=(n, d)) * np.linspace(2.0, 0.5, d)
        p = min(2, d)
        df = spark.createDataFrame(
            [(i, [float(v) for v in x[i]]) for i in range(n)],
            "vec_id: long, embedding: array<double>",
        ).repartition(3)
        model = pca.fit_pca(df, n_components=p, whiten=False)
        mean, comps, vals, total = _numpy_pca(x, p)
        assert np.allclose(model.mean, mean, atol=1e-9)
        assert np.allclose(model.eigvals, vals, atol=1e-9)
        assert model.total_var == pytest.approx(total, abs=1e-9)
        b = np.array(model.components)
        assert np.allclose(b @ b.T, np.eye(p), atol=1e-9)

    run()


def test_ragged_dims_rejected_within_and_across_partitions(spark):
    d4 = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(10)],
        "vec_id: long, embedding: array<double>",
    )
    d8 = spark.createDataFrame(
        [(100 + i, [float(i)] * 8) for i in range(10)],
        "vec_id: long, embedding: array<double>",
    )
    # same partition (single-partition union) -> worker-side guard
    mixed_one = d4.union(d8).coalesce(1)
    with pytest.raises(Exception, match="pca: "):
        pca.fit_pca(mixed_one, n_components=2)
    # different partitions -> the combine-side uniform-count guard
    # must catch what per-partition checks cannot. parallelize with
    # explicit slices pins the partition boundary at the dim boundary
    # (repartition/coalesce paths get AQE-merged back into one
    # partition at this size, which would hit the worker guard
    # instead).
    rows = [(i, [float(i)] * 4) for i in range(10)] + [
        (100 + i, [float(i)] * 8) for i in range(10)
    ]
    mixed_parts = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        "vec_id: long, embedding: array<double>",
    )
    assert mixed_parts.rdd.getNumPartitions() == 2
    with pytest.raises(
        ValueError, match="differs across partitions"
    ):
        pca.fit_pca(mixed_parts, n_components=2)
