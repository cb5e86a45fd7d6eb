"""Mahalanobis T² multivariate monitor (ml/mahalanobis.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.ml.mahalanobis import (
    fit_mahalanobis,
)


def _wide(spark, X, anomalies=()):
    rows = []
    for i, x in enumerate(X):
        rows.append((i, *[float(v) for v in x]))
    for i, x in anomalies:
        rows.append((i, *[float(v) for v in x]))
    cols = ", ".join(f"s{j} double" for j in range(X.shape[1]))
    return spark.createDataFrame(rows, f"ts long, {cols}")


def test_fit_matches_numpy_and_scores_match(spark):
    rng = np.random.RandomState(17)
    # correlated 3-sensor process
    A = np.array([[1.0, 0.5, 0.0], [0.0, 1.0, 0.3], [0.2, 0.0, 1.0]])
    X = rng.normal(0, 1, (2000, 3)) @ A.T + np.array([10.0, -5.0, 3.0])
    df = _wide(spark, X)
    m = fit_mahalanobis(df, ts_col="ts", alarm_quantile=None)
    assert m.n_rows == 2000
    np.testing.assert_allclose(m.mean, X.mean(axis=0), rtol=1e-9)
    cov = np.cov(X, rowvar=False)
    np.testing.assert_allclose(
        m.precision, np.linalg.inv(cov), rtol=1e-4, atol=1e-9
    )
    scored = {
        r["ts"]: r["d2"] for r in m.transform(df).select("ts", "d2").collect()
    }
    inv = np.linalg.inv(cov)
    for i in (0, 100, 1999):
        c = X[i] - X.mean(axis=0)
        assert scored[i] == pytest.approx(float(c @ inv @ c), rel=1e-4)


def test_detects_injected_multivariate_anomaly(spark):
    """The point of Mahalanobis over per-sensor limits: a reading can be
    in-range on every sensor yet violate their CORRELATION."""
    rng = np.random.RandomState(23)
    z = rng.normal(0, 1, 3000)
    X = np.stack([z, z + rng.normal(0, 0.1, 3000)], axis=1)  # s1 ~ s0
    df = _wide(spark, X, anomalies=[(99990, (1.5, -1.5))])  # anti-correlated
    m = fit_mahalanobis(df, ts_col="ts")
    out = {r["ts"]: r["anomaly"] for r in m.transform(df).collect()}
    assert out[99990] is True
    frac = sum(bool(v) for v in out.values()) / len(out)
    assert frac < 0.02  # ~0.3% nominal + the injected point


def test_transform_is_codegen_no_udf(spark):
    rng = np.random.RandomState(5)
    X = rng.normal(0, 1, (500, 4))
    df = _wide(spark, X)
    m = fit_mahalanobis(df, ts_col="ts", alarm_quantile=None)
    plan = (
        m.transform(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # "*(n)" prefixes mark whole-stage-codegen stages in the plan string
    assert plan.lstrip().startswith("*("), plan[:200]


def test_fit_requires_enough_rows(spark):
    df = _wide(spark, np.zeros((2, 3)))
    with pytest.raises(ValueError, match="complete rows"):
        fit_mahalanobis(df, ts_col="ts", alarm_quantile=None)
