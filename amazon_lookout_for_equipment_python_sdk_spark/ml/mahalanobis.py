"""Mahalanobis-distance multivariate condition monitor.

The classical multivariate counterpart to the PCA reconstruction-error
detector (ml/pipeline.py): fit the sensor mean vector and covariance,
score each timestamp's reading vector by its Mahalanobis distance
D² = (x-μ)ᵀ Σ⁻¹ (x-μ) — the T² control chart of multivariate SPC
(reference's managed model replaces exactly this family of classical
monitors; evaluation.py diagnostics are its per-sensor decomposition).

Spark-first split of work:
- **fit** is ONE aggregation pass: per-pair raw moments Σxᵢxⱼ plus per-
  sensor sums — d(d+3)/2 scalars for d sensors — computed map-side-
  combinable over the wide table; only this tiny moment vector reaches
  the driver, where the d×d inverse (numpy, exact enough at d ≤ 1000s)
  is computed once.
- **transform** is pure CODEGEN: D² expands to a quadratic form over the
  sensor columns with the precision-matrix entries as literals — no UDF,
  no MLlib stage, no Python on the scoring pass, whole-stage codegen
  keeps it in the scan pipeline.

At 100 TB the scoring pass is therefore scan-speed; the fit pass is one
shuffle of d(d+3)/2-length partial aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class MahalanobisModel:
    tags: list[str]
    mean: "np.ndarray"  # (d,)
    precision: "np.ndarray"  # (d, d) = Σ⁻¹
    n_rows: int
    threshold: float = field(default=float("nan"))  # D² alarm level

    def score_col(self) -> Column:
        """D² as a single codegen expression over the tag columns."""
        d = len(self.tags)
        centered = [
            F.col(self.tags[i]) - F.lit(float(self.mean[i])) for i in range(d)
        ]
        acc = F.lit(0.0)
        for i in range(d):
            # exploit symmetry: diagonal + 2x upper triangle
            acc = acc + centered[i] * centered[i] * F.lit(
                float(self.precision[i, i])
            )
            for j in range(i + 1, d):
                acc = acc + F.lit(2.0 * float(self.precision[i, j])) * (
                    centered[i] * centered[j]
                )
        return acc

    def transform(self, wide: DataFrame) -> DataFrame:
        """Score every row; adds ``d2`` and (when a threshold is fitted)
        the ``anomaly`` flag."""
        out = wide.withColumn("d2", self.score_col())
        if not np.isnan(self.threshold):
            out = out.withColumn(
                "anomaly", F.col("d2") > F.lit(float(self.threshold))
            )
        return out


def fit_mahalanobis(
    wide: DataFrame,
    tags: list[str] | None = None,
    ts_col: str = "ts",
    alarm_quantile: float | None = 0.997,
) -> MahalanobisModel:
    """Fit mean + covariance in ONE aggregation pass over the wide table
    (rows with any null sensor are excluded — covariance needs complete
    vectors; impute upstream via the resample-ffill spine).

    ``alarm_quantile`` (None to skip) sets the D² alarm level at that
    empirical quantile of the training distances — a second, cheap pass
    (approx quantile over the scored frame)."""
    if tags is None:
        tags = [c for c in wide.columns if c != ts_col]
    d = len(tags)
    complete = wide.dropna(subset=tags)
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for i in range(d):
        aggs.append(F.sum(F.col(tags[i])).alias(f"_s{i}"))
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum(F.col(tags[i]) * F.col(tags[j])).alias(f"_p{i}_{j}")
            )
    row = complete.agg(*aggs).collect()[0]
    n = row["_n"]
    if n < d + 1:
        raise ValueError(
            f"need > {d} complete rows to fit a {d}-sensor covariance, got {n}"
        )
    s = np.array([row[f"_s{i}"] for i in range(d)], dtype=np.float64)
    mean = s / n
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            cij = (row[f"_p{i}_{j}"] - s[i] * s[j] / n) / (n - 1)
            cov[i, j] = cov[j, i] = cij
    # ridge for numerical safety on (near-)degenerate sensors
    eps = 1e-9 * max(float(np.trace(cov)) / d, 1e-12)
    precision = np.linalg.inv(cov + eps * np.eye(d))
    model = MahalanobisModel(
        tags=list(tags), mean=mean, precision=precision, n_rows=int(n)
    )
    if alarm_quantile is not None:
        thr = (
            complete.withColumn("_d2", model.score_col())
            .approxQuantile("_d2", [alarm_quantile], 1e-4)
        )[0]
        model.threshold = float(thr)
    return model
