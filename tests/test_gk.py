"""GK-style mergeable quantile summaries (operators/sketches.py gk_*)."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_lookout_for_equipment_python_sdk_spark.operators import sketches as sk


def _df(spark, groups):
    rows = []
    for g, vals in groups.items():
        rows += [(g, float(v)) for v in vals]
    return spark.createDataFrame(rows, "grp string, value double").repartition(8)


def test_gk_rank_intervals_are_valid_bounds(spark):
    """Every merged point's true rank must lie inside [rmin, rmax] — the
    summary's core contract."""
    rng = np.random.RandomState(3)
    vals = rng.normal(0, 1, 20_000)
    df = _df(spark, {"a": vals})
    merged = sk.gk_merge(
        sk.gk_partition_summaries(df, "grp", "value", m=128), m=128
    ).collect()
    s = np.sort(vals)
    for r in merged:
        true_rank = int(np.searchsorted(s, r["v"], side="right"))
        assert r["rmin"] <= true_rank <= r["rmax"], (
            r["v"], r["rmin"], true_rank, r["rmax"],
        )
    n_max = max(r["rmax"] for r in merged)
    assert n_max == len(vals)  # totals compose exactly


@pytest.mark.parametrize("dist", ["normal", "exponential", "bimodal"])
def test_gk_quantile_error_bound(spark, dist):
    rng = np.random.RandomState(11)
    n, m = 50_000, 256
    if dist == "normal":
        vals = rng.normal(100, 15, n)
    elif dist == "exponential":
        vals = rng.exponential(3.0, n)
    else:
        vals = np.concatenate([rng.normal(0, 1, n // 2), rng.normal(50, 1, n // 2)])
    df = _df(spark, {"a": vals})
    summary = sk.gk_merge(
        sk.gk_partition_summaries(df, "grp", "value", m=m), m=m
    )
    s = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = sk.gk_quantile(summary, q).collect()[0]["q_est"]
        true_rank = 1 + q * (n - 1)
        est_rank = np.searchsorted(s, est, side="right")
        assert abs(est_rank - true_rank) <= 2.0 * n / m, (
            dist, q, est_rank, true_rank,
        )


def test_gk_multi_group_and_small_groups(spark):
    rng = np.random.RandomState(5)
    groups = {
        "big": rng.uniform(0, 1, 5000),
        "tiny": [1.0, 2.0, 3.0],
        "single": [42.0],
    }
    out = {
        r["grp"]: (r["q_est"], r["n"])
        for r in sk.gk_sketch_quantile(
            _df(spark, groups), "grp", "value", 0.5, m=64
        ).collect()
    }
    assert out["single"] == (42.0, 1)
    assert out["tiny"][0] == 2.0 and out["tiny"][1] == 3
    assert abs(out["big"][0] - 0.5) < 0.05 and out["big"][1] == 5000


def test_gk_incremental_merge_matches_full_build(spark):
    """The ingest story: summarize day 1 and day 2 separately, merge the
    two summary TABLES — the result must satisfy the same error bound as
    summarizing everything at once (and totals must compose exactly)."""
    rng = np.random.RandomState(7)
    day1, day2 = rng.normal(0, 1, 8000), rng.normal(0.5, 1, 8000)
    m = 128
    s1 = sk.gk_partition_summaries(_df(spark, {"a": day1}), "grp", "value", m)
    s2 = sk.gk_partition_summaries(_df(spark, {"a": day2}), "grp", "value", m)
    merged = sk.gk_merge(s1.unionByName(s2), m=m)
    allv = np.sort(np.concatenate([day1, day2]))
    n = len(allv)
    rows = merged.collect()
    assert max(r["rmax"] for r in rows) == n
    for q in (0.25, 0.5, 0.75):
        est = sk.gk_quantile(merged, q).collect()[0]["q_est"]
        est_rank = np.searchsorted(allv, est, side="right")
        assert abs(est_rank - (1 + q * (n - 1))) <= 2.0 * n / m


def test_gk_tied_values_keep_valid_bounds(spark):
    """Regression: duplicated values within one source must not shrink
    n_j (rank arrays arrive in arbitrary shuffle order; the merge sorts
    by (v, r) and sizes sources by rj.max())."""
    vals = [5.0] * 500 + [1.0, 2.0, 7.0] * 100  # heavy ties
    df = _df(spark, {"a": vals})
    merged = sk.gk_merge(
        sk.gk_partition_summaries(df, "grp", "value", m=16), m=16
    ).collect()
    import numpy as np

    s = np.sort(np.array(vals))
    assert max(r["rmax"] for r in merged) == len(vals)
    for r in merged:
        lo = int(np.searchsorted(s, r["v"], side="left")) + 1
        hi = int(np.searchsorted(s, r["v"], side="right"))
        # any rank this value legitimately occupies must intersect bounds
        assert r["rmin"] <= hi and r["rmax"] >= lo, (
            r["v"], r["rmin"], r["rmax"], lo, hi,
        )
