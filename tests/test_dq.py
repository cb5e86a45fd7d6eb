"""Data-quality expectations (operators/dq.py)."""

from __future__ import annotations

from amazon_lookout_for_equipment_python_sdk_spark.operators import dq


def _facts(spark):
    rows = [
        (1, "click", 5.0, 100),
        (2, "view", -3.0, 100),     # range violation
        (2, "click", 7.0, 101),     # duplicate id
        (None, "zap", 99999.0, 999),  # null id + bad type + bad range + bad fk
        (5, None, 1.0, None),       # nulls in non-checked cols are fine
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double, user_id long"
    )


def _dim(spark):
    return spark.createDataFrame([(100,), (101,)], "c_custkey long")


def test_check_counts_each_rule(spark):
    out = {
        r["rule"]: r["n_violations"]
        for r in dq.check(
            _facts(spark),
            [
                dq.not_null("event_id"),
                dq.in_range("value", 0.0, 100.0),
                dq.accepted_values("event_type", ["click", "view"]),
                dq.unique("event_id"),
                dq.foreign_key("user_id", _dim(spark), "c_custkey"),
            ],
        ).collect()
    }
    assert out == {
        "not_null(event_id)": 1,
        "in_range(value,0.0,100.0)": 2,   # -3 and 99999
        "accepted_values(event_type)": 1,  # zap (null is not a violation)
        "unique(event_id)": 1,             # one extra row for id 2
        "foreign_key(user_id)": 1,         # 999 (null fk is not a violation)
    }


def test_check_all_green_emits_zero_rows_not_nothing(spark):
    df = spark.createDataFrame([(1, 5.0)], "event_id long, value double")
    out = dq.check(
        df, [dq.not_null("event_id"), dq.in_range("value", 0.0, 10.0)]
    ).collect()
    assert {(r["rule"], r["n_violations"]) for r in out} == {
        ("not_null(event_id)", 0),
        ("in_range(value,0.0,10.0)", 0),
    }


def test_matches_rule(spark):
    df = spark.createDataFrame(
        [("a@b.com",), ("nonsense",), (None,)], "email string"
    )
    out = dq.check(df, [dq.matches("email", r"^[^@]+@[^@]+$")]).collect()
    assert out[0]["n_violations"] == 1


def test_row_rules_fuse_into_one_aggregate(spark):
    """Scale contract: N row-local rules must cost ONE scan/aggregate,
    not N — pinned on the physical plan."""
    df = _facts(spark)
    out = dq.check(
        df,
        [
            dq.not_null("event_id"),
            dq.in_range("value", 0.0, 100.0),
            dq.accepted_values("event_type", ["click", "view"]),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2, plan  # partial + final only


def test_quarantine_split(spark):
    clean, bad = dq.quarantine_split(
        _facts(spark),
        [
            dq.not_null("event_id"),
            dq.in_range("value", 0.0, 100.0),
            dq.accepted_values("event_type", ["click", "view"]),
        ],
    )
    assert clean.count() + bad.count() == 5
    good_ids = {r["event_id"] for r in clean.collect()}
    assert good_ids == {1, 2, 5}  # row (2,'click',7.0) dup is row-clean
    bad_rows = {
        r["event_id"]: sorted(r["dq_failures"]) for r in bad.collect()
    }
    assert bad_rows[None] == [
        "accepted_values(event_type)",
        "in_range(value,0.0,100.0)",
        "not_null(event_id)",
    ]
    assert bad_rows[2] == ["in_range(value,0.0,100.0)"]  # the -3.0 view row


def test_quarantine_split_no_row_rules(spark):
    clean, bad = dq.quarantine_split(_facts(spark), [dq.unique("event_id")])
    assert clean.count() == 5 and bad.count() == 0


def test_quarantine_split_single_scan_plan(spark):
    clean, bad = dq.quarantine_split(
        _facts(spark), [dq.not_null("event_id")]
    )
    for out in (clean, bad):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # row-local, no shuffle


def test_unique_ignores_null_keys(spark):
    """dbt/GE unique semantics: NULL-keyed rows are not duplicates of
    each other — they belong to not_null, not unique."""
    df = spark.createDataFrame(
        [(None,), (None,), (None,), (7,), (7,)], "event_id long"
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in dq.check(df, [dq.unique("event_id")]).collect()
    }
    assert out == {"unique(event_id)": 1}  # only the real 7-dup counts
