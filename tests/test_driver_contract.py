"""Driver-contract guards: the artifacts the driver builds (bench,
correctness) must never break on a name mismatch — a bad key here is a
whole-artifact failure (r3's lesson), caught for pennies at test time."""

from __future__ import annotations

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES


def test_bench_queries_all_registered():
    qs = entrymod.queries()
    missing = [n for n in BENCH_QUERIES if n not in qs]
    assert not missing, f"bench names not in queries(): {missing}"


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    stray = [n for n in entrymod.oracle_sql() if n not in qs]
    assert not stray, f"oracle entries without a query: {stray}"


def test_oracle_coverage_is_total():
    """EVERY registered query has a DuckDB oracle — since r4 even the ANN
    path (its md5-derived LSH pipeline is deterministic end-to-end, so the
    oracle mirrors it bit-for-bit).  A query landing here without an
    oracle is a deliberate, documented act — not a default."""
    qs = set(entrymod.queries())
    no_oracle = qs - set(entrymod.oracle_sql())
    assert no_oracle == set(), no_oracle


DRIVER_WINDOW = 50  # the driver's correctness harness checks this many


def test_must_verify_queries_inside_driver_window():
    """Registry ORDER is part of the driver contract (r4 lesson: 7 tail
    queries past position 50 got no correctness row).  Every query that
    lacks a green row from the previous round must sit in the first 50."""
    from amazon_lookout_for_equipment_python_sdk_spark.plans.queries import (
        _MUST_VERIFY,
        _STABLE_TAIL,
    )

    names = list(entrymod.queries())
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in _MUST_VERIFY if n not in window]
    assert not missing, f"must-verify queries outside driver window: {missing}"
    # the rotation lists must stay consistent with the registry
    unknown = [n for n in _MUST_VERIFY + _STABLE_TAIL if n not in names]
    assert not unknown, f"rotation lists reference unknown queries: {unknown}"
    overlap = set(_MUST_VERIFY) & set(_STABLE_TAIL)
    assert not overlap, f"query in both rotation lists: {overlap}"


def test_all_query_outputs_have_atomic_columns(spark, sf_dir):
    """The driver canonicalizes results with pandas sort_values, which
    raises on list/dict cells — any array/map/struct TOP-LEVEL column is
    an automatic red row regardless of values (r4's
    embedding_l2_normalize).  Schema-only: no job runs."""
    bad = {}
    for name, fn in entrymod.queries().items():
        fields = fn(spark, sf_dir).schema.fields
        nonatomic = [
            f.name
            for f in fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nonatomic:
            bad[name] = nonatomic
    assert not bad, f"queries with non-atomic output columns: {bad}"


def test_r6_queue_note_matches_out_of_window_queries():
    """The hand-off comment in plans/queries.py must list EXACTLY the
    queries that are new since the last driver round AND sit past the
    50-entry window — a stale note sends r6 hunting for the wrong set."""
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev_rows = json.load(
        open(os.path.join(root, "CORRECTNESS_r04.json"))
    ).keys()
    names = list(entrymod.queries())
    window = set(names[:DRIVER_WINDOW])
    expected = {
        n for n in names if n not in prev_rows and n not in window
    }
    src = open(
        os.path.join(
            root,
            "amazon_lookout_for_equipment_python_sdk_spark/plans/queries.py",
        )
    ).read()
    block = re.search(
        r"R6 VERIFICATION QUEUE.*?hand-off note", src, re.S
    ).group()
    listed = set(re.findall(r"\b([a-z][a-z0-9_]{3,})\b(?:,|\n)", block)) & set(
        names
    )
    assert listed == expected, (
        f"note lists {sorted(listed)} but out-of-window new queries are "
        f"{sorted(expected)}"
    )
