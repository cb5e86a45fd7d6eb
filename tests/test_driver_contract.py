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
