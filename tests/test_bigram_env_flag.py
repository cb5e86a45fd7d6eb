"""ADVICE r9 (low): SPARKGRAFT_BIGRAM_FORCE_BIG used to treat any value
outside ('0','false','False') as force-big, so =FALSE / =no / =off
silently forced the persisted path.  Pin the normalized parse."""

import pytest


@pytest.mark.parametrize(
    "val,expect",
    [
        ("1", True),
        ("true", True),
        ("TRUE", True),
        ("yes", True),
        (" on ", True),
        ("0", False),
        ("false", False),
        ("FALSE", False),
        ("False", False),
        ("no", False),
        ("No", False),
        ("off", False),
        ("OFF", False),
        (" Off ", False),
    ],
)
def test_force_big_env_normalized(monkeypatch, val, expect):
    from amazon_lookout_for_equipment_python_sdk_spark.plans.llmops import (
        _bigram_big,
    )

    monkeypatch.setenv("SPARKGRAFT_BIGRAM_FORCE_BIG", val)
    # docs is never touched when the override is set — pass a sentinel
    # that would blow up if the size estimate ran
    assert _bigram_big(object()) is expect


def test_force_big_env_empty_falls_through(monkeypatch):
    """Empty / whitespace-only values mean 'unset': the size estimate
    runs (our sentinel object makes that path raise, proving it was
    taken rather than silently forcing either branch)."""
    from amazon_lookout_for_equipment_python_sdk_spark.plans.llmops import (
        _bigram_big,
    )

    for val in ("", "   "):
        monkeypatch.setenv("SPARKGRAFT_BIGRAM_FORCE_BIG", val)
        with pytest.raises(AttributeError):
            _bigram_big(object())
