"""robots.txt politeness gate (operators/robots.py): RFC 9309 group
selection, longest-match rules, wildcard/$ patterns, default allow."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators import (
    robots as R,
)

ROBOTS_A = """
# politeness file for a.example
User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/press/
Disallow: /*.pdf$
Disallow: /search?
"""

ROBOTS_B = """
User-agent: specialbot
Disallow: /

User-agent: *
Disallow: /blocked-for-everyone/
"""


@pytest.fixture(scope="module")
def robots_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["a.example", "b.example", "broken.example"],
                "robots_txt": [ROBOTS_A, ROBOTS_B, "\x00not robots %%"],
            }
        )
    )


def _kept(spark, robots_df, urls, agent="*"):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    out = R.robots_filter(df, robots_df, agent=agent)
    assert out.columns == ["url"]  # staging columns dropped
    return {r["url"] for r in out.collect()}


def test_parse_rules_and_group_selection():
    rules = R._parse_robots(ROBOTS_A, "anybot")
    assert (False, "/private/") in rules and (True, "/private/press/") in rules
    # specific group beats *; '*' group applies to everyone else
    assert R._parse_robots(ROBOTS_B, "SpecialBot/1.0") == [(False, "/")]
    assert R._parse_robots(ROBOTS_B, "otherbot") == [
        (False, "/blocked-for-everyone/")
    ]
    # empty disallow matches nothing; garbage degrades to no rules
    assert R._parse_robots("User-agent: *\nDisallow:\n", "x") == []
    assert R._parse_robots("\x00garbage %% lines\n", "x") == []


def test_agent_match_respects_token_boundaries():
    """Group-token prefix matching only at product-token boundaries
    (r13 ADVICE): 'specialbot' must NOT capture 'specialbot2000' via
    plain startswith, while the Googlebot convention —
    'googlebot-image' matching a 'googlebot' group — still works."""
    # alnum continuation after the group token: NOT a match -> falls
    # to the * group
    assert R._parse_robots(ROBOTS_B, "specialbot2000") == [
        (False, "/blocked-for-everyone/")
    ]
    # '-' and '/' are token boundaries: both match the specific group
    assert R._parse_robots(ROBOTS_B, "specialbot-2") == [(False, "/")]
    assert R._parse_robots(ROBOTS_B, "SpecialBot/1.0") == [(False, "/")]
    # '_' is a PRODUCT-TOKEN char per RFC 9309: 'specialbot_v2' is a
    # different token and must fall to the * group
    assert R._parse_robots(ROBOTS_B, "specialbot_v2") == [
        (False, "/blocked-for-everyone/")
    ]
    googley = (
        "User-agent: googlebot\nDisallow: /gb/\n\n"
        "User-agent: *\nDisallow: /all/\n"
    )
    assert R._parse_robots(googley, "Googlebot-Image") == [
        (False, "/gb/")
    ]
    # longest boundary-valid token still wins among candidates
    nested = (
        "User-agent: google\nDisallow: /short/\n\n"
        "User-agent: googlebot\nDisallow: /long/\n"
    )
    assert R._parse_robots(nested, "googlebot-news") == [
        (False, "/long/")
    ]


def test_parse_delay_and_robots_delays(spark):
    """Crawl-delay / Request-rate parsing: per-group, conservative
    merge, de-facto units, absent when undeclared (r13 verdict #5)."""
    body = (
        "User-agent: slowbot\nCrawl-delay: 10\nDisallow: /x\n\n"
        "User-agent: ratebot\nRequest-rate: 1/5\n\n"
        "User-agent: both\nCrawl-delay: 2\nRequest-rate: 2/12\n\n"
        "User-agent: *\nDisallow: /y\n"
    )
    assert R._parse_delay(body, "slowbot") == 10.0
    assert R._parse_delay(body, "ratebot") == 5.0  # 5s per 1 req
    assert R._parse_delay(body, "both") == 6.0  # max(2, 12/2)
    assert R._parse_delay(body, "anyone-else") is None  # * group: none
    # malformed values degrade to no delay, never raise
    junk = "User-agent: *\nCrawl-delay: fast\nRequest-rate: lots\n"
    assert R._parse_delay(junk, "x") is None
    # 'Crawl-delay: 0' is the unthrottled idiom -> NO delay declared
    # (a 0.0 row would divide-by-zero every period/delay mapping)
    assert R._parse_delay("User-agent: *\nCrawl-delay: 0\n", "x") is None
    # Request-rate time-window units: s (default), m, h
    assert R._parse_delay("User-agent: *\nRequest-rate: 1/5s\n", "x") == 5.0
    assert (
        R._parse_delay("User-agent: *\nRequest-rate: 1/10m\n", "x") == 600.0
    )
    assert (
        R._parse_delay("User-agent: *\nRequest-rate: 2/1h\n", "x") == 1800.0
    )
    # an unparseable window drops the rule rather than misreading it
    assert R._parse_delay("User-agent: *\nRequest-rate: 1/10x\n", "x") is None
    # rules parsing is unaffected by delay lines in the group
    assert R._parse_robots(body, "slowbot") == [(False, "/x")]
    tbl = R.robots_delays(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "host": ["s.example", "n.example"],
                    "robots_txt": [body, "User-agent: *\nDisallow: /z\n"],
                }
            )
        ),
        agent="ratebot",
    )
    rows = {r["host"]: r["crawl_delay_s"] for r in tbl.collect()}
    # n.example declares no delay -> ABSENT, not 0
    assert rows == {"s.example": 5.0}


def test_pattern_translation():
    assert R._pattern_to_regex("/a/b") == "^/a/b"
    assert R._pattern_to_regex("/*.pdf$") == r"^/.*\.pdf$"
    assert R._pattern_to_regex("/p/*/x") == "^/p/.*/x"


def test_pattern_regex_matches_spec_semantics_property():
    """_pattern_to_regex vs a direct RFC 9309 wildcard matcher over
    random pattern/path pairs: '*' spans anything, trailing '$'
    anchors, everything else (incl. regex metachars) is literal."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def ref_match(pattern: str, path: str) -> bool:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        segs = body.split("*")

        def walk(pos: int, i: int) -> bool:
            if i == len(segs):
                return pos == len(path) if anchored else True
            seg = segs[i]
            if i == 0:
                if not path.startswith(seg):
                    return False
                return walk(len(seg), 1)
            at = path.find(seg, pos)
            while at >= 0:
                if walk(at + len(seg), i + 1):
                    return True
                # last segment of an anchored pattern must try later
                # occurrences too; unanchored/middle segments are
                # greedy-safe via the recursion
                at = path.find(seg, at + 1)
            return False

        return walk(0, 0)

    chars = st.text(alphabet="/ab.?$x*%3()[+", min_size=0, max_size=10)

    @settings(max_examples=300, deadline=None)
    @given(chars, chars)
    def check(pattern, path):
        rx = R._pattern_to_regex(pattern)
        got = _re.search(rx, path) is not None
        assert got == ref_match(pattern, path), (pattern, path, rx)

    check()


def test_robots_filter_longest_match_and_anchors(spark, robots_df):
    urls = [
        "https://a.example/",                      # no match -> allow
        "https://a.example/private/x",             # disallow /private/
        "https://a.example/private/press/rel.html",  # allow wins (longer)
        "https://a.example/tmp/scratch",           # prefix disallow
        "https://a.example/doc.pdf",               # $-anchored wildcard
        "https://a.example/doc.pdf.html",          # $ anchor must NOT hit
        "https://a.example/search?q=x",            # query in match target
        "https://a.example/search",                # bare path allowed
    ]
    kept = _kept(spark, robots_df, urls)
    assert kept == {
        "https://a.example/",
        "https://a.example/private/press/rel.html",
        "https://a.example/doc.pdf.html",
        "https://a.example/search",
    }


def test_robots_filter_agent_groups_and_defaults(spark, robots_df):
    urls = [
        "https://b.example/anything",
        "https://b.example/blocked-for-everyone/x",
        "https://unlisted.example/whatever",   # no robots row -> allow
        "https://broken.example/x",            # garbage robots -> allow
        None,                                  # null url passes through
    ]
    # generic agent: only the shared disallow applies
    kept = _kept(spark, robots_df, urls)
    assert kept == {
        "https://b.example/anything",
        "https://unlisted.example/whatever",
        "https://broken.example/x",
        None,
    }
    # specialbot: denied everything on b.example
    kept = _kept(spark, robots_df, urls, agent="SpecialBot/2.1")
    assert kept == {
        "https://unlisted.example/whatever",
        "https://broken.example/x",
        None,
    }


def test_robots_rules_table_shape(spark, robots_df):
    rules = R.robots_rules(robots_df, agent="*").collect()
    hosts = {r["host"] for r in rules}
    assert hosts == {"a.example", "b.example"}  # broken parses to none
    a_rules = [r for r in rules if r["host"] == "a.example"]
    assert len(a_rules) == 5
    assert all(r["pattern_re"].startswith("^") for r in rules)
    assert all(r["pattern_len"] == len(r["pattern"]) for r in rules)


def test_robots_filter_guards_staging_clash(spark, robots_df):
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["https://a.example/"], "_rb_host": ["x"]})
    )
    with pytest.raises(ValueError, match="_rb_host"):
        R.robots_filter(df, robots_df)


def test_robots_denied_set_is_a_join_not_inlined(spark, robots_df):
    """The gate must stay a JOIN against the rule/deny tables — a
    UT1-scale robots corpus cannot be inlined into the plan."""
    df = spark.createDataFrame(
        pd.DataFrame({"url": [f"https://a.example/p{i}" for i in range(50)]})
    )
    out = R.robots_filter(df, robots_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan
    assert "/private/press/" not in plan  # rule literals never inline
