"""robots.txt politeness gate — the crawl-pipeline filter between URL
discovery and fetching (and, for archived corpora, the retroactive
compliance pass: drop captures a site's CURRENT robots.txt disallows).

Implements RFC 9309 (https://www.rfc-editor.org/rfc/rfc9309) matching
with only the stdlib: group selection by longest matching product
token (falling back to ``*``), rule matching by longest path pattern
with ``*`` wildcards and the ``$`` end anchor, allow winning
length ties, and unmatched/unlisted defaulting to allow.
``urllib.robotparser`` is NOT used: it evaluates one URL at a time
against a parser object, which cannot be joined — the whole point here
is a relational formulation.

Scale design (the url_filter pattern, operators/urls.py):

- **Parse once per host, not per URL**: robots bodies explode into a
  compact RULE TABLE ``(host, allow, pattern, pattern_re,
  pattern_len)`` inside one Arrow kernel — a few tens of rows per
  host, independent of corpus size.
- **Verdicts on DISTINCT (host, path)**, not on URL rows: the
  candidate join (rules x paths, equi on host) and the
  longest-match-wins aggregate run on the deduplicated probe set;
  URL rows then LEFT ANTI join the DENIED set.  Hosts with no rules
  and paths matching no rule never materialize anywhere — RFC default
  allow comes out of the join shape for free.
- Pattern matching is JVM-side ``regexp_like`` on the translated
  anchored regex (escaped literal, ``*`` -> ``.*``, trailing ``$``
  kept as the anchor) — no Python in the per-path hot loop.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("pattern", T.StringType(), False),
        T.StructField("pattern_re", T.StringType(), False),
        T.StructField("pattern_len", T.IntegerType(), False),
    ]
)


#: Request-rate time window: number + optional unit (s/m/h)
_RATE_WINDOW_RE = re.compile(r"^(\d+(?:\.\d+)?)\s*([smh]?)$")


def _pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored Java-compatible regex:
    ``*`` matches any span, a TRAILING ``$`` anchors the end, every
    other char is literal."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = "^" + ".*".join(parts)
    return rx + "$" if anchored_end else rx


def _parse_groups(
    body: str,
) -> "list[tuple[list[str], list[tuple[bool, str]], float | None]]":
    """All robots.txt groups: (agent tokens, (allow, pattern) rules,
    politeness delay in seconds).  Consecutive ``User-agent`` lines
    share one group.  The delay is the most conservative of
    ``Crawl-delay`` (de-facto extension, seconds) and ``Request-rate:
    n/m`` (m seconds per n requests); None when neither parses.
    Unknown fields and comments are ignored; an empty-path rule
    matches nothing (skipped).  Malformed input degrades to "no
    groups" — allow-all, the RFC default for an unreachable /
    unparseable robots.txt."""
    groups: list = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: "float | None" = None
    in_agent_run = False

    def flush() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                flush()
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents and value:
                cur_rules.append((field == "allow", value))
        elif field == "crawl-delay":
            in_agent_run = False
            if cur_agents:
                try:
                    d = float(value)
                except ValueError:
                    continue
                # 'Crawl-delay: 0' is the real-world unthrottled
                # idiom — NO delay declared, not a zero-second rate
                # (a 0.0 row would divide-by-zero every
                # period/delay -> k mapping downstream)
                if d > 0:
                    cur_delay = max(cur_delay or 0.0, d)
        elif field == "request-rate":
            in_agent_run = False
            if cur_agents and "/" in value:
                n_s, _, m_s = value.partition("/")
                # de-facto grammar: 'n/m', 'n/ms' seconds, 'n/mm'
                # minutes, 'n/mh' hours ('1/10m' = one request per
                # 10 MINUTES, not 10 seconds)
                um = _RATE_WINDOW_RE.match(m_s.strip())
                try:
                    n = float(n_s)
                    m = float(um.group(1)) if um else float("nan")
                except ValueError:
                    continue
                mult = {"": 1, "s": 1, "m": 60, "h": 3600}[
                    um.group(2) if um else ""
                ]
                if n > 0 and m > 0:
                    cur_delay = max(cur_delay or 0.0, m * mult / n)
        else:
            in_agent_run = False  # sitemap etc. end an agent run
    flush()
    return groups


def _agent_score(agent_lc: str, token: str) -> "int | None":
    """Specificity of a group token for ``agent_lc``: 0 for ``*``,
    token length for a prefix match at a product-token boundary.
    RFC 9309 product tokens are letters/_/- : a continuation in
    alnum or '_' means a DIFFERENT token ('special' must not capture
    'specialbot-2' (r13 ADVICE) nor 'special_bot'); '-' is
    deliberately treated as a boundary anyway — the de-facto
    Googlebot convention where agent 'googlebot-image' falls back to
    a 'googlebot' group.  None = no match."""
    if token == "*":
        return 0
    if agent_lc.startswith(token) and (
        len(agent_lc) == len(token)
        or not (
            agent_lc[len(token)].isalnum()
            or agent_lc[len(token)] == "_"
        )
    ):
        return len(token)
    return None


def _best_group(groups: list, agent: str) -> "tuple | None":
    agent_lc = agent.lower()
    best_len, best = -1, None
    for g in groups:
        for a in g[0]:
            score = _agent_score(agent_lc, a)
            if score is not None and score > best_len:
                best_len, best = score, g
    return best


def _parse_robots(body: str, agent: str) -> "list[tuple[bool, str]]":
    """(allow, pattern) rules of the group that best matches ``agent``
    — group selection per RFC 9309 §2.2.1: longest boundary-valid
    token match; ``*`` loses to any specific match."""
    best = _best_group(_parse_groups(body), agent)
    return best[1] if best else []


def _parse_delay(body: str, agent: str) -> "float | None":
    """Politeness delay (seconds) of the best-matching group — the
    conservative merge of ``Crawl-delay`` and ``Request-rate``; None
    when the group declares neither."""
    best = _best_group(_parse_groups(body), agent)
    return best[2] if best else None


def robots_rules(
    robots_df: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Explode per-host robots.txt bodies into the rule table
    (:data:`RULE_SCHEMA`) for ``agent`` — parse once per host, a few
    tens of rows each, corpus-size independent.  ``body_col`` may be
    string or binary (decoded utf-8/replace, the de-facto wire
    tolerance)."""
    src = robots_df.select(
        F.col(host_col).cast("string").alias("host"),
        F.col(body_col).alias("_body"),
    )

    def explode(batches):
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["_body"]):
                if host is None or body is None:
                    continue
                if isinstance(body, (bytes, bytearray)):
                    body = bytes(body).decode("utf-8", "replace")
                for allow, pattern in _parse_robots(body, agent):
                    rows.append(
                        {
                            "host": host.lower(),
                            "allow": allow,
                            "pattern": pattern,
                            "pattern_re": _pattern_to_regex(pattern),
                            "pattern_len": len(pattern),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return src.mapInPandas(explode, schema=RULE_SCHEMA)


DELAY_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_s", T.DoubleType(), False),
    ]
)


def robots_delays(
    robots_df: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Per-host politeness delay table ``(host, crawl_delay_s)`` for
    ``agent`` — ``Crawl-delay`` (de-facto extension) merged with
    ``Request-rate: n/m`` (m/n seconds), most conservative wins.
    Hosts whose matching group declares neither are ABSENT (the
    caller's default applies — :func:`frontier_batches` takes this
    table as ``per_host_k`` input after a delay->k mapping).  Parse
    once per host, corpus-size independent — same contract as
    :func:`robots_rules`."""
    src = robots_df.select(
        F.col(host_col).cast("string").alias("host"),
        F.col(body_col).alias("_body"),
    )

    def explode(batches):
        for pdf in batches:
            hosts, delays = [], []
            for host, body in zip(pdf["host"], pdf["_body"]):
                if host is None or body is None:
                    continue
                if isinstance(body, (bytes, bytearray)):
                    body = bytes(body).decode("utf-8", "replace")
                d = _parse_delay(body, agent)
                if d is not None:
                    hosts.append(host.lower())
                    delays.append(float(d))
            if hosts:
                yield pd.DataFrame(
                    {"host": hosts, "crawl_delay_s": delays}
                )

    return src.mapInPandas(explode, schema=DELAY_SCHEMA)


SITEMAP_REF_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("sitemap_url", T.StringType(), False),
    ]
)


def _parse_sitemap_refs(body: str) -> "list[str]":
    """``Sitemap:`` directive values, in file order, duplicates
    dropped.  Per sitemaps.org / RFC 9309 §2.3 the directive is
    INDEPENDENT of groups (it may appear anywhere, applies to every
    agent), so this is a separate scan, not a group field — and the
    value is an absolute URL, kept verbatim (the caller canonicalizes;
    relative values are real-world noise and pass through for the
    fetch layer to reject)."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() != "sitemap":
            continue
        value = value.strip()
        if value and value not in seen:
            seen.add(value)
            out.append(value)
    return out


def robots_sitemaps(
    robots_df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Per-host sitemap discovery table ``(host, sitemap_url)`` from
    ``Sitemap:`` directives — the STANDARD entry point of crawl
    discovery (robots.txt is the one URL every crawler fetches first;
    its Sitemap lines point at the sitemaps ``sources.sitemaps``
    parses).  One row per distinct directive per host, file order not
    preserved across rows (this is a join table).  Hosts declaring no
    sitemap are absent.  Parse once per host, corpus-size independent
    — same contract as :func:`robots_rules`."""
    src = robots_df.select(
        F.col(host_col).cast("string").alias("host"),
        F.col(body_col).alias("_body"),
    )

    def explode(batches):
        for pdf in batches:
            hosts, urls = [], []
            for host, body in zip(pdf["host"], pdf["_body"]):
                if host is None or body is None:
                    continue
                if isinstance(body, (bytes, bytearray)):
                    body = bytes(body).decode("utf-8", "replace")
                for u in _parse_sitemap_refs(body):
                    hosts.append(host.lower())
                    urls.append(u)
            if hosts:
                yield pd.DataFrame({"host": hosts, "sitemap_url": urls})

    return src.mapInPandas(explode, schema=SITEMAP_REF_SCHEMA)


def robots_filter(
    df: DataFrame,
    robots_df: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Keep rows whose URL the matching robots.txt group ALLOWS for
    ``agent`` (RFC 9309: longest pattern wins, allow wins length ties,
    no match / no rules / unlisted host => allow).  ``robots_df`` is
    one row per host with the raw robots.txt body.

    The match target is path + '?' + query when a query is present
    (RFC 9309 §2.2.2); the scheme/port are host-table concerns.
    Input columns pass through unchanged; rows with NULL/unparseable
    URLs pass (this is a politeness gate, not a validity gate — chain
    ``url_filter`` for that)."""
    for c in ("_rb_host", "_rb_path"):
        if c in df.columns:
            raise ValueError(
                f"input column {c!r} collides with robots_filter staging"
            )
    url = F.col(url_col)
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    qstr = F.try_parse_url(url, F.lit("QUERY"))
    path0 = F.try_parse_url(url, F.lit("PATH"))
    # empty path fetches "/" (RFC 9309 §2.2.2)
    path1 = F.when(
        path0.isNull() | (path0 == ""), F.lit("/")
    ).otherwise(path0)
    path = F.when(
        qstr.isNotNull(), F.concat(path1, F.lit("?"), qstr)
    ).otherwise(path1)
    feats = df.select("*", host.alias("_rb_host"), path.alias("_rb_path"))

    rules = robots_rules(robots_df, agent, host_col, body_col)
    probe = (
        feats.select("_rb_host", "_rb_path")
        .filter(F.col("_rb_host").isNotNull())
        .distinct()
    )
    cand = probe.join(
        rules, probe["_rb_host"] == rules["host"], "inner"
    ).filter(F.expr("regexp_like(_rb_path, pattern_re)"))
    # longest pattern wins; allow beats disallow on equal length
    verdict = cand.groupBy("_rb_host", "_rb_path").agg(
        F.max(
            F.struct(
                F.col("pattern_len"),
                F.col("allow").cast("int").alias("_a"),
            )
        ).alias("_w")
    )
    denied = verdict.filter(F.col("_w._a") == 0).select(
        "_rb_host", "_rb_path"
    )
    return feats.join(
        denied, ["_rb_host", "_rb_path"], "left_anti"
    ).drop("_rb_host", "_rb_path")
