"""URL-level corpus gates — the first filter in a crawl pipeline.

Every production crawl-to-corpus chain (RefinedWeb/FineWeb/Dolma style)
gates on the URL before touching payload bytes: scheme allowlists,
domain blocklists (UT1-style lists hold millions of domains), and
path-shape heuristics.  This module completes the engine's crawl chain
(sources/warc.py → here → html → quality → dedup) with Spark-built-in
parsing (``parse_url`` — JVM-side, whole-stage codegen) and a
JOIN-based blocklist probe that scales to multi-million-entry lists.

Scale design:

- **Features are row-local** (one projection, no shuffle).
- **Domain blocking is a suffix SEMI-JOIN, not a predicate chain**: a
  host matches a blocked domain when ANY dot-suffix of the host equals
  a list entry (``ads.tracker.example.com`` is blocked by
  ``example.com``).  Building the OR-of-endswith predicate inlines the
  whole list into the plan — fine for tens of entries, catastrophic
  for a UT1-sized list.  Instead the host explodes into its ≤ ~10
  dot-suffixes and LEFT ANTI joins the blocklist on equality; Spark
  broadcasts a small list and shuffle-joins a huge one, both exact.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: columns :func:`url_features` appends; inputs may not already carry
#: them (the select('*', ...) would silently duplicate the name and
#: every downstream F.col reference would die ambiguous mid-plan).
FEATURE_COLS = ("scheme", "host", "tld", "path_depth", "has_query")

#: staging names :func:`url_filter`'s blocklist probe introduces —
#: withColumn would silently REPLACE a same-named input column.
_FILTER_INTERNAL = ("_sfx", "_blk_domain", "_blk_host")


def _guard_clashes(df: DataFrame, reserved: "tuple[str, ...]") -> None:
    clash = sorted(set(df.columns) & set(reserved))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with url operator outputs; "
            "rename them first (same loud-guard contract as "
            "_chunkjoin.guard_internal)"
        )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Row-local URL anatomy: ``scheme``, ``host``, ``registered-ish``
    TLD, path depth, and query presence — the columns downstream
    filters and per-domain rollups group on.  NULL/unparseable URLs
    yield NULL features (``parse_url`` semantics).  Raises on input
    frames already carrying a feature column (r12 ADVICE)."""
    _guard_clashes(df, FEATURE_COLS)
    url = F.col(url_col)
    # try_parse_url: ANSI mode (Spark 4 default) makes parse_url THROW
    # on a malformed URL — one bad row must not sink a crawl batch
    host = F.try_parse_url(url, F.lit("HOST"))
    path = F.try_parse_url(url, F.lit("PATH"))
    # split("://", 1)[0] rather than a regex: parse_url has no SCHEME part
    scheme = F.when(
        url.contains("://"), F.split(url, "://", 2).getItem(0)
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    return df.select(
        "*",
        F.lower(scheme).alias("scheme"),
        F.lower(host).alias("host"),
        F.element_at(F.split(F.lower(host), r"\."), -1).alias("tld"),
        F.size(segs).alias("path_depth"),
        F.try_parse_url(url, F.lit("QUERY")).isNotNull().alias("has_query"),
    )


def _host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host, most-specific first:
    ``a.b.c`` -> ``[a.b.c, b.c, c]`` — JVM-side transform, no UDF."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains: "DataFrame | None" = None,
    allowed_schemes: "tuple[str, ...]" = ("http", "https"),
    max_path_depth: "int | None" = None,
    keep_null_urls: bool = False,
) -> DataFrame:
    """Keep rows whose URL passes the crawl gates; returns the input
    columns plus the :func:`url_features` columns.

    ``blocked_domains`` is a one-column DataFrame (``domain``,
    lowercase, no scheme) — a row is dropped when ANY dot-suffix of
    its host equals an entry, so listing ``example.com`` also blocks
    every subdomain.  Passed as a DataFrame (not a Python list) so a
    UT1-scale list stays distributed; wrap small lists with
    ``spark.createDataFrame``.  NULL/unparseable URLs drop unless
    ``keep_null_urls``."""
    if blocked_domains is not None:
        _guard_clashes(df, _FILTER_INTERNAL)
    feats = url_features(df, url_col)
    cond = F.col("scheme").isin(*[s.lower() for s in allowed_schemes])
    if max_path_depth is not None:
        cond = cond & (
            F.col("path_depth").isNull()
            | (F.col("path_depth") <= max_path_depth)
        )
    if keep_null_urls:
        cond = cond | F.col(url_col).isNull()
    else:
        cond = cond & F.col("host").isNotNull()
    out = feats.filter(cond)
    if blocked_domains is None:
        return out
    dom_col = blocked_domains.columns[0]
    block = blocked_domains.select(
        F.lower(F.col(dom_col)).alias("_blk_domain")
    )
    exploded = out.withColumn(
        "_sfx", F.explode_outer(_host_suffixes(F.col("host")))
    )
    hit = exploded.join(
        block,
        exploded["_sfx"] == block["_blk_domain"],
        "left_semi",
    ).select(F.col("host").alias("_blk_host")).distinct()
    return out.join(
        hit, out["host"] == hit["_blk_host"], "left_anti"
    )


# ---------------------------------------------------------------------------
# URL canonicalization (r13) — the dedup-critical normalizer
# ---------------------------------------------------------------------------

#: query parameters that carry tracking state, not content identity —
#: the widely-published cross-site set (utm_* is matched by prefix).
TRACKING_PARAMS = frozenset(
    {"gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid"}
)

_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_DEFAULT_PORT = {"http": ":80", "https": ":443"}

#: WHATWG URL pre-processing strips leading/trailing C0 controls and
#: space (and Python's urlsplit does the same on its NEXT parse) — the
#: canonical output must be a fixed point of that strip, or one-pass
#: and re-canonicalized pipelines key the same URL differently.
_C0_OR_SPACE = "".join(chr(i) for i in range(0x21))


def _norm_pct(s: str) -> str:
    """RFC 3986 §6.2.2.1-2: uppercase %XX hex, decode UNRESERVED
    octets (ALPHA / DIGIT / - . _ ~) — the only percent-normalizations
    that never change meaning."""

    def sub(m: "re.Match[str]") -> str:
        b = int(m.group(1), 16)
        c = chr(b)
        if (c.isascii() and c.isalnum()) or c in "-._~":
            return c
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(sub, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — exact algorithm, NOT posixpath.normpath
    (which also collapses // and strips trailing slashes, both
    meaning-changing on the web)."""
    out: list[str] = []
    i, n = 0, len(path)
    while i < n:
        j = path.find("/", i + 1) if path[i] == "/" else path.find("/", i)
        seg = path[i:] if j < 0 else path[i:j]
        nxt = n if j < 0 else j
        if seg in ("/.", "."):
            if j < 0:
                out.append("/")  # trailing /. keeps the slash
            i = nxt
        elif seg in ("/..", ".."):
            if out:
                out.pop()
            if j < 0:
                out.append("/")
            i = nxt
        else:
            out.append(seg)
            i = nxt
    return "".join(out)


def canonicalize_one(
    url: "str | None",
    strip_tracking: bool = True,
    sort_query: bool = True,
    strip_fragment: bool = True,
    fold_idn: bool = False,
) -> "str | None":
    """Canonical form of one URL (row-local; see
    :func:`canonicalize_url` for the column operator and the policy
    knobs).  Unparseable input returns itself — this is a dedup
    normalizer, not a validity gate."""
    if url is None:
        return None
    try:
        from urllib.parse import urlsplit

        # WHATWG pre-processing: strip boundary C0/space, remove
        # tab/CR/LF everywhere (urlsplit does both on re-parse; doing
        # it here makes the fixed-point contract explicit)
        cleaned = url.strip(_C0_OR_SPACE)
        for ch in "\t\r\n":
            if ch in cleaned:
                cleaned = cleaned.replace(ch, "")
        parts = urlsplit(cleaned)
        if not parts.scheme or not parts.netloc:
            return url
        scheme = parts.scheme.lower()
        # netloc = [userinfo@]host[:port] — each normalization can
        # expose work for another (trailing-dot strip can expose
        # ':80', 'u@H.io:80.'; dropping a default port can expose a
        # second ':digits' tail, 'h:80:443'), so iterate the three
        # steps to convergence instead of hand-ordering them (r12
        # fixed one interleaving, r14 fuzzing found two more)
        # split userinfo off BEFORE case-folding: RFC 3986 §6.2.2.1
        # case-normalizes only scheme and host — userinfo is
        # case-sensitive ('Alice@h.com' and 'alice@h.com' are
        # different resources, and folding would corrupt credentials
        # a fetcher replays; r14 review)
        info, at, hostport = parts.netloc.rpartition("@")
        hostport = hostport.lower()
        default_port = _DEFAULT_PORT.get(scheme)
        if hostport.startswith("["):  # bracketed IPv6 literal
            end = hostport.find("]")
            host = hostport[: end + 1]
            port = hostport[end + 1 :]
            if port == default_port:
                port = ""
        else:
            host, port = hostport, ""
            changed = True
            while changed:
                changed = False
                stripped = host.rstrip(".")
                if stripped != host:
                    host, changed = stripped, True
                if not port:
                    maybe_host, colon, maybe_port = host.rpartition(":")
                    if colon and maybe_port.isdigit():
                        host, port = maybe_host, ":" + maybe_port
                        changed = True
                if port == default_port:
                    port, changed = "", True
        if fold_idn and host and not host.startswith("["):
            # ASCII-fold a unicode host to its punycode (ACE) form so
            # http://bücher.example and http://xn--bcher-kva.example
            # dedup-key together; already-ASCII labels (incl. xn--)
            # pass through unchanged, so the fold is idempotent.
            # stdlib idna = IDNA 2003, not full UTS-46 mapping — the
            # documented seam; hosts it rejects stay case-folded only.
            try:
                host = host.encode("idna").decode("ascii").lower()
            except UnicodeError:
                pass
        netloc = (info + at if at else "") + host + port
        # RFC 3986 §6.2.2 order: percent-normalize FIRST (§6.2.2.1-2:
        # %2E -> '.'), THEN remove dot segments (§6.2.2.3) — reversed,
        # '/%2e%2e/a' decodes to '/../a' AFTER dot removal and a
        # second pass collapses it further (r13 ADVICE)
        path = _remove_dot_segments(_norm_pct(parts.path)) or "/"
        # query too: decode unreserved octets BEFORE sorting so
        # '%62=1' sorts as 'b=1', not at the '%' codepoint (decoding
        # never produces '&' or '=', so pair-splitting stays safe)
        query = _norm_pct(parts.query)
        if query:
            pairs = [
                p.split("=", 1) if "=" in p else [p, None]
                for p in query.split("&")
                if p != ""
            ]
            if strip_tracking:
                pairs = [
                    kv
                    for kv in pairs
                    if not (
                        kv[0].lower().startswith("utm_")
                        or kv[0].lower() in TRACKING_PARAMS
                    )
                ]
            if sort_query:
                pairs.sort(key=lambda kv: (kv[0], kv[1] or ""))
            query = "&".join(
                k if v is None else f"{k}={v}" for k, v in pairs
            )
        # fragment/query removal can EXPOSE boundary whitespace the
        # next parse would strip ('http://E.com/ #f' -> '.../ ', r13
        # verdict bug) — whatever component ENDS the URL must not end
        # in C0/space, cascading when stripping empties it.  Done
        # per-component (not out.strip()) so a query/fragment that
        # legitimately ends in '?'/'#' never loses its separator.
        frag = parts.fragment if not strip_fragment else ""
        if frag:
            frag = frag.rstrip(_C0_OR_SPACE)
        if not frag:
            if query:
                query = query.rstrip(_C0_OR_SPACE)
            if not query:
                path = path.rstrip(_C0_OR_SPACE) or "/"
        out = f"{scheme}://{netloc}{path}"
        if query:
            out += "?" + query
        if frag:
            out += "#" + frag
        return out
    except ValueError:
        return url


def canonicalize_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    strip_tracking: bool = True,
    sort_query: bool = True,
    strip_fragment: bool = True,
    fold_idn: bool = False,
) -> DataFrame:
    """Add the canonical URL column — the normalizer URL-level dedup
    keys on (the same page hides behind case variants, default ports,
    dot-segments, fragments, tracking params, and query-param order).

    RFC 3986 §6 normalizations are applied unconditionally (scheme/
    host case, default ports, dot segments, unreserved percent-decode,
    %XX case, empty path -> ``/``); the three POLICY knobs default to
    the common crawl-dedup stance and are flags because each can merge
    genuinely distinct pages on adversarial sites: ``strip_tracking``
    (utm_*/click-id params), ``sort_query`` (param order rarely
    matters; RFC makes no promise), ``strip_fragment`` (fragments are
    client-side).  Unparseable URLs pass through unchanged.

    Row-local Arrow kernel — zero shuffle.  ``fold_idn`` (default off)
    additionally ASCII-folds unicode hosts to punycode via the stdlib
    idna codec so ``bücher.example`` and ``xn--bcher-kva.example`` key
    together; stdlib idna is IDNA 2003, not full UTS-46 mapping — the
    documented seam — and hosts it rejects stay case-folded only."""
    if out_col in df.columns:
        raise ValueError(
            f"input column {out_col!r} collides with canonicalize_url "
            "output; rename it or pass a different out_col"
        )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _canon(s: pd.Series) -> pd.Series:
        return s.map(
            lambda u: canonicalize_one(
                u, strip_tracking, sort_query, strip_fragment, fold_idn
            )
        )

    # asNondeterministic: downstream joins key on host/path expressions
    # DERIVED from this column, so Catalyst infers isnotnull filters on
    # them and pushes the filters below this projection — re-running the
    # whole canonicalize kernel once for the filter and again for the
    # output (guide §4.4; the r15 audit counted doubled _canon nodes in
    # both sitemap legs of crawl_chain_gates).  The kernel is a pure
    # string map; ND only stops the optimizer from cloning it.
    return df.withColumn(
        out_col, _canon.asNondeterministic()(F.col(url_col))
    )
