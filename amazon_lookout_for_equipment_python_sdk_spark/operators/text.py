"""Text analysis operators for LLM-scale data pipelines (BASELINE.json
north star: language-ID, quality scoring, token counting, fingerprinting).

All hot-path logic is built-in Spark SQL functions (JVM, codegen) — no
Python UDFs: tokenization is ``split``, shingling is higher-order array
functions, hashing is ``md5``.  Everything is deterministic and engine-
portable (verified against DuckDB oracles).

Scale: every operator is per-row (embarrassingly parallel, no shuffle);
aggregations that follow (dedup joins) are hash-partitioned on the derived
keys.
"""

from __future__ import annotations

import pandas as pd  # resolves pandas_udf type hints under postponed annotations
from typing import Iterator  # same: iterator-form pandas_udf hints resolve at module scope

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny deterministic stopword set for ratio features (synthetic corpus)
STOPWORDS = ("the", "a", "data", "row")

#: marker tokens per language for the n-gram/lexicon language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a"),
    "code": ("spark", "query", "join"),
    "db": ("table", "scan", "merge"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (corpus is single-spaced lowercase)."""
    return F.split(text, " ")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings — JVM-side higher-order functions:
    transform(sequence(1, len-n+1), i -> concat_ws(' ', slice(words, i, n))).
    Guarded for texts shorter than n words (Spark's sequence(1, 0) steps
    DOWN and slice(arr, 0, n) throws) — short texts yield []."""
    w = tokens(text)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def exploded_shingles(
    df: "DataFrame",
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    outer: bool = False,
) -> "DataFrame":
    """(id, shingle) rows, distinct per doc.  Projects the token array FIRST
    so ``split`` runs once per row — inlining it into the transform lambda
    re-evaluates it per shingle (O(tokens^2) per doc).  With ``outer``,
    docs shorter than the shingle width emit ONE (id, NULL) row instead of
    vanishing — callers that must report every input doc (contamination)
    then need no restore-join back to the source table."""
    words = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_w"))
    sh = F.when(
        F.size("_w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploder = F.explode_outer if outer else F.explode
    return words.select(
        id_col, exploder(F.array_distinct(sh)).alias("sh")
    )


def token_count(text: Column) -> Column:
    """Token count (whitespace tokenizer)."""
    return F.size(tokens(text))


#: BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs — the
#: GPT-2-style split classes minus the byte-level merges (which need a
#: learned vocabulary; this regex gives the pre-merge token stream whose
#: count upper-bounds the BPE count).  Plain character classes only, so
#: Java (Spark) and RE2 (DuckDB) regex engines agree exactly.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization (regex runs, JVM-side)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def stopword_count(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Count of stopword tokens (JVM array filter)."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords)))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features per document: token count, distinct-token
    count (type-token ratio basis), deterministic avg token length,
    stopword ratio.  All int arithmetic until one final division."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return df.select(
        *df.columns,
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(tokens(t))).alias("n_unique_tokens"),
        # single-spaced text: total token chars = len - (n_tokens - 1)
        ((F.length(t) - (n_tok - 1)) / n_tok.cast("double")).alias("avg_token_len"),
        (stopword_count(t) / n_tok.cast("double")).alias("stopword_ratio"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 1,
    max_tokens: int | None = None,
    max_stopword_ratio: float | None = None,
    min_avg_token_len: float | None = None,
    max_avg_token_len: float | None = None,
) -> DataFrame:
    """Training-data quality gate: keep documents passing the standard
    length/stopword/token-shape heuristics (the usual LLM-corpus cleanup
    pass).  Computes :func:`text_stats` once and filters on it — one
    row-local projection + filter, no shuffle."""
    out = text_stats(df, text_col)
    cond = F.col("n_tokens") >= min_tokens
    if max_tokens is not None:
        cond = cond & (F.col("n_tokens") <= max_tokens)
    if max_stopword_ratio is not None:
        cond = cond & (F.col("stopword_ratio") <= max_stopword_ratio)
    if min_avg_token_len is not None:
        cond = cond & (F.col("avg_token_len") >= min_avg_token_len)
    if max_avg_token_len is not None:
        cond = cond & (F.col("avg_token_len") <= max_avg_token_len)
    return out.filter(cond)


def repetition_stats(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style repetition signal (Rae et al. 2021 §A1.1: "fraction
    of duplicate n-grams"): per-document n-gram counts and the duplicated
    fraction 1 - distinct/total — high values flag boilerplate/spam for
    corpus filtering.

    Row-local projection (no shuffle); all-int arithmetic until one final
    division, like :func:`text_stats`.  Docs with fewer than ``n`` tokens
    emit 0 n-grams (callers filter or treat as non-repetitive)."""
    toks = tokens(F.col(text_col))
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", *([x] + [F.element_at(toks, i + j + 1) for j in range(1, n)])
        ),
    )
    return df.select(
        *df.columns,
        F.size(toks).alias("n_tokens"),
        F.size(grams).alias("n_ngrams"),
        F.size(F.array_distinct(grams)).alias("n_distinct_ngrams"),
    )


#: Rabin-Karp polynomial rolling-hash constants: base/modulus chosen so
#: every intermediate (255 * (M-1) * k) fits int64 — Spark's numpy path
#: and the DuckDB oracle's inlined polynomial compute identical values.
WINNOW_BASE = 257
WINNOW_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def winnow_pows(k: int) -> list[int]:
    """B^(k-1-j) mod M for j in 0..k-1 (shared with the SQL oracle)."""
    return [pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD) for j in range(k)]


def winnow_fingerprints_udf(k: int = 8, w: int = 4):
    """Winnowing fingerprint set (Schleimer, Wilkerson, Aiken, SIGMOD
    2003): Rabin-Karp-hash every char ``k``-gram, slide a window of ``w``
    hashes, keep each window's minimum — any two documents sharing a
    substring of length >= ``w + k - 1`` are guaranteed to share a
    fingerprint, the local-fingerprinting property plain min-hashing
    lacks.  Returns ``array<long>`` of the distinct selected hashes (the
    fingerprint SET is tie-rule-independent: leftmost and rightmost
    minimum pick the same value); texts shorter than ``k`` yield empty.

    Arrow-batched pandas UDF, NOT column expressions: per-char k-gram
    hashing in Spark's interpreted higher-order-function evaluator
    measured ~25x slower than this vectorized numpy rolling hash (8.4s vs
    0.3s at sf0.01) — the same justification as the shingle UDF in
    dedup.py.  Byte-level hashing == the oracle's char-level ``ord`` on
    ASCII corpora (multi-byte text would diverge; normalize first)."""

    pows = winnow_pows(k)

    @F.pandas_udf("array<long>")
    def udf(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            if t is None or len(t) < k:
                out.append([])
                continue
            c = np.frombuffer(
                t.encode("utf-8"), dtype=np.uint8
            ).astype(np.int64)
            n = len(c) - k + 1
            h = np.zeros(n, dtype=np.int64)
            for j in range(k):
                h = (h + c[j : j + n] * pows[j]) % WINNOW_MOD
            nw = max(n - w + 1, 1)
            m = h[:nw].copy()
            for d in range(1, min(w, n)):
                np.minimum(m, h[d : d + nw], out=m)
            out.append(np.unique(m).tolist())
        return pd.Series(out)

    return udf


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the text (corpus is already normalized;
    callers can pre-apply lower/trim/space-collapse for raw corpora)."""
    return F.md5(text)


def fingerprint_bucket(text: Column, hex_chars: int = 12) -> Column:
    """Numeric fingerprint bucket: first ``hex_chars`` hex digits of the md5
    as a long — a rolling-hash-style shard key that survives engines
    (conv(hex,16,10); <=15 hex chars fits in int64)."""
    return F.conv(F.substring(fingerprint(text), 1, hex_chars), 16, 10).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-token counts per candidate language (lexicon heuristic)."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: argmax of marker counts with deterministic
    tie-break by language name; 'und' when no marker appears."""
    scores = lang_scores(F.col(text_col))
    # argmax with name tie-break via greatest over (count, reversed-name) —
    # expressed as a chain of when() for exactly-portable semantics
    langs = sorted(scores)  # tie -> first alphabetically
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    out_cols = [df[c] for c in df.columns]
    out_cols += [scores[lang].alias(f"score_{lang}") for lang in langs]
    out_cols.append(best.alias("pred_lang"))
    return df.select(*out_cols)


# --- text normalization (the C4/CCNet cleanup pass) -------------------------

#: typographic chars folded to ASCII: curly quotes, dashes, ellipsis, NBSP
_NORM_FROM = "‘’“”–—… "
_NORM_TO = "''\"\"--. "
#: C0 control chars except \t \n \r (Java and RE2 agree on this class)
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def normalize_text(text: Column, lowercase: bool = False) -> Column:
    """Codegen-only corpus text cleanup (no UDF): fold typographic
    unicode (curly quotes/dashes/ellipsis/NBSP) to ASCII via one
    ``translate``, strip C0 control characters, collapse whitespace runs
    to single spaces, trim.  The deterministic subset of ftfy-style
    fixing that two engines can agree on byte-for-byte —
    ``sql_normalize_text`` is the DuckDB mirror, verified by md5 in the
    registered query."""
    out = F.translate(text, _NORM_FROM, _NORM_TO)
    out = F.regexp_replace(out, _CTRL_RE, "")
    out = F.regexp_replace(out, "\\s+", " ")
    out = F.trim(out)
    return F.lower(out) if lowercase else out


def sql_normalize_text(expr: str, lowercase: bool = False) -> str:
    """DuckDB mirror of :func:`normalize_text` (RE2 'g' flag makes
    regexp_replace global, matching Spark's replace-all default)."""
    from_esc = _NORM_FROM
    to_esc = _NORM_TO.replace("'", "''")
    out = f"translate({expr}, '{from_esc}', '{to_esc}')"
    out = f"regexp_replace({out}, '{_CTRL_RE}', '', 'g')"
    out = f"regexp_replace({out}, '\\s+', ' ', 'g')"
    out = f"trim({out})"
    return f"lower({out})" if lowercase else out


# --- feature-hashing document embeddings ------------------------------------


def hashed_embedding_udf(dim: int = 64, scale: int = 10_000):
    """Deterministic document embeddings via the hashing trick (Weinberger
    et al. 2009), as an Arrow pandas UDF returning ``array<double>``:
    each token hashes to a dimension (48-bit md5 prefix mod dim) and a
    sign (bit 8 — decorrelated from the index for dims <= 256), signed
    counts accumulate, the vector L2-normalizes onto a 1/scale grid.

    Gives every document a dense vector WITHOUT a model — the
    featurization bridge from raw text to the ANN/near-dup layer
    (cold-start dedup, cheap clustering).  Zero shuffle, and bit-exact
    against the SQL md5 replay (the interpreted higher-order-function
    formulation was measured ~50x slower — same winnowing lesson:
    per-token work belongs in numpy, not nested codegen lambdas).

    r15 (guide §4.2/§4.5): ITERATOR form, so the token -> (dim, sign)
    cache — md5 is the dominant cost and vocabulary repeats heavily —
    amortizes across every batch of a task instead of resetting per
    batch, and the normalize runs as one vectorized numpy expression per
    row (same IEEE op order as the scalar loop it replaces: v/nrm,
    *scale, floor, /scale — elementwise, so bit-identical)."""
    import hashlib

    import numpy as np

    @F.pandas_udf("array<double>")
    def udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, tuple[int, int]] = {}
        zero = [0.0] * dim

        def embed(txt):
            if txt is None:
                return zero
            acc = np.zeros(dim, dtype=np.int64)
            for t in txt.split(" "):
                if not t:
                    continue
                e = cache.get(t)
                if e is None:
                    hv = int(
                        hashlib.md5(t.encode("utf-8")).hexdigest()[:12], 16
                    )
                    e = (hv % dim, 1 if (hv >> 8) & 1 else -1)
                    cache[t] = e
                acc[e[0]] += e[1]
            sq = int(np.dot(acc, acc))
            if sq == 0:
                return zero
            nrm = float(np.sqrt(float(sq)))
            # exact float op order of the oracle: v/nrm, *scale, floor
            return (np.floor(acc / nrm * scale) / scale).tolist()

        for texts in batches:
            yield texts.map(embed)

    return udf


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    para_sep: str = "\n\n",
    top_n: int = 2,
) -> DataFrame:
    """Gopher repetition-rule family (Rae et al. 2021 §A1.1 — the
    standard LLM-corpus boilerplate gate, also used by RefinedWeb /
    Dolma pipelines): per-document duplicate-LINE and
    duplicate-PARAGRAPH fractions (unit-count and character-mass
    forms) plus the top-``n``-gram coverage signal.  Complements
    :func:`repetition_stats` (the duplicate-n-gram FRACTION) with the
    structural-unit rules.

    Per document:

    - ``n_lines`` / ``dup_line_frac`` / ``dup_line_char_frac`` — lines
      = non-empty ``line_sep`` splits; a line is "duplicated" when its
      exact text occurs more than once in the doc, and the fractions
      count ALL its occurrences (unit count and character mass) over
      the doc's line totals.
    - ``n_paras`` / ``dup_para_frac`` / ``dup_para_char_frac`` — same
      over ``para_sep`` splits.
    - ``top_ngram_char_frac`` — the most COVERING token ``top_n``-gram's
      character mass (count x gram length) over the total n-gram
      character mass.  Deviation from Gopher's most-FREQUENT-gram /
      len(text) form, deliberately: max-of-products is tie-free and
      order-independent, which a distributed exact oracle needs; the
      two agree whenever the most frequent gram is unique.

    Docs with zero units of a kind emit NULL fractions for it.

    Scale: ONE explode of (kind, unit) rows -> groupBy(id, kind, unit)
    with map-side partial counts (the shuffle ships one row per
    distinct unit, not per occurrence) -> per-(id, kind) rollup ->
    conditional-aggregation pivot back to one row per doc.  No
    per-document quadratic HOF (a spam doc with 100k identical lines
    costs O(n), not O(n^2))."""
    toks = tokens(F.col(text_col))
    grams = F.transform(
        F.slice(
            toks, 1, F.greatest(F.size(toks) - (top_n - 1), F.lit(0))
        ),
        lambda x, i: F.concat_ws(
            " ",
            *([x] + [F.element_at(toks, i + j + 1) for j in range(1, top_n)]),
        ),
    )
    nonempty = lambda arr: F.filter(arr, lambda u: u != "")  # noqa: E731
    units = F.concat(
        F.transform(
            nonempty(F.split(F.col(text_col), F.lit(line_sep), -1)),
            lambda u: F.struct(F.lit("line").alias("kind"), u.alias("u")),
        ),
        F.transform(
            nonempty(F.split(F.col(text_col), F.lit(para_sep), -1)),
            lambda u: F.struct(F.lit("para").alias("kind"), u.alias("u")),
        ),
        F.transform(
            grams,
            lambda u: F.struct(F.lit("gram").alias("kind"), u.alias("u")),
        ),
    )
    exploded = df.select(
        F.col(id_col), F.explode(units).alias("ku")
    ).select(id_col, F.col("ku.kind").alias("_kind"), F.col("ku.u").alias("_u"))
    counted = exploded.groupBy(id_col, "_kind", "_u").agg(
        F.count(F.lit(1)).alias("_c")
    )
    mass = F.col("_c") * F.length("_u")
    dup = F.col("_c") > 1
    per_kind = counted.groupBy(id_col, "_kind").agg(
        F.sum("_c").alias("_n"),
        F.sum(F.when(dup, F.col("_c")).otherwise(0)).alias("_dn"),
        F.sum(mass).alias("_m"),
        F.sum(F.when(dup, mass).otherwise(0)).alias("_dm"),
        F.max(mass).alias("_top"),
    )

    def k(kind, col):
        return F.max(F.when(F.col("_kind") == kind, F.col(col)))

    frac = lambda num, den: num / den.cast("double")  # noqa: E731
    return per_kind.groupBy(id_col).agg(
        k("line", "_n").alias("n_lines"),
        frac(k("line", "_dn"), k("line", "_n")).alias("dup_line_frac"),
        frac(k("line", "_dm"), k("line", "_m")).alias("dup_line_char_frac"),
        k("para", "_n").alias("n_paras"),
        frac(k("para", "_dn"), k("para", "_n")).alias("dup_para_frac"),
        frac(k("para", "_dm"), k("para", "_m")).alias("dup_para_char_frac"),
        frac(k("gram", "_top"), k("gram", "_m")).alias("top_ngram_char_frac"),
    )
