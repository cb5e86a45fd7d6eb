"""n-gram language-model scoring — the CCNet-style perplexity quality
filter (Wenzek et al. 2020 train a KenLM n-gram LM and keep the
low-perplexity head of the crawl).

Spark-first shape: the LM **is a DataFrame** — the bigram count table —
and scoring is one join keyed on the bigram.  Everything is built from
two hash aggregations over the corpus (bigram counts; prefix counts
derived FROM the bigram table, no second corpus scan) plus one distinct
count for the vocabulary size; per-document cross-entropy is then a
bigram-keyed join of the document's bigrams against the probability
table followed by a per-doc hash agg.  No window functions, no UDFs,
no driver-side model state — at 100 TB both the corpus and the LM table
shard by the bigram key, and the join is shuffle-on-bigram (or
broadcast, when the LM was trained on a small held-out reference corpus,
which is the CCNet setup).

Determinism across engines (the DuckDB oracle hash-compares values):
``ln`` is the one non-correctly-rounded primitive here, so each
bigram's log-probability is floored onto a 1e-4 grid IMMEDIATELY
(``floor(ln(p)*1e4)`` as BIGINT); a 1-ulp libm disagreement only
matters if the true value sits within ~1e-16 of a grid line.  Per-doc
totals are integer sums of those quantized values — order-independent —
and the final division is IEEE-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens
from .._persist import note_persist as _note_persist

#: log-prob quantization grid (decimal places)
LP_SCALE = 4


def doc_bigrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unigram_sentinels: bool = False,
) -> DataFrame:
    """Explode each document into its consecutive token bigrams:
    ``(id, w1, w2)``, one row per bigram OCCURRENCE (not distinct).
    Row-local; docs with fewer than two tokens emit nothing — unless
    ``unigram_sentinels`` is set, in which case a single-token doc emits
    one ``(id, tok, NULL)`` sentinel row.  Sentinels make the corpus
    VOCABULARY exactly derivable from the bigram table (every token
    appears as some row's w1 or w2), so training needs no separate
    corpus-wide token scan; filter ``w2 IS NOT NULL`` to recover the
    true bigrams."""
    w = tokens(F.col(text_col))
    empty = F.array().cast("array<struct<w1:string,w2:string>>")
    pairs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.struct(
                F.element_at(w, i).alias("w1"),
                F.element_at(w, i + 1).alias("w2"),
            ),
        ),
    )
    if unigram_sentinels:
        pairs = pairs.otherwise(
            F.when(
                F.size(w) == 1,
                F.array(
                    F.struct(
                        F.element_at(w, 1).alias("w1"),
                        F.lit(None).cast("string").alias("w2"),
                    )
                ),
            ).otherwise(empty)
        )
    else:
        pairs = pairs.otherwise(empty)
    return df.select(id_col, F.explode(pairs).alias("_b")).select(
        id_col, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2")
    )


def doc_bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unigram_sentinels: bool = False,
) -> DataFrame:
    """Per-document distinct-bigram occurrence counts ``(id, w1, w2, _n)``
    — the shared base of BOTH training and scoring.  With
    ``unigram_sentinels`` single-token docs contribute ``(tok, NULL)``
    rows (see :func:`doc_bigrams`) so the vocabulary derives from this
    frame with no extra corpus scan.

    Pass the SAME returned frame to :func:`bigram_lm` (as ``doc_counts``)
    and :func:`doc_cross_entropy`: training then re-aggregates the
    COLLAPSED per-doc counts instead of re-exploding the corpus, which
    lets Catalyst satisfy both aggregations from one (w1, w2)-compatible
    partitioning (measured ~1.6x on the registered query).  Note Spark's
    ReuseExchange does NOT dedup the two branches (its canonicalizer
    rejects these multi-branch agg shapes), so the corpus scan itself
    still runs per branch — :func:`bigram_lm`'s ``persist`` option caps
    corpus traversals at two by caching the much smaller CORPUS-level
    bigram table instead of this per-doc frame (A/B at sf0.1: caching
    this frame costs more in materialization barrier than the saved
    recompute; see plans/llmops.py bigram_lm_q)."""
    return (
        doc_bigrams(df, text_col, id_col, unigram_sentinels)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("_n"))
    )


def bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_counts: DataFrame | None = None,
    counts_have_sentinels: bool = False,
    persist: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Train the add-one-smoothed bigram LM: returns ``(lp_table,
    vocab_size_df)`` where ``lp_table`` is ``(w1, w2, lp4)`` —
    ``lp4 = floor(ln((c12+1)/(c1+V)) * 1e4)`` — and ``vocab_size_df`` is
    the one-row ``(v: long)`` vocabulary size.

    The prefix counts ``c1`` come from re-aggregating the bigram table
    (sum of c12 per w1), not from a second corpus scan, so training is
    exactly one corpus-wide shuffle (on the bigram) plus one |bigrams|-
    sized reshuffle on w1.

    ``counts_have_sentinels`` (with a ``doc_counts`` built via
    ``unigram_sentinels=True``): the VOCABULARY also derives from the
    bigram table — every corpus token appears as some row's w1/w2 — so
    training touches the corpus zero extra times.  Without sentinels the
    vocab falls back to a corpus-wide distinct-token scan.

    ``persist``: cache the corpus-LEVEL bigram count table (the LM
    itself — |distinct bigrams| rows, far smaller than the corpus or the
    per-doc frame) so its three consumers (lp, c1, vocab) share one
    materialization.  With sentinels+persist the whole train+score
    pipeline makes exactly TWO corpus traversals.  Opt-in because at
    small scale recompute-with-stage-overlap measures faster than the
    materialization barrier (sf0.1 A/B in plans/llmops.py); at corpus
    scale the saved scans dominate."""
    if doc_counts is not None:
        # re-aggregate the per-doc counts: identical totals, and the
        # (id, w1, w2) exchange is shared with the scoring branch
        c12_all = doc_counts.groupBy("w1", "w2").agg(
            F.sum("_n").alias("c12")
        )
    else:
        bg = doc_bigrams(
            corpus, text_col, id_col, unigram_sentinels=True
        )
        c12_all = bg.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("c12")
        )
        counts_have_sentinels = True
    if persist:
        from pyspark import StorageLevel

        # DISK_ONLY: the LM table is corpus-proportional (one row per
        # distinct bigram — Heaps-law growth), and a serialized
        # memory-eligible level risks BlockManager's whole-block
        # read-back promotion once blocks spill (the r9 sf30 OOM class,
        # BASELINE.md r9 addendum 2).  Its three consumers stream the
        # table from page-cached disk; at corpus scale the saved
        # full-text scans dominate the sliver re-reads by orders of
        # magnitude either way.
        c12_all = c12_all.persist(StorageLevel.DISK_ONLY).transform(_note_persist)
    if counts_have_sentinels:
        c12 = c12_all.filter(F.col("w2").isNotNull())
        vocab = (
            c12_all.select(F.explode(F.array("w1", "w2")).alias("tok"))
            .filter(F.col("tok").isNotNull())
            .agg(F.count_distinct("tok").alias("v"))
        )
    else:
        c12 = c12_all
        vocab = corpus.select(
            F.explode(tokens(F.col(text_col))).alias("tok")
        ).agg(F.count_distinct("tok").alias("v"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    lp = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.floor(
                F.log(
                    (F.col("c12") + 1)
                    / (F.col("c1") + F.col("v")).cast("double")
                )
                * F.lit(float(10 ** LP_SCALE))
            )
            .cast("long")
            .alias("lp4"),
        )
    )
    return lp, vocab


def doc_cross_entropy(
    df: DataFrame,
    lp_table: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_lm: bool = False,
    doc_counts: DataFrame | None = None,
) -> DataFrame:
    """Score each document against a trained bigram LM: ``(id,
    n_bigrams, xent)`` with ``xent = -(mean quantized log-prob)`` in
    nats — low = fluent under the LM (CCNet keeps the low-xent head).

    Bigrams unseen in training score at the vocabulary floor
    ``floor(ln(1/V))`` (the unknown-context fallback).  Set ``broadcast_lm=True`` when the LM was trained on a (small)
    reference corpus — the join then ships no corpus bytes at all."""
    # collapse to per-doc DISTINCT bigram counts before the LM join: the
    # join then moves |distinct bigrams per doc| rows instead of every
    # occurrence (natural text repeats bigrams heavily), and the partial
    # agg happens map-side before the shuffle
    bg = (
        doc_counts
        if doc_counts is not None
        else doc_bigram_counts(df, text_col, id_col)
    )
    # a sentinel-carrying counts frame (w2 NULL rows for single-token
    # docs) must not score those rows as unseen bigrams; real bigrams
    # never have NULL w2, so the filter is semantics-free otherwise
    bg = bg.filter(F.col("w2").isNotNull())
    scale = float(10 ** LP_SCALE)
    lm = F.broadcast(lp_table) if broadcast_lm else lp_table
    # unseen-(w1,w2) back-off would need c1+V per prefix; rather than
    # carry a second table, score unseen pairs at the vocabulary floor
    # ln(1/V) — the standard "unknown context" fallback.  The floor is
    # computed as an EXPRESSION over the broadcast v row (not a separate
    # derived frame, which would re-scan the corpus for vocab a second
    # time in this branch).
    scored = (
        bg.join(lm, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_floor_lp",
            F.floor(
                F.log(F.lit(1.0) / F.col("v").cast("double")) * scale
            ).cast("long"),
        )
        .select(
            id_col,
            F.col("_n"),
            (
                F.coalesce(F.col("lp4"), F.col("_floor_lp")) * F.col("_n")
            ).alias("_lp4n"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("_n").alias("n_bigrams"),
        (
            -F.sum("_lp4n").cast("double")
            / (F.sum("_n") * F.lit(scale))
        ).alias("xent"),
    )
