"""Distributed BPE tokenizer training (Sennrich et al. 2016) + encoding.

The trainer is Spark-shaped the way a 100 TB tokenizer build actually
runs: the corpus collapses ONCE into the distinct-word frequency table
(one hash agg — everything after is vocabulary-sized, corpus size never
appears again), and each merge iteration is a pair-count hash aggregation
over that table plus a row-local greedy merge rewrite.  Only the single
argmax row (the winning pair) crosses to the driver per iteration — the
same scalar-per-iteration pattern as the connected-components loop in
operators/dedup.py.  The learned merge list is tiny (n_merges rows) and
broadcasts into the Arrow-batched encoder.

Determinism: ties on pair count break lexicographically, so the merge
sequence is reproducible across cluster sizes and partitionings.
"""

from __future__ import annotations

import pandas as pd  # resolves pandas_udf type hints under postponed annotations
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens
from .._persist import note_persist as _note_persist

#: end-of-word sentinel (Sennrich's </w>) — lets the encoder distinguish
#: word-final subwords so decode can restore word boundaries
EOW = "▁"


def _adjacent_pairs(syms: Column) -> Column:
    """All consecutive symbol pairs of a symbol array, row-local."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _merge_once(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent ``(a, b)`` into ``a+b`` —
    the BPE rewrite step, as a fold: append each symbol, fusing it with
    the accumulator's tail when the pair matches."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) >= 1)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freq_table(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus -> ``(word, freq, syms)``: distinct words with counts and
    their initial symbol decomposition (characters + end-of-word mark).
    The ONLY corpus-sized operation in BPE training."""
    words = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return words.withColumn("syms", F.concat(chars, F.array(F.lit(EOW))))


def bpe_train(
    corpus: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus.

    Each iteration: one pair-count hash agg over the vocabulary table
    (weighted by word frequency), a deterministic argmax (count desc,
    then lexicographic pair), and a row-local rewrite.  Stops early when
    no pair reaches ``min_pair_freq``.  The working table is persisted
    and lineage-cut per iteration (localCheckpoint) so the plan does not
    deepen with the merge count.

    Memory note: the word-frequency table grows with the DISTINCT-word
    vocabulary (Heaps' law) — the canonical use trains on a corpus
    SAMPLE, which keeps it comfortably cached.  The persist level is
    the deserialized default, whose disk read-back streams values (no
    whole-block promotion — the r9 OOM class only hits serialized
    memory-eligible levels, BASELINE.md r9 addendum 2), so a caller
    training on an unsampled corpus degrades to disk streaming, not
    OOM."""
    wt = word_freq_table(corpus, text_col).persist().transform(_note_persist)
    wt.count()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            best = (
                wt.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("_p"))
                .groupBy("_p.a", "_p.b")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                .collect()
            )
            if not best or best[0].cnt < min_pair_freq:
                break
            a, b = best[0].a, best[0].b
            merges.append((a, b))
            nxt = wt.withColumn(
                "syms", _merge_once(F.col("syms"), a, b)
            ).localCheckpoint(eager=True)
            wt.unpersist()
            wt = nxt
    finally:
        wt.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned merges to every document: adds ``out_col`` —
    ``array<string>`` of subword tokens (word-final pieces carry the
    end-of-word mark).  The merge loop is inherently sequential per word,
    so this is an Arrow-batched pandas UDF with the (tiny) rank table
    closed over — the standard slow-path escape hatch, linear in corpus
    size and embarrassingly parallel."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [EOW]
        while len(syms) >= 2:
            pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
            ranked = [(ranks[p], p) for p in pairs if p in ranks]
            if not ranked:
                break
            _, (a, b) = min(ranked)
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: [
                s
                for w in (t or "").split()
                for s in encode_word(w, cache)
            ]
        )

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_decode_tokens(toks: Column) -> Column:
    """Inverse of :func:`bpe_encode` for a token array column: concat
    everything, then turn each end-of-word mark back into a space.
    Row-local codegen — used by the round-trip property tests."""
    return F.trim(
        F.replace(
            F.array_join(toks, ""), F.lit(EOW), F.lit(" ")
        )
    )
