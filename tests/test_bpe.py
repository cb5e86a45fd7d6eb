"""BPE tokenizer training/encoding (operators/bpe.py): merge sequence
matches a pure-Python Sennrich reference; encode agrees with the trainer's
own final symbol table; decode round-trips."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators.bpe import (
    EOW,
    bpe_decode_tokens,
    bpe_encode,
    bpe_train,
    word_freq_table,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def _reference_bpe(texts: list[str], n_merges: int, min_freq: int = 2):
    """Sennrich et al. 2016 reference trainer (greedy, lexicographic
    tie-break) — the ground truth the distributed trainer must match."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges, vocab


def test_trainer_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = bpe_train(df, n_merges=12, text_col="text")
    want, _ = _reference_bpe(CORPUS, 12)
    assert got == want
    assert len(got) >= 5  # corpus supports a real merge sequence


def test_encode_consistent_with_training_and_decodes(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=12)
    _, ref_vocab = _reference_bpe(CORPUS, 12)
    enc = bpe_encode(df, merges)
    # every distinct word's encoding equals the trainer's final symbols
    word_syms = {
        "".join(s for s in syms).replace(EOW, ""): list(syms)
        for syms in ref_vocab
    }
    for r in enc.select("text", "bpe_tokens").collect():
        toks, idx = r.bpe_tokens, 0
        for w in r.text.split():
            want = word_syms[w]
            assert toks[idx : idx + len(want)] == want, (w, toks)
            idx += len(want)
        assert idx == len(toks)
    # decode round-trip
    back = enc.select(
        "text", bpe_decode_tokens(F.col("bpe_tokens")).alias("rt")
    )
    assert all(r.rt == r.text for r in back.collect())


def test_word_freq_table_is_vocab_sized(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    wt = word_freq_table(df)
    rows = {r.word: (r.freq, r.syms) for r in wt.collect()}
    assert rows["low"][0] == 5
    assert rows["newest"][1] == list("newest") + [EOW]
    assert len(rows) == 5  # low lower newest wider new
