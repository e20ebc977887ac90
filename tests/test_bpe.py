"""BPE vocabulary induction: pinned against a reference Python BPE
(Sennrich-style) on a hand-sized corpus; determinism; segmentation
round-trip; streaming composability is inherited (pure expressions)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.bpe import (
    END_MARK,
    segment_words,
    train_bpe,
    word_counts,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
]


def _ref_bpe(word_freq: dict[str, int], num_merges: int, min_count: int = 2):
    """Reference implementation: greedy highest-count pair, ties by
    (a, b) ascending, left-to-right non-overlapping merge."""
    vocab = {
        tuple(list(w) + [END_MARK]): n for w, n in word_freq.items()
    }
    merges = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] += n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < min_count:
            break
        merges.append((a, b))
        new_vocab = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = n
        vocab = new_vocab
    return merges, vocab


def _freqs():
    c: Counter = Counter()
    for line in CORPUS:
        c.update(line.split())
    return dict(c)


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame([(s,) for s in CORPUS], "text string")
    got = train_bpe(df, num_merges=8)
    want, _ = _ref_bpe(_freqs(), 8)
    assert got == want, f"spark={got} ref={want}"


def test_train_bpe_deterministic(spark):
    df = spark.createDataFrame([(s,) for s in CORPUS], "text string")
    assert train_bpe(df, num_merges=5) == train_bpe(df, num_merges=5)


def test_segment_words_matches_trainer_state(spark):
    """Applying the learned merges to the training words reproduces
    the trainer's final symbol sequences."""
    df = spark.createDataFrame([(s,) for s in CORPUS], "text string")
    merges = train_bpe(df, num_merges=8)
    _, final_vocab = _ref_bpe(_freqs(), 8)
    seg_of = {"".join(k).replace(END_MARK, ""): list(k) for k in final_vocab}
    words = spark.createDataFrame(
        [(w,) for w in _freqs()], "text string"
    )
    got = words.select(
        "text", segment_words(F.col("text"), merges).alias("seg")
    ).collect()
    for r in got:
        assert list(r.seg) == seg_of[r.text], r.text


def test_word_counts(spark):
    df = spark.createDataFrame([(s,) for s in CORPUS], "text string")
    wc = {r.word: r.n for r in word_counts(df).collect()}
    assert wc == _freqs()
