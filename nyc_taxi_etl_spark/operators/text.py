"""Text-analysis operators for a training-data pipeline.

All hot-path expressions are pure Catalyst built-ins (split/regexp/
aggregate/transform) — no Python UDFs — so they whole-stage-codegen and
scale linearly with executors. The reference repo has no text surface;
these extend it per the north star (BASELINE.json: 'text analysis'
— language-ID heuristic, quality scoring, token counting, document
fingerprinting).

Design for 100 TB: every operator is row-local (narrow dependency, zero
shuffles); dedup/similarity consumers add the shuffles and are
documented separately in dedup.py / similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "text_stats",
    "quality_score",
    "language_id",
    "fingerprint",
    "shingles",
    "shingle_seq",
    "repetition_metrics",
    "collapse_repeated_ngrams",
]

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic, data-independent.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "les", "des", "et", "une"),
    "de": ("der", "die", "das", "und", "ein", "nicht"),
    "zh": ("的", "是", "了", "在"),
}

STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")


def _norm(text: Column) -> Column:
    """Whitespace-normalized, lowercased text."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: count word pieces + digits + other
    symbols via a regex family (a cheap, deterministic stand-in for a
    real tokenizer; stays JVM-side)."""
    pieces = F.regexp_extract_all(
        F.lower(text), F.lit(r"[a-z]{1,4}|[0-9]|[^a-z0-9\s]"), 0
    )
    return F.size(pieces).cast("long")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats frame: lengths, token counts, ratios.

    Ratios are exact-int ratios (bit-identical cross-engine — see
    plans/queries.py float policy).
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks).cast("long")
    distinct_tok = F.size(F.array_distinct(toks)).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    ).cast("long")
    n_char = F.length(c).cast("long")
    punct = F.length(c) - F.length(F.regexp_replace(c, r"\p{Punct}", ""))
    digits = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    spaces = F.length(c) - F.length(F.regexp_replace(c, r" ", ""))
    return df.select(
        "*",
        n_char.alias("n_char"),
        n_tok.alias("n_tokens"),
        distinct_tok.alias("n_distinct_tokens"),
        (distinct_tok.cast("double") / n_tok).alias("type_token_ratio"),
        (stop_hits.cast("double") / n_tok).alias("stopword_ratio"),
        punct.cast("long").alias("n_punct"),
        digits.cast("long").alias("n_digits"),
        (spaces.cast("long")).alias("n_spaces"),
        ((n_char - spaces).cast("double") / n_tok).alias("avg_token_len"),
    )


def quality_score(text: Column, toks: Column | None = None) -> Column:
    """Composite document-quality heuristic in [0, 1]: rewards
    mid-length docs, lexical diversity and sane stopword mass
    (Gopher/C4-style rule-of-thumb filters, expressed as one Catalyst
    expression).

    Pass ``toks`` (a MATERIALIZED token-array column) when the caller
    already split the text: expressions referenced inside HOF lambdas
    are re-evaluated per element (no CSE there), so re-deriving the
    split here multiplies tokenization cost across every consumer in
    the same projection."""
    toks = tokens(text) if toks is None else toks
    n_tok = F.size(toks).cast("double")
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast(
        "double"
    ) / n_tok
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    stop_ok = F.when((stop > 0.0) & (stop < 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    return (F.lit(0.4) * len_ok + F.lit(0.3) * ttr + F.lit(0.3) * stop_ok).alias(
        "quality"
    )


def language_id(text: Column, toks: Column | None = None) -> Column:
    """Stopword-marker language-ID heuristic: score each language by
    marker-token hits; argmax with deterministic tiebreak (lexicographic
    language code). 'und' when nothing matches.

    ``toks`` (optional): pre-materialized NORMALIZED token array — see
    :func:`quality_score` for why callers should pass it."""
    toks = tokens(_norm(text)) if toks is None else toks
    scored = []
    for lang in sorted(LANG_MARKERS):
        hits = F.size(F.filter(toks, lambda x: x.isin(*LANG_MARKERS[lang])))
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max over (hits, lang) structs: argmax by hits; ties resolve
    # to the lexicographically greatest lang — a deterministic rule,
    # identical in the SQL oracle's CASE chain.
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text — the exact-dedup key. At 100 TB the
    128-bit space keeps collision probability negligible."""
    return F.md5(_norm(text))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as array<string> (distinct). Row-local, no
    explode/shuffle at this stage.

    Extraction is ONE regex pass over the normalized (single-spaced)
    text: ``(?=(\\S+ … \\S+))\\S+ ?`` — the lookahead CAPTURES the
    k-token window while the body consumes exactly one token, so the
    engine advances token by token and emits every overlapping window.
    This replaces the earlier ``transform(sequence(...), slice(...))``
    formulation: higher-order array functions are interpreted per
    element (never whole-stage-codegen'd) and slice copies O(k) per
    shingle — measured 25× slower than the regex at sf0.1 (6.6 s vs
    0.26 s for 5 000 docs). Same shingle SET (verified element-wise in
    tests and by every dedup oracle, which replays shingling in SQL).

    Correctness of the anchoring: the first attempt is at offset 0 (a
    token start); every successful match consumes one token + its
    separator, so subsequent attempts are also at token starts. Once
    fewer than k tokens remain the lookahead fails everywhere in the
    tail (a mid-token suffix never contains more separators than its
    token start), so no spurious windows are emitted.
    """
    t = _norm(text)
    toks = tokens(t)
    n = F.size(toks)
    pat = "(?=(" + "\\S+ " * (k - 1) + "\\S+))\\S+ ?"
    return F.when(
        n >= k,
        F.array_distinct(F.regexp_extract_all(t, F.lit(pat), 1)),
    ).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array().cast("array<string>")
        )
    )


def shingle_seq(text: Column, k: int = 2) -> Column:
    """Overlapping word k-gram SEQUENCE (non-distinct, document order)
    as array<string> — the multiset :func:`shingles` collapses. Needed
    by repetition metrics, where the *count* of each k-gram is the
    signal. Same one-regex-pass extraction (see :func:`shingles` for
    the lookahead-anchoring argument); docs with fewer than k tokens
    yield an empty array (no repetition is measurable)."""
    t = _norm(text)
    toks = tokens(t)
    pat = "(?=(" + "\\S+ " * (k - 1) + "\\S+))\\S+ ?"
    return F.when(
        F.size(toks) >= k, F.regexp_extract_all(t, F.lit(pat), 1)
    ).otherwise(F.array().cast("array<string>"))


def _sorted_run_stats(arr: Column) -> Column:
    """struct(best, dup_pos) over an array: ``best`` = multiplicity of
    the most frequent element, ``dup_pos`` = number of positions whose
    element occurs more than once. One ``aggregate`` pass over the
    sorted copy (equal elements are adjacent, so run lengths ARE
    multiplicities). Row-local — the 100 TB alternative (explode +
    groupBy per doc) would shuffle every k-gram occurrence in the
    corpus; this keeps repetition analysis a narrow projection. The
    HOF is interpreted per element, but arrays are document-sized
    (~n_tokens), so the constant factor is bounded by doc length."""
    s = F.array_sort(arr)
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dup_pos"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        # A run reaching 2 retroactively marks its first position as
        # duplicated (+2); further extensions add one position each.
        dup_inc = (
            F.when(run == 2, F.lit(2)).when(run > 2, F.lit(1)).otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (acc["dup_pos"] + dup_inc).alias("dup_pos"),
        )

    return F.aggregate(
        s,
        init,
        step,
        lambda acc: F.struct(
            acc["best"].alias("best"), acc["dup_pos"].alias("dup_pos")
        ),
    )


def repetition_metrics(
    text: Column, bg: Column | None = None, tg: Column | None = None
) -> Column:
    """Gopher-style intra-document repetition signals as
    struct(top_bigram_frac, dup_trigram_frac):

      * ``top_bigram_frac`` — occurrences of the single most frequent
        word 2-gram / total 2-grams (Rae et al. 2021 "fraction of
        characters in most common n-gram", token-count flavored);
      * ``dup_trigram_frac`` — fraction of word-3-gram positions whose
        trigram appears more than once ("fraction of duplicate
        n-grams").

    Both are exact-int ratios (bit-identical cross-engine) and fully
    row-local — zero shuffles, composes into any per-doc projection.
    High values flag degenerate/templated text that survives length
    and stopword filters.

    Pass ``bg``/``tg`` (MATERIALIZED k-gram array columns from
    :func:`shingle_seq`) when composing into a wide projection — each
    is referenced several times here, and a non-materialized regex
    extraction would re-run per reference (same no-CSE trap
    documented on :func:`quality_score`)."""
    bg = shingle_seq(text, 2) if bg is None else bg
    tg = shingle_seq(text, 3) if tg is None else tg
    bs = _sorted_run_stats(bg)
    ts = _sorted_run_stats(tg)
    top = F.when(
        F.size(bg) > 0, bs["best"].cast("double") / F.size(bg)
    ).otherwise(F.lit(0.0))
    dup = F.when(
        F.size(tg) > 0, ts["dup_pos"].cast("double") / F.size(tg)
    ).otherwise(F.lit(0.0))
    return F.struct(
        top.alias("top_bigram_frac"), dup.alias("dup_trigram_frac")
    )


def collapse_repeated_ngrams(
    text: Column, max_period: int = 3
) -> Column:
    """Drop the redundant tail of immediately-repeated word n-gram runs
    (periods 1..``max_period``): ``"buy now buy now buy now"`` →
    ``"buy now"``, ``"very very very long"`` → ``"very long"`` — the
    REMOVAL counterpart of :func:`repetition_metrics` (Gopher flags
    such docs; pipelines that keep them usually clean the runs
    instead).

    Rule: 1-based position ``i`` is dropped iff for some period ``p``
    the p-gram ending at ``i`` equals the p-gram ending at ``i-p``
    (guarded by ``i ≥ 2p`` so every index is in range). Exact string
    comparisons and integer indexing only — bit-identical in a DuckDB
    list comprehension, which is what the catalog oracle replays.
    A boundary artifact is accepted deterministically: the first
    ``2p-1`` positions of a run can never be dropped, so "a b a b a b"
    keeps "a b a" (the trailing partial period survives).

    Row-local (one transform/filter pass over the token array, no
    shuffle). The token array is bound ONCE as a lambda variable —
    ``transform(array(tokens(text)), tk -> body)`` — because Catalyst
    does not common-subexpression-eliminate inside higher-order
    lambdas: referencing ``tokens(text)`` directly from the drop
    predicate re-tokenized the row at EVERY element_at (12 references
    x n_tokens positions = O(n²) retokenizations per row; the sf0.1
    gate measured 36 s for 5 000 docs before this binding, ~1 s
    after)."""

    def body(tk: Column) -> Column:
        n = F.size(tk)

        def dropped(i: Column) -> Column:
            conds = []
            for p in range(1, max_period + 1):
                same = F.lit(True)
                for j in range(p):
                    same = same & (
                        F.element_at(tk, i - j)
                        == F.element_at(tk, i - j - p)
                    )
                conds.append((i >= F.lit(2 * p)) & same)
            out = conds[0]
            for c in conds[1:]:
                out = out | c
            return out

        kept_ix = F.filter(
            F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda i: ~dropped(i),
        )
        return F.struct(
            F.concat_ws(
                " ", F.transform(kept_ix, lambda i: F.element_at(tk, i))
            ).alias("clean_text"),
            n.cast("long").alias("n_tokens"),
            (n - F.size(kept_ix)).cast("long").alias("removed_tokens"),
        )

    return F.element_at(F.transform(F.array(tokens(text)), body), 1)
