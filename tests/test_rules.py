"""Semantics of the Gopher / C4 rule filters (operators/rules.py) on
crafted documents. The corpus-level oracle parity runs in
tests/test_oracle.py (doc_gopher_flags / doc_c4_line_filter)."""

from __future__ import annotations

from nyc_taxi_etl_spark.operators.rules import c4_line_filter, gopher_flags

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs to the hills "
    "with great speed because it must be home before dark of night falls. "
    "Every sentence here is made of real words that have normal length."
)
BULLETY = "\n".join("- item number %d here" % i for i in range(10))
SYMBOLIC = "# " * 30 + "word " * 10
ELLIPSY = "\n".join("a trailing thought goes on..." for _ in range(10))
SHORT = "too few words"


def _docs(spark):
    rows = [
        (0, GOOD),
        (1, BULLETY),
        (2, SYMBOLIC),
        (3, ELLIPSY),
        (4, SHORT),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_flags_semantics(spark):
    out = {
        r["doc_id"]: r
        for r in gopher_flags(
            _docs(spark), min_words=20, min_stopword_hits=2
        ).collect()
    }
    good = out[0]
    assert good["keep"] and good["ok_words"] and good["ok_stopwords"]
    assert 3.0 <= good["mean_word_len"] <= 10.0
    # Bullet doc: every line starts with "- " -> bullet_line_frac = 1.
    assert out[1]["bullet_line_frac"] == 1.0 and not out[1]["ok_bullets"]
    # Symbol doc: 30 '#' over 40 words -> ratio 0.75, rule trips.
    assert out[2]["symbol_ratio"] > 0.1 and not out[2]["ok_symbols"]
    # '#' tokens carry no alphabetic char -> alpha fraction low too.
    assert out[2]["alpha_word_frac"] == 0.25 and not out[2]["ok_alpha"]
    # Ellipsis doc: every line ends "..." -> frac 1, rule trips.
    assert out[3]["ellipsis_line_frac"] == 1.0 and not out[3]["ok_ellipsis"]
    # Short doc: word-count floor trips.
    assert not out[4]["ok_words"] and not out[4]["keep"]


def test_gopher_stopword_rule_counts_distinct_hits(spark):
    # 'the' repeated 30 times is still ONE distinct stopword: with
    # min_stopword_hits=2 the rule must trip.
    df = spark.createDataFrame(
        [(0, "the " * 30 + "word " * 30)], "doc_id long, text string"
    )
    row = gopher_flags(df, min_words=10, min_stopword_hits=2).collect()[0]
    assert row["stopword_hits"] == 1 and not row["ok_stopwords"]


def test_c4_line_filter_semantics(spark):
    rows = [
        # 4 terminal lines + 1 short + 1 unterminated -> kept=4, kept doc.
        (0, "one two three four.\nfive six seven eight!\n"
            "is this nine ten?\nthey said \"quoted line here\"\n"
            "no.\nunterminated line words"),
        # lorem ipsum marker kills the doc even with good lines.
        (1, "good first line here.\ngood second line too.\n"
            "good third line also.\nlorem ipsum dolor sit."),
        # '{' (code marker) kills the doc.
        (2, "good first line here.\ngood second line too.\n"
            "good third line also.\nvar x = {1};"),
        # only 2 surviving lines -> below min_kept_lines.
        (3, "good first line here.\ngood second line too."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert out[0]["kept_lines"] == 4 and out[0]["doc_kept"]
    assert "no." not in out[0]["clean_text"].split("\n")
    assert "unterminated line words" not in out[0]["clean_text"]
    assert out[1]["kept_lines"] == 4 and not out[1]["doc_kept"]
    assert not out[2]["doc_kept"]
    assert out[3]["kept_lines"] == 2 and not out[3]["doc_kept"]


# -- hypothesis robustness --------------------------------------------------


def test_rules_total_on_arbitrary_text(spark):
    """Gopher flags, the inline keep, and the C4 filter are TOTAL on
    arbitrary unicode text (no regex/HOF crashes), and internally
    consistent: keep == AND of the flags; C4 kept lines are a subset
    of the doc's own lines."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nyc_taxi_etl_spark.operators.rules import gopher_keep

    import pyspark.sql.functions as F

    texts = st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=12, deadline=None)
    @given(texts)
    def run(batch):
        df = spark.createDataFrame(
            list(enumerate(batch)), "doc_id long, text string"
        )
        flags = gopher_flags(df).collect()
        rule_cols = (
            "ok_words", "ok_mean_word_len", "ok_symbols", "ok_bullets",
            "ok_ellipsis", "ok_alpha", "ok_stopwords",
        )
        for r in flags:
            # every rule flag is coalesced non-null, and the composite
            # is exactly their conjunction
            assert all(r[c] is not None for c in rule_cols), r
            assert r["keep"] == all(r[c] for c in rule_cols), r
        inline = df.where(gopher_keep(F.col("text"))).count()
        kept_flags = sum(1 for r in flags if r["keep"])
        assert inline == kept_flags
        c4 = c4_line_filter(df).collect()
        raw_lines = {
            r["doc_id"]: {
                line.strip()
                for line in (batch[r["doc_id"]] or "").split("\n")
                if line.strip()
            }
            for r in c4
        }
        for r in c4:
            kept = [x for x in r["clean_text"].split("\n") if x]
            assert set(kept) <= raw_lines[r["doc_id"]]
            assert r["kept_lines"] <= r["n_lines"]

    run()


def test_compression_signals_separate_repetitive_from_diverse(spark):
    from nyc_taxi_etl_spark.operators.signals import compression_signals

    import random

    rng = random.Random(7)
    diverse = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
        for _ in range(200)
    )
    rows = [
        (0, "spam ham " * 400),   # heavily repetitive
        (1, diverse),              # high-entropy prose stand-in
        (2, ""),                   # empty
        (3, None),                 # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_signals(df).collect()}
    assert out[0]["compression_ratio"] < 0.05
    assert out[1]["compression_ratio"] > 0.5
    assert out[2]["compression_ratio"] == 1.0 and out[2]["raw_bytes"] == 0
    assert out[3]["compression_ratio"] == 1.0
    # deterministic across runs
    again = {r["doc_id"]: r for r in compression_signals(df).collect()}
    assert again == out
