"""Unit tests for the round-4 training-pipeline additions:
benchmark decontamination, domain-mixture resampling, and the
Gopher-style repetition metrics (the DuckDB value-parity of their
catalog entries is covered by test_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.decontam import (
    benchmark_shingles,
    contamination_report,
    decontaminate,
)
from nyc_taxi_etl_spark.operators.sampling import (
    mixture_rates,
    mixture_resample,
)
from nyc_taxi_etl_spark.operators.text import repetition_metrics

from .conftest import SF_DIR


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_flags_planted_overlap(spark):
    # doc 2 copies a benchmark trigram verbatim; doc 3 shares nothing.
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    docs = _docs(
        spark,
        [
            (1, "completely unrelated words here today"),
            (2, "we said the quick brown fox appeared"),
            (3, "another clean document entirely fresh"),
        ],
    )
    rep = {
        r["doc_id"]: r
        for r in contamination_report(docs, bench, k=3).collect()
    }
    assert rep[2]["is_contaminated"] and rep[2]["contaminated_shingles"] >= 1
    assert not rep[1]["is_contaminated"]
    assert not rep[3]["is_contaminated"]
    # every doc keeps its full shingle inventory in the report
    assert rep[1]["n_shingles"] == 3  # 5 tokens -> 3 distinct trigrams


def test_decontaminate_removes_only_contaminated(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta")])
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma copied straight through"),
            (2, "totally different text with no overlap"),
        ],
    )
    kept = decontaminate(docs, bench, k=3)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    # tolerance: allow up to 1 shared shingle -> doc 1 survives
    kept_tol = decontaminate(docs, bench, k=3, max_contaminated=1)
    assert sorted(r["doc_id"] for r in kept_tol.collect()) == [1, 2]


def test_blank_and_short_docs_survive_report(spark):
    bench = _docs(spark, [(100, "alpha beta gamma")])
    docs = _docs(spark, [(1, ""), (2, "single"), (3, "two words")])
    rep = {
        r["doc_id"]: r
        for r in contamination_report(docs, bench, k=3).collect()
    }
    assert set(rep) == {1, 2, 3}
    assert rep[1]["n_shingles"] == 0
    assert not rep[1]["is_contaminated"]
    # sub-k docs fall back to a single whole-text shingle
    assert rep[2]["n_shingles"] == 1


def test_benchmark_shingles_distinct(spark):
    bench = _docs(
        spark, [(1, "a b c d"), (2, "a b c d")]  # duplicate benchmark doc
    )
    sh = benchmark_shingles(bench, k=3).collect()
    assert len(sh) == len({r["shingle"] for r in sh}) == 2


# ---------------------------------------------------------------------------
# Mixture resampling
# ---------------------------------------------------------------------------

_W = {f"src{i}": 30 + (i % 5) * 10 for i in range(20)}


def test_mixture_rates_feasible_and_integer(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rates = {r["source"]: r for r in mixture_rates(docs, "source", _W).collect()}
    assert set(rates) == set(_W)
    n_total = min(
        r["n_src"] * 1000 // r["w_pm"] for r in rates.values()
    )
    for r in rates.values():
        assert 0 <= r["rate_pm"] <= 1000
        assert r["rate_pm"] == r["w_pm"] * n_total // r["n_src"]
    # the scarcest-per-weight source saturates (rate ~ 1000)
    assert max(r["rate_pm"] for r in rates.values()) >= 990


def test_mixture_resample_deterministic_subset(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(
        r["doc_id"] for r in mixture_resample(docs, "doc_id", "source", _W).collect()
    )
    b = sorted(
        r["doc_id"] for r in mixture_resample(docs, "doc_id", "source", _W).collect()
    )
    assert a == b and len(a) > 0
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(a) <= all_ids
    # original columns come back untouched, helper columns dropped
    out = mixture_resample(docs, "doc_id", "source", _W)
    assert out.columns == docs.columns


def test_mixture_drops_unweighted_sources(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    only_two = {"src0": 500, "src1": 500}
    out = mixture_resample(docs, "doc_id", "source", only_two)
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert srcs <= {"src0", "src1"}


# ---------------------------------------------------------------------------
# Repetition metrics
# ---------------------------------------------------------------------------


def _rep(spark, text):
    row = (
        spark.range(1)
        .select(repetition_metrics(F.lit(text)).alias("m"))
        .first()["m"]
    )
    return row["top_bigram_frac"], row["dup_trigram_frac"]


def test_repetition_metrics_hand_computed(spark):
    # "a b a b a b": bigrams [ab, ba, ab, ba, ab] -> top 3/5;
    # trigrams [aba, bab, aba, bab] -> every position duplicated.
    top, dup = _rep(spark, "a b a b a b")
    assert abs(top - 3 / 5) < 1e-12
    assert dup == 1.0
    # partial duplication: trigrams [aba, bab, aba, bac] -> 2/4.
    top2, dup2 = _rep(spark, "a b a b a c")
    assert abs(top2 - 2 / 5) < 1e-12
    assert abs(dup2 - 1 / 2) < 1e-12


def test_repetition_metrics_no_repeats(spark):
    top, dup = _rep(spark, "one two three four five six")
    assert abs(top - 1 / 5) < 1e-12  # all bigrams unique -> top = 1/n
    assert dup == 0.0


def test_repetition_metrics_degenerate_docs(spark):
    assert _rep(spark, "") == (0.0, 0.0)
    assert _rep(spark, "single") == (0.0, 0.0)
    assert _rep(spark, "two words") == (1.0, 0.0)  # one bigram, no trigram
    # fully templated doc: one repeated trigram everywhere
    top, dup = _rep(spark, "x x x x x x x x")
    assert top == 1.0 and dup == 1.0


def test_collapse_repeated_ngrams_crafted(spark):
    """Period 1/2/3 runs collapse; non-adjacent recurrence survives;
    the documented boundary artifact is pinned."""
    from nyc_taxi_etl_spark.operators.text import collapse_repeated_ngrams

    cases = [
        ("very very very long", "very long"),
        ("buy now buy now buy now", "buy now buy"),  # trailing partial
        ("one two three one two three one two three x", "one two three one two x"),
        ("a b c a c b", "a b c a c b"),  # recurrence, not repetition
        ("solo", "solo"),
        ("x x", "x"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "i long, text string"
    )
    out = (
        df.select("i", collapse_repeated_ngrams(F.col("text")).alias("r"))
        .select("i", "r.clean_text", "r.n_tokens", "r.removed_tokens")
        .toPandas()
        .set_index("i")
        .sort_index()
    )
    for i, (src, want) in enumerate(cases):
        assert out.loc[i, "clean_text"] == want, (src, out.loc[i, "clean_text"])
        assert out.loc[i, "removed_tokens"] == len(src.split()) - len(
            want.split()
        )
