"""Hashed n-gram quality classifier: fixed-lexicon inference semantics
(the oracle suite covers cross-engine parity) and the MLlib trained
path over the same portable feature space."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.classifier import (
    N_BUCKETS,
    _py_bucket,
    featurize_counts,
    hashed_features,
    score_fixed_lexicon,
    score_with_weights,
    train_classifier,
)

# Deterministic weak-label corpus: fluent-English-shaped positives,
# spam-template negatives. Varied suffixes keep the vocabulary from
# being a single feature.
GOOD = [
    f"the history of the region is described in the archive volume {i} "
    f"and the authors refer to the early sources in that era"
    for i in range(40)
]
BAD = [
    f"click here buy now free winner offer {i} click subscribe free "
    f"winner bonus claim prize {i} now"
    for i in range(40)
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (1000 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_hashed_features_shape(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", F.size(hashed_features(F.col("text"))).alias("n")
    ).collect()
    got = {r.doc_id: r.n for r in out}
    # 3 unigrams + 2 bigrams; 1 unigram + 0 bigrams; empty text -> 0.
    assert got == {1: 5, 2: 1, 3: 0}


def test_python_bucket_matches_spark(spark):
    words = ["the", "click here", "of the", "zzz unusual token"]
    df = spark.createDataFrame([(w,) for w in words], "f string")
    from nyc_taxi_etl_spark.operators.classifier import feature_bucket

    got = {
        r.f: r.b
        for r in df.select("f", feature_bucket(F.col("f")).alias("b")).collect()
    }
    for w in words:
        assert got[w] == _py_bucket(w), w


def test_fixed_lexicon_separates(spark, labeled):
    scored = score_fixed_lexicon(labeled).toPandas().set_index("doc_id").sort_index()
    good_p = scored.loc[:999, "quality_prob"]
    bad_p = scored.loc[1000:, "quality_prob"]
    assert good_p.min() > bad_p.max()
    assert (scored.loc[:999, "label"] == "keep").all()
    assert (scored.loc[1000:, "label"] == "drop").all()
    # lexicon hits counted on the original (pre-hash) semantics
    assert (scored["lex_hits"] > 0).all()


def test_fixed_lexicon_zero_shuffle(spark, labeled):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        score_fixed_lexicon(labeled).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan  # scoring is a narrow projection
    assert "BatchEvalPython" not in plan


def test_featurize_counts_multiset(spark):
    df = spark.createDataFrame([(7, "a b a")], "doc_id long, text string")
    counts = featurize_counts(df).toPandas()
    # features: a, b, a, "a b", "b a" -> bucket of 'a' has count 2
    assert counts.cnt.sum() == 5
    a_bucket = _py_bucket("a")
    assert int(counts[counts.bucket == a_bucket].cnt.iloc[0]) == 2


def test_trained_classifier_separates(spark, labeled):
    intercept, weights = train_classifier(labeled, max_iter=30)
    assert weights.count() <= N_BUCKETS
    scored = (
        score_with_weights(labeled, weights, intercept)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    good_p = scored.loc[:999, "quality_prob"]
    bad_p = scored.loc[1000:, "quality_prob"]
    # full separation on the training distribution
    assert good_p.min() > 0.7
    assert bad_p.max() < 0.3
    # held-out-ish probe: unseen doc built from the same vocabularies
    probe = spark.createDataFrame(
        [
            (1, "the archive of the region and the early history of that era"),
            (2, "free winner click here buy now subscribe claim bonus"),
        ],
        "doc_id long, text string",
    )
    p = (
        score_with_weights(probe, weights, intercept)
        .toPandas()
        .set_index("doc_id")
        .sort_index()["quality_prob"]
    )
    assert p[1] > 0.5 > p[2]
