"""Semantics of exact duplicate-passage removal
(operators/passages.py). Corpus-level oracle parity runs in
tests/test_oracle.py (doc_passage_dedup)."""

from __future__ import annotations

from nyc_taxi_etl_spark.operators.passages import (
    dedup_passages,
    duplicate_passages,
)

SHARED = "alpha beta gamma delta epsilon"


def _docs(spark):
    rows = [
        # Doc 0 holds the first occurrence of SHARED -> keeper.
        (0, SHARED + " unique0a unique0b unique0c"),
        # Doc 1 repeats SHARED -> its copy is removed.
        (1, "unique1a unique1b " + SHARED + " unique1c"),
        # Doc 2: internal repeat of its own 5-gram -> 2nd copy removed.
        (2, "p q r s t p q r s t tail2"),
        # Doc 3: shorter than k -> untouched.
        (3, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_occurrence_cross_doc(spark):
    out = {
        r["doc_id"]: r for r in dedup_passages(_docs(spark), k=5).collect()
    }
    # Keeper doc keeps the passage.
    assert out[0]["clean_text"].startswith(SHARED)
    assert out[0]["removed_tokens"] == 0
    # Copy doc loses exactly the 5 shared tokens, keeps its own.
    assert out[1]["clean_text"] == "unique1a unique1b unique1c"
    assert out[1]["removed_tokens"] == 5
    # Internal repeat: first run kept, second removed.
    assert out[2]["clean_text"] == "p q r s t tail2"
    assert out[2]["removed_tokens"] == 5
    # Sub-k doc untouched.
    assert out[3]["clean_text"] == "tiny doc"
    assert out[3]["removed_tokens"] == 0


def test_duplicate_passages_keeper_is_global_min(spark):
    dup = {
        r["gram"]: r for r in duplicate_passages(_docs(spark), k=5).collect()
    }
    # SHARED occurs in doc 0 pos 1 and doc 1 pos 3.
    assert dup[SHARED]["n_occurrences"] == 2
    assert dup[SHARED]["keeper_key"] == 0 * 1_000_000 + 1
    # Internal repeat: doc 2 pos 1 and pos 6.
    assert dup["p q r s t"]["keeper_key"] == 2 * 1_000_000 + 1


def test_full_copy_document_fully_removed(spark):
    body = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame(
        [(10, body), (11, body)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup_passages(df, k=5).collect()}
    assert out[10]["clean_text"] == body and out[10]["removed_tokens"] == 0
    assert out[11]["clean_text"] == "" and out[11]["removed_tokens"] == 8


def test_no_duplicates_is_identity(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "g h i j k l")], "doc_id long, text string"
    )
    out = dedup_passages(df, k=5).collect()
    assert all(r["removed_tokens"] == 0 for r in out)
