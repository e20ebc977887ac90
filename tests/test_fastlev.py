"""Pin tests/fastlev.py (the sf0.1 fuzzy-oracle distance engine)
against DuckDB's ``levenshtein`` — the same function the pure-SQL
oracle uses — so the hybrid gate verifies with a proven-equivalent
implementation."""

from __future__ import annotations

import random
import string

import duckdb
import numpy as np
import pytest

from .fastlev import banded_levenshtein_batch


def _duck_lev(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE p (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    return [r[0] for r in con.execute("SELECT levenshtein(a, b) FROM p").fetchall()]


def _rand_word_text(rng, vocab, n_words):
    return " ".join(rng.choice(vocab) for _ in range(n_words))


def test_matches_duckdb_on_random_pairs():
    rng = random.Random(42)
    vocab = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 9))) for _ in range(64)]
    pairs = []
    for _ in range(300):
        kind = rng.randint(0, 2)
        a = _rand_word_text(rng, vocab, rng.randint(0, 60))
        if kind == 0:  # independent
            b = _rand_word_text(rng, vocab, rng.randint(0, 60))
        elif kind == 1:  # small edits of a
            b = list(a)
            for _ in range(rng.randint(0, 12)):
                if not b:
                    break
                op = rng.randint(0, 2)
                p = rng.randrange(len(b))
                if op == 0:
                    b[p] = rng.choice(string.ascii_lowercase)
                elif op == 1:
                    del b[p]
                else:
                    b.insert(p, rng.choice(string.ascii_lowercase))
            b = "".join(b)
        else:  # word permutation (the corpus-realistic hard case)
            w = a.split()
            rng.shuffle(w)
            b = " ".join(w)
        pairs.append((a, b))
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("same", "same")]
    truth = _duck_lev(pairs)
    for d in (0, 1, 5, 50):
        got = banded_levenshtein_batch(
            [p[0] for p in pairs], [p[1] for p in pairs], d, chunk=37
        )
        want = np.minimum(truth, d + 1)
        assert np.array_equal(got, want), (
            d,
            [(pairs[i], truth[i], int(got[i])) for i in np.nonzero(got != want)[0][:5]],
        )


def test_exact_below_threshold_clamped_above():
    out = banded_levenshtein_batch(["kitten"], ["sitting"], 3)
    assert out.tolist() == [3]
    out = banded_levenshtein_batch(["kitten"], ["sitting"], 2)
    assert out.tolist() == [3]  # clamped to d+1
    out = banded_levenshtein_batch(["abcdef"], ["abcdef"], 0)
    assert out.tolist() == [0]


def test_non_ascii_raises():
    with pytest.raises((UnicodeEncodeError, ValueError)):
        banded_levenshtein_batch(["héllo"], ["hello"], 5)


def test_matches_sql_oracle_on_real_corpus_candidates():
    """End-to-end equivalence on the REAL sf0.001 candidate pairs: the
    hybrid gate's candidate-SQL + fastlev distances reproduce the full
    pure-SQL oracle byte-for-byte."""
    from nyc_taxi_etl_spark.plans.queries_text import (
        fuzzy_candidates_sql,
        fuzzy_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = (
        con.execute(fuzzy_oracle_sql())
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    cand = con.execute(fuzzy_candidates_sql()).df()
    dist = banded_levenshtein_batch(
        cand["ta"].tolist(), cand["tb"].tolist(), 50
    )
    got = (
        cand.assign(distance=dist.astype("int64"))[dist <= 50][
            ["id_a", "id_b", "distance"]
        ]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert got.equals(want), (len(got), len(want))
