"""Training-corpus export: deterministic split assignment (DuckDB
parity on the md5 bucket), fraction accuracy, seed sensitivity, and
globally-ordered shuffled shards."""

from __future__ import annotations

import glob

import pandas as pd
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators import export
from nyc_taxi_etl_spark.sources.catalog import load_table

from .compare import assert_frames_match
from .conftest import SF_DIR


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_split_matches_duckdb(spark, duck):
    out = export.train_val_test_split(
        _docs(spark).select("doc_id"),
        fracs={"train": 0.8, "val": 0.1, "test": 0.1},
        seed=3,
    ).toPandas()
    oracle = duck.execute(
        """
        SELECT doc_id,
               CASE WHEN b < 800000 THEN 'train'
                    WHEN b < 900000 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     ('0x' || substr(md5('split:3:' || CAST(doc_id AS VARCHAR)),
                                     1, 8))::BIGINT % 1000000 AS b
              FROM documents)
        """
    ).df()
    assert_frames_match(out, oracle, "train_val_test_split")


def test_split_fractions_and_determinism(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id")
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = export.train_val_test_split(ev, "event_id", fr, seed=1)
    counts = {
        r["split"]: r["n"]
        for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    for name, frac in fr.items():
        assert abs(counts[name] / total - frac) < 0.02
    # determinism: identical plans give identical assignment
    b = export.train_val_test_split(ev, "event_id", fr, seed=1)
    assert a.exceptAll(b).count() == 0
    # seed sensitivity: a different seed moves some rows
    c = export.train_val_test_split(ev, "event_id", fr, seed=2)
    assert a.exceptAll(c).count() > 0


def test_split_rejects_bad_fractions(spark):
    import pytest

    with pytest.raises(ValueError):
        export.train_val_test_split(
            _docs(spark), fracs={"train": 0.5, "val": 0.1}
        )


def test_export_shuffled_shards_are_globally_ordered(spark, tmp_path):
    path = str(tmp_path / "corpus")
    export.export_shuffled(
        _docs(spark).select("doc_id", "text"), path, seed=5, num_shards=4
    )
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) == 4
    # read each shard standalone; recompute the order key pandas-side
    import hashlib

    def key(doc_id):
        return hashlib.md5(f"shuffle:5:{doc_id}".encode()).hexdigest()

    ranges = []
    n_rows = 0
    for f in files:
        pdf = pd.read_parquet(f)
        n_rows += len(pdf)
        ks = pdf["doc_id"].map(key)
        assert ks.is_monotonic_increasing  # sorted within shard
        ranges.append((ks.min(), ks.max()))
    # shards hold disjoint, increasing key ranges (global total order)
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b
    assert n_rows == _docs(spark).count()
    # round-trip preserves the id set exactly
    back = spark.read.parquet(path)
    assert back.select("doc_id").exceptAll(_docs(spark).select("doc_id")).count() == 0


def test_export_respects_max_records_per_file(spark, tmp_path):
    path = str(tmp_path / "small")
    export.export_shuffled(
        _docs(spark).select("doc_id"), path, num_shards=2,
        max_records_per_file=100,
    )
    files = glob.glob(f"{path}/part-*.parquet")
    assert all(len(pd.read_parquet(f)) <= 100 for f in files)
    assert len(files) >= 5  # 500 docs / 100-cap


# ---------------------------------------------------------------------------
# end-to-end pipeline
# ---------------------------------------------------------------------------


def test_prepare_training_corpus_end_to_end(spark, tmp_path):
    from nyc_taxi_etl_spark.operators import pipeline

    path = str(tmp_path / "train_corpus")
    chunks = pipeline.prepare_training_corpus(
        _docs(spark),
        output_path=path,
        quality_threshold=0.5,
        jaccard_threshold=0.5,
        chunk_tokens=32,
        fracs={"train": 0.8, "val": 0.1, "test": 0.1},
        seed=11,
        num_shards=2,
    )
    pdf = chunks.toPandas()
    assert set(pdf.columns) == {
        "doc_id", "chunk_ix", "chunk_text", "chunk_tokens", "split",
    }
    assert len(pdf) > 0
    assert (pdf["chunk_tokens"] <= 32).all()
    # one split per document: sibling chunks never straddle
    assert (pdf.groupby("doc_id")["split"].nunique() == 1).all()
    # curation actually dropped near-duplicates (the corpus has planted
    # dup groups; curate keeps min-id representatives)
    assert pdf["doc_id"].nunique() < _docs(spark).count()
    # written shards round-trip per split with matching chunk counts
    for name, grp in pdf.groupby("split"):
        back = spark.read.parquet(f"{path}/split={name}")
        assert back.count() == len(grp)
        assert set(back.columns) == {"doc_id", "chunk_ix", "chunk_text",
                                     "chunk_tokens"}


def test_leakage_safe_split_keeps_pairs_together(spark):
    """After cluster-aware splitting, no near-dup pair straddles
    splits; singletons keep their naive assignment."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    # synthetic pair set: chain some ids into clusters that the naive
    # split (seed 0) would scatter
    ids = [r.doc_id for r in docs.limit(40).collect()]
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(0, 30, 2)]
        + [(ids[30], ids[31]), (ids[31], ids[32])],  # a 3-chain
        "id_a long, id_b long",
    )
    fr = {"train": 0.6, "val": 0.2, "test": 0.2}
    out = export.leakage_safe_split(docs, pairs, fracs=fr, seed=0)
    split_of = {r.doc_id: r.split for r in out.collect()}
    for r in pairs.collect():
        assert split_of[r.id_a] == split_of[r.id_b], (r.id_a, r.id_b)
    naive = export.train_val_test_split(docs, fracs=fr, seed=0)
    naive_of = {r.doc_id: r.split for r in naive.collect()}
    clustered = {r.id_a for r in pairs.collect()} | {
        r.id_b for r in pairs.collect()
    }
    for did, sp in split_of.items():
        if did not in clustered:
            assert sp == naive_of[did], did


def test_prepare_training_corpus_full_options_jsonl(spark, tmp_path):
    """All optional stages on + JSONL export: classifier gate, repeat
    collapse, per-source token budget, jsonl shards."""
    import glob
    import json

    from nyc_taxi_etl_spark.operators import pipeline

    path = str(tmp_path / "tc_jsonl")
    chunks = pipeline.prepare_training_corpus(
        _docs(spark),
        output_path=path,
        quality_threshold=0.5,
        jaccard_threshold=0.5,
        chunk_tokens=32,
        fracs={"train": 0.8, "val": 0.1, "test": 0.1},
        seed=11,
        num_shards=2,
        classifier_min_prob=0.2,
        collapse_repeats=True,
        budget_tokens=600,
        output_format="jsonl",
    )
    pdf = chunks.toPandas()
    assert len(pdf) > 0
    assert (pdf.groupby("doc_id")["split"].nunique() == 1).all()
    # budget bound holds per source on cleaned tokens: chunk token
    # sums per doc never exceed it in aggregate per source is checked
    # upstream; here pin that selection actually dropped something
    base = pipeline.prepare_training_corpus(
        _docs(spark),
        quality_threshold=0.5,
        jaccard_threshold=0.5,
        chunk_tokens=32,
        fracs={"train": 0.8, "val": 0.1, "test": 0.1},
        seed=11,
    )
    assert pdf.doc_id.nunique() < base.toPandas().doc_id.nunique()
    # jsonl shards parse and cover every chunk row
    n_lines = 0
    for split in pdf.split.unique():
        for f in glob.glob(f"{path}/split={split}/part-*"):
            for line in open(f):
                if line.strip():
                    json.loads(line)
                    n_lines += 1
    assert n_lines == len(pdf)


def test_prepare_training_corpus_rule_gates_and_passage_dedup(spark):
    """New optional stages compose: Gopher gate (inline WHERE), C4 line
    cleanup, and keep-first passage dedup inside the pipeline."""
    from nyc_taxi_etl_spark.operators import pipeline

    base = pipeline.prepare_training_corpus(
        _docs(spark),
        quality_threshold=0.5,
        jaccard_threshold=0.5,
        chunk_tokens=32,
        seed=11,
    ).toPandas()
    gated = pipeline.prepare_training_corpus(
        _docs(spark),
        quality_threshold=0.5,
        jaccard_threshold=0.5,
        chunk_tokens=32,
        seed=11,
        gopher_gate={"min_stopword_hits": 1, "min_words": 30},
        passage_dedup_k=5,
    ).toPandas()
    assert len(gated) > 0
    # the word-count floor drops short docs; the gate never ADDS any
    assert gated.doc_id.nunique() < base.doc_id.nunique()
    # passage dedup only ever removes tokens
    assert gated.chunk_tokens.sum() <= base.chunk_tokens.sum()
    # sibling chunks still share a split
    assert (gated.groupby("doc_id")["split"].nunique() == 1).all()


def test_c4_clean_stage_preserves_extra_columns(spark):
    from nyc_taxi_etl_spark.operators.rules import c4_line_filter
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "good line one here.\nsecond good line too.\nthird one also.",
          "web", 0.9)],
        "doc_id long, text string, source string, quality double",
    )
    out = c4_line_filter(
        df, extra_cols=("source", "quality")
    ).where(F.col("doc_kept"))
    row = out.collect()[0]
    assert row["source"] == "web" and row["quality"] == 0.9
