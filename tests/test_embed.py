"""Signed-feature-hash embeddings: unit norm, long/dense agreement,
and end-to-end recall — cosine over hashed vectors must recover the
corpus's exact-duplicate documents."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.embed import (
    hashed_embed_long,
    hashed_ngram_embed,
)
from nyc_taxi_etl_spark.sources.catalog import load_table

from .conftest import SF_DIR


def test_unit_norm_and_dense_long_agreement(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    dense = {
        r.doc_id: r.embedding
        for r in hashed_ngram_embed(docs, dim=64).collect()
    }
    for v in dense.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
        assert len(v) == 64
    long = hashed_embed_long(docs, dim=64).collect()
    for r in long:
        assert abs(dense[r.doc_id][r.dim] - r.weight) < 1e-12


def test_hashed_embeddings_recover_exact_duplicates(spark):
    from nyc_taxi_etl_spark.operators.similarity import cosine_near_pairs
    from nyc_taxi_etl_spark.operators.text import fingerprint

    base = load_table(spark, SF_DIR, "documents").limit(100)
    # plant exact copies under new ids: 10_000+i duplicates doc i
    clones = (
        base.filter(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 10_000)
    )
    docs = base.unionByName(clones)
    fp = docs.select("doc_id", fingerprint(F.col("text")).alias("f"))
    dup_pairs = {
        (min(a, b), max(a, b))
        for (a, b) in fp.alias("x")
        .join(fp.alias("y"), "f")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id"), F.col("y.doc_id"))
        .collect()
    }
    assert len(dup_pairs) >= 10
    emb = hashed_ngram_embed(docs, dim=64)
    found = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in cosine_near_pairs(
            emb, threshold=0.999, id_col="doc_id", vec_col="embedding"
        ).collect()
    }
    # identical token multisets → identical vectors → cosine 1
    assert dup_pairs <= found
