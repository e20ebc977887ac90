"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation/benchmark set (the GPT-3 appendix-C
/ PaLM-style overlap rule — a training doc is contaminated when any of
its k-gram shingles appears in any benchmark doc).

This is a training-data-pipeline extension beyond the reference repo
(which has no text surface); the north star names decontamination-class
ops as first-class pipeline components.

Scale design (100 TB corpus vs a FIXED-size benchmark suite):

  * The benchmark side is bounded by construction — eval suites are
    thousands of documents (→ ~10⁵–10⁶ distinct shingles) regardless of
    corpus size. It is the one side that is legitimately
    ``F.broadcast``-able by the engine's own rule (fixed cardinality,
    like nation/region — NOT SF-scaled), so the corpus NEVER shuffles:
    each task streams its documents, explodes shingles row-locally, and
    probes the broadcast hash set.
  * The only shuffle is the per-doc re-aggregation of hit counts, and
    map-side partial aggregation collapses it to ~one row per document
    (shingles of a doc are colocated in its scan partition), so shuffle
    volume is O(n_docs), not O(n_shingles).
  * Set ``broadcast_benchmark=False`` when the "benchmark" is itself
    SF-scaled (e.g. cross-corpus leakage checks) — the join then falls
    back to AQE's size-based strategy choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles

__all__ = [
    "benchmark_shingles",
    "contamination_report",
    "decontaminate",
    "semantic_contamination",
]


def benchmark_shingles(
    benchmark: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Distinct word-k-shingle set of the benchmark corpus
    (one column: ``shingle``). Distinct is a shuffle over the
    benchmark side only — bounded, by the argument above."""
    return (
        benchmark.select(
            F.explode(shingles(F.col(text_col), k)).alias("shingle")
        )
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination counts against the benchmark shingle
    set: (id, n_shingles, contaminated_shingles, is_contaminated).

    ``n_shingles`` counts the doc's DISTINCT shingles (the multiset is
    irrelevant to overlap), and ``contaminated_shingles`` of them occur
    in the benchmark — so the ratio is a per-doc overlap fraction a
    caller can threshold instead of the any-hit flag."""
    bench = benchmark_shingles(benchmark, k, text_col).select(
        F.col("shingle").alias("_bench_shingle")
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    sh = docs.select(
        F.col(id_col), shingles(F.col(text_col), k).alias("_sh")
    ).select(
        id_col,
        F.size("_sh").alias("_n_sh"),
        # explode_outer keeps shingle-less docs (blank text) in the
        # report with zero counts instead of dropping them.
        F.explode_outer("_sh").alias("shingle"),
    )
    joined = sh.join(
        bench, sh["shingle"] == bench["_bench_shingle"], "left"
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.max("_n_sh").cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("_bench_shingle").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("contaminated_shingles"),
        )
        .withColumn(
            "is_contaminated", F.col("contaminated_shingles") > 0
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_contaminated: int = 0,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Drop contaminated documents: keep docs with at most
    ``max_contaminated`` benchmark-overlapping shingles (default 0 —
    strict any-hit removal). Returns the surviving rows of ``docs``
    with their original columns."""
    report = contamination_report(
        docs, benchmark, k, id_col, text_col, broadcast_benchmark
    )
    # The keep-list is corpus-sized (never broadcast): a left-semi
    # equi-join on the id — AQE picks the strategy by measured size.
    keep = report.filter(
        F.col("contaminated_shingles") <= max_contaminated
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def semantic_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level decontamination: flag training vectors whose
    cosine similarity to ANY held-out eval vector reaches
    ``threshold`` — the semantic companion to the n-gram overlap rule
    (``contamination_report``), catching paraphrased/translated eval
    leakage that shares no shingles (the decontamination posture of
    recent model reports that audit eval overlap in embedding space).

    Returns one row per training vector:
    ``(id_col, max_eval_sim, is_contaminated)``.

    Scale contract: the EVAL side is bounded by construction (eval
    suites don't grow with the corpus) — it collapses to a ONE-ROW
    broadcast frame holding every (unit-denominator) eval vector, and
    the training corpus streams through one scan with the per-row max
    computed as a row-local fold over that array: no groupBy, no
    corpus-keyed shuffle anywhere in the plan (r5: an earlier draft
    cross-joined then groupBy'd the doc id, which re-shuffled the
    corpus — exactly what this docstring promised not to do). Each
    per-pair cosine keeps the ``dot/(t_n·e_n)`` factoring, so the
    values are bit-identical to the pairwise formulation and a SQL
    oracle replays them exactly; ``array_max`` is order-free. For
    eval sets too large for one row (~10⁵ × dim doubles), gate with
    ``hyperplane_lsh_pairs`` candidates instead.
    """
    from .similarity import dot, norm

    # 1-row frame: array of (vec, norm) structs for the whole eval set
    ev_packed = eval_set.agg(
        F.collect_list(
            F.struct(
                F.col(vec_col).alias("v"),
                norm(F.col(vec_col)).alias("n"),
            )
        ).alias("_evs")
    )
    tr = train.select(
        F.col(id_col), F.col(vec_col).alias("t_vec"),
        norm(F.col(vec_col)).alias("t_n"),
    )
    sims = F.transform(
        F.col("_evs"),
        lambda s: dot(F.col("t_vec"), s["v"]) / (F.col("t_n") * s["n"]),
    )
    return tr.crossJoin(F.broadcast(ev_packed)).select(
        F.col(id_col),
        F.array_max(sims).alias("max_eval_sim"),
    ).select(
        F.col(id_col),
        "max_eval_sim",
        (F.col("max_eval_sim") >= F.lit(threshold)).alias("is_contaminated"),
    )
