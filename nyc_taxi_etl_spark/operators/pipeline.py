"""One-call LLM training-data pipeline: raw documents → training shards.

Composes the individually oracle-checked stages in the order a
production curation run uses them:

    0. rule gates  — optional Gopher keep-rules (inline WHERE, rides
                     the scan) and C4 line cleaning
                     (``rules.gopher_keep`` / ``rules.c4_line_filter``)
                     — cheap row-local filters run BEFORE the expensive
                     dedup stages, the RefinedWeb ordering
    1. curate      — quality filter → exact dedup → MinHash-LSH
                     near-dedup → component keeper selection
                     (``curate.curate_documents``)
    1b. passages   — optional exact duplicate-passage removal on the
                     dedup survivors (``passages.dedup_passages``,
                     keep-first) — whole-doc dedup leaves repeated
                     spans inside distinct docs; this removes them
    2. classify    — optional fastText-style quality-classifier gate
                     (``classifier.score_fixed_lexicon``)
    3. redact      — PII placeholders (``redact.redact_pii``)
    4. deboiler    — corpus-frequency k-gram masking
                     (``boilerplate.remove_boilerplate``)
    5. derep       — optional collapse of immediately-repeated n-gram
                     runs (``text.collapse_repeated_ngrams``)
    6. budget      — optional per-source token-budget selection on the
                     CLEANED text (``selection``)
    7. chunk       — token-window chunks (``chunking.chunk_by_tokens``)
    8. split       — deterministic train/val/test
                     (``export.train_val_test_split``)
    9. export      — shuffled, sharded parquet or JSONL per split
                     (``export.export_shuffled`` / ``jsonl``)

Stage ORDER is the scale argument: dedup runs before the per-token
masking/chunking stages so duplicate bytes are hashed once, never
masked or chunked; redaction precedes boilerplate detection so
placeholder tokens (high-df by design) are counted as the boilerplate
they are; chunking inflates row count last. Everything up to the final
writes is one lazy plan per split — no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .boilerplate import remove_boilerplate
from .chunking import chunk_by_tokens
from .curate import curate_documents
from .export import export_shuffled, train_val_test_split
from .redact import redact_pii

__all__ = ["prepare_training_corpus"]


def prepare_training_corpus(
    docs: DataFrame,
    output_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.5,
    jaccard_threshold: float = 0.5,
    boiler_doc_frac: float = 0.5,
    chunk_tokens: int = 128,
    chunk_overlap: int = 0,
    fracs: dict[str, float] | None = None,
    seed: int = 0,
    num_shards: int = 8,
    classifier_min_prob: float | None = None,
    collapse_repeats: bool = False,
    budget_tokens: int | None = None,
    source_col: str = "source",
    output_format: str = "parquet",
    gopher_gate: bool | dict = False,
    c4_clean: bool = False,
    passage_dedup_k: int | None = None,
    cap_per: tuple[str, int] | None = None,
    weighted_k: int | None = None,
) -> DataFrame:
    """Run the full pipeline; returns the chunk-level DataFrame
    ``(id_col, chunk_ix, chunk_text, chunk_tokens, split)``. When
    ``output_path`` is given, also writes shuffled parquet shards to
    ``{output_path}/split=<name>/`` per split.

    Chunks inherit their document's split (the label hashes the
    DOCUMENT key, not the chunk) — sibling chunks of one document must
    never straddle train/val, or evaluation leaks training text.
    """
    if gopher_gate:
        # inline boolean rides the scan — no audit-frame semi-join;
        # pass a dict to override rule thresholds
        from .rules import gopher_keep

        params = gopher_gate if isinstance(gopher_gate, dict) else {}
        docs = docs.where(gopher_keep(F.col(text_col), **params))
    if c4_clean:
        from .rules import c4_line_filter

        extras = tuple(
            c for c in docs.columns if c not in (id_col, text_col)
        )
        docs = (
            c4_line_filter(docs, text_col=text_col, id_col=id_col,
                           extra_cols=extras)
            .where(F.col("doc_kept"))
            .drop("n_lines", "kept_lines", "doc_kept")
            .withColumnRenamed("clean_text", text_col)
        )
    if cap_per is not None:
        # RefinedWeb-style per-key quota (domain/source farms must not
        # dominate): keep the longest ``n`` docs per key — runs BEFORE
        # the expensive dedup stages so over-quota bulk never reaches
        # them. Hot keys are exactly the expected case here; the
        # two-phase top-k truncates within input partitions first.
        from pyspark.sql import Window as _W

        from ..functions.skew import two_phase_topk
        from .text import token_count

        cap_col, cap_n = cap_per
        capped = two_phase_topk(
            docs.withColumn("__len", token_count(F.col(text_col))),
            [cap_col],
            "__len",
            id_col,
            cap_n,
        ).drop("__len")
        docs = capped
    curated = curate_documents(
        docs,
        id_col=id_col,
        text_col=text_col,
        quality_threshold=quality_threshold,
        jaccard_threshold=jaccard_threshold,
    )
    if weighted_k is not None:
        # quality-weighted subsample (Efraimidis-Spirakis): k docs with
        # inclusion probability ∝ curation quality — softer than a hard
        # quality cutoff, deterministic under the seed
        from .sampling import weighted_sample

        curated = weighted_sample(
            curated, id_col, "quality", k=weighted_k, seed=seed
        ).drop("sample_key")
    if passage_dedup_k is not None:
        from .passages import dedup_passages

        extras = tuple(
            c for c in curated.columns if c not in (id_col, text_col)
        )
        curated = (
            dedup_passages(curated, text_col=text_col, id_col=id_col,
                           k=passage_dedup_k, extra_cols=extras)
            .drop("n_tokens", "removed_tokens")
            .withColumnRenamed("clean_text", text_col)
        )
    if classifier_min_prob is not None:
        # row-local scored gate on the curated survivors; semi-join on
        # the id key (AQE-sized — the score frame is id+prob only)
        from .classifier import score_fixed_lexicon

        keep = score_fixed_lexicon(
            curated, text_col=text_col, id_col=id_col
        ).filter(F.col("quality_prob") >= classifier_min_prob)
        curated = curated.join(keep.select(id_col), id_col, "semi")
    redacted = curated.withColumn(text_col, redact_pii(F.col(text_col)))
    # quality/source ride through the masking stage so the budget
    # selector doesn't re-join (and re-execute) the curation subtree
    passthrough = (source_col, "quality") if budget_tokens is not None else ()
    cleaned = remove_boilerplate(
        redacted,
        text_col=text_col,
        id_col=id_col,
        min_doc_frac=boiler_doc_frac,
        passthrough=passthrough,
    ).withColumnRenamed("clean_text", text_col)
    if collapse_repeats:
        from .text import collapse_repeated_ngrams

        cleaned = cleaned.withColumn(
            "_derep", collapse_repeated_ngrams(F.col(text_col))
        ).withColumn(text_col, F.col("_derep.clean_text")).drop("_derep")
    if budget_tokens is not None:
        # budget on the CLEANED token counts (masking/derep changed
        # them); quality column survives from curation
        from .selection import select_top_quality_within_budget
        from .text import token_count

        cleaned = select_top_quality_within_budget(
            cleaned.withColumn("_nt", token_count(F.col(text_col))),
            budget_tokens,
            quality_col="quality",
            token_col="_nt",
            source_col=source_col,
            id_col=id_col,
        ).drop("_nt", "sel_rank", "cum_tokens")
    # Split AFTER chunking: the label is a pure hash of the DOCUMENT
    # key, so every sibling chunk inherits its document's split with no
    # join and no second execution of the curation subtree — while
    # still guaranteeing chunks of one document never straddle splits.
    chunks = train_val_test_split(
        chunk_by_tokens(
            cleaned,
            text_col=text_col,
            id_col=id_col,
            chunk_tokens=chunk_tokens,
            overlap=chunk_overlap,
        ),
        id_col,
        fracs,
        seed,
    )

    if output_path is not None:
        if output_format not in ("parquet", "jsonl"):
            raise ValueError(f"unknown output_format: {output_format}")
        for row in chunks.select("split").distinct().collect():
            name = row["split"]
            part = chunks.filter(F.col("split") == name).drop("split")
            if output_format == "jsonl":
                from ..sources.jsonl import export_jsonl

                export_jsonl(
                    part,
                    f"{output_path}/split={name}",
                    id_col=id_col,
                    seed=seed,
                    num_shards=num_shards,
                )
            else:
                export_shuffled(
                    part,
                    f"{output_path}/split={name}",
                    id_col=id_col,
                    seed=seed,
                    num_shards=num_shards,
                )
    return chunks
