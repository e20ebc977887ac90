"""One-call LLM training-data pipeline: raw documents → training shards.

Composes the individually oracle-checked stages in the order a
production curation run uses them:

    1. curate      — quality filter → exact dedup → MinHash-LSH
                     near-dedup → component keeper selection
                     (``curate.curate_documents``)
    2. redact      — PII placeholders (``redact.redact_pii``)
    3. deboiler    — corpus-frequency k-gram masking
                     (``boilerplate.remove_boilerplate``)
    4. chunk       — token-window chunks (``chunking.chunk_by_tokens``)
    5. split       — deterministic train/val/test
                     (``export.train_val_test_split``)
    6. export      — shuffled, sharded parquet per split
                     (``export.export_shuffled``)

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
) -> DataFrame:
    """Run the full pipeline; returns the chunk-level DataFrame
    ``(id_col, chunk_ix, chunk_text, chunk_tokens, split)``. When
    ``output_path`` is given, also writes shuffled parquet shards to
    ``{output_path}/split=<name>/`` per split.

    Chunks inherit their document's split (the label hashes the
    DOCUMENT key, not the chunk) — sibling chunks of one document must
    never straddle train/val, or evaluation leaks training text.
    """
    curated = curate_documents(
        docs,
        id_col=id_col,
        text_col=text_col,
        quality_threshold=quality_threshold,
        jaccard_threshold=jaccard_threshold,
    )
    redacted = curated.withColumn(text_col, redact_pii(F.col(text_col)))
    cleaned = remove_boilerplate(
        redacted, text_col=text_col, id_col=id_col, min_doc_frac=boiler_doc_frac
    ).withColumnRenamed("clean_text", text_col)
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
        for row in chunks.select("split").distinct().collect():
            name = row["split"]
            export_shuffled(
                chunks.filter(F.col("split") == name).drop("split"),
                f"{output_path}/split={name}",
                id_col=id_col,
                seed=seed,
                num_shards=num_shards,
            )
    return chunks
