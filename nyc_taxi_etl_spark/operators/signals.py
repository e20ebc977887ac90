"""Compression-based document quality signals.

The compression ratio of a document (zlib bytes out / bytes in) is a
classic curation signal (used alongside the Gopher rules): templated or
highly repetitive text compresses far better than natural prose, and
binary junk barely compresses at all — so both tails of the ratio
distribution mark documents to inspect or drop.

zlib is not expressible in Catalyst, so this is one of the engine's few
legitimate Python stages: an Arrow-batched ``mapInPandas`` (never a
row-at-a-time UDF), with only ``(id, text)`` projected into Python and
a fixed 4-column frame coming back. Deterministic for a fixed zlib
level, so results are stable across runs/partitionings.

Scale: embarrassingly parallel, zero shuffles; per-row cost is
O(bytes) compression. At 100 TB this runs as one narrow pass and the
signal is typically persisted next to the quality scores.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["compression_signals"]

_SCHEMA = (
    "doc_id long, raw_bytes long, compressed_bytes long, "
    "compression_ratio double"
)


def compression_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression signal:
    ``(doc_id, raw_bytes, compressed_bytes, compression_ratio)``.
    Empty documents report ratio 1.0 (nothing to compress is not
    "suspiciously compressible")."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").map(lambda s: s.encode("utf-8"))
            nraw = raw.map(len)
            ncomp = raw.map(lambda b: len(zlib.compress(b, level)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "raw_bytes": nraw,
                    "compressed_bytes": ncomp,
                    "compression_ratio": [
                        (c / r) if r else 1.0
                        for c, r in zip(ncomp, nraw)
                    ],
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), text_col).mapInPandas(
        run, _SCHEMA
    )
