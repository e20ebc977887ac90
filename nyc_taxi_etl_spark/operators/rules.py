"""Rule-based document filters: Gopher quality heuristics and C4-style
line cleaning.

Two published filter families that sit beside the composite
``text.quality_score`` (reference parity: the ETL validity filters in
``spark_jobs/etl_yellow_s3.py`` are the same shape — per-row predicate
batteries; these are their curation-grade cousins):

* **Gopher rules** (Rae et al. 2021, *Scaling Language Models: ...
  Gopher*, Appendix A1.1): per-document bounds on word count, mean
  word length, symbol-to-word ratio, bullet/ellipsis line fractions,
  alphabetic-word fraction, and stop-word presence. Each rule is
  emitted as an auditable boolean plus the measured statistic, with a
  composite ``keep``.
* **C4 line filter** (Raffel et al. 2020, T5): keep only lines that
  end in terminal punctuation and carry enough words; drop whole
  documents containing code/placeholder markers (``{``, ``lorem
  ipsum``) or too few surviving lines.

Scale design: every rule is a pure Catalyst expression over the token
array / line array — row-local, zero shuffles, no Python. At 100 TB
the cost is one codegen'd pass of the scan; the filters compose with
predicate pushdown when used as ``WHERE`` clauses downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = [
    "gopher_flags",
    "gopher_keep",
    "c4_line_filter",
    "GOPHER_STOPWORDS",
]

# Rae et al. A1.1: "contain at least two of the following English
# words: the, be, to, of, and, that, have, with".
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLETS = ("- ", "* ", "• ")
_TERMINALS = (".", "!", "?", '"')


def _lines(text: Column) -> Column:
    """Non-empty lines of the document (trimmed)."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _dbl(c: Column) -> Column:
    # Ratios of exact integers: IEEE division is bit-identical across
    # engines, so they are emitted UNrounded (rounding would introduce
    # HALF_UP-vs-multiply-round midpoint divergence — see the verify
    # skill's gotcha list).
    return c.cast("double")


def _gopher_stats(text: Column) -> dict[str, Column]:
    """The raw per-document statistics every Gopher rule reads — one
    dict of pure Catalyst expressions over the token/line arrays."""
    w = tokens(text)
    lines = _lines(text)
    n_words = F.size(w).cast("long")
    n_lines = F.size(lines).cast("long")
    # Mean word length over the words themselves (not chars/words,
    # which would count separators).
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            w,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(x),
        ).cast("double")
        / n_words,
    )
    symbol_ratio = F.when(
        n_words > 0,
        (
            F.regexp_count(text, F.lit(r"#"))
            + F.regexp_count(text, F.lit(r"\.\.\."))
            + F.regexp_count(text, F.lit("…"))
        ).cast("double")
        / n_words,
    )
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.lit(False)
                | l.startswith(_BULLETS[0])
                | l.startswith(_BULLETS[1])
                | l.startswith(_BULLETS[2]),
            )
        ).cast("double")
        / n_lines,
    )
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: l.endswith("...") | l.endswith("…"),
            )
        ).cast("double")
        / n_lines,
    )
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / n_words,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(w, F.lower)),
            F.lit(list(GOPHER_STOPWORDS)),
        )
    ).cast("long")
    return {
        "n_words": n_words,
        "mean_word_len": _dbl(mean_wl),
        "symbol_ratio": _dbl(symbol_ratio),
        "bullet_line_frac": _dbl(bullet_frac),
        "ellipsis_line_frac": _dbl(ellipsis_frac),
        "alpha_word_frac": _dbl(alpha_frac),
        "stopword_hits": stop_hits,
    }


def _gopher_rules(
    s: dict[str, Column],
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_ratio: float,
    max_bullet_frac: float,
    max_ellipsis_frac: float,
    min_alpha_frac: float,
    min_stopword_hits: int,
) -> dict[str, Column]:
    return {
        "ok_words": (s["n_words"] >= min_words)
        & (s["n_words"] <= max_words),
        "ok_mean_word_len": F.coalesce(
            (s["mean_word_len"] >= min_mean_word_len)
            & (s["mean_word_len"] <= max_mean_word_len),
            F.lit(False),
        ),
        "ok_symbols": F.coalesce(
            s["symbol_ratio"] <= max_symbol_ratio, F.lit(False)
        ),
        "ok_bullets": F.coalesce(
            s["bullet_line_frac"] <= max_bullet_frac, F.lit(True)
        ),
        "ok_ellipsis": F.coalesce(
            s["ellipsis_line_frac"] <= max_ellipsis_frac, F.lit(True)
        ),
        "ok_alpha": F.coalesce(
            s["alpha_word_frac"] >= min_alpha_frac, F.lit(False)
        ),
        "ok_stopwords": s["stopword_hits"] >= min_stopword_hits,
    }


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher repetition-free quality rules: one row per document with
    the measured statistic, the per-rule pass flag, and the composite
    ``keep`` (AND of all rules). Ratios are emitted as raw doubles —
    they are divisions of exact integers, bit-identical across engines
    (see ``_dbl``)."""
    stats = _gopher_stats(F.col(text_col))
    out = df.select(
        F.col(id_col), *[c.alias(name) for name, c in stats.items()]
    )
    rules = _gopher_rules(
        {name: F.col(name) for name in stats},
        min_words,
        max_words,
        min_mean_word_len,
        max_mean_word_len,
        max_symbol_ratio,
        max_bullet_frac,
        max_ellipsis_frac,
        min_alpha_frac,
        min_stopword_hits,
    )
    out = out.select("*", *[expr.alias(name) for name, expr in rules.items()])
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.select("*", keep.alias("keep"))


def gopher_keep(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> Column:
    """The composite Gopher ``keep`` as ONE inline boolean expression —
    the zero-shuffle form for use directly in a ``WHERE`` (pipelines
    filter with this instead of semi-joining the audit frame, so the
    gate rides the scan and costs no exchange)."""
    rules = _gopher_rules(
        _gopher_stats(text),
        min_words,
        max_words,
        min_mean_word_len,
        max_mean_word_len,
        max_symbol_ratio,
        max_bullet_frac,
        max_ellipsis_frac,
        min_alpha_frac,
        min_stopword_hits,
    )
    keep = F.lit(True)
    for expr in rules.values():
        keep = keep & expr
    return keep


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """C4 cleaning: a line survives iff it ends in terminal punctuation
    (``. ! ? "``) and has ≥ ``min_words_per_line`` whitespace words;
    the document survives iff it contains no ``{`` / ``lorem ipsum``
    marker and keeps ≥ ``min_kept_lines`` lines. Emits the cleaned
    text (kept lines re-joined with newlines) plus the audit columns.
    """
    text = F.col(text_col)
    lines = _lines(text)

    def line_ok(l: Column) -> Column:
        ends = F.lit(False)
        for t in _TERMINALS:
            ends = ends | l.endswith(t)
        return ends & (F.size(F.split(l, r"\s+")) >= min_words_per_line)

    kept = F.filter(lines, line_ok)
    bad_doc = F.lower(text).contains("lorem ipsum") | text.contains("{")
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("kept_lines"),
        (~bad_doc & (F.size(kept) >= min_kept_lines)).alias("doc_kept"),
        *[F.col(c) for c in extra_cols],
    )
