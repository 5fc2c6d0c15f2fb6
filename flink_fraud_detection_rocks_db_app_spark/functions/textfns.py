"""Text expressions shared by the dedup/text-analysis operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(col: str = "text") -> Column:
    """Lowercase + whitespace-collapsed text (the dedup canonical form)."""
    return F.regexp_replace(F.lower(F.col(col)), r"\s+", " ")


def whitespace_tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), " ")


def word_ngrams(tokens_col: str = "w", n: int = 3) -> Column:
    """Distinct word n-gram shingles of an existing token-array column
    (pass tokens through `whitespace_tokens` first so the split isn't
    recomputed per shingle).

    Docs with fewer than n tokens yield an empty array. The IF guard
    matters: bare ``sequence(0, size(w) - n)`` with size(w) < n counts
    DOWN (sequence's default step is -1), fabricating shingles from
    out-of-range indexes — or hard-erroring under ANSI mode — while the
    DuckDB oracle's ``range()`` is empty. (ADVICE r1.)"""
    idx = ", ".join(f"{tokens_col}[i + {k}]" for k in range(n))
    return F.expr(
        f"IF(size({tokens_col}) >= {n}, "
        f"array_distinct(transform(sequence(0, size({tokens_col}) - {n}), "
        f"i -> concat_ws(' ', {idx}))), "
        f"CAST(array() AS ARRAY<STRING>))"
    )
