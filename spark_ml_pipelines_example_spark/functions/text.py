"""Text-analysis column builders (tokenize, shingles, quality signals).

The documents fixture is single-space-separated lowercase text
(FIXTURES.md §B), so whitespace split IS the tokenizer; the BPE-ish
regex token count is exposed separately for mixed text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens a quality scorer treats as stopwords in the fixture vocabulary.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "data", "row", "value")

# BPE-ish segmentation: runs of alnum, or single non-alnum non-space marks.
BPE_REGEX = r"[a-z0-9]+|[^a-z0-9\s]"


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def bigrams(toks: Column) -> Column:
    """Adjacent word 2-gram shingles: zip(tokens[:-1], tokens[1:])."""
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))


def ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles joined with spaces: one per window position.
    Explicitly empty below n tokens — Spark's ``sequence(1, 0)`` would
    DESCEND ([1, 0]), yielding bogus short shingles."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
