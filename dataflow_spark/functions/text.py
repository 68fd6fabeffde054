"""Shared Catalyst expression helpers over text columns.

Everything here is a pure Column expression — JVM-side, whole-stage-codegen
friendly, no Python.  These mirror the reference's shared helpers
``split_paragraphs`` / ``normalize``
(dataflow/operators/general_text/filter/rule_based_filter.py:139-182) but as
vectorized expressions instead of per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col) -> Column:
    """Whitespace-split words, empties removed — ``text.split()`` parity."""
    return F.filter(F.split(c(col), r"\s+"), lambda w: w != "")


def lower_words(col) -> Column:
    return F.filter(F.split(F.lower(c(col)), r"\s+"), lambda w: w != "")


def lines(col) -> Column:
    """Newline-split lines, blank lines removed (split_paragraphs with
    remove_empty=True, rule_based_filter.py:139-156)."""
    return F.filter(F.split(c(col), r"\n"), lambda l: F.trim(l) != "")


def word_count(col) -> Column:
    return F.size(words(col))


def char_count_no_ws(col) -> Column:
    """Character count ignoring all whitespace (CharNumberFilter,
    rule_based_filter.py:1338-1355)."""
    return F.length(F.regexp_replace(c(col), r"\s", ""))


def count_substr(col, sub: str) -> Column:
    """Non-overlapping occurrence count of a literal substring —
    (len(s) - len(s.replace(sub,''))) / len(sub), pure expression."""
    return (
        (F.length(c(col)) - F.length(F.replace(c(col), F.lit(sub), F.lit(""))))
        / len(sub)
    ).cast("long")


def count_regex(col, pattern: str) -> Column:
    return F.regexp_count(c(col), F.lit(pattern))


def ratio(num: Column, den: Column) -> Column:
    """Safe ratio: null when denominator is 0."""
    return F.when(den != 0, num.cast("double") / den.cast("double"))


def ngram_strings(arr: Column, n: int, sep: str = "") -> Column:
    """Sliding n-grams over an array column, each joined into one string
    (elements cast to string first) — pure Catalyst HOFs:
    ``transform(sequence(0, size-n), i -> array_join(slice(arr, i+1, n)))``.
    Used by n-gram uniqueness scores and segment-hash dedup."""
    s = F.transform(arr, lambda x: x.cast("string"))
    return F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - n),
            lambda i: F.array_join(F.slice(s, i + 1, n), sep),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_unique_ratio(arr: Column, n: int) -> Column:
    """unique n-grams / total n-grams (NgramSampleEvaluator semantics,
    dataflow/operators/general_text/eval/ngram_sample_evaluator.py:47-79);
    null when fewer than n elements."""
    grams = ngram_strings(arr, n)
    return ratio(F.size(F.array_distinct(grams)), F.size(grams))


_SHINGLE_MOD = 2199023255531          # prime < 2^41: rolling values stay < 2^63
_SHINGLE_BASE = 1 << 20               # > vocab size => injective per position


def token_shingle_hashes(arr: Column, n: int) -> Column:
    """Numeric n-gram shingle hashes over an int token array — pure JVM
    arithmetic (rolling polynomial mod a 41-bit prime), no string
    materialization.  ~5x cheaper than hashing ``ngram_strings`` output at
    bench scale: the string path builds |tokens| * n chars per row before
    xxhash64 even runs."""
    def gram_hash(i):
        h = F.lit(0).cast("long")
        for j in range(n):
            h = F.pmod(h * F.lit(_SHINGLE_BASE) + F.element_at(arr, i + j + 1).cast("long"),
                       F.lit(_SHINGLE_MOD))
        return h

    return F.when(
        F.size(arr) >= n,
        F.transform(F.sequence(F.lit(0), F.size(arr) - n), gram_hash),
    ).otherwise(F.array().cast("array<long>"))  # short docs never pair
