"""From-scratch string-similarity kernels (the public fuzzywuzzy/rapidfuzz
algorithm family) — used by the reasoning category normalizer
(reference dataflow/utils/reasoning/CategoryFuzz.py, which wraps
``rapidfuzz.fuzz.WRatio``; rapidfuzz is absent from this sandbox, so the
published algorithms are reimplemented here and unit-tested on
hand-computed vectors).

All scores are 0..100 floats:

* ``ratio`` — normalized Indel similarity, ``100 * (1 - dist/(m+n))`` where
  dist counts insertions+deletions only (rapidfuzz's ``fuzz.ratio``; equals
  difflib's 2M/(m+n) on the LCS).
* ``partial_ratio`` — best ``ratio`` of the shorter string against any
  same-length substring window of the longer.
* ``token_sort_ratio`` — ``ratio`` over whitespace tokens sorted.
* ``token_set_ratio`` — the fuzzywuzzy set construction over the sorted
  intersection/differences.
* ``wratio`` — the published composite: plain + token scores at unbase
  scale 0.95; when the lengths differ by >1.5x, partial variants at scale
  0.9 (or 0.6 past 8x).
"""

from __future__ import annotations

from functools import lru_cache


def _lcs_len(a: str, b: str) -> int:
    """Length of the longest common subsequence (row-rolling DP)."""
    if not a or not b:
        return 0
    if len(b) > len(a):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        p0 = prev[0]
        for j, cb in enumerate(b, 1):
            cur.append(max(prev[j], cur[-1], p0 + 1 if ca == cb else 0))
            p0 = prev[j]
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> float:
    """Indel similarity: 100 * 2*LCS / (len(a)+len(b)); 100.0 for two empty
    strings (rapidfuzz convention)."""
    if not a and not b:
        return 100.0
    denom = len(a) + len(b)
    if denom == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / denom


def partial_ratio(a: str, b: str) -> float:
    """Best ratio of the shorter string vs every same-length window of the
    longer (the classic fuzzywuzzy construction)."""
    if len(a) > len(b):
        a, b = b, a
    if not a:
        return 100.0 if not b else 0.0
    best = 0.0
    la = len(a)
    for start in range(0, len(b) - la + 1):
        best = max(best, ratio(a, b[start:start + la]))
        if best == 100.0:
            return best
    return best


def _sorted_tokens(s: str) -> list[str]:
    return sorted(s.split())


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(" ".join(_sorted_tokens(a)), " ".join(_sorted_tokens(b)))


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    inter = " ".join(sorted(ta & tb))
    sect_a = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sect_b = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(
        ratio(inter, sect_a),
        ratio(inter, sect_b),
        ratio(sect_a, sect_b),
    )


def partial_token_ratio(a: str, b: str) -> float:
    """rapidfuzz's ``fuzz.partial_token_ratio`` — the max of the partial
    token-sort and partial token-set ratios, with the published shortcuts:
    any shared token means the token-set intersection is a common prefix of
    both constructed strings, so the partial score is 100 immediately; when
    the sorted token lists coincide with the set differences (no shared
    tokens, no duplicate tokens), the diff-vs-diff partial equals the
    sort-vs-sort partial and is skipped."""
    ta, tb = _sorted_tokens(a), _sorted_tokens(b)
    sa, sb = set(ta), set(tb)
    if sa & sb:
        return 100.0
    diff_ab, diff_ba = sorted(sa - sb), sorted(sb - sa)
    result = partial_ratio(" ".join(ta), " ".join(tb))
    if len(ta) == len(diff_ab) and len(tb) == len(diff_ba):
        return result
    return max(result, partial_ratio(" ".join(diff_ab), " ".join(diff_ba)))


def wratio(a: str, b: str) -> float:
    """The published WRatio composite (fuzzywuzzy WRatio / rapidfuzz
    fuzz.WRatio): token scores scaled by 0.95; when max/min length > 1.5
    the PARTIAL variants enter at scale 0.9 (0.6 beyond 8x) — i.e.
    max(ratio, partial_ratio*scale, partial_token_ratio*0.95*scale)."""
    if not a or not b:
        return 0.0
    unbase = 0.95
    base = ratio(a, b)
    len_ratio = max(len(a), len(b)) / min(len(a), len(b))
    if len_ratio < 1.5:
        return max(
            base,
            token_sort_ratio(a, b) * unbase,
            token_set_ratio(a, b) * unbase,
        )
    partial_scale = 0.9 if len_ratio < 8 else 0.6
    return max(
        base,
        partial_ratio(a, b) * partial_scale,
        partial_token_ratio(a, b) * unbase * partial_scale,
    )


@lru_cache(maxsize=4096)
def _wratio_cached(a: str, b: str) -> float:
    return wratio(a, b)


def extract_one(query: str, choices: tuple[str, ...]):
    """(best_choice, score) by WRatio; ties keep the first choice, matching
    ``process.extractOne``'s stable scan."""
    best, best_score = None, -1.0
    for c in choices:
        s = _wratio_cached(query, c)
        if s > best_score:
            best, best_score = c, s
    return best, best_score
