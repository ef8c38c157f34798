"""Pure-Python WRatio-compatible scorer (F2 parity fallback).

The reference scores fuzzy candidates with rapidfuzz ``fuzz.WRatio``
(core/logic/fuzzy_search.py:54-60). rapidfuzz is optional in this
engine's environment, so this module re-implements the WRatio recipe
from the publicly documented algorithm (rapidfuzz/fuzzywuzzy):

- ``ratio``        — normalized InDel similarity, 100*(1 - dist/(m+n))
  with the exact LCS-based InDel distance (not difflib's heuristic).
- ``partial_ratio``  — best ``ratio`` of the shorter string against any
  same-length window of the longer.
- ``token_sort_ratio`` / ``token_set_ratio`` — ``ratio`` over
  whitespace-token rearrangements (sorted join / set-algebra join).
- ``wratio``       — the weighted combination: plain vs token scores
  scaled 0.95 for similar lengths; partial variants scaled 0.9 (length
  ratio < 8) or 0.6 otherwise.

Strings are scored as given — callers normalize first (the reference
unidecodes+lowercases before scoring; ``fuzzy.build_search_index``
stores ``norm_name`` the same way). Names are short, so the O(m*n)
DP per pair is fine inside an Arrow-batched pandas UDF; rapidfuzz
(C++) is still preferred when importable.
"""

from __future__ import annotations


def _lcs_len(a: str, b: str) -> int:
    """Length of the longest common subsequence (row-rolling DP)."""
    if not a or not b:
        return 0
    if len(b) > len(a):  # roll over the shorter row
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> float:
    """Normalized InDel similarity in [0, 100] (rapidfuzz fuzz.ratio):
    InDel distance = m + n - 2*LCS, similarity = 1 - dist/(m+n)."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    dist = total - 2 * _lcs_len(a, b)
    return 100.0 * (1.0 - dist / total)


def partial_ratio(a: str, b: str) -> float:
    """Best ``ratio`` of the shorter string vs any same-length window
    of the longer, INCLUDING windows clipped at either edge (rapidfuzz
    lets the alignment slide past the ends: 'abcd' vs 'zzzabc' scores
    against the clipped suffix 'abc' -> 85.7, not just the full
    window 'zabc' -> 75 — interior-only sliding under-scores edge
    matches and diverges from the reference scorer)."""
    if len(a) > len(b):
        a, b = b, a
    if not a:
        return 100.0 if not b else 0.0
    n, m = len(a), len(b)
    best = max(ratio(a, b[i : i + n]) for i in range(m - n + 1))
    for k in range(1, n):  # edge-clipped alignments
        best = max(best, ratio(a, b[:k]), ratio(a, b[m - k :]))
    return best


def _token_sort_join(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(_token_sort_join(a), _token_sort_join(b))


def _token_set_strings(a: str, b: str) -> tuple[str, str, str]:
    ta, tb = set(a.split()), set(b.split())
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return inter, sa, sb


def token_set_ratio(a: str, b: str) -> float:
    inter, sa, sb = _token_set_strings(a, b)
    return max(ratio(inter, sa), ratio(inter, sb), ratio(sa, sb))


def _token_ratio(a: str, b: str) -> float:
    return max(token_sort_ratio(a, b), token_set_ratio(a, b))


def _partial_token_ratio(a: str, b: str) -> float:
    sort = partial_ratio(_token_sort_join(a), _token_sort_join(b))
    inter, sa, sb = _token_set_strings(a, b)
    tset = max(partial_ratio(inter, sa), partial_ratio(inter, sb), partial_ratio(sa, sb))
    return max(sort, tset)


def wratio(a: str, b: str) -> float:
    """The WRatio weighted combination (public rapidfuzz recipe):

    - either side empty -> 0
    - length ratio < 1.5: max(ratio, token_ratio * 0.95)
    - length ratio < 8:   max(ratio, partial_ratio * 0.9,
                              partial_token_ratio * 0.9 * 0.95)
    - otherwise the partial scale drops to 0.6.
    """
    unbase_scale = 0.95
    if not a or not b:
        return 0.0
    len_ratio = max(len(a), len(b)) / min(len(a), len(b))
    end_ratio = ratio(a, b)
    if len_ratio < 1.5:
        return max(end_ratio, _token_ratio(a, b) * unbase_scale)
    partial_scale = 0.9 if len_ratio < 8 else 0.6
    end_ratio = max(end_ratio, partial_ratio(a, b) * partial_scale)
    return max(end_ratio, _partial_token_ratio(a, b) * unbase_scale * partial_scale)
