"""Optimal-string-alignment (restricted Damerau-Levenshtein) edit distance,
vectorized over a batch of candidate terms against one query term.

The reference's FuzzyQuery measures "Damerau-Levenshtein (optimal string
alignment)" when transpositions=true — its default
(search/FuzzyQuery.java:30-31, 61-81; the TLev parametric automata of
util/automaton/LevenshteinAutomata.java). OSA counts an adjacent
transposition as one edit but never edits a transposed pair again, so it
differs from unrestricted Damerau-Levenshtein: OSA("ca","abc") = 3 while
true DL = 2. At max_edits <= 1 the two metrics coincide (a single op is a
single op), which is what the DuckDB damerau_levenshtein oracle relies on.

The DP runs row-at-a-time over the candidate batch: each row's
within-row insertion recurrence cur[j] = min(c[j], cur[j-1] + 1) is
resolved as j + running-min(c[k] - k), a prefix minimum — one
np.minimum.accumulate per row, no per-candidate Python loop.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def osa_distances(cands: Sequence[str], term: str) -> np.ndarray:
    """dist[i] = OSA(cands[i], term). Vectorized over the candidate batch."""
    n = len(cands)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t = np.frombuffer(term.encode("utf-32-le"), dtype=np.uint32)
    m = len(t)
    lens = np.fromiter((len(c) for c in cands), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    if L == 0:
        return np.full(n, m, dtype=np.int64)
    pad = "".join(c.ljust(L, "\0") for c in cands)
    codes = np.frombuffer(pad.encode("utf-32-le"), dtype=np.uint32).reshape(n, L)

    out = np.empty(n, dtype=np.int64)
    out[lens == 0] = m
    js = np.arange(m + 1, dtype=np.int64)
    prev2 = None
    prev = np.broadcast_to(js, (n, m + 1)).copy()  # dp[0][j] = j
    done = lens == 0
    for i in range(1, L + 1):
        si = codes[:, i - 1]  # current candidate char, per candidate
        c = np.empty((n, m + 1), dtype=np.int64)
        c[:, 0] = i
        sub = prev[:, :-1] + (si[:, None] != t[None, :])
        dele = prev[:, 1:] + 1
        c[:, 1:] = np.minimum(sub, dele)
        if i >= 2 and m >= 2:
            # transposition at dp column j (=jj+2): s_i == t[j-2], s_{i-1} == t[j-1]
            tr = (si[:, None] == t[None, :-1]) & (
                codes[:, i - 2][:, None] == t[None, 1:]
            )
            c[:, 2:] = np.where(
                tr, np.minimum(c[:, 2:], prev2[:, :-2] + 1), c[:, 2:]
            )
        cur = js[None, :] + np.minimum.accumulate(c - js[None, :], axis=1)
        at_end = lens == i
        if at_end.any():
            out[at_end] = cur[at_end, m]
            done |= at_end
        prev2, prev = prev, cur
        if done.all():
            break
    return out


def osa_distance(a: str, b: str) -> int:
    """Scalar OSA — the classic three-term DP plus the transposition term
    guarded by the no-re-edit restriction; used as the independent test
    reference for osa_distances."""
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        dp[i][0] = i
    for j in range(lb + 1):
        dp[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            best = min(
                dp[i - 1][j] + 1, dp[i][j - 1] + 1, dp[i - 1][j - 1] + cost
            )
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                best = min(best, dp[i - 2][j - 2] + 1)
            dp[i][j] = best
    return dp[la][lb]
