"""Pluggable spell-checker string distances — literal ports of the
reference's StringDistance family (suggest/spell/JaroWinklerDistance.java,
NGramDistance.java, LuceneLevenshteinDistance.java). All return a
SIMILARITY in [0, 1]-ish (higher = closer), float32 at the final cast
like the reference's float math. These run inside Arrow-batched pandas
UDFs in DirectSpellChecker rescoring; per-pair cost is O(|a|·|b|) on
short dictionary terms."""

from __future__ import annotations

import numpy as np

f32 = np.float32


def jaro_winkler(s1: str, s2: str, threshold: float = 0.7, dtype=f32) -> float:
    """JaroWinklerDistance.java:38-104: Jaro similarity with the Winkler
    common-prefix bonus applied above ``threshold``."""
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    transpositions = sum(1 for a, b in zip(ms1, ms2) if a != b) // 2
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b:
            break
        prefix += 1
    dt = dtype
    m = dt(matches)
    j = dt(
        (m / dt(len(s1)) + m / dt(len(s2)) + (m - dt(transpositions)) / m)
        / dt(3.0)
    )
    if j < threshold:
        return float(j)
    bonus = min(dt(0.1), dt(1.0) / dt(len(mx))) * dt(prefix) * (
        dt(1.0) - j
    )
    return float(dt(j + bonus))


def ngram_distance(source: str, target: str, n: int = 2, dtype=f32) -> float:
    """NGramDistance.java:49-134: n-gram-cost Levenshtein normalized to a
    similarity, with the null-prefix padding and prefix-match discount."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    dt = dtype
    if sl < n or tl < n:
        cost = sum(1 for a, b in zip(source, target) if a == b)
        return float(dt(cost) / dt(max(sl, tl)))
    sa = ["\0"] * (n - 1) + list(source)
    p = np.arange(sl + 1, dtype=dt)
    d = np.zeros(sl + 1, dtype=dt)
    for j in range(1, tl + 1):
        if j < n:
            t_j = ["\0"] * (n - j) + list(target[:j])
        else:
            t_j = list(target[j - n:j])
        d[0] = dt(j)
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\0":
                    tn -= 1  # discount matches on the padding prefix
            ec = dt(cost) / dt(tn)
            d[i] = min(min(d[i - 1] + dt(1.0), p[i] + dt(1.0)), p[i - 1] + ec)
        p, d = d, p
    return float(dt(1.0) - p[sl] / dt(max(tl, sl)))


def lucene_levenshtein(target: str, other: str, dtype=f32) -> float:
    """LuceneLevenshteinDistance.java:44-105: Damerau (transposition)
    distance over code points, normalized by min length."""
    t = [ord(c) for c in target]
    o = [ord(c) for c in other]
    n, m = len(t), len(o)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    d = np.zeros((n + 1, m + 1), dtype=np.int64)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            cost = 0 if t[i - 1] == o[j - 1] else 1
            v = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if (
                i > 1
                and j > 1
                and t[i - 1] == o[j - 2]
                and t[i - 2] == o[j - 1]
            ):
                v = min(v, d[i - 2][j - 2] + cost)
            d[i][j] = v
    dt = dtype
    return float(dt(1.0) - dt(int(d[n][m])) / dt(min(m, n)))


DISTANCES = {
    "jaro_winkler": jaro_winkler,
    "ngram": ngram_distance,
    "lucene_levenshtein": lucene_levenshtein,
}
