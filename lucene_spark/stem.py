"""Porter stemming (Porter 1980, "An algorithm for suffix stripping") —
the rule set of the reference's analysis/en/PorterStemmer.java including
its two documented bug guards (steps 3/5 skipped when the word has shrunk
to one character; the 'ion' rule requires a non-empty stem ending s/t),
re-expressed functionally over strings instead of the char-buffer port.

Words of length <= 2 pass through unchanged (PorterStemmer.stem(i0) only
runs the steps when k > k0 + 1).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(w, i - 1)
    return True


def _m(stem: str) -> int:
    """Number of vowel->consonant sequence transitions in the stem."""
    n, i, length = 0, 0, len(stem)
    while True:
        if i >= length:
            return n
        if not _cons(stem, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i >= length:
                return n
            if _cons(stem, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i >= length:
                return n
            if not _cons(stem, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _doublec(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    i = len(w) - 1
    if i < 2 or not _cons(w, i) or _cons(w, i - 1) or not _cons(w, i - 2):
        return False
    return w[i] not in "wxy"


# (suffix, replacement) in the reference's per-case order; the penultimate
# (step 3/5) or final (step 4) character of each suffix is unique per group,
# so flat first-match iteration is equivalent to the switch dispatch
_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]
_STEP4 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP5 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # step 1: plurals, -ed, -ing
    if w.endswith("s"):
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-3] + "i"
        elif len(w) >= 2 and w[-2] != "s":
            w = w[:-1]
    if w.endswith("eed"):
        if _m(w[:-3]) > 0:
            w = w[:-1]
    else:
        ed = w.endswith("ed") and _vowel_in_stem(w[:-2])
        ing = (not ed) and w.endswith("ing") and _vowel_in_stem(w[:-3])
        if ed or ing:
            w = w[:-2] if ed else w[:-3]
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _doublec(w):
                if w[-1] not in "lsz":
                    w = w[:-1]
            elif _m(w) == 1 and _cvc(w):
                w += "e"

    # step 2: terminal y -> i when the stem has a vowel
    if w.endswith("y") and _vowel_in_stem(w[:-1]):
        w = w[:-1] + "i"

    # step 3: double suffixes to single (m(stem) > 0)
    if len(w) >= 2:  # 'Bug 1' guard (k == k0)
        for suf, rep in _STEP3:
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _m(stem) > 0:
                    w = stem + rep
                break

    # step 4: -ic-, -ful, -ness (m(stem) > 0)
    for suf, rep in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _m(stem) > 0:
                w = stem + rep
            break

    # step 5: strip residual suffix in context m(stem) > 1
    if len(w) >= 2:  # 'Bug 1' guard
        for suf in _STEP5:
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if suf == "ion" and not (stem and stem[-1] in "st"):
                    break  # 'Bug 2' guard: matched but ion context failed
                if _m(stem) > 1:
                    w = stem
                break

    # step 6: final -e / -ll; both measures run over the word as it stood
    # at step-6 entry (the reference pins j before any k decrement)
    w0 = w
    if w.endswith("e"):
        a = _m(w0)
        if a > 1 or (a == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    if w.endswith("l") and _doublec(w) and _m(w0) > 1:
        w = w[:-1]
    return w


def strip_possessive(word: str) -> str:
    """EnglishPossessiveFilter analog: drop a trailing 's."""
    return word[:-2] if word.endswith("'s") else word
