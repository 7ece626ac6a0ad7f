"""KStem — Bob Krovetz's dictionary-validated English stemmer.

Re-expresses the reference's KStemmer
(analysis/common/src/java/org/apache/lucene/analysis/en/KStemmer.java,
itself derived from the CIIR UMass kstem; Krovetz, "Viewing morphology as
an inference process", SIGIR 1993) as plain Python. Like the Greek/RSLP
rule machines, the transformation order and dictionary-lookup points ARE
the published algorithm, so each ending routine mirrors its Java
counterpart rule for rule; validated against the full reference vocabulary
zip (en/kstemTestData.zip) in tests/test_kstem.py.

The stemmer mutates a small char buffer with two cursors:
  k — index of the word's final letter
  j — index of the letter before the matched suffix (set by _ends_in)
and consults the ~28k-entry lexicon (kstemdata.py) after each candidate
transformation; the first hit wins and its root (or the buffer) is the stem.
"""

from __future__ import annotations

from typing import Optional, Tuple

from .kstemdata import build_dict

_MAX_WORD_LEN = 50

_dict: Optional[dict] = None


def _dict_ht() -> dict:
    global _dict
    if _dict is None:
        _dict = build_dict()
    return _dict


_VOWELS = frozenset("aeiou")


class _KStem:
    """One stemming pass; cheap to construct (state is three scalars)."""

    __slots__ = ("w", "k", "j", "matched", "result", "d")

    def __init__(self) -> None:
        self.d = _dict_ht()

    # --- buffer helpers (OpenStringBuilder analog over a char list) ---

    def _word(self) -> str:
        return "".join(self.w)

    def _set_length(self, n: int) -> None:
        del self.w[n:]

    def _append(self, s: str) -> None:
        self.w.extend(s)

    def _is_cons(self, i: int) -> bool:
        ch = self.w[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _is_vowel(self, i: int) -> bool:
        return not self._is_cons(i)

    def _double_c(self, i: int) -> bool:
        if i < 1:
            return False
        if self.w[i] != self.w[i - 1]:
            return False
        return self._is_cons(i)

    def _vowel_in_stem(self) -> bool:
        # stem = word[0..j]
        return any(self._is_vowel(i) for i in range(self.j + 1))

    def _ends_in(self, s: str) -> bool:
        """KStemmer.endsIn: on match j = index before the suffix. The
        char[]-array overload also pre-sets j = k before comparing
        (KStemmer.java:782-792); keep that quirk for state parity."""
        n = len(s)
        if n > self.k:
            return False
        if n > 4:
            self.j = self.k
        r = len(self.w) - n
        if "".join(self.w[r:]) != s:
            return False
        self.j = r - 1
        return True

    # --- dictionary ---

    def _lookup(self) -> bool:
        self.matched = self.d.get(self._word())
        return self.matched is not None

    def _word_in_dict(self) -> Optional[Tuple[Optional[str], bool]]:
        if self.matched is not None:
            return self.matched
        e = self.d.get(self._word())
        if e is not None and not e[1]:
            self.matched = e  # only cache non-exceptions
        return e

    def _set_suffix(self, s: str) -> None:
        self._set_length(self.j + 1)
        self._append(s)
        self.k = self.j + len(s)

    # --- ending routines (one per KStemmer private method) ---

    def _plural(self) -> None:
        if self.w[self.k] != "s":
            return
        if self._ends_in("ies"):
            self._set_length(self.j + 3)
            self.k -= 1
            if self._lookup():  # ensure calories -> calorie
                return
            self.k += 1
            self._append("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends_in("es"):
            # try just removing the "s"
            self._set_length(self.j + 2)
            self.k -= 1
            # exceptions not checked here: aides -> aide, but the double-s
            # guard prevents crosses -> crosse
            j = self.j
            try_e = j > 0 and not (self.w[j] == "s" and self.w[j - 1] == "s")
            if try_e and self._lookup():
                return
            # try removing the "es"
            self._set_length(j + 1)
            self.k -= 1
            if self._lookup():
                return
            # the default is to retain the "e"
            self._append("e")
            self.k += 1
            if not try_e:
                self._lookup()
            return
        else:
            if len(self.w) > 3 and self.w[self.k - 1] != "s" and not self._ends_in("ous"):
                # unless the word ends in "ous" or double "s", drop final "s"
                self._set_length(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self) -> None:
        # direct mappings handle words <= 4 letters (prevents fled -> fl)
        if len(self.w) <= 4:
            return
        if self._ends_in("ied"):
            self._set_length(self.j + 3)
            self.k -= 1
            if self._lookup():  # almost always -ied -> -y (but died -> die)
                return
            self.k += 1
            self._append("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self._ends_in("ed") and self._vowel_in_stem():
            # see if the root ends in `e'
            self._set_length(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            # try removing the "ed"
            self._set_length(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            # try removing a doubled consonant (backfilled -> backfill)
            if self._double_c(self.k):
                self._set_length(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self._append(self.w[self.k])
                self.k += 1
                self._lookup()
                return
            # a `un-' prefix leaves the word alone
            if self.w[0] == "u" and self.w[1] == "n":
                self._append("ed")
                self.k += 2
                return
            # otherwise prefer an `e' ending (microcoded -> microcode)
            self._set_length(self.j + 1)
            self._append("e")
            self.k = self.j + 1
            return

    def _aspect(self) -> None:
        # direct mappings handle short words (aging -> age; prevents thing -> the)
        if len(self.w) <= 5:
            return
        if self._ends_in("ing") and self._vowel_in_stem():
            # try adding an `e' to the stem
            self.w[self.j + 1] = "e"
            self._set_length(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            # remove the `e' (and the `ing')
            self._set_length(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                self._set_length(self.k + 1)
                if self._lookup():
                    return
                self._append(self.w[self.k])  # restore the doubled consonant
                self.k += 1
                self._lookup()
                return
            # default: add `e' unless the stem ends in two consonants
            if self.j > 0 and self._is_cons(self.j) and self._is_cons(self.j - 1):
                self.k = self.j
                self._set_length(self.k + 1)
                return
            self._set_length(self.j + 1)
            self._append("e")
            self.k = self.j + 1
            return

    def _ity_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ity"):
            j = self.j
            self._set_length(j + 1)  # try just removing -ity
            self.k = j
            if self._lookup():
                return
            self._append("e")  # try removing -ity and adding -e
            self.k = j + 1
            if self._lookup():
                return
            self.w[j + 1] = "i"
            self._append("ty")
            self.k = old_k
            # -ability / -ibility are productive: convert to -ble
            if j > 0 and self.w[j - 1] == "i" and self.w[j] == "l":
                self._set_length(j - 1)
                self._append("le")
                self.k = j
                self._lookup()
                return
            # -ivity -> -ive
            if j > 0 and self.w[j - 1] == "i" and self.w[j] == "v":
                self._set_length(j + 1)
                self._append("e")
                self.k = j + 1
                self._lookup()
                return
            # -ality -> -al
            if j > 0 and self.w[j - 1] == "a" and self.w[j] == "l":
                self._set_length(j + 1)
                self.k = j
                self._lookup()
                return
            # use the variant when the root isn't in the dictionary
            # (immunity -> immune, but not capacity -> capac)
            if self._lookup():
                return
            self._set_length(j + 1)  # default: remove -ity altogether
            self.k = j
            return

    def _ness_endings(self) -> None:
        if self._ends_in("ness"):
            self._set_length(self.j + 1)
            self.k = self.j
            if self.w[self.j] == "i":
                self.w[self.j] = "y"
            self._lookup()

    def _ism_endings(self) -> None:
        if self._ends_in("ism"):
            self._set_length(self.j + 1)
            self.k = self.j
            self._lookup()

    def _ment_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ment"):
            self._set_length(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._append("ment")
            self.k = old_k

    def _ize_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ize"):
            j = self.j
            self._set_length(j + 1)  # try removing -ize entirely
            self.k = j
            if self._lookup():
                return
            self._append("i")
            if self._double_c(j):
                self._set_length(j)
                self.k = j - 1
                if self._lookup():
                    return
                self._append(self.w[j - 1])
            self._set_length(j + 1)
            self._append("e")  # try removing -ize and adding -e
            self.k = j + 1
            if self._lookup():
                return
            self._set_length(j + 1)
            self._append("ize")
            self.k = old_k

    def _ncy_endings(self) -> None:
        if self._ends_in("ncy"):
            if self.w[self.j] not in ("e", "a"):
                return
            self.w[self.j + 2] = "t"  # try converting -ncy to -nt
            self._set_length(self.j + 3)
            self.k = self.j + 2
            if self._lookup():
                return
            self.w[self.j + 2] = "c"  # default: convert to -nce
            self._append("e")
            self.k = self.j + 3
            self._lookup()

    def _nce_endings(self) -> None:
        old_k = self.k
        if self._ends_in("nce"):
            word_char = self.w[self.j]
            if word_char not in ("e", "a"):
                return
            self._set_length(self.j)
            self._append("e")  # -e/ance -> -e (adherance/adhere)
            self.k = self.j
            if self._lookup():
                return
            self._set_length(self.j)  # remove -e/ance (disappearance/disappear)
            self.k = self.j - 1
            if self._lookup():
                return
            self._append(word_char + "nce")  # restore the original ending
            self.k = old_k

    def _ble_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ble"):
            if self.w[self.j] not in ("a", "i"):
                return
            word_char = self.w[self.j]
            self._set_length(self.j)  # try just removing the ending
            self.k = self.j - 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self._set_length(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self.k += 1
                self._append(self.w[self.k - 1])
            self._set_length(self.j)
            self._append("e")  # try removing -a/ible and adding -e
            self.k = self.j
            if self._lookup():
                return
            self._set_length(self.j)
            self._append("ate")  # compensable/compensate
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_length(self.j)
            self._append(word_char + "ble")  # restore
            self.k = old_k

    def _ic_endings(self) -> None:
        if self._ends_in("ic"):
            self._set_length(self.j + 3)
            self._append("al")  # try converting -ic to -ical
            self.k = self.j + 4
            if self._lookup():
                return
            self.w[self.j + 1] = "y"  # try converting -ic to -y
            self._set_length(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self.w[self.j + 1] = "e"  # try converting -ic to -e
            if self._lookup():
                return
            self._set_length(self.j + 1)  # try removing -ic altogether
            self.k = self.j
            if self._lookup():
                return
            self._append("ic")  # restore the original ending
            self.k = self.j + 2

    def _ion_endings(self) -> None:
        old_k = self.k
        if not self._ends_in("ion"):
            return
        if self._ends_in("ization"):
            # -ize is productive: accept it as the root
            self._set_length(self.j + 3)
            self._append("e")
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_in("ition"):
            self._set_length(self.j + 1)
            self._append("e")
            self.k = self.j + 1
            if self._lookup():  # definition -> define
                return
            self._set_length(self.j + 1)
            self._append("ition")
            self.k = old_k
        elif self._ends_in("ation"):
            self._set_length(self.j + 3)
            self._append("e")
            self.k = self.j + 3
            if self._lookup():  # elmination -> eliminate
                return
            self._set_length(self.j + 1)
            self._append("e")  # remove -ation, add -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_length(self.j + 1)  # just remove -ation (resignation->resign)
            self.k = self.j
            if self._lookup():
                return
            self._set_length(self.j + 1)
            self._append("ation")
            self.k = old_k
        # -ication after -ation (complication -> complicate, not comply)
        if self._ends_in("ication"):
            self._set_length(self.j + 1)
            self._append("y")
            self.k = self.j + 1
            if self._lookup():  # amplification -> amplify
                return
            self._set_length(self.j + 1)
            self._append("ication")
            self.k = old_k
        # plain -ion (already known to match; just set j — KStemmer.java:1445)
        self.j = self.k - 3
        self._set_length(self.j + 1)
        self._append("e")
        self.k = self.j + 1
        if self._lookup():  # remove -ion, add -e
            return
        self._set_length(self.j + 1)
        self.k = self.j
        if self._lookup():  # remove -ion
            return
        self._set_length(self.j + 1)
        self._append("ion")
        self.k = old_k

    def _er_and_or_endings(self) -> None:
        old_k = self.k
        if self.w[self.k] != "r":
            return
        if self._ends_in("izer"):
            # -ize is productive: accept it as the root
            self._set_length(self.j + 4)
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_in("er") or self._ends_in("or"):
            word_char = self.w[self.j + 1]
            if self._double_c(self.j):
                self._set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._append(self.w[self.j - 1])  # restore the doubled consonant
            if self.w[self.j] == "i":
                # -ier ending
                self.w[self.j] = "y"
                self._set_length(self.j + 1)
                self.k = self.j
                if self._lookup():
                    return
                self.w[self.j] = "i"  # restore the endings
                self._append("e")
            if self.w[self.j] == "e":
                # -eer
                self._set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._append("e")
            self._set_length(self.j + 2)  # remove the -r ending
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_length(self.j + 1)  # try removing -er/-or
            self.k = self.j
            if self._lookup():
                return
            self._append("e")  # try removing -or and adding -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_length(self.j + 1)
            self._append(word_char + "r")  # restore the word
            self.k = old_k

    def _ly_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ly"):
            self.w[self.j + 2] = "e"  # try converting -ly to -le
            if self._lookup():
                return
            self.w[self.j + 2] = "y"
            self._set_length(self.j + 1)  # try just removing the -ly
            self.k = self.j
            if self._lookup():
                return
            if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "l":
                return  # always convert -ally to -al
            self._append("ly")
            self.k = old_k
            if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "b":
                self.w[self.j + 2] = "e"  # always convert -ably to -able
                self.k = self.j + 2
                return
            if self.w[self.j] == "i":
                # militarily -> military
                self._set_length(self.j)
                self._append("y")
                self.k = self.j
                if self._lookup():
                    return
                self._set_length(self.j)
                self._append("ily")
                self.k = old_k
            self._set_length(self.j + 1)  # the default is to remove -ly
            self.k = self.j

    def _al_endings(self) -> None:
        old_k = self.k
        if len(self.w) < 4:
            return
        if self._ends_in("al"):
            self._set_length(self.j + 1)
            self.k = self.j
            if self._lookup():  # try just removing the -al
                return
            if self._double_c(self.j):
                self._set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._append(self.w[self.j - 1])
            self._set_length(self.j + 1)
            self._append("e")  # try removing the -al and adding -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_length(self.j + 1)
            self._append("um")  # optimal -> optimum
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_length(self.j + 1)
            self._append("al")  # restore the ending
            self.k = old_k
            if self.j > 0 and self.w[self.j - 1] == "i" and self.w[self.j] == "c":
                self._set_length(self.j - 1)  # try removing -ical
                self.k = self.j - 2
                if self._lookup():
                    return
                self._set_length(self.j - 1)
                self._append("y")  # -ical -> -y (bibliographical)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_length(self.j - 1)
                self._append("ic")  # default: convert -ical to -ic
                self.k = self.j
                self._lookup()
                return
            if self.w[self.j] == "i":
                # sometimes -ial endings should be removed
                self._set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._append("ial")
                self.k = old_k
                self._lookup()

    def _ive_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ive"):
            self._set_length(self.j + 1)  # try removing -ive entirely
            self.k = self.j
            if self._lookup():
                return
            self._append("e")  # try removing -ive and adding -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_length(self.j + 1)
            self._append("ive")
            if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "t":
                self.w[self.j - 1] = "e"  # determinative -> determine
                self._set_length(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_length(self.j - 1)  # try just removing -ative
                if self._lookup():
                    return
                self._append("ative")
                self.k = old_k
            # try mapping -ive to -ion (injunctive/injunction)
            self.w[self.j + 2] = "o"
            self.w[self.j + 3] = "n"
            if self._lookup():
                return
            self.w[self.j + 2] = "v"  # restore the original values
            self.w[self.j + 3] = "e"
            self.k = old_k

    # --- driver ---

    def stem(self, term: str) -> str:
        k = len(term) - 1
        if k <= 1 or k >= _MAX_WORD_LEN - 1:
            return term
        entry = self.d.get(term)
        if entry is not None:
            return entry[0] if entry[0] is not None else term
        if any(not ("a" <= ch <= "z") for ch in term):
            return term  # terms must be lowercased alphabetic
        self.w = list(term)
        self.k = k
        self.j = 0
        self.matched = None

        for step in (
            self._plural, self._past_tense, self._aspect, self._ity_endings,
            self._ness_endings, self._ion_endings, self._er_and_or_endings,
            self._ly_endings, self._al_endings,
        ):
            step()
            if self.matched is not None:
                break
        else:
            self._word_in_dict()
            for step in (
                self._ive_endings, self._ize_endings, self._ment_endings,
                self._ble_endings, self._ism_endings, self._ic_endings,
                self._ncy_endings, self._nce_endings,
            ):
                step()
                if self.matched is not None:
                    break

        if self.matched is not None and self.matched[0] is not None:
            return self.matched[0]
        return self._word()


_stemmer: Optional[_KStem] = None


def kstem(term: str) -> str:
    """Stem one lowercased token (KStemFilter per-token semantics)."""
    global _stemmer
    if _stemmer is None:
        _stemmer = _KStem()
    return _stemmer.stem(term)
