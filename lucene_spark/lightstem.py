"""Alternative light/minimal stemmers — selectable variants of chains whose
default stemmer differs (analysis/{ru,sv,fr,de,fi,hu,no,pt,gl}/*Light*,
*Minimal* filters), each validated against the reference's vocabulary zips
or in-code vectors. All operate on lowercased tokens.
"""

from typing import List


def russian_light_stem(w: str) -> str:
    """RussianLightStemmer (analysis/ru/RussianLightStemmer.java) — the
    Krovetz UniNE light stemmer: case-ending removal + и/ь/нн normalize."""
    n = len(w)
    if n > 6 and w[-4:] in ("иями", "оями"):
        w = w[:-4]
    elif n > 5 and w[-3:] in (
        "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
        "ери", "ими", "ого", "ому", "ыми", "оев",
    ):
        w = w[:-3]
    elif n > 4 and w[-2:] in (
        "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою",
        "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им",
        "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми",
    ):
        w = w[:-2]
    elif n > 3 and w[-1] in "аеиоуйыяь":
        w = w[:-1]
    if len(w) > 3:
        if w[-1] in "ьи":
            return w[:-1]
        if w[-1] == "н" and w[-2] == "н":
            return w[:-1]
    return w


def swedish_light_stem(w: str) -> str:
    """SwedishLightStemmer (analysis/sv/SwedishLightStemmer.java)."""
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 7 and w[-5:] in ("elser", "heten"):
        return w[:-5]
    if n > 6 and w[-4:] in ("arne", "erna", "ande", "else", "aste", "orna",
                            "aren"):
        return w[:-4]
    if n > 5 and w[-3:] in ("are", "ast", "het"):
        return w[:-3]
    if n > 4 and w[-2:] in ("ar", "er", "or", "en", "at", "te", "et"):
        return w[:-2]
    if n > 3 and w[-1] in "taen":
        return w[:-1]
    return w


def french_minimal_stem(w: str) -> str:
    """FrenchMinimalStemmer (analysis/fr/FrenchMinimalStemmer.java)."""
    if len(w) < 6:
        return w
    if w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u":
            return w[:-3] + "al"
        return w[:-1]
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":
        w = w[:-1]
    if len(w) > 1 and w[-1] == w[-2] and w[-1].isalpha():
        w = w[:-1]
    return w


_DE_MIN_FOLD = str.maketrans({"ä": "a", "ö": "o", "ü": "u"})


def german_minimal_stem(w: str) -> str:
    """GermanMinimalStemmer (analysis/de/GermanMinimalStemmer.java)."""
    if len(w) < 5:
        return w
    w = w.translate(_DE_MIN_FOLD)
    n = len(w)
    if n > 6 and w.endswith("nen"):
        return w[:-3]
    if n > 5 and w[-2:] in ("en", "se", "es", "er"):
        return w[:-2]
    if w[-1] in "nesr":
        return w[:-1]
    return w


_FI_VOWELS = frozenset("aeiouy")
_FI_FOLD = str.maketrans({"ä": "a", "å": "a", "ö": "o"})


def finnish_light_stem(w: str) -> str:
    """FinnishLightStemmer (analysis/fi/FinnishLightStemmer.java)."""
    if len(w) < 4:
        return w
    w = w.translate(_FI_FOLD)

    def step1(w: str) -> str:
        if len(w) > 8:
            if w.endswith("kin"):
                return step1(w[:-3])
            if w.endswith("ko"):
                return step1(w[:-2])
        if len(w) > 11:
            if w.endswith("dellinen"):
                return w[:-8]
            if w.endswith("dellisuus"):
                return w[:-9]
        return w

    def step2(w: str) -> str:
        if len(w) > 5:
            if w[-3:] in ("lla", "tse", "sti"):
                return w[:-3]
            if w.endswith("ni"):
                return w[:-2]
            if w.endswith("aa"):
                return w[:-1]
        return w

    def step3(w: str) -> str:
        n = len(w)
        if n > 8:
            if w.endswith("nnen"):
                return w[:-4] + "s"
            if w.endswith("ntena"):
                return w[:-5] + "s"
            if w.endswith("tten"):
                return w[:-4]
            if w.endswith("eiden"):
                return w[:-5]
        if n > 6:
            if w[-4:] in ("neen", "niin", "seen", "teen", "inen"):
                return w[:-4]
            if w[-3] == "h" and w[-2] in _FI_VOWELS and w[-1] == "n":
                return w[:-3]
            if w.endswith("den"):
                return w[:-3] + "s"
            if w.endswith("ksen"):
                return w[:-4] + "s"
            if w[-3:] in ("ssa", "sta", "lla", "lta", "tta", "ksi", "lle"):
                return w[:-3]
        if n > 5:
            if w[-2:] in ("na", "ne"):
                return w[:-2]
            if w.endswith("nei"):
                return w[:-3]
        if n > 4:
            if w[-2:] in ("ja", "ta"):
                return w[:-2]
            if w[-1] == "a":
                return w[:-1]
            if w[-1] == "n" and w[-2] in _FI_VOWELS:
                return w[:-2]
            if w[-1] == "n":
                return w[:-1]
        return w

    def norm1(w: str) -> str:
        if len(w) > 5 and w.endswith("hde"):
            w = w[:-3] + "ksi"
        if len(w) > 4 and (w.endswith("ei") or w.endswith("at")):
            return w[:-2]
        if len(w) > 3 and w[-1] in "tsjeai":
            return w[:-1]
        return w

    def norm2(w: str) -> str:
        if len(w) > 8 and w[-1] in "eou":
            w = w[:-1]
        if len(w) > 4:
            if w[-1] == "i":
                w = w[:-1]
            if len(w) > 4:
                # undouble k/p/t
                out = [w[0]]
                ch = w[0]
                for c in w[1:]:
                    if c == ch and ch in "kpt":
                        continue
                    out.append(c)
                    ch = c
                w = "".join(out)
        return w

    return norm2(norm1(step3(step2(step1(w)))))


_HU_VOWELS = frozenset("aeiouy")
_HU_FOLD = str.maketrans({
    "á": "a", "ë": "e", "é": "e", "í": "i", "ó": "o", "ő": "o",
    "õ": "o", "ö": "o", "ú": "u", "ű": "u", "ũ": "u", "û": "u", "ü": "u",
})


def hungarian_light_stem(w: str) -> str:
    """HungarianLightStemmer (analysis/hu/HungarianLightStemmer.java)."""
    w = w.translate(_HU_FOLD)

    def remove_case(w: str) -> str:
        n = len(w)
        if n > 6 and w.endswith("kent"):
            return w[:-4]
        if n > 5:
            if w[-3:] in ("nak", "nek", "val", "vel", "ert", "rol", "ban",
                          "ben", "bol", "nal", "nel", "hoz", "hez", "tol"):
                return w[:-3]
            if w[-2:] in ("al", "el"):
                if w[-3] not in _HU_VOWELS and w[-3] == w[-4]:
                    return w[:-3]
        if n > 4:
            if w[-2:] in ("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                          "be", "ul", "ig"):
                return w[:-2]
            if w[-2:] in ("on", "en") and w[-3] not in _HU_VOWELS:
                return w[:-2]
            if w[-1] in "tn":
                return w[:-1]
            if w[-1] in "ae" and w[-2] == w[-3] and w[-2] not in _HU_VOWELS:
                return w[:-2]
        return w

    def remove_possessive(w: str) -> str:
        n = len(w)
        if n > 6:
            if (w[-5] not in _HU_VOWELS
                    and w[-4:] in ("atok", "otok", "etek")):
                return w[:-4]
            if w[-4:] in ("itek", "itok"):
                return w[:-4]
        if n > 5:
            if (w[-4] not in _HU_VOWELS
                    and w[-3:] in ("unk", "tok", "tek")):
                return w[:-3]
            if w[-4] in _HU_VOWELS and w.endswith("juk"):
                return w[:-3]
            if w.endswith("ink"):
                return w[:-3]
        if n > 4:
            if (w[-3] not in _HU_VOWELS
                    and w[-2:] in ("am", "em", "om", "ad", "ed", "od",
                                   "uk")):
                return w[:-2]
            if (w[-3] in _HU_VOWELS
                    and w[-2:] in ("nk", "ja", "je")):
                return w[:-2]
            if w[-2:] in ("im", "id", "ik"):
                return w[:-2]
        if n > 3:
            if w[-1] in "ae" and w[-2] not in _HU_VOWELS:
                return w[:-1]
            if w[-1] in "md" and w[-2] in _HU_VOWELS:
                return w[:-1]
            if w[-1] == "i":
                return w[:-1]
        return w

    def remove_plural(w: str) -> str:
        if len(w) > 3 and w[-1] == "k":
            if w[-2] in "aoe" and len(w) > 4:
                return w[:-2]
            return w[:-1]
        return w

    def normalize(w: str) -> str:
        if len(w) > 3 and w[-1] in "aeio":
            return w[:-1]
        return w

    return normalize(remove_plural(remove_possessive(remove_case(w))))


def norwegian_light_stem(w: str, bokmaal: bool = True,
                         nynorsk: bool = False) -> str:
    """NorwegianLightStemmer (analysis/no/NorwegianLightStemmer.java);
    the filter's default flags are BOKMAAL only."""
    bm, nn = bokmaal, nynorsk
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 7 and ((w.endswith(("heter", "heten")) and bm)
                  or (w.endswith("heita") and nn)):
        return w[:-5]
    if n > 8 and nn and w.endswith(("heiter", "leiken", "leikar")):
        return w[:-6]
    if n > 5 and (w.endswith("dom") or (w.endswith("het") and bm)):
        return w[:-3]
    if n > 6 and nn and w.endswith(("heit", "semd", "leik")):
        return w[:-4]
    if n > 7 and w.endswith(("elser", "elsen")):
        return w[:-5]
    if n > 6 and ((w.endswith("ende") and bm) or (w.endswith("ande") and nn)
                  or w.endswith("else") or (w.endswith("este") and bm)
                  or (w.endswith("aste") and nn)
                  or (w.endswith("eren") and bm)
                  or (w.endswith("aren") and nn)):
        return w[:-4]
    if n > 5 and ((w.endswith("ere") and bm) or (w.endswith("are") and nn)
                  or (w.endswith("est") and bm) or (w.endswith("ast") and nn)
                  or w.endswith("ene") or (w.endswith("ane") and nn)):
        return w[:-3]
    if n > 4 and (w.endswith(("er", "en", "et", "te"))
                  or (w.endswith("ar") and nn) or (w.endswith("st") and bm)):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


def norwegian_minimal_stem(w: str, bokmaal: bool = True,
                           nynorsk: bool = False) -> str:
    """NorwegianMinimalStemmer (analysis/no/NorwegianMinimalStemmer.java)."""
    nn = nynorsk
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 5 and (w.endswith("ene") or (w.endswith("ane") and nn)):
        return w[:-3]
    if n > 4 and (w.endswith(("er", "en", "et"))
                  or (w.endswith("ar") and nn)):
        return w[:-2]
    if n > 3 and w[-1] in "ae":
        return w[:-1]
    return w


def portuguese_minimal_stem(w: str) -> str:
    """PortugueseMinimalStemmer: only the RSLP Plural step
    (analysis/pt/PortugueseMinimalStemmer.java)."""
    from . import rslp

    if rslp._PT is None:
        from .rslpdata import PT_STEPS

        rslp._PT = rslp._steps_from_data(PT_STEPS)
    return rslp._PT["Plural"].apply(w)


def galician_minimal_stem(w: str) -> str:
    """GalicianMinimalStemmer: only the RSLP Plural step
    (analysis/gl/GalicianMinimalStemmer.java)."""
    from . import rslp

    if rslp._GL is None:
        from .rslpdata import GL_STEPS

        rslp._GL = rslp._steps_from_data(GL_STEPS)
    return rslp._GL["Plural"].apply(w)


def english_minimal_stem(w: str) -> str:
    """EnglishMinimalStemmer (analysis/en/EnglishMinimalStemmer.java) —
    the S-stemmer of Harman: plural-only removal."""
    if len(w) < 3 or w[-1] != "s":
        return w
    p = w[-2]
    if p in "us":
        return w
    if p == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in "ae":
            return w[:-3] + "y"
        if w[-3] in "iaoe":
            return w
        return w[:-1]  # intentional fallthrough in the reference
    return w[:-1]
