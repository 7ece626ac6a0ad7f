"""Brazilian Portuguese stemmer — analysis/br/BrazilianStemmer.java
re-expressed step-for-step. The step1/step2 suffix cascades were
machine-translated from the reference source (including one
result-discarding statement the reference contains, which is semantics);
validated against the reference's analyzer test vectors
(br/TestBrazilianAnalyzer.java + brazilianStemmer data rows).
"""

from typing import Optional

_VOWELS = frozenset("aeiou")


class _BrState:
    __slots__ = ("CT", "R1", "R2", "RV")

    def __init__(self):
        self.CT = self.R1 = self.R2 = self.RV = None


def _sfx(value: Optional[str], suffix: str) -> bool:
    return value is not None and len(suffix) <= len(value) and value.endswith(suffix)


def _rmsfx(value: Optional[str], to_remove: str) -> Optional[str]:
    if value is None or not _sfx(value, to_remove):
        return value
    return value[: -len(to_remove)]


def _rsfx(value: Optional[str], to_replace: str, change_to: str) -> Optional[str]:
    if value is None:
        return value
    v = _rmsfx(value, to_replace)
    return value if v == value else v + change_to


def _sfx_pre(value: Optional[str], suffix: str, preceded: str) -> bool:
    if not _sfx(value, suffix):
        return False
    return _sfx(_rmsfx(value, suffix), preceded)


def _get_r1(value: Optional[str]) -> Optional[str]:
    """getR1: region after the first non-vowel following a vowel."""
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and value[j] not in _VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and value[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    return value[j + 1:]


def _get_rv(value: Optional[str]) -> Optional[str]:
    """getRV (analysis/br/BrazilianStemmer.java:141-196)."""
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in _VOWELS:
        j = 2
        while j < i and value[j] not in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 1 and value[0] in _VOWELS and value[1] in _VOWELS:
        j = 2
        while j < i and value[j] in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 2:
        return value[3:]
    return None


_CHANGE = str.maketrans({
    "á": "a", "â": "a", "ã": "a", "é": "e", "ê": "e", "í": "i",
    "ó": "o", "ô": "o", "õ": "o", "ú": "u", "ü": "u", "ç": "c",
    "ñ": "n",
})


def _change_term(value: Optional[str]) -> Optional[str]:
    if value is None:
        return None
    return value.lower().translate(_CHANGE)


_EDGE_PUNCT = "\"'-,;.?!"


def _create_ct(term: str) -> Optional[str]:
    ct = _change_term(term)
    if len(ct) < 2:
        return ct
    if ct[0] in _EDGE_PUNCT:
        ct = ct[1:]
    if len(ct) < 2:
        return ct
    if ct[-1] in _EDGE_PUNCT:
        ct = ct[:-1]
    return ct


def _step1(b):
    if (b.CT is None):
        return False
    if (_sfx(b.CT, "uciones") and _sfx(b.R2, "uciones")):
        b.CT = _rsfx(b.CT, "uciones", "u")
        return True
    if (len(b.CT) >= 6):
        if (_sfx(b.CT, "imentos") and _sfx(b.R2, "imentos")):
            b.CT = _rmsfx(b.CT, "imentos")
            return True
        if (_sfx(b.CT, "amentos") and _sfx(b.R2, "amentos")):
            b.CT = _rmsfx(b.CT, "amentos")
            return True
        if (_sfx(b.CT, "adores") and _sfx(b.R2, "adores")):
            b.CT = _rmsfx(b.CT, "adores")
            return True
        if (_sfx(b.CT, "adoras") and _sfx(b.R2, "adoras")):
            b.CT = _rmsfx(b.CT, "adoras")
            return True
        if (_sfx(b.CT, "logias") and _sfx(b.R2, "logias")):
            _rsfx(b.CT, "logias", "log")  # result discarded (reference quirk)
            return True
        if (_sfx(b.CT, "encias") and _sfx(b.R2, "encias")):
            b.CT = _rsfx(b.CT, "encias", "ente")
            return True
        if (_sfx(b.CT, "amente") and _sfx(b.R1, "amente")):
            b.CT = _rmsfx(b.CT, "amente")
            return True
        if (_sfx(b.CT, "idades") and _sfx(b.R2, "idades")):
            b.CT = _rmsfx(b.CT, "idades")
            return True
    if (len(b.CT) >= 5):
        if (_sfx(b.CT, "acoes") and _sfx(b.R2, "acoes")):
            b.CT = _rmsfx(b.CT, "acoes")
            return True
        if (_sfx(b.CT, "imento") and _sfx(b.R2, "imento")):
            b.CT = _rmsfx(b.CT, "imento")
            return True
        if (_sfx(b.CT, "amento") and _sfx(b.R2, "amento")):
            b.CT = _rmsfx(b.CT, "amento")
            return True
        if (_sfx(b.CT, "adora") and _sfx(b.R2, "adora")):
            b.CT = _rmsfx(b.CT, "adora")
            return True
        if (_sfx(b.CT, "ismos") and _sfx(b.R2, "ismos")):
            b.CT = _rmsfx(b.CT, "ismos")
            return True
        if (_sfx(b.CT, "istas") and _sfx(b.R2, "istas")):
            b.CT = _rmsfx(b.CT, "istas")
            return True
        if (_sfx(b.CT, "logia") and _sfx(b.R2, "logia")):
            b.CT = _rsfx(b.CT, "logia", "log")
            return True
        if (_sfx(b.CT, "ucion") and _sfx(b.R2, "ucion")):
            b.CT = _rsfx(b.CT, "ucion", "u")
            return True
        if (_sfx(b.CT, "encia") and _sfx(b.R2, "encia")):
            b.CT = _rsfx(b.CT, "encia", "ente")
            return True
        if (_sfx(b.CT, "mente") and _sfx(b.R2, "mente")):
            b.CT = _rmsfx(b.CT, "mente")
            return True
        if (_sfx(b.CT, "idade") and _sfx(b.R2, "idade")):
            b.CT = _rmsfx(b.CT, "idade")
            return True
    if (len(b.CT) >= 4):
        if (_sfx(b.CT, "acao") and _sfx(b.R2, "acao")):
            b.CT = _rmsfx(b.CT, "acao")
            return True
        if (_sfx(b.CT, "ezas") and _sfx(b.R2, "ezas")):
            b.CT = _rmsfx(b.CT, "ezas")
            return True
        if (_sfx(b.CT, "icos") and _sfx(b.R2, "icos")):
            b.CT = _rmsfx(b.CT, "icos")
            return True
        if (_sfx(b.CT, "icas") and _sfx(b.R2, "icas")):
            b.CT = _rmsfx(b.CT, "icas")
            return True
        if (_sfx(b.CT, "ismo") and _sfx(b.R2, "ismo")):
            b.CT = _rmsfx(b.CT, "ismo")
            return True
        if (_sfx(b.CT, "avel") and _sfx(b.R2, "avel")):
            b.CT = _rmsfx(b.CT, "avel")
            return True
        if (_sfx(b.CT, "ivel") and _sfx(b.R2, "ivel")):
            b.CT = _rmsfx(b.CT, "ivel")
            return True
        if (_sfx(b.CT, "ista") and _sfx(b.R2, "ista")):
            b.CT = _rmsfx(b.CT, "ista")
            return True
        if (_sfx(b.CT, "osos") and _sfx(b.R2, "osos")):
            b.CT = _rmsfx(b.CT, "osos")
            return True
        if (_sfx(b.CT, "osas") and _sfx(b.R2, "osas")):
            b.CT = _rmsfx(b.CT, "osas")
            return True
        if (_sfx(b.CT, "ador") and _sfx(b.R2, "ador")):
            b.CT = _rmsfx(b.CT, "ador")
            return True
        if (_sfx(b.CT, "ivas") and _sfx(b.R2, "ivas")):
            b.CT = _rmsfx(b.CT, "ivas")
            return True
        if (_sfx(b.CT, "ivos") and _sfx(b.R2, "ivos")):
            b.CT = _rmsfx(b.CT, "ivos")
            return True
        if (_sfx(b.CT, "iras") and _sfx(b.RV, "iras") and _sfx_pre(b.CT, "iras", "e")):
            b.CT = _rsfx(b.CT, "iras", "ir")
            return True
    if (len(b.CT) >= 3):
        if (_sfx(b.CT, "eza") and _sfx(b.R2, "eza")):
            b.CT = _rmsfx(b.CT, "eza")
            return True
        if (_sfx(b.CT, "ico") and _sfx(b.R2, "ico")):
            b.CT = _rmsfx(b.CT, "ico")
            return True
        if (_sfx(b.CT, "ica") and _sfx(b.R2, "ica")):
            b.CT = _rmsfx(b.CT, "ica")
            return True
        if (_sfx(b.CT, "oso") and _sfx(b.R2, "oso")):
            b.CT = _rmsfx(b.CT, "oso")
            return True
        if (_sfx(b.CT, "osa") and _sfx(b.R2, "osa")):
            b.CT = _rmsfx(b.CT, "osa")
            return True
        if (_sfx(b.CT, "iva") and _sfx(b.R2, "iva")):
            b.CT = _rmsfx(b.CT, "iva")
            return True
        if (_sfx(b.CT, "ivo") and _sfx(b.R2, "ivo")):
            b.CT = _rmsfx(b.CT, "ivo")
            return True
        if (_sfx(b.CT, "ira") and _sfx(b.RV, "ira") and _sfx_pre(b.CT, "ira", "e")):
            b.CT = _rsfx(b.CT, "ira", "ir")
            return True
    return False

def _step2(b):
    if (b.RV is None):
        return False
    if (len(b.RV) >= 7):
        if (_sfx(b.RV, "issemos")):
            b.CT = _rmsfx(b.CT, "issemos")
            return True
        if (_sfx(b.RV, "essemos")):
            b.CT = _rmsfx(b.CT, "essemos")
            return True
        if (_sfx(b.RV, "assemos")):
            b.CT = _rmsfx(b.CT, "assemos")
            return True
        if (_sfx(b.RV, "ariamos")):
            b.CT = _rmsfx(b.CT, "ariamos")
            return True
        if (_sfx(b.RV, "eriamos")):
            b.CT = _rmsfx(b.CT, "eriamos")
            return True
        if (_sfx(b.RV, "iriamos")):
            b.CT = _rmsfx(b.CT, "iriamos")
            return True
    if (len(b.RV) >= 6):
        if (_sfx(b.RV, "iremos")):
            b.CT = _rmsfx(b.CT, "iremos")
            return True
        if (_sfx(b.RV, "eremos")):
            b.CT = _rmsfx(b.CT, "eremos")
            return True
        if (_sfx(b.RV, "aremos")):
            b.CT = _rmsfx(b.CT, "aremos")
            return True
        if (_sfx(b.RV, "avamos")):
            b.CT = _rmsfx(b.CT, "avamos")
            return True
        if (_sfx(b.RV, "iramos")):
            b.CT = _rmsfx(b.CT, "iramos")
            return True
        if (_sfx(b.RV, "eramos")):
            b.CT = _rmsfx(b.CT, "eramos")
            return True
        if (_sfx(b.RV, "aramos")):
            b.CT = _rmsfx(b.CT, "aramos")
            return True
        if (_sfx(b.RV, "asseis")):
            b.CT = _rmsfx(b.CT, "asseis")
            return True
        if (_sfx(b.RV, "esseis")):
            b.CT = _rmsfx(b.CT, "esseis")
            return True
        if (_sfx(b.RV, "isseis")):
            b.CT = _rmsfx(b.CT, "isseis")
            return True
        if (_sfx(b.RV, "arieis")):
            b.CT = _rmsfx(b.CT, "arieis")
            return True
        if (_sfx(b.RV, "erieis")):
            b.CT = _rmsfx(b.CT, "erieis")
            return True
        if (_sfx(b.RV, "irieis")):
            b.CT = _rmsfx(b.CT, "irieis")
            return True
    if (len(b.RV) >= 5):
        if (_sfx(b.RV, "irmos")):
            b.CT = _rmsfx(b.CT, "irmos")
            return True
        if (_sfx(b.RV, "iamos")):
            b.CT = _rmsfx(b.CT, "iamos")
            return True
        if (_sfx(b.RV, "armos")):
            b.CT = _rmsfx(b.CT, "armos")
            return True
        if (_sfx(b.RV, "ermos")):
            b.CT = _rmsfx(b.CT, "ermos")
            return True
        if (_sfx(b.RV, "areis")):
            b.CT = _rmsfx(b.CT, "areis")
            return True
        if (_sfx(b.RV, "ereis")):
            b.CT = _rmsfx(b.CT, "ereis")
            return True
        if (_sfx(b.RV, "ireis")):
            b.CT = _rmsfx(b.CT, "ireis")
            return True
        if (_sfx(b.RV, "asses")):
            b.CT = _rmsfx(b.CT, "asses")
            return True
        if (_sfx(b.RV, "esses")):
            b.CT = _rmsfx(b.CT, "esses")
            return True
        if (_sfx(b.RV, "isses")):
            b.CT = _rmsfx(b.CT, "isses")
            return True
        if (_sfx(b.RV, "astes")):
            b.CT = _rmsfx(b.CT, "astes")
            return True
        if (_sfx(b.RV, "assem")):
            b.CT = _rmsfx(b.CT, "assem")
            return True
        if (_sfx(b.RV, "essem")):
            b.CT = _rmsfx(b.CT, "essem")
            return True
        if (_sfx(b.RV, "issem")):
            b.CT = _rmsfx(b.CT, "issem")
            return True
        if (_sfx(b.RV, "ardes")):
            b.CT = _rmsfx(b.CT, "ardes")
            return True
        if (_sfx(b.RV, "erdes")):
            b.CT = _rmsfx(b.CT, "erdes")
            return True
        if (_sfx(b.RV, "irdes")):
            b.CT = _rmsfx(b.CT, "irdes")
            return True
        if (_sfx(b.RV, "ariam")):
            b.CT = _rmsfx(b.CT, "ariam")
            return True
        if (_sfx(b.RV, "eriam")):
            b.CT = _rmsfx(b.CT, "eriam")
            return True
        if (_sfx(b.RV, "iriam")):
            b.CT = _rmsfx(b.CT, "iriam")
            return True
        if (_sfx(b.RV, "arias")):
            b.CT = _rmsfx(b.CT, "arias")
            return True
        if (_sfx(b.RV, "erias")):
            b.CT = _rmsfx(b.CT, "erias")
            return True
        if (_sfx(b.RV, "irias")):
            b.CT = _rmsfx(b.CT, "irias")
            return True
        if (_sfx(b.RV, "estes")):
            b.CT = _rmsfx(b.CT, "estes")
            return True
        if (_sfx(b.RV, "istes")):
            b.CT = _rmsfx(b.CT, "istes")
            return True
        if (_sfx(b.RV, "areis")):
            b.CT = _rmsfx(b.CT, "areis")
            return True
        if (_sfx(b.RV, "aveis")):
            b.CT = _rmsfx(b.CT, "aveis")
            return True
    if (len(b.RV) >= 4):
        if (_sfx(b.RV, "aria")):
            b.CT = _rmsfx(b.CT, "aria")
            return True
        if (_sfx(b.RV, "eria")):
            b.CT = _rmsfx(b.CT, "eria")
            return True
        if (_sfx(b.RV, "iria")):
            b.CT = _rmsfx(b.CT, "iria")
            return True
        if (_sfx(b.RV, "asse")):
            b.CT = _rmsfx(b.CT, "asse")
            return True
        if (_sfx(b.RV, "esse")):
            b.CT = _rmsfx(b.CT, "esse")
            return True
        if (_sfx(b.RV, "isse")):
            b.CT = _rmsfx(b.CT, "isse")
            return True
        if (_sfx(b.RV, "aste")):
            b.CT = _rmsfx(b.CT, "aste")
            return True
        if (_sfx(b.RV, "este")):
            b.CT = _rmsfx(b.CT, "este")
            return True
        if (_sfx(b.RV, "iste")):
            b.CT = _rmsfx(b.CT, "iste")
            return True
        if (_sfx(b.RV, "arei")):
            b.CT = _rmsfx(b.CT, "arei")
            return True
        if (_sfx(b.RV, "erei")):
            b.CT = _rmsfx(b.CT, "erei")
            return True
        if (_sfx(b.RV, "irei")):
            b.CT = _rmsfx(b.CT, "irei")
            return True
        if (_sfx(b.RV, "aram")):
            b.CT = _rmsfx(b.CT, "aram")
            return True
        if (_sfx(b.RV, "eram")):
            b.CT = _rmsfx(b.CT, "eram")
            return True
        if (_sfx(b.RV, "iram")):
            b.CT = _rmsfx(b.CT, "iram")
            return True
        if (_sfx(b.RV, "avam")):
            b.CT = _rmsfx(b.CT, "avam")
            return True
        if (_sfx(b.RV, "arem")):
            b.CT = _rmsfx(b.CT, "arem")
            return True
        if (_sfx(b.RV, "erem")):
            b.CT = _rmsfx(b.CT, "erem")
            return True
        if (_sfx(b.RV, "irem")):
            b.CT = _rmsfx(b.CT, "irem")
            return True
        if (_sfx(b.RV, "ando")):
            b.CT = _rmsfx(b.CT, "ando")
            return True
        if (_sfx(b.RV, "endo")):
            b.CT = _rmsfx(b.CT, "endo")
            return True
        if (_sfx(b.RV, "indo")):
            b.CT = _rmsfx(b.CT, "indo")
            return True
        if (_sfx(b.RV, "arao")):
            b.CT = _rmsfx(b.CT, "arao")
            return True
        if (_sfx(b.RV, "erao")):
            b.CT = _rmsfx(b.CT, "erao")
            return True
        if (_sfx(b.RV, "irao")):
            b.CT = _rmsfx(b.CT, "irao")
            return True
        if (_sfx(b.RV, "adas")):
            b.CT = _rmsfx(b.CT, "adas")
            return True
        if (_sfx(b.RV, "idas")):
            b.CT = _rmsfx(b.CT, "idas")
            return True
        if (_sfx(b.RV, "aras")):
            b.CT = _rmsfx(b.CT, "aras")
            return True
        if (_sfx(b.RV, "eras")):
            b.CT = _rmsfx(b.CT, "eras")
            return True
        if (_sfx(b.RV, "iras")):
            b.CT = _rmsfx(b.CT, "iras")
            return True
        if (_sfx(b.RV, "avas")):
            b.CT = _rmsfx(b.CT, "avas")
            return True
        if (_sfx(b.RV, "ares")):
            b.CT = _rmsfx(b.CT, "ares")
            return True
        if (_sfx(b.RV, "eres")):
            b.CT = _rmsfx(b.CT, "eres")
            return True
        if (_sfx(b.RV, "ires")):
            b.CT = _rmsfx(b.CT, "ires")
            return True
        if (_sfx(b.RV, "ados")):
            b.CT = _rmsfx(b.CT, "ados")
            return True
        if (_sfx(b.RV, "idos")):
            b.CT = _rmsfx(b.CT, "idos")
            return True
        if (_sfx(b.RV, "amos")):
            b.CT = _rmsfx(b.CT, "amos")
            return True
        if (_sfx(b.RV, "emos")):
            b.CT = _rmsfx(b.CT, "emos")
            return True
        if (_sfx(b.RV, "imos")):
            b.CT = _rmsfx(b.CT, "imos")
            return True
        if (_sfx(b.RV, "iras")):
            b.CT = _rmsfx(b.CT, "iras")
            return True
        if (_sfx(b.RV, "ieis")):
            b.CT = _rmsfx(b.CT, "ieis")
            return True
    if (len(b.RV) >= 3):
        if (_sfx(b.RV, "ada")):
            b.CT = _rmsfx(b.CT, "ada")
            return True
        if (_sfx(b.RV, "ida")):
            b.CT = _rmsfx(b.CT, "ida")
            return True
        if (_sfx(b.RV, "ara")):
            b.CT = _rmsfx(b.CT, "ara")
            return True
        if (_sfx(b.RV, "era")):
            b.CT = _rmsfx(b.CT, "era")
            return True
        if (_sfx(b.RV, "ira")):
            b.CT = _rmsfx(b.CT, "ava")
            return True
        if (_sfx(b.RV, "iam")):
            b.CT = _rmsfx(b.CT, "iam")
            return True
        if (_sfx(b.RV, "ado")):
            b.CT = _rmsfx(b.CT, "ado")
            return True
        if (_sfx(b.RV, "ido")):
            b.CT = _rmsfx(b.CT, "ido")
            return True
        if (_sfx(b.RV, "ias")):
            b.CT = _rmsfx(b.CT, "ias")
            return True
        if (_sfx(b.RV, "ais")):
            b.CT = _rmsfx(b.CT, "ais")
            return True
        if (_sfx(b.RV, "eis")):
            b.CT = _rmsfx(b.CT, "eis")
            return True
        if (_sfx(b.RV, "ira")):
            b.CT = _rmsfx(b.CT, "ira")
            return True
        if (_sfx(b.RV, "ear")):
            b.CT = _rmsfx(b.CT, "ear")
            return True
    if (len(b.RV) >= 2):
        if (_sfx(b.RV, "ia")):
            b.CT = _rmsfx(b.CT, "ia")
            return True
        if (_sfx(b.RV, "ei")):
            b.CT = _rmsfx(b.CT, "ei")
            return True
        if (_sfx(b.RV, "am")):
            b.CT = _rmsfx(b.CT, "am")
            return True
        if (_sfx(b.RV, "em")):
            b.CT = _rmsfx(b.CT, "em")
            return True
        if (_sfx(b.RV, "ar")):
            b.CT = _rmsfx(b.CT, "ar")
            return True
        if (_sfx(b.RV, "er")):
            b.CT = _rmsfx(b.CT, "er")
            return True
        if (_sfx(b.RV, "ir")):
            b.CT = _rmsfx(b.CT, "ir")
            return True
        if (_sfx(b.RV, "as")):
            b.CT = _rmsfx(b.CT, "as")
            return True
        if (_sfx(b.RV, "es")):
            b.CT = _rmsfx(b.CT, "es")
            return True
        if (_sfx(b.RV, "is")):
            b.CT = _rmsfx(b.CT, "is")
            return True
        if (_sfx(b.RV, "eu")):
            b.CT = _rmsfx(b.CT, "eu")
            return True
        if (_sfx(b.RV, "iu")):
            b.CT = _rmsfx(b.CT, "iu")
            return True
        if (_sfx(b.RV, "iu")):
            b.CT = _rmsfx(b.CT, "iu")
            return True
        if (_sfx(b.RV, "ou")):
            b.CT = _rmsfx(b.CT, "ou")
            return True
    return False



def _step3(b):
    if b.RV is None:
        return
    if _sfx(b.RV, "i") and _sfx_pre(b.RV, "i", "c"):
        b.CT = _rmsfx(b.CT, "i")


def _step4(b):
    if b.RV is None:
        return
    for suf in ("os", "a", "i", "o"):
        if _sfx(b.RV, suf):
            b.CT = _rmsfx(b.CT, suf)
            return


def _step5(b):
    if b.RV is None:
        return
    if _sfx(b.RV, "e"):
        if _sfx_pre(b.RV, "e", "gu"):
            b.CT = _rmsfx(b.CT, "e")
            b.CT = _rmsfx(b.CT, "u")
            return
        if _sfx_pre(b.RV, "e", "ci"):
            b.CT = _rmsfx(b.CT, "e")
            b.CT = _rmsfx(b.CT, "i")
            return
        b.CT = _rmsfx(b.CT, "e")
        return


def brazilian_stem(term: str) -> Optional[str]:
    """BrazilianStemmer.stem (analysis/br/BrazilianStemmer.java:43-76):
    returns None for unindexable terms (the filter then keeps the original
    token unchanged, BrazilianStemFilter.java:58-63)."""
    b = _BrState()
    b.CT = _create_ct(term)
    if not (2 < len(b.CT) < 30):
        return None
    if not b.CT.isalpha():
        return b.CT
    b.R1 = _get_r1(b.CT)
    b.R2 = _get_r1(b.R1)
    b.RV = _get_rv(b.CT)
    altered = _step1(b)
    if not altered:
        altered = _step2(b)
    if altered:
        _step3(b)
    else:
        _step4(b)
    _step5(b)
    return b.CT
