"""Language analysis chains — the reference's French / German / Spanish
default analyzers re-expressed as per-token pure functions over a
Latin-1-aware StandardTokenizer pattern.

Chains (each mirrors the reference analyzer's createComponents order):

- French  (analysis/fr/FrenchAnalyzer.java:129-136): ElisionFilter
  (DEFAULT_ARTICLES, case-insensitive prefix strip at the first apostrophe)
  -> LowerCaseFilter -> StopFilter (snowball french_stop.txt) ->
  FrenchLightStemFilter (the UniNE light stemmer,
  analysis/fr/FrenchLightStemmer.java — Savoy, "Light Stemming Approaches
  for the French, Portuguese, German and Hungarian Languages").
- German  (analysis/de/GermanAnalyzer.java:121-128): LowerCaseFilter ->
  StopFilter (german_stop.txt) -> GermanNormalizationFilter (the 3-state
  umlaut/e-deletion FSM, analysis/de/GermanNormalizationFilter.java) ->
  GermanLightStemFilter (analysis/de/GermanLightStemmer.java).
- Spanish (analysis/es/SpanishAnalyzer.java:113-119): LowerCaseFilter ->
  StopFilter (spanish_stop.txt) -> SpanishLightStemFilter
  (analysis/es/SpanishLightStemmer.java — Savoy, CLEF-2001).

Stopped tokens are emitted as :data:`STOP_HOLE` (a NUL byte no tokenizer
output can produce) and removed by the invert stage's stopword filter,
which preserves the reference's position-increment holes AND its
stop-before-stem order: a stem that happens to equal a stopword's surface
form is never re-stopped (the reference's StopFilter runs before the
stemmer and never sees stems). Stopword lists are the reference's
snowball resource data (analysis/snowball/{french,german,spanish}_stop
.txt), embedded verbatim as data for parity.

All chains are engine-portable: LANG_TOKEN_RE runs under Python ``re``,
Java regex and RE2 (DuckDB), like analysis.TOKEN_RE.
"""

from __future__ import annotations

import re
from typing import List

#: stopped-token marker: survives to the invert stage, where it is the one
#: entry of the implied stopset for language chains (build._invert_core)
STOP_HOLE = "\x00"

# Latin-1 letter ranges (excludes the x/division signs at 0xD7/0xF7);
# apostrophe U+0027 and U+2019 are MidLetter like the UAX#29 grammar.
_L = "A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u00FF"
_NUM_RUN = r"[0-9](?:(?:_*|[.,;'])[0-9])*"
_ALPHA_RUN = (
    "[" + _L + "](?:(?:_*|[:.'\u2019])[" + _L + "])*"
)
LANG_TOKEN_RE = r"(?:_*(?:" + _NUM_RUN + r"|" + _ALPHA_RUN + r"))+_*"
_LANG_TOKEN_PATTERN = re.compile(LANG_TOKEN_RE)

#: FrenchAnalyzer.DEFAULT_ARTICLES (analysis/fr/FrenchAnalyzer.java:57-63)
FRENCH_ARTICLES = frozenset(
    ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu")
)

#: snowball french_stop.txt (reference resource data, embedded for parity)
FRENCH_STOP = frozenset((
    "ai", "aie", "aient", "aies", "ait", "au", "aurai", "auraient", "aurais",
    "aurait", "aurez", "auriez", "aurions", "aurons", "auront", "aux",
    "avaient", "avais", "avait", "avec", "avez", "aviez", "avons", "ayant",
    "ayez", "ayons", "c", "ce", "ceci", "cela", "celà", "ces", "cet",
    "cette", "d", "dans", "de", "des", "du", "elle", "en", "es", "et", "eu",
    "eue", "eues", "eurent", "eus", "eusse", "eussent", "eusses", "eussiez",
    "eussions", "eut", "eux", "eûmes", "eût", "eûtes", "furent", "fus",
    "fusse", "fussent", "fusses", "fussiez", "fussions", "fut", "fûmes",
    "fûtes", "ici", "il", "ils", "j", "je", "l", "la", "le", "les", "leur",
    "leurs", "lui", "m", "ma", "mais", "me", "mes", "moi", "mon", "même",
    "n", "ne", "nos", "notre", "nous", "on", "ont", "ou", "par", "pas",
    "pour", "qu", "que", "quel", "quelle", "quelles", "quels", "qui", "s",
    "sa", "sans", "se", "sera", "serai", "seraient", "serais", "serait",
    "seras", "serez", "seriez", "serions", "serons", "seront", "ses", "soi",
    "soient", "sois", "soit", "sont", "soyez", "soyons", "suis", "sur", "t",
    "ta", "te", "tes", "toi", "ton", "tu", "un", "une", "vos", "votre",
    "vous", "y", "à", "étaient", "étais", "était", "étant", "étiez",
    "étions", "étée", "étées", "êtes",
))

#: snowball german_stop.txt
GERMAN_STOP = frozenset((
    "aber", "alle", "allem", "allen", "aller", "alles", "als", "also", "am",
    "an", "ander", "andere", "anderem", "anderen", "anderer", "anderes",
    "anderm", "andern", "anderr", "anders", "auch", "auf", "aus", "bei",
    "bin", "bis", "bist", "da", "damit", "dann", "das", "dasselbe", "dazu",
    "daß", "dein", "deine", "deinem", "deinen", "deiner", "deines", "dem",
    "demselben", "den", "denn", "denselben", "der", "derer", "derselbe",
    "derselben", "des", "desselben", "dessen", "dich", "die", "dies",
    "diese", "dieselbe", "dieselben", "diesem", "diesen", "dieser", "dieses",
    "dir", "doch", "dort", "du", "durch", "ein", "eine", "einem", "einen",
    "einer", "eines", "einig", "einige", "einigem", "einigen", "einiger",
    "einiges", "einmal", "er", "es", "etwas", "euch", "euer", "eure",
    "eurem", "euren", "eurer", "eures", "für", "gegen", "gewesen", "hab",
    "habe", "haben", "hat", "hatte", "hatten", "hier", "hin", "hinter",
    "ich", "ihm", "ihn", "ihnen", "ihr", "ihre", "ihrem", "ihren", "ihrer",
    "ihres", "im", "in", "indem", "ins", "ist", "jede", "jedem", "jeden",
    "jeder", "jedes", "jene", "jenem", "jenen", "jener", "jenes", "jetzt",
    "kann", "kein", "keine", "keinem", "keinen", "keiner", "keines",
    "können", "könnte", "machen", "man", "manche", "manchem", "manchen",
    "mancher", "manches", "mein", "meine", "meinem", "meinen", "meiner",
    "meines", "mich", "mir", "mit", "muss", "musste", "nach", "nicht",
    "nichts", "noch", "nun", "nur", "ob", "oder", "ohne", "sehr", "sein",
    "seine", "seinem", "seinen", "seiner", "seines", "selbst", "sich", "sie",
    "sind", "so", "solche", "solchem", "solchen", "solcher", "solches",
    "soll", "sollte", "sondern", "sonst", "um", "und", "uns", "unse",
    "unsem", "unsen", "unser", "unses", "unter", "viel", "vom", "von", "vor",
    "war", "waren", "warst", "was", "weg", "weil", "weiter", "welche",
    "welchem", "welchen", "welcher", "welches", "wenn", "werde", "werden",
    "wie", "wieder", "will", "wir", "wird", "wirst", "wo", "wollen",
    "wollte", "während", "würde", "würden", "zu", "zum", "zur", "zwar",
    "zwischen", "über",
))

#: snowball spanish_stop.txt
SPANISH_STOP = frozenset((
    "a", "al", "algo", "algunas", "algunos", "ante", "antes", "como", "con",
    "contra", "cual", "cuando", "de", "del", "desde", "donde", "durante",
    "e", "el", "ella", "ellas", "ellos", "en", "entre", "era", "erais",
    "eran", "eras", "eres", "es", "esa", "esas", "ese", "eso", "esos",
    "esta", "estaba", "estabais", "estaban", "estabas", "estad", "estada",
    "estadas", "estado", "estados", "estamos", "estando", "estar",
    "estaremos", "estará", "estarán", "estarás", "estaré", "estaréis",
    "estaría", "estaríais", "estaríamos", "estarían", "estarías", "estas",
    "este", "estemos", "esto", "estos", "estoy", "estuve", "estuviera",
    "estuvierais", "estuvieran", "estuvieras", "estuvieron", "estuviese",
    "estuvieseis", "estuviesen", "estuvieses", "estuvimos", "estuviste",
    "estuvisteis", "estuviéramos", "estuviésemos", "estuvo", "está",
    "estábamos", "estáis", "están", "estás", "esté", "estéis", "estén",
    "estés", "fue", "fuera", "fuerais", "fueran", "fueras", "fueron",
    "fuese", "fueseis", "fuesen", "fueses", "fui", "fuimos", "fuiste",
    "fuisteis", "fuéramos", "fuésemos", "ha", "habida", "habidas", "habido",
    "habidos", "habiendo", "habremos", "habrá", "habrán", "habrás", "habré",
    "habréis", "habría", "habríais", "habríamos", "habrían", "habrías",
    "habéis", "había", "habíais", "habíamos", "habían", "habías", "han",
    "has", "hasta", "hay", "haya", "hayamos", "hayan", "hayas", "hayáis",
    "he", "hemos", "hube", "hubiera", "hubierais", "hubieran", "hubieras",
    "hubieron", "hubiese", "hubieseis", "hubiesen", "hubieses", "hubimos",
    "hubiste", "hubisteis", "hubiéramos", "hubiésemos", "hubo", "la", "las",
    "le", "les", "lo", "los", "me", "mi", "mis", "mucho", "muchos", "muy",
    "más", "mí", "mía", "mías", "mío", "míos", "nada", "ni", "no", "nos",
    "nosotras", "nosotros", "nuestra", "nuestras", "nuestro", "nuestros",
    "o", "os", "otra", "otras", "otro", "otros", "para", "pero", "poco",
    "por", "porque", "que", "quien", "quienes", "qué", "se", "sea", "seamos",
    "sean", "seas", "seremos", "será", "serán", "serás", "seré", "seréis",
    "sería", "seríais", "seríamos", "serían", "serías", "seáis", "sido",
    "siendo", "sin", "sobre", "sois", "somos", "son", "soy", "su", "sus",
    "suya", "suyas", "suyo", "suyos", "sí", "también", "tanto", "te",
    "tendremos", "tendrá", "tendrán", "tendrás", "tendré", "tendréis",
    "tendría", "tendríais", "tendríamos", "tendrían", "tendrías", "tened",
    "tenemos", "tenga", "tengamos", "tengan", "tengas", "tengo", "tengáis",
    "tenida", "tenidas", "tenido", "tenidos", "teniendo", "tenéis", "tenía",
    "teníais", "teníamos", "tenían", "tenías", "ti", "tiene", "tienen",
    "tienes", "todo", "todos", "tu", "tus", "tuve", "tuviera", "tuvierais",
    "tuvieran", "tuvieras", "tuvieron", "tuviese", "tuvieseis", "tuviesen",
    "tuvieses", "tuvimos", "tuviste", "tuvisteis", "tuviéramos",
    "tuviésemos", "tuvo", "tuya", "tuyas", "tuyo", "tuyos", "tú", "un",
    "una", "uno", "unos", "vosotras", "vosotros", "vuestra", "vuestras",
    "vuestro", "vuestros", "y", "ya", "yo", "él", "éramos",
))

# ---------------------------------------------------------------------------
# Token-level filters
# ---------------------------------------------------------------------------


def elide(token: str) -> str:
    """ElisionFilter (analysis/util/ElisionFilter.java:49-66): strip the
    prefix before the FIRST apostrophe (U+0027 or U+2019) when it is a
    French article — case-insensitively, like the analyzer's
    CharArraySet(..., true)."""
    for i, ch in enumerate(token):
        if ch == "'" or ch == "’":
            if token[:i].lower() in FRENCH_ARTICLES:
                return token[i + 1:]
            return token
    return token


def german_normalize(token: str) -> str:
    """GermanNormalizationFilter's 3-state FSM
    (analysis/de/GermanNormalizationFilter.java:40-103): ss for eszett,
    umlauts fold to their base vowel, and an 'e' is deleted when the
    previous character put the FSM in the umlaut state (an a/o, or a 'u'
    not preceded by a vowel/q/y)."""
    out: List[str] = []
    state = 0  # 0=N ordinary, 1=V vowel-guard, 2=U umlaut (e-deletion)
    for c in token:
        if c in "ao":
            out.append(c)
            state = 2
        elif c == "u":
            out.append(c)
            state = 2 if state == 0 else 1
        elif c == "e":
            if state == 2:
                state = 1
                continue  # the deleted 'e'
            out.append(c)
            state = 1
        elif c in "iqy":
            out.append(c)
            state = 1
        elif c == "ä":
            out.append("a")
            state = 1
        elif c == "ö":
            out.append("o")
            state = 1
        elif c == "ü":
            out.append("u")
            state = 1
        elif c == "ß":
            out.append("ss")
            state = 0
        else:
            out.append(c)
            state = 0
    return "".join(out)


# ---------------------------------------------------------------------------
# Light stemmers (UniNE / Savoy) — faithful per-rule transcriptions
# ---------------------------------------------------------------------------

_FR_FOLD = str.maketrans(
    "àáâôèéêùûîç",
    "aaaoeeeuuic",
)


def _fr_norm(w: str) -> str:
    """FrenchLightStemmer.norm (analysis/fr/FrenchLightStemmer.java:
    211-249): accent fold, collapse adjacent repeated letters, drop a
    trailing -ie, then the r/e/e/double-letter tail."""
    if len(w) > 4:
        w = w.translate(_FR_FOLD)
        out = [w[0]]
        for ch in w[1:]:
            if ch == out[-1] and ch.isalpha():
                continue
            out.append(ch)
        w = "".join(out)
    if len(w) > 4 and w.endswith("ie"):
        w = w[:-2]
    if len(w) > 4:
        if w[-1] == "r":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if len(w) > 1 and w[-1] == w[-2] and w[-1].isalpha():
            w = w[:-1]
    return w


def french_light_stem(w: str) -> str:
    """FrenchLightStemmer.stem (analysis/fr/FrenchLightStemmer.java:66-208)
    — the UniNE rule cascade, rule for rule; tested against the
    reference's frlight.txt vocabulary."""
    if len(w) > 5 and w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u" and w[-4] != "e":
            w = w[:-2] + "lx"
        w = w[:-1]
    if len(w) > 3 and w[-1] == "x":
        w = w[:-1]
    if len(w) > 3 and w[-1] == "s":
        w = w[:-1]
    if len(w) > 9 and w.endswith("issement"):
        return _fr_norm(w[:-7] + "r")
    if len(w) > 8 and w.endswith("issant"):
        return _fr_norm(w[:-5] + "r")
    if len(w) > 6 and w.endswith("ement"):
        w = w[:-4]
        if len(w) > 3 and w.endswith("ive"):
            w = w[:-2] + "f"
        return _fr_norm(w)
    if len(w) > 11 and w.endswith("ficatrice"):
        return _fr_norm(w[:-5][:-2] + "er")
    if len(w) > 10 and w.endswith("ficateur"):
        return _fr_norm(w[:-4][:-2] + "er")
    if len(w) > 9 and w.endswith("catrice"):
        return _fr_norm(w[:-3][:-4] + "quer")
    if len(w) > 8 and w.endswith("cateur"):
        return _fr_norm(w[:-2][:-4] + "quer")
    if len(w) > 8 and w.endswith("atrice"):
        return _fr_norm(w[:-4][:-2] + "er")
    if len(w) > 7 and w.endswith("ateur"):
        return _fr_norm(w[:-3][:-2] + "er")
    if len(w) > 6 and w.endswith("trice"):
        w = w[:-4] + "eur"
    if len(w) > 5 and w.endswith("ième"):
        return _fr_norm(w[:-4])
    if len(w) > 7 and w.endswith("teuse"):
        return _fr_norm(w[:-3] + "r")
    if len(w) > 6 and w.endswith("teur"):
        return _fr_norm(w[:-2] + "r")
    if len(w) > 5 and w.endswith("euse"):
        return _fr_norm(w[:-2])
    if len(w) > 8 and w.endswith("ère"):
        return _fr_norm(w[:-3] + "er")
    if len(w) > 7 and w.endswith("ive"):
        return _fr_norm(w[:-2] + "f")
    if len(w) > 4 and (w.endswith("folle") or w.endswith("molle")):
        return _fr_norm(w[:-3] + "u")
    if len(w) > 9 and w.endswith("nnelle"):
        return _fr_norm(w[:-5])
    if len(w) > 9 and w.endswith("nnel"):
        return _fr_norm(w[:-3])
    if len(w) > 4 and w.endswith("ète"):
        w = w[:-3] + "et"
    if len(w) > 8 and w.endswith("ique"):
        w = w[:-4]
    if len(w) > 8 and w.endswith("esse"):
        return _fr_norm(w[:-3])
    if len(w) > 7 and w.endswith("inage"):
        return _fr_norm(w[:-3])
    if len(w) > 9 and w.endswith("isation"):
        w = w[:-7]
        if len(w) > 5 and w.endswith("ual"):
            w = w[:-2] + "el"
        return _fr_norm(w)
    if len(w) > 9 and w.endswith("isateur"):
        return _fr_norm(w[:-7])
    if len(w) > 8 and w.endswith("ation"):
        return _fr_norm(w[:-5])
    if len(w) > 8 and w.endswith("ition"):
        return _fr_norm(w[:-5])
    return _fr_norm(w)


_DE_FOLD = str.maketrans(
    "äàáâöòóô"
    "ïìíîüùúû",
    "aaaaoooo" "iiiiuuuu",
)
_DE_ST = frozenset("bdfghklmnt")


def german_light_stem(w: str) -> str:
    """GermanLightStemmer (analysis/de/GermanLightStemmer.java:62-141):
    accent fold, then the two UniNE suffix steps; tested against the
    reference's delight.txt vocabulary."""
    w = w.translate(_DE_FOLD)
    n = len(w)
    if n > 5 and w.endswith("ern"):
        w = w[:-3]
    elif n > 4 and len(w) >= 2 and w[-2] == "e" and w[-1] in "mnrs":
        w = w[:-2]
    elif n > 3 and w[-1] == "e":
        w = w[:-1]
    elif n > 3 and w[-1] == "s" and w[-2] in _DE_ST:
        w = w[:-1]
    n = len(w)
    if n > 5 and w.endswith("est"):
        return w[:-3]
    if n > 4 and w[-2] == "e" and w[-1] in "rn":
        return w[:-2]
    if n > 4 and w[-2:] == "st" and w[-3] in _DE_ST:
        return w[:-2]
    return w


_ES_FOLD = str.maketrans(
    "àáâäòóôö"
    "èéêëùúûü"
    "ìíîï",
    "aaaaoooo" "eeeeuuuu" "iiii",
)


def spanish_light_stem(w: str) -> str:
    """SpanishLightStemmer (analysis/es/SpanishLightStemmer.java:62-112):
    accent fold then the CLEF-2001 suffix rules; tested against the
    reference's eslight.txt vocabulary."""
    if len(w) < 5:
        return w
    w = w.translate(_ES_FOLD)
    last = w[-1]
    if last in "oae":
        return w[:-1]
    if last == "s" and len(w) >= 4:
        if w[-2] == "e" and w[-3] == "s" and w[-4] == "e":
            return w[:-2]
        if w[-2] == "e" and w[-3] == "c":
            return w[:-3] + "z"
        if w[-2] in "oae":
            return w[:-2]
    return w


# ---------------------------------------------------------------------------
# Full chains (STOP_HOLE marks stopped tokens; see module docstring)
# ---------------------------------------------------------------------------


def _lang_tokenize(text: str) -> List[str]:
    from .analysis import MAX_TOKEN_LENGTH

    out: List[str] = []
    for m in _LANG_TOKEN_PATTERN.finditer(text):
        tok = m.group()
        if len(tok) <= MAX_TOKEN_LENGTH:
            out.append(tok)
        else:
            out.extend(
                tok[i: i + MAX_TOKEN_LENGTH]
                for i in range(0, len(tok), MAX_TOKEN_LENGTH)
            )
    return out


def french_token(tok: str) -> str:
    """Per-token French chain (post-tokenizer): elision -> lowercase ->
    stop -> light stem."""
    t = elide(tok).lower()
    if t in FRENCH_STOP:
        return STOP_HOLE
    return french_light_stem(t)


def german_token(tok: str) -> str:
    t = tok.lower()
    if t in GERMAN_STOP:
        return STOP_HOLE
    return german_light_stem(german_normalize(t))


def spanish_token(tok: str) -> str:
    t = tok.lower()
    if t in SPANISH_STOP:
        return STOP_HOLE
    return spanish_light_stem(t)


def french_analyze(text: str) -> List[str]:
    return [french_token(t) for t in _lang_tokenize(text)]


def german_analyze(text: str) -> List[str]:
    return [german_token(t) for t in _lang_tokenize(text)]


def spanish_analyze(text: str) -> List[str]:
    return [spanish_token(t) for t in _lang_tokenize(text)]
