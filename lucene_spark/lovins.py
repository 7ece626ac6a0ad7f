"""Lovins stemmer — snowball/ext/LovinsStemmer.java (Snowball 2.0
'lovins', the classic 1968 Lovins English stemmer). The 294 endings are
condition-gated with trie backtracking: the longest matching ending whose
condition accepts the remaining stem wins (shorter candidates are tried
when a longer one's condition fails) — unlike the post-gate semantics of
the other snowball stemmers here. Validated against the reference's
lovins.zip vocabulary.
"""

#: the 294 conditional endings (suffix, condition letter)
_LOV_ENDINGS = (
    ("alistically", "B"), ("arizability", "A"), ("izationally", "B"),
    ("antialness", "A"), ("arisations", "A"), ("arizations", "A"),
    ("entialness", "A"), ("allically", "C"), ("antaneous", "A"),
    ("antiality", "A"), ("arisation", "A"), ("arization", "A"),
    ("ationally", "B"), ("ativeness", "A"), ("eableness", "E"),
    ("entations", "A"), ("entiality", "A"), ("entialize", "A"),
    ("entiation", "A"), ("ionalness", "A"), ("istically", "A"),
    ("itousness", "A"), ("izability", "A"), ("izational", "A"),
    ("ableness", "A"), ("arizable", "A"), ("entation", "A"),
    ("entially", "A"), ("eousness", "A"), ("ibleness", "A"),
    ("icalness", "A"), ("ionalism", "A"), ("ionality", "A"),
    ("ionalize", "A"), ("iousness", "A"), ("izations", "A"),
    ("lessness", "A"), ("ability", "A"), ("aically", "A"),
    ("alistic", "B"), ("alities", "A"), ("ariness", "E"),
    ("aristic", "A"), ("arizing", "A"), ("ateness", "A"),
    ("atingly", "A"), ("ational", "B"), ("atively", "A"),
    ("ativism", "A"), ("elihood", "E"), ("encible", "A"),
    ("entally", "A"), ("entials", "A"), ("entiate", "A"),
    ("entness", "A"), ("fulness", "A"), ("ibility", "A"),
    ("icalism", "A"), ("icalist", "A"), ("icality", "A"),
    ("icalize", "A"), ("ication", "G"), ("icianry", "A"),
    ("ination", "A"), ("ingness", "A"), ("ionally", "A"),
    ("isation", "A"), ("ishness", "A"), ("istical", "A"),
    ("iteness", "A"), ("iveness", "A"), ("ivistic", "A"),
    ("ivities", "A"), ("ization", "F"), ("izement", "A"),
    ("oidally", "A"), ("ousness", "A"), ("aceous", "A"),
    ("acious", "B"), ("action", "G"), ("alness", "A"), ("ancial", "A"),
    ("ancies", "A"), ("ancing", "B"), ("ariser", "A"), ("arized", "A"),
    ("arizer", "A"), ("atable", "A"), ("ations", "B"), ("atives", "A"),
    ("eature", "Z"), ("efully", "A"), ("encies", "A"), ("encing", "A"),
    ("ential", "A"), ("enting", "C"), ("entist", "A"), ("eously", "A"),
    ("ialist", "A"), ("iality", "A"), ("ialize", "A"), ("ically", "A"),
    ("icance", "A"), ("icians", "A"), ("icists", "A"), ("ifully", "A"),
    ("ionals", "A"), ("ionate", "D"), ("ioning", "A"), ("ionist", "A"),
    ("iously", "A"), ("istics", "A"), ("izable", "E"), ("lessly", "A"),
    ("nesses", "A"), ("oidism", "A"), ("acies", "A"), ("acity", "A"),
    ("aging", "B"), ("aical", "A"), ("alism", "B"), ("alist", "A"),
    ("ality", "A"), ("alize", "A"), ("allic", "BB"), ("anced", "B"),
    ("ances", "B"), ("antic", "C"), ("arial", "A"), ("aries", "A"),
    ("arily", "A"), ("arity", "B"), ("arize", "A"), ("aroid", "A"),
    ("ately", "A"), ("ating", "I"), ("ation", "B"), ("ative", "A"),
    ("ators", "A"), ("atory", "A"), ("ature", "E"), ("early", "Y"),
    ("ehood", "A"), ("eless", "A"), ("elity", "A"), ("ement", "A"),
    ("enced", "A"), ("ences", "A"), ("eness", "E"), ("ening", "E"),
    ("ental", "A"), ("ented", "C"), ("ently", "A"), ("fully", "A"),
    ("ially", "A"), ("icant", "A"), ("ician", "A"), ("icide", "A"),
    ("icism", "A"), ("icist", "A"), ("icity", "A"), ("idine", "I"),
    ("iedly", "A"), ("ihood", "A"), ("inate", "A"), ("iness", "A"),
    ("ingly", "B"), ("inism", "J"), ("inity", "CC"), ("ional", "A"),
    ("ioned", "A"), ("ished", "A"), ("istic", "A"), ("ities", "A"),
    ("itous", "A"), ("ively", "A"), ("ivity", "A"), ("izers", "F"),
    ("izing", "F"), ("oidal", "A"), ("oides", "A"), ("otide", "A"),
    ("ously", "A"), ("able", "A"), ("ably", "A"), ("ages", "B"),
    ("ally", "B"), ("ance", "B"), ("ancy", "B"), ("ants", "B"),
    ("aric", "A"), ("arly", "K"), ("ated", "I"), ("ates", "A"),
    ("atic", "B"), ("ator", "A"), ("ealy", "Y"), ("edly", "E"),
    ("eful", "A"), ("eity", "A"), ("ence", "A"), ("ency", "A"),
    ("ened", "E"), ("enly", "E"), ("eous", "A"), ("hood", "A"),
    ("ials", "A"), ("ians", "A"), ("ible", "A"), ("ibly", "A"),
    ("ical", "A"), ("ides", "L"), ("iers", "A"), ("iful", "A"),
    ("ines", "M"), ("ings", "N"), ("ions", "B"), ("ious", "A"),
    ("isms", "B"), ("ists", "A"), ("itic", "H"), ("ized", "F"),
    ("izer", "F"), ("less", "A"), ("lily", "A"), ("ness", "A"),
    ("ogen", "A"), ("ward", "A"), ("wise", "A"), ("ying", "B"),
    ("yish", "A"), ("acy", "A"), ("age", "B"), ("aic", "A"),
    ("als", "BB"), ("ant", "B"), ("ars", "O"), ("ary", "F"),
    ("ata", "A"), ("ate", "A"), ("eal", "Y"), ("ear", "Y"),
    ("ely", "E"), ("ene", "E"), ("ent", "C"), ("ery", "E"),
    ("ese", "A"), ("ful", "A"), ("ial", "A"), ("ian", "A"),
    ("ics", "A"), ("ide", "L"), ("ied", "A"), ("ier", "A"),
    ("ies", "P"), ("ily", "A"), ("ine", "M"), ("ing", "N"),
    ("ion", "Q"), ("ish", "C"), ("ism", "B"), ("ist", "A"),
    ("ite", "AA"), ("ity", "A"), ("ium", "A"), ("ive", "A"),
    ("ize", "F"), ("oid", "A"), ("one", "R"), ("ous", "A"),
    ("'s", "A"), ("ae", "A"), ("al", "BB"), ("ar", "X"), ("as", "B"),
    ("ed", "E"), ("en", "F"), ("es", "E"), ("ia", "A"), ("ic", "A"),
    ("is", "A"), ("ly", "B"), ("on", "S"), ("or", "T"), ("s'", "A"),
    ("um", "U"), ("us", "V"), ("yl", "R"), ("a", "A"), ("e", "A"),
    ("i", "A"), ("o", "A"), ("s", "W"), ("y", "B"),
)

#: respell table (suffix, case number)
_LOV_RESPELL = (
    ("erid", 22), ("istr", 6), ("metr", 7), ("pand", 23), ("umpt", 3),
    ("bex", 10), ("cid", 20), ("dex", 11), ("end", 24), ("ent", 30),
    ("ert", 31), ("her", 28), ("iev", 1), ("lid", 21), ("lud", 26),
    ("lux", 17), ("mit", 29), ("olv", 8), ("ond", 25), ("pex", 12),
    ("rpt", 4), ("rud", 27), ("tex", 13), ("uad", 18), ("uct", 2),
    ("urs", 5), ("vad", 19), ("ax", 14), ("et", 32), ("ex", 15),
    ("ix", 16), ("ul", 9), ("yt", 33), ("yz", 33),
)

_LOV_AA = ("d", "f", "ph", "th", "l", "er", "or", "es", "t")
_LOV_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss",
                "tt")
_LOV_RESPELL_SIMPLE = {
    1: "ief", 2: "uc", 3: "um", 4: "rb", 5: "ur", 6: "ister",
    7: "meter", 8: "olut", 10: "bic", 11: "dic", 12: "pic", 13: "tic",
    14: "ac", 15: "ec", 16: "ic", 17: "luc", 18: "uas", 19: "vas",
    20: "cis", 21: "lis", 22: "eris", 23: "pans", 25: "ons",
    26: "lus", 27: "rus", 29: "mis", 31: "ers", 33: "ys",
}


def _lov_cond(letter: str, s: str) -> bool:
    """Condition predicates over the candidate stem s
    (LovinsStemmer.java r_A..r_CC)."""
    n = len(s)
    if letter == "A_TRUE":
        return True
    if letter == "A":
        return n >= 2
    if letter == "B":
        return n >= 3
    if letter == "C":
        return n >= 4
    if letter == "D":
        return n >= 5
    if letter == "E":
        return n >= 2 and not s.endswith("e")
    if letter == "F":
        return n >= 3 and not s.endswith("e")
    if letter == "G":
        return n >= 3 and s.endswith("f")
    if letter == "H":
        return n >= 2 and (s.endswith("t") or s.endswith("ll"))
    if letter == "I":
        return n >= 2 and not s.endswith(("o", "e"))
    if letter == "J":
        return n >= 2 and not s.endswith(("a", "e"))
    if letter == "K":
        return n >= 3 and (s.endswith(("l", "i"))
                           or (s.endswith("e") and n >= 3
                               and s[-3] == "u"))
    if letter == "L":
        if n < 2 or s.endswith(("u", "x")):
            return False
        return not s.endswith("s") or s.endswith("os")
    if letter == "M":
        return n >= 2 and not s.endswith(("a", "c", "e", "m"))
    if letter == "N":
        return n >= 3 and (s[-3] != "s" or n >= 4)
    if letter == "O":
        return n >= 2 and s.endswith(("l", "i"))
    if letter == "P":
        return n >= 2 and not s.endswith("c")
    if letter == "Q":
        return n >= 3 and not s.endswith(("l", "n"))
    if letter == "R":
        return n >= 2 and s.endswith(("n", "r"))
    if letter == "S":
        return n >= 2 and (s.endswith("dr")
                           or (s.endswith("t") and not s.endswith("tt")))
    if letter == "T":
        return n >= 2 and (s.endswith("s")
                           or (s.endswith("t") and not s.endswith("ot")))
    if letter == "U":
        return n >= 2 and s.endswith(("l", "m", "n", "r"))
    if letter == "V":
        return n >= 2 and s.endswith("c")
    if letter == "W":
        return n >= 2 and not s.endswith(("s", "u"))
    if letter == "X":
        return n >= 2 and (s.endswith(("l", "i"))
                           or (s.endswith("e") and n >= 3
                               and s[-3] == "u"))
    if letter == "Y":
        return n >= 2 and s.endswith("in")
    if letter == "Z":
        return n >= 2 and not s.endswith("f")
    if letter == "AA":
        return n >= 2 and s.endswith(_LOV_AA)
    if letter == "BB":
        return n >= 3 and not s.endswith(("met", "ryst"))
    if letter == "CC":
        return n >= 2 and s.endswith("l")
    raise AssertionError(letter)


def lovins_stem(w: str) -> str:
    """LovinsStemmer.stem (snowball/ext/LovinsStemmer.java:1494-1516)."""
    # endings: longest match whose condition accepts; shorter retried
    for suf, cond in _LOV_ENDINGS:
        if w.endswith(suf) and _lov_cond(cond, w[: len(w) - len(suf)]):
            w = w[: len(w) - len(suf)]
            break
    # undouble
    if w.endswith(_LOV_DOUBLES):
        w = w[:-1]
    # respell
    for suf, case in _LOV_RESPELL:
        if w.endswith(suf):
            head = w[: len(w) - len(suf)]
            if case in _LOV_RESPELL_SIMPLE:
                w = head + _LOV_RESPELL_SIMPLE[case]
            elif case == 9:    # ert -> l unless after a/i/o
                if not head.endswith(("a", "i", "o")):
                    w = head + "l"
            elif case == 24:   # ent -> ens unless after s
                if not head.endswith("s"):
                    w = head + "ens"
            elif case == 28:   # ond(?) -> hes unless after p/t
                if not head.endswith(("p", "t")):
                    w = head + "hes"
            elif case == 30:   # ens unless after m
                if not head.endswith("m"):
                    w = head + "ens"
            elif case == 32:   # es unless after n
                if not head.endswith("n"):
                    w = head + "es"
            break
    return w
