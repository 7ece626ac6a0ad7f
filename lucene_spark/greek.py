"""Greek stemmer — analysis/el/GreekStemmer.java (the Ntais/Saroukos
stemmer) re-expressed rule-for-rule. The 22 rules and their side sets were
machine-translated from the reference source (preserving its operator-
precedence quirks, which are semantics), then verified against the
reference's full 342-vector test set (el/TestGreekStemmer.java).

Buffer convention mirrors the reference: rules take (s, n) where s is the
full char list and n the live length — several rules resurrect chars beyond
n (rule8/rule10 add-back writes), so truncating eagerly would be wrong.
"""

from typing import List

_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")


def _ew(s: List[str], n: int, suf: str) -> bool:
    k = len(suf)
    return n >= k and "".join(s[n - k:n]) == suf


def _ewv(s: List[str], n: int) -> bool:
    return n > 0 and s[n - 1] in _VOWELS


def _ewv_noy(s: List[str], n: int) -> bool:
    return n > 0 and s[n - 1] in _VOWELS_NO_Y


exc4 = frozenset((
    "θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ",
))

exc6 = frozenset((
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ",
))

exc7 = frozenset((
    "αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ",
    "πικρ", "ποτ", "σιχ", "χ",
))

exc8a = frozenset((
    "τρ", "τσ",
))

exc8b = frozenset((
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
    "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ",
    "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ",
    "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ",
    "ορφ", "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ",
    "πουριτ", "σ", "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ",
    "μαιντ", "μελ", "σιγ", "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ",
    "αδαπ", "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ",
    "βασ", "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ", "διαφ",
    "ενοργ", "θυσ", "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ",
    "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ",
    "ολογαλ", "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ",
    "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ",
    "ψηλοταβ",
))

exc9 = frozenset((
    "αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
    "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ",
    "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ",
))

exc12a = frozenset((
    "π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ",
))

exc12b = frozenset((
    "αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "αρ", "προ", "νισ",
))

exc13 = frozenset((
    "διαθ", "θ", "παρακαταθ", "προσθ", "συνθ",
))

exc14 = frozenset((
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
    "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
    "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
    "τσα",
))

exc15a = frozenset((
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
    "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ",
    "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ",
))

exc15b = frozenset((
    "ψοφ", "ναυλοχ",
))

exc16 = frozenset((
    "ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν",
))

exc17 = frozenset((
    "ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
    "κοινοχρ", "παλιμψ",
))

exc18 = frozenset((
    "ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων",
))

exc19 = frozenset((
    "παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ",
))

def _rule0(s, n):
    if (n > 9 and (_ew(s, n, "καθεστωτοσ") or _ew(s, n, "καθεστωτων"))):
        return n - 4
    if (n > 8 and (_ew(s, n, "γεγονοτοσ") or _ew(s, n, "γεγονοτων"))):
        return n - 4
    if (n > 8 and _ew(s, n, "καθεστωτα")):
        return n - 3
    if (n > 7 and (_ew(s, n, "τατογιου") or _ew(s, n, "τατογιων"))):
        return n - 4
    if (n > 7 and _ew(s, n, "γεγονοτα")):
        return n - 3
    if (n > 7 and _ew(s, n, "καθεστωσ")):
        return n - 2
    if (n > 6 and (_ew(s, n, "σκαγιου")) or _ew(s, n, "σκαγιων") or _ew(s, n, "ολογιου") or _ew(s, n, "ολογιων") or _ew(s, n, "κρεατοσ") or _ew(s, n, "κρεατων") or _ew(s, n, "περατοσ") or _ew(s, n, "περατων") or _ew(s, n, "τερατοσ") or _ew(s, n, "τερατων")):
        return n - 4
    if (n > 6 and _ew(s, n, "τατογια")):
        return n - 3
    if (n > 6 and _ew(s, n, "γεγονοσ")):
        return n - 2
    if (n > 5 and (_ew(s, n, "φαγιου") or _ew(s, n, "φαγιων") or _ew(s, n, "σογιου") or _ew(s, n, "σογιων"))):
        return n - 4
    if (n > 5 and (_ew(s, n, "σκαγια") or _ew(s, n, "ολογια") or _ew(s, n, "κρεατα") or _ew(s, n, "περατα") or _ew(s, n, "τερατα"))):
        return n - 3
    if (n > 4 and (_ew(s, n, "φαγια") or _ew(s, n, "σογια") or _ew(s, n, "φωτοσ") or _ew(s, n, "φωτων"))):
        return n - 3
    if (n > 4 and (_ew(s, n, "κρεασ") or _ew(s, n, "περασ") or _ew(s, n, "τερασ"))):
        return n - 2
    if (n > 3 and _ew(s, n, "φωτα")):
        return n - 2
    if (n > 2 and _ew(s, n, "φωσ")):
        return n - 1
    return n
    return n

def _rule1(s, n):
    if (n > 4 and (_ew(s, n, "αδεσ") or _ew(s, n, "αδων"))):
        n -= 4
        if (not (_ew(s, n, "οκ") or _ew(s, n, "μαμ") or _ew(s, n, "μαν") or _ew(s, n, "μπαμπ") or _ew(s, n, "πατερ") or _ew(s, n, "γιαγι") or _ew(s, n, "νταντ") or _ew(s, n, "κυρ") or _ew(s, n, "θει") or _ew(s, n, "πεθερ"))):
            n += 2
    return n
    return n

def _rule2(s, n):
    if (n > 4 and (_ew(s, n, "εδεσ") or _ew(s, n, "εδων"))):
        n -= 4
        if (_ew(s, n, "οπ") or _ew(s, n, "ιπ") or _ew(s, n, "εμπ") or _ew(s, n, "υπ") or _ew(s, n, "γηπ") or _ew(s, n, "δαπ") or _ew(s, n, "κρασπ") or _ew(s, n, "μιλ")):
            n += 2
    return n
    return n

def _rule3(s, n):
    if (n > 5 and (_ew(s, n, "ουδεσ") or _ew(s, n, "ουδων"))):
        n -= 5
        if (_ew(s, n, "αρκ") or _ew(s, n, "καλιακ") or _ew(s, n, "πεταλ") or _ew(s, n, "λιχ") or _ew(s, n, "πλεξ") or _ew(s, n, "σκ") or _ew(s, n, "σ") or _ew(s, n, "φλ") or _ew(s, n, "φρ") or _ew(s, n, "βελ") or _ew(s, n, "λουλ") or _ew(s, n, "χν") or _ew(s, n, "σπ") or _ew(s, n, "τραγ") or _ew(s, n, "φε")):
            n += 3
    return n
    return n

def _rule4(s, n):
    if (n > 3 and (_ew(s, n, "εωσ") or _ew(s, n, "εων"))):
        n -= 3
        if ("".join(s[:n]) in exc4):
            n += 1
    return n
    return n

def _rule5(s, n):
    if (n > 2 and _ew(s, n, "ια")):
        n -= 2
        if (_ewv(s, n)):
            n += 1
    elif (n > 3 and (_ew(s, n, "ιου") or _ew(s, n, "ιων"))):
        n -= 3
        if (_ewv(s, n)):
            n += 1
    return n
    return n

def _rule6(s, n):
    removed = False
    if (n > 3 and (_ew(s, n, "ικα") or _ew(s, n, "ικο"))):
        n -= 3
        removed = True
    elif (n > 4 and (_ew(s, n, "ικου") or _ew(s, n, "ικων"))):
        n -= 4
        removed = True
    if (removed):
        if (_ewv(s, n) or "".join(s[:n]) in exc6):
            n += 2
    return n
    return n

def _rule7(s, n):
    if (n == 5 and _ew(s, n, "αγαμε")):
        return n - 1
    if (n > 7 and _ew(s, n, "ηθηκαμε")):
        n -= 7
    elif (n > 6 and _ew(s, n, "ουσαμε")):
        n -= 6
    elif (n > 5 and (_ew(s, n, "αγαμε") or _ew(s, n, "ησαμε") or _ew(s, n, "ηκαμε"))):
        n -= 5
    if (n > 3 and _ew(s, n, "αμε")):
        n -= 3
        if ("".join(s[:n]) in exc7):
            n += 2
    return n
    return n

def _rule8(s, n):
    removed = False
    if (n > 8 and _ew(s, n, "ιουντανε")):
        n -= 8
        removed = True
    elif (n > 7 and _ew(s, n, "ιοντανε") or _ew(s, n, "ουντανε") or _ew(s, n, "ηθηκανε")):
        n -= 7
        removed = True
    elif (n > 6 and _ew(s, n, "ιοτανε") or _ew(s, n, "οντανε") or _ew(s, n, "ουσανε")):
        n -= 6
        removed = True
    elif (n > 5 and _ew(s, n, "αγανε") or _ew(s, n, "ησανε") or _ew(s, n, "οτανε") or _ew(s, n, "ηκανε")):
        n -= 5
        removed = True
    if (removed and "".join(s[:n]) in exc8a):
        n += 4
        s[n - 4] = "α"
        s[n - 3] = "γ"
        s[n - 2] = "α"
        s[n - 1] = "ν"
    if (n > 3 and _ew(s, n, "ανε")):
        n -= 3
        if (_ewv_noy(s, n) or "".join(s[:n]) in exc8b):
            n += 2
    return n
    return n

def _rule9(s, n):
    if (n > 5 and _ew(s, n, "ησετε")):
        n -= 5
    if (n > 3 and _ew(s, n, "ετε")):
        n -= 3
        if ("".join(s[:n]) in exc9 or _ewv_noy(s, n) or _ew(s, n, "οδ") or _ew(s, n, "αιρ") or _ew(s, n, "φορ") or _ew(s, n, "ταθ") or _ew(s, n, "διαθ") or _ew(s, n, "σχ") or _ew(s, n, "ενδ") or _ew(s, n, "ευρ") or _ew(s, n, "τιθ") or _ew(s, n, "υπερθ") or _ew(s, n, "ραθ") or _ew(s, n, "ενθ") or _ew(s, n, "ροθ") or _ew(s, n, "σθ") or _ew(s, n, "πυρ") or _ew(s, n, "αιν") or _ew(s, n, "συνδ") or _ew(s, n, "συν") or _ew(s, n, "συνθ") or _ew(s, n, "χωρ") or _ew(s, n, "πον") or _ew(s, n, "βρ") or _ew(s, n, "καθ") or _ew(s, n, "ευθ") or _ew(s, n, "εκθ") or _ew(s, n, "νετ") or _ew(s, n, "ρον") or _ew(s, n, "αρκ") or _ew(s, n, "βαρ") or _ew(s, n, "βολ") or _ew(s, n, "ωφελ")):
            n += 2
    return n
    return n

def _rule10(s, n):
    if (n > 5 and (_ew(s, n, "οντασ") or _ew(s, n, "ωντασ"))):
        n -= 5
        if (n == 3 and _ew(s, n, "αρχ")):
            n += 3
            s[n - 3] = "ο"
        if (_ew(s, n, "κρε")):
            n += 3
            s[n - 3] = "ω"
    return n
    return n

def _rule11(s, n):
    if (n > 6 and _ew(s, n, "ομαστε")):
        n -= 6
        if (n == 2 and _ew(s, n, "ον")):
            n += 5
    elif (n > 7 and _ew(s, n, "ιομαστε")):
        n -= 7
        if (n == 2 and _ew(s, n, "ον")):
            n += 5
            s[n - 5] = "ο"
            s[n - 4] = "μ"
            s[n - 3] = "α"
            s[n - 2] = "σ"
            s[n - 1] = "τ"
    return n
    return n

def _rule12(s, n):
    if (n > 5 and _ew(s, n, "ιεστε")):
        n -= 5
        if ("".join(s[:n]) in exc12a):
            n += 4
    if (n > 4 and _ew(s, n, "εστε")):
        n -= 4
        if ("".join(s[:n]) in exc12b):
            n += 3
    return n
    return n

def _rule13(s, n):
    if (n > 6 and _ew(s, n, "ηθηκεσ")):
        n -= 6
    elif (n > 5 and (_ew(s, n, "ηθηκα") or _ew(s, n, "ηθηκε"))):
        n -= 5
    removed = False
    if (n > 4 and _ew(s, n, "ηκεσ")):
        n -= 4
        removed = True
    elif (n > 3 and (_ew(s, n, "ηκα") or _ew(s, n, "ηκε"))):
        n -= 3
        removed = True
    if (removed and ("".join(s[:n]) in exc13 or _ew(s, n, "σκωλ") or _ew(s, n, "σκουλ") or _ew(s, n, "ναρθ") or _ew(s, n, "σφ") or _ew(s, n, "οθ") or _ew(s, n, "πιθ"))):
        n += 2
    return n
    return n

def _rule14(s, n):
    removed = False
    if (n > 5 and _ew(s, n, "ουσεσ")):
        n -= 5
        removed = True
    elif (n > 4 and (_ew(s, n, "ουσα") or _ew(s, n, "ουσε"))):
        n -= 4
        removed = True
    if (removed and ("".join(s[:n]) in exc14 or _ewv(s, n) or _ew(s, n, "ποδαρ") or _ew(s, n, "βλεπ") or _ew(s, n, "πανταχ") or _ew(s, n, "φρυδ") or _ew(s, n, "μαντιλ") or _ew(s, n, "μαλλ") or _ew(s, n, "κυματ") or _ew(s, n, "λαχ") or _ew(s, n, "ληγ") or _ew(s, n, "φαγ") or _ew(s, n, "ομ") or _ew(s, n, "πρωτ"))):
        n += 3
    return n
    return n

def _rule15(s, n):
    removed = False
    if (n > 4 and _ew(s, n, "αγεσ")):
        n -= 4
        removed = True
    elif (n > 3 and (_ew(s, n, "αγα") or _ew(s, n, "αγε"))):
        n -= 3
        removed = True
    if (removed):
        cond1 = "".join(s[:n]) in exc15a or _ew(s, n, "οφ") or _ew(s, n, "πελ") or _ew(s, n, "χορτ") or _ew(s, n, "λλ") or _ew(s, n, "σφ") or _ew(s, n, "ρπ") or _ew(s, n, "φρ") or _ew(s, n, "πρ") or _ew(s, n, "λοχ") or _ew(s, n, "σμην")
        cond2 = "".join(s[:n]) in exc15b or _ew(s, n, "κολλ")
        if (cond1 and not cond2):
            n += 2
    return n
    return n

def _rule16(s, n):
    removed = False
    if (n > 4 and _ew(s, n, "ησου")):
        n -= 4
        removed = True
    elif (n > 3 and (_ew(s, n, "ησε") or _ew(s, n, "ησα"))):
        n -= 3
        removed = True
    if (removed and "".join(s[:n]) in exc16):
        n += 2
    return n
    return n

def _rule17(s, n):
    if (n > 4 and _ew(s, n, "ηστε")):
        n -= 4
        if ("".join(s[:n]) in exc17):
            n += 3
    return n
    return n

def _rule18(s, n):
    removed = False
    if (n > 6 and (_ew(s, n, "ησουνε") or _ew(s, n, "ηθουνε"))):
        n -= 6
        removed = True
    elif (n > 4 and _ew(s, n, "ουνε")):
        n -= 4
        removed = True
    if (removed and "".join(s[:n]) in exc18):
        n += 3
        s[n - 3] = "ο"
        s[n - 2] = "υ"
        s[n - 1] = "ν"
    return n
    return n

def _rule19(s, n):
    removed = False
    if (n > 6 and (_ew(s, n, "ησουμε") or _ew(s, n, "ηθουμε"))):
        n -= 6
        removed = True
    elif (n > 4 and _ew(s, n, "ουμε")):
        n -= 4
        removed = True
    if (removed and "".join(s[:n]) in exc19):
        n += 3
        s[n - 3] = "ο"
        s[n - 2] = "υ"
        s[n - 1] = "μ"
    return n
    return n

def _rule20(s, n):
    if (n > 5 and (_ew(s, n, "ματων") or _ew(s, n, "ματοσ"))):
        n -= 3
    elif (n > 4 and _ew(s, n, "ματα")):
        n -= 2
    return n
    return n

def _rule21(s, n):
    if (n > 9 and _ew(s, n, "ιοντουσαν")):
        return n - 9
    if (n > 8 and (_ew(s, n, "ιομασταν") or _ew(s, n, "ιοσασταν") or _ew(s, n, "ιουμαστε") or _ew(s, n, "οντουσαν"))):
        return n - 8
    if (n > 7 and (_ew(s, n, "ιεμαστε") or _ew(s, n, "ιεσαστε") or _ew(s, n, "ιομουνα") or _ew(s, n, "ιοσαστε") or _ew(s, n, "ιοσουνα") or _ew(s, n, "ιουνται") or _ew(s, n, "ιουνταν") or _ew(s, n, "ηθηκατε") or _ew(s, n, "ομασταν") or _ew(s, n, "οσασταν") or _ew(s, n, "ουμαστε"))):
        return n - 7
    if (n > 6 and (_ew(s, n, "ιομουν") or _ew(s, n, "ιονταν") or _ew(s, n, "ιοσουν") or _ew(s, n, "ηθειτε") or _ew(s, n, "ηθηκαν") or _ew(s, n, "ομουνα") or _ew(s, n, "οσαστε") or _ew(s, n, "οσουνα") or _ew(s, n, "ουνται") or _ew(s, n, "ουνταν") or _ew(s, n, "ουσατε"))):
        return n - 6
    if (n > 5 and (_ew(s, n, "αγατε") or _ew(s, n, "ιεμαι") or _ew(s, n, "ιεται") or _ew(s, n, "ιεσαι") or _ew(s, n, "ιοταν") or _ew(s, n, "ιουμα") or _ew(s, n, "ηθεισ") or _ew(s, n, "ηθουν") or _ew(s, n, "ηκατε") or _ew(s, n, "ησατε") or _ew(s, n, "ησουν") or _ew(s, n, "ομουν") or _ew(s, n, "ονται") or _ew(s, n, "ονταν") or _ew(s, n, "οσουν") or _ew(s, n, "ουμαι") or _ew(s, n, "ουσαν"))):
        return n - 5
    if (n > 4 and (_ew(s, n, "αγαν") or _ew(s, n, "αμαι") or _ew(s, n, "ασαι") or _ew(s, n, "αται") or _ew(s, n, "ειτε") or _ew(s, n, "εσαι") or _ew(s, n, "εται") or _ew(s, n, "ηδεσ") or _ew(s, n, "ηδων") or _ew(s, n, "ηθει") or _ew(s, n, "ηκαν") or _ew(s, n, "ησαν") or _ew(s, n, "ησει") or _ew(s, n, "ησεσ") or _ew(s, n, "ομαι") or _ew(s, n, "οταν"))):
        return n - 4
    if (n > 3 and (_ew(s, n, "αει") or _ew(s, n, "εισ") or _ew(s, n, "ηθω") or _ew(s, n, "ησω") or _ew(s, n, "ουν") or _ew(s, n, "ουσ"))):
        return n - 3
    if (n > 2 and (_ew(s, n, "αν") or _ew(s, n, "ασ") or _ew(s, n, "αω") or _ew(s, n, "ει") or _ew(s, n, "εσ") or _ew(s, n, "ησ") or _ew(s, n, "οι") or _ew(s, n, "οσ") or _ew(s, n, "ου") or _ew(s, n, "υσ") or _ew(s, n, "ων"))):
        return n - 2
    if (n > 1 and _ewv(s, n)):
        return n - 1
    return n
    return n

def _rule22(s, n):
    if (_ew(s, n, "εστερ") or _ew(s, n, "εστατ")):
        return n - 5
    if (_ew(s, n, "οτερ") or _ew(s, n, "οτατ") or _ew(s, n, "υτερ") or _ew(s, n, "υτατ") or _ew(s, n, "ωτερ") or _ew(s, n, "ωτατ")):
        return n - 4
    return n
    return n



def greek_stem(w: str) -> str:
    """GreekStemmer.stem (analysis/el/GreekStemmer.java:38-77)."""
    if len(w) < 4:
        return w
    s = list(w)
    n = len(w)
    orig = n
    for rule in (_rule0, _rule1, _rule2, _rule3, _rule4, _rule5, _rule6,
                 _rule7, _rule8, _rule9, _rule10, _rule11, _rule12, _rule13,
                 _rule14, _rule15, _rule16, _rule17, _rule18, _rule19,
                 _rule20):
        n = rule(s, n)
    if n == orig:
        n = _rule21(s, n)
    n = _rule22(s, n)
    return "".join(s[:n])
