"""Indic analysis machinery — IndicNormalizer's script-composition table
and the Hindi/Bengali normalizers and stemmers, transcribed from:

- analysis/in/IndicNormalizer.java (decomposition table machine-extracted)
- analysis/hi/{HindiNormalizer,HindiStemmer}.java
- analysis/bn/{BengaliNormalizer,BengaliStemmer}.java (suffix groups
  machine-extracted: (min_len_exclusive, strip_count, suffixes))
"""

from typing import List

#: (block_start, flag, base) for the nine Indic scripts (block = 0x80 chars)
SCRIPT_BLOCKS = (
    (0x0900, 1, 0x0900),    # Devanagari
    (0x0980, 2, 0x0980),    # Bengali
    (0x0A00, 4, 0x0A00),    # Gurmukhi
    (0x0A80, 8, 0x0A80),    # Gujarati
    (0x0B00, 16, 0x0B00),   # Oriya
    (0x0B80, 32, 0x0B80),   # Tamil
    (0x0C00, 64, 0x0C00),   # Telugu
    (0x0C80, 128, 0x0C80),  # Kannada
    (0x0D00, 256, 0x0D00),  # Malayalam
)

#: rows: (ch1, ch2, ch3, result, script_flags); offsets into the script
#: codepage; ch3 == -1 -> 2-char rule; 0xFF stands for ZWJ (U+200D)
DECOMPOSITIONS = [
    (0x05, 0x3E, 0x45, 0x11, 9),
    (0x05, 0x3E, 0x46, 0x12, 1),
    (0x05, 0x3E, 0x47, 0x13, 9),
    (0x05, 0x3E, 0x48, 0x14, 9),
    (0x05, 0x3E, -1, 0x06, 31),
    (0x05, 0x45, -1, 0x72, 1),
    (0x05, 0x45, -1, 0x0D, 8),
    (0x05, 0x46, -1, 0x04, 1),
    (0x05, 0x47, -1, 0x0F, 8),
    (0x05, 0x48, -1, 0x10, 12),
    (0x05, 0x49, -1, 0x11, 9),
    (0x05, 0x4A, -1, 0x12, 1),
    (0x05, 0x4B, -1, 0x13, 9),
    (0x05, 0x4C, -1, 0x14, 13),
    (0x06, 0x45, -1, 0x11, 9),
    (0x06, 0x46, -1, 0x12, 1),
    (0x06, 0x47, -1, 0x13, 9),
    (0x06, 0x48, -1, 0x14, 9),
    (0x07, 0x57, -1, 0x08, 256),
    (0x09, 0x41, -1, 0x0A, 1),
    (0x09, 0x57, -1, 0x0A, 288),
    (0x0E, 0x46, -1, 0x10, 256),
    (0x0F, 0x45, -1, 0x0D, 1),
    (0x0F, 0x46, -1, 0x0E, 1),
    (0x0F, 0x47, -1, 0x10, 1),
    (0x0F, 0x57, -1, 0x10, 16),
    (0x12, 0x3E, -1, 0x13, 256),
    (0x12, 0x4C, -1, 0x14, 192),
    (0x12, 0x55, -1, 0x13, 64),
    (0x12, 0x57, -1, 0x14, 288),
    (0x13, 0x57, -1, 0x14, 16),
    (0x15, 0x3C, -1, 0x58, 1),
    (0x16, 0x3C, -1, 0x59, 5),
    (0x17, 0x3C, -1, 0x5A, 5),
    (0x1C, 0x3C, -1, 0x5B, 5),
    (0x21, 0x3C, -1, 0x5C, 19),
    (0x22, 0x3C, -1, 0x5D, 19),
    (0x23, 0x4D, 0xFF, 0x7A, 256),
    (0x24, 0x4D, 0xFF, 0x4E, 2),
    (0x28, 0x3C, -1, 0x29, 1),
    (0x28, 0x4D, 0xFF, 0x7B, 256),
    (0x2B, 0x3C, -1, 0x5E, 5),
    (0x2F, 0x3C, -1, 0x5F, 3),
    (0x2C, 0x41, 0x41, 0x0B, 64),
    (0x30, 0x3C, -1, 0x31, 1),
    (0x30, 0x4D, 0xFF, 0x7C, 256),
    (0x32, 0x4D, 0xFF, 0x7D, 256),
    (0x33, 0x3C, -1, 0x34, 1),
    (0x33, 0x4D, 0xFF, 0x7E, 256),
    (0x35, 0x41, -1, 0x2E, 64),
    (0x3E, 0x45, -1, 0x49, 9),
    (0x3E, 0x46, -1, 0x4A, 1),
    (0x3E, 0x47, -1, 0x4B, 9),
    (0x3E, 0x48, -1, 0x4C, 9),
    (0x3F, 0x55, -1, 0x40, 128),
    (0x41, 0x41, -1, 0x42, 4),
    (0x46, 0x3E, -1, 0x4A, 288),
    (0x46, 0x42, 0x55, 0x4B, 128),
    (0x46, 0x42, -1, 0x4A, 128),
    (0x46, 0x46, -1, 0x48, 256),
    (0x46, 0x55, -1, 0x47, 192),
    (0x46, 0x56, -1, 0x48, 192),
    (0x46, 0x57, -1, 0x4C, 288),
    (0x47, 0x3E, -1, 0x4B, 306),
    (0x47, 0x57, -1, 0x4C, 18),
    (0x4A, 0x55, -1, 0x4B, 128),
    (0x72, 0x3F, -1, 0x07, 4),
    (0x72, 0x40, -1, 0x08, 4),
    (0x72, 0x47, -1, 0x0F, 4),
    (0x73, 0x41, -1, 0x09, 4),
    (0x73, 0x42, -1, 0x0A, 4),
    (0x73, 0x4B, -1, 0x13, 4),
]


#: HindiStemmer suffix groups
HINDI_SUFFIX_GROUPS = (
    (6, 5, (
        "ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां",
    )),
    (5, 4, (
        "ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
        "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
        "ियों", "ियां",
    )),
    (4, 3, (
        "ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
        "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
        "ुआं",
    )),
    (3, 2, (
        "कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
        "ती", "ता", "ाँ", "ां", "ों", "ें",
    )),
    (2, 1, (
        "ो", "े", "ू", "ु", "ी", "ि", "ा",
    )),
)

#: BengaliStemmer suffix groups
BENGALI_SUFFIX_GROUPS = (
    (9, 8, (
        "িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন",
        "ইয়াছিলেন",
    )),
    (8, 7, (
        "িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা",
        "িয়াছিলি", "য়েদেরকে",
    )),
    (7, 6, (
        "িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন",
        "েদেরকে",
    )),
    (6, 5, (
        "িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা",
        "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে",
    )),
    (5, 4, (
        "িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা",
        "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের",
    )),
    (4, 3, (
        "লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম",
        "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি",
        "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের",
    )),
    (3, 2, (
        "িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে",
        "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের",
        "তে", "রা", "কে",
    )),
    (2, 1, (
        "ি", "ী", "া", "ো", "ে", "ব", "ত",
    )),
)


def _script_of(ch: str):
    cp = ord(ch)
    blk = cp & ~0x7F
    for start, flag, base in SCRIPT_BLOCKS:
        if blk == start:
            return flag, base
    return None


def indic_normalize(t: str) -> str:
    """IndicNormalizer.normalize (analysis/in/IndicNormalizer.java:247-292):
    compose split vowels/consonant+nukta sequences into their standard
    single-codepoint forms, per script."""
    s = list(t)
    i = 0
    while i < len(s):
        sc = _script_of(s[i])
        if sc is not None:
            flag, base = sc
            ch0 = ord(s[i]) - base
            # compose at this position if any rule for (ch0, script)
            if i + 1 < len(s):
                blk0 = ord(s[i]) & ~0x7F
                if (ord(s[i + 1]) & ~0x7F) == blk0:
                    ch1 = ord(s[i + 1]) - base
                    ch2 = -1
                    if i + 2 < len(s):
                        if s[i + 2] == "‍":
                            ch2 = 0xFF
                        elif (ord(s[i + 2]) & ~0x7F) == blk0:
                            ch2 = ord(s[i + 2]) - base
                    for a, b, c, res, flags in DECOMPOSITIONS:
                        if a == ch0 and (flags & flag) and b == ch1 and (
                            c < 0 or c == ch2
                        ):
                            s[i] = chr(base + res)
                            del s[i + 1]
                            if c >= 0:
                                del s[i + 1]
                            break
        i += 1
    return "".join(s)


#: HindiNormalizer 1:1 replacements (analysis/hi/HindiNormalizer.java:42-139)
_HI_MAP = str.maketrans({
    "ँ": "ं",              # candrabindu -> bindu
    "़": None,                   # nukta delete
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "‍": None, "‌": None,   # zwj/zwnj delete
    "्": None,                   # virama delete
    "ॅ": "े", "ॆ": "े",
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ", "ऐ": "ए",
    "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
})


def hindi_normalize(t: str) -> str:
    """HindiNormalizer.normalize: dead n (na+virama) -> bindu first (the
    scan sees the virama while still attached), then the 1:1 map +
    deletions."""
    if "न्" in t:
        t = t.replace("न्", "ं")
    return t.translate(_HI_MAP)


def _stem_groups(w: str, groups) -> str:
    for guard, strip, sufs in groups:
        if len(w) > guard and w.endswith(sufs):
            return w[:-strip]
    return w


def hindi_stem(w: str) -> str:
    """HindiStemmer.stem: first matching suffix group strips (lightweight
    Ramanathan/Rao stemmer)."""
    return _stem_groups(w, HINDI_SUFFIX_GROUPS)


def bengali_stem(w: str) -> str:
    """BengaliStemmer.stem."""
    return _stem_groups(w, BENGALI_SUFFIX_GROUPS)


def bengali_normalize(t: str) -> str:
    """BengaliNormalizer.normalize (analysis/bn/BengaliNormalizer.java:
    33-141) — literal transcription of the in-place scan."""
    s = list(t)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "ঁ":            # chandrabindu delete
            del s[i]
            continue
        elif ch == "ী":
            s[i] = "ি"
        elif ch == "ূ":
            s[i] = "ু"
        elif ch == "ক":          # khio
            if i + 2 < len(s) and s[i + 1] == "্" and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
        elif ch == "ঙ":          # nga -> anusvara
            s[i] = "ং"
        elif ch == "য":          # ja phala
            if i - 2 == 0 and s[i - 1] == "্":
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                continue
            elif i - 1 >= 0 and s[i - 1] == "্":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
        elif ch == "ব":          # ba phalaa
            if (i >= 1 and s[i - 1] != "্") or i == 0:
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 5 >= 0 and s[i - 3] == "্":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif ch == "ঃ":          # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif ch in ("শ", "ষ"):
            s[i] = "স"
        elif ch == "ণ":
            s[i] = "ন"
        elif ch in ("ড়", "ঢ়"):
            s[i] = "র"
        elif ch == "ৎ":
            s[i] = "ত"
        i += 1
    return "".join(s)
