"""Generate `checkpoints/pinyin.vocab` — the pronunciation-control token
inventory (reference ships one with the model download,
`/root/reference/checkpoints/pinyin.vocab`, README.md:388).

Tokens are UPPERCASE pinyin syllables with tone digits 1-5 (5 = neutral),
with the BPE convention the tokenizer applies via `correct_pinyin`: after
j/q/x the u/ü finals are written with V (JU -> JV, QUE -> QVE, XUN -> XVN).

The syllable inventory is generated from standard Mandarin phonotactics
(initial x final compatibility), not copied: the set of valid syllables is
public-domain linguistic data.
"""

import sys

# finals grouped by the initial classes they combine with
FINALS_COMMON = ["a", "o", "e", "ai", "ei", "ao", "ou", "an", "en", "ang",
                 "eng", "ong", "u", "ua", "uo", "uai", "ui", "uan", "un",
                 "uang", "ueng", "i", "ia", "ie", "iao", "iu", "ian", "in",
                 "iang", "ing", "iong", "v", "ve", "van", "vn", "er"]

INITIALS = ["b", "p", "m", "f", "d", "t", "n", "l", "g", "k", "h",
            "j", "q", "x", "zh", "ch", "sh", "r", "z", "c", "s", "y", "w"]

# standard Mandarin syllable table: initial -> allowed finals
TABLE = {
    "":  ["a", "o", "e", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng",
          "er"],
    "b": ["a", "o", "ai", "ei", "ao", "an", "en", "ang", "eng", "i", "ie",
          "iao", "ian", "in", "ing", "u"],
    "p": ["a", "o", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng", "i",
          "ie", "iao", "ian", "in", "ing", "u"],
    "m": ["a", "o", "e", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng",
          "i", "ie", "iao", "iu", "ian", "in", "ing", "u"],
    "f": ["a", "o", "ei", "ou", "an", "en", "ang", "eng", "u"],
    "d": ["a", "e", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng", "ong",
          "i", "ia", "ie", "iao", "iu", "ian", "ing", "u", "uo", "ui",
          "uan", "un"],
    "t": ["a", "e", "ai", "ao", "ou", "an", "ang", "eng", "ong", "i", "ie",
          "iao", "ian", "ing", "u", "uo", "ui", "uan", "un"],
    "n": ["a", "e", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng", "ong",
          "i", "ie", "iao", "iu", "ian", "in", "iang", "ing", "u", "uo",
          "uan", "un", "v", "ve"],
    "l": ["a", "o", "e", "ai", "ei", "ao", "ou", "an", "ang", "eng", "ong",
          "i", "ia", "ie", "iao", "iu", "ian", "in", "iang", "ing", "u",
          "uo", "uan", "un", "v", "ve"],
    "g": ["a", "e", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng", "ong",
          "u", "ua", "uo", "uai", "ui", "uan", "un", "uang"],
    "k": ["a", "e", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng", "ong",
          "u", "ua", "uo", "uai", "ui", "uan", "un", "uang"],
    "h": ["a", "e", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng", "ong",
          "u", "ua", "uo", "uai", "ui", "uan", "un", "uang"],
    # j/q/x: written with V for the ü finals (tokenizer convention); the
    # i-finals keep i
    "j": ["i", "ia", "ie", "iao", "iu", "ian", "in", "iang", "ing", "iong",
          "v", "ve", "van", "vn"],
    "q": ["i", "ia", "ie", "iao", "iu", "ian", "in", "iang", "ing", "iong",
          "v", "ve", "van", "vn"],
    "x": ["i", "ia", "ie", "iao", "iu", "ian", "in", "iang", "ing", "iong",
          "v", "ve", "van", "vn"],
    "zh": ["a", "e", "i", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng",
           "ong", "u", "ua", "uo", "uai", "ui", "uan", "un", "uang"],
    "ch": ["a", "e", "i", "ai", "ao", "ou", "an", "en", "ang", "eng", "ong",
           "u", "ua", "uo", "uai", "ui", "uan", "un", "uang"],
    "sh": ["a", "e", "i", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng",
           "u", "ua", "uo", "uai", "ui", "uan", "un", "uang"],
    "r": ["e", "i", "ao", "ou", "an", "en", "ang", "eng", "ong", "u", "ua",
          "uo", "ui", "uan", "un"],
    "z": ["a", "e", "i", "ai", "ei", "ao", "ou", "an", "en", "ang", "eng",
          "ong", "u", "uo", "ui", "uan", "un"],
    "c": ["a", "e", "i", "ai", "ao", "ou", "an", "en", "ang", "eng", "ong",
          "u", "uo", "ui", "uan", "un"],
    "s": ["a", "e", "i", "ai", "ao", "ou", "an", "en", "ang", "eng", "ong",
          "u", "uo", "ui", "uan", "un"],
    "y": ["a", "o", "e", "ao", "ou", "an", "ang", "ong", "i", "in", "ing",
          "u", "ue", "uan", "un"],
    "w": ["a", "o", "ai", "ei", "an", "en", "ang", "eng", "u"],
}


def syllables():
    out = set()
    for ini, finals in TABLE.items():
        for f in finals:
            out.add(ini + f)
    # standalone syllabic nasal
    out.add("ng")
    return sorted(out)


def main(path="checkpoints/pinyin.vocab"):
    toks = []
    for s in syllables():
        for tone in "12345":
            toks.append(s.upper() + tone)
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(toks) + "\n")
    print(f"wrote {len(toks)} pinyin tokens to {path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
