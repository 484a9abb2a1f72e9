"""Snowball English ("Porter2") stemmer.

The reference's ``en_stem`` tokenizer is the default tokenizer + an English
Snowball stemmer (tantivy registry; named in quickwit-doc-mapper/src/
default_doc_mapper/field_mapping_entry.rs:138-150 — rust-stemmers
``Algorithm::English``). This is a from-scratch implementation of the public
Snowball English algorithm (snowballstem.org/algorithms/english/stemmer.html);
pytest property-checks it token-for-token against DuckDB's ``stem(w,
'english')``, which wraps the same libstemmer algorithm — the exact oracle
the correctness gate uses.

Pure python by design: it runs inside Arrow-batched pandas UDFs with an LRU
cache over the (Zipfian) token stream, so the per-unique-token cost is paid
roughly once per vocabulary entry per task.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS  # Y (marked consonant) is not in the lowercase set


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) start offsets."""
    n = len(word)
    r1 = n
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_vowel(word[0]) and not _is_vowel(word[1])
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (
            not _is_vowel(a)
            and _is_vowel(b)
            and not _is_vowel(c)
            and c not in "wxY"
        )
    return False


def _contains_vowel(s: str) -> bool:
    return any(_is_vowel(ch) for ch in s)


def _step1b_tail(word: str, r1: int) -> str:
    if word.endswith(("at", "bl", "iz")):
        return word + "e"
    if word.endswith(_DOUBLES):
        return word[:-1]
    if r1 >= len(word) and _ends_short_syllable(word):
        return word + "e"
    return word


_STEP2 = [
    ("ization", "ize"),
    ("ational", "ate"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("fulness", "ful"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", None),  # -> og if preceded by l
    ("li", None),  # delete if valid li-ending precedes
]

_STEP3 = [
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", None),  # delete if in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
]

_STEP4 = [
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",
    "al",
    "er",
    "ic",
]


@lru_cache(maxsize=65536)
def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc
    w = word
    if w[0] == "'":
        w = w[1:]
    # mark consonant-y as Y: initial y, or y after a vowel
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = "".join(
        "Y" if ch == "y" and i > 0 and _is_vowel(w[i - 1]) else ch
        for i, ch in enumerate(w)
    )

    # step 0: strip 's / ' / 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    if len(w) <= 2:
        return w.replace("Y", "y")
    r1, r2 = _regions(w)

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if _contains_vowel(w[:-2]):
            w = w[:-1]

    if w in _EXCEPTIONS2:
        return w.replace("Y", "y")

    # step 1b
    if w.endswith("eedly"):
        if len(w) - 5 >= r1:
            w = w[:-3]
    elif w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-1]
    elif w.endswith("edly"):
        if _contains_vowel(w[:-4]):
            w = _step1b_tail(w[:-4], r1)
    elif w.endswith("ingly"):
        if _contains_vowel(w[:-5]):
            w = _step1b_tail(w[:-5], r1)
    elif w.endswith("ed"):
        if _contains_vowel(w[:-2]):
            w = _step1b_tail(w[:-2], r1)
    elif w.endswith("ing"):
        if _contains_vowel(w[:-3]):
            w = _step1b_tail(w[:-3], r1)

    # step 1c: y/Y -> i when preceded by a non-vowel that isn't the first char
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _is_vowel(w[-2])
    ):
        w = w[:-1] + "i"

    # step 2 (longest suffix; condition: suffix in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - 5 >= r2:
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 4 (suffix in R2; ion only after s/t)
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")


def stem_tokens(tokens: list[str]) -> list[str]:
    return [stem(t) for t in tokens]
