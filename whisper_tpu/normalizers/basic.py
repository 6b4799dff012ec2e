"""Language-agnostic text normalization for WER evaluation.

Semantics follow the reference normalizer
(/root/reference/whisper/normalizers/basic.py): lowercase, strip bracketed
asides, map symbols/punctuation to spaces, optionally fold diacritics (NFKD
mark removal plus a table of non-decomposing Latin letters), and squeeze
whitespace.
"""

import re
import unicodedata

# Latin letters whose ASCII folding NFKD does not produce
_LATIN_FOLD = {
    "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O",
    "æ": "ae", "Æ": "AE",
    "ß": "ss", "ẞ": "SS",
    "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "th",
    "ł": "l", "Ł": "L",
}  # fmt: skip


def remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    """Map symbols/punctuation to spaces and drop diacritics (category Mn),
    folding the non-decomposing Latin letters above."""
    out = []
    for c in unicodedata.normalize("NFKD", s):
        if c in keep:
            out.append(c)
        elif c in _LATIN_FOLD:
            out.append(_LATIN_FOLD[c])
        else:
            cat = unicodedata.category(c)
            if cat == "Mn":
                continue
            out.append(" " if cat[0] in "MSP" else c)
    return "".join(out)


def remove_symbols(s: str) -> str:
    """Map symbols/punctuation to spaces, keeping diacritics."""
    return "".join(
        " " if unicodedata.category(c)[0] in "MSP" else c
        for c in unicodedata.normalize("NFKC", s)
    )


class BasicTextNormalizer:
    def __init__(self, remove_diacritics: bool = False, split_letters: bool = False):
        self.clean = (
            remove_symbols_and_diacritics if remove_diacritics else remove_symbols
        )
        self.split_letters = split_letters

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)  # remove words between brackets
        s = re.sub(r"\(([^)]+?)\)", "", s)  # remove words between parenthesis
        s = self.clean(s).lower()

        if self.split_letters:
            # split into extended grapheme clusters
            import regex

            s = " ".join(regex.findall(r"\X", s, regex.U))

        s = re.sub(r"\s+", " ", s)
        return s
