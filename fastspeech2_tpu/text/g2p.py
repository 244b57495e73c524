"""Grapheme-to-phoneme conversion for free-text inference.

The reference uses ``g2p_en.G2p`` at inference time (``inference.py:75,84-98``),
which needs network-downloaded NLTK data. Here g2p is a pluggable backend:

- if ``g2p_en`` is importable it is used verbatim;
- otherwise a built-in lexicon backend serves words it knows and falls back to
  simple English letter-to-sound rules for OOV words (g2p_en handles OOV with
  a neural LTS model; the rule LTS keeps free-text synthesis functional
  hermetically, at lower pronunciation quality).

``preprocess_text`` mirrors the reference's inference-time pipeline:
clean -> strip punctuation -> g2p -> map " "/","/"." to pau (``inference.py:84-98``).
"""

from typing import List, Optional

from fastspeech2_tpu.text.cleaners import english_cleaners, punctuation_removers

_G2P_BACKEND = None


# ordered greedy letter-to-sound rules: digraphs/trigraphs first, then single
# letters. Emitted symbols stay inside the 68-symbol vocabulary after the CMU
# stress remap (text/__init__.py).
_LTS_MULTI = [
    ("tion", "SH AH0 N"), ("sion", "ZH AH0 N"), ("igh", "AY1"),
    ("ough", "AO1"), ("augh", "AO1"), ("dge", "JH"), ("tch", "CH"),
    ("ch", "CH"), ("sh", "SH"), ("th", "TH"), ("ph", "F"), ("wh", "W"),
    ("ck", "K"), ("ng", "NG"), ("qu", "K W"), ("ee", "IY1"), ("oo", "UW1"),
    ("ea", "IY1"), ("ou", "AW1"), ("ow", "OW1"), ("ai", "EY1"),
    ("ay", "EY1"), ("oa", "OW1"), ("oi", "OY1"), ("oy", "OY1"),
    ("au", "AO1"), ("aw", "AO1"), ("ar", "AA1 R"), ("er", "ER0"),
    ("ir", "ER1"), ("or", "AO1 R"), ("ur", "ER1"), ("oe", "OW1"),
]
_LTS_SINGLE = {
    "a": "AE1", "b": "B", "c": "K", "d": "D", "e": "EH1", "f": "F",
    "g": "G", "h": "HH", "i": "IH1", "j": "JH", "k": "K", "l": "L",
    "m": "M", "n": "N", "o": "AA1", "p": "P", "q": "K", "r": "R", "s": "S",
    "t": "T", "u": "AH1", "v": "V", "w": "W", "x": "K S", "y": "IY0",
    "z": "Z",
}


def letter_to_sound(word: str) -> List[str]:
    """Greedy rule-based English LTS for lexicon misses. Deliberately simple:
    functional pronunciation, not g2p_en quality."""
    w = "".join(ch for ch in word.lower() if ch.isalpha())
    if not w:
        return []
    # magic e ("make", "time"): drop the silent final e and lengthen the
    # vowel before the closing consonant -- not for short words like "the"
    long_vowel = {"a": "EY1", "e": "IY1", "i": "AY1", "o": "OW1", "u": "UW1"}
    magic = -1
    if (len(w) > 3 and w.endswith("e") and w[-2] not in "aeiou"
            and w[-3] in "aeiou"):
        magic = len(w) - 3
        w = w[:-1]
    elif len(w) > 3 and w.endswith("e") and w[-2] not in "aeiou":
        w = w[:-1]
    phones: List[str] = []
    i = 0
    while i < len(w):
        if i == magic:
            phones.append(long_vowel[w[i]])
            i += 1
            continue
        for pat, ph in _LTS_MULTI:
            if w.startswith(pat, i):
                phones.extend(ph.split())
                i += len(pat)
                break
        else:
            ph = _LTS_SINGLE.get(w[i])
            if ph:
                phones.extend(ph.split())
            i += 1
    return phones


class LexiconG2p:
    """Lexicon lookup with rule-based letter-to-sound for misses.

    Enough to drive smoke tests and demos hermetically. Serving deployments
    should install ``g2p_en`` or supply a full lexicon file
    (one ``word phone phone ...`` entry per line, CMUdict format).
    """

    #: tiny built-in seed lexicon so demos work out of the box
    _SEED = {
        "the": "DH AH0", "a": "AH0", "an": "AE1 N", "and": "AH0 N D",
        "this": "DH IH1 S", "is": "IH1 Z", "was": "W AA1 Z", "are": "AA1 R",
        "to": "T UW1", "of": "AH1 V", "in": "IH1 N", "it": "IH1 T",
        "for": "F AO1 R", "on": "AA1 N", "with": "W IH1 DH", "as": "AE1 Z",
        "at": "AE1 T", "by": "B AY1", "from": "F R AH1 M", "or": "AO1 R",
        "be": "B IY1", "not": "N AA1 T", "that": "DH AE1 T", "text": "T EH1 K S T",
        "speech": "S P IY1 CH", "test": "T EH1 S T", "hello": "HH AH0 L OW1",
        "world": "W ER1 L D", "printing": "P R IH1 N T IH0 NG",
        "sentence": "S EH1 N T AH0 N S", "synthesis": "S IH1 N TH AH0 S IH0 S",
        "model": "M AA1 D AH0 L", "fast": "F AE1 S T",
    }

    def __init__(self, lexicon_path: Optional[str] = None):
        self.lexicon = dict(self._SEED)
        if lexicon_path:
            with open(lexicon_path, "r", encoding="utf-8") as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) >= 2 and not parts[0].startswith(";"):
                        self.lexicon.setdefault(parts[0].lower(), " ".join(parts[1:]))

    def __call__(self, text: str) -> List[str]:
        phones: List[str] = []
        for word in text.split():
            if word in (",", "."):
                phones.append(word)
                continue
            key = word.lower().strip(",.!?;:")
            if not key:
                continue
            if key in self.lexicon:
                phones.extend(self.lexicon[key].split())
            else:
                phones.extend(letter_to_sound(key))
            if word.endswith((",", ".")):
                phones.append(word[-1])
        return phones


def get_g2p(lexicon_path: Optional[str] = None):
    """Return a callable text -> list-of-phoneme-tokens."""
    global _G2P_BACKEND
    if _G2P_BACKEND is not None and lexicon_path is None:
        return _G2P_BACKEND
    try:
        from g2p_en import G2p  # type: ignore

        _G2P_BACKEND = G2p()
    except Exception:
        _G2P_BACKEND = LexiconG2p(lexicon_path)
    return _G2P_BACKEND


def preprocess_text(text: str, g2p=None) -> str:
    """Free text -> space-joined phoneme string (reference inference.py:84-98)."""
    g2p = g2p or get_g2p()
    cleaned = punctuation_removers(english_cleaners(text))
    phonemes = g2p(cleaned)
    phonemes = ["" if p == " " else p for p in phonemes]
    phonemes = ["pau" if p in (",", ".") else p for p in phonemes]
    return " ".join(p for p in phonemes if p)


def process_paragraph(para: str) -> List[str]:
    """Split a paragraph into sentences on '.' (reference inference.py:101-108)."""
    return para.split(".")
