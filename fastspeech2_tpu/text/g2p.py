"""Grapheme-to-phoneme conversion for free-text inference.

The reference uses ``g2p_en.G2p`` at inference time (``inference.py:75,84-98``),
which needs network-downloaded NLTK data. Here g2p is a pluggable backend:

- if ``g2p_en`` is importable it is used verbatim;
- otherwise a built-in lexicon backend serves words it knows and raises a clear
  error for OOV words (phoneme-string input always works without g2p).

``preprocess_text`` mirrors the reference's inference-time pipeline:
clean -> strip punctuation -> g2p -> map " "/","/"." to pau (``inference.py:84-98``).
"""

from typing import List, Optional

from fastspeech2_tpu.text.cleaners import english_cleaners, punctuation_removers

_G2P_BACKEND = None


class LexiconG2p:
    """Minimal lexicon-based g2p: exact word lookup, no LTS rules.

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
            if key not in self.lexicon:
                raise ValueError(
                    f"word {key!r} not in g2p lexicon; install g2p_en or pass a "
                    "lexicon file (or provide phoneme input directly)"
                )
            phones.extend(self.lexicon[key].split())
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
