"""Phoneme-error-rate measurement for the hermetic G2P fallback
(VERDICT r4 next #6).

No full CMUdict exists in this zero-egress environment (nltk's corpus data is
not installed and g2p_en is absent), so two honest substitutes:

1. **Held-out lexicon cross-validation**: every entry of the bundled lexicon
   (text/data/lexicon.txt) is deleted in turn and the word re-predicted
   through the remaining machinery (morphological derivation from other base
   forms, else rule LTS). The bundled pronunciation is the gold label. This
   measures exactly the quantity the VERDICT asks about: the PER a served
   word suffers when it is NOT in the lexicon.
2. **End-to-end vs MFA**: the 10 valid-filelist utterances carry real
   Montreal-Forced-Aligner phoneme sequences for real LJSpeech text
   (/root/reference/filelists/valid_filelist.txt). preprocess_text(raw_text)
   is scored against them by edit distance -- a whole-pipeline number
   (cleaners + lexicon + morphology + LTS) against independent ground truth.

Both are scored in the collapsed-stress 68-symbol space the model actually
consumes (text/__init__.py:convert_phoneme_cmu); silence markers are
excluded from the pronunciation PER (pausing is scored separately).

    python scripts/measure_g2p.py [--every N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SIL = {"pau", "sil", "spn"}


def edit_distance(a, b) -> int:
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def remap(phones):
    from fastspeech2_tpu.text import convert_phoneme_cmu

    return [convert_phoneme_cmu(p) for p in phones]


def heldout_lexicon(every: int = 1):
    """Delete each lexicon entry; predict it with the rest of the machinery;
    PER vs the bundled pronunciation (collapsed-stress space)."""
    from fastspeech2_tpu.text.g2p import LexiconG2p, letter_to_sound

    g = LexiconG2p()
    words = sorted(w for w in g.lexicon if "'" not in w)[::every]
    tot_ed = tot_len = 0
    exact = morph_hits = lts_hits = 0
    per_word = []
    for w in words:
        gold = remap(g.lexicon[w].split())
        saved = {w: g.lexicon.pop(w)}
        bare = w.replace("'", "")
        if bare != w and bare in g.lexicon:
            saved[bare] = g.lexicon.pop(bare)
        hit = g.lookup(w)
        if hit is not None:
            morph_hits += 1
            pred = remap(hit)
        else:
            lts_hits += 1
            pred = remap(letter_to_sound(w))
        g.lexicon.update(saved)
        ed = edit_distance(pred, gold)
        tot_ed += ed
        tot_len += len(gold)
        exact += ed == 0
        per_word.append((ed / max(len(gold), 1), w))
    per = tot_ed / max(tot_len, 1)
    return {
        "n_words": len(words),
        "per": round(per, 4),
        "exact_match": round(exact / max(len(words), 1), 4),
        "morph_served": morph_hits,
        "lts_served": lts_hits,
        "worst": sorted(per_word, reverse=True)[:10],
    }


def mfa_sentences():
    """preprocess_text over the valid filelist's raw text, scored against
    its MFA phoneme sequences (collapsed-stress space, silences excluded
    for the pronunciation PER)."""
    from fastspeech2_tpu.data.filelist import parse_filelist
    from fastspeech2_tpu.text.g2p import LexiconG2p, preprocess_text

    g2p = LexiconG2p()
    entries = parse_filelist("/root/reference/filelists/valid_filelist.txt")
    tot_ed = tot_len = tot_ed_sil = tot_len_sil = 0
    rows = []
    for e in entries:
        pred_all = preprocess_text(e.raw_text, g2p=g2p).split()
        gold_all = remap(e.phonemes)
        pred = [p for p in remap(pred_all) if p not in SIL]
        gold = [p for p in gold_all if p not in SIL]
        ed = edit_distance(pred, gold)
        tot_ed += ed
        tot_len += len(gold)
        ed_s = edit_distance(remap(pred_all), gold_all)
        tot_ed_sil += ed_s
        tot_len_sil += len(gold_all)
        rows.append((ed / max(len(gold), 1), e.utt_id, len(gold)))
    return {
        "n_sentences": len(entries),
        "per_no_sil": round(tot_ed / max(tot_len, 1), 4),
        "per_with_sil": round(tot_ed_sil / max(tot_len_sil, 1), 4),
        "lts_fallback_words": g2p.lts_count,
        "per_sentence": [(round(p, 3), u) for p, u, _ in rows],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--every", type=int, default=1,
                    help="subsample the lexicon by this stride")
    args = ap.parse_args()

    print("[1] held-out lexicon cross-validation (morphology + rule LTS)")
    h = heldout_lexicon(args.every)
    print(f"  {h['n_words']} words  PER={h['per']:.3f}  "
          f"exact={100 * h['exact_match']:.1f}%  "
          f"(morph served {h['morph_served']}, LTS served {h['lts_served']})")
    print("  worst:", ", ".join(f"{w}({p:.2f})" for p, w in h["worst"]))

    print("[2] end-to-end vs MFA ground truth (valid filelist)")
    m = mfa_sentences()
    print(f"  {m['n_sentences']} sentences  PER={m['per_no_sil']:.3f} "
          f"(no-sil) / {m['per_with_sil']:.3f} (with sil)  "
          f"LTS fallbacks={m['lts_fallback_words']}")
    for p, u in m["per_sentence"]:
        print(f"    {u}: {p:.3f}")

    import json
    print(json.dumps({"heldout": {k: v for k, v in h.items() if k != "worst"},
                      "mfa": {k: v for k, v in m.items()
                              if k != "per_sentence"}}))


if __name__ == "__main__":
    main()
