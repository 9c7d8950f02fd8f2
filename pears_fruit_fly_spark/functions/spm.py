"""Pure-Python SentencePiece *unigram* inference (no sentencepiece dep).

The reference featurizes web text with a pretrained SPM unigram model
(ref: fruit_fly/hash.py:27-33 loads spm/spmcc.model; hash.py:248
``sp.encode_as_pieces(doc)``), and its ``.vocab`` export (piece \\t logprob,
e.g. spm/spmcc.vocab — 20k pieces) carries everything unigram INFERENCE
needs: segmentation = argmax over piece sequences of the summed piece
logprobs. This module re-implements that inference from the published model
semantics so the engine can hash real web text in environments without the
sentencepiece library (SURVEY.md §7 gap F1, VERDICT r1 #6).

Matched semantics (SentencePiece defaults for a unigram model):

* normalization: whitespace runs collapsed, text stripped, a dummy-prefix
  space prepended, spaces escaped to U+2581 "▁" (sentencepiece
  normalizer defaults: remove_extra_whitespaces, add_dummy_prefix,
  escape_whitespaces). NFKC is applied via unicodedata — identity on ASCII.
* Viterbi decode over the piece vocabulary; a character with no covering
  piece becomes a single-char <unk> surface piece with score
  min_piece_score - 10.0 (sentencepiece's kUnkPenalty).
* control pieces (<unk>, <s>, </s>, score 0 in the .vocab export) are never
  emitted as segmentation pieces.

Deliberate deviation (documented): exact score ties between segmentations
are broken toward the LONGER piece ending at a position (sentencepiece's
tie order is an internal lattice-iteration artifact; with real float
logprobs ties do not occur).
"""

from __future__ import annotations

import unicodedata

SPACE = "▁"  # ▁
_CONTROL = {"<unk>", "<s>", "</s>", "<pad>"}
_UNK_PENALTY = 10.0


class UnigramTokenizer:
    """Viterbi piece segmentation over a {piece: logprob} unigram vocab."""

    def __init__(self, scores: dict[str, float]):
        self.scores = {
            p: float(s) for p, s in scores.items() if p not in _CONTROL
        }
        if not self.scores:
            raise ValueError("empty piece vocabulary")
        self.max_len = max(len(p) for p in self.scores)
        self.unk_score = min(self.scores.values()) - _UNK_PENALTY

    # -- normalization ----------------------------------------------------
    @staticmethod
    def normalize(text: str) -> str:
        t = unicodedata.normalize("NFKC", text)
        t = " ".join(t.split())  # strip + collapse whitespace runs
        if not t:
            return ""
        return SPACE + t.replace(" ", SPACE)  # dummy prefix + escape

    # -- Viterbi ----------------------------------------------------------
    def encode_as_pieces(self, text: str) -> list[str]:
        s = self.normalize(text)
        n = len(s)
        if n == 0:
            return []
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back = [0] * (n + 1)  # start index of the piece ending at i
        best[0] = 0.0
        scores, max_len, unk = self.scores, self.max_len, self.unk_score
        for i in range(1, n + 1):
            # longer pieces first => ties resolve to the longer piece
            for length in range(min(max_len, i), 0, -1):
                j = i - length
                if best[j] == NEG:
                    continue
                piece = s[j:i]
                sc = scores.get(piece)
                if sc is None:
                    if length != 1:
                        continue
                    sc = unk  # single-char unk fallback
                cand = best[j] + sc
                if cand > best[i]:
                    best[i] = cand
                    back[i] = j
        out: list[str] = []
        i = n
        while i > 0:
            j = back[i]
            out.append(s[j:i])
            i = j
        out.reverse()
        return out

    def encode_score(self, text: str) -> float:
        """Total logprob of the Viterbi segmentation (testing hook)."""
        total = 0.0
        for p in self.encode_as_pieces(text):
            total += self.scores.get(p, self.unk_score)
        return total


def parse_spm_vocab_scores(lines) -> dict[str, float]:
    """Parse SentencePiece ``.vocab`` export lines (piece \\t logprob) into
    the {piece: logprob} map (format of the reference's spm/spmcc.vocab).
    Duplicate pieces keep the first (higher-ranked) score; malformed lines
    are skipped."""
    scores: dict[str, float] = {}
    for line in lines:
        line = line.rstrip("\n")
        if not line or "\t" not in line:
            continue
        piece, _, sc = line.partition("\t")
        if not piece or piece in scores:
            continue
        try:
            scores[piece] = float(sc)
        except ValueError:
            continue
    return scores


def load_unigram_tokenizer(vocab_path: str) -> UnigramTokenizer:
    with open(vocab_path, encoding="utf-8") as f:
        return UnigramTokenizer(parse_spm_vocab_scores(f))
