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

    # -- vectorized batch Viterbi (VERDICT r2 #4) ---------------------------
    # FNV-ish odd multiplier: per-position polynomial hash in uint64 with
    # wraparound. searchsorted over uint64 is ~10x faster than over np.void
    # byte keys; exactness is preserved by verifying every hash hit against
    # the actual codepoints (collisions are detected at table build too).
    _HASH_P = 0x100000001B3

    def _piece_tables(self):
        """Trie-shaped lookup tables for the batch kernel:

        * per piece length l: (sorted chained-hash keys, codepoint rows for
          exact hit verification, GLOBAL piece ids)
        * per prefix depth l: sorted chained hashes of all distinct piece
          PREFIXES of length l — the vectorized trie: a window start whose
          depth-l prefix hash is absent can never match any longer piece,
          so it drops out of all deeper probes (prefix pruning)
        * score_lut: global piece id -> score, with slot 0 = -inf (no
          piece) and the last slot = unk, so the DP can gather scores from
          a zero-initialized uint32 index matrix (no O(N*B*L) -inf fill)
        """
        if getattr(self, "_tables", None) is not None:
            return self._tables
        import numpy as np

        by_len: dict[int, list[tuple[str, float]]] = {}
        for p, s in self.scores.items():
            by_len.setdefault(len(p), []).append((p, s))
        P = np.uint64(self._HASH_P)
        per_len: dict[int, tuple] = {}
        prefix_hashes: dict[int, list[np.ndarray]] = {}
        score_list: list[float] = [float("-inf")]
        for length in sorted(by_len):
            items = by_len[length]
            cps = np.frombuffer(
                "".join(p for p, _ in items).encode("utf-32-le"), dtype=np.uint32
            ).reshape(len(items), length)
            with np.errstate(over="ignore"):
                h = np.zeros(len(items), dtype=np.uint64)
                for i in range(length):
                    h = h * P + cps[:, i].astype(np.uint64)
                    prefix_hashes.setdefault(i + 1, []).append(h.copy())
            gids = np.arange(
                len(score_list), len(score_list) + len(items), dtype=np.uint32
            )
            score_list.extend(s for _, s in items)
            order = np.argsort(h, kind="stable")
            keys, cps, gids = h[order], cps[order], gids[order]
            if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
                # two distinct pieces hash-collide (astronomically rare):
                # disambiguation would need per-key chains — refuse loudly
                # rather than ever returning a wrong segmentation
                raise RuntimeError(
                    "piece hash collision in vocab; use encode_as_pieces"
                )
            per_len[length] = (keys, cps, gids)
        unk_id = len(score_list)
        score_list.append(self.unk_score)
        prefixes = {
            depth: np.unique(np.concatenate(parts))
            for depth, parts in prefix_hashes.items()
        }
        # word-unit factorization precondition: no piece may contain an
        # interior "▁" (pieces then never cross word boundaries — the
        # standard SentencePiece split_by_whitespace contract); checked
        # against the ACTUAL vocab, generic path used otherwise
        self._interior_space = any(SPACE in p[1:] for p in self.scores)
        self._tables = (
            per_len,
            prefixes,
            np.asarray(score_list, dtype=np.float64),
            unk_id,
        )
        return self._tables

    def encode_batch(self, texts: list[str]) -> list[list[str]]:
        """Batch Viterbi: same segmentation as encode_as_pieces per text
        (parity-tested), but vectorized (the r2 perf-weak finding, VERDICT
        r2 #4). Two stacked accelerations:

        1. Word-unit factorization: when NO piece has an interior "▁"
           (true of standard SentencePiece models — split_by_whitespace —
           and checked against the actual vocab), no piece can cross a word
           boundary, so the optimal segmentation is the concatenation of
           per-"▁word"-unit optima. Units are deduplicated across the batch
           AND memoized across batches (Zipf text repeats its head words
           constantly), so the DP only ever runs on NOVEL units.
        2. Array Viterbi over the (short) units: chained-hash trie matching
           with prefix pruning + a NumPy DP across the whole unit batch.

        Tie order preserved: candidate lengths are stacked longest-first and
        argmax takes the first maximum, which is exactly the 'longer piece
        wins exact score ties' rule of the scalar path."""
        normalized = [self.normalize(t) for t in texts]
        out: list[list[str] | None] = [None] * len(texts)
        todo = [(i, s) for i, s in enumerate(normalized) if s]
        for i, s in enumerate(normalized):
            if not s:
                out[i] = []
        if not todo:
            return [o if o is not None else [] for o in out]
        self._piece_tables()

        if not self._interior_space:
            cache = getattr(self, "_unit_cache", None)
            if cache is None:
                cache = self._unit_cache = {}
            elif len(cache) > 500_000:
                cache.clear()
            # split each normalized doc into "▁word" units (normalize
            # guarantees the dummy-prefix "▁" lead, so parts[0] == "")
            doc_units = [[SPACE + w for w in s.split(SPACE)[1:]] for _, s in todo]
            novel = sorted(
                {u for units in doc_units for u in units if u not in cache}
            )
            if novel:
                for u, p in zip(novel, self._viterbi_batch(novel)):
                    cache[u] = p
            for (oi, _), units in zip(todo, doc_units):
                pieces: list[str] = []
                for u in units:
                    pieces.extend(cache[u])
                out[oi] = pieces
            return [o if o is not None else [] for o in out]

        for (oi, _), pieces in zip(todo, self._viterbi_batch([s for _, s in todo])):
            out[oi] = pieces
        return [o if o is not None else [] for o in out]

    def _viterbi_batch(self, strings: list[str]) -> list[list[str]]:
        """Array Viterbi over ALREADY-NORMALIZED non-empty strings."""
        import numpy as np

        out: list[list[str]] = [[] for _ in strings]
        todo = list(enumerate(strings))
        per_len, prefixes, score_lut, unk_id = self._piece_tables()
        # length 1 always participates: even a vocab with NO single-char
        # pieces needs the single-char unk fallback slot (review finding)
        all_lengths = set(per_len) | {1}
        lengths = sorted(all_lengths, reverse=True)  # longest-first (ties)
        NEG = float("-inf")

        # Sub-batches bound the O(B x N x L) index-matrix memory while
        # amortizing the per-position DP overhead across many strings.
        # Length-sort first so every chunk pads only to ITS members' max
        # length: one megabyte-long unbroken token (minified JS, base64)
        # then rides a B=1 chunk instead of inflating a 64-wide chunk to
        # (1e6+1, 64, L) arrays and OOMing the Python worker (review
        # finding). out[] is keyed by original index, so order is free.
        todo.sort(key=lambda t: len(t[1]))
        CELLS = 2_000_000  # B x N budget for the index matrix
        s0 = 0
        while s0 < len(todo):
            B = min(16384, len(todo) - s0)
            # ascending lengths: the chunk's pad width is its LAST member's
            while B > 1 and len(todo[s0 + B - 1][1]) * B > CELLS:
                B = max(1, min(B - 1, CELLS // len(todo[s0 + B - 1][1])))
            chunk = todo[s0 : s0 + B]
            s0 += B
            B = len(chunk)
            lens = np.asarray([len(s) for _, s in chunk], dtype=np.int64)
            N = int(lens.max())
            cp = np.zeros((B, N), dtype=np.uint32)
            for bi, (_, s) in enumerate(chunk):
                cp[bi, : len(s)] = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32
                )
            # T_idx[i, bi, li] = GLOBAL id of the piece of length lengths[li]
            # ending at position i (0 = no piece; unk_id = single-char unk).
            # A zero-initialized index matrix + score_lut gather replaces the
            # old O(N*B*L) -inf fill; end-aligned so the DP body needs no
            # per-length shifting.
            L = len(lengths)
            li_of = {length: L - 1 - a
                     for a, length in enumerate(sorted(all_lengths))}
            T_idx = np.zeros((N + 1, B, L), dtype=np.uint32)
            P = np.uint64(self._HASH_P)
            cp_flat = cp.ravel()
            cpu_flat = cp_flat.astype(np.uint64)
            # vectorized trie walk, depth-ascending with prefix pruning:
            # alive = flat positions b*N+j whose depth-(l-1) prefix is still
            # a prefix of some piece; each depth extends the chained hash by
            # ONE multiply-add over only the surviving starts
            alive_b = np.repeat(np.arange(B, dtype=np.int64), N)
            alive_j = np.tile(np.arange(N, dtype=np.int64), B)
            keep0 = alive_j < lens[alive_b]
            alive_b, alive_j = alive_b[keep0], alive_j[keep0]
            wkey = np.zeros(alive_b.size, dtype=np.uint64)
            for depth in range(1, min(max(lengths), N) + 1):
                pos = alive_j + (depth - 1)
                in_range = pos < lens[alive_b]
                if not in_range.all():
                    alive_b = alive_b[in_range]
                    alive_j = alive_j[in_range]
                    wkey = wkey[in_range]
                    pos = pos[in_range]
                if alive_b.size == 0:
                    break
                with np.errstate(over="ignore"):
                    wkey = wkey * P + cpu_flat[alive_b * N + pos]
                tab = per_len.get(depth)
                if tab is not None:
                    keys, piece_cps, gids = tab
                    idx = np.searchsorted(keys, wkey)
                    idx_c = np.minimum(idx, len(keys) - 1)
                    hit = keys[idx_c] == wkey
                    if depth > 1 and hit.any():
                        # exact verification of hash hits (collision safety)
                        hsel = np.flatnonzero(hit)
                        rows = piece_cps[idx_c[hsel]]
                        ok = np.ones(hsel.size, dtype=bool)
                        base = alive_b[hsel] * N + alive_j[hsel]
                        for i2 in range(depth):
                            ok &= cp_flat[base + i2] == rows[:, i2]
                        hit[hsel[~ok]] = False
                    li = li_of[depth]
                    hs = np.flatnonzero(hit)
                    T_idx[alive_j[hs] + depth, alive_b[hs], li] = gids[idx_c[hs]]
                    if depth == 1:
                        # unk fallback for uncovered single characters
                        ms = np.flatnonzero(~hit)
                        T_idx[alive_j[ms] + 1, alive_b[ms], li] = unk_id
                elif depth == 1:
                    # vocab has no single-char pieces at all: EVERY char
                    # needs the unk fallback (review finding — otherwise
                    # unreachable positions backtrack into wrong pieces)
                    T_idx[alive_j + 1, alive_b, li_of[1]] = unk_id
                # prefix pruning: drop starts whose depth-prefix matches no
                # piece prefix (false-positive hash keeps are harmless —
                # full-piece hits above are exactly verified)
                ptab = prefixes.get(depth)
                if ptab is None:
                    break
                pidx = np.minimum(np.searchsorted(ptab, wkey), len(ptab) - 1)
                palive = ptab[pidx] == wkey
                alive_b = alive_b[palive]
                alive_j = alive_j[palive]
                wkey = wkey[palive]
            best = np.full((B, N + 1), NEG, dtype=np.float64)
            best[:, 0] = 0.0
            back = np.zeros((B, N + 1), dtype=np.int32)
            lengths_arr = np.asarray(lengths, dtype=np.int64)
            rng_b = np.arange(B)
            max_len = int(lengths_arr.max())
            for i in range(1, N + 1):
                # candidates (B, L): best at each piece's start + its score;
                # lengths are ordered DESC so first-argmax keeps the tie rule
                starts_i = i - lengths_arr
                cand = best[:, np.maximum(starts_i, 0)] + score_lut[T_idx[i]]
                if i < max_len:
                    cand[:, starts_i < 0] = NEG
                pick = np.argmax(cand, axis=1)  # first max = longest piece
                best[:, i] = cand[rng_b, pick]
                back[:, i] = lengths_arr[pick]
            for bi, (oi, s) in enumerate(chunk):
                pieces: list[str] = []
                i = len(s)
                while i > 0:
                    ln = int(back[bi, i])
                    if ln <= 0:  # defensive: unreachable position
                        ln = 1
                    pieces.append(s[i - ln : i])
                    i -= ln
                pieces.reverse()
                out[oi] = pieces
        return out


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
