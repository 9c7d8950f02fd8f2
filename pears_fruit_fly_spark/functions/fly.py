"""Fruit-fly hashing core: pure NumPy, Spark-agnostic, unit-testable.

Semantics re-derived from the reference (cited per function); this is a
re-implementation against published behavior, not a copy. The batch functions
here are what the Spark layer calls inside Arrow-batched pandas UDFs — one
BLAS matmul per ~2k-row batch, mirroring the reference's 2000-row matrix
chunking (ref: fruit_fly/hash.py:121,136).

Determinism notes (load-bearing for rank-identity across partitions/runs):

* Winner-take-all keeps every value >= the k-th largest per row. The reference
  computes the k-th threshold via argpartition and zeroes strictly-smaller
  values (ref: fruit_fly/hash.py:99-114), so threshold ties are ALL retained —
  output is independent of argpartition's unstable order. We reproduce that
  exact semantic directly.
* Keyword extraction is pinned to (weight desc, term_id asc) ordering; the
  reference's np.argsort tie order is unstable (ref: fruit_fly/hash.py:145-150)
  so we deviate deliberately to a deterministic total order.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Winner-take-all
# ---------------------------------------------------------------------------


def wta_rows(mat: np.ndarray, k: int, percent: bool = False) -> np.ndarray:
    """Row-wise winner-take-all: zero entries below the k-th largest value.

    Values equal to the k-th largest are all kept (reference semantics,
    fruit_fly/hash.py:99-114). Returns a new array; input is not mutated.
    `percent=True` interprets k as a percentage of the row width
    (fruit_fly/hash.py:103-104).
    """
    m, n = mat.shape
    if percent:
        k = int(k * n / 100)
    k = max(1, min(k, n))
    out = mat.copy()
    if k >= n:
        return out
    # k-th largest per row without a full sort: O(n) selection.
    kth = np.partition(mat, n - k, axis=1)[:, n - k]
    out[mat < kth[:, None]] = 0
    return out


# ---------------------------------------------------------------------------
# Projection matrix
# ---------------------------------------------------------------------------


def make_projection_matrix(
    pn_size: int, kc_size: int, proj_size: int, seed: int = 7
) -> np.ndarray:
    """Binary (kc_size x pn_size) uint8 projection via the shuffle-chunk scheme.

    Scheme per the reference's generator (fruit_fly/mkprojections.py:41-63):
    shuffle 0..pn_size-1, slice into proj_size-sized chunks, one chunk per KC
    row; reshuffle and continue until kc_size rows exist. Seeded with
    np.random.default_rng for reproducibility (the reference is unseeded; we
    pin seed=7 as a fixture constant, FIXTURES.md §3).
    """
    if pn_size < 1 or kc_size < 1 or proj_size < 1:
        raise ValueError(
            f"pn_size/kc_size/proj_size must be >= 1, got "
            f"({pn_size}, {kc_size}, {proj_size})"
        )
    # clamp: a vocab smaller than proj_size would make the chunk loop empty
    # and the while-loop spin forever (ADVICE r1)
    proj_size = min(proj_size, pn_size)
    rng = np.random.default_rng(seed)
    proj = np.zeros((kc_size, pn_size), dtype=np.uint8)
    row = 0
    while row < kc_size:
        perm = rng.permutation(pn_size)
        for start in range(0, pn_size - proj_size + 1, proj_size):
            if row >= kc_size:
                break
            proj[row, perm[start : start + proj_size]] = 1
            row += 1
    return proj


def write_projections_text(proj: np.ndarray, path: str) -> None:
    """Write the reference's `.projs` text format: one KC row per line,
    space-separated PN ids (format of fruit_fly/mkprojections.py:54-62)."""
    with open(path, "w") as f:
        for row in proj:
            f.write(" ".join(str(int(i)) for i in np.flatnonzero(row)) + "\n")


def read_projections_text(path: str, pn_size: int) -> np.ndarray:
    """Read a `.projs` file back into a (kc x pn) uint8 matrix (reader
    semantics of fruit_fly/hash.py:56-71: line order = KC id)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            rows.append([int(n) for n in line.split()])
    proj = np.zeros((len(rows), pn_size), dtype=np.uint8)
    for kc, pns in enumerate(rows):
        proj[kc, pns] = 1
    return proj


# ---------------------------------------------------------------------------
# Signature packing / Hamming
# ---------------------------------------------------------------------------


def pack_signatures(bits: np.ndarray) -> np.ndarray:
    """Pack a (n x kc) 0/1 matrix into (n x ceil(kc/64)) int64 words.

    Bit layout: KC j lives in word j//64, bit j%64 (little-endian bit order).
    Int64 (not uint64) so the words round-trip through Spark LongType; XOR +
    popcount on two's-complement longs still computes Hamming distance.
    """
    n, kc = bits.shape
    pad = (-kc) % 64
    if pad:
        bits = np.concatenate([bits, np.zeros((n, pad), dtype=bits.dtype)], axis=1)
    packed = np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")
    return packed.view(np.uint64).astype(np.int64)


def unpack_signatures(words: np.ndarray, kc_size: int) -> np.ndarray:
    """Inverse of pack_signatures → (n x kc_size) uint8 matrix."""
    as_bytes = words.astype(np.int64).view(np.uint8)
    bits = np.unpackbits(as_bytes.reshape(words.shape[0], -1), axis=1, bitorder="little")
    return bits[:, :kc_size]


def hamming_distance(sigs: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Popcount(XOR) Hamming distance of each packed row vs a packed query.

    Equivalent to the reference's per-query hamming_cdist
    (web_map/umap/utils.py:139-142) on the unpacked bits.
    """
    x = np.bitwise_xor(sigs.view(np.uint64), query.view(np.uint64))
    return np.unpackbits(x.view(np.uint8), axis=1).sum(axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# Fused featurize-and-hash (the batch kernel)
# ---------------------------------------------------------------------------


def count_vectorize(tokens_per_doc: list[list[int]], pn_size: int) -> np.ndarray:
    """Dense (n_docs x pn_size) float32 term-frequency matrix from id lists.

    Equivalent to CountVectorizer with an explicit vocabulary
    (ref: fruit_fly/hash.py:198,252) — ids are pre-mapped, so this is a
    bincount per row.
    """
    n = len(tokens_per_doc)
    counts = np.zeros((n, pn_size), dtype=np.float32)
    for i, ids in enumerate(tokens_per_doc):
        if ids:
            binc = np.bincount(np.asarray(ids, dtype=np.int64), minlength=pn_size)
            counts[i] = binc[:pn_size]
    return counts


def featurize_counts(
    counts: np.ndarray,
    weights: np.ndarray,
    projection: np.ndarray,
    top_words: int,
    wta_percent: float,
    n_keywords: int = 10,
) -> tuple[np.ndarray, list[list[int]]]:
    """featurize_batch starting from a precomputed dense counts matrix
    (n_docs x pn) — the fast path used by the Spark UDF, which builds counts
    with one vectorized bincount instead of per-doc loops."""
    weighted = counts * weights[None, :].astype(np.float32)
    doc_wta = wta_rows(weighted, top_words, percent=False)

    kc = doc_wta @ projection.T.astype(np.float32)
    kc_wta = wta_rows(kc, wta_percent, percent=True)
    bits = (kc_wta > 0).astype(np.uint8)
    sigs = pack_signatures(bits)

    keywords: list[list[int]] = []
    for row in weighted:
        nz = np.flatnonzero(row)
        if nz.size == 0:
            keywords.append([])
            continue
        # deterministic top-n: weight desc, term_id asc
        order = nz[np.lexsort((nz, -row[nz]))][:n_keywords]
        keywords.append(order.astype(int).tolist())
    return sigs, keywords


def featurize_batch(
    tokens_per_doc: list[list[int]],
    weights: np.ndarray,
    projection: np.ndarray,
    top_words: int,
    wta_percent: float,
    n_keywords: int = 10,
) -> tuple[np.ndarray, list[list[int]]]:
    """counts → logprob-weight → doc-WTA → project → KC-WTA → binarize → pack.

    The full per-document pipeline of the reference's hash path
    (fruit_fly/hash.py:252-263 scalar; fruit_fly/utils.py:25-45 batched),
    fused into one call over an Arrow batch:

    1. weighted = counts * weights          (hash.py:255, weights per F3)
    2. doc-WTA keep top_words               (hash.py:256, percent=False)
    3. kc = weighted_wta @ projection.T     (fruit_fly/utils.py:25-27)
    4. KC-WTA keep wta_percent% of KCs      (fruit_fly/utils.py:43)
    5. binarize (>0) and pack to int64      (fruit_fly/utils.py:44)

    Returns (packed_signatures int64 (n x words), keywords list of top-n
    term-id lists ordered weight desc / term_id asc).
    """
    pn_size = projection.shape[1]
    counts = count_vectorize(tokens_per_doc, pn_size)
    return featurize_counts(
        counts, weights, projection, top_words, wta_percent, n_keywords
    )
