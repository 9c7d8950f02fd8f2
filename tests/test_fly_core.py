"""Unit tests for the NumPy fly kernel vs straightforward oracles.

Pins the semantics called out as hard parts in SURVEY.md §7: WTA threshold
ties retained, deterministic keyword ordering, pack/unpack round-trip,
Hamming popcount equivalence.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pears_fruit_fly_spark.functions.fly import (
    count_vectorize,
    featurize_batch,
    hamming_distance,
    make_projection_matrix,
    pack_signatures,
    unpack_signatures,
    wta_rows,
)


def oracle_wta(mat, k, percent):
    """Reference semantics (fruit_fly/hash.py:99-114): zero strictly below
    the k-th largest; ties at the threshold retained."""
    m, n = mat.shape
    if percent:
        k = int(k * n / 100)
    k = max(1, min(k, n))
    out = mat.copy()
    for i in range(m):
        kth = np.sort(mat[i])[n - k]
        out[i][mat[i] < kth] = 0
    return out


@given(
    st.integers(1, 12),
    st.integers(2, 30),
    st.integers(1, 30),
    st.booleans(),
    st.integers(0, 10_000),
)
@settings(max_examples=60, deadline=None)
def test_wta_matches_oracle(m, n, k, percent, seed):
    rng = np.random.default_rng(seed)
    # ties are common with small-int matrices — exactly the hard case
    mat = rng.integers(0, 5, size=(m, n)).astype(np.float32)
    got = wta_rows(mat, k, percent=percent)
    want = oracle_wta(mat, k, percent=percent)
    np.testing.assert_array_equal(got, want)


def test_wta_keeps_threshold_ties():
    mat = np.array([[3.0, 3.0, 3.0, 1.0]])
    out = wta_rows(mat, 2)
    # all three 3.0s are at/above the 2nd-largest value → all retained
    np.testing.assert_array_equal(out, [[3.0, 3.0, 3.0, 0.0]])


def test_projection_matrix_shape_and_row_weight():
    proj = make_projection_matrix(100, 37, 5, seed=7)
    assert proj.shape == (37, 100)
    assert (proj.sum(axis=1) == 5).all()  # proj_size ones per KC row
    # deterministic across calls
    np.testing.assert_array_equal(proj, make_projection_matrix(100, 37, 5, seed=7))
    assert not np.array_equal(proj, make_projection_matrix(100, 37, 5, seed=8))


@given(st.integers(1, 8), st.integers(1, 130), st.integers(0, 10_000))
@settings(max_examples=40, deadline=None)
def test_pack_unpack_roundtrip(n, kc, seed):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=(n, kc)).astype(np.uint8)
    packed = pack_signatures(bits)
    assert packed.shape == (n, (kc + 63) // 64)
    assert packed.dtype == np.int64
    np.testing.assert_array_equal(unpack_signatures(packed, kc), bits)


def test_hamming_matches_unpacked_xor():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, size=(20, 128)).astype(np.uint8)
    q = rng.integers(0, 2, size=(1, 128)).astype(np.uint8)
    dist = hamming_distance(pack_signatures(bits), pack_signatures(q))
    want = (bits != q).sum(axis=1)
    np.testing.assert_array_equal(dist, want)


def test_count_vectorize():
    counts = count_vectorize([[0, 0, 3], [], [1]], pn_size=4)
    np.testing.assert_array_equal(
        counts, [[2, 0, 0, 1], [0, 0, 0, 0], [0, 1, 0, 0]]
    )


def test_featurize_batch_end_to_end_vs_manual():
    """Full kernel vs a step-by-step re-derivation on a tiny example."""
    pn, kc = 10, 64
    proj = make_projection_matrix(pn, kc, 2, seed=1)
    weights = np.linspace(1.0, 2.0, pn).astype(np.float32)
    tokens = [[0, 0, 1, 5], [9] * 7, []]
    sigs, keywords = featurize_batch(tokens, weights, proj.astype(np.float32),
                                     top_words=3, wta_percent=10.0)
    # manual: counts → weight → doc-WTA(3) → matmul → KC-WTA(10%) → binarize
    counts = count_vectorize(tokens, pn)
    weighted = counts * weights[None, :]
    dwta = wta_rows(weighted, 3)
    kcm = dwta @ proj.T.astype(np.float32)
    kwta = wta_rows(kcm, 10.0, percent=True)
    want = pack_signatures((kwta > 0).astype(np.uint8))
    np.testing.assert_array_equal(sigs, want)
    # keywords: weight desc then term_id asc; doc0 weighted = {0: 2*w0, 1: w1, 5: w5}
    w = weights
    order = sorted([0, 1, 5], key=lambda t: (-(w[t] * (2 if t == 0 else 1)), t))
    assert keywords[0] == order
    assert keywords[2] == []
    # empty doc hashes to all-zero signature
    assert sigs[2].tolist() == [0]


def test_featurize_deterministic_across_batch_splits():
    """Same docs, different batch groupings → identical signatures
    (partition-independence; rank-identity depends on this)."""
    pn, kc = 50, 128
    rng = np.random.default_rng(5)
    proj = make_projection_matrix(pn, kc, 4, seed=2).astype(np.float32)
    weights = rng.uniform(0.5, 3.0, pn).astype(np.float32)
    docs = [list(rng.integers(0, pn, size=rng.integers(1, 200))) for _ in range(40)]
    all_at_once, _ = featurize_batch(docs, weights, proj, 25, 10.0)
    chunked = np.concatenate(
        [featurize_batch(docs[i : i + 7], weights, proj, 25, 10.0)[0]
         for i in range(0, 40, 7)]
    )
    np.testing.assert_array_equal(all_at_once, chunked)


def test_projection_matrix_tiny_vocab_terminates():
    """ADVICE r1: pn_size < proj_size used to spin the chunk loop forever."""
    proj = make_projection_matrix(pn_size=3, kc_size=8, proj_size=8, seed=1)
    assert proj.shape == (8, 3)
    assert (proj.sum(axis=1) > 0).all()  # every KC row still samples PNs
    with pytest.raises(ValueError):
        make_projection_matrix(pn_size=0, kc_size=8, proj_size=4)
