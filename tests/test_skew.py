"""Skew/unskew pad+reshape transforms."""

import numpy as np

from gpuseqalign_tpu.ops.skew import skew_rows, unskew_cols, unskew_rows


def test_skew_rows_indexing():
    rng = np.random.default_rng(0)
    for R, C in [(3, 5), (5, 3), (1, 7), (7, 1), (8, 8), (13, 29)]:
        P = rng.integers(-100, 100, size=(R, C)).astype(np.int32)
        S = skew_rows(np, P)
        assert S.shape == (R + C - 1, C)
        for d in range(R + C - 1):
            for j in range(C):
                if 0 <= d - j < R:
                    assert S[d, j] == P[d - j, j], (d, j)


def test_unskew_rows_roundtrip():
    rng = np.random.default_rng(1)
    for R, C in [(3, 5), (5, 3), (8, 8), (13, 29), (1, 4), (4, 1)]:
        P = rng.integers(-100, 100, size=(R, C)).astype(np.int32)
        S = skew_rows(np, P)
        np.testing.assert_array_equal(unskew_rows(np, S, R), P)


def test_unskew_rows_with_padded_steps():
    # Kernels often pad the step dimension; extra rows must be ignored.
    rng = np.random.default_rng(2)
    R, C = 6, 10
    P = rng.integers(-100, 100, size=(R, C)).astype(np.int32)
    S = skew_rows(np, P)
    S_pad = np.vstack([S, rng.integers(-5, 5, size=(7, C)).astype(np.int32)])
    np.testing.assert_array_equal(unskew_rows(np, S_pad, R), P)


def test_unskew_cols_indexing():
    rng = np.random.default_rng(3)
    R, C = 7, 11
    NS = R + C - 1
    V = rng.integers(-100, 100, size=(NS + 3, R)).astype(np.int32)
    H = unskew_cols(np, V, C)
    assert H.shape == (R, C)
    for r in range(R):
        for u in range(C):
            assert H[r, u] == V[u + r, r]
