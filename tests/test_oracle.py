"""Oracle: vectorized dense fill vs the slow per-cell loop, traceback, hash."""

import numpy as np
import pytest

from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.models.oracle import (
    align_cost_of,
    oracle_align_dense,
    oracle_align_slow,
    oracle_hash_dense,
    oracle_trace_dense,
)
from gpuseqalign_tpu.core.transcript import expand_transcript

from conftest import random_seq

SPECS = ["nw_lg", "nw_ag", "sw_lg", "sw_ag"]


@pytest.mark.parametrize("spec_name", SPECS)
@pytest.mark.parametrize("shape", [(1, 1), (1, 17), (17, 1), (8, 8), (13, 29), (40, 33)])
def test_vectorized_matches_slow(blosum62, rng, spec_name, shape):
    spec = AlignSpec.from_name(spec_name)
    ny, nx = shape
    Y = random_seq(rng, ny)
    X = random_seq(rng, nx)
    fast = oracle_align_dense(spec, blosum62, Y, X, -11, -2)
    slow = oracle_align_slow(spec, blosum62, Y, X, -11, -2)
    np.testing.assert_array_equal(fast["H"], slow["H"])
    if "E" in slow:
        # E/F only compared where they can influence H (not -inf boundary).
        np.testing.assert_array_equal(
            fast["E"][1:, 1:], slow["E"][1:, 1:]
        )
        np.testing.assert_array_equal(
            fast["F"][1:, 1:], slow["F"][1:, 1:]
        )
    if "best" in slow:
        np.testing.assert_array_equal(fast["best"], slow["best"])


def test_nw_lg_recurrence_hand_example():
    # 2-letter alphabet: match +2, mismatch -1, gap -2.
    subst = np.array([[2, -1], [-1, 2]], dtype=np.int32)
    Y = np.array([0, 0, 1], dtype=np.int32)  # header + "ab"
    X = np.array([0, 0, 0, 1], dtype=np.int32)  # header + "aab"
    spec = AlignSpec.from_name("nw_lg")
    H = oracle_align_dense(spec, subst, Y, X, -2)["H"]
    expected = np.array(
        [
            [0, -2, -4, -6],
            [-2, 2, 0, -2],
            [-4, 0, 1, 2],
        ],
        dtype=np.int32,
    )
    np.testing.assert_array_equal(H, expected)


def test_nw_lg_trace_hand_example():
    subst = np.array([[2, -1], [-1, 2]], dtype=np.int32)
    Y = np.array([0, 0, 1], dtype=np.int32)
    X = np.array([0, 0, 0, 1], dtype=np.int32)
    spec = AlignSpec.from_name("nw_lg")
    mats = oracle_align_dense(spec, subst, Y, X, -2)
    transcript, thash, cells = oracle_trace_dense(
        spec, mats, subst, Y, X, -2, debug=True
    )
    # The reference walk is a GREEDY MAX-VALUED-NEIGHBOR descent
    # (ref: src/nwtrace1_plain.cpp:46-77 compares raw neighbor values, not
    # recurrence attainment), so from (2,3)=2 it steps LEFT to (2,2)=1
    # (1 > diag 0), then diagonally: transcript "1=1X1D", not "1=1D1=".
    assert transcript == "1=1X1D"
    # Debug cells in path order from (0,0) to bottom-right.
    assert cells == [0, 2, 1, 2]
    assert thash != 0


@pytest.mark.parametrize("spec_name", SPECS)
def test_trace_transcript_consistent(blosum62, rng, spec_name):
    """Expanded transcript must replay to the align cost and walk the full
    path (NW) / a non-negative-scoring local path (SW)."""
    spec = AlignSpec.from_name(spec_name)
    for trial in range(5):
        Y = random_seq(rng, int(rng.integers(1, 60)))
        X = random_seq(rng, int(rng.integers(1, 60)))
        mats = oracle_align_dense(spec, blosum62, Y, X, -11, -2)
        transcript, _, _ = oracle_trace_dense(
            spec, mats, blosum62, Y, X, -11, -2
        )
        steps = expand_transcript(transcript)
        ny = sum(1 for e in steps if e in "=XI")
        nx = sum(1 for e in steps if e in "=XD")
        if spec.kind.value == "nw":
            assert ny == len(Y) - 1
            assert nx == len(X) - 1
        else:
            assert ny <= len(Y) - 1 and nx <= len(X) - 1
        # Replay the path score. Only meaningful for the attainment-based
        # walks (affine): the reference-parity NW_LG walk is a greedy
        # max-neighbor descent whose path may not be an optimal alignment.
        gapo, gape = -11, -2
        affine = spec.gap.value == "affine"
        if spec.kind.value == "nw" and affine:
            i = j = 0
            score = 0
            prev = None
            for e in steps:
                if e in "=X":
                    i += 1
                    j += 1
                    score += int(blosum62[Y[i], X[j]])
                elif e == "I":
                    i += 1
                    score += (
                        gape + (gapo if prev != "I" else 0) if affine else gapo
                    )
                else:
                    j += 1
                    score += (
                        gape + (gapo if prev != "D" else 0) if affine else gapo
                    )
                prev = e
            assert score == align_cost_of(spec, mats), (
                spec_name, transcript, trial
            )


def test_sw_all_negative_empty_trace(rng):
    # A substitution matrix with no positive entries: SW best is 0 at (0,0).
    subst = np.full((4, 4), -3, dtype=np.int32)
    Y = random_seq(rng, 10, letters=4)
    X = random_seq(rng, 12, letters=4)
    spec = AlignSpec.from_name("sw_lg")
    mats = oracle_align_dense(spec, subst, Y, X, -2)
    assert align_cost_of(spec, mats) == 0
    transcript, _, _ = oracle_trace_dense(spec, mats, subst, Y, X, -2)
    assert transcript == ""


def test_hash_dense_includes_headers(blosum62, rng):
    Y = random_seq(rng, 5)
    X = random_seq(rng, 7)
    spec = AlignSpec.from_name("nw_lg")
    H = oracle_align_dense(spec, blosum62, Y, X, -11)["H"]
    from gpuseqalign_tpu.core.hashing import djb2_ints

    assert oracle_hash_dense(H) == djb2_ints(H.ravel().tolist())


def test_lazy_ef_views_match_dense(rng, blosum62):
    """trace/plain.py's lazy E/F reconstructions (used by the dense affine
    traceback so it needs no O(n^2) second fill) must equal the oracle's
    dense E/F on every interior cell."""
    from gpuseqalign_tpu.trace.plain import _LazyE, _LazyF
    from conftest import random_seq

    for spec_name in ("nw_ag", "sw_ag"):
        spec = AlignSpec.from_name(spec_name)
        y = random_seq(rng, 47)
        x = random_seq(rng, 83)
        mats = oracle_align_dense(spec, blosum62, y, x, -11, -2)
        E = _LazyE(mats["H"], -11, -2)
        F = _LazyF(mats["H"], -11, -2)
        for i in range(1, len(y)):
            for j in range(1, len(x)):
                assert E[i, j] == mats["E"][i, j], (spec_name, "E", i, j)
                assert F[i, j] == mats["F"][i, j], (spec_name, "F", i, j)


def test_lazy_ef_border_is_ninf(rng, blosum62):
    """The lazy E/F views must be -inf along BOTH borders like the
    oracle's dense matrices — a finite reconstruction at i == 0 (E) or
    j == 0 (F) lets the debug-mode attainment walk enter the E/F state
    on a header row/col, double-appending the visited cell and diverging
    the dense trace hash from the sparse walk (regression)."""
    from conftest import random_seq
    from gpuseqalign_tpu.core.types import NEG_INF_I32
    from gpuseqalign_tpu.trace.plain import _LazyE, _LazyF

    spec = AlignSpec.from_name("nw_ag")
    y, x = random_seq(rng, 9), random_seq(rng, 11)
    mats = oracle_align_dense(spec, blosum62, y, x, -11, -2)
    E = _LazyE(mats["H"], -11, -2)
    F = _LazyF(mats["H"], -11, -2)
    for j in range(len(x)):
        assert E[0, j] == NEG_INF_I32
        assert F[0, j] == NEG_INF_I32
    for i in range(len(y)):
        assert E[i, 0] == NEG_INF_I32
        assert F[i, 0] == NEG_INF_I32


def test_trace_plain_debug_matches_oracle_affine(rng, blosum62):
    """Dense DEBUG-mode traceback (lazy E/F) must be edit-for-edit and
    hash-for-hash identical to the full-oracle debug walk — including
    paths that reach row 0 / column 0 before (0, 0) (the border case the
    lazy views got wrong once: 128/300 divergences pre-fix)."""
    from gpuseqalign_tpu.core.types import AlgInput, AlgResult, Status
    from gpuseqalign_tpu.trace.plain import trace_plain

    for t in range(60):
        ss = 6
        subst = rng.integers(-5, 9, (ss, ss)).astype(np.int32)
        r, c = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        y = np.zeros(1 + r, np.int32)
        y[1:] = rng.integers(0, ss, r)
        x = np.zeros(1 + c, np.int32)
        x[1:] = rng.integers(0, ss, c)
        spec = AlignSpec.from_name("nw_ag" if t % 2 else "sw_ag")
        gapo, gape = -7, -1
        mats = oracle_align_dense(spec, subst, y, x, gapo, gape)
        tr_o, th_o, _ = oracle_trace_dense(
            spec, mats, subst, y, x, gapo, gape, debug=True
        )
        nw = AlgInput()
        nw.subst = subst
        nw.substsz = ss
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost, nw.gape_cost = gapo, gape
        nw.spec = spec
        nw.score = mats["H"]
        if spec.kind.value == "sw":
            nw.best_i = int(mats["best"][0])
            nw.best_j = int(mats["best"][1])
        res = AlgResult()
        assert trace_plain(nw, res, True) == Status.success
        assert res.edit_trace == tr_o, t
        assert res.trace_hash == th_o, t
