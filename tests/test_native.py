"""Native C++ runtime vs Python implementations."""

import numpy as np
import pytest

from gpuseqalign_tpu import native
from gpuseqalign_tpu.core.hashing import djb2_ints
from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.models.oracle import oracle_align_dense, oracle_trace_dense

from conftest import random_seq

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built"
)


def test_native_djb2(rng):
    arr = rng.integers(-(2**31), 2**31 - 1, size=5000, dtype=np.int64).astype(
        np.int32
    )
    assert native.djb2_i32(arr) == djb2_ints(arr.tolist())
    h1 = native.djb2_i32(arr[:100])
    assert native.djb2_i32(arr[100:], h1) == djb2_ints(arr.tolist())


@pytest.mark.parametrize("order", ["row", "diag", "diagrow", "mt_diagrow"])
def test_native_align_orders_match_oracle(blosum62, rng, order):
    spec = AlignSpec.from_name("nw_lg")
    for ny, nx in [(1, 1), (5, 37), (64, 64), (130, 57)]:
        Y = random_seq(rng, ny)
        X = random_seq(rng, nx)
        H_ref = oracle_align_dense(spec, blosum62, Y, X, -11)["H"]
        H = native.align_dense_native(blosum62, Y, X, -11, order, blocksz=16)
        np.testing.assert_array_equal(H, H_ref)


def test_native_trace_matches_python(blosum62, rng):
    spec = AlignSpec.from_name("nw_lg")
    for ny, nx in [(1, 1), (1, 40), (40, 1), (33, 77)]:
        Y = random_seq(rng, ny)
        X = random_seq(rng, nx)
        mats = oracle_align_dense(spec, blosum62, Y, X, -11)
        t_ref, h_ref, _ = oracle_trace_dense(
            spec, mats, blosum62, Y, X, -11, debug=False
        )
        t, h = native.trace_linear_nw_native(mats["H"], Y, X)
        assert t == t_ref
        assert h == h_ref


def test_hash_sparse_native_matches_python(blosum62, rng):
    """The C++ sparse-hash twin must equal the Python rolling recompute
    (both reading stored tile headers) on random inputs, every spec,
    including degenerate shapes and no-mats (pure recompute) mode."""
    import pytest

    from gpuseqalign_tpu import native
    from gpuseqalign_tpu.core.hashing import djb2_array, djb2_init
    from gpuseqalign_tpu.core.types import (
        AlgInput, AlgParams, AlgResult, AlignSpec, Status,
    )
    from gpuseqalign_tpu.ops.pallas_kernels import align_pallas_mlsp
    from gpuseqalign_tpu.trace import sparse as sp

    if not native.available():
        pytest.skip("native library unavailable")

    for t, (name, r, c) in enumerate([
        ("nw_lg", 100, 211), ("nw_ag", 211, 100), ("sw_lg", 64, 64),
        ("sw_ag", 33, 150), ("nw_ag", 0, 40), ("sw_lg", 40, 0),
        ("nw_lg", 0, 0),
    ]):
        spec = AlignSpec.from_name(name)
        gape = -2 if name.endswith("ag") else 0
        y = np.zeros(1 + r, np.int32)
        y[1:] = rng.integers(0, blosum62.shape[0], r)
        x = np.zeros(1 + c, np.int32)
        x[1:] = rng.integers(0, blosum62.shape[0], c)
        nw = AlgInput()
        nw.subst = blosum62
        nw.substsz = blosum62.shape[0]
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost, nw.gape_cost = -11, gape
        nw.spec = spec
        stat = align_pallas_mlsp(
            AlgParams({"tileBy": [32], "tileBx": [64]}), nw, AlgResult()
        )
        assert stat == Status.success
        h_py = djb2_init()
        for row in sp._recompute_rows(nw):
            h_py = djb2_array(row, h_py)
        assert sp._hash_sparse_value(nw) == h_py, (t, name)
        # No-mats mode (pure recompute) agrees too.
        nw.tileHrowMat = None
        nw.tileHcolMat = None
        h_py2 = djb2_init()
        for row in sp._recompute_rows(nw):
            h_py2 = djb2_array(row, h_py2)
        assert sp._hash_sparse_value(nw) == h_py2, (t, name, "no-mats")
