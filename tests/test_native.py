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
