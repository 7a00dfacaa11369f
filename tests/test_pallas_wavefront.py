"""Pallas wavefront kernels vs the oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.models.oracle import oracle_align_dense
from gpuseqalign_tpu.ops.pallas_wavefront import (
    pallas_dense_nw_lg,
    pallas_mlsp_nw_lg,
)

from conftest import random_seq

SPEC = AlignSpec.from_name("nw_lg")


@pytest.mark.parametrize(
    "rows,cols,R,W",
    [(128, 128, 128, 128), (256, 384, 128, 128), (256, 256, 256, 256)],
)
def test_pallas_dense_matches_oracle(blosum62, rng, rows, cols, R, W):
    Y = random_seq(rng, rows)
    X = random_seq(rng, cols)
    H_ref = oracle_align_dense(SPEC, blosum62, Y, X, -11)["H"]
    H = np.asarray(
        pallas_dense_nw_lg(
            jnp.asarray(blosum62), jnp.asarray(Y), jnp.asarray(X),
            jnp.int32(-11), R=R, W=W, interpret=True,
        )
    )
    np.testing.assert_array_equal(H[: rows + 1, : cols + 1], H_ref)


@pytest.mark.parametrize(
    "rows,cols,R,TW,W",
    [
        (256, 384, 128, 128, 128),
        (512, 512, 256, 256, 256),
        (128, 1024, 128, 512, 256),
    ],
)
def test_pallas_mlsp_matches_oracle(blosum62, rng, rows, cols, R, TW, W):
    Y = random_seq(rng, rows)
    X = random_seq(rng, cols)
    H_ref = oracle_align_dense(SPEC, blosum62, Y, X, -11)["H"]
    hrow, hcol = pallas_mlsp_nw_lg(
        jnp.asarray(blosum62), jnp.asarray(Y), jnp.asarray(X),
        jnp.int32(-11), R=R, W=W, TW=TW, interpret=True,
    )
    hrow = np.asarray(hrow)
    hcol = np.asarray(hcol)
    B = rows // R
    tcols = cols // TW
    for b in range(B - 1):
        np.testing.assert_array_equal(hrow[b, : cols + 1], H_ref[(b + 1) * R])
    for b in range(B):
        for jt in range(1, tcols):
            np.testing.assert_array_equal(
                hcol[b, jt].reshape(R),
                H_ref[b * R + 1: (b + 1) * R + 1, jt * TW],
            )
