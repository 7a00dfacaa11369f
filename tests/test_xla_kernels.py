"""XLA alignment kernels vs the oracle (bit-exact int32)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.models.oracle import oracle_align_dense
from gpuseqalign_tpu.ops import xla_kernels as xk

from conftest import random_seq

SPECS = ["nw_lg", "nw_ag", "sw_lg", "sw_ag"]
SHAPES = [(1, 1), (1, 40), (40, 1), (33, 77), (128, 128), (130, 250)]


def _pad(seq, n_pad):
    out = np.zeros(1 + n_pad, np.int32)
    out[: len(seq)] = seq
    return out


@pytest.mark.parametrize("spec_name", SPECS)
@pytest.mark.parametrize("kernel", [xk.rowscan_dense, xk.diag_dense])
def test_dense_kernels_match_oracle(blosum62, rng, spec_name, kernel):
    spec = AlignSpec.from_name(spec_name)
    for ny, nx in SHAPES:
        Y = random_seq(rng, ny)
        X = random_seq(rng, nx)
        H_ref = oracle_align_dense(spec, blosum62, Y, X, -11, -2)["H"]
        ny_p = xk.pad_to(ny, 128)
        nx_p = xk.pad_to(nx, 128)
        H = np.asarray(
            kernel(
                jnp.asarray(blosum62),
                jnp.asarray(_pad(Y, ny_p)),
                jnp.asarray(_pad(X, nx_p)),
                jnp.int32(-11),
                jnp.int32(-2),
                kind=spec.kind.value,
                gap=spec.gap.value,
            )
        )[: ny + 1, : nx + 1]
        np.testing.assert_array_equal(H, H_ref, err_msg=f"{spec_name} {ny}x{nx}")


def test_rowscan_mlsp_headers_match_oracle(blosum62, rng):
    spec = AlignSpec.from_name("nw_lg")
    tile_h, tile_w = 16, 24
    ny, nx = 61, 101  # deliberately not tile multiples
    Y = random_seq(rng, ny)
    X = random_seq(rng, nx)
    trows = -(-ny // tile_h)
    tcols = -(-nx // tile_w)
    Yp = _pad(Y, trows * tile_h)
    Xp = _pad(X, tcols * tile_w)
    H_ref = oracle_align_dense(spec, blosum62, Yp, Xp, -11)["H"]

    hrows, hcols = xk.rowscan_mlsp(
        jnp.asarray(blosum62), jnp.asarray(Yp), jnp.asarray(Xp),
        jnp.int32(-11), tile_h=tile_h, tile_w=tile_w, n_blocks=trows,
    )
    hrows = np.asarray(hrows)
    hcols = np.asarray(hcols)
    for it in range(trows):
        np.testing.assert_array_equal(hrows[it], H_ref[it * tile_h])
        for r in range(tile_h):
            for jt in range(tcols):
                assert hcols[it, r, jt] == H_ref[it * tile_h + 1 + r, jt * tile_w]


def test_affine_positive_costs_rejected(blosum62, rng):
    """The XLA dense kernels share the guarded affine domain
    (gapo <= 0 and gape <= 0) with align_pallas_mlsp and the oracle: the
    cummax E-chain silently returns non-Gotoh values for gapo > 0, so
    the wrapper must reject instead (errstep 1, not a wrong baseline)."""
    from conftest import random_seq
    from gpuseqalign_tpu.core.types import AlgInput, AlgParams, AlgResult, Status
    from gpuseqalign_tpu.ops.xla_kernels import align_xla_diag, align_xla_rowscan

    spec = AlignSpec.from_name("nw_ag")
    y, x = random_seq(rng, 8), random_seq(rng, 9)
    nw = AlgInput()
    nw.subst = blosum62
    nw.substsz = blosum62.shape[0]
    nw.seqY, nw.seqX = y, x
    nw.adjrows, nw.adjcols = len(y), len(x)
    nw.gapo_cost, nw.gape_cost = 2, -1
    nw.spec = spec
    for fn in (align_xla_rowscan, align_xla_diag):
        assert fn(AlgParams({}), nw, AlgResult()) == Status.errorInvalidValue
