"""v2 multi-chain wavefront kernel vs the oracle (interpret mode on CPU).

The echelon/cross-chain dataflow plus the in-kernel packed substitution
lookup are the risky parts; sizes below cover chain counts 1/2/4, row
padding (rows not a multiple of K*R), rectangular shapes, and the full
align_mlsp_v2 wrapper path through the reference sparse layout with
sparse traceback/hash parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpuseqalign_tpu.core.types import AlgInput, AlgParams, AlgResult, AlignSpec, Status
from gpuseqalign_tpu.models.oracle import (
    oracle_align_dense,
    oracle_hash_dense,
    oracle_trace_dense,
)
from gpuseqalign_tpu.ops.pallas_wavefront2 import (
    align_mlsp_v2,
    pallas_mlsp_nw_lg_v2,
)
from gpuseqalign_tpu.trace.sparse import hash_sparse, trace_sparse

from conftest import random_seq

SPEC = AlignSpec.from_name("nw_lg")


def _pad_to(n, m):
    return ((n + m - 1) // m) * m


@pytest.mark.parametrize(
    "rows,cols,R,W,TW,K",
    [
        (300, 800, 128, 128, 128, 2),
        (260, 700, 128, 128, 256, 2),
        (512, 1200, 128, 128, 256, 4),
        (520, 1111, 256, 256, 512, 2),
        (250, 900, 128, 128, 512, 1),
    ],
)
def test_v2_matches_oracle(blosum62, rng, rows, cols, R, W, TW, K):
    B = _pad_to(-(-rows // R), K)
    rows_p = B * R
    cols_p = _pad_to(cols, TW)
    Y = np.zeros(1 + rows_p, np.int32)
    Y[1: 1 + rows] = random_seq(rng, rows)[1:]
    X = np.zeros(1 + cols_p, np.int32)
    X[1: 1 + cols] = random_seq(rng, cols)[1:]
    H_ref = oracle_align_dense(SPEC, blosum62, Y, X, -11)["H"]
    hrow, hcol = pallas_mlsp_nw_lg_v2(
        jnp.asarray(blosum62), jnp.asarray(Y), jnp.asarray(X),
        jnp.int32(-11), R=R, W=W, TW=TW, K=K, interpret=True,
    )
    hrow = np.asarray(hrow)
    hcol = np.asarray(hcol)
    for b in range(B - 1):
        np.testing.assert_array_equal(
            hrow[b, : cols_p + 1], H_ref[(b + 1) * R], err_msg=f"hrow b={b}"
        )
    for b in range(B):
        for jt in range(1, cols_p // TW):
            np.testing.assert_array_equal(
                hcol[b, jt].reshape(R),
                H_ref[b * R + 1: (b + 1) * R + 1, jt * TW],
                err_msg=f"hcol b={b} jt={jt}",
            )


def test_align_mlsp_v2_end_to_end(blosum62, rng):
    """Wrapper path: sparse layout + traceback + hash parity vs oracle."""
    Y = random_seq(rng, 333)
    X = random_seq(rng, 777)

    nw = AlgInput()
    nw.subst = blosum62
    nw.substsz = blosum62.shape[0]
    nw.seqY, nw.seqX = Y, X
    nw.adjrows, nw.adjcols = len(Y), len(X)
    nw.gapo_cost = -11
    nw.spec = SPEC

    res = AlgResult()
    tile_h, tile_w = 128, 256
    trows = -(-333 // tile_h)
    tcols = -(-777 // tile_w)
    stat = align_mlsp_v2(
        AlgParams({}), nw, res, tile_h, tile_w, trows, tcols, interpret=True
    )
    assert stat == Status.success

    mats = oracle_align_dense(SPEC, blosum62, Y, X, -11)
    assert res.align_cost == int(mats["H"][-1, -1])

    assert trace_sparse(nw, res, False) == Status.success
    transcript, thash, _ = oracle_trace_dense(SPEC, mats, blosum62, Y, X, -11)
    assert res.edit_trace == transcript
    assert res.trace_hash == thash

    assert hash_sparse(nw, res) == Status.success
    assert res.score_hash == oracle_hash_dense(mats["H"])
