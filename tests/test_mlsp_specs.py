"""Sparse (mlsp) path for every spec: cost, traceback, hash vs the dense
oracle. NW_LG is reference parity; NW_AG / SW_LG / SW_AG are capability
extensions carrying (F-row, E-col) affine headers and SW argmax through
the same tile-header layout (BASELINE.json configs 3-4)."""

import numpy as np
import pytest

from gpuseqalign_tpu.core.types import AlgInput, AlgParams, AlgResult, AlignSpec, Status
from gpuseqalign_tpu.models.oracle import (
    align_cost_of,
    oracle_align_dense,
    oracle_hash_dense,
    oracle_trace_dense,
)
from gpuseqalign_tpu.ops.pallas_kernels import align_pallas_mlsp
from gpuseqalign_tpu.trace.sparse import hash_sparse, trace_sparse

from conftest import random_seq

SPECS = ["nw_lg", "nw_ag", "sw_lg", "sw_ag"]
SIZES = [(300, 700), (64, 1000), (513, 513), (1, 50), (50, 1)]


@pytest.mark.parametrize("spec_name", SPECS)
@pytest.mark.parametrize("rows,cols", SIZES)
def test_mlsp_matches_oracle(blosum62, rng, spec_name, rows, cols):
    spec = AlignSpec.from_name(spec_name)
    gapo, gape = -11, -2
    y = random_seq(rng, rows)
    x = random_seq(rng, cols)

    nw = AlgInput()
    nw.subst = blosum62
    nw.substsz = blosum62.shape[0]
    nw.seqY, nw.seqX = y, x
    nw.adjrows, nw.adjcols = len(y), len(x)
    nw.gapo_cost, nw.gape_cost = gapo, gape
    nw.spec = spec

    res = AlgResult()
    stat = align_pallas_mlsp(
        AlgParams({"tileBy": [128], "tileBx": [256]}), nw, res
    )
    assert stat == Status.success

    mats = oracle_align_dense(spec, blosum62, y, x, gapo, gape)
    assert res.align_cost == align_cost_of(spec, mats)
    if spec_name.startswith("sw"):
        assert (nw.best_i, nw.best_j) == tuple(int(v) for v in mats["best"])

    assert trace_sparse(nw, res, False) == Status.success
    transcript, thash, _ = oracle_trace_dense(
        spec, mats, blosum62, y, x, gapo, gape
    )
    assert res.edit_trace == transcript
    assert res.trace_hash == thash

    assert hash_sparse(nw, res) == Status.success
    assert res.score_hash == oracle_hash_dense(mats["H"])


def test_sparse_hash_reads_stored_headers(blosum62, rng):
    """The sparse score hash must be a REAL kernel check: it substitutes
    the kernel-stored tile-header values into its rolling recompute
    (reference intent, src/nwtrace2_sparse.cpp:295-309), so a kernel
    store bug flips the hash instead of vanishing into a from-scratch
    recompute. For a correct kernel the stored values equal the
    recomputed ones, so the hash stays byte-identical to the dense one
    (asserted by every test above)."""
    spec = AlignSpec.from_name("nw_lg")
    y, x = random_seq(rng, 130), random_seq(rng, 175)
    nw = AlgInput()
    nw.subst = blosum62
    nw.substsz = blosum62.shape[0]
    nw.seqY, nw.seqX = y, x
    nw.adjrows, nw.adjcols = len(y), len(x)
    nw.gapo_cost, nw.gape_cost = -11, 0
    nw.spec = spec
    res = AlgResult()
    assert align_pallas_mlsp(
        AlgParams({"tileBy": [32], "tileBx": [64]}), nw, res
    ) == Status.success
    mats = oracle_align_dense(spec, blosum62, y, x, -11, 0)
    want = oracle_hash_dense(mats["H"])
    assert hash_sparse(nw, res) == Status.success
    assert res.score_hash == want

    # One corrupted stored element in each mat must flip the hash.
    for mat_name, idx in (("tileHrowMat", (1, 3)), ("tileHcolMat", (2, 5))):
        good = getattr(nw, mat_name)
        bad = np.array(good, copy=True)
        bad[idx] += 7
        setattr(nw, mat_name, bad)
        res_bad = AlgResult()
        assert hash_sparse(nw, res_bad) == Status.success
        assert res_bad.score_hash != want, mat_name
        setattr(nw, mat_name, good)
