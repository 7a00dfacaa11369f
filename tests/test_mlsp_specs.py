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
