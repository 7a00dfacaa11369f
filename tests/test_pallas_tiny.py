"""Tiny-pair batched kernel (ops/pallas_tiny.py) vs the oracle.

The risky parts: the in-phase sublane sub-block packing (cross-pair
seams overridden by analytic header fills), the replicated per-pair X
injection, and the per-lane constant capture vectors. Covered: all four
specs, mixed true lengths in one bucket, and the batch-engine wrapper
path (_pallas_tiny_scores) with its degenerate-pair and padding
handling.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.models.oracle import align_cost_of, oracle_align_dense

from conftest import random_seq


def _bucket(rng, NP, PR, cols_p, rmin, rmax, cmin, cmax):
    Ys = np.zeros((NP, 1 + PR), np.int32)
    Xs = np.zeros((NP, 1 + cols_p), np.int32)
    adjrs = np.zeros(NP, np.int32)
    adjcs = np.zeros(NP, np.int32)
    pairs = []
    for i in range(NP):
        r = int(rng.integers(rmin, rmax))
        c = int(rng.integers(cmin, cmax))
        y = random_seq(rng, r)
        x = random_seq(rng, c)
        Ys[i, : 1 + r] = y
        Xs[i, : 1 + c] = x
        adjrs[i], adjcs[i] = r + 1, c + 1
        pairs.append((y, x))
    return Ys, Xs, adjrs, adjcs, pairs


@pytest.mark.parametrize("spec_name", ["nw_lg", "nw_ag", "sw_lg", "sw_ag"])
def test_tiny_kernel_matches_oracle(blosum62, rng, spec_name):
    from gpuseqalign_tpu.ops.pallas_tiny import pallas_mlsp_tiny_v2

    spec = AlignSpec.from_name(spec_name)
    PR, K = 256, 2
    PPB = (16 * 128) // PR
    NP = PPB * K
    cols_p = 384
    Ys, Xs, adjrs, adjcs, pairs = _bucket(
        rng, NP, PR, cols_p, 100, 255, 150, 383
    )
    out = pallas_mlsp_tiny_v2(
        jnp.asarray(blosum62), jnp.asarray(Ys), jnp.asarray(Xs),
        jnp.int32(-11), jnp.int32(-2),
        jnp.asarray(adjrs), jnp.asarray(adjcs),
        PR=PR, K=K, kind=spec.kind.value, gap=spec.gap.value,
        interpret=True,
    )
    for i, (y, x) in enumerate(pairs):
        mats = oracle_align_dense(spec, blosum62, y, x, -11, -2)
        want = align_cost_of(spec, mats)
        if spec_name.startswith("sw"):
            bv = np.asarray(out["bv"][i])
            bc = np.asarray(out["bc"][i])
            assert int(bv.max(initial=0)) == want, f"pair {i}"
            if want > 0:
                iv = 1 + np.arange(PR)
                jv = bc - np.arange(PR) + 1
                o = np.lexsort((jv, iv, -bv))[0]
                assert (iv[o], jv[o]) == tuple(
                    int(v) for v in mats["best"]
                ), f"pair {i}"
        else:
            assert int(np.asarray(out["cost"][i])) == want, f"pair {i}"


def test_tiny_sw_degenerate_cols(blosum62, rng):
    """Regression (round 5): an adjc=1 pair (empty X, e.g. the len1
    fixtures) must capture NOTHING in the SW argmax — the unsigned
    column bound adjc-2 would wrap to ~2^32 and out-range even the
    2^30-offset dead-lane guard, letting pad-diagonal junk win bv
    (the same folded-guard bug as the giant-stream degenerate device)."""
    from gpuseqalign_tpu.ops.pallas_tiny import pallas_mlsp_tiny_v2

    spec = AlignSpec.from_name("sw_lg")
    PR, K = 256, 2
    PPB = (16 * 128) // PR
    NP = PPB * K
    cols_p = 384
    Ys, Xs, adjrs, adjcs, pairs = _bucket(
        rng, NP, PR, cols_p, 100, 255, 150, 383
    )
    # Pair 1: empty X (adjc = 1); its long pad-letter diagonal would
    # accumulate large positive junk without the clamped bound.
    Xs[1] = 0
    adjcs[1] = 1
    out = pallas_mlsp_tiny_v2(
        jnp.asarray(blosum62), jnp.asarray(Ys), jnp.asarray(Xs),
        jnp.int32(-11), jnp.int32(0),
        jnp.asarray(adjrs), jnp.asarray(adjcs),
        PR=PR, K=K, kind="sw", gap="linear", interpret=True,
    )
    assert int(np.asarray(out["bv"][1]).max(initial=0)) == 0
    # Non-degenerate neighbors in the same sub-block stay oracle-exact.
    for i in (0, 2):
        mats = oracle_align_dense(spec, blosum62, *pairs[i], -11, 0)
        assert int(np.asarray(out["bv"][i]).max(initial=0)) == \
            align_cost_of(spec, mats), f"pair {i}"


def test_tiny_batch_wrapper(blosum62, rng):
    """_pallas_tiny_scores: padding to a full chain-group + degenerate
    pairs handled host-side, contract identical to scores_batch."""
    from gpuseqalign_tpu.parallel.batch import (
        _pallas_tiny_scores,
        scores_batch,
    )

    spec = AlignSpec.from_name("nw_lg")
    PR = 512
    NP = 5  # not a multiple of PPB*K -> exercises dummy-pair padding
    cols_p = 512
    Ys, Xs, adjrs, adjcs, pairs = _bucket(
        rng, NP, PR, cols_p, 200, 511, 200, 511
    )
    # Make pair 3 degenerate (empty Y).
    Ys[3] = 0
    adjrs[3] = 1
    pairs[3] = (np.zeros(1, np.int32), pairs[3][1])

    c, bi, bj = _pallas_tiny_scores(
        spec, jnp.asarray(blosum62), Ys, Xs, adjrs, adjcs, -11, 0,
        interpret=True,
    )
    cr, bir, bjr = scores_batch(
        jnp.asarray(blosum62), jnp.asarray(Ys), jnp.asarray(Xs),
        jnp.asarray(adjrs), jnp.asarray(adjcs),
        jnp.int32(-11), jnp.int32(0),
        kind=spec.kind.value, gap=spec.gap.value,
    )
    np.testing.assert_array_equal(c, np.asarray(cr))
