"""Batched pair-alignment engine: data parallelism over sequence pairs.

The reference aligns pairs strictly sequentially (ref: src/benchmark.cpp:406;
SURVEY.md §2.9 #10 records "batch-level parallelism: none"), so this engine
is new, TPU-first capability: pairs are bucketed by padded shape (one XLA
program per bucket, like the reference pads each pair to tile multiples —
ref: src/nwalign_gpu3_ml_diagdiag.cu:313-325), stacked, vmapped, and the
batch axis is sharded across the device mesh with NamedSharding. The fill
is embarrassingly parallel across pairs — no collective is needed until the
per-pair results (int32 costs, SW argmax cells) are gathered back.

The device kernel is cost-only: a lax.scan over rows keeping one carry row,
O(cols) device memory per pair, with the align cost captured in-scan at the
true (unpadded) bottom-right cell, so arbitrarily long batches of mixed
lengths share one compiled program per bucket.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from ..core.types import AlignKind, AlignSpec, GapKind, NEG_INF_I32
from .mesh import batch_sharding, replicated


def _degenerate_cost(spec: AlignSpec, adjr: int, adjc: int, gapo: int,
                     gape: int) -> int:
    """Analytic align_cost of a pair with an empty sequence (adjr < 2 or
    adjc < 2): the whole alignment is one gap run along the header
    row/col, which the in-kernel bottom-right capture never visits."""
    if spec.kind == AlignKind.SW:
        return 0
    n_gap = int(adjr + adjc) - 2
    if spec.gap == GapKind.AFFINE:
        return 0 if n_gap == 0 else gapo + n_gap * gape
    return n_gap * gapo


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# --------------------------------------------------------------------------
# Cost-only DP for one (padded) pair. vmapped over the batch.
# --------------------------------------------------------------------------


def _scores_single(subst, y, x, adjr, adjc, gapo, gape, *, kind: str,
                   gap: str):
    """Returns (cost, best_i, best_j) for one pair.

    y/x are padded (trailing 0 letters) int32 sequences WITH the header
    element; adjr/adjc are the true lengths including the header. Padding
    rows/lanes never influence the captured results: the linear chain-max
    runs left-to-right so lanes >= adjc never feed lane adjc-1, and rows
    past adjr-1 only overwrite values already captured.
    """
    rows_p = y.shape[0] - 1
    adjc_p = x.shape[0]
    is_sw = kind == "sw"
    affine = gap == "affine"
    g = gapo
    ninf = jnp.int32(NEG_INF_I32)
    offs = jnp.arange(adjc_p, dtype=jnp.int32)
    lane_valid = offs < adjc
    SX = subst[:, x]

    if not affine:
        goffs = offs * g
        row0 = jnp.zeros(adjc_p, jnp.int32) if is_sw else goffs
    else:
        geoffs = offs * gape
        if is_sw:
            row0 = jnp.zeros(adjc_p, jnp.int32)
        else:
            row0 = jnp.where(offs == 0, 0, gapo + geoffs).astype(jnp.int32)

    cost0 = row0[adjc - 1]
    best0 = (jnp.int32(0), jnp.int32(0), jnp.int32(0))  # (val, i, j); H[0,:]=0

    def capture(i, row, cost, best):
        cost = jnp.where(i == adjr - 1, row[adjc - 1], cost)
        if is_sw:
            bval, bi, bj = best
            masked = jnp.where(lane_valid, row, jnp.int32(0))
            rmax = jnp.max(masked)
            rj = jnp.argmax(masked).astype(jnp.int32)
            upd = (i < adjr) & (rmax > bval)
            best = (
                jnp.where(upd, rmax, bval),
                jnp.where(upd, i, bi),
                jnp.where(upd, rj, bj),
            )
        return cost, best

    if not affine:
        def step(carry, inp):
            prev, cost, best = carry
            i, yl = inp
            srow = SX[yl]
            cand = jnp.maximum(prev[:-1] + srow[1:], prev[1:] + g)
            if is_sw:
                cand = jnp.maximum(cand, 0)
                first = jnp.int32(0)
            else:
                first = i * g
            a = jnp.concatenate([first[None], cand])
            row = lax.cummax(a - goffs) + goffs
            cost, best = capture(i, row, cost, best)
            return (row, cost, best), None

        (row, cost, best), _ = lax.scan(
            step, (row0, cost0, best0),
            (jnp.arange(1, rows_p + 1, dtype=jnp.int32), y[1:]),
        )
    else:
        f0 = jnp.full(adjc_p, ninf, jnp.int32)

        def step(carry, inp):
            hprev, fprev, cost, best = carry
            i, yl = inp
            frow = jnp.maximum(fprev, hprev + gapo) + gape
            frow = frow.at[0].set(ninf)
            srow = SX[yl]
            v = jnp.maximum(hprev[:-1] + srow[1:], frow[1:])
            if is_sw:
                h0 = jnp.int32(0)
                vfull = jnp.concatenate([h0[None], jnp.maximum(v, 0)])
            else:
                h0 = gapo + i * gape
                vfull = jnp.concatenate([h0[None], v])
            m = lax.cummax(vfull + gapo - geoffs)
            erow = jnp.concatenate([ninf[None], m[:-1] + geoffs[1:]])
            hrow = jnp.concatenate([h0[None], jnp.maximum(v, erow[1:])])
            if is_sw:
                hrow = jnp.maximum(hrow, 0)
            cost, best = capture(i, hrow, cost, best)
            return (hrow, frow, cost, best), None

        (row, _, cost, best), _ = lax.scan(
            step, (row0, f0, cost0, best0),
            (jnp.arange(1, rows_p + 1, dtype=jnp.int32), y[1:]),
        )

    if is_sw:
        bval, bi, bj = best
        return bval, bi, bj
    return cost, jnp.int32(0), jnp.int32(0)


@functools.partial(jax.jit, static_argnames=("kind", "gap"))
def scores_batch(subst, ys, xs, adjrs, adjcs, gapo, gape, *, kind: str,
                 gap: str):
    """vmapped cost-only alignment over a stacked bucket.

    ys: (B, 1+rows_p), xs: (B, 1+cols_p), adjrs/adjcs: (B,) true lengths.
    Returns (costs, best_i, best_j), each (B,) int32.
    """
    fn = functools.partial(_scores_single, kind=kind, gap=gap)
    return jax.vmap(fn, in_axes=(None, 0, 0, 0, 0, None, None))(
        subst, ys, xs, adjrs, adjcs, gapo, gape
    )


# --------------------------------------------------------------------------
# Host-side bucketing + mesh sharding.
# --------------------------------------------------------------------------


@dataclasses.dataclass
class BatchResult:
    """Per-pair outputs in input order."""

    costs: np.ndarray  # (N,) int32 align costs
    best_i: np.ndarray  # (N,) SW argmax row (0 for NW)
    best_j: np.ndarray  # (N,) SW argmax col (0 for NW)
    n_buckets: int = 0
    n_programs: int = 0


def _pad_pow2(n: int, floor: int) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def bucket_pairs(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    quantum: "int | str" = 256,
) -> Dict[Tuple[int, int], List[int]]:
    """Group pair indices by padded (rows_p, cols_p) so each bucket compiles
    once. An int quantum pads linearly (like the reference's tile padding);
    quantum="pow2" pads each dim to the next power of two (floor 256) —
    at most 2x padded cells, but heterogeneous workloads collapse into
    O(log n) buckets instead of one per distinct shape."""
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for idx, (y, x) in enumerate(pairs):
        if quantum == "pow2":
            key = (
                _pad_pow2(max(len(y) - 1, 1), 256),
                _pad_pow2(max(len(x) - 1, 1), 256),
            )
        else:
            key = (
                _pad_to(max(len(y) - 1, 1), quantum),
                _pad_to(max(len(x) - 1, 1), quantum),
            )
        buckets.setdefault(key, []).append(idx)
    return buckets


def _pallas_batch_scores(
    spec: AlignSpec,
    subst_j,
    ys: np.ndarray,
    xs: np.ndarray,
    adjrs: np.ndarray,
    adjcs: np.ndarray,
    gapo: int,
    gape: int,
):
    """TPU fast path for one bucket: groups of K pairs run as K interleaved
    chains in the v2 Pallas kernel (ops/pallas_wavefront2.py). Returns
    (costs, best_i, best_j) matching scores_batch."""
    import jax
    import jax.numpy as jnp
    from ..ops.pallas_wavefront2 import pallas_mlsp_batch_v2, tuned_defaults

    is_sw = spec.kind.value == "sw"
    K = int(tuned_defaults(spec.kind.value, spec.gap.value)["kChains"])
    b = ys.shape[0]
    b_pad = _pad_to(b, K)
    if b_pad != b:
        pad = b_pad - b
        ys = np.concatenate([ys, np.zeros((pad, ys.shape[1]), np.int32)])
        xs = np.concatenate([xs, np.zeros((pad, xs.shape[1]), np.int32)])
        adjrs = np.concatenate([adjrs, np.ones(pad, np.int32)])
        adjcs = np.concatenate([adjcs, np.ones(pad, np.int32)])

    rows_p = ys.shape[1] - 1
    cols_p = xs.shape[1] - 1
    for R in (2048, 1024, 512, 256, 128):
        if rows_p % R == 0:
            break
    for TW in (2048, 1024, 512, 256, 128):
        if cols_p % TW == 0:
            break
    R = min(R, TW)  # the kernel requires TW >= R
    W = min(512, TW)

    costs = np.zeros(b, np.int32)
    best_i = np.zeros(b, np.int32)
    best_j = np.zeros(b, np.int32)
    lane = np.arange(rows_p) % R
    # Degenerate pairs (an empty sequence): the in-kernel bottom-right
    # capture never hits a header-row/col cell, so compute those costs
    # host-side from the header formulas instead.
    degenerate = (adjrs < 2) | (adjcs < 2)
    for g0 in range(0, b_pad, K):
        out = pallas_mlsp_batch_v2(
            subst_j,
            jnp.asarray(ys[g0: g0 + K]), jnp.asarray(xs[g0: g0 + K]),
            jnp.int32(gapo), jnp.int32(gape),
            jnp.asarray(adjrs[g0: g0 + K]), jnp.asarray(adjcs[g0: g0 + K]),
            R=R, W=W, TW=TW, kind=spec.kind.value, gap=spec.gap.value,
        )
        if is_sw:
            bv = np.asarray(jax.device_get(out["bv"])).reshape(K, -1)
            bc = np.asarray(jax.device_get(out["bc"])).reshape(K, -1)
        else:
            cost = np.asarray(jax.device_get(out["cost"])).reshape(K, -1)
        for k in range(K):
            idx = g0 + k
            if idx >= b:
                break
            if degenerate[idx]:
                costs[idx] = _degenerate_cost(
                    spec, adjrs[idx], adjcs[idx], gapo, gape
                )
                continue
            if is_sw:
                v = bv[k]
                if v.max(initial=0) <= 0:
                    costs[idx] = 0
                    continue
                iv = 1 + np.arange(v.shape[0])
                jv = bc[k] - lane + 1
                o = np.lexsort((jv, iv, -v))[0]
                costs[idx] = v[o]
                best_i[idx] = iv[o]
                best_j[idx] = jv[o]
            else:
                costs[idx] = cost[k].max()
    return costs, best_i, best_j


def _pallas_tiny_scores(
    spec: AlignSpec,
    subst_j,
    ys: np.ndarray,
    xs: np.ndarray,
    adjrs: np.ndarray,
    adjcs: np.ndarray,
    gapo: int,
    gape: int,
    interpret: bool = False,
):
    """TPU fast path for SMALL-pair buckets (rows_p <= 1024): PPB pairs
    share one vector block as sublane sub-blocks, K blocks interleave
    (ops/pallas_tiny.py). Cost/argmax contract identical to
    scores_batch."""
    import jax
    import jax.numpy as jnp
    from ..ops.pallas_tiny import pallas_mlsp_tiny_v2
    from ..ops.pallas_wavefront2 import tuned_defaults

    is_sw = spec.kind.value == "sw"
    PR = ys.shape[1] - 1
    PPB = (16 * 128) // PR
    K = min(4, int(tuned_defaults(spec.kind.value,
                                  spec.gap.value)["kChains"]))
    b = ys.shape[0]
    quant = PPB * K
    b_pad = _pad_to(b, quant)
    if b_pad != b:
        pad = b_pad - b
        ys = np.concatenate([ys, np.zeros((pad, ys.shape[1]), np.int32)])
        xs = np.concatenate([xs, np.zeros((pad, xs.shape[1]), np.int32)])
        adjrs = np.concatenate([adjrs, np.full(pad, 2, np.int32)])
        adjcs = np.concatenate([adjcs, np.full(pad, 2, np.int32)])

    out = pallas_mlsp_tiny_v2(
        subst_j, jnp.asarray(ys), jnp.asarray(xs),
        jnp.int32(gapo), jnp.int32(gape),
        jnp.asarray(adjrs), jnp.asarray(adjcs),
        PR=PR, K=K, kind=spec.kind.value, gap=spec.gap.value,
        interpret=interpret,
    )
    costs = np.zeros(b, np.int32)
    best_i = np.zeros(b, np.int32)
    best_j = np.zeros(b, np.int32)
    degenerate = (adjrs[:b] < 2) | (adjcs[:b] < 2)
    if is_sw:
        bvs = np.asarray(jax.device_get(out["bv"]))[:b]
        bcs = np.asarray(jax.device_get(out["bc"]))[:b]
    else:
        cost = np.asarray(jax.device_get(out["cost"]))[:b]
    lane = np.arange(PR)
    for idx in range(b):
        if degenerate[idx]:
            costs[idx] = _degenerate_cost(
                spec, adjrs[idx], adjcs[idx], gapo, gape
            )
            continue
        if is_sw:
            v = bvs[idx]
            if v.max(initial=0) <= 0:
                costs[idx] = 0
                continue
            iv = 1 + lane
            jv = bcs[idx] - lane + 1
            o = np.lexsort((jv, iv, -v))[0]
            costs[idx] = v[o]
            best_i[idx] = iv[o]
            best_j[idx] = jv[o]
        else:
            costs[idx] = cost[idx]
    return costs, best_i, best_j


def _pallas_batch_ok(spec: AlignSpec, rows_p: int, gapo: int,
                     gape: int) -> bool:
    import jax

    if jax.default_backend() != "tpu":
        return False
    if spec.gap.value == "affine" and (gapo > 0 or gape > 0):
        return False
    # Below 8 sublanes per lane-block the vector registers are mostly
    # padding and the vmapped XLA row-scan wins.
    return rows_p >= 1024


def _pallas_tiny_ok(spec: AlignSpec, rows_p: int, n_pairs: int, gapo: int,
                    gape: int) -> bool:
    import jax
    import os

    if os.environ.get("GSA_NO_TINY"):  # A/B benchmarking knob
        return False
    if jax.default_backend() != "tpu":
        return False
    if spec.gap.value == "affine" and (gapo > 0 or gape > 0):
        return False
    # Sub-block packing needs rows_p to divide the (16, 128) block, and
    # enough pairs that at least one full chain-group forms (smaller
    # buckets aren't worth a kernel compile over the vmapped row-scan).
    if rows_p > 1024 or rows_p % 128 or (16 * 128) % rows_p:
        return False
    return n_pairs >= (16 * 128) // rows_p


def align_pairs_batched(
    spec: AlignSpec,
    subst: np.ndarray,
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    gapo: int,
    gape: int = 0,
    mesh: Optional[Mesh] = None,
    quantum: int = 256,
) -> BatchResult:
    """Align many pairs (each with header element) data-parallel.

    With a mesh, the stacked batch is placed with NamedSharding over the
    mesh axis so XLA splits the vmap across chips; the batch is padded to a
    multiple of the mesh size with dummy pairs (dropped from the output).
    On a single TPU without a mesh, buckets of large pairs route to the
    multi-chain Pallas kernel (pairs-as-chains, zero pipeline bubbles).
    """
    if spec.gap == GapKind.AFFINE and (gapo > 0 or gape > 0):
        # Same domain guard as align_pallas_mlsp / the oracle: the
        # vectorized Gotoh construction requires non-positive gap costs.
        raise ValueError(
            "affine specs require gapo <= 0 and gape <= 0 "
            f"(got gapo={gapo}, gape={gape})"
        )
    n = len(pairs)
    costs = np.zeros(n, np.int32)
    best_i = np.zeros(n, np.int32)
    best_j = np.zeros(n, np.int32)
    buckets = bucket_pairs(pairs, quantum)

    n_dev = mesh.devices.size if mesh is not None else 1
    subst_j = jnp.asarray(subst)
    if mesh is not None:
        subst_j = jax.device_put(subst_j, replicated(mesh))

    for (rows_p, cols_p), idxs in buckets.items():
        b = len(idxs)
        b_pad = _pad_to(b, n_dev)
        ys = np.zeros((b_pad, 1 + rows_p), np.int32)
        xs = np.zeros((b_pad, 1 + cols_p), np.int32)
        adjrs = np.ones(b_pad, np.int32)
        adjcs = np.ones(b_pad, np.int32)
        for k, idx in enumerate(idxs):
            y, x = pairs[idx]
            ys[k, : len(y)] = y
            xs[k, : len(x)] = x
            adjrs[k] = len(y)
            adjcs[k] = len(x)

        if mesh is None and _pallas_batch_ok(spec, rows_p, gapo, gape):
            c, bi, bj = _pallas_batch_scores(
                spec, subst_j, ys[:b], xs[:b], adjrs[:b], adjcs[:b],
                gapo, gape,
            )
        elif mesh is None and _pallas_tiny_ok(spec, rows_p, b, gapo, gape):
            c, bi, bj = _pallas_tiny_scores(
                spec, subst_j, ys[:b], xs[:b], adjrs[:b], adjcs[:b],
                gapo, gape,
            )
        else:
            args = (jnp.asarray(ys), jnp.asarray(xs),
                    jnp.asarray(adjrs), jnp.asarray(adjcs))
            if mesh is not None:
                sh = batch_sharding(mesh)
                args = tuple(jax.device_put(a, sh) for a in args)

            c, bi, bj = scores_batch(
                subst_j, *args, jnp.int32(gapo), jnp.int32(gape),
                kind=spec.kind.value, gap=spec.gap.value,
            )
            c, bi, bj = jax.device_get((c, bi, bj))
        for k, idx in enumerate(idxs):
            costs[idx] = c[k]
            best_i[idx] = bi[k]
            best_j[idx] = bj[k]

    return BatchResult(costs, best_i, best_j, n_buckets=len(buckets),
                       n_programs=len(buckets))
