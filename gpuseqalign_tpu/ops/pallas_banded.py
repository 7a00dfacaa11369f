"""Banded single-pass v2 kernel: the per-device compute of the multi-chip
giant-pair engine (parallel/giant2.py). Covers ALL FOUR specs
(NW/SW x linear/affine).

One invocation fills K row blocks (R rows each) of a COLUMN BAND of the
global DP matrix. Everything that was analytic in the full-matrix v2
kernel (ops/pallas_wavefront2.py) becomes an input here, because the band
no longer touches the true matrix edges:

  prev_row  (1, prev_len)   H[row0, c0 + j] — the row above this pass's
                            first block (previous pass output / header)
  prevF_row (1, prev_len)   F likewise (affine; F flows vertically, so it
                            stays band-local across passes)
  haloH     (K*R + 1,)      H[row0 + r, c0] — the band's left-edge column
                            for this pass's rows (ICI halo from the
                            neighbor device), plus the top corner
  haloE     (K*R,)          E[row0 + 1 + r, c0] (affine halo; E's
                            recurrence crosses the band edge, so the
                            neighbor's right-edge E column rides the same
                            ppermute message — the (H, E) pair is exactly
                            a tile's left-column dependency set under
                            Gotoh, see core/types.py AlignSpec)

The kernel itself is the shared _make_kernel(banded=True) from
pallas_wavefront2.py — K chains in echelon, lane-shift carries via the
two-roll trick, in-kernel packed substitution lookup, sparse tile-header
outputs (ref dataflow: src/nwalign_gpu7_mlsp_diagdiag.cu:247-285, lifted
across chips). The right-edge halos for the next device fall out of the
hcol/ecol streams (the capture at local column band_cols, a TW multiple).
SW adds the zero clamp and the per-lane running-argmax (bv/bc), masked by
the band-local true dims (adjr_loc = adjr - row0, adjc_loc = adjc - c0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import NEG_INF_I32
from .pallas_wavefront2 import _cdiv, _make_kernel, _pack_planes  # noqa: F401


@functools.partial(
    jax.jit,
    static_argnames=("R", "W", "TW", "K", "band_cols", "kind", "gap",
                     "interpret"),
)
def banded_pass(subst_planes, xwin, gapo, gape, prev_row, prevF_row,
                haloH, haloE, adjr_loc, adjc_loc, *, R: int, W: int,
                TW: int, K: int, band_cols: int, kind: str = "nw",
                gap: str = "linear", interpret: bool = False):
    """One pass (K row blocks) over one column band, any spec.

    subst_planes: (K, 8, SUB, 128)  packed substitution rows for the blocks
    xwin: (NSpad//W, W//128, 128)   band letters X[c0 + t + 1]
    prev_row: (prev_len,)           H[row0, c0 + j]
    prevF_row: (prev_len,) | None   F[row0, c0 + j] (affine only)
    haloH: (K*R + 1,)               H[row0 + r, c0] for r = 0..K*R
    haloE: (K*R,) | None            E[row0 + 1 + r, c0] (affine only)
    adjr_loc/adjc_loc: ()           adjr - row0, adjc - c0 (SW masking)

    Returns a dict:
      hrow (K, prev_len), hcol (K, CT, SUB, 128),
      frow/ecol (affine, same shapes), bv/bc (SW, (K, SUB, 128); bc holds
      the chain-local step c — global j = c0 + (c - lane) + 1).
    """
    affine = gap == "affine"
    is_sw = kind == "sw"
    SUB = R // 128
    NSpad = xwin.shape[0] * W
    assert NSpad == _cdiv(R + band_cols - 1 + 128, W) * W
    prev_len = NSpad + 128

    OFF = W * _cdiv(R + 256, W)
    CH = (NSpad + (K - 1) * OFF) // W
    CT = _cdiv(CH, TW // W)
    q = TW // W
    offw = OFF // W

    kernel, _, _ = _make_kernel(
        K=K, SUB=SUB, W=W, CH=CH, cols_p=band_cols, R=R, TW=TW,
        OFF=OFF, prev_len=prev_len, B=K, kind=kind, gap=gap, banded=True,
        masked=interpret,
    )

    # SMEM scalar vector: [gapo, gape] + adjr_loc*K + adjc_loc*K + seeds*K
    # (seeds = H[(blk+1)R, c0], the j == 0 element of each output row).
    gvec = jnp.concatenate(
        [jnp.asarray(gapo, jnp.int32).reshape(1),
         jnp.asarray(gape, jnp.int32).reshape(1)]
        + [jnp.asarray(adjr_loc, jnp.int32).reshape(1)] * K
        + [jnp.asarray(adjc_loc, jnp.int32).reshape(1)] * K
        + [haloH[(k + 1) * R].reshape(1) for k in range(K)]
    ).reshape(1, 2 + 3 * K)

    hcolin = haloH[1:].reshape(K, SUB, 128)
    dcolin = haloH[:-1].reshape(K, SUB, 128)
    previn = jnp.zeros((1, prev_len), jnp.int32).at[0, : prev_row.shape[0]].set(
        prev_row[:prev_len]
    )

    def fixed(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda ch, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 2 + 3 * K), lambda ch: (0, 0),
                     memory_space=pltpu.SMEM),
        fixed((1, prev_len)),
    ]
    inputs = [gvec, previn]
    if affine:
        prevFin = jnp.full((1, prev_len), NEG_INF_I32, jnp.int32)
        prevFin = prevFin.at[0, : prevF_row.shape[0]].set(
            prevF_row[:prev_len]
        )
        in_specs.append(fixed((1, prev_len)))
        inputs.append(prevFin)
    in_specs += [fixed((K, SUB, 128)), fixed((K, SUB, 128))]
    inputs += [hcolin, dcolin]
    if affine:
        ecolin = haloE.reshape(K, SUB, 128)
        in_specs.append(fixed((K, SUB, 128)))
        inputs.append(ecolin)

    for k in range(K):
        in_specs.append(pl.BlockSpec(
            (1, 8, SUB, 128),
            functools.partial(lambda ch, k=0: (k, 0, 0, 0), k=k),
            memory_space=pltpu.VMEM,
        ))
    for k in range(K):
        in_specs.append(pl.BlockSpec(
            (1, W // 128, 128),
            functools.partial(
                lambda ch, k=0: (
                    jnp.clip(ch - k * offw, 0, NSpad // W - 1), 0, 0
                ),
                k=k,
            ),
            memory_space=pltpu.VMEM,
        ))
    inputs += [subst_planes] * K + [xwin] * K

    def row_specs():
        return [pl.BlockSpec((1, 1, prev_len), lambda ch, k=0: (0, 0, 0),
                             memory_space=pltpu.VMEM) for _ in range(K)]

    def col_specs():
        return [pl.BlockSpec(
            (1, 1, SUB, 128),
            functools.partial(
                lambda ch, k=0: (
                    0, jnp.clip((ch - k * offw) // q, 0, CT - 1), 0, 0,
                ),
                k=k,
            ),
            memory_space=pltpu.VMEM,
        ) for k in range(K)]

    def blk_specs():
        return [pl.BlockSpec((1, SUB, 128), lambda ch, k=0: (0, 0, 0),
                             memory_space=pltpu.VMEM) for _ in range(K)]

    row_shape = jax.ShapeDtypeStruct((1, 1, prev_len), jnp.int32)
    col_shape = jax.ShapeDtypeStruct((1, CT, SUB, 128), jnp.int32)
    blk_shape = jax.ShapeDtypeStruct((1, SUB, 128), jnp.int32)

    out_specs = row_specs() + col_specs()
    out_shapes = [row_shape] * K + [col_shape] * K
    if affine:
        out_specs += row_specs() + col_specs()
        out_shapes += [row_shape] * K + [col_shape] * K
    if is_sw:
        out_specs += blk_specs() + blk_specs()
        out_shapes += [blk_shape] * K + [blk_shape] * K

    scratch = [pltpu.VMEM((1, prev_len), jnp.int32) for _ in range(K)]
    if affine:
        scratch += [pltpu.VMEM((1, prev_len), jnp.int32) for _ in range(K)]
    scratch += [
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # v1s
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # shps
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # xds
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # accs
        pltpu.VMEM((K, 1, 128), jnp.int32),    # prows
    ]
    if affine:
        scratch += [
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # e1s
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # f1s
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # accEs
            pltpu.VMEM((K, 1, 128), jnp.int32),    # prowFs
        ]
    if is_sw:
        scratch += [
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # bvs
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # bcs
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(CH,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)

    pos = 0
    out = {"hrow": jnp.concatenate(
        [outs[pos + k][0] for k in range(K)], axis=0)}
    pos += K
    out["hcol"] = jnp.concatenate(outs[pos: pos + K], axis=0)
    pos += K
    if affine:
        out["frow"] = jnp.concatenate(
            [outs[pos + k][0] for k in range(K)], axis=0)
        pos += K
        out["ecol"] = jnp.concatenate(outs[pos: pos + K], axis=0)
        pos += K
    if is_sw:
        out["bv"] = jnp.concatenate(outs[pos: pos + K], axis=0)
        pos += K
        out["bc"] = jnp.concatenate(outs[pos: pos + K], axis=0)
        pos += K
    return out


@functools.partial(
    jax.jit,
    static_argnames=("R", "W", "TW", "K", "band_cols", "interpret"),
)
def banded_pass_nw_lg(subst_planes, xwin, gapo, prev_row, halo, *, R: int,
                      W: int, TW: int, K: int, band_cols: int,
                      interpret: bool = False):
    """NW linear-gap convenience wrapper (kept for the original giant2
    surface). Returns (hrow (K, prev_len), hcol (K, CT, SUB, 128))."""
    out = banded_pass(
        subst_planes, xwin, gapo, jnp.int32(0), prev_row, None, halo, None,
        jnp.int32(2**30), jnp.int32(2**30),
        R=R, W=W, TW=TW, K=K, band_cols=band_cols, kind="nw", gap="linear",
        interpret=interpret,
    )
    return out["hrow"], out["hcol"]
