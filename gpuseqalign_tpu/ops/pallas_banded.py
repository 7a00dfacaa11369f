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
from .pallas_wavefront2 import (  # noqa: F401
    _cdiv,
    _make_kernel,
    _pack_planes,
    pack_x_streams,
    wrap_interleave,
    wrap_loc,
    wrap_ok,
)


@functools.partial(
    jax.jit,
    static_argnames=("R", "W", "TW", "K", "band_cols", "kind", "gap",
                     "interpret", "B", "masked", "packedx", "packedef",
                     "remath", "subprow"),
)
def banded_pass(subst_planes, xwin, gapo, gape, prev_row, prevF_row,
                haloH, haloE, adjr_loc, adjc_loc, *, R: int, W: int,
                TW: int, K: int, band_cols: int, kind: str = "nw",
                gap: str = "linear", interpret: bool = False,
                B: int | None = None, masked: "bool | None" = None,
                packedx: bool = False, packedef: bool = False,
                remath: bool = False, subprow: bool = False):
    """One pass (B row blocks, K chains) over one column band, any spec.

    subst_planes: (B, 8, SUB, 128)  packed substitution rows for the blocks
    xwin: (NSpad//W, W//128, 128)   band letters X[c0 + t + 1]
    prev_row: (prev_len,)           H[row0, c0 + j]
    prevF_row: (prev_len,) | None   F[row0, c0 + j] (affine only)
    haloH: (B*R + 1,)               H[row0 + r, c0] for r = 0..B*R
    haloE: (B*R,) | None            E[row0 + 1 + r, c0] (affine only)
    adjr_loc/adjc_loc: ()           adjr - row0, adjc - c0 (SW masking)

    ``B`` defaults to K (one echelon group — the original per-pass form).
    B > K (a multiple of K) runs the CONTINUOUS (wrap) echelon across
    B // K groups inside ONE pallas_call, paying the (K-1)*OFF pipeline
    drain once per pass instead of once per group; requires the same
    cross-group hazard guard as the full-matrix wrap kernel
    (NSpad >= (K-1)*OFF + R + W + 256 — use wrap_ok() to check).

    Returns a dict:
      hrow (B, prev_len), hcol (B, CT, SUB, 128),
      frow/ecol (affine, same shapes), bv/bc (SW, (B, SUB, 128); bc holds
      the chain-local step c — global j = c0 + (c - lane) + 1).

    ``masked`` overrides the blanket dead-lane validity mask (default:
    on in interpret mode only — see _make_kernel). Tests pass
    masked=False to exercise the PRODUCTION mask logic (SW argmax guards
    etc.) under interpret mode, where the blanket mask would hide a
    guard bug.

    ``packedx``/``packedef``/``remath`` are the register levers of the
    full-matrix kernel, in their banded forms (shared byte-packed
    letter streams over the BAND's X; packed E/F byte deltas — requires
    -gapo <= 255; per-window halo-header STRIPE reads instead of K
    hoisted (SUB,128) halo vectors). Outputs are bit-identical; see
    _make_kernel.
    """
    affine = gap == "affine"
    is_sw = kind == "sw"
    SUB = R // 128
    NSpad = xwin.shape[0] * W
    assert NSpad == _cdiv(R + band_cols - 1 + 128, W) * W
    prev_len = NSpad + 128
    if B is None:
        B = K
    assert B % K == 0 and subst_planes.shape[0] == B
    wrap = B > K
    BBtot = B // K

    OFF = W * _cdiv(R + 256, W)
    CH = (NSpad + (K - 1) * OFF) // W
    q = TW // W
    offw = OFF // W
    SPB = NSpad // W
    if wrap:
        assert wrap_ok(R=R, W=W, K=K, band_cols=band_cols), (
            "banded wrap needs NSpad >= (K-1)*OFF + R + W + 256"
        )
        # +1: drain-phase tile flushes clip into slot CT-1, which must not
        # collide with the band's right-edge capture (jl == jtE) that the
        # halo exchange reads. Slot CT-1 is junk-only by construction.
        CT = _cdiv(SPB, q) + 1
        grid = (BBtot * SPB + (K - 1) * offw,)
    else:
        CT = _cdiv(CH, q)
        grid = (CH,)

    packedef = packedef and affine
    kernel, _, _ = _make_kernel(
        K=K, SUB=SUB, W=W, CH=CH, cols_p=band_cols, R=R, TW=TW,
        OFF=OFF, prev_len=prev_len, B=B, kind=kind, gap=gap, banded=True,
        masked=interpret if masked is None else masked, wrap=wrap,
        packedx=packedx, packedef=packedef, remath=remath,
        subprow=subprow,
    )
    npk = _cdiv(K, 4) if packedx else 0
    npk2 = _cdiv(K, 4) if packedef else 0

    # SW argmax guard: the kernel's column mask (uok: u <= adjc_loc - 2)
    # must never admit columns past the band edge — for a non-rightmost
    # band adjc - c0 exceeds band_cols, and the cells at u >= band_cols
    # are junk computed from the zero-padded X tail (letter 0 scores like
    # a real letter under the SW zero clamp), which would corrupt the
    # per-lane running max bv/bc on the unmasked (real-TPU) body. Clamp
    # to the band's own column count (+1 header); a no-op for the
    # rightmost band and at D=1 (there adjc_loc <= band_cols + 1 already).
    # Regression: tests/test_parallel.py::test_giant2_sw_band_argmax_unmasked.
    adjc_loc = jnp.minimum(jnp.asarray(adjc_loc, jnp.int32),
                           jnp.int32(band_cols + 1))

    # SMEM scalar vector: [gapo, gape] + adjr_loc*K + adjc_loc*K + seeds*B
    # (seeds = H[(blk+1)R, c0], the j == 0 element of each output row).
    gvec = jnp.concatenate(
        [jnp.asarray(gapo, jnp.int32).reshape(1),
         jnp.asarray(gape, jnp.int32).reshape(1)]
        + [jnp.asarray(adjr_loc, jnp.int32).reshape(1)] * K
        + [jnp.asarray(adjc_loc, jnp.int32).reshape(1)] * K
        + [haloH[(b + 1) * R].reshape(1) for b in range(B)]
    ).reshape(1, 2 + 2 * K + B)

    hcolin = haloH[1:].reshape(B, SUB, 128)
    dcolin = haloH[:-1].reshape(B, SUB, 128)
    previn = jnp.zeros((1, prev_len), jnp.int32).at[0, : prev_row.shape[0]].set(
        prev_row[:prev_len]
    )

    def _wloc(ch, k):
        return wrap_loc(ch, k, offw=offw, SPB=SPB, BBtot=BBtot)

    def fixed(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda ch, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def chain_blk_specs(shape):
        # Per-chain window over a (B, ...)-shaped input: the chain's
        # current row block (wrap) or its fixed block k (one group).
        if wrap:
            return [pl.BlockSpec(
                (1,) + shape,
                functools.partial(
                    lambda ch, k=0: (_wloc(ch, k)[0] * K + k,)
                    + (0,) * len(shape), k=k),
                memory_space=pltpu.VMEM,
            ) for k in range(K)]
        return [pl.BlockSpec(
            (1,) + shape,
            functools.partial(lambda ch, k=0: (k,) + (0,) * len(shape), k=k),
            memory_space=pltpu.VMEM,
        ) for k in range(K)]

    in_specs = [
        pl.BlockSpec((1, 2 + 2 * K + B), lambda ch: (0, 0),
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
    ecolin = haloE.reshape(B, SUB, 128) if affine else None
    if wrap:
        # Halo columns become per-chain windowed refs (the kernel reads
        # the chain's CURRENT block's column each grid step).
        in_specs += chain_blk_specs((SUB, 128)) * (3 if affine else 2)
        inputs += [hcolin] * K + [dcolin] * K
        if affine:
            inputs += [ecolin] * K
    else:
        in_specs += [fixed((K, SUB, 128)), fixed((K, SUB, 128))]
        inputs += [hcolin, dcolin]
        if affine:
            in_specs.append(fixed((K, SUB, 128)))
            inputs.append(ecolin)

    in_specs += chain_blk_specs((8, SUB, 128))
    inputs += [subst_planes] * K
    if packedx:
        # npk SHARED byte-packed letter streams over the band's X,
        # periodic mod NSpad and indexed by (ch mod SPB) — exactly the
        # full-matrix layout (pack_x_streams doc); drain-phase wrapped
        # junk letters feed only gated stores.
        xs = xwin.reshape(NSpad)
        pstreams = [
            w.reshape(SPB, W // 128, 128)
            for w in pack_x_streams(xs, OFF=OFF, K=K)
        ]
        in_specs += [pl.BlockSpec(
            (1, W // 128, 128),
            lambda ch: (jnp.mod(ch, SPB), 0, 0),
            memory_space=pltpu.VMEM,
        )] * npk
        inputs += pstreams
    else:
        for k in range(K):
            in_specs.append(pl.BlockSpec(
                (1, W // 128, 128),
                functools.partial(
                    lambda ch, k=0: (
                        (jnp.clip(_wloc(ch, k)[1], 0, SPB - 1) if wrap
                         else jnp.clip(ch - k * offw, 0, SPB - 1)), 0, 0
                    ),
                    k=k,
                ),
                memory_space=pltpu.VMEM,
            ))
        inputs += [xwin] * K

    def out_blk(k):
        # Output row-block index for chain k at grid step ch.
        if wrap:
            return lambda ch, k=k: _wloc(ch, k)[0] * K + k
        return lambda ch, k=k: 0 if B == K else k

    def row_specs():
        return [pl.BlockSpec(
            (1, 1, prev_len),
            functools.partial(lambda ch, k=0: (out_blk(k)(ch), 0, 0), k=k),
            memory_space=pltpu.VMEM,
        ) for k in range(K)]

    def col_specs():
        return [pl.BlockSpec(
            (1, 1, SUB, 128),
            functools.partial(
                lambda ch, k=0: (
                    out_blk(k)(ch),
                    jnp.clip(
                        (_wloc(ch, k)[1] if wrap else ch - k * offw) // q,
                        0, CT - 1,
                    ),
                    0, 0,
                ),
                k=k,
            ),
            memory_space=pltpu.VMEM,
        ) for k in range(K)]

    def blk_specs():
        return [pl.BlockSpec(
            (1, SUB, 128),
            functools.partial(lambda ch, k=0: (out_blk(k)(ch), 0, 0), k=k),
            memory_space=pltpu.VMEM,
        ) for k in range(K)]

    nrow = B if wrap else 1
    row_shape = jax.ShapeDtypeStruct((nrow, 1, prev_len), jnp.int32)
    col_shape = jax.ShapeDtypeStruct((nrow, CT, SUB, 128), jnp.int32)
    blk_shape = jax.ShapeDtypeStruct((nrow, SUB, 128), jnp.int32)

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
        pltpu.VMEM(((npk or K), SUB, 128), jnp.int32),  # xds (packedx: npk)
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # accs
        pltpu.VMEM((K, 1, 128), jnp.int32),    # prows
    ]
    if affine:
        scratch += [
            # e1s/f1s, or the shared packed delta words under packedef
            pltpu.VMEM(((npk2 or K), SUB, 128), jnp.int32),
            pltpu.VMEM(((npk2 or K), SUB, 128), jnp.int32),
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # accEs
            pltpu.VMEM((K, 1, 128), jnp.int32),    # prowFs
        ]
    if is_sw:
        scratch += [
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # bvs
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # bcs
        ]
    if subprow:
        # Per-chain bottom-sublane step scratch (sprow, + sprowF).
        scratch += [pltpu.VMEM((K, 128, 128), jnp.int32)]
        if affine:
            scratch += [pltpu.VMEM((K, 128, 128), jnp.int32)]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)

    def merge_rows(parts):
        # Chain k wrote only rows bbk*K + k of its own array; interleave.
        if not wrap:
            return jnp.concatenate([p[0] for p in parts], axis=0)
        return wrap_interleave([p[:, 0] for p in parts], BBtot, K,
                               (prev_len,))

    def merge_tail(parts, tail):
        if not wrap:
            return jnp.concatenate(parts, axis=0)
        return wrap_interleave(parts, BBtot, K, tail)

    pos = 0
    out = {"hrow": merge_rows(outs[pos: pos + K])}
    pos += K
    out["hcol"] = merge_tail(outs[pos: pos + K], (CT, SUB, 128))
    pos += K
    if affine:
        out["frow"] = merge_rows(outs[pos: pos + K])
        pos += K
        out["ecol"] = merge_tail(outs[pos: pos + K], (CT, SUB, 128))
        pos += K
    if is_sw:
        out["bv"] = merge_tail(outs[pos: pos + K], (SUB, 128))
        pos += K
        out["bc"] = merge_tail(outs[pos: pos + K], (SUB, 128))
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
