"""Banded single-pass v2 kernel: the per-device compute of the multi-chip
giant-pair engine (parallel/giant2.py).

One invocation fills K row blocks (R rows each) of a COLUMN BAND of the
global DP matrix, NW linear-gap. Everything that was analytic in the
full-matrix v2 kernel (ops/pallas_wavefront2.py) becomes an input here,
because the band no longer touches the true matrix edges:

  prev_row  (1, prev_len)   H[row0, c0 + j] — the row above this pass's
                            first block (previous pass output / header)
  hcolin    (K, SUB, 128)   H[i, c0] per lane — the band's left-edge
                            column for this pass's rows (ICI halo)
  dcolin    (K, SUB, 128)   H[i-1, c0] per lane (the halo shifted by one)
  seeds     (SMEM)          H[(blk+1)R, c0] per chain — the j==0 element
                            of each output row

The kernel keeps v2's machinery: K chains in echelon, lane-shift carries
via the two-roll trick, in-kernel packed substitution lookup, sparse
tile-header outputs. The right-edge halo for the next device falls out of
the hcol stream (the capture at local column band_cols, a TW multiple).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import NEG_INF_I32
from .pallas_wavefront2 import _cdiv, _pack_planes  # noqa: F401  (reused)


def _make_banded_kernel(*, K: int, SUB: int, W: int, CH: int, cols_p: int,
                        R: int, TW: int, OFF: int, prev_len: int):
    ninf = NEG_INF_I32
    n_win = W // 128
    q = TW // W

    def kernel(g_ref, previn, hcolin, dcolin, *rest):
        planes_refs = rest[0:K]
        xw_refs = rest[K: 2 * K]
        hrow_refs = rest[2 * K: 3 * K]
        hcol_refs = rest[3 * K: 4 * K]
        scr = rest[4 * K:]
        prevb = scr[0:K]
        v1s, shps, xds, accs, prows = scr[K:]

        ch = pl.program_id(0)
        g = g_ref[0, 0]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
        l_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        i2d = s_iota * 128 + l_iota
        hdrHs = [hcolin[k] for k in range(K)]
        dhdrs = [dcolin[k] for k in range(K)]

        @pl.when(ch == 0)
        def _init():
            prevb[K - 1][0:1, :] = previn[0:1, :]
            for k in range(K):
                v1s[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                shps[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                xds[k] = jnp.zeros((SUB, 128), jnp.int32)
                accs[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                prows[k] = jnp.where(
                    l_row == 0, g_ref[0, 1 + k], jnp.int32(ninf)
                )

        def shift2(v, fill):
            a = pltpu.roll(v, 1, axis=1)
            b = pltpu.roll(a, 1, axis=0)
            out = jnp.where(l_iota == 0, b, a)
            return jnp.where(i2d == 0, fill, out)

        planes = [[planes_refs[k][0, p] for p in range(8)] for k in range(K)]

        def window_body(w, carry):
            vs = list(carry)
            xws = [xw_refs[k][0, pl.ds(w, 1), :] for k in range(K)]
            clocs = [ch * W + w * 128 - k * OFF for k in range(K)]
            selbs = [jnp.mod(clocs[k] + 1, TW) for k in range(K)]
            pws = []
            for k in range(K):
                cwk = pl.multiple_of(
                    jnp.maximum(ch * W + w * 128 - k * OFF, 0), 128
                )
                cwk = pl.multiple_of(jnp.minimum(cwk, prev_len - 256), 128)
                kp = K - 1 if k == 0 else k - 1
                pws.append((
                    prevb[kp][0:1, pl.ds(cwk, 128)],
                    prevb[kp][0:1,
                              pl.ds(pl.multiple_of(cwk + 128, 128), 128)],
                ))

            for tt in range(128):
                for k in range(K):
                    v1, sh1p, xd, acc, prow = vs[5 * k: 5 * k + 5]
                    c = clocs[k] + tt
                    pw, pw2 = pws[k]

                    fillx = (
                        pltpu.roll(xws[k], 128 - tt, axis=1) if tt
                        else xws[k]
                    )
                    xd = shift2(xd, fillx)
                    P = planes[k]
                    wi = xd >> 2
                    b0 = (wi & 1) > 0
                    b1 = (wi & 2) > 0
                    b2 = (wi & 4) > 0
                    t01 = jnp.where(b0, P[1], P[0])
                    t23 = jnp.where(b0, P[3], P[2])
                    t45 = jnp.where(b0, P[5], P[4])
                    t67 = jnp.where(b0, P[7], P[6])
                    q0 = jnp.where(b1, t23, t01)
                    q1 = jnp.where(b1, t67, t45)
                    word = jnp.where(b2, q1, q0)
                    s = ((word >> ((xd & 3) << 3)) & 255) - 128

                    fill1 = (
                        pw2 if tt == 127
                        else pltpu.roll(pw, 127 - tt, axis=1)
                    )
                    sh1 = shift2(v1, fill1)
                    diag = jnp.where(i2d == c, dhdrs[k], sh1p)
                    left = jnp.where(i2d == c, hdrHs[k], v1)
                    cell = jnp.maximum(
                        diag + s, jnp.maximum(sh1, left) + g
                    )
                    valid = (i2d <= c) & (i2d > c - cols_p)
                    cell = jnp.where(valid, cell, ninf)

                    bot = cell[SUB - 1:SUB, :]
                    sel_p = (tt + 2) % 128
                    last = pltpu.roll(bot, (sel_p + 1) % 128, axis=1)
                    prow = jnp.where(
                        (l_row == sel_p) & (c >= R - 1), last, prow
                    )
                    if sel_p == 127:
                        cwk = jnp.maximum(ch * W + w * 128 - k * OFF, 0)

                        @pl.when((cwk >= R) & (cwk - R <= cols_p))
                        def _(prow=prow, cwk=cwk, k=k):
                            jb = pl.multiple_of(cwk - R, 128)
                            prevb[k][0:1, pl.ds(jb, 128)] = prow

                    if tt == 127:
                        @pl.when(jnp.mod(clocs[k], TW) == (R - 128) % TW)
                        def _(acc=acc, k=k):
                            hcol_refs[k][0, 0] = acc

                    sel = selbs[k] + tt
                    sel = sel - jnp.where(sel >= TW, TW, 0)
                    acc = jnp.where(i2d == sel, cell, acc)

                    vs[5 * k: 5 * k + 5] = [cell, sh1, xd, acc, prow]
            return tuple(vs)

        init = []
        for k in range(K):
            init += [v1s[k], shps[k], xds[k], accs[k], prows[k]]
        out = jax.lax.fori_loop(0, n_win, window_body, tuple(init))
        for k in range(K):
            v1s[k] = out[5 * k]
            shps[k] = out[5 * k + 1]
            xds[k] = out[5 * k + 2]
            accs[k] = out[5 * k + 3]
            prows[k] = out[5 * k + 4]

        @pl.when(ch == CH - 1)
        def _fin():
            for k in range(K):
                hrow_refs[k][0, :] = prevb[k][0, :]

    return kernel, q


@functools.partial(
    jax.jit,
    static_argnames=("R", "W", "TW", "K", "band_cols", "interpret"),
)
def banded_pass_nw_lg(subst_planes, xwin, gapo, prev_row, halo, *, R: int,
                      W: int, TW: int, K: int, band_cols: int,
                      interpret: bool = False):
    """One pass (K row blocks) over one column band.

    subst_planes: (K, 8, SUB, 128)  packed substitution rows for the blocks
    xwin: (NSpad//W, W//128, 128)   band letters X[c0 + t + 1]
    prev_row: (prev_len,)           H[row0, c0 + j]
    halo: (K*R + 1,)                H[row0 + r, c0] for r = 0..K*R

    Returns (hrow (K, prev_len), hcol (K, CT, SUB, 128)).
    """
    SUB = R // 128
    NSpad = xwin.shape[0] * W
    assert NSpad == _cdiv(R + band_cols - 1 + 128, W) * W
    prev_len = NSpad + 128

    OFF = W * _cdiv(R + 256, W)
    CH = (NSpad + (K - 1) * OFF) // W
    CT = _cdiv(CH, TW // W)

    kernel, q = _make_banded_kernel(
        K=K, SUB=SUB, W=W, CH=CH, cols_p=band_cols, R=R, TW=TW,
        OFF=OFF, prev_len=prev_len,
    )

    gvec = jnp.concatenate(
        [jnp.asarray(gapo, jnp.int32).reshape(1)]
        + [halo[(k + 1) * R].reshape(1) for k in range(K)]
    ).reshape(1, 1 + K)

    hcolin = halo[1:].reshape(K, SUB, 128)
    dcolin = halo[:-1].reshape(K, SUB, 128)
    previn = jnp.zeros((1, prev_len), jnp.int32).at[0, : prev_row.shape[0]].set(
        prev_row[:prev_len]
    )

    in_specs = [
        pl.BlockSpec((1, 1 + K), lambda ch: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, prev_len), lambda ch: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, SUB, 128), lambda ch: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, SUB, 128), lambda ch: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
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
                    jnp.clip(ch - k * (OFF // W), 0, NSpad // W - 1), 0, 0
                ),
                k=k,
            ),
            memory_space=pltpu.VMEM,
        ))

    out_specs = []
    out_shapes = []
    for k in range(K):
        out_specs.append(pl.BlockSpec(
            (1, prev_len), lambda ch, k=0: (0, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shapes.append(jax.ShapeDtypeStruct((1, prev_len), jnp.int32))
    for k in range(K):
        out_specs.append(pl.BlockSpec(
            (1, 1, SUB, 128),
            functools.partial(
                lambda ch, k=0: (
                    0, jnp.clip((ch - k * (OFF // W)) // q, 0, CT - 1),
                    0, 0,
                ),
                k=k,
            ),
            memory_space=pltpu.VMEM,
        ))
        out_shapes.append(
            jax.ShapeDtypeStruct((1, CT, SUB, 128), jnp.int32)
        )

    outs = pl.pallas_call(
        kernel,
        grid=(CH,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=(
            [pltpu.VMEM((1, prev_len), jnp.int32) for _ in range(K)]
            + [
                pltpu.VMEM((K, SUB, 128), jnp.int32),
                pltpu.VMEM((K, SUB, 128), jnp.int32),
                pltpu.VMEM((K, SUB, 128), jnp.int32),
                pltpu.VMEM((K, SUB, 128), jnp.int32),
                pltpu.VMEM((K, 1, 128), jnp.int32),
            ]
        ),
        interpret=interpret,
    )(gvec, previn, hcolin, dcolin, *([subst_planes] * K),
      *([xwin] * K))

    hrow = jnp.concatenate([outs[k] for k in range(K)], axis=0)
    hcol = jnp.concatenate([outs[K + k] for k in range(K)], axis=0)
    return hrow, hcol
