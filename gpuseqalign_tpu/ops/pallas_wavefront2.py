"""Pallas TPU wavefront kernel v2: multi-chain echelon + in-kernel lookup.

Measured redesign of pallas_wavefront.py (v1), keeping its cell/lane layout
but removing v1's two bottlenecks (both found by microbenchmark on a v5e):

1. v1 pre-skewed the substitution profile in XLA — an O(rows x cols) gather
   + relayout costing ~3x the sweep itself and O(n^2) HBM. v2 computes the
   substitution value IN-KERNEL from packed bytes: each lane carries the
   skewed X letter (the same lane-shift dataflow as the DP carries — the
   analog of gpu8 keeping its operands in registers,
   ref: src/nwalign_gpu8_mlsp_diagdiag.cu:200-261), and looks it up in the
   lane's substitution row, packed 4-bytes-per-int32 into 8 VMEM-resident
   "planes" (a 3-level select tree + byte extract). The lookup is off the
   DP critical path, so it rides in the latency shadow. Memory for the
   whole substitution operand drops from O(rows x cols) to O(rows).

2. v1 ran ONE dependence chain; each anti-diagonal step was latency-bound
   (~53 cycles for a chain of roll->max->max). v2 interleaves K independent
   chains — K consecutive row blocks in echelon, chain k offset by
   OFF = R + W steps so block b*K+k only reads header-row windows its
   predecessor chain has already produced (the cross-block dataflow of the
   cooperative kernels, ref: src/nwalign_gpu5_coop_diagdiag.cu:87-310, but
   pipelined instead of barrier-synchronized). Measured: 4 chains run in
   ~the same wall clock as one.

Also replaces v1's lane-0 carry fix (a (SUB,1) column extract, ~75 cycles)
with a two-roll trick: roll(roll(v, 1, lanes), 1, sublanes) has exactly the
wanted v[s-1, 127] at every lane-0 position.

Sparse (mlsp) NW linear-gap only — the flagship path (the reference's
gpu7-9 surface, ref: src/nwalign_gpu7_mlsp_diagdiag.cu:247-285). Dense and
other specs route through v1 / the XLA kernels.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import AlgInput, AlgParams, AlgResult, NEG_INF_I32, Status


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _make_kernel(*, K: int, SUB: int, W: int, CH: int, cols_p: int, R: int,
                 TW: int, OFF: int, prev_len: int, B: int):
    ninf = NEG_INF_I32
    n_win = W // 128
    q = TW // W  # hcol out-blocks advance every q chunks
    offw = OFF // W

    def kernel(*refs):
        g_ref = refs[0]
        planes_refs = refs[1: 1 + K]
        xw_refs = refs[1 + K: 1 + 2 * K]
        hrow_refs = refs[1 + 2 * K: 1 + 3 * K]
        hcol_refs = refs[1 + 3 * K: 1 + 4 * K]
        prevb = refs[1 + 4 * K: 1 + 5 * K]
        (v1s, shps, xds, accs, prows) = refs[1 + 5 * K:]

        bb = pl.program_id(0)
        ch = pl.program_id(1)
        g = g_ref[0, 0]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
        l_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        i2d = s_iota * 128 + l_iota
        hdrs = [(1 + (bb * K + k) * R + i2d) * g for k in range(K)]

        @pl.when(ch == 0)
        def _init():
            @pl.when(bb == 0)
            def _():
                # Global header row H[0, j] = j*g into chain K-1's buffer
                # (chain 0 of pass 0 reads it as its predecessor row).
                jidx = jax.lax.broadcasted_iota(jnp.int32, (1, prev_len), 1)
                prevb[K - 1][0:1, :] = jidx * g
            for k in range(K):
                v1s[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                shps[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                xds[k] = jnp.zeros((SUB, 128), jnp.int32)
                accs[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                # prow window accumulator; j == 0 header element seeded.
                prows[k] = jnp.where(
                    l_row == 0, ((bb * K + k + 1) * R) * g, jnp.int32(ninf)
                )

        def shift2(v, fill):
            # out[i] = v[i-1] (linear, not circular); out[0] = fill's lane 0.
            a = pltpu.roll(v, 1, axis=1)
            b = pltpu.roll(a, 1, axis=0)  # b[s,0] == v[s-1,127]
            out = jnp.where(l_iota == 0, b, a)
            return jnp.where(i2d == 0, fill, out)

        # Plane words resident for the whole program (8 x (SUB,128) per
        # chain): the per-lane substitution row, biased bytes.
        planes = [[planes_refs[k][0, p] for p in range(8)] for k in range(K)]

        def window_body(w, carry):
            vs = list(carry)
            xws = [xw_refs[k][0, pl.ds(w, 1), :] for k in range(K)]
            # Per-window scalars (hoisted: per-step modulo/compare scalar
            # work measurably stalls the vector pipeline).
            clocs = [ch * W + w * 128 - k * OFF for k in range(K)]
            selbs = [jnp.mod(clocs[k] + 1, TW) for k in range(K)]
            pws = []
            for k in range(K):
                cwk = pl.multiple_of(
                    jnp.maximum(ch * W + w * 128 - k * OFF, 0), 128
                )
                # Clamp so drain-phase reads stay inside the buffer (OOB
                # VMEM accesses are NOT clamped on real TPUs — they spill
                # into the adjacent allocation).
                cwk = pl.multiple_of(
                    jnp.minimum(cwk, prev_len - 256), 128
                )
                kp = K - 1 if k == 0 else k - 1
                pws.append((
                    prevb[kp][0:1, pl.ds(cwk, 128)],
                    prevb[kp][0:1,
                              pl.ds(pl.multiple_of(cwk + 128, 128), 128)],
                ))

            for tt in range(128):
                for k in range(K):
                    v1, sh1p, xd, acc, prow = (
                        vs[5 * k], vs[5 * k + 1], vs[5 * k + 2],
                        vs[5 * k + 3], vs[5 * k + 4],
                    )
                    c = clocs[k] + tt
                    pw, pw2 = pws[k]

                    # --- substitution: skewed X letter + packed lookup ---
                    fillx = (
                        pltpu.roll(xws[k], 128 - tt, axis=1) if tt else xws[k]
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

                    # --- DP step ---
                    fill1 = (
                        pw2 if tt == 127
                        else pltpu.roll(pw, 127 - tt, axis=1)
                    )
                    sh1 = shift2(v1, fill1)  # lane0 <- prev[c+1]
                    # sh1p (last step's sh1) has lane0 == prev[c] — exactly
                    # the diagonal operand's header fill.
                    diag = jnp.where(i2d == c, hdrs[k] - g, sh1p)
                    left = jnp.where(i2d == c, hdrs[k], v1)
                    cell = jnp.maximum(
                        diag + s, jnp.maximum(sh1, left) + g
                    )
                    valid = (i2d <= c) & (i2d > c - cols_p)
                    cell = jnp.where(valid, cell, ninf)

                    # --- output-row capture (H[(b+1)R, j]) ---
                    # The wanted scalar lives at lane (SUB-1, 127). A (1,1)
                    # lane extract costs ~75 cycles on TPU; instead take the
                    # last sublane (cheap) and statically rotate its lane
                    # 127 onto the accumulator position sel_p.
                    bot = cell[SUB - 1:SUB, :]
                    sel_p = (tt + 2) % 128
                    last = pltpu.roll(bot, (sel_p + 1) % 128, axis=1)
                    prow = jnp.where(
                        (l_row == sel_p) & (c >= R - 1), last, prow
                    )
                    if sel_p == 127:
                        cwk = jnp.maximum(ch * W + w * 128 - k * OFF, 0)

                        # Upper gate: windows past cols_p are drain-phase
                        # junk AND would store out of bounds (real-TPU OOB
                        # stores wrap into the next scratch buffer).
                        @pl.when((cwk >= R) & (cwk - R <= cols_p))
                        def _(prow=prow, cwk=cwk, k=k):
                            jb = pl.multiple_of(cwk - R, 128)
                            prevb[k][0:1, pl.ds(jb, 128)] = prow

                    # --- tile-header-column capture (flush BEFORE update,
                    # v1 semantics). The flush step c % TW == R-1 can only
                    # land on tt == 127 (R and TW are multiples of 128), so
                    # the predicated store is hoisted out of the hot steps.
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
                hrow_refs[k][0, 0, :] = prevb[k][0, :]

    return kernel, q, offw


def _pack_planes(subst, Y, B, R):
    """(B, 8, SUB, 128) int32: per-DP-row substitution rows, 4 biased bytes
    per word. planes[b, p] lane (s, l) = rows Y[1 + b*R + s*128 + l],
    letters 4p..4p+3."""
    SUB = R // 128
    substsz = subst.shape[0]
    sp = jnp.zeros((32, 32), jnp.int32).at[:substsz, :substsz].set(subst)
    SY = sp[Y[1:]] + 128  # (rows_p, 32) biased bytes
    w = (
        SY[:, 0::4] | (SY[:, 1::4] << 8) | (SY[:, 2::4] << 16)
        | (SY[:, 3::4] << 24)
    )  # (rows_p, 8)
    return w.reshape(B, SUB, 128, 8).transpose(0, 3, 1, 2)


@functools.partial(
    jax.jit, static_argnames=("R", "W", "TW", "K", "interpret")
)
def pallas_mlsp_nw_lg_v2(subst, Y, X, gapo, *, R: int, W: int, TW: int,
                         K: int, interpret: bool = False):
    """Sparse fill v2. Same contract as v1's pallas_mlsp_nw_lg:

    hrow: (B, prev_len)         row (b+1)*R of H (indexed by global j)
    hcol: (B, CT, SUB, 128)     hcol[b, jt] = H[b*R+1 .. (b+1)*R, jt*TW]

    Requires rows_p % (K*R) == 0, cols_p % TW == 0, TW % W == 0, TW >= R,
    W % 128 == 0.
    """
    rows_p = Y.shape[0] - 1
    cols_p = X.shape[0] - 1
    SUB = R // 128
    B = rows_p // R
    BB = B // K
    # Echelon offset: chain k reads 256-wide predecessor-row windows that
    # the predecessor flushes R+128 steps after computing them, so the
    # chains must be at least R+256 steps apart; rounded up to a multiple
    # of W because the xwin/hcol index maps shift in whole chunks.
    OFF = W * _cdiv(R + 256, W)
    NS = R + cols_p - 1
    NSpad = _cdiv(NS + 128, W) * W
    CH = (NSpad + (K - 1) * OFF) // W
    prev_len = NSpad + 128
    CT = _cdiv(CH, TW // W)
    offw = OFF // W

    planes = _pack_planes(subst, Y, B, R)
    # xwin[ch, w, t] = X[ch*W + w*128 + t + 1]; zero-padded past the end.
    xpad = jnp.zeros(NSpad + 1, jnp.int32)
    xpad = xpad.at[: cols_p].set(X[1:])
    xwin = xpad[:NSpad].reshape(NSpad // W, W // 128, 128)

    kernel, q, _ = _make_kernel(
        K=K, SUB=SUB, W=W, CH=CH, cols_p=cols_p, R=R, TW=TW, OFF=OFF,
        prev_len=prev_len, B=B,
    )
    gmat = jnp.full((1, 1), gapo, jnp.int32)

    in_specs = [pl.BlockSpec((1, 1), lambda bb, ch: (0, 0),
                             memory_space=pltpu.SMEM)]
    for k in range(K):
        in_specs.append(pl.BlockSpec(
            (1, 8, SUB, 128),
            functools.partial(
                lambda bb, ch, k=0: (bb * K + k, 0, 0, 0), k=k
            ),
            memory_space=pltpu.VMEM,
        ))
    for k in range(K):
        in_specs.append(pl.BlockSpec(
            (1, W // 128, 128),
            functools.partial(
                lambda bb, ch, k=0: (
                    jnp.clip(ch - k * offw, 0, NSpad // W - 1), 0, 0
                ),
                k=k,
            ),
            memory_space=pltpu.VMEM,
        ))
    out_specs = []
    out_shapes = []
    for k in range(K):
        out_specs.append(pl.BlockSpec(
            (1, 1, prev_len),
            functools.partial(
                lambda bb, ch, k=0: (bb * K + k, 0, 0), k=k
            ),
            memory_space=pltpu.VMEM,
        ))
        out_shapes.append(
            jax.ShapeDtypeStruct((B, 1, prev_len), jnp.int32)
        )
    for k in range(K):
        out_specs.append(pl.BlockSpec(
            (1, 1, SUB, 128),
            functools.partial(
                lambda bb, ch, k=0: (
                    bb * K + k, jnp.clip((ch - k * offw) // q, 0, CT - 1),
                    0, 0,
                ),
                k=k,
            ),
            memory_space=pltpu.VMEM,
        ))
        out_shapes.append(
            jax.ShapeDtypeStruct((B, CT, SUB, 128), jnp.int32)
        )

    outs = pl.pallas_call(
        kernel,
        grid=(BB, CH),
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
    )(gmat, *([planes] * K), *([xwin] * K))

    # Chain k wrote only rows bb*K + k of its own output array; interleave.
    hrow = jnp.stack(
        [outs[k].reshape(BB, K, prev_len)[:, k] for k in range(K)], axis=1
    ).reshape(B, prev_len)
    hcol = jnp.stack(
        [outs[K + k].reshape(BB, K, CT, SUB, 128)[:, k] for k in range(K)],
        axis=1,
    ).reshape(B, CT, SUB, 128)
    return hrow, hcol


def v2_params_ok(tile_h: int, tile_w: int, rows: int, cols: int) -> bool:
    W = min(512, tile_w)
    return (
        tile_h % 128 == 0
        and tile_w % 128 == 0
        and tile_w >= tile_h
        and tile_w % W == 0
    )


def choose_k(trows: int, k_max: int = 6) -> int:
    """Number of interleaved chains. Measured on v5e: throughput rises
    through K=6 (55.9 GCUPS at 23728^2, R=TW=2048) and collapses at K=8
    (register spills: 8 chains x 8 resident plane words exceed the vreg
    budget)."""
    for k in (k_max, 4, 2, 1):
        if k <= trows:
            return k
    return 1


def align_mlsp_v2(pr: AlgParams, nw: AlgInput, res: AlgResult,
                  tile_h: int, tile_w: int, trows: int, tcols: int,
                  interpret: bool = False) -> Status:
    """Host wrapper matching v1's align_mlsp contract (same output massage
    into the reference sparse layout)."""
    from .pallas_kernels import _mlsp_store

    sw = res.sw_align
    sw.start()
    rows = nw.adjrows - 1
    cols = nw.adjcols - 1
    R = tile_h
    TW = tile_w
    W = min(512, TW)
    K = choose_k(trows, int(pr.get("kChains", 0) or 4))
    trows_p = _cdiv(trows, K) * K  # pad row blocks so B % K == 0
    rows_p = trows_p * R
    cols_p = tcols * TW
    y = np.zeros(1 + rows_p, np.int32)
    x = np.zeros(1 + cols_p, np.int32)
    y[: nw.adjrows] = nw.seqY
    x[: nw.adjcols] = nw.seqX
    sw.lap("align.alloc")

    subst_d = jax.device_put(nw.subst)
    y_d = jax.device_put(y)
    x_d = jax.device_put(x)
    jax.block_until_ready((subst_d, y_d, x_d))
    sw.lap("align.cpy_dev")

    hrow_d, hcol_d = pallas_mlsp_nw_lg_v2(
        subst_d, y_d, x_d, jnp.int32(nw.gapo_cost), R=R, W=W, TW=TW, K=K,
        interpret=interpret,
    )
    jax.block_until_ready((hrow_d, hcol_d))
    sw.lap("align.calc")

    hrow = np.asarray(jax.device_get(hrow_d))
    hcol = np.asarray(jax.device_get(hcol_d))
    sw.lap("align.cpy_host")
    nw.note_device_alloc(int(hrow.nbytes + hcol.nbytes))

    g = nw.gapo_cost
    width = cols_p + 1
    hrows = np.empty((trows, width), dtype=np.int32)
    hrows[0] = (np.arange(width, dtype=np.int64) * g).astype(np.int32)
    if trows > 1:
        hrows[1:] = hrow[: trows - 1, :width]
    hcols = np.empty((trows, R, tcols), dtype=np.int32)
    col0 = (
        np.arange(1, trows * R + 1, dtype=np.int64) * g
    ).astype(np.int32).reshape(trows, R)
    hcols[:, :, 0] = col0
    if tcols > 1:
        hc = hcol.reshape(trows_p, -1, R)
        hcols[:, :, 1:] = np.transpose(hc[:trows, 1:tcols, :], (0, 2, 1))
    return _mlsp_store(nw, res, hrows, hcols, tile_h, tile_w, trows, tcols)
