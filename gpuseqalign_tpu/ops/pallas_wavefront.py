"""Handwritten Pallas (Mosaic TPU) wavefront kernels for NW linear gap.

The whole DP matrix is filled by ONE pallas_call:

  grid = (B row-blocks, CH step-chunks), iterated sequentially (ch fastest).
  Each block owns R = SUB*128 DP rows; lane (s, l) of the (SUB, 128) vector
  owns row i = 1 + b*R + s*128 + l. The block is swept anti-diagonally in
  NS = cols + R - 1 steps; at step c, lane r holds cell (row r, col c-r+1).

  carries (VPU registers): v1 = previous diagonal, v2 = the one before;
  the up/diag operands are v1/v2 shifted DOWN one lane (pltpu.roll + a
  sublane-boundary fix) — the TPU analog of gpu8's __shfl_up_sync carry
  (ref: src/nwalign_gpu8_mlsp_diagdiag.cu:200-261).

  The substitution operand is pre-skewed in XLA (ops/skew.py) so step c
  reads the contiguous row Pskew[c, :] — the separable pre-pass of the
  reference's 2-pass kernels (ref: src/nwalign_gpu4_ml_diagdiag2pass.cu:88-132),
  and the parallelogram skew of gpu9 (ref: ...gpu9...cu:205-316).

  Row blocks chain through a VMEM carry row (prev/prevn), so there is no
  HBM round-trip between blocks — the natural form of the cooperative
  grid-sync kernels (ref: src/nwalign_gpu5_coop_diagdiag.cu:87-310).

Outputs:
  dense: the full wavefront history (unskewed back to H rows in XLA).
  mlsp:  only tile-header rows (the per-block carry rows) and tile-header
         columns (extracted in-kernel with a moving one-lane select), i.e.
         O(n^2/tile) HBM instead of O(n^2)
         (ref: src/nwalign_gpu7_mlsp_diagdiag.cu:247-285).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import (
    AlgInput,
    AlgParams,
    AlgResult,
    NEG_INF_I32,
    Status,
)
from .skew import skew_rows, unskew_cols


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _make_kernel(*, SUB: int, W: int, CH: int, cols_p: int, R: int,
                 TW: int, mlsp: bool, prev_len: int):
    ninf = NEG_INF_I32  # plain int: jnp constants may not be captured
    q = (TW // W) if mlsp else 1

    n_win = W // 128  # 128-step windows per chunk (W % 128 == 0)

    def kernel(g_ref, pskew_ref, *rest):
        if mlsp:
            hrow_ref, hcol_ref, prev_ref, prevn_ref, v1s, v2s, accs, prows = rest
        else:
            vhist_ref, prev_ref, prevn_ref, v1s, v2s, prows = rest
        b = pl.program_id(0)
        ch = pl.program_id(1)
        g = g_ref[0, 0]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
        l_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        i2d = s_iota * 128 + l_iota
        i0 = 1 + b * R
        hdr = (i0 + i2d) * g  # H[i, 0] header-column values for this block

        @pl.when(ch == 0)
        def _init():
            @pl.when(b == 0)
            def _():
                jidx = jax.lax.broadcasted_iota(jnp.int32, (1, prev_len), 1)
                prev_ref[:, :] = jidx * g  # global header row: H[0, j] = j*g
            v1s[:, :] = jnp.full((SUB, 128), ninf, jnp.int32)
            v2s[:, :] = jnp.full((SUB, 128), ninf, jnp.int32)
            if mlsp:
                accs[:, :] = jnp.full((SUB, 128), ninf, jnp.int32)
            # prow accumulates the block's output row H[(b+1)*R, j] in
            # 128-wide windows; j == 0 is the header element, never computed
            # by a lane, so it is seeded here.
            prows[:, :] = jnp.where(
                l_row == 0, (i0 + R - 1) * g, jnp.int32(ninf)
            )

        def shift_down(v, fill):
            # out[i] = v[i-1]; lane (s, 0) takes v[s-1, 127]; i==0 takes fill.
            # fill is a (1, 128) row whose lane 0 holds the wanted value —
            # only position (0, 0) of it is ever selected.
            rolled = pltpu.roll(v, 1, axis=1)
            if SUB > 1:
                colfix = pltpu.roll(v[:, 127:128], 1, axis=0)
                rolled = jnp.where(l_iota == 0, colfix, rolled)
            return jnp.where(i2d == 0, fill, rolled)

        def window_body(w, carry):
            if mlsp:
                v1, v2, acc, prow = carry
            else:
                v1, v2, prow = carry
            cw = pl.multiple_of(ch * W + w * 128, 128)
            # Aligned (1, 128) windows of the carry row; lane-0 fills are
            # produced with STATIC rolls (Mosaic only allows 128-aligned
            # vector loads from VMEM — no unaligned scalar access).
            pw = prev_ref[:, pl.ds(cw, 128)]
            pw2 = prev_ref[:, pl.ds(pl.multiple_of(cw + 128, 128), 128)]

            for tt in range(128):  # static unroll
                t = w * 128 + tt
                c = cw + tt
                s = pskew_ref[0, t]  # (SUB, 128) substitution diagonal
                # Left-roll by k == right-roll by 128-k (shift must be >= 0).
                fill2 = pltpu.roll(pw, 128 - tt, axis=1) if tt else pw
                fill1 = (
                    pw2 if tt == 127 else pltpu.roll(pw, 127 - tt, axis=1)
                )
                sh2 = shift_down(v2, fill2)  # lane0 <- prev[c]
                sh1 = shift_down(v1, fill1)  # lane0 <- prev[c+1]
                # Lane r == c is column u=0 (j=1): diag/left come from the
                # header column H[i-1,0], H[i,0].
                diag = jnp.where(i2d == c, hdr - g, sh2)
                left = jnp.where(i2d == c, hdr, v1)
                cell = jnp.maximum(diag + s, jnp.maximum(sh1, left) + g)
                valid = (i2d <= c) & (i2d > c - cols_p)
                cell = jnp.where(valid, cell, ninf)

                if not mlsp:
                    vhist_ref[0, t] = cell

                # Block-output-row capture: lane R-1 at step c holds
                # H[(b+1)*R, j], j = c - R + 2; j % 128 == (tt+2) % 128.
                last = cell[SUB - 1:SUB, 127:128]
                sel_p = (tt + 2) % 128
                prow = jnp.where((l_row == sel_p) & (c >= R - 1), last, prow)
                if sel_p == 127:  # window [cw-R, cw-R+127] complete
                    @pl.when(cw >= R)
                    def _(prow=prow, cw=cw):
                        jb = pl.multiple_of(cw - R, 128)
                        prevn_ref[:, pl.ds(jb, 128)] = prow

                if mlsp:
                    # Tile-header-column extraction: flush BEFORE updating —
                    # at c = j0 + R - 1 lane R-1 was captured last step, and
                    # when R == TW this step already belongs to the next col.
                    @pl.when(c % TW == R - 1)
                    def _(acc=acc):
                        hcol_ref[0, 0] = acc

                    sel = (c + 1) % TW
                    acc = jnp.where(i2d == sel, cell, acc)

                v2 = v1
                v1 = cell

            if mlsp:
                return (v1, v2, acc, prow)
            return (v1, v2, prow)

        if mlsp:
            init = (v1s[:, :], v2s[:, :], accs[:, :], prows[:, :])
        else:
            init = (v1s[:, :], v2s[:, :], prows[:, :])
        out = jax.lax.fori_loop(0, n_win, window_body, init)
        v1s[:, :] = out[0]
        v2s[:, :] = out[1]
        if mlsp:
            accs[:, :] = out[2]
        prows[:, :] = out[-1]

        @pl.when(ch == CH - 1)
        def _fin():
            if mlsp:
                hrow_ref[0, 0, :] = prevn_ref[0, :]
            prev_ref[0, :] = prevn_ref[0, :]

    return kernel, q


def _build_pskew(subst, Y, X, B, R, NSpad):
    # Kernel expects Pskew[c, r] = P[r, c-r] (lane r = row r): that is the
    # skew of P TRANSPOSED, since skew_rows(A)[d, j] = A[d-j, j].
    cols_p = X.shape[0] - 1
    P = subst[Y[1:]][:, X[1:]]  # (rows_p, cols_p) profile
    S = jax.vmap(lambda p: skew_rows(jnp, p.T))(P.reshape(B, R, cols_p))
    NS = R + cols_p - 1
    S = jnp.pad(S, ((0, 0), (0, NSpad - NS), (0, 0)))
    return S.reshape(B, NSpad, R // 128, 128)


@functools.partial(
    jax.jit, static_argnames=("R", "W", "interpret")
)
def pallas_dense_nw_lg(subst, Y, X, gapo, *, R: int, W: int,
                       interpret: bool = False):
    """Full dense H for NW linear gap. Y/X include header elements and are
    padded so rows_p % R == 0 and cols_p % 128 == 0."""
    rows_p = Y.shape[0] - 1
    cols_p = X.shape[0] - 1
    SUB = R // 128
    B = rows_p // R
    NS = R + cols_p - 1
    # +128 slack so the final 128-wide output-row window gets flushed.
    NSpad = _cdiv(NS + 128, W) * W
    CH = NSpad // W
    prev_len = NSpad + 128

    pskew = _build_pskew(subst, Y, X, B, R, NSpad)
    kernel, _ = _make_kernel(
        SUB=SUB, W=W, CH=CH, cols_p=cols_p, R=R, TW=W, mlsp=False,
        prev_len=prev_len,
    )
    gmat = jnp.full((1, 1), gapo, jnp.int32)
    vhist = pl.pallas_call(
        kernel,
        grid=(B, CH),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, ch: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, W, SUB, 128), lambda b, ch: (b, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W, SUB, 128), lambda b, ch: (b, ch, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NSpad, SUB, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, prev_len), jnp.int32),
            pltpu.VMEM((1, prev_len), jnp.int32),
            pltpu.VMEM((SUB, 128), jnp.int32),
            pltpu.VMEM((SUB, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(gmat, pskew)

    V = vhist.reshape(B, NSpad, R)
    Hb = jax.vmap(lambda v: unskew_cols(jnp, v, cols_p))(V)  # (B, R, cols_p)
    H = Hb.reshape(rows_p, cols_p)
    top = (jnp.arange(1 + cols_p, dtype=jnp.int32) * gapo)[None, :]
    left = (jnp.arange(1, 1 + rows_p, dtype=jnp.int32) * gapo)[:, None]
    return jnp.concatenate(
        [top, jnp.concatenate([left, H], axis=1)], axis=0
    )


@functools.partial(
    jax.jit, static_argnames=("R", "W", "TW", "interpret")
)
def pallas_mlsp_nw_lg(subst, Y, X, gapo, *, R: int, W: int, TW: int,
                      interpret: bool = False):
    """Sparse fill: returns (hrow, hcol).

    hrow: (B, prev_len)         row (b+1)*R of H (indexed by global j)
    hcol: (B, CT, SUB, 128)     hcol[b, jt] = H[b*R+1 .. (b+1)*R, jt*TW]
    Requires rows_p % R == 0, cols_p % TW == 0, TW % W == 0, TW >= R.
    """
    rows_p = Y.shape[0] - 1
    cols_p = X.shape[0] - 1
    SUB = R // 128
    B = rows_p // R
    NS = R + cols_p - 1
    # +128 slack so the final 128-wide output-row window gets flushed.
    NSpad = _cdiv(NS + 128, W) * W
    CH = NSpad // W
    prev_len = NSpad + 128

    pskew = _build_pskew(subst, Y, X, B, R, NSpad)
    kernel, q = _make_kernel(
        SUB=SUB, W=W, CH=CH, cols_p=cols_p, R=R, TW=TW, mlsp=True,
        prev_len=prev_len,
    )
    CT = _cdiv(CH, q)
    gmat = jnp.full((1, 1), gapo, jnp.int32)
    hrow, hcol = pl.pallas_call(
        kernel,
        grid=(B, CH),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, ch: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, W, SUB, 128), lambda b, ch: (b, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, prev_len), lambda b, ch: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, 128), lambda b, ch: (b, ch // q, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, prev_len), jnp.int32),
            jax.ShapeDtypeStruct((B, CT, SUB, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, prev_len), jnp.int32),
            pltpu.VMEM((1, prev_len), jnp.int32),
            pltpu.VMEM((SUB, 128), jnp.int32),
            pltpu.VMEM((SUB, 128), jnp.int32),
            pltpu.VMEM((SUB, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(gmat, pskew)
    return hrow.reshape(B, prev_len), hcol


# --------------------------------------------------------------------------
# Host wrappers used by ops/pallas_kernels.py.
# --------------------------------------------------------------------------


def _v1_vmem_bytes(R: int, W: int, prev_len: int, mlsp: bool) -> int:
    """Analytic VMEM peak of one v1 pallas_call (scratch + 2x-buffered
    in/out blocks; ref analog: src/nwalign_shared.cpp:5-25)."""
    i32 = 4
    SUB = R // 128
    blk = SUB * 128 * i32
    scratch = 2 * prev_len * i32 + (3 if mlsp else 2) * blk + 128 * i32
    ins = W * SUB * 128 * i32          # pre-skewed profile window
    outs = (prev_len * i32 + blk) if mlsp else W * SUB * 128 * i32
    return scratch + 2 * (ins + outs)


def _choose_r(rows: int, tile_by: int) -> int:
    if tile_by and tile_by % 128 == 0:
        return tile_by
    return min(1024, max(128, _cdiv(rows, 128) * 128))


def align_dense(pr: AlgParams, nw: AlgInput, res: AlgResult,
                interpret: bool = False) -> Status:
    from .xla_kernels import _finish_dense_from_device

    sw = res.sw_align
    sw.start()
    rows = nw.adjrows - 1
    cols = nw.adjcols - 1
    R = _choose_r(rows, int(pr.get("tileBy", 0) or 0))
    W = 256
    rows_p = _cdiv(max(rows, 1), R) * R
    cols_p = _cdiv(max(cols, 1), 128) * 128
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

    H_dev = pallas_dense_nw_lg(
        subst_d, y_d, x_d, jnp.int32(nw.gapo_cost), R=R, W=W,
        interpret=interpret,
    )
    jax.block_until_ready(H_dev)
    sw.lap("align.calc")
    NSpad = _cdiv(R + cols_p - 1 + 128, W) * W
    res.shmem_peak_allocs = max(
        res.shmem_peak_allocs, _v1_vmem_bytes(R, W, NSpad + 128, False)
    )
    return _finish_dense_from_device(nw, res, H_dev)


def align_mlsp(pr: AlgParams, nw: AlgInput, res: AlgResult,
               tile_h: int, tile_w: int, trows: int, tcols: int,
               interpret: bool = False) -> Status:
    from .pallas_kernels import _mlsp_store

    sw = res.sw_align
    sw.start()
    rows = nw.adjrows - 1
    cols = nw.adjcols - 1
    R = tile_h
    TW = tile_w
    W = min(512, TW)
    rows_p = trows * R
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

    hrow_d, hcol_d = pallas_mlsp_nw_lg(
        subst_d, y_d, x_d, jnp.int32(nw.gapo_cost), R=R, W=W, TW=TW,
        interpret=interpret,
    )
    jax.block_until_ready((hrow_d, hcol_d))
    sw.lap("align.calc")

    hrow = np.asarray(jax.device_get(hrow_d))
    hcol = np.asarray(jax.device_get(hcol_d))
    sw.lap("align.cpy_host")
    nw.note_device_alloc(int(hrow.nbytes + hcol.nbytes))
    NSpad = _cdiv(R + cols_p - 1 + 128, W) * W
    res.shmem_peak_allocs = max(
        res.shmem_peak_allocs, _v1_vmem_bytes(R, W, NSpad + 128, True)
    )

    # Convert kernel outputs to the generic (hrows, hcols) form used by
    # _mlsp_store: hrows[it] = row it*R; hcols[it, r, jt] = H[it*R+1+r, jt*TW].
    g = nw.gapo_cost
    width = cols_p + 1
    hrows = np.empty((trows, width), dtype=np.int32)
    hrows[0] = (np.arange(width, dtype=np.int64) * g).astype(np.int32)
    if trows > 1:
        hrows[1:] = hrow[: trows - 1, :width]
    hcols = np.empty((trows, R, tcols), dtype=np.int32)
    col0 = (
        np.arange(1, rows_p + 1, dtype=np.int64) * g
    ).astype(np.int32).reshape(trows, R)
    hcols[:, :, 0] = col0
    if tcols > 1:
        # hcol[b, jt] holds column jt*TW for jt >= 1 at block index jt.
        hc = hcol.reshape(trows, -1, R)
        hcols[:, :, 1:] = np.transpose(hc[:, 1:tcols, :], (0, 2, 1))
    return _mlsp_store(nw, res, hrows, hcols, tile_h, tile_w, trows, tcols)


def mlsp_params_ok(tile_h: int, tile_w: int) -> bool:
    return (
        tile_h % 128 == 0
        and tile_w % 128 == 0
        and tile_w >= tile_h
        and tile_w % min(512, tile_w) == 0
    )
