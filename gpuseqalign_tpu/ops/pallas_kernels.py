"""Pallas TPU wavefront kernels (+ portable XLA fallbacks).

Design (the TPU re-design of the reference's gpu8/gpu9 endpoint —
register-lane wavefront over sparse tile headers,
ref: src/nwalign_gpu8_mlsp_diagdiag.cu:179-305):

  * 128 VPU lanes each own one DP row of a 128-row block; the block is swept
    anti-diagonally in N+127 steps; the carries are the previous two
    diagonals, shifted by one lane per step (the lane-roll analog of
    __shfl_up_sync, ref: ...gpu8...cu:232).
  * The substitution lookup is pre-skewed (ops/skew.py) so each step reads
    one contiguous (1, 128) row — the separable pre-pass of the 2-pass
    kernels (ref: src/nwalign_gpu4_ml_diagdiag2pass.cu:88-132).
  * Row blocks are chained through a VMEM ping-pong carry row, so the whole
    matrix is ONE kernel launch — the natural TPU form of the cooperative
    grid-sync kernels (ref: src/nwalign_gpu5_coop_diagdiag.cu:87-310).
  * mlsp mode stores only O(n) tile-header rows/columns (HBM), exactly the
    reference's communication-minimal decomposition
    (ref: src/nwalign_gpu7_mlsp_diagdiag.cu:247-285).

On non-TPU backends (tests, CPU) the same algorithms run through the
portable XLA kernels in ops/xla_kernels.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.types import (
    AlgInput,
    AlgParams,
    AlgResult,
    AlignKind,
    GapKind,
    Status,
)
from . import xla_kernels as xk
from ..trace.sparse import TileCo, align_tile, get_tile_and_elem_ij


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# --------------------------------------------------------------------------
# Dense variant.
# --------------------------------------------------------------------------


def align_pallas_dense(pr: AlgParams, nw: AlgInput, res: AlgResult) -> Status:
    """Dense wavefront kernel (pallas_wavefront.py on TPU; XLA row-scan on
    other backends and for the spec variants the Pallas path doesn't cover
    yet)."""
    if _on_tpu() and nw.spec.kind == AlignKind.NW and nw.spec.gap == GapKind.LINEAR:
        from . import pallas_wavefront as pw

        return pw.align_dense(pr, nw, res)
    return xk.align_xla_rowscan(pr, nw, res)


# --------------------------------------------------------------------------
# Sparse (mlsp) variant.
# --------------------------------------------------------------------------


def _mlsp_setup(pr: AlgParams, nw: AlgInput):
    tile_h = int(pr.get("tileBy", 0) or 128)
    tile_w = int(pr.get("tileBx", 0) or 512)
    if tile_h < 1 or tile_w < 1:
        return None
    rows = nw.adjrows - 1
    cols = nw.adjcols - 1
    trows = max(1, -(-rows // tile_h))
    tcols = max(1, -(-cols // tile_w))
    return tile_h, tile_w, trows, tcols


def _mlsp_store(nw: AlgInput, res: AlgResult, hrows: np.ndarray,
                hcols: np.ndarray, tile_h: int, tile_w: int,
                trows: int, tcols: int) -> Status:
    """Convert kernel outputs to the reference sparse layout
    (ref: src/nwalign_gpu7_mlsp_diagdiag.cu:348-352) and recompute the last
    tile on host for align_cost (ref: ...gpu7...cu:619-622)."""
    nw.tile_hdr_mat_rows = trows
    nw.tile_hdr_mat_cols = tcols
    nw.tile_hrow_len = 1 + tile_w
    nw.tile_hcol_len = 1 + tile_h

    n_tiles = trows * tcols
    hrow_mat = np.zeros((n_tiles, 1 + tile_w), dtype=np.int32)
    hcol_mat = np.zeros((n_tiles, 1 + tile_h), dtype=np.int32)

    # hrows[it] = padded row it*tile_h (width >= 1 + tcols*tile_w).
    # hcols[it, r, jt] = H[it*tile_h + 1 + r, jt*tile_w].
    for it in range(trows):
        row = hrows[it]
        for jt in range(tcols):
            k = it * tcols + jt
            hrow_mat[k] = row[jt * tile_w: jt * tile_w + tile_w + 1]
            hcol_mat[k, 0] = row[jt * tile_w]
            hcol_mat[k, 1:] = hcols[it, :, jt]

    nw.tileHrowMat = hrow_mat
    nw.tileHcolMat = hcol_mat
    res.update_peak_mem(nw)

    # align_cost: host recompute of the bottom-right tile.
    co = get_tile_and_elem_ij(nw, nw.adjrows - 1, nw.adjcols - 1)
    tile = np.zeros((nw.tile_hcol_len, nw.tile_hrow_len), dtype=np.int32)
    align_tile(tile, nw, co)
    res.align_cost = int(tile[co.i_elem, co.j_elem])
    return Status.success


def align_pallas_mlsp(pr: AlgParams, nw: AlgInput, res: AlgResult) -> Status:
    """Sparse tile-header fill. NW linear-gap (the reference's mlsp surface).

    O(rows/tile_h * cols + rows * cols/tile_w) memory instead of O(rows*cols).
    """
    if not (nw.spec.kind == AlignKind.NW and nw.spec.gap == GapKind.LINEAR):
        return Status.errorInvalidValue
    setup = _mlsp_setup(pr, nw)
    if setup is None:
        return Status.errorInvalidValue
    tile_h, tile_w, trows, tcols = setup

    if _on_tpu():
        from . import pallas_wavefront as pw
        from . import pallas_wavefront2 as pw2

        if pw2.v2_params_ok(tile_h, tile_w, nw.adjrows - 1, nw.adjcols - 1):
            return pw2.align_mlsp_v2(
                pr, nw, res, tile_h, tile_w, trows, tcols
            )
        if pw.mlsp_params_ok(tile_h, tile_w):
            return pw.align_mlsp(pr, nw, res, tile_h, tile_w, trows, tcols)

    sw = res.sw_align
    sw.start()
    rows_p = trows * tile_h
    cols_p = tcols * tile_w
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

    hrows_d, hcols_d = xk.rowscan_mlsp(
        subst_d, y_d, x_d, jnp.int32(nw.gapo_cost),
        tile_h=tile_h, tile_w=tile_w, n_blocks=trows,
    )
    jax.block_until_ready((hrows_d, hcols_d))
    sw.lap("align.calc")

    hrows = np.asarray(jax.device_get(hrows_d))
    hcols = np.asarray(jax.device_get(hcols_d))
    sw.lap("align.cpy_host")
    nw.note_device_alloc(int(hrows.nbytes + hcols.nbytes))
    return _mlsp_store(nw, res, hrows, hcols, tile_h, tile_w, trows, tcols)
