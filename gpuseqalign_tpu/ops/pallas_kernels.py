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
    """Dense wavefront kernel: the dense v2 Pallas kernel for ALL specs on
    TPU (in-kernel lookup + per-step wavefront history, unskewed in XLA —
    no O(n^2) input); XLA row-scan on other backends."""
    affine_ok = nw.spec.gap != GapKind.AFFINE or (
        nw.gapo_cost <= 0 and nw.gape_cost <= 0
    )
    if _on_tpu() and affine_ok:
        from . import pallas_wavefront2 as pw2

        return pw2.align_dense_v2(pr, nw, res)
    return xk.align_xla_rowscan(pr, nw, res)


# --------------------------------------------------------------------------
# Sparse (mlsp) variant.
# --------------------------------------------------------------------------


def _mlsp_setup(pr: AlgParams, nw: AlgInput):
    # Defaults: on TPU from the autotuner cache (resrc/tuned/<device>.json
    # via pallas_wavefront2.tuned_defaults), else portable literals.
    tile_h_def, tile_w_def = 128, 512
    if _on_tpu():
        from .pallas_wavefront2 import tuned_defaults

        tuned = tuned_defaults(nw.spec.kind.value, nw.spec.gap.value)
        tile_h_def = int(tuned.get("tileBy", tile_h_def))
        tile_w_def = int(tuned.get("tileBx", tile_w_def))
    tile_h = int(pr.get("tileBy", 0) or tile_h_def)
    tile_w = int(pr.get("tileBx", 0) or tile_w_def)
    if tile_h < 1 or tile_w < 1:
        return None
    rows = nw.adjrows - 1
    cols = nw.adjcols - 1
    trows = max(1, -(-rows // tile_h))
    tcols = max(1, -(-cols // tile_w))
    return tile_h, tile_w, trows, tcols


def _hdr_split(vals: np.ndarray, tile_len: int, n_t: int) -> np.ndarray:
    """Split a full-width header vector into overlapping per-tile windows."""
    out = np.zeros((n_t, 1 + tile_len), dtype=np.int32)
    for t in range(n_t):
        out[t] = vals[t * tile_len: t * tile_len + tile_len + 1]
    return out


def _mlsp_store(nw: AlgInput, res: AlgResult, hrows: np.ndarray,
                hcols: np.ndarray, tile_h: int, tile_w: int,
                trows: int, tcols: int,
                frows: "np.ndarray | None" = None,
                ecols: "np.ndarray | None" = None,
                best: "np.ndarray | None" = None) -> Status:
    """Convert kernel outputs to the reference sparse layout
    (ref: src/nwalign_gpu7_mlsp_diagdiag.cu:348-352) and recompute the last
    tile on host for align_cost (ref: ...gpu7...cu:619-622).

    frows/ecols carry the affine extension's F-top-row / E-left-col headers
    (same indexing as hrows/hcols); best is SW's (value, i, j) argmax.
    """
    from ..trace.sparse import align_tile_full

    nw.tile_hdr_mat_rows = trows
    nw.tile_hdr_mat_cols = tcols
    nw.tile_hrow_len = 1 + tile_w
    nw.tile_hcol_len = 1 + tile_h

    n_tiles = trows * tcols
    hrow_mat = np.zeros((n_tiles, 1 + tile_w), dtype=np.int32)
    hcol_mat = np.zeros((n_tiles, 1 + tile_h), dtype=np.int32)
    affine = frows is not None
    if affine:
        frow_mat = np.zeros((n_tiles, 1 + tile_w), dtype=np.int32)
        ecol_mat = np.zeros((n_tiles, 1 + tile_h), dtype=np.int32)

    # hrows[it] = padded row it*tile_h (width >= 1 + tcols*tile_w).
    # hcols[it, r, jt] = H[it*tile_h + 1 + r, jt*tile_w].
    for it in range(trows):
        row = hrows[it]
        for jt in range(tcols):
            k = it * tcols + jt
            hrow_mat[k] = row[jt * tile_w: jt * tile_w + tile_w + 1]
            hcol_mat[k, 0] = row[jt * tile_w]
            hcol_mat[k, 1:] = hcols[it, :, jt]
            if affine:
                frow_mat[k] = frows[it][jt * tile_w: jt * tile_w + tile_w + 1]
                ecol_mat[k, 1:] = ecols[it, :, jt]

    nw.tileHrowMat = hrow_mat
    nw.tileHcolMat = hcol_mat
    if affine:
        # E of a tile's top-left corner belongs to the header row above it;
        # it is never read by the within-tile recompute (row 0 is given),
        # so the corner element only needs a consistent value.
        ecol_mat[:, 0] = np.int32(-(2**30))
        nw.tileFrowMat = frow_mat
        nw.tileEcolMat = ecol_mat
    res.update_peak_mem(nw)

    if best is not None:
        res.align_cost = int(best[0])
        nw.best_i = int(best[1])
        nw.best_j = int(best[2])
        return Status.success

    # align_cost: host recompute of the bottom-right tile.
    co = get_tile_and_elem_ij(nw, nw.adjrows - 1, nw.adjcols - 1)
    if nw.spec.kind == AlignKind.NW and nw.spec.gap == GapKind.LINEAR:
        tile = np.zeros((nw.tile_hcol_len, nw.tile_hrow_len), dtype=np.int32)
        align_tile(tile, nw, co)
        res.align_cost = int(tile[co.i_elem, co.j_elem])
    else:
        mats = align_tile_full(nw, co)
        res.align_cost = int(mats["H"][co.i_elem, co.j_elem])
    return Status.success


def align_pallas_mlsp(pr: AlgParams, nw: AlgInput, res: AlgResult) -> Status:
    """Sparse tile-header fill for any spec (NW/SW x linear/affine).

    O(rows/tile_h * cols + rows * cols/tile_w) memory instead of
    O(rows*cols). NW linear-gap is the reference's mlsp surface; the other
    specs are capability extensions carrying the extra (F-row, E-col)
    affine headers / SW argmax in the same layout.
    """
    setup = _mlsp_setup(pr, nw)
    if setup is None:
        return Status.errorInvalidValue
    tile_h, tile_w, trows, tcols = setup
    spec = nw.spec
    is_nw_lg = spec.kind == AlignKind.NW and spec.gap == GapKind.LINEAR
    if spec.gap == GapKind.AFFINE and (nw.gapo_cost > 0 or nw.gape_cost > 0):
        return Status.errorInvalidValue  # vectorized Gotoh needs costs <= 0

    if _on_tpu():
        from . import pallas_wavefront as pw
        from . import pallas_wavefront2 as pw2

        if pw2.v2_params_ok(tile_h, tile_w, nw.adjrows - 1, nw.adjcols - 1):
            return pw2.align_mlsp_v2(
                pr, nw, res, tile_h, tile_w, trows, tcols
            )
        if is_nw_lg and pw.mlsp_params_ok(tile_h, tile_w):
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

    if is_nw_lg:
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
        return _mlsp_store(
            nw, res, hrows, hcols, tile_h, tile_w, trows, tcols
        )

    out_d = xk.rowscan_mlsp_full(
        subst_d, y_d, x_d, jnp.int32(nw.gapo_cost), jnp.int32(nw.gape_cost),
        nw.adjrows, nw.adjcols,
        tile_h=tile_h, tile_w=tile_w, n_blocks=trows,
        kind=spec.kind.value, gap=spec.gap.value,
    )
    jax.block_until_ready(out_d)
    sw.lap("align.calc")
    out = {k: np.asarray(jax.device_get(v)) for k, v in out_d.items()}
    sw.lap("align.cpy_host")
    nw.note_device_alloc(sum(int(v.nbytes) for v in out.values()))
    return _mlsp_store(
        nw, res, out["hrows"], out["hcols"], tile_h, tile_w, trows, tcols,
        frows=out.get("frows"), ecols=out.get("ecols"),
        best=out.get("best"),
    )
