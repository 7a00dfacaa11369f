"""Pure-XLA alignment kernels (jit + lax.scan; run on TPU or CPU).

Two strategies:

  align_xla_diag     One lax.scan over anti-diagonals, one vector op per
                     diagonal — the TPU re-design of the reference's
                     thread-per-cell diagonal kernel
                     (ref: src/nwalign_gpu1_ml_diag.cu:30-71). The CUDA-graph
                     multi-launch (ref: ...cu:162-281) collapses into a
                     single compiled scan.

  align_xla_rowscan  One lax.scan over rows; the intra-row left-dependency
                     H[i,j-1] is solved with a max-plus prefix scan
                     (lax.cummax), turning the "sequential" direction into a
                     single vector op: curr[j] = max(cand[j], curr[j-1]+g)
                     == cummax(cand[k]-k*g)[j] + j*g. This has no CUDA
                     analog — it is the TPU-natural dense kernel.

Both support NW/SW x linear/affine int32 DP, bit-exact vs the oracle.
Shapes are padded up to multiples of 128 (lane width) so XLA compiles one
program per shape bucket, like the reference pads to tile multiples
(ref: src/nwalign_gpu3_ml_diagdiag.cu:313-325); padding never feeds back
into the logical window and is sliced off before hashing/tracing.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..core.types import (
    AlgInput,
    AlgParams,
    AlgResult,
    AlignKind,
    GapKind,
    NEG_INF_I32,
    Status,
)
from .skew import skew_rows, unskew_rows

LANES = 128


def pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# --------------------------------------------------------------------------
# Row-scan kernel.
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("kind", "gap"))
def rowscan_dense(subst, seqY, seqX, gapo, gape, *, kind: str, gap: str):
    """Fill the dense H matrix; seqY/seqX include the header element."""
    adjr = seqY.shape[0]
    adjc = seqX.shape[0]
    g = gapo
    is_sw = kind == "sw"
    offs = jnp.arange(adjc, dtype=jnp.int32)
    # Substitution columns pre-gathered once: SX[a, j] = subst[a, X[j]].
    SX = subst[:, seqX]

    if gap == "linear":
        goffs = offs * g
        row0 = jnp.zeros(adjc, jnp.int32) if is_sw else goffs

        def step(prev, inp):
            i, y = inp
            srow = SX[y]
            cand = jnp.maximum(prev[:-1] + srow[1:], prev[1:] + g)
            if is_sw:
                cand = jnp.maximum(cand, 0)
                first = jnp.int32(0)
            else:
                first = i * g
            a = jnp.concatenate([first[None], cand])
            row = lax.cummax(a - goffs) + goffs
            return row, row

        _, rows = lax.scan(
            step, row0, (jnp.arange(1, adjr, dtype=jnp.int32), seqY[1:])
        )
        return jnp.concatenate([row0[None], rows], axis=0)

    # Affine (Gotoh); requires gapo<=0, gape<=0 (see AlignSpec docstring).
    ninf = jnp.int32(NEG_INF_I32)
    geoffs = offs * gape
    if is_sw:
        row0 = jnp.zeros(adjc, jnp.int32)
    else:
        row0 = jnp.where(offs == 0, 0, gapo + geoffs).astype(jnp.int32)
    f0 = jnp.full(adjc, ninf, jnp.int32)

    def step(carry, inp):
        hprev, fprev = carry
        i, y = inp
        frow = jnp.maximum(fprev, hprev + gapo) + gape
        frow = frow.at[0].set(ninf)
        srow = SX[y]
        v = jnp.maximum(hprev[:-1] + srow[1:], frow[1:])  # j = 1..cols
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
        return (hrow, frow), hrow

    _, rows = lax.scan(
        step, (row0, f0), (jnp.arange(1, adjr, dtype=jnp.int32), seqY[1:])
    )
    return jnp.concatenate([row0[None], rows], axis=0)


# --------------------------------------------------------------------------
# Anti-diagonal scan kernel.
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("kind", "gap"))
def diag_dense(subst, seqY, seqX, gapo, gape, *, kind: str, gap: str):
    """Fill dense H via one scan over the R+C-1 anti-diagonals.

    Diagonal d holds lanes j (columns) with cell (i=d-j, j); the carries are
    the previous two diagonals. The skewed profile S[d, j] = subst[Y[d-j], X[j]]
    makes the per-step substitution read contiguous (ops/skew.py).
    """
    adjr = seqY.shape[0]
    adjc = seqX.shape[0]
    g = gapo
    is_sw = kind == "sw"
    affine = gap == "affine"
    ninf = jnp.int32(NEG_INF_I32)
    j_idx = jnp.arange(adjc, dtype=jnp.int32)
    ns = adjr + adjc - 1

    P = subst[seqY][:, seqX]
    S = skew_rows(jnp, P)  # (ns, adjc)

    def shift1(v, fill):
        return jnp.concatenate([fill[None], v[:-1]])

    def hdr_h(d):
        # Header value of H at distance d from the corner.
        if is_sw:
            return jnp.zeros((), jnp.int32)
        if affine:
            return jnp.where(d == 0, 0, gapo + d * gape).astype(jnp.int32)
        return (d * g).astype(jnp.int32)

    def step(carry, inp):
        d, srow = inp
        if affine:
            v1, v2, e1, f1 = carry
        else:
            v1, v2 = carry
        sh2 = shift1(v2, ninf)
        sh1 = shift1(v1, ninf)

        if affine:
            frow = jnp.maximum(f1, v1 + gapo) + gape
            erow = jnp.maximum(shift1(e1, ninf), sh1 + gapo) + gape
            cell = jnp.maximum(sh2 + srow, jnp.maximum(erow, frow))
        else:
            cell = jnp.maximum(sh2 + srow, jnp.maximum(v1, sh1) + g)

        if is_sw:
            cell = jnp.maximum(cell, 0)
        # Header column (j=0, i=d) and header row (i=0, j=d).
        cell = jnp.where(j_idx == 0, hdr_h(d), cell)
        cell = jnp.where(j_idx == d, hdr_h(d), cell)
        valid = (j_idx <= d) & (j_idx > d - adjr)
        cell = jnp.where(valid, cell, ninf)

        if affine:
            # E[i,0] and F[0,j] are -inf; lane j==0 is row-header (j=0) and
            # lane j==d is column-header (i=0) — reset both E and F there.
            interior = valid & (j_idx != 0) & (j_idx != d)
            frow = jnp.where(interior, frow, ninf)
            erow = jnp.where(interior, erow, ninf)
            return (cell, v1, erow, frow), cell
        return (cell, v1), cell

    ninf_vec = jnp.full(adjc, ninf, jnp.int32)
    if affine:
        carry0 = (ninf_vec, ninf_vec, ninf_vec, ninf_vec)
    else:
        carry0 = (ninf_vec, ninf_vec)
    _, svals = lax.scan(
        step, carry0, (jnp.arange(ns, dtype=jnp.int32), S)
    )
    return unskew_rows(jnp, svals, adjr)


# --------------------------------------------------------------------------
# Algorithm wrappers (registry entries).
# --------------------------------------------------------------------------


def _pad_inputs(nw: AlgInput):
    rows_p = pad_to(max(nw.adjrows - 1, 1), LANES)
    cols_p = pad_to(max(nw.adjcols - 1, 1), LANES)
    y = np.zeros(1 + rows_p, np.int32)
    x = np.zeros(1 + cols_p, np.int32)
    y[: nw.adjrows] = nw.seqY
    x[: nw.adjcols] = nw.seqX
    return y, x


def _finish_dense_from_device(nw: AlgInput, res: AlgResult, H_dev) -> Status:
    sw = res.sw_align
    H_win = H_dev[: nw.adjrows, : nw.adjcols]
    H = np.asarray(jax.device_get(H_win))
    sw.lap("align.cpy_host")
    nw.score = H
    if nw.spec.kind == AlignKind.SW:
        flat = int(np.argmax(H))
        nw.best_i, nw.best_j = divmod(flat, nw.adjcols)
        res.align_cost = int(H[nw.best_i, nw.best_j])
    else:
        res.align_cost = int(H[-1, -1])
    res.update_peak_mem(nw)
    nw.note_device_alloc(H_dev.size * 4)
    return Status.success


def _align_xla(kernel):
    def align(pr: AlgParams, nw: AlgInput, res: AlgResult) -> Status:
        sw = res.sw_align
        sw.start()
        # Guarded affine domain (same contract as align_pallas_mlsp and
        # the oracle): the cummax E-chain construction assumes extending
        # a gap never loses to re-opening one, which requires
        # gapo <= 0 <= -gape. Outside it the fill would SILENTLY return
        # non-Gotoh values — reject instead.
        if nw.spec.gap == GapKind.AFFINE and (
                nw.gapo_cost > 0 or nw.gape_cost > 0):
            return Status.errorInvalidValue
        y, x = _pad_inputs(nw)
        sw.lap("align.alloc")

        subst_d = jax.device_put(nw.subst)
        y_d = jax.device_put(y)
        x_d = jax.device_put(x)
        jax.block_until_ready((subst_d, y_d, x_d))
        sw.lap("align.cpy_dev")

        spec = nw.spec
        H_dev = kernel(
            subst_d, y_d, x_d,
            jnp.int32(nw.gapo_cost), jnp.int32(nw.gape_cost),
            kind=spec.kind.value,
            gap=spec.gap.value,
        )
        jax.block_until_ready(H_dev)
        sw.lap("align.calc")
        return _finish_dense_from_device(nw, res, H_dev)

    return align


align_xla_rowscan = _align_xla(rowscan_dense)
align_xla_diag = _align_xla(diag_dense)


# --------------------------------------------------------------------------
# Sparse (mlsp) row-scan: emits only tile-boundary rows and columns.
# Portable fallback for the Pallas mlsp kernel; O(n) memory per row block.
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w", "n_blocks"))
def rowscan_mlsp(subst, seqY, seqX, gapo, *, tile_h: int, tile_w: int,
                 n_blocks: int):
    """NW linear-gap sparse fill.

    Returns (hrows, hcols):
      hrows: (n_blocks, adjcols)            rows i = b*tile_h (incl. header row b=0)
      hcols: (n_blocks, tile_h, n_ctiles)   cols j = jt*tile_w of rows in block b
    Block b covers DP rows [b*tile_h + 1, (b+1)*tile_h].
    """
    adjc = seqX.shape[0]
    g = gapo
    goffs = jnp.arange(adjc, dtype=jnp.int32) * g
    SX = subst[:, seqX]
    n_ctiles = (adjc - 1 + tile_w - 1) // tile_w + 1
    col_ids = jnp.arange(n_ctiles, dtype=jnp.int32) * tile_w

    def row_step(carry, inp):
        prev, i = carry
        y = inp
        srow = SX[y]
        cand = jnp.maximum(prev[:-1] + srow[1:], prev[1:] + g)
        a = jnp.concatenate([(i * g)[None], cand])
        row = lax.cummax(a - goffs) + goffs
        return (row, i + 1), row[col_ids]

    def block_step(carry, yblock):
        prev, i = carry
        (row, i2), colvals = lax.scan(row_step, (prev, i), yblock)
        return (row, i2), (prev, colvals)

    yblocks = seqY[1:].reshape(n_blocks, tile_h)
    (_, _), (hrows, hcols) = lax.scan(
        block_step, (goffs, jnp.int32(1)), yblocks
    )
    return hrows, hcols


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "n_blocks", "kind", "gap")
)
def rowscan_mlsp_full(subst, seqY, seqX, gapo, gape, adjr, adjc, *,
                      tile_h: int, tile_w: int, n_blocks: int, kind: str,
                      gap: str):
    """Sparse fill for any spec (NW/SW x linear/affine).

    Returns a dict:
      hrows: (n_blocks, adjcols)          H rows i = b*tile_h
      hcols: (n_blocks, tile_h, n_ctiles) H cols j = jt*tile_w
      frows/ecols (affine): F rows / E cols, same shapes
      best (SW): (3,) int32 [value, i, j] of the row-major-first argmax
    """
    adjc_p = seqX.shape[0]  # padded; the true dims arrive as adjr/adjc
    is_sw = kind == "sw"
    affine = gap == "affine"
    ninf = jnp.int32(NEG_INF_I32)
    offs = jnp.arange(adjc_p, dtype=jnp.int32)
    SX = subst[:, seqX]
    n_ctiles = (adjc_p - 1 + tile_w - 1) // tile_w + 1
    col_ids = jnp.arange(n_ctiles, dtype=jnp.int32) * tile_w

    g = gapo
    goffs = offs * g
    geoffs = offs * gape

    if is_sw:
        row0 = jnp.zeros(adjc_p, jnp.int32)
    elif affine:
        row0 = jnp.where(offs == 0, 0, gapo + geoffs).astype(jnp.int32)
    else:
        row0 = goffs
    f0 = jnp.full(adjc_p, ninf, jnp.int32)
    best0 = (jnp.int32(0), jnp.int32(0), jnp.int32(0))

    def update_best(best, row, i):
        # Mask padding: pad letters are real alphabet indices, so padded
        # cells can be positive under SW's zero clamp.
        bv, bi, bj = best
        masked = jnp.where(offs < adjc, row, jnp.int32(0))
        rmax = jnp.max(masked)
        rj = jnp.argmax(masked).astype(jnp.int32)
        upd = (i < adjr) & (rmax > bv)
        return (
            jnp.where(upd, rmax, bv),
            jnp.where(upd, i, bi),
            jnp.where(upd, rj, bj),
        )

    def row_step(carry, inp):
        hprev, fprev, best, i = carry
        y = inp
        srow = SX[y]
        if not affine:
            cand = jnp.maximum(hprev[:-1] + srow[1:], hprev[1:] + g)
            if is_sw:
                cand = jnp.maximum(cand, 0)
                first = jnp.int32(0)
            else:
                first = i * g
            a = jnp.concatenate([first[None], cand])
            hrow = lax.cummax(a - goffs) + goffs
            if is_sw:
                hrow = jnp.maximum(hrow, 0)
            frow = fprev
            erow = fprev  # unused
        else:
            frow = jnp.maximum(fprev, hprev + gapo) + gape
            frow = frow.at[0].set(ninf)
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
        if is_sw:
            best = update_best(best, hrow, i)
        return (hrow, frow, best, i + 1), (
            hrow[col_ids], erow[col_ids] if affine else hrow[col_ids]
        )

    def block_step(carry, yblock):
        hprev, fprev, best, i = carry
        (hrow, frow, best, i2), (colvals, ecolvals) = lax.scan(
            row_step, (hprev, fprev, best, i), yblock
        )
        return (hrow, frow, best, i2), (hprev, fprev, colvals, ecolvals)

    yblocks = seqY[1:].reshape(n_blocks, tile_h)
    (_, _, best, _), (hrows, frows, hcols, ecols) = lax.scan(
        block_step, (row0, f0, best0, jnp.int32(1)), yblocks
    )
    out = {"hrows": hrows, "hcols": hcols}
    if affine:
        out["frows"] = frows
        out["ecols"] = ecols
    if is_sw:
        out["best"] = jnp.stack(best)
    return out
