"""Giant-pair alignment: one huge pair partitioned across chips.

TPU-first re-design of the reference's sparse tile-header (mlsp) dataflow
(ref: src/nwalign_gpu7_mlsp_diagdiag.cu:247-285 — inter-tile dependencies
carried only by O(tile-side) header vectors), lifted across the device mesh
(SURVEY.md §5 "long-context" mapping): the column range of the DP matrix is
split into one band per chip, rows advance in blocks, and the only
cross-chip traffic is the block's right-edge header column — (block_h+1)
int32 values — passed to the next chip over ICI with ``lax.ppermute`` per
pipeline step. This is structurally ring-attention-style neighbor passing
with O(n) bytes per step instead of O(n^2) state.

Pipeline: with D devices and nb row blocks, step t has device k computing
row block i = t - k (a tile anti-diagonal wavefront across the mesh, the
cross-chip analog of the reference's tile-diagonal kernel launches,
ref: src/nwalign_gpu7_mlsp_diagdiag.cu:526-566). Fill/drain bubbles cost
(D-1)/(nb+D-1) of the steps — negligible when nb >> D.

Outputs are exactly the mlsp sparse representation: per-block bottom rows
(tile header rows) and per-band right-edge columns (tile header columns),
so the standard sparse traceback/hash (trace/sparse.py) runs unchanged on
the result and verifies bit-exactly against the CPU oracle.

NW linear-gap (the reference's mlsp surface). Requires rows_p % block_h == 0
and cols_p % (D * 128) == 0 — the host wrapper pads.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.types import (
    AlgInput,
    AlgParams,
    AlgResult,
    AlignKind,
    GapKind,
    NEG_INF_I32,
    Status,
)


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "block_h", "n_blocks", "band_w"),
)
def giant_mlsp_nw_lg(
    subst,
    y,
    x_nohdr,
    gapo,
    adjr,
    adjc,
    *,
    mesh: Mesh,
    axis: str = "sp",
    block_h: int,
    n_blocks: int,
    band_w: int,
):
    """Distributed sparse fill of one giant pair.

    y: (1+rows_p,) with header element, replicated.
    x_nohdr: (cols_p,) WITHOUT the header element (sharded into bands).
    adjr/adjc: true dims incl. header (traced, for in-scan cost capture).

    Returns:
      hrows: (n_blocks, cols_p)            H[(i+1)*block_h, 1:] per block
      hcols: (n_blocks, D*(block_h+1))     band k right-edge columns
      cost:  ()                            H[adjr-1, adjc-1]
    """
    D = mesh.devices.size
    BH = block_h
    nb = n_blocks
    Wb = band_w
    g = gapo
    ninf = jnp.int32(NEG_INF_I32)

    def device_fn(subst, xb, y, g, adjr, adjc):
        # xb: (1, Wb) this band's letters; y/g/adjr/adjc replicated.
        xb = xb[0]
        k = lax.axis_index(axis)
        goffs = jnp.arange(Wb + 1, dtype=jnp.int32) * g
        SXb = subst[:, xb]  # (substsz, Wb)
        col0 = k * Wb  # global column of this band's left border
        # Initial carry: header row H[0, col0+1 .. col0+Wb].
        top0 = (col0 + 1 + jnp.arange(Wb, dtype=jnp.int32)) * g
        msg0 = jnp.zeros(BH + 1, jnp.int32)
        # Header-row cost capture (adjr == 1): H[0, adjc-1] = (adjc-1)*g.
        in_band0 = (adjc - 1 >= col0 + 1) & (adjc - 1 <= col0 + Wb)
        cost0 = jnp.where(
            (adjr == 1) & (in_band0 | (adjc == 1)), (adjc - 1) * g, ninf
        )

        perm = [(s, (s + 1) % D) for s in range(D)]

        def block_rows(top, halo, r0):
            """Fill BH rows of this band seeded by carry row `top` and left
            border column `halo` (halo[rr] = H[r0+rr, col0])."""

            def row_step(prev, rr):
                prev_full = jnp.concatenate([halo[rr - 1][None], prev])
                yl = y[r0 + rr]
                srow = SXb[yl]
                cand = jnp.maximum(prev_full[:-1] + srow, prev_full[1:] + g)
                a = jnp.concatenate([halo[rr][None], cand])
                rowf = lax.cummax(a - goffs) + goffs
                return rowf[1:], rowf

            new_top, rows_full = lax.scan(
                row_step, top, jnp.arange(1, BH + 1, dtype=jnp.int32)
            )
            return new_top, rows_full  # rows_full: (BH, Wb+1)

        def step_fn(carry, t):
            top, msg, cost = carry
            halo = lax.ppermute(msg, axis, perm)
            i = t - k
            active = (i >= 0) & (i < nb)
            r0 = jnp.clip(i, 0, nb - 1) * BH
            # Device 0's left border is the DP header column H[r, 0] = r*g.
            hdr_halo = (r0 + jnp.arange(BH + 1, dtype=jnp.int32)) * g
            halo = jnp.where(k == 0, hdr_halo, halo)

            new_top, rows_full = block_rows(top, halo, r0)
            new_msg = jnp.concatenate([top[-1:], rows_full[:, -1]])

            # In-scan cost capture at the true bottom-right cell.
            rr_t = adjr - 1 - r0  # target local row in 1..BH
            ll_t = adjc - 1 - col0  # target local lane in rows_full axis 1
            hit = (
                active
                & (rr_t >= 1) & (rr_t <= BH)
                & (ll_t >= 0) & (ll_t <= Wb)
                & ((ll_t >= 1) | (k == 0))
            )
            val = rows_full[
                jnp.clip(rr_t - 1, 0, BH - 1), jnp.clip(ll_t, 0, Wb)
            ]
            cost = jnp.where(hit, val, cost)

            top = jnp.where(active, new_top, top)
            msg = jnp.where(active, new_msg, msg)
            return (top, msg, cost), (top, msg)

        steps = nb + D - 1
        (_, _, cost), (tops, msgs) = lax.scan(
            step_fn, (top0, msg0, cost0),
            jnp.arange(steps, dtype=jnp.int32),
        )
        # Device k's block i outputs live at step t = i + k.
        hrows = lax.dynamic_slice_in_dim(tops, k, nb)  # (nb, Wb)
        hcols = lax.dynamic_slice_in_dim(msgs, k, nb)  # (nb, BH+1)
        cost = lax.pmax(cost, axis)
        return hrows, hcols, cost[None]

    fn = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(), P(), P(), P()),
        out_specs=(P(None, axis), P(None, axis), P(axis)),
        check_vma=False,
    )
    hrows, hcols, cost = fn(
        subst, x_nohdr.reshape(1, -1), y, g,
        jnp.asarray(adjr, jnp.int32), jnp.asarray(adjc, jnp.int32),
    )
    return hrows, hcols, cost[0]


# --------------------------------------------------------------------------
# Host wrapper + registry algorithm.
# --------------------------------------------------------------------------


def align_giant_mlsp(
    pr: AlgParams,
    nw: AlgInput,
    res: AlgResult,
    mesh: Optional[Mesh] = None,
) -> Status:
    """Registry align fn: distributed giant-pair sparse fill over all local
    devices (or the given mesh). Produces the reference mlsp layout so the
    sparse traceback / hash / print run unchanged."""
    from ..ops.pallas_kernels import _mlsp_store
    from .mesh import make_mesh

    if not (nw.spec.kind == AlignKind.NW and nw.spec.gap == GapKind.LINEAR):
        return Status.errorInvalidValue
    if mesh is None:
        mesh = make_mesh(axis_name="sp")
    D = int(mesh.devices.size)

    sw = res.sw_align
    sw.start()
    rows = nw.adjrows - 1
    cols = nw.adjcols - 1
    BH = int(pr.get("blockH", 0) or 128)
    lane_q = 128
    Wb = _pad_to(max(cols, 1), D * lane_q) // D
    rows_p = _pad_to(max(rows, 1), BH)
    nb = rows_p // BH
    cols_p = Wb * D

    y = np.zeros(1 + rows_p, np.int32)
    x = np.zeros(1 + cols_p, np.int32)
    y[: nw.adjrows] = nw.seqY
    x[: nw.adjcols] = nw.seqX
    sw.lap("align.alloc")

    subst_d = jax.device_put(nw.subst)
    y_d = jax.device_put(y)
    x_d = jax.device_put(x[1:])
    jax.block_until_ready((subst_d, y_d, x_d))
    sw.lap("align.cpy_dev")

    hrows_d, hcols_d, cost_d = giant_mlsp_nw_lg(
        subst_d, y_d, x_d, jnp.int32(nw.gapo_cost),
        nw.adjrows, nw.adjcols,
        mesh=mesh, block_h=BH, n_blocks=nb, band_w=Wb,
    )
    jax.block_until_ready((hrows_d, hcols_d, cost_d))
    sw.lap("align.calc")

    hrows_g = np.asarray(jax.device_get(hrows_d))  # (nb, cols_p)
    hcols_g = np.asarray(jax.device_get(hcols_d)).reshape(nb, D, BH + 1)
    cost = int(jax.device_get(cost_d))
    sw.lap("align.cpy_host")
    nw.note_device_alloc(int(hrows_g.nbytes + hcols_g.nbytes))

    # Convert to the generic (hrows, hcols) form of _mlsp_store with
    # tile_h = BH, tile_w = Wb, trows = nb, tcols = D:
    #   hrows[it] = full row it*BH (incl. header col), width 1 + cols_p
    #   hcols[it, r, jt] = H[it*BH + 1 + r, jt*Wb]
    g = nw.gapo_cost
    width = 1 + cols_p
    hrows = np.empty((nb, width), np.int32)
    hrows[0] = (np.arange(width, dtype=np.int64) * g).astype(np.int32)
    if nb > 1:
        hrows[1:, 0] = (
            np.arange(1, nb, dtype=np.int64) * BH * g
        ).astype(np.int32)
        hrows[1:, 1:] = hrows_g[: nb - 1]
    hcols = np.empty((nb, BH, D), np.int32)
    hcols[:, :, 0] = (
        np.arange(1, rows_p + 1, dtype=np.int64) * g
    ).astype(np.int32).reshape(nb, BH)
    if D > 1:
        # hcols_g[i, k, 1:] = H[i*BH+1 .. (i+1)*BH, (k+1)*Wb]; jt = k+1.
        hcols[:, :, 1:] = np.transpose(hcols_g[:, : D - 1, 1:], (0, 2, 1))

    stat = _mlsp_store(nw, res, hrows, hcols, BH, Wb, nb, D)
    if stat != Status.success:
        return stat
    if res.align_cost != cost:
        # The in-kernel capture must agree with the host tile recompute.
        return Status.errorInvalidResult
    return stat
