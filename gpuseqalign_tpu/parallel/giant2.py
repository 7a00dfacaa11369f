"""Giant-pair engine v2: column bands x Pallas banded kernel.

Same decomposition as parallel/giant.py (one giant pair's columns split
into one band per chip; row blocks advance in an echelon pipeline; the
only cross-chip traffic is the band's right-edge header column over ICI
via lax.ppermute) — but the per-device block fill is the full-speed v2
Pallas kernel (ops/pallas_banded.py) instead of the XLA row-scan, so each
chip contributes ~its single-pair v2 throughput.

Pipeline: pass p covers K row blocks; at step t device k runs pass t - k.
The halo message per step is (K*R + 1) int32 values: H at the band edge
for the pass's rows plus the top corner. NW linear-gap (the reference's
mlsp surface, ref: src/nwalign_gpu7_mlsp_diagdiag.cu:247-285 lifted across
chips).

Outputs are the standard mlsp sparse layout, so sparse traceback/hash
(trace/sparse.py) verify bit-exactly against the CPU oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.types import (
    AlgInput,
    AlgParams,
    AlgResult,
    AlignKind,
    GapKind,
    Status,
)
from ..ops.pallas_banded import banded_pass_nw_lg
from ..ops.pallas_wavefront2 import _cdiv, _pack_planes


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "R", "W", "TW", "K", "band_cols", "n_pass",
        "interpret",
    ),
)
def giant2_fill_nw_lg(subst, y, x_nohdr, gapo, *, mesh: Mesh,
                      axis: str = "sp", R: int, W: int, TW: int, K: int,
                      band_cols: int, n_pass: int,
                      interpret: bool = False):
    """Distributed sparse fill.

    y: (1 + n_pass*K*R,) with header element, replicated.
    x_nohdr: (D * band_cols,) letters without header (sharded into bands).

    Returns:
      hrows: (n_pass*K, D, prev_len)  per-band rows (b+1)*R, j=0 at c0
      hcols: (n_pass*K, D, jtE+1, R)  per-band header columns at TW steps
      (jtE = band_cols // TW; entry jl holds column c0 + jl*TW; jl = jtE is
      the band's right edge.)
    """
    D = mesh.devices.size
    SUB = R // 128
    NSpad = _cdiv(R + band_cols - 1 + 128, W) * W
    prev_len = NSpad + 128
    jtE = band_cols // TW
    B = n_pass * K
    g = gapo

    planes = _pack_planes(subst, y, B, R)  # (B, 8, SUB, 128), replicated

    def device_fn(subst_planes, xb, gsc):
        k = lax.axis_index(axis)
        g = gsc
        c0 = k * band_cols
        xb = xb[0]  # (band_cols,)
        xpad = jnp.zeros(NSpad, jnp.int32).at[:band_cols].set(xb)
        xwin = xpad.reshape(NSpad // W, W // 128, 128)

        prev0 = (c0 + jnp.arange(prev_len, dtype=jnp.int32)) * g
        msg0 = jnp.zeros(K * R + 1, jnp.int32)
        perm = [(s, (s + 1) % D) for s in range(D)]

        def step(carry, t):
            prev_row, msg = carry
            halo = lax.ppermute(msg, axis, perm)
            p = t - k
            active = (p >= 0) & (p < n_pass)
            pc = jnp.clip(p, 0, n_pass - 1)
            row0 = pc * K * R
            hdr_halo = (row0 + jnp.arange(K * R + 1, dtype=jnp.int32)) * g
            halo = jnp.where(k == 0, hdr_halo, halo)

            planes_p = lax.dynamic_slice(
                subst_planes, (pc * K, 0, 0, 0), (K, 8, SUB, 128)
            )
            hrow, hcol = banded_pass_nw_lg(
                planes_p, xwin, g, prev_row, halo,
                R=R, W=W, TW=TW, K=K, band_cols=band_cols,
                interpret=interpret,
            )
            edge_top = prev_row[band_cols]
            right = hcol[:, jtE].reshape(K * R)
            new_msg = jnp.concatenate([edge_top[None], right])
            new_prev = hrow[K - 1]
            prev_row = jnp.where(active, new_prev, prev_row)
            msg = jnp.where(active, new_msg, msg)
            hc = hcol[:, : jtE + 1].reshape(K, jtE + 1, R)
            return (prev_row, msg), (hrow, hc)

        steps = n_pass + D - 1
        (_, _), (hrows_t, hcols_t) = lax.scan(
            step, (prev0, msg0), jnp.arange(steps, dtype=jnp.int32)
        )
        # Device k's pass p lives at step t = p + k.
        hrows = lax.dynamic_slice_in_dim(hrows_t, k, n_pass)
        hcols = lax.dynamic_slice_in_dim(hcols_t, k, n_pass)
        hrows = hrows.reshape(B, 1, prev_len)
        hcols = hcols.reshape(B, 1, jtE + 1, R)
        return hrows, hcols

    fn = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P()),
        out_specs=(P(None, axis), P(None, axis)),
        check_vma=False,
    )
    hrows, hcols = fn(planes, x_nohdr.reshape(1, -1), g)
    return hrows, hcols  # (B, D, prev_len), (B, D, jtE+1, R)


def align_giant2_nw_lg(
    pr: AlgParams,
    nw: AlgInput,
    res: AlgResult,
    mesh: Optional[Mesh] = None,
    interpret: bool = False,
) -> Status:
    """Registry-shaped align fn for the v2 giant engine: pads, runs the
    distributed fill, and massages outputs into the reference sparse
    layout so sparse traceback/hash/align_cost run unchanged."""
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
    R = int(pr.get("tileBy", 0) or 128)
    TW = int(pr.get("tileBx", 0) or 128)
    K = int(pr.get("kChains", 0) or 2)
    band_cols = _cdiv(max(cols, 1), D * TW) * TW
    cols_p = band_cols * D
    n_pass = _cdiv(_cdiv(max(rows, 1), R), K)
    rows_p = n_pass * K * R
    jtE = band_cols // TW

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

    hrows_d, hcols_d = giant2_fill_nw_lg(
        subst_d, y_d, x_d, jnp.int32(nw.gapo_cost),
        mesh=mesh, R=R, W=min(512, TW), TW=TW, K=K,
        band_cols=band_cols, n_pass=n_pass, interpret=interpret,
    )
    jax.block_until_ready((hrows_d, hcols_d))
    sw.lap("align.calc")

    hrows_g = np.asarray(jax.device_get(hrows_d))  # (B, D, prev_len)
    hcols_g = np.asarray(jax.device_get(hcols_d))  # (B, D, jtE+1, R)
    sw.lap("align.cpy_host")
    nw.note_device_alloc(int(hrows_g.nbytes + hcols_g.nbytes))

    B = n_pass * K
    g = nw.gapo_cost
    width = 1 + cols_p
    tcols = cols_p // TW

    # hrows[it]: full row it*R incl. header col element.
    hrows = np.empty((B, width), np.int32)
    hrows[0] = (np.arange(width, dtype=np.int64) * g).astype(np.int32)
    if B > 1:
        hrows[1:, 0] = (
            np.arange(1, B, dtype=np.int64) * R * g
        ).astype(np.int32)
        for d in range(D):
            hrows[1:, 1 + d * band_cols: 1 + (d + 1) * band_cols] = \
                hrows_g[: B - 1, d, 1: band_cols + 1]

    # hcols[it, r, jt]: column jt*TW of block it.
    hcols = np.empty((B, R, tcols), np.int32)
    hcols[:, :, 0] = (
        np.arange(1, rows_p + 1, dtype=np.int64) * g
    ).astype(np.int32).reshape(B, R)
    for jt in range(1, tcols):
        d, jl = divmod(jt, jtE)
        if jl == 0:
            d, jl = d - 1, jtE
        hcols[:, :, jt] = hcols_g[:, d, jl, :]

    stat = _mlsp_store(nw, res, hrows, hcols, R, TW, B, tcols)
    return stat
