"""Tiny-pair batched wavefront kernel: many pairs per vector block.

The flagship v2 kernel (pallas_wavefront2.py) assigns a whole (SUB, 128)
block — 2048 DP rows — to one pair; pairs shorter than that waste lanes,
and the batch engine falls back to a vmapped XLA row-scan below 1024
rows. This kernel packs PPB = (SUB*128)/PR pairs into ONE block: pair p
owns sublanes [p*SUBP, (p+1)*SUBP) (PR = SUBP*128 padded rows), all
pairs run IN PHASE (lane's pair-local index iloc = i2d mod PR processes
column c - iloc at step c), and K such blocks run as independent
interleaved chains (the zero-bubble batch-mode echelon).

What makes this shape work with the v2 dataflow:

- The cross-pair seam IS the header boundary: the two-roll lane shift
  drags pair p-1's last lane into pair p's first lane, and the kernel
  overrides exactly those positions (the static start-lane mask) with
  pair p's header-row value — which is ANALYTIC (H[0, c+1] = (c+1)*g
  etc., one scalar broadcast for every pair at once, since the pairs run
  in phase). No predecessor-row buffers, loads, or stores exist at all.
- The substitution lookup needs no 2-index gather (the ROADMAP #3
  blocker): the packed byte planes already map each lane to ITS pair's
  DP row — the planes input is built from the concatenated padded Y
  sequences, exactly like the flagship's per-block packing.
- Per-pair X letters enter at the start lanes via the same
  roll-the-window trick as the flagship's fillx: the host pre-lays a
  (SUB, 128) window whose [s, tt] element is X_{pair(s)}[w*128 + tt + 1];
  one static lane roll per step puts column tt at lane 0 of every
  sublane, and the start-lane mask selects it only where it matters.
- Cost capture per pair: per-lane constant inputs (bottom-lane mask and
  target step ct = (adjr-2) + (adjc-2)) make the capture 3 vector ops.

Reference surface: this is our extension (the reference aligns pairs
strictly sequentially, ref: src/benchmark.cpp:406); semantics and
verification identical to parallel/batch.py's cost-only contract
(costs + SW best cells, bit-exact vs models/oracle.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import NEG_INF_I32
from .pallas_wavefront2 import _pack_planes


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _make_tiny_kernel(*, K: int, SUB: int, SUBP: int, W: int, CH: int,
                      PR: int, cols_p: int, kind: str, gap: str,
                      masked: bool = False):
    """K independent chains; chain k = one block of PPB in-phase pairs."""
    ninf = NEG_INF_I32
    n_win = W // 128
    is_sw = kind == "sw"
    affine = gap == "affine"

    def kernel(*refs):
        g_ref = refs[0]
        pos = 1
        planes_refs = refs[pos: pos + K]; pos += K
        xinj_refs = refs[pos: pos + K]; pos += K
        hitl_refs = refs[pos: pos + K]; pos += K
        ctv_refs = refs[pos: pos + K]; pos += K
        if is_sw:
            ilocm_refs = refs[pos: pos + K]; pos += K
            bndu_refs = refs[pos: pos + K]; pos += K
        cost_refs = refs[pos: pos + K]; pos += K
        if is_sw:
            bv_refs = refs[pos: pos + K]; pos += K
            bc_refs = refs[pos: pos + K]; pos += K
        v1s = refs[pos]; pos += 1
        shps = refs[pos]; pos += 1
        xds = refs[pos]; pos += 1
        costs_s = refs[pos]; pos += 1
        if affine:
            e1s = refs[pos]; pos += 1
            f1s = refs[pos]; pos += 1
        if is_sw:
            bvs = refs[pos]; pos += 1
            bcs = refs[pos]; pos += 1

        ch = pl.program_id(1)
        g = g_ref[0, 0]
        ge = g_ref[0, 1]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
        i2d = s_iota * 128 + l_iota
        iloc = jnp.mod(i2d, PR)           # pair-local DP row - 1
        start = i2d == (i2d // PR) * PR   # pair start-lane mask (static)

        # Analytic per-lane header vectors (all pairs in phase, so one
        # vector serves every pair): hdrH = H[1+iloc, 0],
        # dhdr = H[iloc, 0], ehdr = E[1+iloc, 1]'s header recurrence.
        io = 1 + iloc
        if is_sw:
            hdrH = jnp.zeros((SUB, 128), jnp.int32)
            dhdr = hdrH
        elif affine:
            hdrH = g + io * ge
            dhdr = jnp.where(io == 1, 0, g + (io - 1) * ge)
        else:
            hdrH = io * g
            dhdr = hdrH - g
        if affine:
            ehdr = hdrH + g + ge

        @pl.when(ch == 0)
        def _init():
            for k in range(K):
                v1s[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                shps[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                xds[k] = jnp.zeros((SUB, 128), jnp.int32)
                costs_s[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                if affine:
                    e1s[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                    f1s[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                if is_sw:
                    bvs[k] = jnp.zeros((SUB, 128), jnp.int32)
                    bcs[k] = jnp.zeros((SUB, 128), jnp.int32)

        def shift2(v, fillv):
            # out[i] = v[i-1] within each pair; pair start lanes take
            # fillv's value at their own position instead.
            a = pltpu.roll(v, 1, axis=1)
            b = pltpu.roll(a, 1, axis=0)
            out = jnp.where(l_iota == 0, b, a)
            return jnp.where(start, fillv, out)

        planes = [[planes_refs[k][0, p] for p in range(8)]
                  for k in range(K)]
        hitls = [hitl_refs[k][0] != 0 for k in range(K)]
        ctvs = [ctv_refs[k][0] for k in range(K)]
        if is_sw:
            ilocms = [ilocm_refs[k][0] for k in range(K)]
            bndus = [bndu_refs[k][0].astype(jnp.uint32) for k in range(K)]
        NCAR = (4 + (2 if affine else 0) + (2 if is_sw else 0))

        def window_body(w, carry):
            vs = list(carry)
            xfs = [xinj_refs[k][0, w] for k in range(K)]
            c0 = ch * W
            for tt in range(128):
                for k in range(K):
                    st = vs[NCAR * k: NCAR * (k + 1)]
                    v1, sh1p, xd, costv = st[:4]
                    if affine:
                        e1, f1 = st[4:6]
                    if is_sw:
                        bv, bc = st[NCAR - 2], st[NCAR - 1]
                    c = c0 + w * 128 + tt

                    # --- substitution: in-phase X letters + lookup ---
                    fx = (
                        pltpu.roll(xfs[k], 128 - tt, axis=1)
                        if tt else xfs[k]
                    )
                    xd = shift2(xd, fx)
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

                    # --- DP step (header-row fill is one scalar) ---
                    if is_sw:
                        hfill = jnp.int32(0)
                    elif affine:
                        hfill = g + (c + 1) * ge
                    else:
                        hfill = (c + 1) * g
                    sh1 = shift2(v1, jnp.full((SUB, 128), hfill,
                                              jnp.int32))
                    diag = jnp.where(iloc == c, dhdr, sh1p)
                    if masked:
                        valid = (iloc <= c) & (iloc > c - cols_p)
                    if not affine:
                        left = jnp.where(iloc == c, hdrH, v1)
                        cell = jnp.maximum(
                            diag + s, jnp.maximum(sh1, left) + g
                        )
                    else:
                        e_new = jnp.maximum(e1, v1 + g) + ge
                        e_new = jnp.where(iloc == c, ehdr, e_new)
                        shF = shift2(f1, jnp.full((SUB, 128), ninf,
                                                  jnp.int32))
                        f_new = jnp.maximum(shF, sh1 + g) + ge
                        cell = jnp.maximum(
                            diag + s, jnp.maximum(e_new, f_new)
                        )
                        if masked:
                            e_new = jnp.where(valid, e_new, ninf)
                            f_new = jnp.where(valid, f_new, ninf)
                    if is_sw:
                        cell = jnp.maximum(cell, 0)
                    if masked:
                        cell = jnp.where(valid, cell, ninf)

                    if is_sw:
                        # Per-lane running max + first-occurrence column;
                        # pad rows/cols and front lanes excluded, all via
                        # ONE unsigned range compare against the
                        # host-folded ilocm/bndu lane constants
                        # (uu = c - iloc in [0, adjc-2] iff the lane is a
                        # live in-range cell; dead lanes read c - 2^30,
                        # unsigned-huge).
                        uu = (c - ilocms[k]).astype(jnp.uint32)
                        upd = (cell > bv) & (uu <= bndus[k])
                        bv = jnp.where(upd, cell, bv)
                        bc = jnp.where(upd, c, bc)
                    # Bottom-right capture: the hit lane's target step.
                    hit = hitls[k] & (c == ctvs[k])
                    costv = jnp.where(hit, cell, costv)

                    st = [cell, sh1, xd, costv]
                    if affine:
                        st += [e_new, f_new]
                    if is_sw:
                        st += [bv, bc]
                    vs[NCAR * k: NCAR * (k + 1)] = st
            return tuple(vs)

        init = []
        for k in range(K):
            init += [v1s[k], shps[k], xds[k], costs_s[k]]
            if affine:
                init += [e1s[k], f1s[k]]
            if is_sw:
                init += [bvs[k], bcs[k]]
        out = jax.lax.fori_loop(0, n_win, window_body, tuple(init))
        for k in range(K):
            st = out[NCAR * k: NCAR * (k + 1)]
            v1s[k] = st[0]
            shps[k] = st[1]
            xds[k] = st[2]
            costs_s[k] = st[3]
            if affine:
                e1s[k] = st[4]
                f1s[k] = st[5]
            if is_sw:
                bvs[k] = st[NCAR - 2]
                bcs[k] = st[NCAR - 1]

        @pl.when(ch == CH - 1)
        def _fin():
            for k in range(K):
                cost_refs[k][0] = costs_s[k]
                if is_sw:
                    bv_refs[k][0] = bvs[k]
                    bc_refs[k][0] = bcs[k]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("PR", "K", "kind", "gap", "interpret"),
)
def pallas_mlsp_tiny_v2(subst, Ys, Xs, gapo, gape, adjrs, adjcs, *,
                        PR: int, K: int = 4, kind: str = "nw",
                        gap: str = "linear", interpret: bool = False):
    """Cost-only batched fill for tiny pairs (PR = padded rows <= 1024).

    Ys: (NP, 1+PR), Xs: (NP, 1+cols_p) with header elements; adjrs/adjcs
    (NP,) true dims. NP must be a multiple of PPB*K (callers pad with
    dummy pairs). Returns dict:
      cost: (NP,) int32  H[adjr-1, adjc-1] per pair (NW; garbage for SW)
      bv/bc (SW): (NP, PR) per-lane best value / its column step c
                  (pair-local: j = bc - iloc + 1 with iloc = lane index)
    """
    NP = Ys.shape[0]
    cols_p = Xs.shape[1] - 1
    SUB = 16
    assert PR % 128 == 0 and (SUB * 128) % PR == 0
    SUBP = PR // 128
    PPB = SUB // SUBP
    assert NP % (PPB * K) == 0, (NP, PPB, K)
    NCB = NP // PPB          # chain-blocks
    G = NCB // K             # chain groups (grid dim 0)
    W = 512
    NS = PR + cols_p - 1
    NSpad = _cdiv(NS + 128, W) * W
    CH = NSpad // W
    n_win = W // 128
    is_sw = kind == "sw"
    affine = gap == "affine"

    # Per chain-block packed inputs.
    ycat = jnp.asarray(Ys)[:, 1:].reshape(NCB, PPB * PR)
    ycat2 = jnp.concatenate(
        [jnp.zeros((NCB, 1), jnp.int32), ycat], axis=1
    )
    planes = jax.vmap(
        lambda y: _pack_planes(subst, y, 1, SUB * 128)
    )(ycat2).reshape(NCB, 8, SUB, 128)

    # xinj[cb*CH + ch, w, s, tt] = X_{pair(s)}[ch*W + w*128 + tt + 1]
    # (zero past the end) — only start sublanes are ever read, but the
    # replicated layout keeps the block a plain (n_win, SUB, 128) tile.
    xpad = jnp.zeros((NP, NSpad), jnp.int32)
    xpad = xpad.at[:, :cols_p].set(jnp.asarray(Xs)[:, 1:])
    xinj = jnp.repeat(
        xpad.reshape(NCB, PPB, NSpad), SUBP, axis=1
    )  # (NCB, SUB, NSpad)
    xinj = xinj.reshape(NCB, SUB, NSpad // 128, 128).transpose(0, 2, 1, 3)
    xinj = xinj.reshape(NCB * CH, n_win, SUB, 128)

    # Per-lane constant vectors.
    iloc_h = np.tile(np.arange(PR, dtype=np.int32), PPB).reshape(SUB, 128)
    adjr_l = jnp.repeat(jnp.asarray(adjrs, jnp.int32).reshape(NCB, PPB),
                        PR, axis=1).reshape(NCB, SUB, 128)
    adjc_l = jnp.repeat(jnp.asarray(adjcs, jnp.int32).reshape(NCB, PPB),
                        PR, axis=1).reshape(NCB, SUB, 128)
    iloc_d = jnp.asarray(iloc_h)
    # Bottom-lane mask and its capture step (garbage for degenerate
    # pairs with adjr < 2 — the host routes those around this kernel).
    hitl = (iloc_d[None] == adjr_l - 2).astype(jnp.int32)
    ctv = (adjr_l - 2) + (adjc_l - 2)
    # Folded argmax guards (see _make_tiny_kernel): ilocm holds iloc at
    # lanes whose row AND column ranges are non-empty and +2^30
    # elsewhere, so uu = c - ilocm goes unsigned-huge at dead lanes; the
    # per-lane unsigned column bound is adjc - 2 (= ctu - iloc).
    ilocm = jnp.where(
        (1 + iloc_d[None] <= adjr_l - 1) & (adjc_l >= 2),
        iloc_d[None], jnp.int32(1 << 30),
    )
    # Clamp at 0: a degenerate pair's adjc - 2 (adjc < 2, e.g. the len1
    # fixtures) must not wrap to a huge unsigned bound that out-ranges
    # the 2^30-offset dead-lane uu and admits junk captures — the same
    # round-3 fold bug fixed in pallas_wavefront2 (the adjc >= 2 term in
    # ilocm already kills every lane; the clamped bound keeps the other
    # side of the compare from resurrecting them).
    bndu = jnp.maximum(adjc_l - 2, 0)

    kernel = _make_tiny_kernel(
        K=K, SUB=SUB, SUBP=SUBP, W=W, CH=CH, PR=PR, cols_p=cols_p,
        kind=kind, gap=gap, masked=interpret,
    )
    gmat = jnp.stack([jnp.int32(gapo), jnp.int32(gape)]).reshape(1, 2)

    def kspecs(shape, index):
        return [
            pl.BlockSpec(shape, functools.partial(index, k=k),
                         memory_space=pltpu.VMEM)
            for k in range(K)
        ]

    in_specs = [pl.BlockSpec((1, 2), lambda g_, ch: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs += kspecs((1, 8, SUB, 128),
                       lambda g_, ch, k=0: (g_ * K + k, 0, 0, 0))
    in_specs += kspecs((1, n_win, SUB, 128),
                       lambda g_, ch, k=0: ((g_ * K + k) * CH + ch,
                                            0, 0, 0))
    for _ in range(2 + (2 if is_sw else 0)):
        in_specs += kspecs((1, SUB, 128),
                           lambda g_, ch, k=0: (g_ * K + k, 0, 0))

    blk_shape = jax.ShapeDtypeStruct((NCB, SUB, 128), jnp.int32)
    blk_specs = kspecs((1, SUB, 128), lambda g_, ch, k=0: (g_ * K + k, 0, 0))
    out_specs = list(blk_specs)
    out_shapes = [blk_shape] * K
    if is_sw:
        out_specs += blk_specs + blk_specs
        out_shapes += [blk_shape] * K + [blk_shape] * K

    scratch = [
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # v1s
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # shps
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # xds
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # costs
    ]
    if affine:
        scratch += [
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # e1s
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # f1s
        ]
    if is_sw:
        scratch += [
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # bvs
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # bcs
        ]

    ins = [gmat] + [planes] * K + [xinj] * K + [hitl] * K + [ctv] * K
    if is_sw:
        ins += [ilocm] * K + [bndu] * K

    outs = pl.pallas_call(
        kernel,
        grid=(G, CH),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)

    # Each chain k wrote chain-blocks g*K + k of its own array; since
    # every chain's index map hits ALL blocks' rows only for its own k,
    # merge by interleave.
    def merge(parts):
        return jnp.stack(
            [parts[k].reshape(G, K, SUB, 128)[:, k] for k in range(K)],
            axis=1,
        ).reshape(NCB, SUB, 128)

    pos = 0
    costm = merge(outs[pos: pos + K]); pos += K
    out = {}
    # costv holds ninf except each pair's hit lane: per-pair max.
    out["cost"] = costm.reshape(NP, PR).max(axis=1)
    if is_sw:
        out["bv"] = merge(outs[pos: pos + K]).reshape(NP, PR); pos += K
        out["bc"] = merge(outs[pos: pos + K]).reshape(NP, PR); pos += K
    return out
