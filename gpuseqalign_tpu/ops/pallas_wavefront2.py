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

Covers all four specs. NW linear-gap is the reference's mlsp surface
(ref: src/nwalign_gpu7_mlsp_diagdiag.cu:247-285); affine (Gotoh) adds E/F
carry diagonals, an F header-row / E header-col sparse stream (the tile
dependencies under affine gaps), and a second predecessor-row buffer; SW
adds the zero clamp and per-lane running-argmax with first-occurrence
step capture. The grid is the CONTINUOUS (wrap) echelon whenever the
matrix is wide enough (see _make_kernel): chains roll into their next
row block without the per-pass pipeline drain the original (BB, CH)
grid paid. Measured on v5e at 23728^2 (R=TW=2048), unmasked + wrap:
nw_lg 67.8 GCUPS (K=6), sw_lg 56.9 (K=4), nw_ag 45.5 (K=4),
sw_ag 45.2 (K=4).
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
                 TW: int, OFF: int, prev_len: int, B: int,
                 kind: str = "nw", gap: str = "linear",
                 batch: bool = False, capture_cost: bool = False,
                 banded: bool = False, dense: bool = False,
                 masked: bool = False, wrap: bool = False,
                 packedx: bool = False, packedef: bool = False,
                 remath: bool = False, nobc: bool = False,
                 subprow: bool = False, bodyoff: bool = False):
    """Kernel factory shared by the full-matrix, batched and BANDED forms.

    ``banded`` (the per-device compute of the multi-chip giant engine,
    ops/pallas_banded.py) swaps every analytic edge value for an input:
    the predecessor row(s) come from ``previn``/``prevFin``, the band's
    left-edge header column from ``hcolin``/``dcolin``/``ecolin`` (the ICI
    halo), and the per-chain output-row j==0 seeds from SMEM. The grid is
    then (CH,) — one pass of K row blocks over one column band.

    ``masked`` re-enables the blanket dead-lane validity mask the
    production kernel drops (see the hot-loop comment — outputs are
    identical either way). Interpret-mode callers set it because the
    XLA:CPU backend's LLVM pipeline explodes (70+ min compiles) on the
    fully-live unmasked 128-step body, while Mosaic/TPU compiles it fine;
    the masked variant keeps the test battery tractable and the unmasked
    production kernel is verified on hardware by the differential drive.

    ``wrap`` is the CONTINUOUS echelon: instead of a (BB, CH) grid where
    every pass of K row blocks pays a full (K-1)*OFF pipeline drain, the
    grid is one chunk axis and chain k rolls straight into row block
    blk + K when its current block ends — per-chain carry re-init at
    block starts, per-chain output flush at block ends, (K-1)*OFF fill
    paid ONCE per matrix instead of once per pass. Measured motivation:
    the fullstep probe shows the step body runs at ~22.8 ns/chain-step
    (89.7 GCUPS at K=4) while the passed grid achieves 54.7 — the gap is
    almost entirely inter-pass drain (chain-step utilization ~68% at
    23728^2), not body ops. Cross-pass hazard: chain 0 of group g reads
    the predecessor row chain K-1 (group g-1) is still writing; safe
    while its write frontier leads the read frontier, i.e.
    NSpad >= (K-1)*OFF + R + W + 256 (the caller guards).
    ``wrap + banded`` (ops/pallas_banded.py, B > K) is the same continuous
    echelon over a column band: the halo columns arrive as per-chain
    block-windowed refs and the per-block j==0 seeds are read from SMEM at
    the chain's current block index.
    """
    ninf = NEG_INF_I32
    n_win = W // 128
    q = TW // W  # hcol out-blocks advance every q chunks
    offw = OFF // W
    is_sw = kind == "sw"
    affine = gap == "affine"
    assert not (banded and (batch or capture_cost))
    assert not (dense and (batch or banded))
    assert not (wrap and (batch or dense))
    # packedx (ROOFLINE agenda #1): the xd shift registers of 4 chains
    # share one byte-packed carry fed from a SHARED periodic stream
    # (pack_x_streams); full-matrix and banded mlsp forms.
    assert not (packedx and (batch or dense))
    # packedef (ROOFLINE "packed E/F carry analog"): carry the affine E/F
    # state as byte deltas de = H - max(E, H+g), df = H - max(F, H+g)
    # packed 4 chains per word. EXACT refactoring, not an approximation:
    # E[i][j+1] = max(E[i][j], H[i][j]+g) + ge = (H[i][j] - de) + ge, so
    # moving the max to produce-time (delta capture) reproduces the true
    # E/F bit-exactly while replacing 2 per-chain (SUB,128) carries with
    # ceil(K/4) shared words (register lever) and collapsing the K
    # per-chain F shift2+fill rolls into one per word (roll-port lever).
    # Deltas are byte-safe unconditionally: cell = max(..., E, F) >= E, F
    # gives de, df in [0, -g] for EVERY lane (junk included); requires
    # -gapo <= 255 (host wrapper gates).
    assert not (packedef and (batch or dense))
    assert not (packedef and not affine)
    # remath: rematerialize the header-injection values (hdrH/dhdr/ehdr)
    # instead of holding K loop-invariant (SUB,128) vectors live across
    # the hot loop (4-6 vregs/chain). Full-matrix form: the injected
    # value at the single matching lane i2d == c is a scalar function of
    # c, so a per-window base + tt*g scalar add reproduces it exactly.
    # Banded form: the headers are halo DATA, but within one 128-step
    # window every select reads lane (c // 128, c % 128) with c // 128
    # constant (clocs are 128-aligned) — so a per-window (1, 128)
    # dynamic-sublane stripe read from the halo ref replaces the hoisted
    # vector (the (1,128) stripe broadcast selects the same element).
    assert not (remath and (batch or dense))
    # nobc (SW only): drop the bc (first-occurrence step) carry + its
    # per-step select; the per-step capture degrades to a masked running
    # max (cellm = live ? cell : 0; bv = max(bv, cellm)) — 4 vector ops
    # instead of 6 and one fewer (SUB, 128) carry per chain (the spill
    # cliff is one vreg wide, ROOFLINE §4). The host recovers the best
    # cell's COLUMN exactly: j* = first j with H[i*, j] == v* in the
    # best row, recomputed from the stored sparse headers (identical to
    # the oracle's row-major first-occurrence tie-break).
    assert not (nobc and not is_sw)
    assert not (nobc and (batch or banded or dense))
    # subprow (ROADMAP lever #4): replace the per-step bottom-row capture
    # (1 lane roll + 1 select per chain-step — the ~20% the noprow
    # ablation found) with a per-step STATIC (1,128) store of the bottom
    # sublane into a per-chain (128,128) VMEM scratch, then rebuild the
    # flushed prow window once per 128 steps with 128/SUB STRIDED lane
    # rolls (pltpu.roll stride=1 over sublanes spreads each SUB-row
    # tile's lane-127 column onto consecutive destination lanes) + masked
    # merges + one sublane max-reduce. Also frees the prow (and affine
    # prowF) loop-carry vreg per chain. Full-matrix + banded mlsp forms.
    assert not (subprow and (batch or dense))
    # bodyoff (debug probe, ROOFLINE §7.2): skip the 128 DP steps of
    # every window but keep the full grid, per-window input reads,
    # scratch stores, flushes and output DMAs — T(bodyoff) isolates the
    # grid/window machinery cost from the step-body cost. Outputs are
    # junk; only reachable through an explicit pallas_mlsp_v2 kwarg.
    assert not (bodyoff and not subprow)
    assert not (bodyoff and (batch or dense or banded or capture_cost))
    assert not (bodyoff and (packedx or packedef or remath or is_sw))
    NSpad = prev_len - 128
    SPB = NSpad // W  # wrap mode: chunks per row block
    BBtot = B // K if K else 1
    npk = _cdiv(K, 4) if packedx else 0
    npk2 = _cdiv(K, 4) if packedef else 0

    def kernel(*refs):
        g_ref = refs[0]
        pos = 1
        if banded:
            previn = refs[pos]; pos += 1
            if affine:
                prevFin = refs[pos]; pos += 1
            if wrap:
                # Wrap-banded: the halo columns are per-BLOCK windows (the
                # chain's current row block moves with the grid), so they
                # arrive as K windowed refs like the planes/xwin inputs.
                hcolin_refs = refs[pos: pos + K]; pos += K
                dcolin_refs = refs[pos: pos + K]; pos += K
                if affine:
                    ecolin_refs = refs[pos: pos + K]; pos += K
            else:
                hcolin = refs[pos]; pos += 1
                dcolin = refs[pos]; pos += 1
                if affine:
                    ecolin = refs[pos]; pos += 1
        planes_refs = refs[pos: pos + K]; pos += K
        if packedx:
            xw_refs = refs[pos: pos + npk]; pos += npk
        else:
            xw_refs = refs[pos: pos + K]; pos += K
        hrow_refs = refs[pos: pos + K]; pos += K
        hcol_refs = refs[pos: pos + K]; pos += K
        if affine:
            frow_refs = refs[pos: pos + K]; pos += K
            ecol_refs = refs[pos: pos + K]; pos += K
        if is_sw:
            bv_refs = refs[pos: pos + K]; pos += K
            if not nobc:
                bc_refs = refs[pos: pos + K]; pos += K
        if capture_cost:
            cost_refs = refs[pos: pos + K]; pos += K
        if dense:
            vhist_refs = refs[pos: pos + K]; pos += K
        prevb = refs[pos: pos + K]; pos += K
        if affine:
            prevf = refs[pos: pos + K]; pos += K
        v1s = refs[pos]; pos += 1
        shps = refs[pos]; pos += 1
        xds = refs[pos]; pos += 1
        accs = refs[pos]; pos += 1
        prows = refs[pos]; pos += 1
        if affine:
            if packedef:
                # Shared byte-packed E/F delta words (npk2, SUB, 128)
                # in the e1s/f1s scratch slots.
                des = refs[pos]; pos += 1
                dfs = refs[pos]; pos += 1
            else:
                e1s = refs[pos]; pos += 1
                f1s = refs[pos]; pos += 1
            accEs = refs[pos]; pos += 1
            prowFs = refs[pos]; pos += 1
        if is_sw:
            bvs = refs[pos]; pos += 1
            if not nobc:
                bcs = refs[pos]; pos += 1
        if capture_cost:
            costs_s = refs[pos]; pos += 1
        if subprow:
            sprow = refs[pos]; pos += 1
            if affine:
                sprowF = refs[pos]; pos += 1

        if wrap:
            # Continuous echelon: one chunk axis; chain k's row block and
            # within-block chunk derive from its offset local chunk. The
            # clip pins bubble phases (before the chain's first block /
            # after its last) to a real block whose gated stores then
            # land only in ignored slots (tile 0 / past-tcols tiles).
            bb = None
            ch = pl.program_id(0)
            lchs = [ch - k * offw for k in range(K)]
            bbks = [jnp.clip(lchs[k] // SPB, 0, BBtot - 1)
                    for k in range(K)]
            wchs = [lchs[k] - bbks[k] * SPB for k in range(K)]
            blks = [bbks[k] * K + k for k in range(K)]
        elif banded:
            bb = jnp.int32(0)
            ch = pl.program_id(0)
            blks = [jnp.int32(k) for k in range(K)]
        else:
            bb = pl.program_id(0)
            ch = pl.program_id(1)
            blks = [bb if batch else bb * K + k for k in range(K)]
        g = g_ref[0, 0]
        ge = g_ref[0, 1]
        # In banded mode these are BAND-LOCAL dims: adjr_loc = adjr - row0
        # and adjc_loc = adjc - c0, so the iok/uok masks below keep the
        # blk = k (bb = 0) formulas unchanged.
        adjrs = [g_ref[0, 2 + k] for k in range(K)]
        adjcs = [g_ref[0, 2 + K + k] for k in range(K)]
        if banded and not wrap:
            seeds = [g_ref[0, 2 + 2 * K + k] for k in range(K)]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
        l_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        i2d = s_iota * 128 + l_iota

        # Per-chain header-value vectors (hoisted out of the hot loop).
        # hdrH = H[i, 0]; dhdr = H[i-1, 0]; ehdr = E at u == 1.
        # Banded: the "header column" is the band's left edge, fed by the
        # ICI halo — hdrH = H[i, c0], dhdr = H[i-1, c0], and ehdr follows
        # the E recurrence from the halo's (H, E) pair:
        # E[i, c0+1] = max(E[i, c0], H[i, c0] + g) + ge.
        hdrHs, dhdrs, ehdrs = [], [], []
        for k in range(K if not remath else 0):
            if banded:
                hk = hcolin_refs[k][0] if wrap else hcolin[k]
                dk = dcolin_refs[k][0] if wrap else dcolin[k]
                hdrHs.append(hk)
                dhdrs.append(dk)
                if affine:
                    ek = ecolin_refs[k][0] if wrap else ecolin[k]
                    ehdrs.append(jnp.maximum(ek, hk + g) + ge)
                continue
            blk0 = blks[k]
            io = 1 + blk0 * R + i2d
            if is_sw:
                hdrH = jnp.zeros((SUB, 128), jnp.int32)
                dhdr = hdrH
            elif affine:
                hdrH = g + io * ge
                dhdr = jnp.where(io == 1, 0, g + (io - 1) * ge)
            else:
                hdrH = io * g
                dhdr = hdrH - g
            hdrHs.append(hdrH)
            dhdrs.append(dhdr)
            if affine:
                ehdrs.append(hdrH + g + ge)

        def seed_header():
            # Predecessor row: in echelon mode only chain K-1's
            # buffer (chain 0 of pass 0 reads it as its predecessor);
            # in batch mode every chain is its own pair and starts
            # from the header row. Banded mode takes the previous
            # pass's output rows as inputs instead of the analytic
            # header row.
            if banded:
                prevb[K - 1][0:1, :] = previn[0:1, :]
                if affine:
                    prevf[K - 1][0:1, :] = prevFin[0:1, :]
                return
            jidx = jax.lax.broadcasted_iota(jnp.int32, (1, prev_len), 1)
            hdr_targets = range(K) if batch else (K - 1,)
            for kk in hdr_targets:
                if is_sw:
                    prevb[kk][0:1, :] = jnp.zeros(
                        (1, prev_len), jnp.int32
                    )
                elif affine:
                    prevb[kk][0:1, :] = jnp.where(
                        jidx == 0, 0, g + jidx * ge
                    )
                else:
                    prevb[kk][0:1, :] = jidx * g
                if affine:
                    prevf[kk][0:1, :] = jnp.full(
                        (1, prev_len), ninf, jnp.int32
                    )

        def init_chain(k):
            v1s[k] = jnp.full((SUB, 128), ninf, jnp.int32)
            shps[k] = jnp.full((SUB, 128), ninf, jnp.int32)
            if not packedx:
                # packedx: the packed carry is CONTINUOUS across block
                # wraps (the shared stream is periodic mod NSpad, so a
                # chain's live lanes always hold current letters; its
                # dead fill-phase lanes hold junk that is never read) —
                # no per-chain re-init, and program-start scratch junk is
                # covered by the same dead-lane argument.
                xds[k] = jnp.zeros((SUB, 128), jnp.int32)
            accs[k] = jnp.full((SUB, 128), ninf, jnp.int32)
            # prow window accumulator; j == 0 header element seeded
            # (banded: H[(blk+1)R, c0] from the halo, via SMEM).
            if banded:
                # Wrap-banded: per-BLOCK j==0 seed (H[(blk+1)R, c0]) read
                # at the chain's current block index from SMEM.
                seed = g_ref[0, 2 + 2 * K + blks[k]] if wrap else seeds[k]
            else:
                blk0 = blks[k]
                if is_sw:
                    seed = jnp.int32(0)
                elif affine:
                    seed = g + ((blk0 + 1) * R) * ge
                else:
                    seed = ((blk0 + 1) * R) * g
            prows[k] = jnp.where(l_row == 0, seed, jnp.int32(ninf))
            if affine:
                if not packedef:
                    # packedef: no per-chain E/F re-init — the freshly
                    # re-initialized v1 = ninf dominates e_new/f_new
                    # (e_new = v1 + ge - de with de in [0,255]), and the
                    # shared delta words belong to 4 chains whose blocks
                    # start at different grid steps. Stale bytes feed
                    # only pre-injection (dead) lanes, like packedx.
                    e1s[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                    f1s[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                accEs[k] = jnp.full((SUB, 128), ninf, jnp.int32)
                prowFs[k] = jnp.full((1, 128), ninf, jnp.int32)
            if is_sw:
                bvs[k] = jnp.zeros((SUB, 128), jnp.int32)
                if not nobc:
                    bcs[k] = jnp.zeros((SUB, 128), jnp.int32)
            if capture_cost:
                costs_s[k] = jnp.full((SUB, 128), ninf, jnp.int32)

        if wrap:
            @pl.when(ch == 0)
            def _seed():
                seed_header()
            # Per-chain carry re-init at each of the chain's block starts
            # (during a chain's pre-start bubble its carries are garbage,
            # but every store it could make is gated to ignored slots).
            for k in range(K):
                @pl.when(wchs[k] == 0)
                def _init_k(k=k):
                    init_chain(k)
        else:
            @pl.when(ch == 0)
            def _init():
                @pl.when(bb == 0)
                def _():
                    seed_header()
                for k in range(K):
                    init_chain(k)

        def shift2(v, fill):
            # out[i] = v[i-1] (linear, not circular); out[0] = fill's lane 0.
            a = pltpu.roll(v, 1, axis=1)
            b = pltpu.roll(a, 1, axis=0)  # b[s,0] == v[s-1,127]
            out = jnp.where(l_iota == 0, b, a)
            return jnp.where(i2d == 0, fill, out)

        def bot_capture(mat, prow_acc, sel_p, gate):
            # Cheap bottom-row capture: last sublane + static lane rotate
            # (a (1,1) lane extract costs ~75 cycles).
            bot = mat[SUB - 1:SUB, :]
            last = pltpu.roll(bot, (sel_p + 1) % 128, axis=1)
            return jnp.where((l_row == sel_p) & gate, last, prow_acc)

        if subprow:
            # Lane-minus-sublane index, mod 128: the spread's destination
            # diagonal masks below are compares against this constant.
            diffm = (l_iota - s_iota) & 127

        def sub_flush(scr, k):
            # Rebuild the (1,128) output-row window from the per-step
            # bottom-sublane scratch: scratch row tt holds step tt's
            # bottom sublane, whose lane-127 element is the output-row
            # value destined for prow lane (tt + 2) % 128. For each
            # SUB-row tile, ONE strided lane roll (sublane s shifted by
            # shift0 + s) lands every wanted element on its destination
            # lane; a static diagonal mask merges the tiles and a sublane
            # max-reduce flattens (each lane is covered by exactly one
            # (tile, sublane), all other positions hold NEG_INF-dominated
            # junk only after the masked merge).
            mrg = None
            for qq in range(128 // SUB):
                tile = scr[k, pl.ds(qq * SUB, SUB), :]
                shift0 = (qq * SUB + 3) % 128
                if shift0 + SUB - 1 >= 128:
                    # Mosaic bounds a strided rotate's max per-sublane
                    # shift at the vreg width (treat the bound as
                    # EXCLUSIVE — a shift of exactly 128 must not rely
                    # on an inclusive check); split such groups into a
                    # static rotate + a stride-only rotate.
                    tile = pltpu.roll(tile, shift0, axis=1)
                    shift0 = 0
                rolled = pltpu.roll(
                    tile, shift0, axis=1, stride=1, stride_axis=0,
                )
                msk = diffm == ((qq * SUB + 2) & 127)
                mrg = jnp.where(
                    msk, rolled, ninf if mrg is None else mrg
                )
            return jnp.max(mrg, axis=0, keepdims=True)

        # Plane words resident for the whole program (8 x (SUB,128) per
        # chain): the per-lane substitution row, biased bytes.
        planes = [[planes_refs[k][0, p] for p in range(8)] for k in range(K)]
        spr = 1 if subprow else 0
        NCAR = ((4 if packedx else 5) - spr
                + (((2 if packedef else 4) - spr) if affine else 0)
                + ((1 if nobc else 2) if is_sw else 0)
                + (1 if capture_cost else 0))

        def window_body(w, carry):
            vs = list(carry)
            xws = [xw_refs[i][0, pl.ds(w, 1), :]
                   for i in range(npk if packedx else K)]
            # Per-window scalars (hoisted: per-step modulo/compare scalar
            # work measurably stalls the vector pipeline).
            if wrap:
                clocs = [wchs[k] * W + w * 128 for k in range(K)]
            else:
                clocs = [ch * W + w * 128 - k * OFF for k in range(K)]
            selbs = [jnp.mod(clocs[k] + 1, TW) for k in range(K)]
            pws = []
            for k in range(K):
                cwk = pl.multiple_of(jnp.maximum(clocs[k], 0), 128)
                # Clamp so drain-phase reads stay inside the buffer (OOB
                # VMEM accesses are NOT clamped on real TPUs — they spill
                # into the adjacent allocation).
                cwk = pl.multiple_of(
                    jnp.minimum(cwk, prev_len - 256), 128
                )
                kp = k if batch else (K - 1 if k == 0 else k - 1)
                ent = [
                    prevb[kp][0:1, pl.ds(cwk, 128)],
                    prevb[kp][0:1,
                              pl.ds(pl.multiple_of(cwk + 128, 128), 128)],
                ]
                if affine:
                    ent += [
                        prevf[kp][0:1, pl.ds(cwk, 128)],
                        prevf[kp][0:1,
                                  pl.ds(pl.multiple_of(cwk + 128, 128), 128)],
                    ]
                pws.append(ent)

            if packedef:
                # Packed F fill-delta windows: byte q of word p is chain
                # 4p+q's min(prevH - prevF, -g) stream. Rolls commute
                # with the elementwise min/pack, so ONE roll + shift2 of
                # the packed word per step replaces the K per-chain
                # fillF rolls + shF shift2s. prevF <= prevH at real
                # cells keeps the delta in [0, -g]; the header row's
                # prevF = NEG_INF (-2^30) leaves the subtraction far
                # from int32 wrap before the min clamps it to -g.
                pwds = []
                for p in range(npk2):
                    w0 = w1 = None
                    for qq in range(4):
                        kk = 4 * p + qq
                        if kk >= K:
                            break
                        # clip, not min: a chain's drain-phase windows
                        # read uninitialized prevb/prevf tail scratch,
                        # and a negative junk delta OR-packed into the
                        # shared word would pollute OTHER chains' bytes
                        # (at real lanes prevH - prevF >= 0, so the
                        # lower clamp never fires there).
                        d0 = jnp.clip(pws[kk][0] - pws[kk][2], 0, -g)
                        d1 = jnp.clip(pws[kk][1] - pws[kk][3], 0, -g)
                        if qq:
                            w0 = w0 | (d0 << (8 * qq))
                            w1 = w1 | (d1 << (8 * qq))
                        else:
                            w0, w1 = d0, d1
                    pwds.append((w0, w1))
            if remath and banded:
                # Halo-header STRIPE reads: within this window every
                # header select hits lane (c // 128, c % 128) with
                # c // 128 constant (clocs are 128-aligned), so one
                # (1, 128) dynamic-sublane read per halo ref replaces
                # the hoisted (SUB, 128) vector; the stripe broadcast
                # selects the same element at i2d == c. Out-of-range
                # windows (bubble/drain) clamp to a real stripe whose
                # value the select never reads.
                hstr, dstr, estr = [], [], []
                for k in range(K):
                    s0 = jnp.clip(clocs[k] // 128, 0, SUB - 1)
                    if wrap:
                        hk = hcolin_refs[k][0, pl.ds(s0, 1), :]
                        dk = dcolin_refs[k][0, pl.ds(s0, 1), :]
                    else:
                        hk = hcolin[k, pl.ds(s0, 1), :]
                        dk = dcolin[k, pl.ds(s0, 1), :]
                    hstr.append(hk)
                    dstr.append(dk)
                    if affine:
                        ek = (ecolin_refs[k][0, pl.ds(s0, 1), :] if wrap
                              else ecolin[k, pl.ds(s0, 1), :])
                        estr.append(jnp.maximum(ek, hk + g) + ge)
            elif remath and not is_sw:
                # Scalar header bases: the injected value at the single
                # matching lane i2d == c is a scalar function of
                # c = clocs[k] + tt, so one per-window base + a shared
                # tt*g(e) scalar add per step replaces the per-chain
                # loop-invariant header vectors (4-6 vregs/chain).
                if affine:
                    e0s = [g + (1 + blks[k] * R + clocs[k]) * ge + g + ge
                           for k in range(K)]
                    d0s = [g + (blks[k] * R + clocs[k]) * ge
                           for k in range(K)]
                    dzs = [blks[k] * R + clocs[k] for k in range(K)]
                    h0s = None
                else:
                    h0s = [(1 + blks[k] * R + clocs[k]) * g
                           for k in range(K)]
                    d0s = [h0s[k] - g for k in range(K)]

            if is_sw:
                # Folded argmax guards — one unsigned range compare per
                # step instead of three compares + three ands: i2w holds
                # i2d - cloc at lanes whose ROW is real (the old iok) and
                # +2^30 elsewhere, so uu = tt - i2w reproduces
                # u = c - i2d at live lanes and goes hugely negative —
                # i.e. unsigned-huge — at dead ones. The per-step test
                # uu <=u adjc - 2 is then exactly the old
                # (i2d <= c) & (i2d >= c - adjc + 2) & iok conjunction
                # (the adjc >= 2 scalar guard keeps a degenerate chain —
                # e.g. a banded device wholly past the real columns —
                # from turning adjc - 2 into a huge unsigned bound).
                i2ws, adjc2u = [], []
                for k in range(K):
                    lane_ok = (
                        (i2d <= adjrs[k] - 2 - blks[k] * R)
                        & (adjcs[k] >= 2)
                    )
                    i2ws.append(jnp.where(
                        lane_ok, i2d - clocs[k], jnp.int32(1 << 30)
                    ))
                    # Clamp the bound at 0: a DEGENERATE chain (banded
                    # device wholly past the pair's real columns,
                    # adjc_loc < 2 — reachable only through the giant
                    # STREAM, whose band width is set by the widest
                    # pair) must not let adjc - 2 wrap to a huge
                    # unsigned bound that out-ranges even the
                    # 2^30-offset dead-lane uu (round-3 fold bug: pad
                    # diagonal runs then win the argmax; caught by
                    # test_stream_matches_oracle[sw_*]).
                    adjc2u.append(
                        jnp.maximum(adjcs[k] - 2, 0).astype(jnp.uint32)
                    )

            if bodyoff:
                # Grid/window-machinery probe: one cheap op chain per
                # window that keeps every input stream (xwin, prevb
                # windows, planes), the sprow scratch store, the prow
                # flush (sub_flush + prevb store) and the hcol flush
                # alive with their production gating — minus the 128 DP
                # steps. The flags asserts above pin the carry layout to
                # [v1, sh1p, xd, acc, (e1, f1, accE)] per chain.
                for k in range(K):
                    st = list(vs[NCAR * k: NCAR * (k + 1)])
                    t = st[0] + pws[k][0] + pws[k][1] + xws[k]
                    if affine:
                        t = t + pws[k][2] + pws[k][3]
                    # Keep the planes input DMA live (cannot fold).
                    t = jnp.maximum(t, planes[k][0] - (1 << 30))
                    sprow[k, pl.ds(0, 1), :] = t[SUB - 1:SUB, :]
                    if affine:
                        sprowF[k, pl.ds(0, 1), :] = t[SUB - 1:SUB, :]
                    acc = jnp.maximum(st[3], t)
                    cwk = jnp.maximum(clocs[k], 0)

                    @pl.when((cwk >= R) & (cwk - R <= cols_p))
                    def _(k=k, cwk=cwk):
                        jb = pl.multiple_of(cwk - R, 128)
                        prow = sub_flush(sprow, k)
                        first = (l_row == 0) & (cwk == R)
                        prow = jnp.where(first, prows[k][0:1, :], prow)
                        prevb[k][0:1, pl.ds(jb, 128)] = prow
                        if affine:
                            prowF = sub_flush(sprowF, k)
                            prevf[k][0:1, pl.ds(jb, 128)] = prowF

                    @pl.when(jnp.mod(clocs[k], TW) == (R - 128) % TW)
                    def _(k=k, acc=acc):
                        hcol_refs[k][0, 0] = acc
                        if affine:
                            ecol_refs[k][0, 0] = acc

                    st[0] = t
                    st[3] = acc
                    vs[NCAR * k: NCAR * (k + 1)] = st
                return tuple(vs)

            for tt in range(128):
                if packedx:
                    # One shift register per 4 chains: a single fill roll
                    # + shift2 advances every chain's letter byte.
                    for p in range(npk):
                        fillp = (
                            pltpu.roll(xws[p], 128 - tt, axis=1)
                            if tt else xws[p]
                        )
                        vs[NCAR * K + p] = shift2(vs[NCAR * K + p], fillp)
                if packedef:
                    # One packed F-delta shift register per 4 chains
                    # (F crosses rows, so df shifts lanes like f1 did).
                    for p in range(npk2):
                        dfill = (
                            pwds[p][1] if tt == 127
                            else pltpu.roll(pwds[p][0], 127 - tt, axis=1)
                        )
                        slot = NCAR * K + npk + npk2 + p
                        vs[slot] = shift2(vs[slot], dfill)
                if remath:
                    tg = jnp.int32(0) if tt == 0 else g * tt
                    tge = jnp.int32(0) if tt == 0 else ge * tt
                for k in range(K):
                    st = vs[NCAR * k: NCAR * (k + 1)]
                    prow = prowF = None
                    if packedx:
                        if subprow:
                            v1, sh1p, acc = st[:3]
                            nhdr = 3
                        else:
                            v1, sh1p, acc, prow = st[:4]
                            nhdr = 4
                    elif subprow:
                        v1, sh1p, xd, acc = st[:4]
                        nhdr = 4
                    else:
                        v1, sh1p, xd, acc, prow = st[:5]
                        nhdr = 5
                    if affine:
                        if packedef and subprow:
                            accE = st[nhdr]
                        elif packedef:
                            accE, prowF = st[nhdr:nhdr + 2]
                        elif subprow:
                            e1, f1, accE = st[nhdr:nhdr + 3]
                        else:
                            e1, f1, accE, prowF = st[nhdr:nhdr + 4]
                    naff = ((2 if packedef else 4) - spr) if affine else 0
                    nbase = nhdr + naff
                    if is_sw:
                        bv = st[nbase]
                        if not nobc:
                            bc = st[nbase + 1]
                    if capture_cost:
                        costv = st[NCAR - 1]
                    c = clocs[k] + tt
                    pw, pw2 = pws[k][0], pws[k][1]

                    # --- substitution: skewed X letter + packed lookup ---
                    if packedx:
                        # Per-chain letter extract from the shared packed
                        # word: shift (free for k % 4 == 0) + and.
                        xd = vs[NCAR * K + k // 4]
                        if k % 4:
                            xd = xd >> ((k % 4) * 8)
                        xd = xd & 255
                    else:
                        fillx = (
                            pltpu.roll(xws[k], 128 - tt, axis=1)
                            if tt else xws[k]
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
                    sh1 = shift2(v1, fill1)  # lane0 <- prevH[c+1]
                    # sh1p (last step's sh1) has lane0 == prevH[c] — exactly
                    # the diagonal operand's header fill.
                    if remath:
                        # Header rematerialization: identical values to
                        # the hoisted vectors at the one lane the select
                        # reads (i2d == c).
                        if banded:
                            dh = dstr[k]
                            hh = hstr[k]
                            if affine:
                                eh = estr[k]
                        elif is_sw:
                            dh = jnp.int32(0)
                            hh = jnp.int32(0)
                            eh = g + ge
                        elif affine:
                            dh = jnp.where(
                                dzs[k] == -tt, jnp.int32(0),
                                d0s[k] + tge,
                            )
                            eh = e0s[k] + tge
                        else:
                            dh = d0s[k] + tg
                            hh = h0s[k] + tg
                    else:
                        dh = dhdrs[k]
                        if affine:
                            eh = ehdrs[k]
                        else:
                            hh = hdrHs[k]
                    diag = jnp.where(i2d == c, dh, sh1p)
                    # NO blanket validity mask in production (measured ~4
                    # vector ops/step saved): dead lanes — ahead of the
                    # wavefront (i2d > c) or past the matrix width
                    # (u = c - i2d >= cols_p) — carry junk that is
                    # structurally never read:
                    #   * every real cell's operands are header-injected
                    #     (the i2d == c selects) or come from live lanes;
                    #   * prow/prevb stores are gated to real columns, and
                    #     acc flushes that could hold dead-lane captures
                    #     land in out blocks no reader consumes (jl == 0 /
                    #     clipped drain blocks past tcols);
                    #   * NW junk drifts from NEG_INF_I32 by at most
                    #     max(subst) per step, staying far below any real
                    #     score for NS < ~6e6 steps (int32 head/floor room
                    #     ~1e9); SW's argmax gets an explicit front-lane
                    #     guard below instead.
                    # `masked` (interpret mode) re-applies the mask — same
                    # outputs, tractable XLA:CPU compile (see factory doc).
                    if masked:
                        valid = (i2d <= c) & (i2d > c - cols_p)
                    if not affine:
                        left = jnp.where(i2d == c, hh, v1)
                        cell = jnp.maximum(
                            diag + s, jnp.maximum(sh1, left) + g
                        )
                    elif packedef:
                        # E/F as packed byte deltas off the H carries —
                        # exact: de = v1 - max(e1, v1+g) so
                        # e_new = max(e1, v1+g) + ge = v1 - de + ge, and
                        # the F algebra rides sh1 (shift2 distributes
                        # over the subtraction; see the factory doc).
                        de = vs[NCAR * K + npk + k // 4]
                        if k % 4:
                            de = de >> ((k % 4) * 8)
                        de = de & 255
                        e_new = v1 + ge - de
                        e_new = jnp.where(i2d == c, eh, e_new)
                        dfw = vs[NCAR * K + npk + npk2 + k // 4]
                        if k % 4:
                            dfw = dfw >> ((k % 4) * 8)
                        f_new = sh1 + ge - (dfw & 255)
                        cell = jnp.maximum(
                            diag + s, jnp.maximum(e_new, f_new)
                        )
                        if masked:
                            e_new = jnp.where(valid, e_new, ninf)
                            f_new = jnp.where(valid, f_new, ninf)
                    else:
                        e_new = jnp.maximum(e1, v1 + g) + ge
                        e_new = jnp.where(i2d == c, eh, e_new)
                        fillF = (
                            pws[k][3] if tt == 127
                            else pltpu.roll(pws[k][2], 127 - tt, axis=1)
                        )
                        shF = shift2(f1, fillF)  # lane0 <- prevF[c+1]
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
                    if packedef:
                        # Produce-time clamp. clip, not min: cell >=
                        # e_new/f_new holds structurally (cell is their
                        # max) so real lanes are already in [0, -g],
                        # but junk-lane subtractions can WRAP int32
                        # negative and a negative byte OR-packed into
                        # the shared word would pollute other chains'
                        # live bytes.
                        de_new = jnp.clip(cell - e_new, 0, -g)
                        df_new = jnp.clip(cell - f_new, 0, -g)
                        qq = k % 4
                        if qq == 0:
                            newde, newdf = de_new, df_new
                        else:
                            newde = newde | (de_new << (8 * qq))
                            newdf = newdf | (df_new << (8 * qq))
                        if qq == 3 or k == K - 1:
                            vs[NCAR * K + npk + k // 4] = newde
                            vs[NCAR * K + npk + npk2 + k // 4] = newdf

                    blk = blks[k]
                    if is_sw:
                        # Per-lane running max + first-occurrence step; pad
                        # rows/cols excluded (pad letters score like real
                        # ones under the zero clamp), and front lanes
                        # excluded (their zero-clamped junk would look
                        # real without the blanket mask above). All three
                        # guards ride one unsigned range compare against
                        # the per-window i2ws precompute.
                        uu = (tt - i2ws[k]).astype(jnp.uint32)
                        if nobc:
                            # Value-only capture; the best column is
                            # recovered host-side from the sparse headers
                            # (factory doc).
                            cellm = jnp.where(uu <= adjc2u[k], cell, 0)
                            bv = jnp.maximum(bv, cellm)
                        else:
                            upd = (cell > bv) & (uu <= adjc2u[k])
                            bv = jnp.where(upd, cell, bv)
                            bc = jnp.where(upd, c, bc)
                    if capture_cost:
                        # The true bottom-right cell (adjr-1, adjc-1) lives
                        # at lane adjr-2-blk*R, step lane + adjc - 2.
                        lt = adjrs[k] - 2 - blk * R
                        hit = (i2d == lt) & (c == lt + adjcs[k] - 2)
                        costv = jnp.where(hit, cell, costv)
                    if dense:
                        # Per-step wavefront history (skewed): element c of
                        # the chain's NSpad-long stream. Gated per window
                        # so fill/drain-phase junk never lands in the
                        # (clipped) first/last out blocks.
                        @pl.when(
                            (clocs[k] >= 0) & (clocs[k] < NSpad)
                        )
                        def _(cell=cell, k=k):
                            vhist_refs[k][0, pl.ds(w * 128 + tt, 1)] = (
                                cell[None]
                            )

                    # --- output-row capture (H[(b+1)R, j], F likewise) ---
                    sel_p = (tt + 2) % 128
                    if subprow:
                        # Static bottom-sublane store; the flushed window
                        # is rebuilt from the scratch below (sub_flush) —
                        # no per-step lane roll, no prow loop carry. The
                        # per-step `gate` (c >= R-1) is subsumed by the
                        # flush gate cwk >= R except for the two-step
                        # window overlap at cwk == R, fixed up below.
                        sprow[k, pl.ds(tt, 1), :] = cell[SUB - 1:SUB, :]
                        if affine:
                            sprowF[k, pl.ds(tt, 1), :] = (
                                f_new[SUB - 1:SUB, :]
                            )
                    else:
                        gate = c >= R - 1
                        prow = bot_capture(cell, prow, sel_p, gate)
                        if affine:
                            prowF = bot_capture(f_new, prowF, sel_p, gate)
                    if sel_p == 127:
                        cwk = jnp.maximum(clocs[k], 0)

                        # Upper gate: windows past cols_p are drain-phase
                        # junk AND would store out of bounds (real-TPU OOB
                        # stores wrap into the next scratch buffer).
                        @pl.when((cwk >= R) & (cwk - R <= cols_p))
                        def _(prow=prow, prowF=(prowF if affine else None),
                              cwk=cwk, k=k):
                            jb = pl.multiple_of(cwk - R, 128)
                            if subprow:
                                # Scratch rows 0..125 were written this
                                # window, 126/127 by the previous one —
                                # exactly the two-step overlap the rolled
                                # prow accumulator carried. At jb == 0
                                # lane 0 is the seeded j == 0 header
                                # element (init_chain wrote it into the
                                # prows slot), not step c == R-2 junk.
                                prow = sub_flush(sprow, k)
                                first = (l_row == 0) & (cwk == R)
                                prow = jnp.where(
                                    first, prows[k][0:1, :], prow
                                )
                            prevb[k][0:1, pl.ds(jb, 128)] = prow
                            if affine:
                                if subprow:
                                    prowF = sub_flush(sprowF, k)
                                    prowF = jnp.where(
                                        first, jnp.int32(ninf), prowF
                                    )
                                prevf[k][0:1, pl.ds(jb, 128)] = prowF

                    # --- tile-header-column capture (flush BEFORE update,
                    # v1 semantics). The flush step c % TW == R-1 can only
                    # land on tt == 127 (R and TW are multiples of 128), so
                    # the predicated store is hoisted out of the hot steps.
                    if tt == 127:
                        @pl.when(jnp.mod(clocs[k], TW) == (R - 128) % TW)
                        def _(acc=acc, accE=(accE if affine else None), k=k):
                            hcol_refs[k][0, 0] = acc
                            if affine:
                                ecol_refs[k][0, 0] = accE

                    sel = selbs[k] + tt
                    sel = sel - jnp.where(sel >= TW, TW, 0)
                    acc = jnp.where(i2d == sel, cell, acc)
                    if affine:
                        accE = jnp.where(i2d == sel, e_new, accE)

                    st = [cell, sh1] + ([] if packedx else [xd]) + [acc]
                    if not subprow:
                        st += [prow]
                    if affine:
                        st += [] if packedef else [e_new, f_new]
                        st += [accE] if subprow else [accE, prowF]
                    if is_sw:
                        st += ([bv] if nobc else [bv, bc])
                    if capture_cost:
                        st += [costv]
                    vs[NCAR * k: NCAR * (k + 1)] = st
            return tuple(vs)

        init = []
        for k in range(K):
            init += [v1s[k], shps[k]] + ([] if packedx else [xds[k]])
            init += [accs[k]] + ([] if subprow else [prows[k]])
            if affine:
                init += [] if packedef else [e1s[k], f1s[k]]
                init += [accEs[k]] if subprow else [accEs[k], prowFs[k]]
            if is_sw:
                init += ([bvs[k]] if nobc else [bvs[k], bcs[k]])
            if capture_cost:
                init += [costs_s[k]]
        if packedx:
            init += [xds[p] for p in range(npk)]
        if packedef:
            init += [des[p] for p in range(npk2)]
            init += [dfs[p] for p in range(npk2)]
        out = jax.lax.fori_loop(0, n_win, window_body, tuple(init))
        nhdr = (4 if packedx else 5) - spr
        nbase = nhdr + (((2 if packedef else 4) - spr) if affine else 0)
        for k in range(K):
            st = out[NCAR * k: NCAR * (k + 1)]
            v1s[k] = st[0]
            shps[k] = st[1]
            n = 2
            if not packedx:
                xds[k] = st[n]
                n += 1
            accs[k] = st[n]
            n += 1
            if not subprow:
                prows[k] = st[n]
            if affine:
                if not packedef:
                    e1s[k] = st[nhdr]
                    f1s[k] = st[nhdr + 1]
                accEs[k] = st[nhdr + (0 if packedef else 2)]
                if not subprow:
                    prowFs[k] = st[nhdr + (1 if packedef else 3)]
            if is_sw:
                bvs[k] = st[nbase]
                if not nobc:
                    bcs[k] = st[nbase + 1]
            if capture_cost:
                costs_s[k] = st[NCAR - 1]
        if packedx:
            for p in range(npk):
                xds[p] = out[NCAR * K + p]
        if packedef:
            for p in range(npk2):
                des[p] = out[NCAR * K + npk + p]
                dfs[p] = out[NCAR * K + npk + npk2 + p]

        if wrap:
            # Per-chain output flush at the chain's block END (the out
            # block index moves to the next row block right after).
            for k in range(K):
                @pl.when(wchs[k] == SPB - 1)
                def _fin_k(k=k):
                    hrow_refs[k][0, 0, :] = prevb[k][0, :]
                    if affine:
                        frow_refs[k][0, 0, :] = prevf[k][0, :]
                    if is_sw:
                        bv_refs[k][0] = bvs[k]
                        if not nobc:
                            bc_refs[k][0] = bcs[k]
        else:
            @pl.when(ch == CH - 1)
            def _fin():
                for k in range(K):
                    hrow_refs[k][0, 0, :] = prevb[k][0, :]
                    if affine:
                        frow_refs[k][0, 0, :] = prevf[k][0, :]
                    if is_sw:
                        bv_refs[k][0] = bvs[k]
                        if not nobc:
                            bc_refs[k][0] = bcs[k]
                    if capture_cost:
                        cost_refs[k][0] = costs_s[k]

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


def wrap_ok(*, R: int, W: int, K: int, band_cols: int) -> bool:
    """True when the continuous (wrap) echelon is hazard-free for this
    geometry (``band_cols`` is the padded column count — cols_p for the
    full matrix, the per-device band width for the banded engine): chain 0
    of group g reads the predecessor row chain K-1 (group g-1) is still
    writing, safe only while the write frontier leads the read frontier
    (see the _make_kernel wrap docstring for the derivation)."""
    NSpad = _cdiv(R + band_cols - 1 + 128, W) * W
    OFF = W * _cdiv(R + 256, W)
    return NSpad >= (K - 1) * OFF + R + W + 256


def wrap_loc(ch, k, *, offw: int, SPB: int, BBtot: int):
    """Chain k's (group index, within-block chunk) at wrap grid step ch;
    bubble phases (before the chain's first block / after its last) clip
    to a real group so gated stores land only in ignored slots."""
    lch = ch - k * offw
    bbk = jnp.clip(lch // SPB, 0, BBtot - 1)
    return bbk, lch - bbk * SPB


def pack_x_streams(xs, *, OFF: int, K: int):
    """Byte-pack the K chains' X-letter streams into ceil(K/4) planes.

    The packedx register lever (ROOFLINE.md agenda #1, measured in
    vpu_probe fullstep: K=8 body 133.6 GCUPS vs base-K=6 115.1): instead
    of each chain carrying its own xd shift register (2 vregs) fed from
    its own xwin ref, ceil(K/4) packed carries are fed from SHARED
    planes where byte (k mod 4) of plane k//4 at stream position m is
    chain k's letter at ITS OWN local position — chains run k*OFF steps
    apart, and in wrap mode chain k's local stream restarts every NSpad
    steps over the same X, so the stagger is periodic:

        plane[p][m] = sum_{q<4, k=4p+q<K} xs[(m - k*OFF) mod NSpad] << 8q

    One ref indexed by (ch mod SPB) serves every chain in both grid
    modes: the packed read at global position j extracts, for chain k,
    xs[(j - k*OFF) mod NSpad] — during live phases j - k*OFF is the
    chain's local position (mod NSpad in wrap mode, identity in echelon
    mode), and during fill/drain bubbles the wrapped junk letters feed
    cells whose stores are already gated to ignored slots (exactly like
    today's clip-to-chunk-0 junk). Parity with the per-chain xwin layout
    is pinned by tests/test_pallas_wavefront2.py::test_pack_x_streams.

    xs: (NSpad,) int32 letter stream (xpad[:NSpad]; values < 32).
    Returns a list of ceil(K/4) (NSpad,) int32 packed planes.
    """
    planes = []
    for p in range(_cdiv(K, 4)):
        w = jnp.zeros_like(xs)
        for q in range(4):
            k = 4 * p + q
            if k >= K:
                break
            w = w | (jnp.roll(xs, k * OFF) << (8 * q))
        planes.append(w)
    return planes


def wrap_interleave(parts, BBtot: int, K: int, tail: tuple):
    """Merge K per-chain output arrays — chain k wrote only rows
    bbk*K + k of its own (BBtot*K,) + tail array — into one (B,) + tail."""
    return jnp.stack(
        [parts[k].reshape((BBtot, K) + tail)[:, k] for k in range(K)],
        axis=1,
    ).reshape((BBtot * K,) + tail)


@functools.partial(
    jax.jit,
    static_argnames=("R", "W", "TW", "K", "kind", "gap", "interpret",
                     "packedx", "packedef", "remath", "nobc", "subprow",
                     "bodyoff"),
)
def pallas_mlsp_v2(subst, Y, X, gapo, gape, adjr, adjc, *, R: int, W: int,
                   TW: int, K: int, kind: str = "nw", gap: str = "linear",
                   interpret: bool = False, packedx: bool = False,
                   packedef: bool = False, remath: bool = False,
                   nobc: bool = False, subprow: bool = False,
                   bodyoff: bool = False):
    """Sparse fill v2 for any spec. Returns a dict:

    hrow: (B, prev_len)         row (b+1)*R of H (indexed by global j)
    hcol: (B, CT, SUB, 128)     hcol[b, jt] = H[b*R+1 .. (b+1)*R, jt*TW]
    frow/ecol (affine):         F rows / E cols, same shapes
    bv/bc (SW):                 (B, SUB, 128) per-lane best value and the
                                step c of its first occurrence

    Requires rows_p % (K*R) == 0, cols_p % TW == 0, TW % W == 0, TW >= R,
    W % 128 == 0; affine requires gapo <= 0, gape <= 0. ``packedef``
    (affine only) additionally requires -gapo <= 255 (byte-packed E/F
    deltas — see the _make_kernel doc); outputs are bit-identical.
    ``remath`` rematerializes the header-injection values as scalars.
    """
    rows_p = Y.shape[0] - 1
    cols_p = X.shape[0] - 1
    SUB = R // 128
    B = rows_p // R
    BB = B // K
    affine = gap == "affine"
    is_sw = kind == "sw"
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

    # Continuous echelon (wrap) whenever the cross-pass pipelining is
    # hazard-free: chain 0 of block group g reads the predecessor row
    # chain K-1 (group g-1) is still writing, safe iff the write frontier
    # leads the read frontier by a window (see _make_kernel docstring).
    SPB = NSpad // W
    use_wrap = wrap_ok(R=R, W=W, K=K, band_cols=cols_p)
    if use_wrap:
        CT = _cdiv(SPB, TW // W)
        grid = (BB * SPB + (K - 1) * offw,)
    else:
        grid = (BB, CH)

    packedef = packedef and gap == "affine"
    nobc = nobc and is_sw
    kernel, q, _ = _make_kernel(
        K=K, SUB=SUB, W=W, CH=CH, cols_p=cols_p, R=R, TW=TW, OFF=OFF,
        prev_len=prev_len, B=B, kind=kind, gap=gap,
        masked=interpret, wrap=use_wrap, packedx=packedx,
        packedef=packedef, remath=remath, nobc=nobc, subprow=subprow,
        bodyoff=bodyoff,
    )
    npk = _cdiv(K, 4) if packedx else 0
    npk2 = _cdiv(K, 4) if packedef else 0
    if packedx:
        # Shared byte-packed letter streams (ROOFLINE agenda #1): one ref
        # per 4 chains, periodic mod NSpad, indexed by (ch mod SPB).
        pstreams = [
            w.reshape(NSpad // W, W // 128, 128)
            for w in pack_x_streams(xpad[:NSpad], OFF=OFF, K=K)
        ]
    gmat = jnp.stack(
        [jnp.int32(gapo), jnp.int32(gape)]
        + [jnp.asarray(adjr, jnp.int32)] * K
        + [jnp.asarray(adjc, jnp.int32)] * K
    ).reshape(1, 2 + 2 * K)

    def kmap(fn):
        return [
            pl.BlockSpec(
                fn.shape, functools.partial(fn.index, k=k),
                memory_space=fn.space,
            )
            for k in range(K)
        ]

    class _S:  # tiny spec helper
        def __init__(self, shape, index, space=pltpu.VMEM):
            self.shape, self.index, self.space = shape, index, space

    if use_wrap:
        def _wloc(ch, k):
            return wrap_loc(ch, k, offw=offw, SPB=SPB, BBtot=BB)

        planes_spec = _S(
            (1, 8, SUB, 128),
            lambda ch, k=0: (_wloc(ch, k)[0] * K + k, 0, 0, 0),
        )
        xw_spec = _S(
            (1, W // 128, 128),
            lambda ch, k=0: (
                jnp.clip(_wloc(ch, k)[1], 0, SPB - 1), 0, 0,
            ),
        )
        row_spec = _S(
            (1, 1, prev_len),
            lambda ch, k=0: (_wloc(ch, k)[0] * K + k, 0, 0),
        )

        def _col_idx(ch, k=0):
            bbk, wch = _wloc(ch, k)
            return (bbk * K + k, jnp.clip(wch // q, 0, CT - 1), 0, 0)

        col_spec = _S((1, 1, SUB, 128), _col_idx)
        blk_spec = _S(
            (1, SUB, 128),
            lambda ch, k=0: (_wloc(ch, k)[0] * K + k, 0, 0),
        )
        gmat_spec = pl.BlockSpec((1, 2 + 2 * K), lambda ch: (0, 0),
                                 memory_space=pltpu.SMEM)
    else:
        planes_spec = _S((1, 8, SUB, 128),
                         lambda bb, ch, k=0: (bb * K + k, 0, 0, 0))
        xw_spec = _S(
            (1, W // 128, 128),
            lambda bb, ch, k=0: (
                jnp.clip(ch - k * offw, 0, NSpad // W - 1), 0, 0,
            ),
        )
        row_spec = _S((1, 1, prev_len), lambda bb, ch, k=0: (bb * K + k, 0, 0))
        col_spec = _S(
            (1, 1, SUB, 128),
            lambda bb, ch, k=0: (
                bb * K + k, jnp.clip((ch - k * offw) // q, 0, CT - 1), 0, 0,
            ),
        )
        blk_spec = _S((1, SUB, 128), lambda bb, ch, k=0: (bb * K + k, 0, 0))
        gmat_spec = pl.BlockSpec((1, 2 + 2 * K), lambda bb, ch: (0, 0),
                                 memory_space=pltpu.SMEM)

    in_specs = [gmat_spec]
    if packedx:
        # npk SHARED packed-stream refs: every chain extracts its byte
        # from block (ch mod SPB) — periodic in both grid modes.
        if use_wrap:
            pxw_spec = pl.BlockSpec(
                (1, W // 128, 128),
                lambda ch: (jnp.mod(ch, SPB), 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            pxw_spec = pl.BlockSpec(
                (1, W // 128, 128),
                lambda bb, ch: (jnp.mod(ch, SPB), 0, 0),
                memory_space=pltpu.VMEM,
            )
        in_specs += kmap(planes_spec) + [pxw_spec] * npk
    else:
        in_specs += kmap(planes_spec) + kmap(xw_spec)

    row_shape = jax.ShapeDtypeStruct((B, 1, prev_len), jnp.int32)
    col_shape = jax.ShapeDtypeStruct((B, CT, SUB, 128), jnp.int32)
    blk_shape = jax.ShapeDtypeStruct((B, SUB, 128), jnp.int32)
    out_specs = kmap(row_spec) + kmap(col_spec)
    out_shapes = [row_shape] * K + [col_shape] * K
    if affine:
        out_specs += kmap(row_spec) + kmap(col_spec)
        out_shapes += [row_shape] * K + [col_shape] * K
    if is_sw:
        nblk = 1 if nobc else 2
        out_specs += kmap(blk_spec) * nblk
        out_shapes += [blk_shape] * (K * nblk)

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
        scratch += [pltpu.VMEM((K, SUB, 128), jnp.int32)]  # bvs
        if not nobc:
            scratch += [pltpu.VMEM((K, SUB, 128), jnp.int32)]  # bcs
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
    )(gmat, *([planes] * K),
      *(pstreams if packedx else [xwin] * K))

    # Chain k wrote only rows bb*K + k of its own output array; interleave.
    def merge_rows(parts):
        return wrap_interleave(
            [p[:, 0] for p in parts], BB, K, (prev_len,)
        )

    def merge_cols(parts):
        return wrap_interleave(parts, BB, K, (CT, SUB, 128))

    def merge_blks(parts):
        return wrap_interleave(parts, BB, K, (SUB, 128))

    pos = 0
    out = {"hrow": merge_rows(outs[pos: pos + K])}
    pos += K
    out["hcol"] = merge_cols(outs[pos: pos + K])
    pos += K
    if affine:
        out["frow"] = merge_rows(outs[pos: pos + K])
        pos += K
        out["ecol"] = merge_cols(outs[pos: pos + K])
        pos += K
    if is_sw:
        out["bv"] = merge_blks(outs[pos: pos + K])
        pos += K
        if not nobc:
            out["bc"] = merge_blks(outs[pos: pos + K])
            pos += K
    return out


@functools.partial(
    jax.jit, static_argnames=("R", "W", "TW", "K", "interpret")
)
def pallas_mlsp_nw_lg_v2(subst, Y, X, gapo, *, R: int, W: int, TW: int,
                         K: int, interpret: bool = False):
    """NW linear-gap convenience wrapper (the flagship benchmark path).

    hrow: (B, prev_len)         row (b+1)*R of H (indexed by global j)
    hcol: (B, CT, SUB, 128)     hcol[b, jt] = H[b*R+1 .. (b+1)*R, jt*TW]
    """
    out = pallas_mlsp_v2(
        subst, Y, X, gapo, jnp.int32(0),
        jnp.int32(Y.shape[0]), jnp.int32(X.shape[0]),
        R=R, W=W, TW=TW, K=K, kind="nw", gap="linear", interpret=interpret,
    )
    return out["hrow"], out["hcol"]


@functools.partial(
    jax.jit,
    static_argnames=("R", "W", "TW", "K", "kind", "gap", "interpret"),
)
def pallas_dense_v2(subst, Y, X, gapo, gape, *, R: int, W: int, TW: int,
                    K: int, kind: str = "nw", gap: str = "linear",
                    interpret: bool = False):
    """Dense fill, any spec: the v2 multi-chain kernel writing its
    per-step wavefront history, unskewed in XLA to the full (adjrows_p,
    adjcols_p) H matrix with the spec's header row/column prepended
    (ref surface: src/nwalign_gpu3_ml_diagdiag.cu:210-247 — there the
    dense score matrix is the tile wavefront's direct output; here the
    skewed history stream plays the global-memory score role).

    Unlike v1 (pallas_wavefront.py) there is no O(n^2) pre-skewed
    substitution input — the lookup is in-kernel — so the only O(n^2)
    traffic is the output itself.
    """
    rows_p = Y.shape[0] - 1
    cols_p = X.shape[0] - 1
    SUB = R // 128
    B = rows_p // R
    BB = B // K
    affine = gap == "affine"
    is_sw = kind == "sw"
    OFF = W * _cdiv(R + 256, W)
    NS = R + cols_p - 1
    NSpad = _cdiv(NS + 128, W) * W
    CH = (NSpad + (K - 1) * OFF) // W
    prev_len = NSpad + 128
    CT = _cdiv(CH, TW // W)
    offw = OFF // W

    planes = _pack_planes(subst, Y, B, R)
    xpad = jnp.zeros(NSpad + 1, jnp.int32)
    xpad = xpad.at[: cols_p].set(X[1:])
    xwin = xpad[:NSpad].reshape(NSpad // W, W // 128, 128)

    kernel, q, _ = _make_kernel(
        K=K, SUB=SUB, W=W, CH=CH, cols_p=cols_p, R=R, TW=TW, OFF=OFF,
        prev_len=prev_len, B=B, kind=kind, gap=gap, dense=True,
        masked=interpret,
    )
    gmat = jnp.stack(
        [jnp.int32(gapo), jnp.int32(gape)]
        + [jnp.int32(rows_p + 1)] * K
        + [jnp.int32(cols_p + 1)] * K
    ).reshape(1, 2 + 2 * K)

    def kspecs(shape, index):
        return [
            pl.BlockSpec(shape, functools.partial(index, k=k),
                         memory_space=pltpu.VMEM)
            for k in range(K)
        ]

    in_specs = [pl.BlockSpec((1, 2 + 2 * K), lambda bb, ch: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs += kspecs(
        (1, 8, SUB, 128), lambda bb, ch, k=0: (bb * K + k, 0, 0, 0)
    )
    in_specs += kspecs(
        (1, W // 128, 128),
        lambda bb, ch, k=0: (jnp.clip(ch - k * offw, 0, NSpad // W - 1),
                             0, 0),
    )

    row_specs = kspecs((1, 1, prev_len),
                       lambda bb, ch, k=0: (bb * K + k, 0, 0))
    col_specs = kspecs(
        (1, 1, SUB, 128),
        lambda bb, ch, k=0: (
            bb * K + k, jnp.clip((ch - k * offw) // q, 0, CT - 1), 0, 0,
        ),
    )
    blk_specs = kspecs((1, SUB, 128), lambda bb, ch, k=0: (bb * K + k, 0, 0))
    hist_specs = kspecs(
        (1, W, SUB, 128),
        lambda bb, ch, k=0: (
            bb * K + k, jnp.clip(ch - k * offw, 0, NSpad // W - 1), 0, 0,
        ),
    )

    row_shape = jax.ShapeDtypeStruct((B, 1, prev_len), jnp.int32)
    col_shape = jax.ShapeDtypeStruct((B, CT, SUB, 128), jnp.int32)
    blk_shape = jax.ShapeDtypeStruct((B, SUB, 128), jnp.int32)
    hist_shape = jax.ShapeDtypeStruct((B, NSpad, SUB, 128), jnp.int32)

    out_specs = row_specs + col_specs
    out_shapes = [row_shape] * K + [col_shape] * K
    if affine:
        out_specs += row_specs + col_specs
        out_shapes += [row_shape] * K + [col_shape] * K
    if is_sw:
        out_specs += blk_specs + blk_specs
        out_shapes += [blk_shape] * K + [blk_shape] * K
    out_specs += hist_specs
    out_shapes += [hist_shape] * K

    scratch = [pltpu.VMEM((1, prev_len), jnp.int32) for _ in range(K)]
    if affine:
        scratch += [pltpu.VMEM((1, prev_len), jnp.int32) for _ in range(K)]
    scratch += [
        pltpu.VMEM((K, SUB, 128), jnp.int32),
        pltpu.VMEM((K, SUB, 128), jnp.int32),
        pltpu.VMEM((K, SUB, 128), jnp.int32),
        pltpu.VMEM((K, SUB, 128), jnp.int32),
        pltpu.VMEM((K, 1, 128), jnp.int32),
    ]
    if affine:
        scratch += [
            pltpu.VMEM((K, SUB, 128), jnp.int32),
            pltpu.VMEM((K, SUB, 128), jnp.int32),
            pltpu.VMEM((K, SUB, 128), jnp.int32),
            pltpu.VMEM((K, 1, 128), jnp.int32),
        ]
    if is_sw:
        scratch += [
            pltpu.VMEM((K, SUB, 128), jnp.int32),
            pltpu.VMEM((K, SUB, 128), jnp.int32),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(BB, CH),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
    )(gmat, *([planes] * K), *([xwin] * K))

    # Chain k wrote rows bb*K + k of its own vhist array; interleave.
    hists = outs[-K:]
    vhist = jnp.stack(
        [hists[k].reshape(BB, K, NSpad, SUB, 128)[:, k] for k in range(K)],
        axis=1,
    ).reshape(B, NSpad, R)

    from .skew import unskew_cols

    Hb = jax.vmap(lambda v: unskew_cols(jnp, v, cols_p))(vhist)
    H = Hb.reshape(rows_p, cols_p)
    jr = jnp.arange(1 + cols_p, dtype=jnp.int32)
    ir = jnp.arange(1, 1 + rows_p, dtype=jnp.int32)
    if is_sw:
        top = jnp.zeros((1, 1 + cols_p), jnp.int32)
        left = jnp.zeros((rows_p, 1), jnp.int32)
    elif affine:
        top = jnp.where(jr == 0, 0, gapo + jr * gape)[None, :]
        left = (gapo + ir * gape)[:, None]
    else:
        top = (jr * gapo)[None, :]
        left = (ir * gapo)[:, None]
    return jnp.concatenate(
        [top, jnp.concatenate([left, H], axis=1)], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=("R", "W", "TW", "kind", "gap", "interpret"),
)
def pallas_mlsp_batch_v2(subst, Ys, Xs, gapo, gape, adjrs, adjcs, *,
                         R: int, W: int, TW: int, kind: str = "nw",
                         gap: str = "linear", interpret: bool = False):
    """Batched sparse fill: K pairs run as K interleaved chains.

    Unlike the single-pair echelon, the chains are independent pairs with
    the SAME padded shape (one bucket), so there is no offset and no
    cross-chain coupling: chain k's predecessor-row buffer is its own
    (block b of pair k reads pair k's block b-1), every chain starts from
    the header row, and the fill has zero pipeline bubbles.

    Ys: (K, 1+rows_p), Xs: (K, 1+cols_p) with header elements;
    adjrs/adjcs: (K,) true dims (traced). Returns a dict of per-pair
    arrays: hrow (K, B, prev_len), hcol (K, B, CT, SUB, 128), cost
    (K, B, SUB, 128) per-BLOCK [flatten the (B, SUB, 128) axes and take
    max to get H[adjr-1, adjc-1], as parallel/batch.py does], plus
    frow/ecol (affine) and bv/bc (SW) like pallas_mlsp_v2 but per-block.
    """
    K = Ys.shape[0]
    rows_p = Ys.shape[1] - 1
    cols_p = Xs.shape[1] - 1
    SUB = R // 128
    B = rows_p // R
    affine = gap == "affine"
    is_sw = kind == "sw"
    OFF = 0
    NS = R + cols_p - 1
    NSpad = _cdiv(NS + 128, W) * W
    CH = NSpad // W
    prev_len = NSpad + 128
    CT = _cdiv(CH, TW // W)

    planes = jax.vmap(lambda y: _pack_planes(subst, y, B, R))(Ys)
    planes = planes.reshape(K * B, 8, SUB, 128)
    xpad = jnp.zeros((K, NSpad + 1), jnp.int32)
    xpad = xpad.at[:, :cols_p].set(Xs[:, 1:])
    xwin = xpad[:, :NSpad].reshape(K * (NSpad // W), W // 128, 128)

    kernel, q, _ = _make_kernel(
        K=K, SUB=SUB, W=W, CH=CH, cols_p=cols_p, R=R, TW=TW, OFF=OFF,
        prev_len=prev_len, B=B, kind=kind, gap=gap, batch=True,
        capture_cost=True, masked=interpret,
    )
    gmat = jnp.concatenate([
        jnp.stack([jnp.int32(gapo), jnp.int32(gape)]),
        jnp.asarray(adjrs, jnp.int32),
        jnp.asarray(adjcs, jnp.int32),
    ]).reshape(1, 2 + 2 * K)

    def kspecs(shape, index):
        return [
            pl.BlockSpec(shape, functools.partial(index, k=k),
                         memory_space=pltpu.VMEM)
            for k in range(K)
        ]

    in_specs = [pl.BlockSpec((1, 2 + 2 * K), lambda bb, ch: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs += kspecs(
        (1, 8, SUB, 128), lambda bb, ch, k=0: (k * B + bb, 0, 0, 0)
    )
    in_specs += kspecs(
        (1, W // 128, 128), lambda bb, ch, k=0: (k * CH + ch, 0, 0)
    )

    row_shape = jax.ShapeDtypeStruct((B, 1, prev_len), jnp.int32)
    col_shape = jax.ShapeDtypeStruct((B, CT, SUB, 128), jnp.int32)
    # bv/bc/cost are per-BLOCK outputs (the per-chain scratch re-inits at
    # every bb pass, and a lane means a different global row per block).
    blk_shape = jax.ShapeDtypeStruct((B, SUB, 128), jnp.int32)
    row_specs = kspecs((1, 1, prev_len), lambda bb, ch, k=0: (bb, 0, 0))
    col_specs = kspecs(
        (1, 1, SUB, 128),
        lambda bb, ch, k=0: (bb, jnp.clip(ch // q, 0, CT - 1), 0, 0),
    )
    blk_specs = kspecs((1, SUB, 128), lambda bb, ch, k=0: (bb, 0, 0))

    out_specs = row_specs + col_specs
    out_shapes = [row_shape] * K + [col_shape] * K
    if affine:
        out_specs += row_specs + col_specs
        out_shapes += [row_shape] * K + [col_shape] * K
    if is_sw:
        out_specs += blk_specs + blk_specs
        out_shapes += [blk_shape] * K + [blk_shape] * K
    out_specs += blk_specs  # cost
    out_shapes += [blk_shape] * K

    scratch = [pltpu.VMEM((1, prev_len), jnp.int32) for _ in range(K)]
    if affine:
        scratch += [pltpu.VMEM((1, prev_len), jnp.int32) for _ in range(K)]
    scratch += [
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # v1s
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # shps
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # xds
        pltpu.VMEM((K, SUB, 128), jnp.int32),  # accs
        pltpu.VMEM((K, 1, 128), jnp.int32),    # prows
    ]
    if affine:
        scratch += [
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # e1s
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # f1s
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # accEs
            pltpu.VMEM((K, 1, 128), jnp.int32),    # prowFs
        ]
    if is_sw:
        scratch += [
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # bvs
            pltpu.VMEM((K, SUB, 128), jnp.int32),  # bcs
        ]
    scratch += [pltpu.VMEM((K, SUB, 128), jnp.int32)]  # costs

    outs = pl.pallas_call(
        kernel,
        grid=(B, CH),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
    )(gmat, *([planes] * K), *([xwin] * K))

    pos = 0
    out = {"hrow": jnp.stack([outs[pos + k][:, 0] for k in range(K)])}
    pos += K
    out["hcol"] = jnp.stack(outs[pos: pos + K])
    pos += K
    if affine:
        out["frow"] = jnp.stack([outs[pos + k][:, 0] for k in range(K)])
        pos += K
        out["ecol"] = jnp.stack(outs[pos: pos + K])
        pos += K
    if is_sw:
        out["bv"] = jnp.stack(outs[pos: pos + K])
        pos += K
        out["bc"] = jnp.stack(outs[pos: pos + K])
        pos += K
    out["cost"] = jnp.stack(outs[pos: pos + K])
    return out


def v2_params_ok(tile_h: int, tile_w: int, rows: int, cols: int) -> bool:
    W = min(512, tile_w)
    return (
        tile_h % 128 == 0
        and tile_w % 128 == 0
        and tile_w >= tile_h
        and tile_w % W == 0
    )


def v2_vmem_bytes(*, K: int, SUB: int, prev_len: int, W: int,
                  affine: bool, is_sw: bool,
                  capture_cost: bool = False,
                  packedx: bool = False, packedef: bool = False,
                  nobc: bool = False, subprow: bool = False) -> int:
    """Analytic VMEM peak of one v2/banded pallas_call — the TPU analog of
    the reference's occupancy-based shared-memory accounting
    (ref: src/nwalign_shared.cpp:5-25). Sums the static scratch_shapes
    plus the in/out VMEM blocks (x2 for Pallas's grid double-buffering).
    """
    i32 = 4
    blk = SUB * 128 * i32
    nxd = _cdiv(K, 4) if packedx else K  # xds scratch / xwin ref count
    scratch = K * prev_len * i32                     # prevb
    scratch += 3 * K * blk + nxd * blk + K * 128 * i32  # v1/shp/acc/xd+prow
    if affine:
        nef = 2 * (_cdiv(K, 4) if packedef else K)   # e1s/f1s or de/df words
        scratch += K * prev_len * i32                # prevf
        scratch += (nef + K) * blk + K * 128 * i32   # +accEs+prowFs
    if is_sw:
        scratch += (1 if nobc else 2) * K * blk      # bvs (+bcs)
    if capture_cost:
        scratch += K * blk
    if subprow:
        scratch += (2 if affine else 1) * K * 128 * 128 * i32  # sprow(F)
    ins = K * 8 * blk + nxd * W * i32                # planes + xwin blocks
    outs = K * (prev_len * i32 + blk)                # hrow + hcol blocks
    if affine:
        outs *= 2                                    # + frow + ecol
    if is_sw:
        outs += (1 if nobc else 2) * K * blk         # bv (+bc)
    if capture_cost:
        outs += K * blk
    return scratch + 2 * (ins + outs)


def v2_regmem_bytes(*, K: int, SUB: int, affine: bool, is_sw: bool,
                    capture_cost: bool = False,
                    packedx: bool = False, packedef: bool = False,
                    nobc: bool = False, subprow: bool = False) -> int:
    """Per-chain carry state held in vector registers across the hot loop
    (the regmem analog of the reference's cudaFuncAttributes register
    accounting): NCAR (SUB, 128) int32 vectors per chain, plus the
    ceil(K/4) shared byte-packed letter carries under packedx and the
    2*ceil(K/4) shared E/F delta words under packedef."""
    spr = 1 if subprow else 0
    ncar = ((4 if packedx else 5) - spr
            + (((2 if packedef else 4) - spr) if affine else 0)
            + ((1 if nobc else 2) if is_sw else 0)
            + (1 if capture_cost else 0))
    shared = (_cdiv(K, 4) if packedx else 0) \
        + (2 * _cdiv(K, 4) if packedef else 0)
    return (ncar * K + shared) * SUB * 128 * 4


def _is_compile_resource_error(e: Exception) -> bool:
    """True for Mosaic/XLA compile-time resource exhaustion (register/VMEM
    spill) — the only failure mode the K-backoff retry should absorb.

    Deliberately narrow: bare "mosaic"/"exceeds"/"vmem" markers would
    match essentially every Mosaic failure (e.g. a legalization bug that
    only manifests at K > 1) and silently degrade it to K=1. A memory
    word alone is not enough either — it must co-occur with an
    exhaustion word (observed spill messages: "RESOURCE_EXHAUSTED: ...
    scoped vmem", "exceeds available vmem", "register allocation
    failed")."""
    msg = f"{type(e).__name__}: {e}".lower()
    if any(m in msg for m in (
            "resource_exhausted", "resource exhausted", "out of memory",
            "register allocation", "spill")):
        return True
    has_mem = any(m in msg for m in ("vmem", "smem", "scratch"))
    has_exhaust = any(m in msg for m in ("exceed", "alloc", "limit", "oom"))
    return has_mem and has_exhaust


K_MAX_DEFAULT = {
    # Fallback only — the live defaults come from the autotuner cache
    # (tuned_defaults below). Measured on v5e at 23728^2, R=TW=2048,
    # post mask-drop + wrap echelon (2026-08-17). Above these the
    # per-chain carry state spills registers and Mosaic fails to compile
    # (scoped vmem stack OOM) or collapses (K=7 nw_lg: ~13 GCUPS).
    ("nw", "linear"): 6,   # 67.8 GCUPS
    ("sw", "linear"): 4,   # 56.9 GCUPS (K=5/6 compile but run slower)
    ("nw", "affine"): 4,   # 45.5 GCUPS (K=5 fails compile)
    ("sw", "affine"): 4,   # 45.2 GCUPS (K=5 fails compile)
}

_TUNED_CACHE: "dict | None" = None


def tuned_cache_path() -> str:
    """Path of this device kind's tuned-parameter cache file."""
    import os

    import jax

    dk = jax.devices()[0].device_kind.lower().replace(" ", "_")
    return os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "..", "resrc", "tuned",
        f"{dk}.json",
    ))


def tuned_cache() -> dict:
    """The raw per-device-kind tuned cache (autotune output + hardware
    validation flags), loaded once per process. {} when absent."""
    global _TUNED_CACHE
    if _TUNED_CACHE is None:
        _TUNED_CACHE = {}
        try:
            import json
            import os

            path = tuned_cache_path()
            if os.path.exists(path):
                with open(path, "r", encoding="utf-8") as f:
                    _TUNED_CACHE = json.load(f)
        except Exception:
            _TUNED_CACHE = {}
    return _TUNED_CACHE


def tuned_flag(key: str, default: bool = False) -> bool:
    """A hardware-validation flag from the tuned cache's ``_flags`` map.

    Flags record facts established by on-chip differential drives (e.g.
    ``wrap_tpu_validated``) so they survive process restarts, unlike a
    source-code constant.
    """
    flags = tuned_cache().get("_flags", {})
    return bool(flags.get(key, default))


def set_tuned_flag(key: str, value: bool) -> str:
    """Persist a hardware-validation flag into the tuned cache file and
    refresh the in-process copy. Returns the cache path written."""
    import json
    import os

    global _TUNED_CACHE
    path = tuned_cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = {}
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            data = json.load(f)
    data.setdefault("_flags", {})[key] = bool(value)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2, sort_keys=True)
        f.write("\n")
    _TUNED_CACHE = data
    return path


def tuned_defaults(kind: str, gap: str, allow_packedx: bool = False) -> dict:
    """Tuned kernel parameters for this device kind and spec.

    Read from the autotuner-written cache
    ``resrc/tuned/<device_kind>.json`` (write/update it with
    ``python -m gpuseqalign_tpu.bench.autotune --save-defaults``); falls
    back to the K_MAX_DEFAULT literals when no cache entry exists. Keys:
    tileBy, tileBx, kChains, packedx, _gcups.

    ``allow_packedx``: the tuned kChains may only be reachable WITH the
    shared byte-packed xd streams (packedx frees ~2 vregs/chain-group, so
    its K_max is higher). Callers that cannot run packedx (the batched /
    banded / dense kernel forms) must leave it False — they then get the
    per-chain-xd K_MAX_DEFAULT literal instead of a kChains that would
    spill registers in their form.
    """
    name = f"{kind}_{'ag' if gap == 'affine' else 'lg'}"
    ent = dict(tuned_cache().get(name, {}))
    ent.setdefault("kChains", K_MAX_DEFAULT[(kind, gap)])
    ent.setdefault("packedx", 0)
    ent.setdefault("packedef", 0)
    ent.setdefault("rematHdr", 0)
    ent.setdefault("noBc", 0)
    ent.setdefault("subProw", 0)
    if not allow_packedx and (ent["packedx"] or ent["packedef"]
                              or ent["rematHdr"] or ent["noBc"]
                              or ent["subProw"]):
        # Strip the top-level flags for allow_packedx=False consumers:
        # the batched/dense kernel forms cannot run them at all, and the
        # banded/giant form takes its flags (and geometry) from its own
        # hardware-validated ``banded`` sub-entry via _kernel_flags /
        # _tile_params — never from these top-level keys.
        ent["kChains"] = min(
            int(ent["kChains"]), K_MAX_DEFAULT[(kind, gap)]
        )
        ent["packedx"] = ent["packedef"] = ent["rematHdr"] = 0
        ent["noBc"] = ent["subProw"] = 0
    return ent


def choose_k(trows: int, k_max: int = 6) -> int:
    """Number of interleaved chains (bounded by the row-block count)."""
    for k in (k_max, 4, 3, 2, 1):
        if k <= trows and k <= k_max:
            return k
    return 1


def align_dense_v2(pr: AlgParams, nw: AlgInput, res: AlgResult,
                   interpret: bool = False) -> Status:
    """Host wrapper for the dense v2 kernel (gpu3-gpu6 alias surface):
    any spec, full H matrix + plain trace/hash downstream."""
    from .xla_kernels import _finish_dense_from_device

    spec = nw.spec
    affine = spec.gap.value == "affine"
    is_sw = spec.kind.value == "sw"

    sw = res.sw_align
    sw.start()
    rows = nw.adjrows - 1
    cols = nw.adjcols - 1
    tile_by = int(pr.get("tileBy", 0) or 0)
    if tile_by and tile_by % 128 == 0:
        R = tile_by
    else:
        # Power-of-two row blocks so mixed-size sweeps share at most 4
        # compiled kernels (128/256/512/1024) instead of one per shape.
        R = 128
        while R < min(rows, 1024):
            R *= 2
    TW = R
    W = min(512, TW)
    B = _cdiv(max(rows, 1), R)
    k_max = int(
        pr.get("kChains", 0)
        or tuned_defaults(spec.kind.value, spec.gap.value)["kChains"]
    )
    K = choose_k(B, k_max)
    B_p = _cdiv(B, K) * K
    rows_p = B_p * R
    # Columns bucket to powers of two (floor 128) for the same
    # compile-sharing reason; at most 2x padded cells.
    cols_p = 128
    while cols_p < cols:
        cols_p *= 2
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

    while True:
        try:
            H_dev = pallas_dense_v2(
                subst_d, y_d, x_d,
                jnp.int32(nw.gapo_cost), jnp.int32(nw.gape_cost),
                R=R, W=W, TW=TW, K=K,
                kind=spec.kind.value, gap=spec.gap.value,
                interpret=interpret,
            )
            jax.block_until_ready(H_dev)
            break
        except Exception as e:
            if K == 1 or not _is_compile_resource_error(e):
                raise
            import warnings

            warnings.warn(
                f"pallas_dense_v2 K={K} failed to compile "
                f"({type(e).__name__}); retrying with fewer chains",
                RuntimeWarning,
            )
            K = choose_k(B, K - 1)
            B_p = _cdiv(B, K) * K
            rows_p = B_p * R
            y2 = np.zeros(1 + rows_p, np.int32)
            y2[: nw.adjrows] = nw.seqY
            y_d = jax.device_put(y2)
            jax.block_until_ready(y_d)
    sw.lap("align.calc")

    SUBv = R // 128
    NSpadv = _cdiv(R + cols_p - 1 + 128, W) * W
    res.shmem_peak_allocs = max(res.shmem_peak_allocs, v2_vmem_bytes(
        K=K, SUB=SUBv, prev_len=NSpadv + 128, W=W,
        affine=affine, is_sw=is_sw,
    ) + 2 * K * W * SUBv * 128 * 4)  # + double-buffered vhist out blocks
    res.regmem_peak_allocs = max(res.regmem_peak_allocs, v2_regmem_bytes(
        K=K, SUB=SUBv, affine=affine, is_sw=is_sw,
    ))
    return _finish_dense_from_device(nw, res, H_dev)


def align_mlsp_v2(pr: AlgParams, nw: AlgInput, res: AlgResult,
                  tile_h: int, tile_w: int, trows: int, tcols: int,
                  interpret: bool = False) -> Status:
    """Host wrapper: general-spec v2 fill massaged into the reference
    sparse layout (plus the affine F/E headers and SW argmax)."""
    from .pallas_kernels import _mlsp_store
    from ..core.types import AlignKind, GapKind

    spec = nw.spec
    affine = spec.gap == GapKind.AFFINE
    is_sw = spec.kind == AlignKind.SW

    sw = res.sw_align
    sw.start()
    rows = nw.adjrows - 1
    cols = nw.adjcols - 1
    R = tile_h
    TW = tile_w
    tuned = tuned_defaults(spec.kind.value, spec.gap.value,
                           allow_packedx=True)
    W = int(pr.get("winW", 0) or tuned.get("winW", 0) or min(512, TW))
    if TW % W or W % 128:
        W = min(512, TW)
    k_max = int(pr.get("kChains", 0) or tuned["kChains"])
    px = pr.get("packedx", None)
    packedx = bool(tuned.get("packedx", 0)) if px is None else bool(px)
    pe = pr.get("packedef", None)
    packedef = bool(tuned.get("packedef", 0)) if pe is None else bool(pe)
    # packedef needs byte-ranged E/F deltas: 0 <= -gapo <= 255.
    packedef = packedef and affine and -255 <= nw.gapo_cost <= 0
    rm = pr.get("rematHdr", None)
    remath = bool(tuned.get("rematHdr", 0)) if rm is None else bool(rm)
    nb = pr.get("noBc", None)
    nobc = (bool(tuned.get("noBc", 0)) if nb is None else bool(nb)) and is_sw
    sp = pr.get("subProw", None)
    subprow = bool(tuned.get("subProw", 0)) if sp is None else bool(sp)
    K = choose_k(trows, k_max)
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

    while True:
        try:
            out_d = pallas_mlsp_v2(
                subst_d, y_d, x_d,
                jnp.int32(nw.gapo_cost), jnp.int32(nw.gape_cost),
                nw.adjrows, nw.adjcols,
                R=R, W=W, TW=TW, K=K,
                kind=spec.kind.value, gap=spec.gap.value,
                interpret=interpret, packedx=packedx,
                packedef=packedef, remath=remath, nobc=nobc,
                subprow=subprow,
            )
            jax.block_until_ready(out_d)
            break
        except Exception as e:
            # Chain-state register spills can fail compilation for large
            # K x SUB combinations; back off and retry — but ONLY for
            # compile-time resource exhaustion. Genuine kernel/logic
            # errors must surface, not silently degrade to K=1.
            if K == 1 or not _is_compile_resource_error(e):
                raise
            import warnings

            warnings.warn(
                f"pallas_mlsp_v2 K={K} failed to compile "
                f"({type(e).__name__}); retrying with fewer chains",
                RuntimeWarning,
            )
            K = choose_k(trows, K - 1)
            trows_p = _cdiv(trows, K) * K
            rows_p = trows_p * R
            y2 = np.zeros(1 + rows_p, np.int32)
            y2[: nw.adjrows] = nw.seqY
            y_d = jax.device_put(y2)
            jax.block_until_ready(y_d)
    sw.lap("align.calc")

    out = {kk: np.asarray(jax.device_get(v)) for kk, v in out_d.items()}
    sw.lap("align.cpy_host")
    nw.note_device_alloc(sum(int(v.nbytes) for v in out.values()))

    # Analytic on-chip memory peaks (ref analog: src/nwalign_shared.cpp).
    SUBv = R // 128
    NSpadv = _cdiv(R + cols_p - 1 + 128, W) * W
    res.shmem_peak_allocs = max(res.shmem_peak_allocs, v2_vmem_bytes(
        K=K, SUB=SUBv, prev_len=NSpadv + 128, W=W,
        affine=affine, is_sw=is_sw, packedx=packedx, packedef=packedef,
        nobc=nobc, subprow=subprow,
    ))
    res.regmem_peak_allocs = max(res.regmem_peak_allocs, v2_regmem_bytes(
        K=K, SUB=SUBv, affine=affine, is_sw=is_sw, packedx=packedx,
        packedef=packedef, nobc=nobc, subprow=subprow,
    ))

    ninf = np.int32(NEG_INF_I32)
    g = nw.gapo_cost
    ge = nw.gape_cost
    width = cols_p + 1

    jw = np.arange(width, dtype=np.int64)
    if is_sw:
        hdr0 = np.zeros(width, np.int32)
        col0 = lambda i: np.zeros_like(i, dtype=np.int32)
    elif affine:
        hdr0 = (g + jw * ge).astype(np.int32)
        hdr0[0] = 0
        col0 = lambda i: (g + i * ge).astype(np.int32)
    else:
        hdr0 = (jw * g).astype(np.int32)
        col0 = lambda i: (i * g).astype(np.int32)
    # hrow[b, j] = H[(b+1)R, j] with j == 0 the seeded header element; the
    # layout below wants row it*R including the header column element.
    hrows = np.empty((trows, width), np.int32)
    hrows[0] = hdr0
    if trows > 1:
        hrows[1:] = out["hrow"][: trows - 1, :width]

    def cols_from(hcol, first_col):
        m = np.empty((trows, R, tcols), np.int32)
        m[:, :, 0] = first_col
        if tcols > 1:
            hc = hcol.reshape(trows_p, -1, R)
            m[:, :, 1:] = np.transpose(hc[:trows, 1:tcols, :], (0, 2, 1))
        return m

    ii = np.arange(1, trows * R + 1, dtype=np.int64).reshape(trows, R)
    if is_sw:
        col0_h = np.zeros((trows, R), np.int32)
    elif affine:
        col0_h = (g + ii * ge).astype(np.int32)
    else:
        col0_h = (ii * g).astype(np.int32)
    hcols = cols_from(out["hcol"], col0_h)

    frows = ecols = None
    if affine:
        frows = np.empty((trows, width), np.int32)
        frows[0] = ninf
        if trows > 1:
            frows[1:] = out["frow"][: trows - 1, :width]
            frows[1:, 0] = ninf
        ecols = cols_from(out["ecol"], np.full((trows, R), ninf, np.int32))

    best = None
    if is_sw:
        bv = out["bv"].reshape(trows_p, R)[:trows]
        flat_v = bv.ravel()
        if flat_v.max(initial=0) <= 0:
            best = np.array([0, 0, 0], np.int32)
        elif nobc:
            # Value-only capture: bv gives (v*, i*) directly (one lane
            # per DP row, so the first flat max IS the smallest row);
            # the column is recovered from the stored sparse headers
            # after _mlsp_store below.
            b0 = int(np.argmax(flat_v))
            best = np.array([flat_v[b0], 1 + b0, 0], np.int32)
        else:
            bc = out["bc"].reshape(trows_p, R)[:trows]
            iv = 1 + np.arange(trows * R).reshape(trows, R)
            # lane index within block is i2d = 0..R-1
            i2d = np.arange(R).reshape(1, R)
            jv = bc - i2d + 1
            order = np.lexsort((jv.ravel(), iv.ravel(), -flat_v))
            b0 = order[0]
            best = np.array(
                [flat_v[b0], iv.ravel()[b0], jv.ravel()[b0]], np.int32
            )

    stat = _mlsp_store(
        nw, res, hrows, hcols, tile_h, tile_w, trows, tcols,
        frows=frows, ecols=ecols, best=best,
    )
    if (stat == Status.success and is_sw and nobc
            and res.align_cost > 0):
        _recover_best_j(nw, res)
    return stat


def _recover_best_j(nw, res) -> None:
    """nobc column recovery: j* = the first column of row i* whose H
    equals align_cost, recomputed left-to-right from the stored sparse
    headers — exactly the oracle's row-major first-occurrence tie-break
    (bv already fixed the smallest such row i*)."""
    from ..trace.sparse import align_tile_full, get_tile_and_elem_ij

    i_star = nw.best_i
    want = res.align_cost
    tile_w = nw.tile_hrow_len - 1
    for jt in range(nw.tile_hdr_mat_cols):
        j0 = jt * tile_w + 1
        if j0 > nw.adjcols - 1:
            break
        co = get_tile_and_elem_ij(nw, i_star, j0)
        rowv = align_tile_full(nw, co)["H"][co.i_elem]
        for jj in np.nonzero(rowv[1:] == want)[0]:
            gj = j0 + int(jj)
            if gj <= nw.adjcols - 1:
                nw.best_j = gj
                return
    # Unreachable for a consistent fill: align_cost was captured from a
    # live cell of row i*. Leave best_j = 0 so the traceback surfaces
    # the inconsistency instead of masking it.
