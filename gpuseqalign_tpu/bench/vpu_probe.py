"""VPU microbenchmark probes: the measured basis of ROOFLINE.md.

Three probe families, all Pallas TPU kernels timed with the tunnel-safe
in-jit loop recipe (bench.py / CLAUDE.md: per-dispatch overhead through a
remote tunnel is ~26 ms and block_until_ready can return early, so every
probe loops the body M times inside one jitted fori_loop with a
data-dependent carry and reports (T(M2) - T(M1)) / (M2 - M1)):

  ops       per-primitive issue costs: int32 add/max/select/shift, lane
            roll (axis 1), sublane roll (axis 0), the two-roll carry
            (ops/pallas_wavefront2.py shift2)
  skeleton  the irreducible NW linear-gap wavefront step — carry shift2 +
            fill roll + (diag+s, max(up,left)+g) — at K = 1..8 interleaved
            chains. Its saturated GCUPS is the ROOFLINE the full kernel is
            judged against (the full kernel adds the substitution lookup,
            masks and header captures on top of this dataflow).
  skeleton_affine  same with the Gotoh E/F recurrences (second shift2 +
            fill roll + 5 more ALU ops) at K = 1..6.

Usage: python -m gpuseqalign_tpu.bench.vpu_probe [ops|skeleton|skeleton_affine|all]
Prints one JSON object per probe. Requires a real TPU (the numbers mean
nothing in interpret mode); on other backends it refuses.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 16  # (SUB, 128) carries == R = 2048, the flagship tile height


def _time_pair(make_run, a, m1: int, m2: int) -> float:
    """Seconds per iteration via the two-point in-jit loop recipe."""
    runs = {m: make_run(m) for m in (m1, m2)}

    def t_of(m):
        _ = np.asarray(jax.device_get(runs[m](a)))  # warm + force
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            _ = np.asarray(jax.device_get(runs[m](a)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t_of(m2) - t_of(m1)) / (m2 - m1)


def _chain_kernel(body_one, nch: int, iters: int, state: int, shape):
    """Build a pallas_call running `iters` iterations of `nch` chains."""

    def kernel(a_ref, o_ref):
        a = a_ref[...]

        def body(i, carry):
            out = []
            for k in range(nch):
                out += body_one(a, carry[state * k: state * (k + 1)])
            return tuple(out)

        carry = tuple(a + jnp.int32(k) for k in range(state * nch))
        vs = jax.lax.fori_loop(0, iters, body, carry)
        s = vs[0]
        for v in vs[1:]:
            s = jnp.maximum(s, v)
        o_ref[0:1, :] = s[0:1, :]

    @jax.jit
    def run(a):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        )(a)

    return run


def probe_ops() -> dict:
    """Isolated per-primitive costs (ns/op on a (SUB,128) operand).

    Caveat: these are ISSUE-ISOLATED costs — in large unrolled kernel
    bodies Mosaic software-pipelines rolls under ALU work, so the
    skeleton probes (which measure the scheduled mix) are the numbers the
    roofline uses; this table explains which primitive dominates.
    """
    a8 = jnp.ones((SUB, 128), jnp.int32)
    out = {}

    def mk(body_one, state):
        return lambda m: _chain_kernel(body_one, 12, m, state, (SUB, 128))

    cases = {
        "maxadd2": (lambda a, st: [jnp.maximum(st[0] + a, a + 7)], 1, 2),
        "select": (lambda a, st: [jnp.where(a > 0, st[0], a)], 1, 1),
        "shift_add2": (lambda a, st: [(st[0] >> 2) + a], 1, 2),
        "roll_lane": (lambda a, st: [pltpu.roll(st[0], 1, axis=1)], 1, 1),
        "roll_sublane": (lambda a, st: [pltpu.roll(st[0], 1, axis=0)], 1, 1),
    }
    for name, (body_one, state, n_ops) in cases.items():
        dt = _time_pair(mk(body_one, state), a8, 100_000, 600_000)
        out[name] = {
            "ns_per_op": round(dt * 1e9 / (12 * n_ops), 3),
        }
    return out


def _shift2(v, f, l_iota, i2d):
    b = pltpu.roll(v, 1, axis=1)
    c = pltpu.roll(b, 1, axis=0)
    out = jnp.where(l_iota == 0, c, b)
    return jnp.where(i2d == 0, f, out)


def probe_skeleton(affine: bool, sub: int = SUB, ks=None) -> dict:
    """Irreducible wavefront step at K interleaved chains -> GCUPS.

    `sub` parametrizes the carry height (R = sub*128): the `subk` probe
    sweeps it to answer whether shrinking per-chain state (sub=8 halves
    every carry to one vreg) lets enough extra chains compile to beat the
    sub=16 K_max plateau — the K=7 register-spill cliff question
    (ROOFLINE.md remaining agenda #1)."""
    a8 = jnp.ones((sub, 128), jnp.int32)
    res = {}
    if ks is None:
        ks = (1, 2, 3, 4, 6) if affine else (1, 2, 4, 6, 8)
    for K in ks:
        def body_one(a, st, K=K):
            # Constants must be created in kernel scope (pallas rejects
            # captured traced constants).
            g = jnp.int32(-11)
            ge = jnp.int32(-2)
            l_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
            i2d = (
                jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0) * 128
                + l_iota
            )
            fill = a[0:1, :]
            if not affine:
                v1, sh1p = st
                fh = pltpu.roll(fill, 1, axis=1)
                sh1 = _shift2(v1, fh, l_iota, i2d)
                cell = jnp.maximum(
                    a + sh1p, jnp.maximum(sh1, v1) + g
                )
                return [cell, sh1]
            v1, sh1p, e1, f1 = st
            fh = pltpu.roll(fill, 1, axis=1)
            ff = pltpu.roll(fill, 2, axis=1)
            sh1 = _shift2(v1, fh, l_iota, i2d)
            e_new = jnp.maximum(e1, v1 + g) + ge
            shF = _shift2(f1, ff, l_iota, i2d)
            f_new = jnp.maximum(shF, sh1 + g) + ge
            cell = jnp.maximum(a + sh1p, jnp.maximum(e_new, f_new))
            return [cell, sh1, e_new, f_new]

        state = 4 if affine else 2
        dt = _time_pair(
            lambda m, K=K, b=body_one, s=state: _chain_kernel(b, K, m, s,
                                                              (sub, 128)),
            a8, 50_000, 300_000,
        )
        res[f"K{K}"] = {
            "ns_per_chain_step": round(dt * 1e9 / K, 3),
            "gcups": round(K * sub * 128 / dt / 1e9, 2),
        }
    return res


def probe_fullstep(K: int = 4, variants=None) -> dict:
    """The PRODUCTION nw_lg step (not the skeleton) with ablation toggles,
    128-step-unrolled like the real kernel. Each variant isolates one
    candidate optimization so kernel changes are measurement-driven:

      base      faithful production body: fillx roll + xd shift2 + 8-plane
                packed lookup + fill1 roll + sh1 shift2 + header selects +
                max-plus + bottom-row capture + hcol acc capture
      nolookup  drop the substitution lookup (s = const) — its total cost
      lookup6   6-plane select tree (substsz <= 24) + xd pre-scaled by 8
                (byte shift = xd & 24, plane index = xd >> 5)
      smemx     deliver the entering X letter from an SMEM scalar read
                instead of the per-step fillx lane roll
      noheader  drop the diag/left header injections (valid only for
                steps past the fill phase, c >= R — a region-split body)
      lean      smemx + lookup6 + noheader combined

    Carry-ablation variants (the K=7 register-spill question — which
    per-chain carry must shrink for one more chain to compile; run at
    K=7 where `base` is known to spill-collapse to ~11 GCUPS):

      noacc     drop the hcol accumulator carry (1 vector/chain; the real
                kernel would move the capture to a per-window VMEM
                read-modify-write instead)
      noprow    drop the bottom-row capture carry ((1,128)/chain; VMEM
                store per step is the real-kernel alternative)
      noxcarry  recompute the lookup operand from the stream instead of
                carrying the xd shift register (1 vector/chain; costs one
                extra vector add per step, drops 1 shift2)
      mincarry  all three — the smallest plausible production carry set
                (v1, sh1p only, like the skeleton)
      packedx   byte-pack the xd shift register ACROSS chains (letters are
                5-bit): ceil(K/4) packed carries get ONE shift2 + fill
                roll per step each, and every chain extracts its letter
                with a shift+and. Replaces K fillx rolls + K xd shift2s
                (2 lane rolls each) with 1-2, and frees 2(K-1)..2(K-2)
                vregs — attacks both the permute-port bound and the K=7
                spill cliff at once. The production recipe needs one
                host-side packed stream xp[j] = sum_k X[(j - k*OFF) mod
                NSpad] << 8(k%4) per K-group, same layout as xw today.
      subprow   replace the per-step bottom-row capture (1 lane roll + 1
                select per chain-step, the ~20% noprow found) with a
                per-step STATIC (1,128) store of the bottom sublane into a
                (128,128) VMEM scratch, then once per 128-step window
                rebuild the prow vector with 128/SUB STRIDED lane rolls
                (pltpu.roll stride=1 over sublanes spreads each tile's
                lane-127 column onto consecutive destination lanes) +
                masked merges + one sublane max-reduce. 128 -> 8 lane
                rolls per window per chain; ROADMAP lever #4.
      sw_sp     the SW body (zero clamp + folded-guard bv/bc argmax
                capture, +2 carries) on top of subprow — the sw_lg
                roofline denominator; sw_nobc_sp drops the bc carry
                (value-only capture, host-side column recovery).
    """
    variants = variants or ["base", "nolookup", "lookup6", "smemx",
                            "noheader", "lean"]
    a8 = jnp.ones((SUB, 128), jnp.int32)
    planes = jnp.ones((8, SUB, 128), jnp.int32)
    xs = jnp.ones((1, 1024), jnp.int32)
    res = {}

    def make_run(m, *, nolookup=False, planes6=False, smemx=False,
                 noheader=False, noacc=False, noprow=False,
                 noxcarry=False, packedx=False, subprow=False,
                 sw=False, nobc=False, interpret=False):
        def kernel(xs_ref, a_ref, planes_ref, o_ref, *scratch):
            scr_ref = scratch[0] if subprow else None
            a = a_ref[...]
            g = jnp.int32(-11)
            l_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
            l_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            i2d = (
                jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0) * 128
                + l_iota
            )
            P = [planes_ref[p] for p in range(8)]
            pw = a[0:1, :]

            def shift2(v, f):
                b = pltpu.roll(v, 1, axis=1)
                c = pltpu.roll(b, 1, axis=0)
                out = jnp.where(l_iota == 0, c, b)
                return jnp.where(i2d == 0, f, out)

            NC = 5 - int(noxcarry or packedx) - int(noacc) - int(noprow)
            if sw:
                NC += 1 if nobc else 2
            npk = (K + 3) // 4 if packedx else 0

            def body(w, carry):
                vs = list(carry)
                clocs = [w * 128 + 511 - k for k in range(K)]
                selbs = [jnp.mod(clocs[k] + 1, 2048) for k in range(K)]
                if sw:
                    # Folded argmax guard precompute (production: i2ws,
                    # one unsigned range compare per step).
                    i2ws = [
                        jnp.where(i2d <= 2046, i2d - clocs[k],
                                  jnp.int32(1 << 30))
                        for k in range(K)
                    ]
                    bndu = jnp.uint32(2046)
                for tt in range(128):
                    if packedx:
                        # One packed shift register per 4 chains: a single
                        # fill roll + shift2 moves every chain's letter.
                        for p in range(npk):
                            fillp = (
                                pltpu.roll(a + p, 128 - tt, axis=1)
                                if tt else (a + p)
                            )
                            vs[NC * K + p] = shift2(vs[NC * K + p], fillp)
                    for k in range(K):
                        st = list(vs[NC * k: NC * (k + 1)])
                        v1, sh1p = st[0], st[1]
                        n = 2
                        xd = acc = prow = bv = bc = None
                        if not (noxcarry or packedx):
                            xd = st[n]
                            n += 1
                        if not noacc:
                            acc = st[n]
                            n += 1
                        if not noprow:
                            prow = st[n]
                            n += 1
                        if sw:
                            bv = st[n]
                            if not nobc:
                                bc = st[n + 1]
                        c = clocs[k] + tt
                        # --- substitution operand ---
                        if packedx:
                            # Per-chain letter extract from the packed
                            # word: shift (free for k%4 == 0) + and.
                            xd = vs[NC * K + k // 4]
                            if k % 4:
                                xd = xd >> ((k % 4) * 8)
                            xd = xd & 255
                        elif noxcarry:
                            # Recompute the lookup operand (one vector
                            # add) instead of carrying a shift register.
                            xd = (a + c) & 31
                        elif smemx:
                            xval = xs_ref[0, jnp.mod(c + 1, 1024)]
                            xd = shift2(xd, jnp.full(
                                (SUB, 128), xval, jnp.int32))
                        else:
                            fillx = (
                                pltpu.roll(a, 128 - tt, axis=1)
                                if tt else a
                            )
                            xd = shift2(xd, fillx)
                        if nolookup:
                            s = xd
                        elif planes6:
                            wi = xd >> 5
                            b0 = (wi & 1) > 0
                            b1 = (wi & 2) > 0
                            b2 = (wi & 4) > 0
                            t01 = jnp.where(b0, P[1], P[0])
                            t23 = jnp.where(b0, P[3], P[2])
                            t45 = jnp.where(b0, P[5], P[4])
                            q0 = jnp.where(b1, t23, t01)
                            word = jnp.where(b2, t45, q0)
                            s = ((word >> (xd & 24)) & 255) - 128
                        else:
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
                        fill1 = pltpu.roll(pw, 127 - tt, axis=1)
                        sh1 = shift2(v1, fill1)
                        if noheader:
                            diag = sh1p
                            left = v1
                        else:
                            diag = jnp.where(i2d == c, c + g, sh1p)
                            left = jnp.where(i2d == c, c * g, v1)
                        cell = jnp.maximum(
                            diag + s, jnp.maximum(sh1, left) + g
                        )
                        if sw:
                            # Zero clamp + folded-guard argmax capture
                            # (production: is_sw branch of the hot loop).
                            cell = jnp.maximum(cell, 0)
                            uu = (tt - i2ws[k]).astype(jnp.uint32)
                            if nobc:
                                cellm = jnp.where(uu <= bndu, cell, 0)
                                bv = jnp.maximum(bv, cellm)
                            else:
                                upd = (cell > bv) & (uu <= bndu)
                                bv = jnp.where(upd, cell, bv)
                                bc = jnp.where(upd, c, bc)
                        # --- captures ---
                        st = [cell, sh1]
                        if not (noxcarry or packedx):
                            st.append(xd)
                        if not noacc:
                            sel = selbs[k] + tt
                            sel = sel - jnp.where(sel >= 2048, 2048, 0)
                            acc = jnp.where(i2d == sel, cell, acc)
                            st.append(acc)
                        if subprow:
                            # Bottom sublane -> scratch row tt (static
                            # store, no permute); prow rebuilt at the
                            # window flush below.
                            scr_ref[k, pl.ds(tt, 1), :] = (
                                cell[SUB - 1:SUB, :]
                            )
                            if tt == 125:
                                # Window flush: spread each SUB-row tile's
                                # lane-127 column onto consecutive prow
                                # lanes with ONE strided roll per tile.
                                diffm = (l_iota - jax.lax.broadcasted_iota(
                                    jnp.int32, (SUB, 128), 0)) & 127
                                mrg = None
                                for qq in range(128 // SUB):
                                    tile = scr_ref[
                                        k, pl.ds(qq * SUB, SUB), :
                                    ]
                                    shift0 = (qq * SUB + 3) % 128
                                    if shift0 + SUB - 1 >= 128:
                                        # Mosaic caps a strided rotate's
                                        # max shift at the vreg width
                                        # (exclusive bound, like
                                        # production sub_flush).
                                        tile = pltpu.roll(
                                            tile, shift0, axis=1
                                        )
                                        shift0 = 0
                                    rolled = pltpu.roll(
                                        tile, shift0, axis=1,
                                        stride=1, stride_axis=0,
                                    )
                                    msk = diffm == ((qq * SUB + 2) & 127)
                                    mrg = (
                                        jnp.where(msk, rolled, -(2 ** 30))
                                        if mrg is None
                                        else jnp.where(msk, rolled, mrg)
                                    )
                                flat = jnp.max(mrg, axis=0, keepdims=True)
                                # Stand-ins for the production fixups
                                # (j==0 seed inject + store gate).
                                flat = jnp.where(
                                    l_row == 0, jnp.int32(w), flat
                                )
                                prow = jnp.where(
                                    c >= 2047, flat, prow
                                )
                            st.append(prow)
                        elif not noprow:
                            sel_p = (tt + 2) % 128
                            bot = cell[SUB - 1:SUB, :]
                            last = pltpu.roll(
                                bot, (sel_p + 1) % 128, axis=1
                            )
                            prow = jnp.where(
                                (l_row == sel_p) & (c >= 2047), last, prow
                            )
                            st.append(prow)
                        if sw:
                            st.append(bv)
                            if not nobc:
                                st.append(bc)
                        vs[NC * k: NC * (k + 1)] = st
                return tuple(vs)

            init = []
            for k in range(K):
                init += [a + k, a + k + 1]
                if not (noxcarry or packedx):
                    init.append(a & 31)
                if not noacc:
                    init.append(a)
                if not noprow:
                    init.append(a[0:1, :])
                if sw:
                    init.append(a + 5)
                    if not nobc:
                        init.append(a + 6)
            for p in range(npk):
                init.append((a + p) & 31)
            out = jax.lax.fori_loop(0, m, body, tuple(init))
            # Consume EVERY carry so no chain is dead-code-eliminable.
            s = out[0]
            for i, v in enumerate(out[1:]):
                s = jnp.maximum(s, v[0:1, :] if v.shape[0] == 1 else v)
            o_ref[0:1, :] = s[0:1, :]

        @jax.jit
        def run(xs_a, a, pl_a):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
                scratch_shapes=(
                    [pltpu.VMEM((K, 128, 128), jnp.int32)]
                    if subprow else []
                ),
                interpret=interpret,
            )(xs_a, a, pl_a)

        return run

    flags = {
        "base": {},
        "nolookup": {"nolookup": True},
        "lookup6": {"planes6": True},
        "smemx": {"smemx": True},
        "noheader": {"noheader": True},
        "lean": {"smemx": True, "planes6": True, "noheader": True},
        "noacc": {"noacc": True},
        "noprow": {"noprow": True},
        "noxcarry": {"noxcarry": True},
        "mincarry": {"noacc": True, "noprow": True, "noxcarry": True},
        "packedx": {"packedx": True},
        "subprow": {"subprow": True},
        "subprow_px": {"subprow": True, "packedx": True},
        # SW body variants: zero clamp + folded-guard argmax capture on
        # top of the linear step — the sw_lg roofline denominators.
        "sw_sp": {"sw": True, "subprow": True},
        "sw_nobc_sp": {"sw": True, "nobc": True, "subprow": True},
    }

    if variants and variants[0] == "__check__":
        # CPU interpret-mode trace check (optionally a subset: pass
        # ["__check__", name, ...] — the full set is slow on XLA:CPU).
        names = variants[1:] or list(flags)
        for name in names:
            r = make_run(1, interpret=True, **flags[name])
            np.asarray(jax.device_get(r(xs, a8, planes)))
        return {"check": "ok", "variants": names}
    for name in variants:
        kw = flags[name]

        def mk(m, kw=kw):
            r = make_run(m, **kw)
            return lambda a: r(xs, a, planes)

        dt = _time_pair(mk, a8, 200, 1200)  # dt per window (128 steps)
        ns_step = dt * 1e9 / (128 * K)
        res[name] = {
            "ns_per_chain_step": round(ns_step, 3),
            "gcups": round(K * SUB * 128 * 128 / dt / 1e9, 2),
        }
    return res


def probe_fullstep_affine(K: int = 6, variants=None) -> dict:
    """The PRODUCTION nw_ag (Gotoh affine) step body, 128-step-unrolled —
    the affine analog of probe_fullstep, so the affine roofline
    denominator is a measured faithful-body rate instead of the
    latency-bound skeleton (ROOFLINE.md §7 found the linear skeleton
    measures BELOW the production body; this probe closes the same gap
    for affine). Variants mirror the production lever set
    (ops/pallas_wavefront2.py):

      base      unpacked per-chain E/F carries (e1, f1: fillF roll + shF
                shift2 + 2 max/add each) + per-step prow/prowF bot-capture
                rolls — 9 (SUB,128) carries/chain
      pe        packedef: E/F as byte deltas de/df off the H carries,
                4 chains per packed word (de: extract + sub/add, no carry;
                df: ONE shift2 + fill roll per word per step + extract),
                produce-time clip+pack — 7 carries/chain + 2*ceil(K/4)
      sp        subprow: bottom-sublane static stores + once-per-window
                strided-roll rebuild for BOTH prow and prowF (two
                (K,128,128) scratches); drops both capture carries
      pe_sp     packedef + subprow — 5 carries/chain + shared words
      pe_px_sp  + packedx (packed xd shift register across chains) —
                4 carries/chain; the production nw_ag tuned config
      sw_pe_nb_sp  the sw_ag production body (K=6 packedef + noBc +
                subProw): zero clamp + folded-guard value-only argmax
                (+1 carry) on top of pe_sp — the sw_ag roofline
                denominator
    """
    variants = variants or ["base", "pe", "pe_sp", "pe_px_sp"]
    a8 = jnp.ones((SUB, 128), jnp.int32)
    planes = jnp.ones((8, SUB, 128), jnp.int32)
    res = {}

    def make_run(m, *, pe=False, px=False, sp=False, sw=False,
                 nobc=False, interpret=False):
        def kernel(a_ref, planes_ref, o_ref, *scratch):
            pos = 0
            sprow = sprowF = prow_out = None
            if sp:
                sprow = scratch[pos]
                sprowF = scratch[pos + 1]
                prow_out = scratch[pos + 2]
                pos += 3
            a = a_ref[...]
            g = jnp.int32(-11)
            ge = jnp.int32(-2)
            l_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
            l_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            s_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
            i2d = s_iota * 128 + l_iota
            P = [planes_ref[p] for p in range(8)]
            pw = a[0:1, :]

            def shift2(v, f):
                b = pltpu.roll(v, 1, axis=1)
                c = pltpu.roll(b, 1, axis=0)
                out = jnp.where(l_iota == 0, c, b)
                return jnp.where(i2d == 0, f, out)

            # Per-chain carries: v1, sh1p, (xd), acc, accE,
            # (e1, f1 unless pe), (prow, prowF unless sp).
            NC = (3 if px else 4) + 1 + (0 if pe else 2) + (0 if sp else 2)
            if sw:
                NC += 1 if nobc else 2
            npk = (K + 3) // 4 if px else 0
            npk2 = (K + 3) // 4 if pe else 0

            def sub_flush(scr, k):
                diffm = (l_iota - s_iota) & 127
                mrg = None
                for qq in range(128 // SUB):
                    tile = scr[k, pl.ds(qq * SUB, SUB), :]
                    shift0 = (qq * SUB + 3) % 128
                    if shift0 + SUB - 1 >= 128:
                        tile = pltpu.roll(tile, shift0, axis=1)
                        shift0 = 0
                    rolled = pltpu.roll(
                        tile, shift0, axis=1, stride=1, stride_axis=0,
                    )
                    msk = diffm == ((qq * SUB + 2) & 127)
                    mrg = jnp.where(
                        msk, rolled,
                        -(2 ** 30) if mrg is None else mrg,
                    )
                return jnp.max(mrg, axis=0, keepdims=True)

            def body(w, carry):
                vs = list(carry)
                clocs = [w * 128 + 511 - k for k in range(K)]
                selbs = [jnp.mod(clocs[k] + 1, 2048) for k in range(K)]
                if sw:
                    # Folded argmax guard precompute (production: i2ws,
                    # one unsigned range compare per step).
                    i2ws = [
                        jnp.where(i2d <= 2046, i2d - clocs[k],
                                  jnp.int32(1 << 30))
                        for k in range(K)
                    ]
                    bndu = jnp.uint32(2046)
                for tt in range(128):
                    if px:
                        for p in range(npk):
                            fillp = (
                                pltpu.roll(a + p, 128 - tt, axis=1)
                                if tt else (a + p)
                            )
                            vs[NC * K + p] = shift2(vs[NC * K + p], fillp)
                    if pe:
                        # F deltas cross rows like f1 did: one shift2 +
                        # fill roll per packed word per step.
                        for p in range(npk2):
                            dfill = pltpu.roll(a + p, 127 - tt, axis=1)
                            slot = NC * K + npk + npk2 + p
                            vs[slot] = shift2(vs[slot], dfill)
                    newde = newdf = None
                    for k in range(K):
                        st = list(vs[NC * k: NC * (k + 1)])
                        v1, sh1p = st[0], st[1]
                        n = 2
                        if not px:
                            xd = st[n]
                            n += 1
                        acc = st[n]
                        accE = st[n + 1]
                        n += 2
                        if not pe:
                            e1, f1 = st[n], st[n + 1]
                            n += 2
                        if not sp:
                            prow, prowF = st[n], st[n + 1]
                        bv = bc = None
                        if sw:
                            nsw = n + (0 if sp else 2)
                            bv = st[nsw]
                            if not nobc:
                                bc = st[nsw + 1]
                        c = clocs[k] + tt
                        # --- substitution operand + packed lookup ---
                        if px:
                            xd = vs[NC * K + k // 4]
                            if k % 4:
                                xd = xd >> ((k % 4) * 8)
                            xd = xd & 255
                        else:
                            fillx = (
                                pltpu.roll(a, 128 - tt, axis=1)
                                if tt else a
                            )
                            xd = shift2(xd, fillx)
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
                        # --- DP step (Gotoh) ---
                        fill1 = pltpu.roll(pw, 127 - tt, axis=1)
                        sh1 = shift2(v1, fill1)
                        diag = jnp.where(i2d == c, c + g, sh1p)
                        if pe:
                            de = vs[NC * K + npk + k // 4]
                            if k % 4:
                                de = de >> ((k % 4) * 8)
                            de = de & 255
                            e_new = v1 + ge - de
                            e_new = jnp.where(i2d == c, c * g, e_new)
                            dfw = vs[NC * K + npk + npk2 + k // 4]
                            if k % 4:
                                dfw = dfw >> ((k % 4) * 8)
                            f_new = sh1 + ge - (dfw & 255)
                        else:
                            e_new = jnp.maximum(e1, v1 + g) + ge
                            e_new = jnp.where(i2d == c, c * g, e_new)
                            fillF = pltpu.roll(pw, (126 - tt) % 128,
                                               axis=1)
                            shF = shift2(f1, fillF)
                            f_new = jnp.maximum(shF, sh1 + g) + ge
                        cell = jnp.maximum(
                            diag + s, jnp.maximum(e_new, f_new)
                        )
                        if sw:
                            # Zero clamp + folded-guard argmax capture
                            # (production sw_ag body; clamp precedes the
                            # packedef delta capture there too).
                            cell = jnp.maximum(cell, 0)
                            uu = (tt - i2ws[k]).astype(jnp.uint32)
                            if nobc:
                                bv = jnp.maximum(
                                    bv, jnp.where(uu <= bndu, cell, 0)
                                )
                            else:
                                upd = (cell > bv) & (uu <= bndu)
                                bv = jnp.where(upd, cell, bv)
                                bc = jnp.where(upd, c, bc)
                        if pe:
                            de_new = jnp.clip(cell - e_new, 0, -g)
                            df_new = jnp.clip(cell - f_new, 0, -g)
                            qq = k % 4
                            if qq == 0:
                                newde, newdf = de_new, df_new
                            else:
                                newde = newde | (de_new << (8 * qq))
                                newdf = newdf | (df_new << (8 * qq))
                            if qq == 3 or k == K - 1:
                                vs[NC * K + npk + k // 4] = newde
                                vs[NC * K + npk + npk2 + k // 4] = newdf
                        # --- captures: hcol acc, Ecol accE, prow(F) ---
                        sel = selbs[k] + tt
                        sel = sel - jnp.where(sel >= 2048, 2048, 0)
                        acc = jnp.where(i2d == sel, cell, acc)
                        accE = jnp.where(i2d == sel, e_new, accE)
                        st = [cell, sh1]
                        if not px:
                            st.append(xd)
                        st += [acc, accE]
                        if not pe:
                            st += [e_new, f_new]
                        if sp:
                            sprow[k, pl.ds(tt, 1), :] = cell[SUB - 1:SUB, :]
                            sprowF[k, pl.ds(tt, 1), :] = (
                                f_new[SUB - 1:SUB, :]
                            )
                            if tt == 125:
                                flat = sub_flush(sprow, k)
                                flatF = sub_flush(sprowF, k)
                                first = (l_row == 0) & (w == 0)
                                flat = jnp.where(first, jnp.int32(0), flat)
                                flatF = jnp.where(
                                    first, jnp.int32(-(2 ** 30)), flatF
                                )
                                prow_out[k, 0:1, :] = flat
                                prow_out[k, 1:2, :] = flatF
                        else:
                            sel_p = (tt + 2) % 128
                            gate = c >= 2047
                            bot = cell[SUB - 1:SUB, :]
                            last = pltpu.roll(bot, (sel_p + 1) % 128,
                                              axis=1)
                            prow = jnp.where(
                                (l_row == sel_p) & gate, last, prow
                            )
                            botF = f_new[SUB - 1:SUB, :]
                            lastF = pltpu.roll(botF, (sel_p + 1) % 128,
                                               axis=1)
                            prowF = jnp.where(
                                (l_row == sel_p) & gate, lastF, prowF
                            )
                            st += [prow, prowF]
                        if sw:
                            st.append(bv)
                            if not nobc:
                                st.append(bc)
                        vs[NC * k: NC * (k + 1)] = st
                return tuple(vs)

            init = []
            for k in range(K):
                init += [a + k, a + k + 1]
                if not px:
                    init.append(a & 31)
                init += [a, a + 2]
                if not pe:
                    init += [a + 3, a + 4]
                if not sp:
                    init += [a[0:1, :], a[0:1, :] + 1]
                if sw:
                    init.append(a + 5)
                    if not nobc:
                        init.append(a + 6)
            for p in range(npk):
                init.append((a + p) & 31)
            for p in range(2 * npk2):
                init.append((a + p) & 255)
            out = jax.lax.fori_loop(0, m, body, tuple(init))
            s = out[0]
            for v in out[1:]:
                s = jnp.maximum(s, v[0:1, :] if v.shape[0] == 1 else v)
            if sp:
                for k in range(K):
                    s = jnp.maximum(s, prow_out[k, 0:1, :])
                    s = jnp.maximum(s, prow_out[k, 1:2, :])
            o_ref[0:1, :] = s[0:1, :]

        scratch_shapes = (
            [pltpu.VMEM((K, 128, 128), jnp.int32),
             pltpu.VMEM((K, 128, 128), jnp.int32),
             pltpu.VMEM((K, SUB, 128), jnp.int32)]
            if sp else []
        )

        @jax.jit
        def run(a, pl_a):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
                scratch_shapes=scratch_shapes,
                interpret=interpret,
            )(a, pl_a)

        return run

    flags = {
        "base": {},
        "pe": {"pe": True},
        "sp": {"sp": True},
        "pe_sp": {"pe": True, "sp": True},
        "pe_px_sp": {"pe": True, "px": True, "sp": True},
        # SW-affine bodies: the sw_ag production config and its bc-carry
        # variant — the sw_ag roofline denominators.
        "sw_pe_nb_sp": {"pe": True, "sp": True, "sw": True, "nobc": True},
        "sw_pe_sp": {"pe": True, "sp": True, "sw": True},
        # Plain (unpacked E/F) SW-affine bodies: round 5 found subProw
        # frees the registers packedef existed to free, making the plain
        # forms both compilable and FASTER (ROOFLINE.md §8.5).
        "sw_sp": {"sp": True, "sw": True},
        "sw_nb_sp": {"sp": True, "sw": True, "nobc": True},
    }

    if variants and variants[0] == "__check__":
        names = variants[1:] or list(flags)
        for name in names:
            r = make_run(1, interpret=True, **flags[name])
            np.asarray(jax.device_get(r(a8, planes)))
        return {"check": "ok", "variants": names}
    for name in variants:
        kw = flags[name]

        def mk(m, kw=kw):
            r = make_run(m, **kw)
            return lambda a: r(a, planes)

        dt = _time_pair(mk, a8, 200, 1200)  # dt per window (128 steps)
        ns_step = dt * 1e9 / (128 * K)
        res[name] = {
            "ns_per_chain_step": round(ns_step, 3),
            "gcups": round(K * SUB * 128 * 128 / dt / 1e9, 2),
        }
    return res


def roofline_body(kind: str, gap: str, K: int = 6) -> dict:
    """Measure the spec's ROOFLINE-defining faithful step body NOW, in
    the calling process — the window-invariant MFU denominator.

    Absolute GCUPS drift up to ±25% between chip windows on identical
    code (ROOFLINE.md §7), so bench.py divides its kernel measurement by
    THIS same-window body rate instead of a recorded constant — the
    same-run verification philosophy of the reference harness
    (ref: src/benchmark.cpp:119-147, where expected values are always
    set and checked within one run). The variant per spec is the fastest
    measured faithful body (ROOFLINE.md §7/§7.1): linear = subprow K=6;
    SW linear = sw_nobc_sp; NW affine = packedef (pe); SW affine =
    sw_pe_nb_sp.
    """
    if gap == "affine":
        name = "sw_pe_nb_sp" if kind == "sw" else "pe"
        r = probe_fullstep_affine(K, [name])
    else:
        name = "sw_nobc_sp" if kind == "sw" else "subprow"
        r = probe_fullstep(K, [name])
    return {"variant": name, "K": K, **r[name]}


def probe_gridcost(K: int = 6, n: int = 23728,
                   gap: str = "linear") -> dict:
    """Split the production kernel's wall time into step-body vs
    grid/window machinery, by timing pallas_mlsp_v2 at the tuned config
    with ``bodyoff=True`` (full grid, per-window input reads, scratch
    stores, flushes and output DMAs — but the 128 DP steps of every
    window skipped) against the real kernel. Motivation (ROOFLINE §7.1):
    at 23728² the full kernel runs ~45%, below its own measured step
    body; this probe decides whether the gap is per-chunk machinery
    (attack DMA/flush structure) or in-situ body-rate degradation, e.g.
    the per-chain planes residency the fullstep probe does not model
    (attack register pressure). ``gap="affine"`` probes the nw_ag
    machinery (plain affine + subprow — bodyoff has no packedx/packedef
    forms, but those only change the skipped step body; the affine
    machinery deltas are the prevf windows, the sprowF flush and the
    frow/ecol output DMAs, all present here)."""
    import functools

    from ..ops.pallas_wavefront2 import _cdiv, pallas_mlsp_v2

    R, W, TW = 2048, 512, 2048
    rng = np.random.default_rng(7)
    subst = jnp.asarray(
        rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
    )
    B_p = _cdiv(_cdiv(n, R), K) * K
    rows_p, cols_p = B_p * R, _cdiv(n, TW) * TW
    y = np.zeros(1 + rows_p, np.int32)
    x = np.zeros(1 + cols_p, np.int32)
    y[1: 1 + n] = rng.integers(0, 25, n)
    x[1: 1 + n] = rng.integers(0, 25, n)
    y_d, x_d = jnp.asarray(y), jnp.asarray(x)

    # Wrap-grid chunk count (mirrors the pallas_mlsp_v2 geometry).
    OFF = W * _cdiv(R + 256, W)
    NSpad = _cdiv(R + cols_p - 1 + 128, W) * W
    CH = (B_p // K) * (NSpad // W) + (K - 1) * (OFF // W)

    res = {"device": jax.devices()[0].device_kind, "K": K, "n": n,
           "gap": gap, "chunks": int(CH)}
    for name, boff in (("full", False), ("bodyoff", True)):

        @functools.partial(jax.jit, static_argnames=("m",))
        def loop(s, yj, xj, *, m, boff=boff):
            def body(carry, _):
                xj2 = xj.at[0].set(carry)
                out = pallas_mlsp_v2(
                    s, yj, xj2, jnp.int32(-11),
                    jnp.int32(-2 if gap == "affine" else 0),
                    jnp.int32(n + 1), jnp.int32(n + 1),
                    R=R, W=W, TW=TW, K=K, kind="nw", gap=gap,
                    subprow=True, bodyoff=boff,
                )
                return out["hrow"][0, 0], None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=m)
            return c

        def t_of(m):
            out = loop(subst, y_d, x_d, m=m)
            _ = np.asarray(jax.device_get(out))
            ts = []
            for _i in range(4):
                t0 = time.perf_counter()
                out = loop(subst, y_d, x_d, m=m)
                _ = np.asarray(jax.device_get(out))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = (t_of(9) - t_of(1)) / 8
        res[name] = {
            "ms": round(dt * 1e3, 3),
            "us_per_chunk": round(dt * 1e6 / CH, 2),
        }
    if "full" in res and "bodyoff" in res:
        body_ms = res["full"]["ms"] - res["bodyoff"]["ms"]
        # In-situ body rate: chunks * 512 chain-steps * K chains.
        steps = CH * (W // 128) * 128 * K
        res["body_ms"] = round(body_ms, 3)
        res["insitu_ns_per_chain_step"] = round(body_ms * 1e6 / steps, 3)
        res["machinery_frac"] = round(
            res["bodyoff"]["ms"] / res["full"]["ms"], 3
        )
    return res


def probe_int16() -> dict:
    """int32 vs int16 ALU issue throughput (does sub-word double it?).
    12 independent add+max chains, everything kept in the probed dtype."""
    out = {}
    NCH = 12
    for dt_name, dt in (("i32", jnp.int32), ("i16", jnp.int16)):
        a = jnp.ones((SUB, 128), dt)

        def mk(m, dt=dt):
            def kernel(a_ref, o_ref):
                a = a_ref[...]
                seven = jnp.asarray(7, dt)

                def body(i, carry):
                    return tuple(
                        jnp.maximum(c + a, a + seven) for c in carry
                    )

                carry = tuple(
                    a + jnp.asarray(k, dt) for k in range(NCH)
                )
                vs = jax.lax.fori_loop(0, m, body, carry)
                s = vs[0]
                for v in vs[1:]:
                    s = jnp.maximum(s, v)
                o_ref[0:1, :] = s[0:1, :]

            @jax.jit
            def run(a):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((1, 128), dt),
                )(a)

            return run

        d = _time_pair(mk, a, 100_000, 600_000)
        out[dt_name] = {"ns_per_op": round(d * 1e9 / (NCH * 2), 3)}
    return out


def main(argv) -> int:
    which = argv[1] if len(argv) > 1 else "all"
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "vpu_probe requires a real TPU"}))
        return 1
    dev = jax.devices()[0].device_kind
    if which in ("ops", "all"):
        print(json.dumps({"probe": "ops", "device": dev, **probe_ops()}))
    if which in ("skeleton", "all"):
        print(json.dumps({
            "probe": "skeleton_nw_lg", "device": dev,
            **probe_skeleton(False),
        }))
    if which in ("skeleton_affine", "all"):
        print(json.dumps({
            "probe": "skeleton_nw_ag", "device": dev,
            **probe_skeleton(True),
        }))
    if which in ("fullstep", "all"):
        K = int(argv[2]) if len(argv) > 2 else 4
        variants = argv[3].split(",") if len(argv) > 3 else None
        print(json.dumps({
            "probe": "fullstep_nw_lg", "device": dev, "K": K,
            **probe_fullstep(K, variants),
        }))
    if which == "fullstep_affine":
        K = int(argv[2]) if len(argv) > 2 else 6
        variants = argv[3].split(",") if len(argv) > 3 else None
        print(json.dumps({
            "probe": "fullstep_nw_ag", "device": dev, "K": K,
            **probe_fullstep_affine(K, variants),
        }))
    if which == "gridcost":
        K = int(argv[2]) if len(argv) > 2 else 6
        n = int(argv[3]) if len(argv) > 3 else 23728
        gap = argv[4] if len(argv) > 4 else "linear"
        print(json.dumps({
            "probe": f"gridcost_nw_{'ag' if gap == 'affine' else 'lg'}",
            **probe_gridcost(K, n, gap),
        }))
    if which == "subk":
        # Carry-height sweep: does sub=8 with 2x the chains beat the
        # sub=16 plateau once per-chain state halves? (ROOFLINE agenda #1)
        for sub, ks in ((16, (6, 8)), (8, (6, 8, 12, 16)), (32, (3, 4))):
            print(json.dumps({
                "probe": f"skeleton_nw_lg_sub{sub}", "device": dev,
                **probe_skeleton(False, sub=sub, ks=ks),
            }), flush=True)
    if which in ("int16", "all"):
        print(json.dumps({"probe": "int16", "device": dev,
                          **probe_int16()}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
