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


def probe_skeleton(affine: bool) -> dict:
    """Irreducible wavefront step at K interleaved chains -> GCUPS."""
    a8 = jnp.ones((SUB, 128), jnp.int32)
    res = {}
    ks = (1, 2, 3, 4, 6) if affine else (1, 2, 4, 6, 8)
    for K in ks:
        def body_one(a, st, K=K):
            # Constants must be created in kernel scope (pallas rejects
            # captured traced constants).
            g = jnp.int32(-11)
            ge = jnp.int32(-2)
            l_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
            i2d = (
                jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0) * 128
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
                                                              (SUB, 128)),
            a8, 50_000, 300_000,
        )
        res[f"K{K}"] = {
            "ns_per_chain_step": round(dt * 1e9 / K, 3),
            "gcups": round(K * SUB * 128 / dt / 1e9, 2),
        }
    return res


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
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
