"""Hardware validation of the tiny-pair batched kernel (pallas_tiny).

The tiny kernel packs PPB pairs per vector block and carries its own
SW argmax captures (the host-folded ilocm/bndu unsigned range guards),
so interpret-mode parity (tests/test_pallas_tiny.py) does not cover the
real chip's register allocator, unmasked junk lanes, or the unsigned
vector compare lowering. This drive runs the production kernel
(interpret=False) for every spec over a mixed-length bucket and checks
every pair's cost — and for SW the full (value, i, j) best cell — against
the dense CPU oracle, then times the steady-state batch rate with the
in-jit scan recipe used by bench.py.

On success persists the ``tiny_tpu_validated`` flag into
resrc/tuned/<device_kind>.json.

Usage:  python -m gpuseqalign_tpu.bench.validate_tiny_tpu
"""

from __future__ import annotations

import sys
import time

import numpy as np

SPECS = ("nw_lg", "sw_lg", "nw_ag", "sw_ag")


def main(argv) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("validate_tiny_tpu requires a real TPU backend",
              file=sys.stderr)
        return 1

    import jax.numpy as jnp

    from ..core.types import AlignSpec
    from ..models.oracle import align_cost_of, oracle_align_dense
    from ..ops.pallas_tiny import pallas_mlsp_tiny_v2
    from ..ops.pallas_wavefront2 import set_tuned_flag

    rng = np.random.default_rng(37)
    subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
    gapo = -11

    PR, K = 512, 4
    PPB = (16 * 128) // PR
    NP = PPB * K * 8  # several grid rows
    cols_p = 512
    Ys = np.zeros((NP, 1 + PR), np.int32)
    Xs = np.zeros((NP, 1 + cols_p), np.int32)
    adjrs = np.zeros(NP, np.int32)
    adjcs = np.zeros(NP, np.int32)
    pairs = []
    for i in range(NP):
        r = int(rng.integers(64, PR))
        c = int(rng.integers(64, cols_p))
        y = np.zeros(1 + r, np.int32)
        x = np.zeros(1 + c, np.int32)
        y[1:] = rng.integers(0, 25, r)
        x[1:] = rng.integers(0, 25, c)
        Ys[i, : 1 + r] = y
        Xs[i, : 1 + c] = x
        adjrs[i], adjcs[i] = r + 1, c + 1
        pairs.append((y, x))

    all_ok = True
    for spec_name in SPECS:
        spec = AlignSpec.from_name(spec_name)
        gape = -2 if spec.gap.value == "affine" else 0
        t0 = time.perf_counter()
        out = pallas_mlsp_tiny_v2(
            jnp.asarray(subst), jnp.asarray(Ys), jnp.asarray(Xs),
            jnp.int32(gapo), jnp.int32(gape),
            jnp.asarray(adjrs), jnp.asarray(adjcs),
            PR=PR, K=K, kind=spec.kind.value, gap=spec.gap.value,
        )
        jax.block_until_ready(out)
        t1 = time.perf_counter()

        bad = 0
        is_sw = spec_name.startswith("sw")
        if is_sw:
            bvs = np.asarray(out["bv"])
            bcs = np.asarray(out["bc"])
        else:
            cost = np.asarray(out["cost"])
        lane = np.arange(PR)
        for i, (y, x) in enumerate(pairs):
            mats = oracle_align_dense(spec, subst, y, x, gapo, gape)
            want = align_cost_of(spec, mats)
            if is_sw:
                got = int(bvs[i].max(initial=0))
                if got != want:
                    bad += 1
                    continue
                if want > 0:
                    iv = 1 + lane
                    jv = bcs[i] - lane + 1
                    o = np.lexsort((jv, iv, -bvs[i]))[0]
                    if (iv[o], jv[o]) != tuple(int(v) for v in
                                               mats["best"]):
                        bad += 1
            else:
                if int(cost[i]) != want:
                    bad += 1
        if bad:
            print(f"FAIL {spec_name}: {bad}/{NP} pairs mismatch oracle")
            all_ok = False
            continue
        # Steady-state rerun (jit cache hit) for the timing line.
        t2 = time.perf_counter()
        out2 = pallas_mlsp_tiny_v2(
            jnp.asarray(subst), jnp.asarray(Ys), jnp.asarray(Xs),
            jnp.int32(gapo), jnp.int32(gape),
            jnp.asarray(adjrs), jnp.asarray(adjcs),
            PR=PR, K=K, kind=spec.kind.value, gap=spec.gap.value,
        )
        jax.block_until_ready(out2)
        t3 = time.perf_counter()
        cells = sum((int(r) - 1) * (int(c) - 1)
                    for r, c in zip(adjrs, adjcs))
        print(f"PASS {spec_name}: {NP} pairs oracle-exact; batch "
              f"{(t3 - t2) * 1e3:.1f} ms warm ({cells / (t3 - t2) / 1e9:.2f} "
              f"GCUPS agg; first call {(t1 - t0) * 1e3:.0f} ms)")

    if not all_ok:
        print("FAILURES — tiny_tpu_validated NOT set")
        return 1
    path = set_tuned_flag("tiny_tpu_validated", True)
    print(f"ALL PASS — wrote tiny_tpu_validated into {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
