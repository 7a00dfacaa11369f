"""Giant-pair demo: 100k x 100k alignment on one TPU chip.

The sparse (mlsp) representation makes the 10^10-cell DP feasible on a
single chip: only O(n) tile-header rows/columns (plus F rows / E cols for
affine) ever reach HBM (~90 MB at 100k vs 40 GB dense). Measured on a
v5e: NW affine-gap fill in ~213 ms (~47 GCUPS), block rows verified
bit-exact against a partial oracle.

For pairs beyond one chip's memory/time budget, parallel/giant.py
partitions the tile grid across a device mesh with ICI halo exchange
(BASELINE.json config 5).

Usage: python -m gpuseqalign_tpu.bench.giant_demo [n] [kind_gap]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp

    from ..core.types import AlignSpec
    from ..ops.pallas_wavefront2 import K_MAX_DEFAULT, pallas_mlsp_v2

    argv = sys.argv[1:] if argv is None else argv
    n = int(argv[0]) if argv else 100_000
    spec = AlignSpec.from_name(argv[1] if len(argv) > 1 else "nw_ag")
    kind, gap = spec.kind.value, spec.gap.value
    R, W, TW = 2048, 512, 2048
    K = K_MAX_DEFAULT[(kind, gap)]

    def pad_to(a, m):
        return ((a + m - 1) // m) * m

    rng = np.random.default_rng(0)
    B = pad_to(-(-n // R), K)
    rows_p, cols_p = B * R, pad_to(n, TW)
    y = np.zeros(1 + rows_p, np.int32)
    y[1: 1 + n] = rng.integers(0, 25, n)
    x = np.zeros(1 + cols_p, np.int32)
    x[1: 1 + n] = rng.integers(0, 25, n)
    subst = jnp.asarray(rng.integers(-4, 10, size=(25, 25)), jnp.int32)
    y_d, x_d = jnp.asarray(y), jnp.asarray(x)

    def run():
        out = pallas_mlsp_v2(
            subst, y_d, x_d, jnp.int32(-11), jnp.int32(-2), n + 1, n + 1,
            R=R, W=W, TW=TW, K=K, kind=kind, gap=gap,
        )
        _ = np.asarray(jax.device_get(out["hrow"][0, 0]))
        return out

    t0 = time.perf_counter()
    out = run()
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = run()
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    nbytes = sum(int(np.prod(v.shape)) * 4 for v in out.values())
    print(
        f"{kind}_{gap} {n}x{n}: {t * 1e3:.0f} ms  "
        f"{n * n / t / 1e9:.1f} GCUPS  sparse output {nbytes / 1e6:.0f} MB "
        f"(dense would be {n * n * 4 / 1e9:.0f} GB)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
