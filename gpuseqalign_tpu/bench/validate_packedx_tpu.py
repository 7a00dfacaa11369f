"""Hardware validation of the packedx production kernel (real TPU only).

packedx (shared byte-packed xd streams, pack_x_streams) is bit-exact vs
the per-chain-xd kernel in interpret mode
(tests/test_pallas_wavefront2.py::test_v2_packedx_matches_base), and the
autotuner's oracle gate covers K=1 — but the tuned production geometry
runs K=4..6 chains on real hardware, where Mosaic's register allocator
and the unmasked dead-lane junk differ from interpret mode. This drive
validates exactly that configuration:

1. Kernel differential at the tuned (kChains, packedx=1) geometry on
   the wrap (continuous-echelon) grid — the production mode at
   benchmark sizes — with two block groups: every CONSUMED output slot
   bit-equal to the packedx=0 kernel at the same K. Consumed means the
   slots align_mlsp_v2 actually reads
   (hrow[:, :width], hcol[:, 1:tcols], frow[:, 1:width], ecol like
   hcol, bv/bc whole) — the unmasked production kernel deliberately
   leaves fill/drain-phase junk in the remaining slots (the jl == 0 /
   past-tcols out blocks; see the _make_kernel hot-loop comment), and
   base and packedx junk LETTERS differ by construction (clip-to-block-0
   vs periodic-wrap bubble streams), so full-array equality is the
   wrong check on hardware. (Interpret mode masks those lanes to ninf,
   which is why the interpret parity test CAN compare full arrays.)
2. End-to-end vs the dense CPU oracle THROUGH align_mlsp_v2 with
   explicit packedx=1 params at a size that forces the tuned K and the
   multi-pass echelon grid (narrow cols, two block groups): align_cost
   + sparse traceback transcript/hash + sparse score hash.

On success persists the `packedx_tpu_validated` flag into
resrc/tuned/<device_kind>.json.

Usage:  python -m gpuseqalign_tpu.bench.validate_packedx_tpu
"""

from __future__ import annotations

import sys

import numpy as np

# The sweep's tuned candidates (logs/sweep_packedx_r2c.log); the drive
# validates these geometries whether or not the cache already carries
# them, so it can gate WRITING them.
CANDIDATE_K = {"nw_lg": 6, "sw_lg": 6, "nw_ag": 4, "sw_ag": 4}


def main(argv) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("validate_packedx_tpu requires a real TPU backend",
              file=sys.stderr)
        return 1

    import jax.numpy as jnp

    from ..core.types import (
        AlgInput, AlgParams, AlgResult, AlignSpec, Status,
    )
    from ..models.oracle import (
        align_cost_of, oracle_align_dense, oracle_hash_dense,
        oracle_trace_dense,
    )
    from ..ops.pallas_wavefront2 import (
        align_mlsp_v2, pallas_mlsp_v2, set_tuned_flag, wrap_ok,
    )
    from ..trace.sparse import hash_sparse, trace_sparse

    rng = np.random.default_rng(7)
    subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
    R = TW = 2048
    W = 512
    failures = 0

    def consumed_equal(base, packed, *, trows, tcols, width):
        """Compare only the slots align_mlsp_v2 consumes."""
        bad = []
        for kk in base:
            b = np.asarray(base[kk])
            p = np.asarray(packed[kk])
            if kk in ("hrow", "frow"):
                j0 = 1 if kk == "frow" else 0  # frow[:,0] overwritten
                b, p = b[:, j0:width], p[:, j0:width]
            elif kk in ("hcol", "ecol"):
                b = b.reshape(b.shape[0], -1, R)[:trows, 1:tcols]
                p = p.reshape(p.shape[0], -1, R)[:trows, 1:tcols]
            if not np.array_equal(b, p):
                bad.append(kk)
        return bad

    # --- 1) kernel differential at the tuned production geometry ---
    for spec_name, K in CANDIDATE_K.items():
        spec = AlignSpec.from_name(spec_name)
        kind, gap = spec.kind.value, spec.gap.value
        gapo, gape = -11, (-2 if gap == "affine" else 0)
        rows = 2 * K * R  # two block groups
        # Wide cols -> the wrap (continuous-echelon) grid, the production
        # mode at benchmark sizes; the multi-pass echelon grid is covered
        # by the e2e oracle check below (narrow cols) at the same K.
        cases = [(24576, "wrap")]
        assert wrap_ok(R=R, W=W, K=K, band_cols=cases[0][0])
        for cols, mode in cases:
            y = np.zeros(1 + rows, np.int32)
            x = np.zeros(1 + cols, np.int32)
            y[1:] = rng.integers(0, 25, rows)
            x[1:] = rng.integers(0, 25, cols)
            args = (jnp.asarray(subst), jnp.asarray(y), jnp.asarray(x),
                    jnp.int32(gapo), jnp.int32(gape),
                    jnp.int32(1 + rows), jnp.int32(1 + cols))
            kw = dict(R=R, W=W, TW=TW, K=K, kind=kind, gap=gap)
            base = jax.device_get(pallas_mlsp_v2(*args, **kw))
            packed = jax.device_get(
                pallas_mlsp_v2(*args, packedx=True, **kw))
            bad = consumed_equal(
                base, packed, trows=rows // R, tcols=cols // TW,
                width=cols + 1,
            )
            tag = f"{spec_name} K={K} {rows}x{cols} [{mode}]"
            if bad:
                failures += 1
                print(f"FAIL kernel-diff {tag}: consumed slots differ: "
                      f"{bad}")
            else:
                print(f"PASS kernel-diff {tag}: consumed slots bit-equal")

    # --- 2) end-to-end vs the CPU oracle at the tuned K ---
    # rows = 2*K*R -> two block groups; narrow cols keep the multi-pass
    # echelon grid (wrap_ok false), so this leg covers echelon + BB=2.
    for spec_name, K in CANDIDATE_K.items():
        spec = AlignSpec.from_name(spec_name)
        gapo, gape = -11, (-2 if spec.gap.value == "affine" else 0)
        rows = 2 * K * R
        cols = 4000
        assert not wrap_ok(R=R, W=W, K=K, band_cols=-(-cols // TW) * TW)
        y = np.zeros(1 + rows, np.int32)
        x = np.zeros(1 + cols, np.int32)
        y[1:] = rng.integers(0, 25, rows)
        x[1:] = rng.integers(0, 25, cols)
        nw = AlgInput()
        nw.subst = subst
        nw.substsz = subst.shape[0]
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost, nw.gape_cost = gapo, gape
        nw.spec = spec
        res = AlgResult()
        trows = -(-rows // R)
        tcols = -(-cols // TW)
        stat = align_mlsp_v2(
            AlgParams({"kChains": [K], "packedx": [1], "winW": [W]}),
            nw, res, R, TW, trows, tcols,
        )
        mats = oracle_align_dense(spec, subst, y, x, gapo, gape)
        ok = (stat == Status.success
              and res.align_cost == align_cost_of(spec, mats))
        if ok:
            transcript, thash, _ = oracle_trace_dense(
                spec, mats, subst, y, x, gapo, gape
            )
            ok = (trace_sparse(nw, res, False) == Status.success
                  and res.edit_trace == transcript
                  and res.trace_hash == thash
                  and hash_sparse(nw, res) == Status.success
                  and res.score_hash == oracle_hash_dense(mats["H"]))
        if ok:
            print(f"PASS e2e {spec_name} K={K} {rows}x{cols}: cost + "
                  "trace + hashes match the oracle")
        else:
            failures += 1
            print(f"FAIL e2e {spec_name} K={K} {rows}x{cols}: "
                  f"stat={stat!r} cost={res.align_cost}")

    if failures:
        print(f"{failures} FAILURES — do NOT ship packedx defaults")
        return 1
    path = set_tuned_flag("packedx_tpu_validated", True)
    print(f"ALL PASS — wrote packedx_tpu_validated into {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
