"""Hardware validation of the wrap-banded giant engine (real TPU only).

The wrap (continuous) echelon inside banded_pass is bit-exact on the CPU
mesh in interpret mode, but interpret mode CLAMPS out-of-bounds VMEM
accesses while real TPUs wrap them into the adjacent buffer (CLAUDE.md),
so auto-KB stays off on the TPU path until this differential drive has
passed on the chip. On success the `wrap_tpu_validated` flag is persisted
in the per-device-kind tuned cache (resrc/tuned/<device_kind>.json) so
the validation survives process restarts (parallel/giant2._wrap_validated).

Runs align_giant2 with explicit passBlocks on a D=1 mesh (the one real
chip) for all four specs at sizes that force multiple passes AND a row
remainder, and asserts align_cost + sparse traceback transcript/hash +
sparse score hash bit-exact against the dense CPU oracle.

Usage:  python -m gpuseqalign_tpu.bench.validate_wrap_tpu [rows cols]
On success prints PASS lines and writes the tuned-cache flag.
"""

from __future__ import annotations

import sys

import numpy as np


def main(argv) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("validate_wrap_tpu requires a real TPU backend", file=sys.stderr)
        return 1

    from ..core.types import (
        AlgInput, AlgParams, AlgResult, AlignSpec, Status,
    )
    from ..models.oracle import (
        align_cost_of, oracle_align_dense, oracle_hash_dense,
        oracle_trace_dense,
    )
    from ..parallel.giant2 import align_giant2
    from ..parallel.mesh import make_mesh
    from ..trace.sparse import hash_sparse, trace_sparse

    rows = int(argv[1]) if len(argv) > 1 else 5000
    cols = int(argv[2]) if len(argv) > 2 else 7000

    rng = np.random.default_rng(42)
    subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)

    def seq(n):
        return np.concatenate(
            [np.zeros(1, np.int32),
             rng.integers(0, 25, n, dtype=np.int32)]
        )

    y, x = seq(rows), seq(cols)
    mesh = make_mesh(1, axis_name="sp")
    failures = 0
    for spec_name in ("nw_lg", "nw_ag", "sw_lg", "sw_ag"):
        spec = AlignSpec.from_name(spec_name)
        nw = AlgInput()
        nw.subst = subst
        nw.substsz = 25
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost, nw.gape_cost = -11, -2
        nw.spec = spec
        res = AlgResult()
        # Small R so rows=5000 forces several KB=2 passes with padding.
        stat = align_giant2(
            AlgParams({"tileBy": [512], "tileBx": [512], "kChains": [2],
                       "passBlocks": [2]}),
            nw, res, mesh=mesh,
        )
        if stat != Status.success:
            print(f"FAIL {spec_name}: align stat={stat!r}")
            failures += 1
            continue
        mats = oracle_align_dense(spec, subst, y, x, -11, -2)
        ok_cost = res.align_cost == align_cost_of(spec, mats)
        ok_trace = trace_sparse(nw, res, False) == Status.success
        transcript, thash, _ = oracle_trace_dense(
            spec, mats, subst, y, x, -11, -2
        )
        ok_trace = ok_trace and res.edit_trace == transcript \
            and res.trace_hash == thash
        ok_hash = (hash_sparse(nw, res) == Status.success
                   and res.score_hash == oracle_hash_dense(mats["H"]))
        if ok_cost and ok_trace and ok_hash:
            print(f"PASS {spec_name}: cost={res.align_cost} "
                  f"trace_hash={res.trace_hash:#x} "
                  f"score_hash={res.score_hash:#x}")
        else:
            print(f"FAIL {spec_name}: cost_ok={ok_cost} "
                  f"trace_ok={ok_trace} hash_ok={ok_hash}")
            failures += 1

    if failures == 0:
        from ..ops.pallas_wavefront2 import set_tuned_flag

        path = set_tuned_flag("wrap_tpu_validated", True)
        print("\nAll four specs bit-exact on hardware with passBlocks=2.")
        print(f"Persisted wrap_tpu_validated=true in {path}; auto-KB now "
              "engages the wrap echelon on this device kind.")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
