"""Hardware validation of the TUNED kernel-flag configurations.

Generalizes validate_packedx_tpu: for every spec, reads the tuned cache
entry (kChains + packedx/packedef/rematHdr — whatever the autotuner
persisted) and validates exactly that production configuration on the
real chip, where Mosaic's register allocator and the unmasked dead-lane
junk differ from interpret mode:

1. Kernel differential at the tuned geometry on the wrap (continuous
   echelon) grid — every CONSUMED output slot bit-equal to the base
   (no-flags) kernel at the same K. (Unmasked fill/drain junk slots
   legitimately differ; see validate_packedx_tpu's docstring.)
2. End-to-end vs the dense CPU oracle THROUGH align_mlsp_v2 with the
   tuned params at a size that forces the multi-pass echelon grid and
   two block groups: align_cost + sparse traceback transcript/hash +
   sparse score hash.

On success persists the `flags_tpu_validated` flag into
resrc/tuned/<device_kind>.json.

Usage:  python -m gpuseqalign_tpu.bench.validate_flags_tpu
"""

from __future__ import annotations

import sys

import numpy as np

SPECS = ("nw_lg", "sw_lg", "nw_ag", "sw_ag")


def main(argv) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("validate_flags_tpu requires a real TPU backend",
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
    import math

    from ..ops.pallas_wavefront2 import (
        K_MAX_DEFAULT, align_mlsp_v2, pallas_mlsp_v2, set_tuned_flag,
        tuned_defaults, wrap_ok,
    )
    from ..trace.sparse import hash_sparse, trace_sparse

    rng = np.random.default_rng(11)
    subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
    failures = 0

    def consumed_equal(base, new, *, trows, tcols, R, width):
        """Compare only the slots align_mlsp_v2 consumes."""
        bad = []
        for kk in base:
            if kk not in new:
                continue  # nobc drops the bc output (host recovery)
            b = np.asarray(base[kk])
            p = np.asarray(new[kk])
            if kk in ("hrow", "frow"):
                j0 = 1 if kk == "frow" else 0  # frow[:,0] overwritten
                b, p = b[:, j0:width], p[:, j0:width]
            elif kk in ("hcol", "ecol"):
                b = b.reshape(b.shape[0], -1, R)[:trows, 1:tcols]
                p = p.reshape(p.shape[0], -1, R)[:trows, 1:tcols]
            if not np.array_equal(b, p):
                bad.append(kk)
        return bad

    for spec_name in SPECS:
        spec = AlignSpec.from_name(spec_name)
        kind, gap = spec.kind.value, spec.gap.value
        ent = tuned_defaults(kind, gap, allow_packedx=True)
        K = int(ent["kChains"])
        R = int(ent.get("tileBy", 2048))
        TW = int(ent.get("tileBx", 2048))
        W = int(ent.get("winW", 0) or min(512, TW))
        flags = dict(
            packedx=bool(ent.get("packedx", 0)),
            packedef=bool(ent.get("packedef", 0)) and gap == "affine",
            remath=bool(ent.get("rematHdr", 0)),
            nobc=bool(ent.get("noBc", 0)) and kind == "sw",
            subprow=bool(ent.get("subProw", 0)),
        )
        gapo, gape = -11, (-2 if gap == "affine" else 0)
        tag = (f"{spec_name} K={K} px={int(flags['packedx'])} "
               f"pe={int(flags['packedef'])} rm={int(flags['remath'])} "
               f"nb={int(flags['nobc'])} sp={int(flags['subprow'])}")
        if not any(flags.values()):
            print(f"SKIP {tag}: no flags in the tuned entry")
            continue

        # --- 1) kernel differential on the wrap grid, two block groups.
        # The base (no-flags) kernel may not COMPILE at the tuned K —
        # raising K_max is packedef's whole point — so it runs at its
        # own K_max. Consumed output slots are K-independent (the flags
        # and the chain count only change scheduling and junk slots).
        Kb = min(K, K_MAX_DEFAULT[(kind, gap)])
        lcm = K * Kb // math.gcd(K, Kb)
        rows, cols = 2 * lcm * R, 24576
        assert wrap_ok(R=R, W=W, K=K, band_cols=cols)
        y = np.zeros(1 + rows, np.int32)
        x = np.zeros(1 + cols, np.int32)
        y[1:] = rng.integers(0, 25, rows)
        x[1:] = rng.integers(0, 25, cols)
        args = (jnp.asarray(subst), jnp.asarray(y), jnp.asarray(x),
                jnp.int32(gapo), jnp.int32(gape),
                jnp.int32(1 + rows), jnp.int32(1 + cols))
        kw = dict(R=R, W=W, TW=TW, kind=kind, gap=gap)
        base = jax.device_get(pallas_mlsp_v2(*args, K=Kb, **kw))
        new = jax.device_get(pallas_mlsp_v2(*args, K=K, **flags, **kw))
        bad = consumed_equal(base, new, trows=rows // R,
                             tcols=cols // TW, R=R, width=cols + 1)
        if bad:
            failures += 1
            print(f"FAIL kernel-diff {tag} {rows}x{cols} [wrap]: "
                  f"consumed slots differ: {bad}")
        else:
            print(f"PASS kernel-diff {tag} {rows}x{cols} [wrap]")

        # --- 2) end-to-end vs the CPU oracle (echelon grid) ---
        rows, cols = 2 * K * R, 4000
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
        stat = align_mlsp_v2(
            AlgParams({
                "kChains": [K], "winW": [W],
                "packedx": [int(flags["packedx"])],
                "packedef": [int(flags["packedef"])],
                "rematHdr": [int(flags["remath"])],
                "noBc": [int(flags["nobc"])],
                "subProw": [int(flags["subprow"])],
            }),
            nw, res, R, TW, -(-rows // R), -(-cols // TW),
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
            print(f"PASS e2e {tag} {rows}x{cols}: cost + trace + hashes "
                  "match the oracle")
        else:
            failures += 1
            print(f"FAIL e2e {tag} {rows}x{cols}: stat={stat!r} "
                  f"cost={res.align_cost}")

    if failures:
        print(f"{failures} FAILURES — do NOT ship these tuned defaults")
        return 1
    path = set_tuned_flag("flags_tpu_validated", True)
    print(f"ALL PASS — wrote flags_tpu_validated into {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
