"""Hardware validation + tuning of the BANDED kernel's register levers.

The giant-pair engine's per-device kernel (ops/pallas_banded.py) gained
the full-matrix register levers in their banded forms (packedx /
packedef / halo-stripe remath). Interpret-mode parity is pinned by
tests/test_parallel.py::test_banded_v2_flags*, but real hardware differs
(register allocator, unmasked junk, un-clamped OOB) — this drive runs
the WHOLE giant engine (align_giant2, D=1 mesh on the real chip) at
production geometry for every candidate (K, flags) combo and spec:

  - full differential vs the dense CPU oracle: align_cost + sparse
    traceback transcript/hash + sparse score hash;
  - align.calc GCUPS from the engine's own stopwatch (the ~26 ms tunnel
    dispatch is noise against a multi-second 23728^2 fill).

The best PASSING combo per spec is written to the tuned cache as the
per-spec ``banded`` sub-entry; when every spec has a passing entry the
``banded_flags_tpu_validated`` flag is persisted, which lets
parallel/giant2._kernel_flags apply the entries by default on TPU.

Usage:  python -m gpuseqalign_tpu.bench.validate_banded_flags_tpu
"""

from __future__ import annotations

import sys

import numpy as np

SPECS = ("nw_lg", "sw_lg", "nw_ag", "sw_ag")


_FLAG_KEYS = ("kChains", "packedx", "packedef", "rematHdr",
              "subProw")


def _norm_cfg(cfg) -> dict:
    return {k: int(cfg.get(k, 0)) for k in _FLAG_KEYS}


def candidates(spec_name: str):
    base_k = 6 if spec_name.endswith("lg") else 4
    out = [dict(kChains=base_k)]  # the current production config
    if spec_name.endswith("lg"):
        out += [
            dict(kChains=6, packedx=1, rematHdr=1),
            dict(kChains=6, subProw=1),
        ]
    else:
        out += [
            dict(kChains=4, packedx=1, packedef=1, rematHdr=1),
            dict(kChains=6, packedx=1, packedef=1, rematHdr=1),
            dict(kChains=4, subProw=1),
            dict(kChains=6, packedx=1, packedef=1, subProw=1),
        ]
    return out


def main(argv) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("validate_banded_flags_tpu requires a real TPU backend",
              file=sys.stderr)
        return 1

    from ..core.types import (
        AlgInput, AlgParams, AlgResult, AlignSpec, Status,
    )
    from ..models.oracle import (
        align_cost_of, oracle_align_dense, oracle_hash_dense,
        oracle_trace_dense,
    )
    from ..ops.pallas_wavefront2 import set_tuned_flag
    from ..parallel.giant2 import align_giant2
    from ..parallel.mesh import make_mesh
    from ..trace.sparse import hash_sparse, trace_sparse
    from .autotune import save_defaults
    from ..ops.pallas_wavefront2 import tuned_cache

    rng = np.random.default_rng(23)
    subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
    mesh = make_mesh(axis_name="sp")  # D=1 on the real chip
    rows = cols = 23728
    y = np.zeros(1 + rows, np.int32)
    x = np.zeros(1 + cols, np.int32)
    y[1:] = rng.integers(0, 25, rows)
    x[1:] = rng.integers(0, 25, cols)

    all_ok = True
    for spec_name in SPECS:
        spec = AlignSpec.from_name(spec_name)
        gapo, gape = -11, (-2 if spec.gap.value == "affine" else 0)
        mats = oracle_align_dense(spec, subst, y, x, gapo, gape)
        want_cost = align_cost_of(spec, mats)
        transcript, thash, _ = oracle_trace_dense(
            spec, mats, subst, y, x, gapo, gape
        )
        want_shash = oracle_hash_dense(mats["H"])

        # Always validate the tuned cache's CURRENT banded config too
        # (giant_ab_tpu may have written one not in the fixed list).
        ent0 = dict(tuned_cache().get(spec_name, {}))
        old = ent0.get("banded") or {}
        old_cfg = _norm_cfg(old) if old else None
        cands = list(candidates(spec_name))
        if old_cfg is not None and all(
            _norm_cfg(c) != old_cfg for c in cands
        ):
            cands.insert(0, {k: v for k, v in old.items()
                             if not k.startswith("_")})

        best = None
        passing: list = []
        for cand in cands:
            nw = AlgInput()
            nw.subst = subst
            nw.substsz = subst.shape[0]
            nw.seqY, nw.seqX = y, x
            nw.adjrows, nw.adjcols = len(y), len(x)
            nw.gapo_cost, nw.gape_cost = gapo, gape
            nw.spec = spec
            res = AlgResult()
            # Explicit zeros for unset levers — otherwise _kernel_flags
            # fills them from the tuned banded entry and the candidates
            # are not what their tags claim.
            params = {"tileBy": [2048], "tileBx": [2048],
                      "packedx": [0], "packedef": [0], "rematHdr": [0],
                      "subProw": [0],
                      **{k: [v] for k, v in cand.items()}}
            tag = f"{spec_name} {cand}"
            try:
                stat = align_giant2(AlgParams(params), nw, res, mesh=mesh)
            except Exception as e:
                print(f"SKIP {tag}: {type(e).__name__}: {e}")
                continue
            ok = (stat == Status.success and res.align_cost == want_cost
                  and trace_sparse(nw, res, False) == Status.success
                  and res.edit_trace == transcript
                  and res.trace_hash == thash
                  and hash_sparse(nw, res) == Status.success
                  and res.score_hash == want_shash)
            if not ok:
                print(f"FAIL {tag}: stat={stat!r} cost={res.align_cost} "
                      f"(want {want_cost})")
                all_ok = False
                continue
            # Time a SECOND align run: the first call's align.calc lap
            # includes the Mosaic compile (~50 s through the tunnel);
            # the re-run hits the jit cache, and the multi-second fill
            # dwarfs the ~26 ms dispatch overhead.
            res2 = AlgResult()
            stat2 = align_giant2(AlgParams(params), nw, res2, mesh=mesh)
            if stat2 != Status.success or res2.align_cost != want_cost:
                print(f"FAIL {tag}: rerun stat={stat2!r}")
                all_ok = False
                continue
            calc_ms = res2.sw_align.get_or_default("align.calc")
            gcups = rows * cols / (calc_ms / 1e3) / 1e9
            print(f"PASS {tag}: oracle-exact, {gcups:.2f} GCUPS "
                  f"(align.calc {calc_ms:.1f} ms)")
            passing.append(cand)
            if best is None or gcups > best[1]:
                best = (cand, gcups)
        if best is None:
            print(f"{spec_name}: NO passing banded configuration")
            all_ok = False
            continue
        # A giant-regime (_at_rows) entry giant_ab_tpu wrote OWNS the
        # config choice: this drive runs at 23728^2 where per-pass
        # overheads distort the ranking (round 3's entries were
        # clobbered exactly this way). Keep it as long as its config
        # still passes the differential; only (re)write when the entry
        # is missing, non-giant, or its config failed.
        if old.get("_at_rows") and any(
            _norm_cfg(c) == old_cfg for c in passing
        ):
            print(f"{spec_name}: keeping giant-regime banded entry {old}")
            continue
        cand, gcups = best
        ent = dict(tuned_cache().get(spec_name, {}))
        ent["banded"] = {**cand, "_gcups": round(gcups, 3)}
        path = save_defaults(ent, spec_name)
        print(f"{spec_name}: banded default {ent['banded']} -> {path}")

    if not all_ok:
        print("FAILURES — banded_flags_tpu_validated NOT set")
        return 1
    path = set_tuned_flag("banded_flags_tpu_validated", True)
    print(f"ALL PASS — wrote banded_flags_tpu_validated into {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
