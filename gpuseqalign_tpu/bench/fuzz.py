"""Randomized differential fuzzer: every algorithm must agree bit-exactly.

The framework's whole correctness story is determinism-as-sanitizer
(SURVEY.md §4): all DP is int32, so every algorithm/variant must produce
the IDENTICAL align cost, edit transcript, trace hash, and score hash for
the same input. This tool hammers that invariant with seed-reproducible
random cases — random substitution matrices, gap costs, spec, degenerate
and awkward shapes, random tile parameters — and cross-checks the full
registry result surface the same way the benchmark driver's verification
map does (errstep 5). The defect classes it targets are exactly the ones
hand-written tests have historically missed here: guarded-domain gaps
(e.g. an affine kernel silently wrong outside gapo <= 0), border/header
cells, tile-boundary and padding interactions, and stored-header layout
bugs (the sparse hash reads kernel-stored tile headers, so a bad store
flips it).

Sizes and tile parameters are drawn from fixed ladders so XLA compiles
are reused across cases (random free sizes would compile a new program
per case — slow, and each XLA:CPU executable pins ~40 mmaps for the
process lifetime). The map guard from the test suite is replicated:
caches are dropped when /proc/self/maps nears vm.max_map_count.

Usage:
    python -m gpuseqalign_tpu.bench.fuzz [--seconds 300] [--cases 0]
        [--seed 0] [--algs a,b,...] [--includeGiant]

Exit 0 = no disagreements; 1 = at least one (each printed with its full
repro: seed + case index re-derive the exact input).
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

import numpy as np

# Size ladder: tiny/degenerate through medium. Fixed so compiles are
# shared across cases (pairs are drawn with replacement from this list).
SIZES = [0, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377]
TILES = [16, 32, 64, 128]
SPECS = ["nw_lg", "nw_ag", "sw_lg", "sw_ag"]

DEFAULT_ALGS = [
    "cpu1_st_row",
    "cpu2_st_diag",
    "cpu4_mt_diagrow",
    "tpu1_xla_diag",
    "tpu2_xla_rowscan",
    "tpu3_pallas_dense",
    "tpu7_pallas_mlsp",
]


def _case_rng(seed: int, case: int, stream: int = 0) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, stream, case]))


def _gen_case(seed: int, case: int) -> dict:
    rng = _case_rng(seed, case)
    substsz = int(rng.integers(2, 26))
    subst = rng.integers(-10, 13, (substsz, substsz)).astype(np.int32)
    spec = SPECS[int(rng.integers(0, len(SPECS)))]
    affine = spec.endswith("ag")
    gapo = int(rng.integers(-15, 0))  # <= -1
    gape = int(rng.integers(-4, 1)) if affine else 0  # <= 0
    rows = SIZES[int(rng.integers(0, len(SIZES)))]
    cols = SIZES[int(rng.integers(0, len(SIZES)))]

    def seq(n):
        s = np.zeros(1 + n, np.int32)
        if n:
            s[1:] = rng.integers(0, substsz, n)
        return s

    return {
        "subst": subst,
        "substsz": substsz,
        "spec": spec,
        "gapo": gapo,
        "gape": gape,
        "y": seq(rows),
        "x": seq(cols),
        "tileBy": TILES[int(rng.integers(0, len(TILES)))],
        "tileBx": TILES[int(rng.integers(0, len(TILES)))],
        "blocksz": TILES[int(rng.integers(0, len(TILES)))],
        # The giant (banded) engine needs 128-multiples; give it its own
        # draw so includeGiant runs real geometries instead of rejects.
        "giantBy": 128 * int(rng.integers(1, 3)),
        "giantBx": 128 * int(rng.integers(1, 3)),
        "giantK": int(rng.integers(1, 3)),
        # Banded register levers, drawn independently (packedef is
        # ignored by non-affine specs inside banded_pass).
        "giantFlags": {
            k: [1]
            for k in ("packedx", "packedef", "rematHdr")
            if int(rng.integers(0, 2))
        },
        # Full-matrix v2 register levers, drawn independently (flags a
        # spec can't run — packedef on linear, noBc on NW — are ignored
        # by align_mlsp_v2 itself).
        "v2Flags": {
            k: [1]
            for k in ("packedx", "packedef", "rematHdr", "noBc",
                      "subProw")
            if int(rng.integers(0, 2))
        },
    }


def _run_alg(alg, alg_name: str, case: dict):
    """Run align + hash + trace for one algorithm; returns the result
    tuple (cost, score_hash, transcript, trace_hash) or an error string."""
    from ..core.types import AlgInput, AlgParams, AlgResult, AlignSpec, Status

    nw = AlgInput()
    nw.subst = case["subst"]
    nw.substsz = case["substsz"]
    nw.seqY, nw.seqX = case["y"], case["x"]
    nw.adjrows, nw.adjcols = len(case["y"]), len(case["x"])
    nw.gapo_cost, nw.gape_cost = case["gapo"], case["gape"]
    nw.spec = AlignSpec.from_name(case["spec"])
    res = AlgResult()
    if alg_name == "tpu9_giant_mlsp":
        params = AlgParams({
            "tileBy": [case["giantBy"]],
            "tileBx": [case["giantBx"]],
            "kChains": [case["giantK"]],
            **case.get("giantFlags", {}),
        })
    else:
        params = AlgParams({
            "tileBy": [case["tileBy"]],
            "tileBx": [case["tileBx"]],
            "blocksz": [case["blocksz"]],
            **(case.get("v2Flags", {})
               if alg_name == "tpu7_pallas_mlsp" else {}),
        })
    try:
        stat = alg.align(params, nw, res)
        if stat != Status.success:
            return f"align {stat!r}"
        stat = alg.hash(nw, res)
        if stat != Status.success:
            return f"hash {stat!r}"
        stat = alg.trace(nw, res, False)
        if stat != Status.success:
            return f"trace {stat!r}"
    except Exception as e:  # noqa: BLE001 — a fuzzer records, not raises
        return f"raised {type(e).__name__}: {e}"
    return (res.align_cost, res.score_hash, res.edit_trace, res.trace_hash)


def _run_batch_case(seed: int, case: int) -> "str | None":
    """Fuzz the batch engine: a random bucket of pairs (degenerate shapes
    included) through align_pairs_batched, each cost checked against the
    dense CPU oracle. Returns an error string or None."""
    from ..core.types import AlignSpec
    from ..models.oracle import align_cost_of, oracle_align_dense
    from ..parallel.batch import align_pairs_batched

    rng = _case_rng(seed, case, stream=1)  # distinct from _gen_case
    substsz = int(rng.integers(2, 26))
    subst = rng.integers(-10, 13, (substsz, substsz)).astype(np.int32)
    spec = AlignSpec.from_name(SPECS[int(rng.integers(0, len(SPECS)))])
    gapo = int(rng.integers(-15, 0))
    gape = int(rng.integers(-4, 1)) if spec.gap.value == "affine" else 0
    n_pairs = int(rng.integers(1, 9))
    pairs = []
    for _ in range(n_pairs):
        r = SIZES[int(rng.integers(0, len(SIZES)))]
        c = SIZES[int(rng.integers(0, len(SIZES)))]
        y = np.zeros(1 + r, np.int32)
        if r:
            y[1:] = rng.integers(0, substsz, r)
        x = np.zeros(1 + c, np.int32)
        if c:
            x[1:] = rng.integers(0, substsz, c)
        pairs.append((y, x))
    quantum = "pow2" if rng.integers(0, 2) else 64
    try:
        out = align_pairs_batched(spec, subst, pairs, gapo, gape,
                                  quantum=quantum)
    except Exception as e:  # noqa: BLE001
        return f"batch raised {type(e).__name__}: {e}"
    for k, (y, x) in enumerate(pairs):
        want = align_cost_of(
            spec, oracle_align_dense(spec, subst, y, x, gapo, gape)
        )
        if int(out.costs[k]) != want:
            return (f"batch pair {k} ({len(y)-1}x{len(x)-1}, "
                    f"quantum={quantum}): {int(out.costs[k])} vs "
                    f"oracle {want}")
    return None


def _map_guard(threshold: int) -> None:
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n >= threshold:
        import jax

        jax.clear_caches()


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=float, default=300.0,
                    help="time budget (0 = unlimited, use --cases)")
    ap.add_argument("--cases", type=int, default=0,
                    help="case budget (0 = unlimited, use --seconds)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--algs", default=",".join(DEFAULT_ALGS))
    ap.add_argument("--includeGiant", action="store_true",
                    help="also run tpu9_giant_mlsp (interpret mode off-TPU"
                         " — much slower per new shape)")
    ap.add_argument("--devices", type=int, default=0,
                    help="virtual CPU device count (0 = default 1); "
                         ">= 2 makes --includeGiant fuzz a real "
                         "multi-band mesh (ICI halo dataflow)")
    ap.add_argument("--batchEvery", type=int, default=5,
                    help="every Nth case additionally fuzzes the batch "
                         "engine (align_pairs_batched vs the oracle; "
                         "0 = never)")
    args = ap.parse_args(argv)

    import jax

    try:
        # Pin BEFORE any backend query so a wedged axon plugin never
        # loads (the fuzzer is a CPU differential tool).
        jax.config.update("jax_platforms", "cpu")
        if args.devices:
            jax.config.update("jax_num_cpu_devices", args.devices)
    except Exception:
        pass

    # Persistent compilation cache, fingerprinted by host CPU flags like
    # tests/conftest.py (XLA:CPU AOT entries SIGILL across host
    # migrations): long fuzz runs are compile-dominated until warm.
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_gsa_tests")
    if cache_dir:
        import hashlib

        fp = "nofp"
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        fp = hashlib.sha1(line.encode()).hexdigest()[:10]
                        break
        except OSError:
            pass
        jax.config.update("jax_compilation_cache_dir", f"{cache_dir}_{fp}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ..core.registry import get_algorithm_map

    alg_map = get_algorithm_map()
    names = [a for a in args.algs.split(",") if a]
    if args.includeGiant and "tpu9_giant_mlsp" not in names:
        names.append("tpu9_giant_mlsp")
    unknown = [a for a in names if a not in alg_map]
    if unknown:
        ap.error(f"unknown algorithms: {unknown}")

    try:
        with open("/proc/sys/vm/max_map_count") as f:
            guard = max(10000, int(f.read()) - 12000)
    except (OSError, ValueError):
        guard = 50000

    deadline = time.time() + args.seconds if args.seconds else None
    n_fail = 0
    case = 0
    t0 = time.time()
    while True:
        if deadline and time.time() >= deadline:
            break
        if args.cases and case >= args.cases:
            break
        if args.batchEvery and case % args.batchEvery == 0:
            err = _run_batch_case(args.seed, case)
            if err:
                n_fail += 1
                print(f"FAIL case={case} seed={args.seed} (batch): {err}")
        c = _gen_case(args.seed, case)
        results = {}
        for name in names:
            results[name] = _run_alg(alg_map[name], name, c)
        base_name = names[0]
        base = results[base_name]
        if isinstance(base, str):
            n_fail += 1
            print(f"FAIL case={case} seed={args.seed} "
                  f"{c['spec']} {len(c['y'])-1}x{len(c['x'])-1} "
                  f"gapo={c['gapo']} gape={c['gape']} substsz={c['substsz']} "
                  f"tiles=({c['tileBy']},{c['tileBx']},{c['blocksz']}): "
                  f"baseline {base_name} -> {base}")
        else:
            for name in names[1:]:
                r = results[name]
                if r != base:
                    n_fail += 1
                    print(f"FAIL case={case} seed={args.seed} "
                          f"{c['spec']} {len(c['y'])-1}x{len(c['x'])-1} "
                          f"gapo={c['gapo']} gape={c['gape']} "
                          f"substsz={c['substsz']} "
                          f"tiles=({c['tileBy']},{c['tileBx']},"
                          f"{c['blocksz']}): {name} -> "
                          f"{r if isinstance(r, str) else 'mismatch'}")
                    if not isinstance(r, str):
                        for k, lab in enumerate(
                                ("cost", "score_hash", "transcript",
                                 "trace_hash")):
                            if r[k] != base[k]:
                                print(f"  {lab}: {name}={r[k]!r} "
                                      f"{base_name}={base[k]!r}")
        case += 1
        if case % 50 == 0:
            _map_guard(guard)
            rate = case / (time.time() - t0)
            print(f"[fuzz] {case} cases, {n_fail} failures, "
                  f"{rate:.1f} cases/s", flush=True)

    print(f"[fuzz] DONE: {case} cases, {n_fail} failures "
          f"in {time.time() - t0:.0f}s (seed {args.seed})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
