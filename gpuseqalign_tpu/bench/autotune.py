"""Parameter autotuner — the reference's param_optimize workflow
(ref: README.md:114-115: run the full parameter grid per algorithm on a
5000x5000 pair and keep the best) as a first-class utility instead of a
manual TSV inspection.

Usage:
    python -m gpuseqalign_tpu.bench.autotune \
        --algParamPath resrc/param_optimize.json \
        --seqPath resrc/seq_generated.fa --pair len5000 len5000 \
        --out logs/param_tuned.json

Every parameter combination is timed on the align.calc lap (median of
--samples runs after one warmup) and verified against the first
algorithm's result; the output JSON has the same shape as
resrc/param_best.json (single-value lists), so it can be fed back to the
CLI unchanged.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, List, Optional

import numpy as np

from ..core.registry import get_algorithm_map
from ..core.types import AlgInput, AlgParams, AlgResult, AlignSpec, Status


def tune(
    alg_params: Dict[str, Dict[str, List[int]]],
    subst: np.ndarray,
    seqY: np.ndarray,
    seqX: np.ndarray,
    gapo: int,
    gape: int = 0,
    spec: Optional[AlignSpec] = None,
    samples: int = 3,
    verbose: bool = False,
) -> Dict[str, Dict[str, List[int]]]:
    """Returns {alg_name: {param: [best_value]}} (+ measured GCUPS under
    the key "_gcups"). The first algorithm sets the expected align_cost;
    combinations that fail or mismatch are skipped."""
    alg_map = get_algorithm_map()
    spec = spec or AlignSpec()

    nw = AlgInput()
    nw.subst = subst
    nw.substsz = subst.shape[0]
    nw.seqY, nw.seqX = seqY, seqX
    nw.adjrows, nw.adjcols = len(seqY), len(seqX)
    nw.gapo_cost, nw.gape_cost = gapo, gape
    nw.spec = spec
    cells = (nw.adjrows - 1) * (nw.adjcols - 1)

    expected_cost = None
    best: Dict[str, Dict[str, List[int]]] = {}
    for name, grid in alg_params.items():
        alg = alg_map[name]
        params = AlgParams(grid)
        best_t = None
        best_combo = None
        while params.has_curr():
            combo = params.copy_current()
            ts = []
            ok = True
            for rep in range(1 + samples):  # first is warmup
                nw.reset_cycle()
                res = AlgResult()
                try:
                    stat = alg.align(params, nw, res)
                except Exception:
                    stat = Status.errorKernelFailure
                if stat != Status.success:
                    ok = False
                    break
                if expected_cost is None:
                    expected_cost = res.align_cost
                elif res.align_cost != expected_cost:
                    ok = False
                    break
                if rep:
                    ts.append(
                        res.sw_align.get_or_default("align.calc") / 1e3
                    )
            if ok and ts:
                t = float(np.median(ts))
                if verbose:
                    print(
                        f"  {name} {combo}: {cells / t / 1e9:.2f} GCUPS",
                        file=sys.stderr,
                    )
                if best_t is None or t < best_t:
                    best_t, best_combo = t, combo
            params.next()
        if best_combo is not None:
            entry = {k: [v] for k, v in best_combo.items()}
            entry["_gcups"] = [round(cells / best_t / 1e9, 3)]
            best[name] = entry
        elif verbose:
            print(f"  {name}: no valid combination", file=sys.stderr)
    return best


DEFAULT_V2_GRID = {
    # (R, TW, K) candidates for the flagship v2 kernel; W = min(512, TW).
    # Measured cliffs on v5e (wrap echelon, 2026-08): K=7+ collapses on
    # register spills (~13 GCUPS) or fails compile; affine fits K=4
    # (K=5 fails); R=1024 variants are strictly worse. R=4096 is also
    # closed (2026-08-18 sweep, logs/sweep_r4096.log): SUB=32 doubles
    # every per-chain carry to 4 vregs, so nw_lg K_max drops to 4
    # (57.0 GCUPS < 67.8 at R=2048 K=6; K=5 spills to 15, K=6 fails
    # compile) and affine has no valid combination at all.
    "tileBy": [2048],
    "tileBx": [2048],
    "kChains": [3, 4, 5, 6],
    # packedx (shared byte-packed xd streams) is a REGISTER lever, not an
    # issue-slot lever (fullstep probe: slower at K<=6 linear, unlocks
    # K=7/8 past the spill cliff) — so it sweeps its own, higher K range.
    "packedx": [0, 1],
    "kChainsPacked": [5, 6, 7, 8],
    # Round-3 flag combos (see ROOFLINE.md agenda #3): remath for the
    # linear specs, packedef(+remath) for affine (raises affine K_max to
    # 6). Kept in the default grid so an autotune refresh can only
    # REPLACE the tuned defaults with configurations at least as good.
    "combos_extra": [
        {"kChains": 6, "packedx": 1, "rematHdr": 1},
        {"kChains": 4, "packedx": 1, "rematHdr": 1},
        {"kChains": 6, "packedx": 1, "packedef": 1},
        {"kChains": 6, "packedx": 1, "packedef": 1, "rematHdr": 1},
        {"kChains": 4, "packedx": 1, "packedef": 1, "rematHdr": 1},
        # noBc (SW only — skipped for NW specs): drop the bc carry
        # (value-only argmax, host column recovery); frees one
        # (SUB,128) vreg/chain past the one-vreg-wide spill cliff and
        # two selects/step, so it sweeps K one past each base K_max.
        {"kChains": 6, "packedx": 1, "rematHdr": 1, "noBc": 1},
        {"kChains": 7, "packedx": 1, "rematHdr": 1, "noBc": 1},
        {"kChains": 4, "packedx": 1, "packedef": 1, "rematHdr": 1,
         "noBc": 1},
        {"kChains": 6, "packedx": 1, "packedef": 1, "rematHdr": 1,
         "noBc": 1},
        {"kChains": 5, "packedx": 1, "packedef": 1, "rematHdr": 1,
         "noBc": 1},
        # subProw (ROADMAP lever #4): per-step bottom-sublane scratch
        # store + per-window strided-roll rebuild instead of the per-step
        # prow lane roll — a roll-port lever (128 -> 128/SUB lane rolls
        # per window per chain, x2 for affine's prowF) AND a register
        # lever (frees the prow/prowF carries), so it also sweeps K one
        # past the base K_max.
        {"kChains": 6, "subProw": 1},
        {"kChains": 6, "packedx": 1, "subProw": 1},
        {"kChains": 7, "packedx": 1, "subProw": 1},
        {"kChains": 6, "packedx": 1, "rematHdr": 1, "subProw": 1},
        {"kChains": 6, "packedx": 1, "packedef": 1, "subProw": 1},
        {"kChains": 7, "packedx": 1, "packedef": 1, "subProw": 1},
        {"kChains": 4, "packedx": 1, "rematHdr": 1, "subProw": 1},
        {"kChains": 6, "packedx": 1, "rematHdr": 1, "noBc": 1,
         "subProw": 1},
        # Round 5: subProw frees the registers packedx/packedef existed
        # to free, so the PLAIN K=6 subProw shapes compile for every
        # spec and WON the nw_ag head-to-head by +51%
        # (measurements/sweep_r5b_nwag.log; the bare kChains=6 subProw
        # combo above covers the linear/affine plain shape) — keep the
        # plain noBc form for the SW specs too.
        {"kChains": 6, "noBc": 1, "subProw": 1},
        {"kChains": 4, "subProw": 1},
    ],
}


def tune_v2(
    subst: np.ndarray,
    seq: np.ndarray,
    spec: AlignSpec,
    gapo: int,
    gape: int,
    grid: Optional[Dict[str, List[int]]] = None,
    m_iters: int = 4,
    verbose: bool = False,
) -> Dict[str, int]:
    """Tune the v2 Pallas kernel with EXACT device timing.

    Unlike tune() (align.calc laps, which on a tunneled TPU include the
    ~26 ms dispatch overhead), each combination here runs m_iters times
    inside one jitted lax.scan with a data-dependent carry and is scored
    by (T(1+m) - T(1)) / m — the bench.py recipe. Every combination is
    first gated on align_cost parity vs the CPU oracle on a
    (2*K*R) x 2048 problem — two full groups of row blocks, so the
    echelon cross-chain dataflow runs at the candidate's actual K.
    Returns {"tileBy", "tileBx", "kChains", "_gcups", flag keys}.
    """
    import functools
    import jax
    import jax.numpy as jnp

    from ..models.cpu_algs import align_cpu1_st_row
    from ..ops.pallas_wavefront2 import align_mlsp_v2, pallas_mlsp_v2

    n = len(seq) - 1
    kind, gap = spec.kind.value, spec.gap.value

    # Oracle gate problems, keyed by (rows, cols). The gate problem must
    # span at least TWO groups of K row blocks — a single-row-block
    # problem silently degrades to K=1 (choose_k) and once let a
    # multi-chain bug through a whole sweep (round 3, packedef byte
    # pollution). Cols stay small; the echelon grid + cross-chain
    # dataflow is what needs exercising.
    _rng = np.random.default_rng(12345)
    oracle_cache: Dict = {}

    def gate_problem(gr: int, gc: int):
        key = (gr, gc)
        if key not in oracle_cache:
            y = np.zeros(1 + gr, np.int32)
            x = np.zeros(1 + gc, np.int32)
            sz = subst.shape[0]
            y[1:] = _rng.integers(0, sz, gr)
            x[1:] = _rng.integers(0, sz, gc)
            nwo = AlgInput()
            nwo.subst = subst
            nwo.substsz = sz
            nwo.seqY, nwo.seqX = y, x
            nwo.adjrows, nwo.adjcols = 1 + gr, 1 + gc
            nwo.gapo_cost, nwo.gape_cost = gapo, gape
            nwo.spec = spec
            reso = AlgResult()
            if align_cpu1_st_row(AlgParams({}), nwo, reso) != Status.success:
                raise RuntimeError("oracle failed")
            oracle_cache[key] = (y, x, reso.align_cost)
        return oracle_cache[key]

    grid = dict(grid or DEFAULT_V2_GRID)
    best = None
    for R in grid.get("tileBy", [2048]):
      for TW in grid.get("tileBx", [2048]):
        for W in grid.get("winW", [512]):
            if TW < R or R % 128 or TW % 128:
                continue
            if W % 128 or TW % W:
                continue
            B = -(-n // R)
            # (packedx, packedef, rematHdr, kChains) combinations: either
            # the explicit grid["combos"] list of dicts, or the legacy
            # kChains/packedx/kChainsPacked keys.
            if "combos" in grid:
                combos = [
                    (int(c.get("packedx", 0)), int(c.get("packedef", 0)),
                     int(c.get("rematHdr", 0)), int(c.get("noBc", 0)),
                     int(c.get("subProw", 0)), int(c["kChains"]))
                    for c in grid["combos"]
                ]
            else:
                combos = (
                    [(0, 0, 0, 0, 0, k) for k in grid.get("kChains", [4])]
                    + [(1, 0, 0, 0, 0, k)
                       for k in (grid.get("kChainsPacked", [])
                                 if 1 in grid.get("packedx", [0])
                                 else [])]
                    + [(int(c.get("packedx", 0)),
                        int(c.get("packedef", 0)),
                        int(c.get("rematHdr", 0)),
                        int(c.get("noBc", 0)),
                        int(c.get("subProw", 0)), int(c["kChains"]))
                       for c in grid.get("combos_extra", [])]
                )
            for px, pe, rm, nb, sp, K in combos:
                if pe and gap != "affine":
                    continue
                if nb and kind != "sw":
                    continue
                B_p = -(-B // K) * K
                rows_p = B_p * R
                cols_p = -(-n // TW) * TW
                y = np.zeros(1 + rows_p, np.int32)
                y[: len(seq)] = seq
                x = np.zeros(1 + cols_p, np.int32)
                x[: len(seq)] = seq
                subst_d = jnp.asarray(subst)
                y_d = jnp.asarray(y)
                x_d = jnp.asarray(x)

                @functools.partial(jax.jit, static_argnames=("m",))
                def loop(subst_j, yj, xj, g0, *, m, R=R, W=W, TW=TW, K=K,
                         px=px, pe=pe, rm=rm, nb=nb, sp=sp):
                    def body(carry, _):
                        # True dependency via X's never-read header
                        # element (a 0*carry pseudo-dependency can be
                        # constant-folded, collapsing the scan).
                        xj2 = xj.at[0].set(carry)
                        out = pallas_mlsp_v2(
                            subst_j, yj, xj2, g0, jnp.int32(gape),
                            jnp.int32(n + 1), jnp.int32(n + 1),
                            R=R, W=W, TW=TW, K=K, kind=kind, gap=gap,
                            packedx=bool(px), packedef=bool(pe),
                            remath=bool(rm), nobc=bool(nb),
                            subprow=bool(sp),
                        )
                        return out["hrow"][0, 0], None

                    c, _ = jax.lax.scan(body, jnp.int32(0), None, length=m)
                    return c

                def t_of(m):
                    out = loop(subst_d, y_d, x_d, jnp.int32(gapo), m=m)
                    _ = np.asarray(jax.device_get(out))
                    ts = []
                    for _i in range(3):
                        t0 = time.time()
                        out = loop(subst_d, y_d, x_d, jnp.int32(gapo), m=m)
                        _ = np.asarray(jax.device_get(out))
                        ts.append(time.time() - t0)
                    return float(np.min(ts))

                tag = (f"R={R} TW={TW} W={W} K={K} px={px} pe={pe} "
                       f"rm={rm} nb={nb} sp={sp}")
                try:
                    # Correctness gate: 2*K row blocks so the echelon
                    # cross-chain dataflow actually runs at this K.
                    gr, gc = 2 * K * R, min(n, 2048)
                    gy, gx, want = gate_problem(gr, gc)
                    nwc = AlgInput()
                    nwc.subst = subst
                    nwc.substsz = subst.shape[0]
                    nwc.seqY, nwc.seqX = gy, gx
                    nwc.adjrows, nwc.adjcols = 1 + gr, 1 + gc
                    nwc.gapo_cost, nwc.gape_cost = gapo, gape
                    nwc.spec = spec
                    resc = AlgResult()
                    stat = align_mlsp_v2(
                        AlgParams({"tileBy": [R], "tileBx": [TW],
                                   "kChains": [K], "winW": [W],
                                   "packedx": [px], "packedef": [pe],
                                   "rematHdr": [rm], "noBc": [nb],
                                   "subProw": [sp]}),
                        nwc, resc, R, TW, gr // R, -(-gc // TW),
                    )
                    if stat != Status.success or resc.align_cost != want:
                        if verbose:
                            print(f"  {tag}: GATE FAIL", file=sys.stderr)
                        continue
                    t = (t_of(1 + m_iters) - t_of(1)) / m_iters
                except Exception as e:
                    if verbose:
                        print(f"  {tag}: {type(e).__name__}",
                              file=sys.stderr)
                    continue
                g = n * n / t / 1e9
                if verbose:
                    print(f"  {tag}: {g:.2f} GCUPS", file=sys.stderr)
                if best is None or g > best["_gcups"]:
                    best = {"tileBy": R, "tileBx": TW, "kChains": K,
                            "winW": W, "packedx": px, "packedef": pe,
                            "rematHdr": rm, "noBc": nb, "subProw": sp,
                            "_gcups": round(g, 3)}
    if best is None:
        raise RuntimeError("no valid v2 combination")
    return best


def save_defaults(entry: Dict[str, int], spec_name: str) -> str:
    """Merge a tuned entry into resrc/tuned/<device_kind>.json — the
    cache ops/pallas_wavefront2.tuned_defaults reads."""
    import jax

    dk = jax.devices()[0].device_kind.lower().replace(" ", "_")
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "..", "resrc", "tuned",
        f"{dk}.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = {}
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            data = json.load(f)
    # MERGE into the existing spec entry instead of replacing it: the
    # full-matrix autotuner must not wipe sub-entries other tools own
    # (giant_ab_tpu's giant-regime ``banded`` sub-dict was lost exactly
    # this way at the end of round 3).
    data[spec_name] = {**data.get(spec_name, {}), **entry}
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2, sort_keys=True)
        f.write("\n")
    return path


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    from ..io.fasta import parse_seq_file
    from ..io.params import parse_alg_params_file
    from ..io.subst import parse_subst_file

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--algParamPath", default="")
    ap.add_argument("--seqPath", required=True)
    ap.add_argument("--substPath", default="./resrc/subst.json")
    ap.add_argument("--substName", default="blosum62")
    ap.add_argument("--pair", nargs=2, required=True,
                    metavar=("SEQY_ID", "SEQX_ID"))
    ap.add_argument("--gapoCost", type=int, default=-11)
    ap.add_argument("--gapeCost", type=int, default=0)
    ap.add_argument("--algKind", default="nw_lg")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--save-defaults", action="store_true",
        help="tune the v2 Pallas kernel with exact in-jit device timing "
             "and write resrc/tuned/<device_kind>.json (the cache "
             "tuned_defaults() reads); --algParamPath is then optional",
    )
    args = ap.parse_args(argv)

    subst_data = parse_subst_file(args.substPath)
    subst = subst_data.subst_map[args.substName]
    seq_data = parse_seq_file(args.seqPath, subst_data.letter_map)
    seqY = seq_data.seq_map[args.pair[0]].seq
    seqX = seq_data.seq_map[args.pair[1]].seq

    if args.save_defaults:
        spec = AlignSpec.from_name(args.algKind)
        t0 = time.time()
        entry = tune_v2(
            subst, seqY, spec, args.gapoCost, args.gapeCost, verbose=True,
        )
        path = save_defaults(entry, spec.name)
        print(json.dumps({spec.name: entry}))
        print(f"wrote {path} in {time.time() - t0:.1f}s", file=sys.stderr)
        return 0

    if not args.algParamPath:
        ap.error("--algParamPath is required without --save-defaults")
    grids = parse_alg_params_file(args.algParamPath)

    t0 = time.time()
    out = tune(
        grids, subst, seqY, seqX, args.gapoCost, args.gapeCost,
        spec=AlignSpec.from_name(args.algKind), samples=args.samples,
        verbose=True,
    )
    text = json.dumps(out, indent=2)
    if args.out:
        import os

        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(text + "\n")
    print(text)
    print(f"tuned in {time.time() - t0:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
