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


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    from ..io.fasta import parse_seq_file
    from ..io.params import parse_alg_params_file
    from ..io.subst import parse_subst_file

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--algParamPath", required=True)
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
    args = ap.parse_args(argv)

    subst_data = parse_subst_file(args.substPath)
    subst = subst_data.subst_map[args.substName]
    seq_data = parse_seq_file(args.seqPath, subst_data.letter_map)
    seqY = seq_data.seq_map[args.pair[0]].seq
    seqX = seq_data.seq_map[args.pair[1]].seq
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
