"""Round-4d sweep: finish what sweep_r4c's timeout cut off, plus the
K=12 follow-ups its nw_lg surprise suggests.

r4c found (in-window): nw_lg R=1024 K=12 subProw +12.2% over the R=2048
K=6 control — TWELVE chains fit at SUB=8 (every carry is one vreg) and
the body ILP beats the larger fill share. sw_lg settled at R=1024 K=8
noBc (K=12 loses — the bv carry scales with K). The affine R=1024 K=8
candidates and sw_ag never ran before the step timeout.

Usage:  python -m gpuseqalign_tpu.bench.sweep_r4d [spec ...]
"""

from __future__ import annotations

import json
import sys

import numpy as np

# (R, combos) groups per spec; first group = current tuned control.
CANDS = {
    "nw_ag": [
        (2048, [{"kChains": 6, "packedx": 1, "packedef": 1,
                 "subProw": 1}]),
        (1024, [
            {"kChains": 8, "packedx": 1, "packedef": 1, "subProw": 1},
            {"kChains": 8, "packedef": 1, "subProw": 1},
            {"kChains": 12, "packedx": 1, "packedef": 1, "subProw": 1},
        ]),
    ],
    "sw_ag": [
        (2048, [{"kChains": 6, "packedef": 1, "noBc": 1, "subProw": 1}]),
        (1024, [
            {"kChains": 6, "packedef": 1, "noBc": 1, "subProw": 1},
            {"kChains": 8, "packedef": 1, "noBc": 1, "subProw": 1},
        ]),
    ],
    # nw_lg follow-ups around the K=12 winner.
    "nw_lg": [
        (1024, [{"kChains": 12, "subProw": 1}]),           # control
        (1024, [{"kChains": 12, "packedx": 1, "subProw": 1}]),
        (512, [{"kChains": 12, "subProw": 1},
               {"kChains": 24, "subProw": 1}]),
    ],
}


def main(argv) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("sweep_r4d requires a real TPU", file=sys.stderr)
        return 1

    from ..core.types import AlignSpec
    from ..io.fasta import parse_seq_file
    from ..io.subst import parse_subst_file
    from .autotune import save_defaults, tune_v2

    specs = argv[1:] or list(CANDS)
    subst_data = parse_subst_file("./resrc/subst.json")
    subst = subst_data.subst_map["blosum62"]
    seq_data = parse_seq_file("resrc/seq_generated.fa",
                              subst_data.letter_map)
    seq = np.asarray(seq_data.seq_map["len23728"].seq)

    for spec_name in specs:
        spec = AlignSpec.from_name(spec_name)
        gape = -2 if spec.gap.value == "affine" else 0
        results = []
        for R, combos in CANDS[spec_name]:
            grid = {"tileBy": [R], "tileBx": [2048], "winW": [512],
                    "combos": combos}
            try:
                ent = tune_v2(subst, seq, spec, -11, gape,
                              grid=grid, verbose=True)
            except Exception as e:
                print(f"{spec_name} R={R}: {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            if ent:
                results.append(ent)
        if not results:
            print(f"{spec_name}: nothing ran", file=sys.stderr)
            continue
        control, best = results[0], max(results, key=lambda e: e["_gcups"])
        if (best is not control
                and best["_gcups"] > 1.02 * control["_gcups"]):
            path = save_defaults(best, spec_name)
            print(f"{spec_name}: beats control "
                  f"{control['_gcups']} -> {best['_gcups']}, wrote {path}",
                  file=sys.stderr)
        else:
            print(f"{spec_name}: control stands "
                  f"({control['_gcups']} vs best alt {best['_gcups']})",
                  file=sys.stderr)
        print(json.dumps({spec_name: {"control": control, "best": best}}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
