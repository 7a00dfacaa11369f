"""Round-4c sweep: re-open R=1024 (SUB=8) under subProw.

Motivation (ROOFLINE.md §7.2, gridcost probe): the full kernel's
grid/window machinery is only ~8% of wall — the real waste is
geometric. At 23728², K=6, R=2048 the wrap echelon's one-time fill
((K-1)·OFF = 5·2560 columns) is ~19% of all chunks because there are
only BBtot=2 block-row groups, and the per-block-row skew drain adds
~10%. R=1024 halves OFF (1536) and doubles BBtot (4), shrinking the
fill share to ~8%; chain-cell utilization rises 0.68 → ~0.85.

The round-2 "R=1024 strictly worse (≤54)" negative predates subProw:
back then SUB=16 carries were 2 vregs each and K=7+ spilled. At SUB=8
every carry is ONE vreg and subProw has already removed the prow
carry, so K=8 (which R=1024 needs for body ILP — per-step work halves
with SUB) has ~2x the register headroom the round-2 sweep had.

Per spec: the current tuned config re-measures as the in-window
control, then the R=1024 candidates; the winner is saved only if it
beats the control by >2% in the same window (windows drift ±20%
between sessions — ROOFLINE.md §7).

Usage:  python -m gpuseqalign_tpu.bench.sweep_r4c [spec ...]
"""

from __future__ import annotations

import json
import sys

import numpy as np

# Per spec: list of (R, combos) groups; the FIRST group is the control
# (current tuned config at its own R).
CANDS = {
    "nw_lg": [
        (2048, [{"kChains": 6, "subProw": 1}]),
        (1024, [
            {"kChains": 6, "subProw": 1},
            {"kChains": 8, "subProw": 1},
            {"kChains": 8, "packedx": 1, "subProw": 1},
            {"kChains": 12, "subProw": 1},
        ]),
    ],
    "sw_lg": [
        (2048, [{"kChains": 7, "noBc": 1, "subProw": 1}]),
        (1024, [
            {"kChains": 8, "noBc": 1, "subProw": 1},
            {"kChains": 8, "subProw": 1},
            {"kChains": 12, "noBc": 1, "subProw": 1},
        ]),
    ],
    "nw_ag": [
        (2048, [{"kChains": 6, "packedx": 1, "packedef": 1,
                 "subProw": 1}]),
        (1024, [
            {"kChains": 6, "packedx": 1, "packedef": 1, "subProw": 1},
            {"kChains": 8, "packedx": 1, "packedef": 1, "subProw": 1},
            {"kChains": 8, "packedef": 1, "subProw": 1},
        ]),
    ],
    "sw_ag": [
        (2048, [{"kChains": 6, "packedef": 1, "noBc": 1, "subProw": 1}]),
        (1024, [
            {"kChains": 6, "packedef": 1, "noBc": 1, "subProw": 1},
            {"kChains": 8, "packedef": 1, "noBc": 1, "subProw": 1},
        ]),
    ],
}


def main(argv) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("sweep_r4c requires a real TPU", file=sys.stderr)
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
            print(f"{spec_name}: R={best['tileBy']} beats control "
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
