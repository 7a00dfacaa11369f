"""Round-4 follow-up sweep, after the subProw merge (sweep_subprow_r4):

1. sw_ag recovery — the r4a sweep's best (K=4 rm+sp, 47.4) sits below
   the round-3 recorded 50.3; probe the K=5/6 packedef shapes subProw's
   freed registers may now admit, and noBc (SW-only bc-carry drop) which
   frees ONE more vreg on top.
2. noBc x subProw for sw_lg at K=6/7 (the spill cliff is one vreg wide,
   so each freed carry is worth a +1 K probe).
3. winW re-check at the new winners: pre-subprow, W was a non-lever
   (256/512/1024 -> 64.9/67.8/63.2 nw_lg); the per-window flush work and
   the roll budget both changed, so re-measure W=256/1024 at the tuned
   combo per spec.

Winners merge into resrc/tuned/<device_kind>.json ONLY when they beat
the recorded _gcups (sweep_subprow_r4 saved unconditionally, which is
right for a first sweep of a new lever but wrong for a refinement pass —
a slow window would clobber good defaults).

Usage:  python -m gpuseqalign_tpu.bench.sweep_r4b [spec ...]
"""

from __future__ import annotations

import json
import sys

import numpy as np

# Per spec: (winW list, combo list). The first combo is the current
# tuned config (control re-measure in the same window).
CANDS = {
    "sw_ag": ([512], [
        {"kChains": 4, "rematHdr": 1, "subProw": 1},   # r4a tuned
        {"kChains": 5, "subProw": 1},
        {"kChains": 5, "packedef": 1, "subProw": 1},
        {"kChains": 6, "packedef": 1, "subProw": 1},
        {"kChains": 4, "noBc": 1, "subProw": 1},
        {"kChains": 6, "packedef": 1, "noBc": 1, "subProw": 1},
    ]),
    "sw_lg": ([512], [
        {"kChains": 6, "subProw": 1},                  # r4a tuned
        {"kChains": 6, "noBc": 1, "subProw": 1},
        {"kChains": 7, "noBc": 1, "subProw": 1},
        {"kChains": 7, "subProw": 1},
    ]),
    "nw_ag": ([512], [
        {"kChains": 6, "packedx": 1, "packedef": 1, "subProw": 1},
        {"kChains": 6, "packedx": 1, "packedef": 1, "rematHdr": 1,
         "subProw": 1},
        {"kChains": 7, "packedx": 1, "packedef": 1, "subProw": 1},
    ]),
    # winW-only re-checks at the r4a winner.
    "nw_lg": ([256, 1024], [
        {"kChains": 6, "subProw": 1},
    ]),
}


def main(argv) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("sweep_r4b requires a real TPU", file=sys.stderr)
        return 1

    from ..core.types import AlignSpec
    from ..io.fasta import parse_seq_file
    from ..io.subst import parse_subst_file
    from ..ops.pallas_wavefront2 import tuned_cache
    from .autotune import save_defaults, tune_v2

    specs = argv[1:] or list(CANDS)
    subst_data = parse_subst_file("./resrc/subst.json")
    subst = subst_data.subst_map["blosum62"]
    seq_data = parse_seq_file("resrc/seq_generated.fa",
                              subst_data.letter_map)
    seq = seq_data.seq_map["len23728"].seq

    for spec_name in specs:
        winws, combos = CANDS[spec_name]
        spec = AlignSpec.from_name(spec_name)
        gape = -2 if spec.gap.value == "affine" else 0
        grid = {"tileBy": [2048], "tileBx": [2048], "winW": winws,
                "combos": combos}
        entry = tune_v2(subst, np.asarray(seq), spec, -11, gape,
                        grid=grid, verbose=True)
        have = float(tuned_cache().get(spec_name, {}).get("_gcups", 0.0))
        if entry["_gcups"] > have:
            path = save_defaults(entry, spec_name)
            print(f"{spec_name}: improved {have} -> {entry['_gcups']},"
                  f" wrote {path}", file=sys.stderr)
        else:
            print(f"{spec_name}: best candidate {entry['_gcups']} <= "
                  f"tuned {have}; keeping", file=sys.stderr)
        print(json.dumps({spec_name: entry}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
