"""Round-4 targeted sweep: the subProw lever vs the round-3 tuned
configs, all four specs, at the bench regime (23728^2, R=TW=2048).

The fullstep probe (logs: /tmp/probe_b.log, checked into ROOFLINE.md)
measured the subprow step BODY at 183.9 GCUPS vs 130.5 base at K=6 —
+41% from replacing the per-step bottom-row lane roll + select with a
static scratch store and a per-window strided-roll rebuild. This sweep
answers what that buys the PRODUCTION kernel, oracle-gated per combo
(tune_v2), and merges winners into resrc/tuned/<device_kind>.json.

Usage:  python -m gpuseqalign_tpu.bench.sweep_subprow_r4 [spec ...]
"""

from __future__ import annotations

import json
import sys

import numpy as np

CANDS = {
    # Each list: the current tuned config first (re-measured as the
    # control), then the subProw shapes worth trying. The probe says
    # subprow+packedx loses to subprow alone at K=6 (extract ALU cost
    # once registers stop binding), so px+sp appears only where sp
    # frees the register that px was needed for.
    "nw_lg": [
        {"kChains": 6, "packedx": 1},                  # round-3 tuned
        {"kChains": 6, "subProw": 1},
        {"kChains": 6, "rematHdr": 1, "subProw": 1},
        {"kChains": 7, "packedx": 1, "subProw": 1},
    ],
    "sw_lg": [
        {"kChains": 4},                                # round-3 tuned
        {"kChains": 4, "subProw": 1},
        {"kChains": 6, "subProw": 1},
        {"kChains": 6, "packedx": 1, "rematHdr": 1, "subProw": 1},
    ],
    "nw_ag": [
        {"kChains": 6, "packedx": 1, "packedef": 1},   # round-3 tuned
        {"kChains": 4, "subProw": 1},
        {"kChains": 6, "packedef": 1, "subProw": 1},
        {"kChains": 6, "packedx": 1, "packedef": 1, "subProw": 1},
    ],
    "sw_ag": [
        {"kChains": 4, "packedx": 1, "rematHdr": 1},   # round-3 tuned
        {"kChains": 4, "subProw": 1},
        {"kChains": 4, "rematHdr": 1, "subProw": 1},
        {"kChains": 6, "packedx": 1, "packedef": 1, "subProw": 1},
    ],
}


def main(argv) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("sweep_subprow_r4 requires a real TPU", file=sys.stderr)
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
    seq = seq_data.seq_map["len23728"].seq

    for spec_name in specs:
        spec = AlignSpec.from_name(spec_name)
        gape = -2 if spec.gap.value == "affine" else 0
        grid = {"tileBy": [2048], "tileBx": [2048],
                "combos": CANDS[spec_name]}
        entry = tune_v2(subst, np.asarray(seq), spec, -11, gape,
                        grid=grid, verbose=True)
        path = save_defaults(entry, spec_name)
        print(json.dumps({spec_name: entry}))
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
