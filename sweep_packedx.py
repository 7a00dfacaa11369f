"""One-off on-chip sweep: packedx production-kernel GCUPS at 23728^2.

For each spec, time pallas_mlsp_v2 with packedx=1 at the K candidates the
fullstep probe suggested, using tune_v2's exact in-jit timing + oracle
gate; merge into resrc/tuned/<device_kind>.json only when the packed
entry beats the cached base _gcups.
"""
import json
import sys
import time

import numpy as np

from gpuseqalign_tpu.bench.autotune import tune_v2, save_defaults
from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.io.fasta import parse_seq_file
from gpuseqalign_tpu.io.subst import parse_subst_file
from gpuseqalign_tpu.ops.pallas_wavefront2 import tuned_cache

SWEEP = {
    # spec: (gapo, gape, packed K candidates)
    "nw_lg": (-11, 0, [6, 7, 8]),
    "sw_lg": (-11, 0, [4, 5, 6]),
    "nw_ag": (-11, -2, [4, 5, 6]),
    "sw_ag": (-11, -2, [4, 5, 6]),
}


def main():
    sd = parse_subst_file("resrc/subst.json")
    subst = sd.subst_map["blosum62"]
    seqd = parse_seq_file("resrc/seq_generated.fa", sd.letter_map)
    seq = seqd.seq_map["len23728"].seq

    results = {}
    for name, (gapo, gape, ks) in SWEEP.items():
        spec = AlignSpec.from_name(name)
        t0 = time.time()
        grid = {"tileBy": [2048], "tileBx": [2048], "kChains": [],
                "packedx": [1], "kChainsPacked": ks}
        try:
            ent = tune_v2(subst, seq, spec, gapo, gape, grid=grid,
                          verbose=True)
        except Exception as e:
            print(f"{name}: sweep failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        cached = tuned_cache().get(name, {})
        base_g = float(cached.get("_gcups", [0])[0]
                       if isinstance(cached.get("_gcups"), list)
                       else cached.get("_gcups", 0))
        print(f"{name}: packed best {ent} vs cached {base_g} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)
        results[name] = {"packed": ent, "cached_gcups": base_g}
        if ent["_gcups"] > base_g:
            path = save_defaults(ent, name)
            print(f"{name}: NEW DEFAULT -> {path}", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
