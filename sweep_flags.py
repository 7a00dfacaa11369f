"""On-chip sweep: remath/packedef register levers at 23728^2.

For each spec, time pallas_mlsp_v2 over explicit flag combos with
tune_v2's exact in-jit timing + oracle gate; merge into
resrc/tuned/<device_kind>.json only when an entry beats the cached
_gcups.
"""
import json
import sys
import time

from gpuseqalign_tpu.bench.autotune import tune_v2, save_defaults
from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.io.fasta import parse_seq_file
from gpuseqalign_tpu.io.subst import parse_subst_file
from gpuseqalign_tpu.ops.pallas_wavefront2 import tuned_cache


def combos_for(name):
    if name.endswith("_lg"):
        # remath frees the 4 hoisted header vregs/chain: probe whether
        # K=7/8 (packedx) stop spilling, and whether K=6 gets faster.
        out = [dict(kChains=k, packedx=px, rematHdr=1)
               for k in (6, 7, 8) for px in (0, 1)]
    else:
        # affine: packedef (packed E/F deltas) + remath raise K_max.
        out = [dict(kChains=k, packedx=px, packedef=1, rematHdr=rm)
               for k in (4, 5, 6) for px in (0, 1) for rm in (0, 1)]
        out += [dict(kChains=k, packedx=1, packedef=0, rematHdr=1)
                for k in (4, 5)]
    return out


SWEEP = {
    "nw_lg": (-11, 0),
    "sw_lg": (-11, 0),
    "nw_ag": (-11, -2),
    "sw_ag": (-11, -2),
}


def main():
    order = sys.argv[1:] or list(SWEEP)
    sd = parse_subst_file("resrc/subst.json")
    subst = sd.subst_map["blosum62"]
    seqd = parse_seq_file("resrc/seq_generated.fa", sd.letter_map)
    seq = seqd.seq_map["len23728"].seq

    results = {}
    for name in order:
        gapo, gape = SWEEP[name]
        spec = AlignSpec.from_name(name)
        t0 = time.time()
        grid = {"tileBy": [2048], "tileBx": [2048],
                "combos": combos_for(name)}
        try:
            ent = tune_v2(subst, seq, spec, gapo, gape, grid=grid,
                          verbose=True)
        except Exception as e:
            print(f"{name}: sweep failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        cached = tuned_cache().get(name, {})
        base_g = float(cached.get("_gcups", 0) or 0)
        print(f"{name}: best {ent} vs cached {base_g} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)
        results[name] = {"best": ent, "cached_gcups": base_g}
        if ent["_gcups"] > base_g:
            path = save_defaults(ent, name)
            print(f"{name}: NEW DEFAULT -> {path}", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
