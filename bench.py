"""Headline benchmark: NW linear-gap GCUPS on the flagship TPU kernel.

Problem: the reference's release workload — one len23728 x len23728 pair
(resrc/pair_release.txt, ref: README.md:117-123) with blosum62 / gapoCost
-11. The flagship is the Pallas sparse (mlsp) wavefront kernel; on non-TPU
backends it falls back to the XLA mlsp row-scan.

GCUPS = (rows * cols) / align.calc seconds (SURVEY.md §6: derived exactly as
the reference harness records it). vs_baseline is the speedup over the
reference algorithm (cpu1_st_row, the vectorized CPU oracle that reproduces
ref: src/nwalign_cpu1_st_row.cpp) measured on the same host on a 4096x4096
prefix of the same pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

PAIR_N = 23728
ORACLE_N = 4096
REPS = 3


def _load_fixture():
    from gpuseqalign_tpu.io.subst import parse_subst_file
    from gpuseqalign_tpu.io.fasta import parse_seq_file

    subst_data = parse_subst_file(os.path.join(REPO, "resrc", "subst.json"))
    subst = subst_data.subst_map["blosum62"]
    seq_data = parse_seq_file(
        os.path.join(REPO, "resrc", "seq_generated.fa"), subst_data.letter_map
    )
    y = seq_data.seq_map[f"len{PAIR_N}"].seq
    return subst, y


def _time_align(align_fn, reps=REPS):
    """Median align.calc seconds over reps (after one warmup inside fn)."""
    from gpuseqalign_tpu.core.types import AlgResult, Status

    ts = []
    for _ in range(reps):
        res = AlgResult()
        stat = align_fn(res)
        if stat != Status.success:
            raise RuntimeError(f"align failed: {stat!r}")
        ts.append(res.sw_align.get_or_default("align.calc") / 1e3)
    return float(np.median(ts))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gpuseqalign_tpu.core.types import AlgInput, AlgParams, AlgResult, Status
    from gpuseqalign_tpu.models.cpu_algs import align_cpu1_st_row
    from gpuseqalign_tpu.ops.pallas_kernels import align_pallas_mlsp

    subst, y = _load_fixture()
    on_tpu = jax.default_backend() == "tpu"

    nw = AlgInput()
    nw.subst = subst
    nw.substsz = subst.shape[0]
    nw.seqY = y
    nw.seqX = y
    nw.adjrows = nw.adjcols = len(y)
    nw.gapo_cost = -11
    rows = cols = len(y) - 1

    params = AlgParams({"tileBy": [2048], "tileBx": [2048]})

    def run(res):
        nw.reset_cycle()
        return align_pallas_mlsp(params, nw, res)

    # Warmup (compile).
    warm = AlgResult()
    stat = run(warm)
    if stat != Status.success:
        raise RuntimeError(f"warmup failed: {stat!r}")
    t = _time_align(run)
    gcups = rows * cols / t / 1e9

    # Reference-algorithm baseline on a prefix (same host).
    nwo = AlgInput()
    nwo.subst = subst
    nwo.substsz = subst.shape[0]
    nwo.seqY = y[: 1 + ORACLE_N].copy()
    nwo.seqX = y[: 1 + ORACLE_N].copy()
    nwo.adjrows = nwo.adjcols = 1 + ORACLE_N
    nwo.gapo_cost = -11
    reso = AlgResult()
    t0 = time.perf_counter()
    stat = align_cpu1_st_row(AlgParams({}), nwo, reso)
    t_or = time.perf_counter() - t0
    if stat != Status.success:
        raise RuntimeError(f"oracle failed: {stat!r}")
    oracle_gcups = ORACLE_N * ORACLE_N / t_or / 1e9

    metric = (
        "GCUPS nw_lg pallas_mlsp 23728x23728 (v5e chip)"
        if on_tpu
        else "GCUPS nw_lg xla_mlsp 23728x23728 (cpu fallback)"
    )
    print(json.dumps({
        "metric": metric,
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / oracle_gcups, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
