"""Bench tools: autotuner and throughput CLI (CPU)."""

import json
import os

import numpy as np

from gpuseqalign_tpu.bench.autotune import tune
from gpuseqalign_tpu.core.types import AlignSpec

from conftest import RESRC, random_seq


def test_autotune_picks_valid_combo(blosum62, rng):
    y = random_seq(rng, 300)
    x = random_seq(rng, 400)
    grids = {
        "cpu1_st_row": {},
        "tpu7_pallas_mlsp": {"tileBy": [128, 256], "tileBx": [128, 256]},
    }
    best = tune(grids, blosum62, y, x, -11, samples=1)
    assert "cpu1_st_row" in best
    assert "tpu7_pallas_mlsp" in best
    combo = best["tpu7_pallas_mlsp"]
    assert combo["tileBy"][0] in (128, 256)
    assert combo["tileBx"][0] in (128, 256)
    assert combo["_gcups"][0] > 0


def test_throughput_cli(capsys):
    from gpuseqalign_tpu.bench.throughput import main

    rc = main([
        "--seqPath", os.path.join(RESRC, "seq_generated.fa"),
        "--substPath", os.path.join(RESRC, "subst.json"),
        "--seqPairPath", os.path.join(RESRC, "pair_debug.txt"),
        "--algKind", "sw_ag", "--repeat", "1", "--verify", "3",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pairs/s" in out and "verify ok" in out
