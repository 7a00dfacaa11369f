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


def test_throughput_giant_sequential_matches_stream(capsys):
    """--giantSequential is the per-pair A/B baseline of --giantStream:
    same engine, same verified costs, different dispatch granularity."""
    from gpuseqalign_tpu.bench.throughput import main

    common = [
        "--seqPath", "synth", "--synthPairs", "2,500,800",
        "--substPath", os.path.join(RESRC, "subst.json"),
        "--devices", "2", "--repeat", "1", "--verify", "2",
    ]
    assert main(common + ["--giantStream"]) == 0
    assert main(common + ["--giantSequential"]) == 0
    out = capsys.readouterr().out
    assert "giant stream" in out and "giant sequential" in out
    assert out.count("verify ok") == 2


def test_tuned_flag_roundtrip(tmp_path, monkeypatch):
    """Hardware-validation flags persist in the tuned cache and gate
    giant2's auto-KB wrap echelon (parallel/giant2._wrap_validated)."""
    import gpuseqalign_tpu.ops.pallas_wavefront2 as w2
    from gpuseqalign_tpu.parallel import giant2

    monkeypatch.setattr(
        w2, "tuned_cache_path", lambda: str(tmp_path / "kind.json")
    )
    monkeypatch.setattr(w2, "_TUNED_CACHE", None)
    assert w2.tuned_flag("wrap_tpu_validated") is False
    assert giant2._wrap_validated() is False
    path = w2.set_tuned_flag("wrap_tpu_validated", True)
    assert giant2._wrap_validated() is True
    # Fresh process-load path: re-read from disk.
    monkeypatch.setattr(w2, "_TUNED_CACHE", None)
    assert w2.tuned_flag("wrap_tpu_validated") is True
    data = json.loads(open(path).read())
    assert data == {"_flags": {"wrap_tpu_validated": True}}
    # Spec entries are unaffected by the _flags key.
    assert "kChains" in w2.tuned_defaults("nw", "linear")


def test_tpu_window_orchestrator(tmp_path, monkeypatch):
    """run_window executes steps as subprocesses, logs, skips
    validate_wrap when the flag is set, and stops on tunnel drop."""
    import sys

    from gpuseqalign_tpu.bench import tpu_window as tw

    echo = [sys.executable, "-c", "print('hello-step')"]
    monkeypatch.setattr(
        tw, "_step_cmds", lambda: {"validate_wrap": echo, "a": echo,
                                   "b": echo}
    )
    monkeypatch.setattr(tw, "_flag_already_set", lambda flag, **kw: True)
    probes = iter([True, False])  # a runs, tunnel drops before b
    monkeypatch.setattr(tw, "tpu_reachable", lambda *_: next(probes))
    summary = tw.run_window(["validate_wrap", "a", "b"], str(tmp_path),
                            step_timeout=60, probe_timeout=1)
    assert summary["steps"][0] == {"step": "validate_wrap", "skipped": True}
    assert summary["steps"][1]["rc"] == 0
    assert "hello-step" in summary["steps"][1]["tail"]
    assert summary["tunnel_dropped_before"] == "b"
    assert "complete" not in summary
    ondisk = json.loads((tmp_path / "summary.json").read_text())
    assert len(ondisk["steps"]) == 2


def test_fuzz_smoke(capsys):
    """Differential fuzzer: a short seeded run must agree across the
    whole registry surface (cost + score hash + transcript + trace
    hash). Long runs are a background tool; this pins the harness."""
    from gpuseqalign_tpu.bench.fuzz import main

    rc = main(["--cases", "6", "--seconds", "0", "--seed", "12345"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "6 cases, 0 failures" in out
