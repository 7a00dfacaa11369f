"""End-to-end CLI differential runs: every algorithm must reproduce the
oracle's align_cost, score_hash and trace_hash (errstep 5 on mismatch) —
the reference's own verification strategy (ref: src/benchmark.cpp:119-147).
"""

import json
import os

import pytest

from gpuseqalign_tpu.bench.cli import main

RESRC = os.path.join(os.path.dirname(__file__), "..", "resrc")


def _write_params(path, algs):
    with open(path, "w") as f:
        json.dump(algs, f)


def _read_tsv(path):
    with open(path) as f:
        lines = [l.rstrip("\n").split("\t") for l in f if l.strip()]
    header, rows = lines[0], lines[1:]
    return [dict(zip(header, row)) for row in rows]


SMALL_PAIRS = """\
len1 len1
len1 len728
len2 len4
len31 len33
len32 len32
len66 len128
len196 len256
len512[2:] len728[:726]
len384 len728
"""

ALGS = {
    "cpu1_st_row": {},
    "cpu2_st_diag": {},
    "cpu3_st_diagrow": {"blocksz": [32]},
    "cpu4_mt_diagrow": {"blocksz": [32]},
    "tpu1_xla_diag": {},
    "tpu2_xla_rowscan": {},
    "tpu3_pallas_dense": {},
    "tpu7_pallas_mlsp": {"tileBy": [16, 128], "tileBx": [48, 512]},
    # Distributed giant-pair engine (XLA giant over the 8 virtual CPU
    # devices here; the banded Pallas kernel on TPU).
    "tpu9_giant_mlsp": {"blockH": [64]},
}


def run_cli(tmp_path, align_kind="nw_lg", algs=ALGS, pairs=SMALL_PAIRS,
            extra=()):
    params = tmp_path / "params.json"
    _write_params(params, algs)
    pair_file = tmp_path / "pairs.txt"
    pair_file.write_text(pairs)
    res = tmp_path / "out.tsv"
    rc = main([
        "--substPath", os.path.join(RESRC, "subst.json"),
        "--algParamPath", str(params),
        "--seqPath", os.path.join(RESRC, "seq_generated.fa"),
        "--seqPairPath", str(pair_file),
        "--resPath", str(res),
        "--algKind", align_kind,
        "--fCalcScoreHash", "--fCalcTrace",
        *extra,
    ])
    return rc, _read_tsv(res)


def test_cli_nw_lg_all_algorithms_agree(tmp_path):
    rc, rows = run_cli(tmp_path)
    assert rc == 0
    assert all(r["err_step"] == "0" for r in rows), [
        (r["alg_name"], r["err_step"]) for r in rows if r["err_step"] != "0"
    ]
    # Group by pair: all algorithms/params must report identical results.
    by_pair = {}
    for r in rows:
        key = (r["seqY_id"], r["seqX_id"])
        val = (r["align_cost"], r["score_hash"], r["trace_hash"])
        by_pair.setdefault(key, set()).add(val)
    assert len(by_pair) == 9
    for key, vals in by_pair.items():
        assert len(vals) == 1, (key, vals)
    # Transcripts are non-empty and RLE-formatted.
    for r in rows:
        assert r["edit_trace"]
        assert r["edit_trace"][0].isdigit()


@pytest.mark.parametrize("kind", ["nw_ag", "sw_lg", "sw_ag"])
def test_cli_extended_kinds_agree(tmp_path, kind):
    algs = {
        "cpu1_st_row": {},
        "tpu1_xla_diag": {},
        "tpu2_xla_rowscan": {},
    }
    rc, rows = run_cli(
        tmp_path, align_kind=kind, algs=algs,
        extra=("--gapeCost", "-2"),
    )
    assert rc == 0
    assert all(r["err_step"] == "0" for r in rows)
    by_pair = {}
    for r in rows:
        key = (r["seqY_id"], r["seqX_id"])
        by_pair.setdefault(key, set()).add(
            (r["align_cost"], r["score_hash"], r["trace_hash"])
        )
    for key, vals in by_pair.items():
        assert len(vals) == 1, (key, vals)


@pytest.mark.parametrize("kind", ["nw_lg", "nw_ag", "sw_lg", "sw_ag"])
def test_giant_registry_dispatch_off_tpu(monkeypatch, kind):
    """tpu9_giant_mlsp must serve ALL four specs off-TPU: NW_LG routes to
    the XLA giant engine, extension specs to the banded Pallas engine in
    interpret mode (regression: they used to hit the NW_LG-only XLA giant
    and fail with errorInvalidValue). Routing only — engine correctness
    per spec is covered by tests/test_parallel.py::TestGiant2; a full
    interpret compile of the 8-band CLI default mesh takes >10 min, and
    the standalone verify drive exercises that path end to end."""
    from gpuseqalign_tpu.core import registry as reg
    from gpuseqalign_tpu.core.types import (
        AlgInput, AlgParams, AlgResult, AlignSpec, Status,
    )
    import gpuseqalign_tpu.parallel.giant as giant
    import gpuseqalign_tpu.parallel.giant2 as giant2

    calls = []
    monkeypatch.setattr(
        giant, "align_giant_mlsp",
        lambda pr, nw, res: calls.append("xla") or Status.success,
    )
    monkeypatch.setattr(
        giant2, "align_giant2",
        lambda pr, nw, res, interpret=False: calls.append(
            f"banded_interp={interpret}"
        ) or Status.success,
    )
    nw = AlgInput()
    nw.spec = AlignSpec.from_name(kind)
    alg = reg.get_algorithm_map()["tpu9_giant_mlsp"]
    assert alg.align(AlgParams({}), nw, AlgResult()) == Status.success
    expected = "xla" if kind == "nw_lg" else "banded_interp=True"
    assert calls == [expected]


def test_cli_reference_alias_names(tmp_path):
    algs = {
        "NwAlign_Cpu1_St_Row": {},
        "NwAlign_Gpu1_Ml_Diag": {"threadsPerBlock": [64]},
        "NwAlign_Gpu8_Mlsp_DiagDiag": {
            "threadsPerBlockA": [160], "tileBx": [76], "warpDivFactorB": [1]
        },
    }
    rc, rows = run_cli(tmp_path, algs=algs, pairs="len64 len128\n")
    assert rc == 0
    assert all(r["err_step"] == "0" for r in rows)
    assert {r["alg_name"] for r in rows} == set(algs)


def test_cli_warmup_and_samples(tmp_path):
    algs = {"cpu1_st_row": {}}
    rc, rows = run_cli(
        tmp_path, algs=algs, pairs="len32 len64\n",
        extra=("--warmupPerAlign", "1", "--samplesPerAlign", "2"),
    )
    assert rc == 0
    assert len(rows) == 1
    assert rows[0]["warmup_runs"] == "1"
    assert rows[0]["sample_runs"] == "2"
    assert rows[0]["last_run_idx"] == "1"


def test_cli_profile_dir(tmp_path):
    """--profileDir wraps the run in jax.profiler.trace and leaves an
    xplane artifact behind."""
    prof = tmp_path / "prof"
    rc, rows = run_cli(
        tmp_path, algs={"cpu1_st_row": {}}, pairs="len32 len64\n",
        extra=("--profileDir", str(prof)),
    )
    assert rc == 0
    artifacts = [
        os.path.join(root, f)
        for root, _, files in os.walk(prof)
        for f in files
    ]
    assert any(f.endswith(".xplane.pb") for f in artifacts)


def test_cli_help():
    assert main(["--help"]) == 0


def test_cli_missing_required():
    assert main(["--seqPath", "x.fa"]) == -1


def test_driver_records_hash_trace_exceptions(tmp_path, monkeypatch):
    """A raising hash/trace is THAT run's failure (errstep 3/4 with the
    exception in error_msg), not an abort of the whole benchmark — same
    contract as a raising align (AlgResult.error_msg docstring)."""
    from gpuseqalign_tpu.bench import driver as drv
    from gpuseqalign_tpu.core import registry

    real_map = registry.get_algorithm_map()

    def broken_map():
        m = dict(real_map)
        alg = m["cpu1_st_row"]
        m["cpu1_st_row"] = type(alg)(
            align=alg.align,
            trace=alg.trace,
            hash=lambda nw, res: (_ for _ in ()).throw(
                RuntimeError("synthetic hash bug")
            ),
            print_score=alg.print_score,
            print_trace=alg.print_trace,
        )
        return m

    monkeypatch.setattr(drv, "get_algorithm_map", broken_map)
    rc, rows = run_cli(
        tmp_path, algs={"cpu1_st_row": {}, "tpu2_xla_rowscan": {}}
    )
    # The benchmark completed (both algorithms, all pairs in the TSV)...
    assert {r["alg_name"] for r in rows} == {"cpu1_st_row", "tpu2_xla_rowscan"}
    broken = [r for r in rows if r["alg_name"] == "cpu1_st_row"]
    ok = [r for r in rows if r["alg_name"] == "tpu2_xla_rowscan"]
    # ...the broken alg's rows carry errstep 3 + the exception text...
    assert all(r["err_step"] == "3" for r in broken)
    assert all("synthetic hash bug" in r["error_msg"] for r in broken)
    # ...and the healthy algorithm still ran clean.
    assert all(r["err_step"] == "0" for r in ok)
