"""Scaling-efficiency report: the BASELINE.json configs table in one
command.

Emits one JSON document (stdout + logs/scaling_report.json) with aligned
pairs/s + aggregate GCUPS at:

  1chip           the default backend (the real TPU when tunneled, else
                  1 CPU device) — batch engine
  1host_8dev      8-device single-process mesh (virtual CPU devices on
                  this box; a real 8-chip host on a pod) — batch engine,
                  data parallel over pairs
  2hosts          a real 2-process jax.distributed cluster (2 devices
                  each), pairs sharded per process and merged over the
                  coordination service — batch engine
  giant_pair      ONE pair partitioned into per-device column bands with
                  ppermute halo exchange (parallel/giant.py XLA engine):
                  per-device GCUPS at D=1 vs D=4 -> pipeline efficiency

Every row is produced by a fresh subprocess so backend/platform/device
count are controlled per config (the axon TPU plugin ignores
JAX_PLATFORMS; subprocesses pin via jax.config). Numbers on this box's
multi-device rows use VIRTUAL CPU devices — they validate the dataflow
and measure orchestration overhead, not real-chip scaling; run the same
command on a pod slice for the real table.

Usage: python -m gpuseqalign_tpu.bench.scaling_report [--quick]
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from typing import List, Optional

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

BATCH_WORKER = r"""
import json, sys, time
import numpy as np
import jax
if {pin_cpu}:
    jax.config.update("jax_platforms", "cpu")
from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.parallel import align_pairs_batched, make_mesh

rng = np.random.default_rng(7)
def seq(n):
    return np.concatenate(
        [np.zeros(1, np.int32), rng.integers(0, 25, n, dtype=np.int32)]
    )
subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
pairs = [(seq(a), seq(b)) for a, b in {sizes}]
cells = sum((len(y) - 1) * (len(x) - 1) for y, x in pairs)
mesh = make_mesh({n_dev}) if {n_dev} else None

out = align_pairs_batched(AlignSpec.from_name("{spec}"), subst, pairs,
                          -11, -2, mesh=mesh, quantum="pow2")
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    out = align_pairs_batched(AlignSpec.from_name("{spec}"), subst, pairs,
                              -11, -2, mesh=mesh, quantum="pow2")
    ts.append(time.perf_counter() - t0)
t = min(ts)
print(json.dumps({{
    "backend": jax.default_backend(),
    "n_devices": int(jax.device_count() if {n_dev} else 1),
    "pairs": len(pairs),
    "pairs_per_s": round(len(pairs) / t, 2),
    "gcups_agg": round(cells / t / 1e9, 4),
}}))
"""

MULTIHOST_WORKER = r"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.parallel.multihost import align_pairs_multihost

rng = np.random.default_rng(7)
def seq(n):
    return np.concatenate(
        [np.zeros(1, np.int32), rng.integers(0, 25, n, dtype=np.int32)]
    )
subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
pairs = [(seq(a), seq(b)) for a, b in {sizes}]
cells = sum((len(y) - 1) * (len(x) - 1) for y, x in pairs)

out = align_pairs_multihost(AlignSpec.from_name("{spec}"), subst, pairs,
                            -11, gape=-2, quantum=128)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    out = align_pairs_multihost(AlignSpec.from_name("{spec}"), subst,
                                pairs, -11, gape=-2, quantum=128)
    ts.append(time.perf_counter() - t0)
t = min(ts)
if jax.process_index() == 0:
    print(json.dumps({{
        "backend": jax.default_backend(),
        "n_processes": int(jax.process_count()),
        "n_devices": int(jax.device_count()),
        "pairs": len(pairs),
        "pairs_per_s": round(len(pairs) / t, 2),
        "gcups_agg": round(cells / t / 1e9, 4),
    }}))
"""

GIANT_WORKER = r"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from gpuseqalign_tpu.core.types import (
    AlgInput, AlgParams, AlgResult, AlignSpec, Status,
)
from gpuseqalign_tpu.ops.pallas_banded import wrap_ok
from gpuseqalign_tpu.ops.pallas_wavefront2 import _cdiv
from gpuseqalign_tpu.parallel import align_giant2, make_mesh
from gpuseqalign_tpu.parallel.giant2 import pick_kb

# The PRODUCTION giant engine (giant2: banded v2 Pallas fill + ppermute
# halos), not the legacy XLA row-scan — n_pass >> D so the pipeline
# bubble, not the fill/drain edge case, is what's measured.
D = int(sys.argv[1])
rng = np.random.default_rng(7)
def seq(n):
    return np.concatenate(
        [np.zeros(1, np.int32), rng.integers(0, 25, n, dtype=np.int32)]
    )
subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
y, x = seq({rows}), seq({cols})
mesh = make_mesh(D, axis_name="sp")
R, TW, K = 128, 128, 2
params = AlgParams({{"tileBy": [R], "tileBx": [TW], "kChains": [K]}})

def run():
    nw = AlgInput()
    nw.subst = subst; nw.substsz = 25
    nw.seqY, nw.seqX = y, x
    nw.adjrows, nw.adjcols = len(y), len(x)
    nw.gapo_cost = -11; nw.gape_cost = -2
    nw.spec = AlignSpec.from_name("{spec}")
    res = AlgResult()
    stat = align_giant2(params, nw, res, mesh=mesh, interpret=True)
    assert stat == Status.success, stat
    return res

res = run()
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    res = run()
    ts.append(time.perf_counter() - t0)
t = min(ts)
cells = ({rows}) * ({cols})

# Analytic wall model (the pick_kb efficiency model, giant2.py:109):
# a pass of BL = KB*K row blocks is one wrap-echelon banded call of
# KB*SPB + (K-1)*offw chunks; the scan runs n_pass + D - 1 steps.
W = min(512, TW)
band = _cdiv(max({cols}, 1), D * TW) * TW
nb = _cdiv(max({rows}, 1), R)
KB = pick_kb(nb, K, D, R=R, W=W, band_cols=band) \
    if wrap_ok(R=R, W=W, K=K, band_cols=band) else 1
BL = KB * K
n_pass = _cdiv(nb, BL)
NSpad = _cdiv(R + band - 1 + 128, W) * W
offw = _cdiv(R + 256, W)
wall_model = (n_pass + D - 1) * (KB * (NSpad // W) + (K - 1) * offw)
print(json.dumps({{
    "n_devices": D, "KB": KB, "n_pass": n_pass,
    "gcups": round(cells / t / 1e9, 4),
    "gcups_per_device": round(cells / t / 1e9 / D, 4),
    "wall_model_chunks": int(wall_model * D),
}}))
"""


GIANT_STREAM_WORKER = r"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from gpuseqalign_tpu.core.types import (
    AlgInput, AlgParams, AlgResult, AlignSpec, Status,
)
from gpuseqalign_tpu.parallel import (
    align_giant2, align_giant2_stream, make_mesh,
)

D = int(sys.argv[1])
M = int(sys.argv[2])
rng = np.random.default_rng(7)
def seq(n):
    return np.concatenate(
        [np.zeros(1, np.int32), rng.integers(0, 25, n, dtype=np.int32)]
    )
subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
mesh = make_mesh(D, axis_name="sp")
params = AlgParams({{"tileBy": [128], "tileBx": [128], "kChains": [2],
                     "passBlocks": [1]}})
spec = AlignSpec.from_name("{spec}")

def mk():
    nw = AlgInput()
    nw.subst = subst; nw.substsz = 25
    nw.seqY, nw.seqX = seq({rows}), seq({cols})
    nw.adjrows, nw.adjcols = len(nw.seqY), len(nw.seqX)
    nw.gapo_cost = -11; nw.gape_cost = -2
    nw.spec = spec
    return nw

# Same sizes -> the sequential path compiles ONCE; content differs.
inputs = [mk() for _ in range(M)]

def run_seq():
    costs = []
    for nw in inputs:
        res = AlgResult()
        stat = align_giant2(params, nw, res, mesh=mesh, interpret=True)
        assert stat == Status.success, stat
        costs.append(res.align_cost)
    return costs

def run_stream():
    results = [AlgResult() for _ in inputs]
    stats = align_giant2_stream(params, inputs, results, mesh=mesh,
                                interpret=True)
    assert stats == [Status.success] * M, stats
    return [r.align_cost for r in results]

c_seq = run_seq()          # warm (compile)
t0 = time.perf_counter(); c_seq = run_seq()
t_seq = time.perf_counter() - t0
c_str = run_stream()       # warm (compile)
t0 = time.perf_counter(); c_str = run_stream()
t_str = time.perf_counter() - t0
assert c_seq == c_str, (c_seq, c_str)

# Step-count model: per-device scan steps actually executed (inactive
# pipeline steps cost the same as active ones under the masked scan).
import math
R, K = 128, 2
n_pass = math.ceil(math.ceil(({rows}) / R) / K)
steps_seq = M * (n_pass + D - 1)
steps_str = M * n_pass + D - 1
print(json.dumps({{
    "n_devices": D, "pairs": M, "n_pass_per_pair": n_pass,
    "t_sequential_s": round(t_seq, 3),
    "t_stream_s": round(t_str, 3),
    "speedup": round(t_seq / t_str, 3),
    "step_model_speedup": round(steps_seq / steps_str, 3),
}}))
"""


def _run_worker(code: str, env_extra: dict, args: Optional[List[str]] = None,
                timeout: int = 600) -> dict:
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False, dir="/tmp"
    ) as f:
        # `python /tmp/x.py` puts /tmp (the SCRIPT dir, not the cwd) at
        # sys.path[0], so cwd=REPO alone does NOT make the package
        # importable; inject the repo path explicitly. (PYTHONPATH would
        # break the axon TPU plugin — CLAUDE.md — but in-process
        # sys.path manipulation does not.)
        f.write(f"import sys; sys.path.insert(0, {REPO!r})\n" + code)
        path = f.name
    # Inherit the environment UNCHANGED: on the axon-tunneled box the TPU
    # plugin itself rides JAX_PLATFORMS=axon + PYTHONPATH=/root/.axon_site
    # (popping either silently drops every worker to CPU). CPU-pinned
    # workers pin IN-SCRIPT via jax.config.update("jax_platforms","cpu"),
    # which wins over the env var.
    env = dict(os.environ)
    env.update(env_extra)
    p = subprocess.run(
        [sys.executable, path] + (args or []),
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-2000:])
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="smaller workloads (CI-sized)")
    ap.add_argument("--spec", default="nw_ag")
    ap.add_argument("--out", default=os.path.join(
        REPO, "logs", "scaling_report.json"))
    args = ap.parse_args(argv)

    if args.quick:
        sizes = [(100 + 13 * k, 150 + 17 * k) for k in range(16)]
        rows, cols = 1024, 2048
    else:
        sizes = [(400 + 31 * k, 600 + 41 * k) for k in range(32)]
        # giant2 at R=128/K=2: 16 row blocks -> n_pass 8 >> D-1, so the
        # pipeline bubble (not the edge case) is what's measured; sized
        # for interpret-mode Pallas on CPU devices.
        rows, cols = 2048, 4096

    report = {"spec": args.spec, "host": socket.gethostname(),
              "configs": {}}
    t_all = time.time()

    # 1 chip / 1 device, default backend. A wedged axon tunnel hangs
    # backend init indefinitely at the terminal-server claim, so probe
    # reachability first and degrade this row to a pinned-CPU device
    # (the row's "backend" field records which one ran).
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BK:' + jax.default_backend())"],
            capture_output=True, text=True, timeout=180, cwd=REPO,
        )
        tpu_up = probe.returncode == 0 and "BK:" in probe.stdout
    except subprocess.TimeoutExpired:
        tpu_up = False
    report["configs"]["1chip"] = _run_worker(
        BATCH_WORKER.format(pin_cpu=str(not tpu_up), n_dev=0, sizes=sizes,
                            spec=args.spec),
        {},
    )

    # 1 host x 8 devices (virtual CPU on this box).
    report["configs"]["1host_8dev"] = _run_worker(
        BATCH_WORKER.format(pin_cpu="True", n_dev=8, sizes=sizes,
                            spec=args.spec),
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )

    # 2 processes ("hosts"), 2 devices each.
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False, dir="/tmp"
    ) as f:
        # Same sys.path note as _run_worker.
        f.write(f"import sys; sys.path.insert(0, {REPO!r})\n"
                + MULTIHOST_WORKER.format(sizes=sizes, spec=args.spec))
        wpath = f.name
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, wpath, coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=REPO, env=env, text=True,
        )
        for i in range(2)
    ]
    mh = None
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(stderr[-2000:])
        lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
        if lines:
            mh = json.loads(lines[-1])
    report["configs"]["2hosts"] = mh

    # Giant pair (giant2, the production engine): per-device efficiency
    # D=1 vs D=4, measured next to the pick_kb analytic model.
    g1 = _run_worker(
        GIANT_WORKER.format(rows=rows, cols=cols, spec=args.spec),
        {}, args=["1"], timeout=2400,
    )
    g4 = _run_worker(
        GIANT_WORKER.format(rows=rows, cols=cols, spec=args.spec),
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        args=["4"], timeout=2400,
    )
    report["configs"]["giant_pair"] = {
        "D1": g1, "D4": g4,
        "pipeline_efficiency": round(
            g4["gcups_per_device"] / g1["gcups_per_device"], 3
        ),
        # pick_kb model: per-device rate ~ cells / (D * wall chunks).
        "model_efficiency": round(
            g1["wall_model_chunks"] / g4["wall_model_chunks"], 3
        ),
    }
    # Giant-pair STREAM: M pairs through one pipelined fill vs M
    # sequential fills at D=4 — measures the cross-device fill/drain
    # bubble amortization (the masked scan makes inactive steps cost the
    # same as active ones, so the ratio tracks the step-count model even
    # on CPU-interpret devices).
    report["configs"]["giant_stream"] = _run_worker(
        GIANT_STREAM_WORKER.format(
            spec=args.spec,
            rows=256 if args.quick else 700,
            cols=600 if args.quick else 1100,
        ),
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        args=["4", "3" if args.quick else "6"],
        timeout=2400,
    )
    report["elapsed_s"] = round(time.time() - t_all, 1)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
