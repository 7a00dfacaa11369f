"""True multi-process run: 2 JAX processes (CPU backend, 2 virtual devices
each) initialize a jax.distributed cluster, shard a pair list, and merge
results over the coordination service — the N>=2 hosts story of
BASELINE.json, emulated per SURVEY.md §4."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

WORKER = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
from gpuseqalign_tpu.core.types import AlignSpec
from gpuseqalign_tpu.parallel.multihost import align_pairs_multihost

rng = np.random.default_rng(21)
subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)
def seq(n):
    return np.concatenate(
        [np.zeros(1, np.int32), rng.integers(0, 25, n, dtype=np.int32)]
    )
pairs = [(seq(50 + 11 * k), seq(70 + 7 * k)) for k in range(7)]
out = align_pairs_multihost(
    AlignSpec.from_name("nw_lg"), subst, pairs, -11, quantum=128
)
print(json.dumps({
    "pid": int(jax.process_index()),
    "nproc": int(jax.process_count()),
    "costs": out.costs.tolist(),
}))
"""


@pytest.mark.parametrize("n_local_devices", [2])
def test_two_process_cluster(tmp_path, n_local_devices):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # PYTHONPATH is safe here: the workers pin the CPU platform, so the
    # axon plugin (which PYTHONPATH breaks) is never loaded.
    env["PYTHONPATH"] = os.path.abspath(REPO)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=REPO, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr[-2000:]
        json_lines = [
            ln for ln in stdout.splitlines() if ln.startswith("{")
        ]
        assert json_lines, (stdout[-1000:], stderr[-1000:])
        outs.append(json.loads(json_lines[-1]))

    assert {o["pid"] for o in outs} == {0, 1}
    assert all(o["nproc"] == 2 for o in outs)
    # Both processes hold the SAME merged results...
    assert outs[0]["costs"] == outs[1]["costs"]

    # ...which match the single-process oracle.
    from gpuseqalign_tpu.core.types import AlignSpec
    from gpuseqalign_tpu.models.oracle import align_cost_of, oracle_align_dense

    rng = np.random.default_rng(21)
    subst = rng.integers(-4, 10, size=(25, 25)).astype(np.int32)

    def seq(n):
        return np.concatenate(
            [np.zeros(1, np.int32), rng.integers(0, 25, n, dtype=np.int32)]
        )

    pairs = [(seq(50 + 11 * k), seq(70 + 7 * k)) for k in range(7)]
    spec = AlignSpec.from_name("nw_lg")
    want = [
        align_cost_of(spec, oracle_align_dense(spec, subst, y, x, -11))
        for y, x in pairs
    ]
    assert outs[0]["costs"] == want
