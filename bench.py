"""Headline benchmark: NW affine-gap GCUPS on the flagship TPU kernel
(BASELINE.json metric: "GCUPS/chip (DP cell updates/s) on NW affine-gap").

Problem: the reference's release workload — one len23728 x len23728 pair
(resrc/pair_release.txt, ref: README.md:117-123) with blosum62 / gapoCost
-11. The flagship is the v2 Pallas sparse (mlsp) multi-chain wavefront
kernel (ops/pallas_wavefront2.py); on non-TPU backends it falls back to
the XLA mlsp row-scan through the registry path.

Timing: the kernel runs M times inside ONE jitted lax.scan (each iteration
data-depends on the previous so nothing is elided), and the per-iteration
time is (T(1+M) - T(1)) / M. This cancels per-dispatch overhead — which
on a tunneled/remote TPU can be ~26 ms, an order of magnitude above the
kernel itself — so the number reported is device time, the same quantity
the reference's cudaDeviceSynchronize-bounded align.calc lap measures
(SURVEY.md §6: GCUPS = rows*cols / align.calc).

vs_baseline is the speedup over the reference algorithm (cpu1_st_row, the
vectorized CPU oracle reproducing ref: src/nwalign_cpu1_st_row.cpp) on a
4096x4096 prefix of the same pair on this host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

PAIR_N = 23728
ORACLE_N = 4096
M_ITERS = 8
KIND, GAP = "nw", "affine"
GAPO, GAPE = -11, -2


def _kernel_params():
    """(R, W, TW, K, packedx, packedef, remath, subprow) for the benched
    spec — from the autotuner cache (resrc/tuned/<device_kind>.json,
    written by `python -m gpuseqalign_tpu.bench.autotune
    --save-defaults`), with the measured v5e literals as fallback."""
    from gpuseqalign_tpu.ops.pallas_wavefront2 import tuned_defaults

    ent = tuned_defaults(KIND, GAP, allow_packedx=True)
    R = int(ent.get("tileBy", 2048))
    TW = int(ent.get("tileBx", 2048))
    K = int(ent.get("kChains", 4))
    W = int(ent.get("winW", 0) or min(512, TW))
    if TW % W or W % 128:
        W = min(512, TW)
    return (R, W, TW, K, bool(ent.get("packedx", 0)),
            bool(ent.get("packedef", 0)), bool(ent.get("rematHdr", 0)),
            bool(ent.get("subProw", 0)))


# Set in main() from the tuned cache.
R, W, TW, K, PACKEDX, PACKEDEF, REMATH, SUBPROW = \
    2048, 512, 2048, 4, False, False, False, False

# Measured rooflines (GCUPS/chip on the v5e) — the fastest measured rate
# of the FAITHFUL production step body (lookup + carries + captures,
# 128-step-unrolled, no grid/window/HBM machinery) at the kernel's own
# K_max. Round 4 superseded the sparse skeleton as the linear
# denominator: the subprow step body measures 183.9 GCUPS at K=6 while
# the skeleton plateaus at ~104 — the skeleton has too little ILP per
# step to fill the issue slots and is latency-bound, so it was never a
# ceiling. Derivation and reproduction: ROOFLINE.md §7 /
# gpuseqalign_tpu/bench/vpu_probe.py (fullstep probe, /tmp/probe_b.log
# checked into ROOFLINE.md).
ROOFLINE_GCUPS = {
    # Canonical constants anchored at the 2026-08-20 morning linear body
    # (183.9), with the other specs scaled by the round-5 SAME-WINDOW
    # body ratios (ROOFLINE.md §8.6; measurements/sweep_r5a.log probes:
    # sw_lg 0.848, nw_ag 0.775, sw_ag 0.639 of the linear body). These
    # feed mfu_canonical only — window drift is per-kernel (§8.2), so
    # the headline mfu divides by a body measured in the SAME process.
    ("nw", "linear"): 183.9,
    ("sw", "linear"): 156.0,
    ("nw", "affine"): 142.5,
    ("sw", "affine"): 117.5,
}


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


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


def _bench_tpu_v2(subst, seq) -> float:
    """Device seconds per fill of the PAIR_N x PAIR_N matrix."""
    import jax
    import jax.numpy as jnp
    from gpuseqalign_tpu.ops.pallas_wavefront2 import pallas_mlsp_v2

    n = len(seq) - 1
    B = _pad_to(-(-n // R), K)
    rows_p = B * R
    cols_p = _pad_to(n, TW)
    y = np.zeros(1 + rows_p, np.int32)
    y[: len(seq)] = seq
    x = np.zeros(1 + cols_p, np.int32)
    x[: len(seq)] = seq
    subst_d = jnp.asarray(subst)
    y_d = jnp.asarray(y)
    x_d = jnp.asarray(x)

    @functools.partial(jax.jit, static_argnames=("m",))
    def loop(subst, y, x, gapo, *, m):
        def body(carry, _):
            # True data dependency: the previous iteration's result lands
            # in X's never-read header element, so no two iterations are
            # CSE-identical and XLA cannot hoist or collapse the scan
            # (a `0 * carry` pseudo-dependency is constant-folded away —
            # observed collapsing the tiny-pair kernel's loop 10x).
            x2 = x.at[0].set(carry)
            out = pallas_mlsp_v2(
                subst, y, x2, gapo, jnp.int32(GAPE),
                jnp.int32(n + 1), jnp.int32(n + 1),
                R=R, W=W, TW=TW, K=K, kind=KIND, gap=GAP,
                packedx=PACKEDX, packedef=PACKEDEF, remath=REMATH,
                subprow=SUBPROW,
            )
            return out["hrow"][0, 0], None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=m)
        return c

    def t_of(m):
        out = loop(subst_d, y_d, x_d, jnp.int32(GAPO), m=m)
        _ = np.asarray(jax.device_get(out))  # warm + force
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            out = loop(subst_d, y_d, x_d, jnp.int32(GAPO), m=m)
            _ = np.asarray(jax.device_get(out))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    return (t_of(1 + M_ITERS) - t_of(1)) / M_ITERS


def _bench_fallback(subst, seq) -> float:
    """Non-TPU: registry mlsp path, align.calc lap."""
    from gpuseqalign_tpu.core.types import AlgInput, AlgParams, AlgResult, Status
    from gpuseqalign_tpu.ops.pallas_kernels import align_pallas_mlsp

    nw = AlgInput()
    nw.subst = subst
    nw.substsz = subst.shape[0]
    nw.seqY = seq
    nw.seqX = seq
    nw.adjrows = nw.adjcols = len(seq)
    nw.gapo_cost, nw.gape_cost = GAPO, GAPE
    nw.spec = __import__(
        "gpuseqalign_tpu.core.types", fromlist=["AlignSpec"]
    ).AlignSpec.from_name(f"{KIND}_{'ag' if GAP == 'affine' else 'lg'}")
    params = AlgParams({"tileBy": [2048], "tileBx": [2048]})
    ts = []
    for _ in range(3):
        nw.reset_cycle()
        res = AlgResult()
        stat = align_pallas_mlsp(params, nw, res)
        if stat != Status.success:
            raise RuntimeError(f"align failed: {stat!r}")
        ts.append(res.sw_align.get_or_default("align.calc") / 1e3)
    return float(np.median(ts))


def nw_spec():
    from gpuseqalign_tpu.core.types import AlignSpec

    return AlignSpec.from_name(f"{KIND}_{'ag' if GAP == 'affine' else 'lg'}")


def _tpu_reachable(timeout_s: int = 180) -> bool:
    """Probe the default backend in a SUBPROCESS with a hard timeout: a
    wedged axon tunnel hangs jax.default_backend() indefinitely at the
    terminal-server claim (observed 5+ h on 2026-08-17), which would hang
    this whole benchmark instead of degrading to the CPU fallback."""
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BK:' + jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return False
    return p.returncode == 0 and "BK:tpu" in p.stdout


def main() -> int:
    tpu_up = _tpu_reachable()
    import jax

    if not tpu_up:
        # Pin BEFORE any backend query so the wedged plugin never loads.
        jax.config.update("jax_platforms", "cpu")

    from gpuseqalign_tpu.core.types import AlgInput, AlgParams, AlgResult, Status
    from gpuseqalign_tpu.models.cpu_algs import align_cpu1_st_row

    global R, W, TW, K, PACKEDX, PACKEDEF, REMATH, SUBPROW
    R, W, TW, K, PACKEDX, PACKEDEF, REMATH, SUBPROW = _kernel_params()
    subst, y = _load_fixture()
    on_tpu = tpu_up and jax.default_backend() == "tpu"
    rows = cols = len(y) - 1

    t = _bench_tpu_v2(subst, y) if on_tpu else _bench_fallback(subst, y)
    gcups = rows * cols / t / 1e9

    # Reference-algorithm baseline on a prefix (same host).
    nwo = AlgInput()
    nwo.subst = subst
    nwo.substsz = subst.shape[0]
    nwo.seqY = y[: 1 + ORACLE_N].copy()
    nwo.seqX = y[: 1 + ORACLE_N].copy()
    nwo.adjrows = nwo.adjcols = 1 + ORACLE_N
    nwo.gapo_cost, nwo.gape_cost = GAPO, GAPE
    nwo.spec = nw_spec()
    reso = AlgResult()
    t0 = time.perf_counter()
    stat = align_cpu1_st_row(AlgParams({}), nwo, reso)
    t_or = time.perf_counter() - t0
    if stat != Status.success:
        raise RuntimeError(f"oracle failed: {stat!r}")
    oracle_gcups = ORACLE_N * ORACLE_N / t_or / 1e9

    # Correctness gate: the benched kernel must reproduce the oracle's
    # align_cost on the prefix problem before its number counts.
    if on_tpu:
        from gpuseqalign_tpu.ops.pallas_kernels import align_pallas_mlsp

        nwc = AlgInput()
        nwc.subst = subst
        nwc.substsz = subst.shape[0]
        nwc.seqY = nwo.seqY
        nwc.seqX = nwo.seqX
        nwc.adjrows = nwc.adjcols = 1 + ORACLE_N
        nwc.gapo_cost, nwc.gape_cost = GAPO, GAPE
        nwc.spec = nw_spec()
        resc = AlgResult()
        stat = align_pallas_mlsp(
            AlgParams({"tileBy": [2048], "tileBx": [2048]}), nwc, resc
        )
        if stat != Status.success or resc.align_cost != reso.align_cost:
            raise RuntimeError(
                f"bench kernel mismatch: {stat!r} "
                f"{resc.align_cost} vs oracle {reso.align_cost}"
            )

    name = f"{KIND}_{'ag' if GAP == 'affine' else 'lg'}"
    metric = (
        f"GCUPS {name} pallas_mlsp_v2 23728x23728 (v5e chip)"
        if on_tpu
        else f"GCUPS {name} xla_mlsp 23728x23728 (cpu fallback)"
    )
    out = {
        "metric": metric,
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / oracle_gcups, 2),
    }
    if on_tpu:
        # Canonical (morning-window 2026-08-20) roofline for reference...
        roofline = ROOFLINE_GCUPS[(KIND, GAP)]
        out["roofline_gcups"] = roofline
        out["mfu_canonical"] = round(gcups / roofline, 3)
        # ...but the HEADLINE mfu is window-invariant: the faithful-body
        # probe runs in THIS process, so kernel and denominator share the
        # window's drift factor (±25% between windows on identical code,
        # ROOFLINE.md §7 — a recorded constant would make mfu mostly
        # window noise). Ref-harness analog: same-run verification,
        # src/benchmark.cpp:119-147.
        try:
            from gpuseqalign_tpu.bench.vpu_probe import roofline_body

            body = roofline_body(KIND, GAP)
            out["body_gcups"] = body["gcups"]
            out["body_variant"] = body["variant"]
            out["mfu"] = round(gcups / body["gcups"], 3)
        except Exception as e:  # a failed probe must not kill the bench
            out["body_error"] = f"{type(e).__name__}: {e}"[:200]
            out["mfu"] = out["mfu_canonical"]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
