"""TPU-window harvester: run every chip-gated task the moment the axon
tunnel is reachable.

The tunnel to the one real TPU chip goes down for hours at a time
(CLAUDE.md / ROADMAP.md "Queued for the next TPU window"), so chip-gated
work accumulates. This orchestrator turns any window into results
without a human in the loop:

  probe the tunnel in a subprocess with a hard timeout (a wedged claim
  hangs jax.default_backend() indefinitely), optionally polling until it
  comes up (--waitHours), then run the queued steps in order, each as a
  fresh subprocess with its own timeout, logging to
  logs/tpu_window_<ts>/<step>.log and a machine-readable summary.json.

Steps (the ROADMAP queue; subset with --steps):

  validate_wrap  on-chip differential drive of the wrap-banded giant
                 engine (bench/validate_wrap_tpu.py) — persists the
                 `wrap_tpu_validated` tuned-cache flag on success;
                 skipped automatically once the flag is set
  validate_packedx  on-chip differential drive of the packedx production
                 kernel at the tuned geometry (bench/
                 validate_packedx_tpu.py) — persists/skips on the
                 `packedx_tpu_validated` flag likewise
  validate_flags / validate_banded_flags / validate_tiny
                 on-chip differentials for the tuned register-lever
                 configs (full-matrix / banded giant / tiny-pair batch);
                 flags `flags_tpu_validated`, `banded_flags_tpu_
                 validated`, `tiny_tpu_validated`. After ANY kernel
                 change pass --force so set flags don't skip them.
  giant_ab       banded register-lever A/B at the giant regime
                 (98304^2, D=1) — re-tunes the per-spec `banded`
                 sub-entries
  vpu_subk       register-spill ablation: skeleton GCUPS vs carry height
  vpu_ablate     fullstep K=7 carry ablations (noacc/noprow/noxcarry/
                 mincarry) — which carry must shrink for one more chain
  bench          fresh bench.py headline (writes the one-line JSON)
  scaling        bench/scaling_report.py --quick
  stream_ab      giant-pair stream vs sequential A/B at D=1 (~8 medium
                 synthetic pairs; the ~26 ms/dispatch tunnel overhead is
                 paid once per stream vs once per pair)
  autotune_*     per-spec kernel-default refresh (autotune
                 --save-defaults -> resrc/tuned/<device_kind>.json)

The tunnel is re-probed between steps; if it drops mid-window the run
records how far it got and exits 2 so a cron/loop wrapper can retry.

Usage:
    python -m gpuseqalign_tpu.bench.tpu_window [--waitHours H]
        [--steps a,b,...] [--stepTimeout SECONDS] [--probeTimeout S]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import List, Optional

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def tpu_reachable(timeout_s: int = 180) -> bool:
    """Probe the default backend in a subprocess with a hard timeout."""
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BK:' + jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return False
    return p.returncode == 0 and "BK:tpu" in p.stdout


def _flag_already_set(flag: str, timeout_s: int = 180) -> bool:
    """Check a tuned-cache flag in a SUBPROCESS: tuned_flag() resolves
    the cache path via jax.devices(), which initializes the axon backend
    — in-process that could hang on a wedged tunnel (no timeout) and
    would hold the single-chip claim for the whole window while the step
    subprocesses try to claim the same chip."""
    code = ("from gpuseqalign_tpu.ops.pallas_wavefront2 import tuned_flag;"
            f"print('WV:' + str(tuned_flag({flag!r})))")
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return False
    return p.returncode == 0 and "WV:True" in p.stdout


# Steps skipped automatically once their tuned-cache flag is persisted
# (each validation drive writes its flag on PASS).
_STEP_FLAGS = {
    "validate_wrap": "wrap_tpu_validated",
    "validate_packedx": "packedx_tpu_validated",
    "validate_flags": "flags_tpu_validated",
    "validate_banded_flags": "banded_flags_tpu_validated",
    "validate_tiny": "tiny_tpu_validated",
}


def _step_cmds() -> "dict[str, list[str]]":
    py = sys.executable
    mod = lambda m, *a: [py, "-m", m, *a]  # noqa: E731
    return {
        "validate_wrap": mod("gpuseqalign_tpu.bench.validate_wrap_tpu"),
        "validate_packedx": mod(
            "gpuseqalign_tpu.bench.validate_packedx_tpu"),
        "validate_flags": mod(
            "gpuseqalign_tpu.bench.validate_flags_tpu"),
        "validate_banded_flags": mod(
            "gpuseqalign_tpu.bench.validate_banded_flags_tpu"),
        "validate_tiny": mod("gpuseqalign_tpu.bench.validate_tiny_tpu"),
        "giant_ab": mod("gpuseqalign_tpu.bench.giant_ab_tpu"),
        # Round-5a: corrected head-to-head retune (restores the true r4
        # production controls the r4d merge lost) + same-window body
        # probes incl. the sw_ag denominator.
        "sweep_r5a": mod("gpuseqalign_tpu.bench.sweep_r5a"),
        # Affine machinery split (the nw_ag gap localization).
        "gridcost_ag": mod("gpuseqalign_tpu.bench.vpu_probe", "gridcost",
                           "6", "23728", "affine"),
        "vpu_subk": mod("gpuseqalign_tpu.bench.vpu_probe", "subk"),
        "vpu_ablate": mod("gpuseqalign_tpu.bench.vpu_probe", "fullstep",
                          "7", "noacc,noprow,noxcarry,mincarry"),
        "bench": [py, os.path.join(REPO, "bench.py")],
        "scaling": mod("gpuseqalign_tpu.bench.scaling_report", "--quick"),
        "stream_ab_seq": mod(
            "gpuseqalign_tpu.bench.throughput", "--seqPath", "synth",
            "--synthPairs", "8,12000,20000", "--giantSequential",
            "--verify", "2", "--repeat", "2"),
        "stream_ab_stream": mod(
            "gpuseqalign_tpu.bench.throughput", "--seqPath", "synth",
            "--synthPairs", "8,12000,20000", "--giantStream",
            "--verify", "2", "--repeat", "2"),
        # Autotune refresh: re-measure the per-spec kernel defaults with
        # exact in-jit timing and merge them into the tuned cache (the
        # ROADMAP queue item "autotune refresh if the carry ablations
        # change the kernel" — also worthwhile after any Mosaic update).
        **{
            f"autotune_{s}": mod(
                "gpuseqalign_tpu.bench.autotune", "--save-defaults",
                "--seqPath", "resrc/seq_generated.fa",
                "--pair", "len23728", "len23728", "--algKind", s,
                "--gapeCost", "-2" if s.endswith("ag") else "0")
            for s in ("nw_lg", "nw_ag", "sw_lg", "sw_ag")
        },
    }


DEFAULT_STEPS = ("validate_wrap", "validate_packedx", "validate_flags",
                 "validate_banded_flags", "validate_tiny",
                 "vpu_subk", "vpu_ablate", "bench",
                 "scaling", "stream_ab_seq", "stream_ab_stream",
                 "autotune_nw_lg", "autotune_nw_ag", "autotune_sw_lg",
                 "autotune_sw_ag")


def _commit_harvest(step: str, log_path: str) -> "str | None":
    """Auto-commit tuned-cache writes with their evidence log, so a
    window's results can't be silently lost in the working tree (VERDICT
    r4: the r4d retune + its log sat uncommitted at round end). Copies
    the step log into measurements/ (logs/ is gitignored), stages it with
    resrc/tuned/, and commits. Returns the commit hash, None when the
    cache is unchanged, or warns loudly when git fails."""
    import shutil

    # Never commit from inside a test run: run_window is exercised by
    # the test suite with fake steps, and a real `git commit` there
    # would capture whatever happens to be dirty in the working tree
    # (observed once: a test committed an in-progress tuned-cache edit).
    if os.environ.get("PYTEST_CURRENT_TEST"):
        return None
    chk = subprocess.run(
        ["git", "status", "--porcelain", "resrc/tuned"],
        capture_output=True, text=True, cwd=REPO,
    )
    if chk.returncode != 0 or not chk.stdout.strip():
        return None
    try:
        dst = os.path.join(
            REPO, "measurements",
            f"tpu_window_{os.path.basename(os.path.dirname(log_path))}"
            f"_{step}.log",
        )
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(log_path, dst)
        subprocess.run(["git", "add", "resrc/tuned", dst],
                       check=True, cwd=REPO, capture_output=True)
        # Path-limited commit: unrelated staged content (another tool's
        # in-flight `git add`) must not ride along with the harvest.
        subprocess.run(
            ["git", "commit", "-m",
             f"tpu_window harvest: {step} tuned-cache update",
             "--", "resrc/tuned", dst],
            check=True, cwd=REPO, capture_output=True,
        )
        h = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                           capture_output=True, text=True, cwd=REPO)
        return h.stdout.strip()
    except Exception as e:
        print(f"[tpu_window] WARNING: tuned cache changed by {step} but "
              f"auto-commit failed ({type(e).__name__}: {e}) — commit "
              f"resrc/tuned + {log_path} manually or the harvest is at "
              f"risk", file=sys.stderr)
        return None


def run_window(steps: List[str], log_dir: str, step_timeout: int,
               probe_timeout: int, force: bool = False) -> dict:
    """Run the queued steps; returns the summary dict (also written to
    <log_dir>/summary.json incrementally, so a killed run keeps data).
    ``force`` re-runs validation steps even when their tuned-cache flag
    is already set (required after ANY kernel change: the persisted flag
    vouches for the code that was on disk when the drive ran)."""
    os.makedirs(log_dir, exist_ok=True)
    cmds = _step_cmds()
    summary: dict = {"log_dir": log_dir, "steps": []}

    def flush():
        with open(os.path.join(log_dir, "summary.json"), "w",
                  encoding="utf-8") as f:
            json.dump(summary, f, indent=2)
            f.write("\n")

    for name in steps:
        if (not force and name in _STEP_FLAGS
                and _flag_already_set(_STEP_FLAGS[name])):
            print(f"[tpu_window] {name}: SKIP (flag already set)")
            summary["steps"].append({"step": name, "skipped": True})
            flush()
            continue
        if not tpu_reachable(probe_timeout):
            print(f"[tpu_window] tunnel dropped before {name}; stopping",
                  file=sys.stderr)
            summary["tunnel_dropped_before"] = name
            flush()
            return summary
        log_path = os.path.join(log_dir, f"{name}.log")
        t0 = time.time()
        try:
            with open(log_path, "w", encoding="utf-8") as lf:
                p = subprocess.run(
                    cmds[name], stdout=lf, stderr=subprocess.STDOUT,
                    cwd=REPO, timeout=step_timeout,
                )
            rc: "int | str" = p.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        dt = time.time() - t0
        tail = ""
        try:
            with open(log_path, "r", encoding="utf-8") as lf:
                tail = "".join(lf.readlines()[-12:])
        except OSError:
            pass
        print(f"[tpu_window] {name}: rc={rc} in {dt:.0f}s -> {log_path}")
        entry = {
            "step": name, "rc": rc, "seconds": round(dt, 1),
            "log": log_path, "tail": tail,
        }
        commit = _commit_harvest(name, log_path)
        if commit:
            print(f"[tpu_window] {name}: tuned cache committed ({commit})")
            entry["harvest_commit"] = commit
        summary["steps"].append(entry)
        flush()
    summary["complete"] = True
    flush()
    return summary


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--waitHours", type=float, default=0.0,
                    help="poll the tunnel every 5 min for up to H hours "
                         "before giving up (0 = one probe only)")
    ap.add_argument("--steps", default=",".join(DEFAULT_STEPS),
                    help="comma list from: " + ",".join(DEFAULT_STEPS))
    ap.add_argument("--stepTimeout", type=int, default=2400)
    ap.add_argument("--probeTimeout", type=int, default=180)
    ap.add_argument("--force", action="store_true",
                    help="re-run validation steps even when their "
                         "tuned-cache flag is already set (use after "
                         "any kernel change)")
    ap.add_argument("--logDir", default="",
                    help="default logs/tpu_window_<ts>/")
    args = ap.parse_args(argv)

    steps = [s for s in args.steps.split(",") if s]
    bad = set(steps) - set(_step_cmds())
    if bad:
        ap.error(f"unknown steps: {sorted(bad)}")

    deadline = time.time() + args.waitHours * 3600
    up = tpu_reachable(args.probeTimeout)
    while not up and time.time() < deadline:
        print("[tpu_window] tunnel down; retrying in 5 min", file=sys.stderr)
        time.sleep(300)
        up = tpu_reachable(args.probeTimeout)
    if not up:
        print("[tpu_window] tunnel unreachable; nothing run",
              file=sys.stderr)
        return 3

    ts = time.strftime("%Y%m%d_%H%M%S")
    log_dir = args.logDir or os.path.join(REPO, "logs", f"tpu_window_{ts}")
    summary = run_window(steps, log_dir, args.stepTimeout,
                         args.probeTimeout, force=args.force)
    done = summary.get("complete", False)
    print(json.dumps({
        "complete": done,
        "steps_run": len(summary["steps"]),
        "log_dir": log_dir,
    }))
    return 0 if done else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
