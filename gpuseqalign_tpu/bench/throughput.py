"""Batch throughput benchmark: aligned pairs/s (BASELINE.json metric:
"aligned pairs/s at N hosts").

Aligns every pair of a pair file through the batch engine
(parallel/batch.py: shape-bucketed, vmapped/Pallas-chained, optionally
mesh-sharded) and reports pairs/s and aggregate GCUPS. Costs are verified
against the CPU oracle for --verify sampled pairs.

Usage:
    python -m gpuseqalign_tpu.bench.throughput \
        --seqPath resrc/seq_generated.fa --seqPairPath resrc/pair_generated_1.txt \
        [--algKind nw_lg] [--devices N] [--verify 5]
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional

import numpy as np


def _run_streaming(args, spec, subst, letter_map) -> int:
    """Streaming all-vs-first throughput: constant host memory.

    The first record is the shared X (ref default pairing,
    src/cmd_parser.cpp:467-499 aligns every sequence with the first);
    subsequent records are chunked and aligned per chunk.
    """
    from ..io.fasta import iter_seq_file
    from ..parallel import align_pairs_batched, make_mesh
    from ..models.oracle import align_cost_of, oracle_align_dense

    mesh = make_mesh(args.devices) if args.devices else None
    first = None
    chunk: list = []
    n_pairs = 0
    cells = 0
    n_bad = 0
    n_verified = 0
    # Timed window = the align calls only: the O(n^2) CPU-oracle
    # verification and the FASTA parse must not deflate the reported
    # pairs/s (jit compiles per shape bucket still land in the first
    # chunk of each bucket — inherent to a single-pass stream; noted in
    # the output line).
    t = 0.0

    def run_chunk(pairs):
        nonlocal t
        t0 = time.perf_counter()
        out = align_pairs_batched(
            spec, subst, pairs, args.gapoCost, args.gapeCost,
            mesh=mesh, quantum=args.quantum,
        )
        t += time.perf_counter() - t0
        return out

    for seq in iter_seq_file(args.seqPath, letter_map):
        if first is None:
            first = seq
            continue
        chunk.append((seq.seq, first.seq))
        if len(chunk) >= args.stream:
            out = run_chunk(chunk)
            if args.verify and n_verified < args.verify:
                y, x = chunk[0]
                mats = oracle_align_dense(
                    spec, subst, y, x, args.gapoCost, args.gapeCost
                )
                if out.costs[0] != align_cost_of(spec, mats):
                    n_bad += 1
                    print(f"MISMATCH pair {n_pairs}", file=sys.stderr)
                n_verified += 1
            n_pairs += len(chunk)
            cells += sum((len(y) - 1) * (len(x) - 1) for y, x in chunk)
            chunk = []
    if chunk:
        run_chunk(chunk)
        n_pairs += len(chunk)
        cells += sum((len(y) - 1) * (len(x) - 1) for y, x in chunk)
    print(
        f"{args.algKind} (streamed, chunk={args.stream}): {n_pairs} pairs "
        f"in {t * 1e3:.1f} ms align time (incl. per-bucket compiles) -> "
        f"{n_pairs / t:.1f} pairs/s, "
        f"{cells / t / 1e9:.2f} GCUPS agg"
        + (f", {n_bad} verify mismatches" if n_bad else ", verify ok")
    )
    return 1 if n_bad else 0


def _run_giant_stream(args, spec, subst, pairs, sequential=False) -> int:
    """Giant-pair STREAM throughput: the whole pair list through ONE
    pipelined distributed fill (parallel/giant2.align_giant2_stream) on a
    sequence-parallel mesh — the cross-device fill/drain bubble and the
    per-call dispatch overhead are paid once per stream, not per pair.

    sequential=True is the A/B baseline: one align_giant2 call per pair
    (same engine, same mesh), paying the bubble and dispatch per pair.
    """
    import jax

    from ..core.types import AlgInput, AlgParams, AlgResult, Status
    from ..models.oracle import align_cost_of, oracle_align_dense
    from ..parallel import align_giant2, align_giant2_stream
    from ..parallel.mesh import make_mesh as mk

    mesh = mk(args.devices or 1, axis_name="sp")
    interpret = jax.default_backend() != "tpu"
    inputs = []
    for y, x in pairs:
        nw = AlgInput()
        nw.subst = subst
        nw.substsz = subst.shape[0]
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost = args.gapoCost
        nw.gape_cost = args.gapeCost
        nw.spec = spec
        inputs.append(nw)
    cells = sum((len(y) - 1) * (len(x) - 1) for y, x in pairs)
    params = AlgParams({})

    def run():
        results = [AlgResult() for _ in inputs]
        if sequential:
            stats = [
                align_giant2(params, nw, res, mesh=mesh,
                             interpret=interpret)
                for nw, res in zip(inputs, results)
            ]
        else:
            stats = align_giant2_stream(params, inputs, results, mesh=mesh,
                                        interpret=interpret)
        bad = [s for s in stats if s != Status.success]
        if bad:
            raise RuntimeError(f"stream statuses: {stats}")
        return results

    results = run()  # warmup/compile
    ts = []
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        results = run()
        ts.append(time.perf_counter() - t0)
    t = min(ts)

    n_bad = 0
    if args.verify:
        idxs = np.linspace(0, len(pairs) - 1, min(args.verify, len(pairs)))
        for i in sorted({int(v) for v in idxs}):
            y, x = pairs[i]
            mats = oracle_align_dense(
                spec, subst, y, x, args.gapoCost, args.gapeCost
            )
            want = align_cost_of(spec, mats)
            if results[i].align_cost != want:
                n_bad += 1
                print(
                    f"MISMATCH pair {i}: {results[i].align_cost} vs "
                    f"oracle {want}",
                    file=sys.stderr,
                )
    mode = "giant sequential" if sequential else "giant stream"
    print(
        f"{args.algKind} ({mode}, D={args.devices or 1}): "
        f"{len(pairs)} pairs in {t * 1e3:.1f} ms -> "
        f"{len(pairs) / t:.1f} pairs/s, {cells / t / 1e9:.2f} GCUPS agg"
        + (f", {n_bad} verify mismatches" if n_bad else ", verify ok")
    )
    return 1 if n_bad else 0


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    from ..core.types import AlignSpec
    from ..io.fasta import parse_seq_file
    from ..io.pairs import default_pairs, parse_seq_pair_file
    from ..io.subst import parse_subst_file
    from ..parallel import align_pairs_batched, make_mesh
    from ..bench.driver import vector_substring_with_header

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seqPath", required=True)
    ap.add_argument("--seqPairPath", default="")
    ap.add_argument("--substPath", default="./resrc/subst.json")
    ap.add_argument("--substName", default="blosum62")
    ap.add_argument("--gapoCost", type=int, default=-11)
    ap.add_argument("--gapeCost", type=int, default=-2)
    ap.add_argument("--algKind", default="nw_lg")
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size for data-parallel sharding (0 = none)")
    ap.add_argument("--quantum", default="pow2",
                    help='int (linear padding) or "pow2" (geometric)')
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--verify", type=int, default=5,
                    help="verify N sampled pairs against the CPU oracle")
    ap.add_argument("--stream", type=int, default=0, metavar="CHUNK",
                    help="stream the FASTA (io.fasta.iter_seq_file) and "
                         "align all-vs-first pairs in chunks of CHUNK — "
                         "O(chunk) host memory for corpora larger than "
                         "RAM; incompatible with --seqPairPath")
    ap.add_argument("--giantStream", action="store_true",
                    help="route the pair list through ONE pipelined "
                         "giant-pair fill (align_giant2_stream) on a "
                         "--devices sequence-parallel mesh instead of "
                         "the batch engine — for streams of pairs too "
                         "large to batch")
    ap.add_argument("--giantSequential", action="store_true",
                    help="A/B baseline for --giantStream: one "
                         "align_giant2 call per pair (same engine/mesh), "
                         "paying the pipeline bubble and dispatch "
                         "overhead per pair")
    ap.add_argument("--synthPairs", default="", metavar="N,LMIN,LMAX",
                    help="benchmark N seeded random pairs with lengths "
                         "uniform in [LMIN, LMAX] instead of a pair "
                         "file — the many-small-pairs workload the "
                         "sublane-subblock Pallas path targets")
    args = ap.parse_args(argv)
    if args.quantum != "pow2":
        args.quantum = int(args.quantum)

    spec = AlignSpec.from_name(args.algKind)
    subst_data = parse_subst_file(args.substPath)
    subst = subst_data.subst_map[args.substName]

    if args.stream:
        if args.seqPairPath:
            ap.error("--stream only supports default all-vs-first pairing")
        return _run_streaming(args, spec, subst, subst_data.letter_map)

    if args.synthPairs:
        n_pairs, lmin, lmax = (int(v) for v in args.synthPairs.split(","))
        rng = np.random.default_rng(20260817)
        substsz = subst.shape[0]
        pairs = []
        for _ in range(n_pairs):
            r = int(rng.integers(lmin, lmax + 1))
            c = int(rng.integers(lmin, lmax + 1))
            y = np.zeros(1 + r, np.int32)
            y[1:] = rng.integers(0, substsz, r)
            x = np.zeros(1 + c, np.int32)
            x[1:] = rng.integers(0, substsz, c)
            pairs.append((y, x))
    else:
        seq_data = parse_seq_file(args.seqPath, subst_data.letter_map)
        if args.seqPairPath:
            pair_list = parse_seq_pair_file(
                args.seqPairPath, seq_data.seq_map
            )
        else:
            pair_list = default_pairs(seq_data.seq_map)

        pairs = []
        for p in pair_list:
            y = vector_substring_with_header(
                seq_data.seq_map[p.seqY_id].seq, p.seqY_range
            )
            x = vector_substring_with_header(
                seq_data.seq_map[p.seqX_id].seq, p.seqX_range
            )
            pairs.append((y, x))
    cells = sum((len(y) - 1) * (len(x) - 1) for y, x in pairs)

    if args.giantStream or args.giantSequential:
        return _run_giant_stream(args, spec, subst, pairs,
                                 sequential=args.giantSequential)

    mesh = make_mesh(args.devices) if args.devices else None

    # Warmup (compiles one program per shape bucket).
    out = align_pairs_batched(
        spec, subst, pairs, args.gapoCost, args.gapeCost,
        mesh=mesh, quantum=args.quantum,
    )
    ts = []
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        out = align_pairs_batched(
            spec, subst, pairs, args.gapoCost, args.gapeCost,
            mesh=mesh, quantum=args.quantum,
        )
        ts.append(time.perf_counter() - t0)
    t = min(ts)

    n_bad = 0
    if args.verify:
        from ..models.oracle import align_cost_of, oracle_align_dense

        idxs = np.linspace(0, len(pairs) - 1, min(args.verify, len(pairs)))
        for i in sorted({int(v) for v in idxs}):
            y, x = pairs[i]
            mats = oracle_align_dense(
                spec, subst, y, x, args.gapoCost, args.gapeCost
            )
            if out.costs[i] != align_cost_of(spec, mats):
                n_bad += 1
                print(
                    f"MISMATCH pair {i}: {out.costs[i]} vs oracle "
                    f"{align_cost_of(spec, mats)}",
                    file=sys.stderr,
                )

    print(
        f"{args.algKind}: {len(pairs)} pairs in {t * 1e3:.1f} ms -> "
        f"{len(pairs) / t:.1f} pairs/s, {cells / t / 1e9:.2f} GCUPS agg, "
        f"{out.n_buckets} shape buckets"
        + (f", {n_bad} verify mismatches" if n_bad else ", verify ok")
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
