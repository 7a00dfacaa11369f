"""Plain (dense-matrix) result ops: traceback, score hash, printers.

TPU-native re-design of the reference's plain result ops
(ref: src/nwtrace1_plain.cpp, src/print_mat.hpp). The traceback itself is an
inherently sequential O(rows+cols) walk, so it runs on host — accelerated by
the native C++ runtime when available (native/nw_native.cpp), with the
oracle's Python walk as fallback. Timing laps use the reference's names.
"""

from __future__ import annotations

from typing import TextIO

import numpy as np

from ..core.types import AlgInput, AlgResult, AlignKind, GapKind, Status
from ..core.hashing import djb2_array
from ..models import oracle as _oracle


def trace_plain(nw: AlgInput, res: AlgResult, calc_debug_trace: bool) -> Status:
    sw = res.sw_trace
    sw.start()

    if nw.score is None:
        return Status.errorInvalidValue
    sw.lap("trace.alloc")

    mats = {"H": nw.score}
    if nw.spec.kind == AlignKind.SW:
        mats["best"] = np.array([nw.best_i, nw.best_j], dtype=np.int64)
    if nw.spec.gap == GapKind.AFFINE:
        # Rebuild E/F from the sequences — the kernels only keep H dense.
        full = _oracle.oracle_align_dense(
            nw.spec, nw.subst, nw.seqY, nw.seqX, nw.gapo_cost, nw.gape_cost
        )
        mats["E"] = full["E"]
        mats["F"] = full["F"]

    use_native = (
        nw.spec.kind == AlignKind.NW
        and nw.spec.gap == GapKind.LINEAR
        and not calc_debug_trace
    )
    transcript = None
    if use_native:
        try:
            from ..native import trace_linear_nw_native

            transcript, thash = trace_linear_nw_native(nw.score, nw.seqY, nw.seqX)
        except Exception:
            transcript = None
    if transcript is None:
        transcript, thash, cells = _oracle.oracle_trace_dense(
            nw.spec, mats, nw.subst, nw.seqY, nw.seqX,
            nw.gapo_cost, nw.gape_cost, debug=calc_debug_trace,
        )
        if calc_debug_trace:
            nw.trace = cells

    res.edit_trace = transcript
    res.trace_hash = thash
    sw.lap("trace.calc")
    return Status.success


def hash_plain(nw: AlgInput, res: AlgResult) -> Status:
    sw = res.sw_hash
    sw.start()
    if nw.score is None:
        return Status.errorInvalidValue
    res.score_hash = djb2_array(nw.score)
    sw.lap("hash.calc")
    return Status.success


def print_score_plain(os: TextIO, nw: AlgInput, res: AlgResult) -> Status:
    """Fixed-width matrix dump (ref: src/print_mat.hpp:8-95)."""
    if nw.score is None:
        return Status.errorInvalidValue
    for i in range(nw.adjrows):
        row = nw.score[i]
        os.write("".join(f"{int(v):4d}," for v in row))
        os.write("\n")
    return Status.success


def print_trace_plain(os: TextIO, nw: AlgInput, res: AlgResult) -> Status:
    vals = nw.trace or []
    os.write("".join(f"{int(v):4d}," for v in vals))
    os.write("\n")
    return Status.success
