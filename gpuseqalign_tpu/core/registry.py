"""Algorithm registry (ref: src/nw_algorithm.{hpp,cpp}).

Each algorithm bundles five strategy functions — align / trace / hash /
print_score / print_trace (ref: src/nw_algorithm.hpp:8-40). The map is
insertion-ordered; reference algorithm names are registered as ALIASES of
their TPU-native re-designs so the reference's parameter files
(resrc/param_best.json, resrc/param_optimize.json) work unchanged
(ref: src/nw_algorithm.cpp:48-69 registers the original 13 names).

Alias mapping (reference -> this framework):
  NwAlign_Cpu1_St_Row        -> cpu1_st_row        (host oracle, row sweep)
  NwAlign_Cpu2_St_Diag       -> cpu2_st_diag       (host, anti-diagonal order)
  NwAlign_Cpu3_St_DiagRow    -> cpu3_st_diagrow    (host, tiled)
  NwAlign_Cpu4_Mt_DiagRow    -> cpu4_mt_diagrow    (host, tiled + OpenMP)
  NwAlign_Gpu1_Ml_Diag       -> tpu1_xla_diag      (XLA scan over diagonals)
  NwAlign_Gpu2_Ml_DiagRow2Pass -> tpu2_xla_rowscan (XLA row max-plus scan)
  NwAlign_Gpu3_Ml_DiagDiag   -> tpu3_pallas_dense  (dense v2 Pallas kernel,
                                    all specs: in-kernel lookup + wavefront
                                    history unskewed in XLA)
  NwAlign_Gpu4_Ml_DiagDiag2Pass -> tpu3_pallas_dense (separable-init pre-pass
                                    is inherent: the profile is precomputed)
  NwAlign_Gpu5_Coop_DiagDiag -> tpu3_pallas_dense  (grid-sync == one fused
                                    compiled loop, the natural TPU form)
  NwAlign_Gpu6_Coop_DiagDiag2Pass -> tpu3_pallas_dense
  NwAlign_Gpu7_Mlsp_DiagDiag -> tpu7_pallas_mlsp   (sparse tile headers)
  NwAlign_Gpu8_Mlsp_DiagDiag -> tpu7_pallas_mlsp   (register-lane wavefront
                                    == the kernel's roll-carry lanes)
  NwAlign_Gpu9_Mlsp_DiagDiagDiag -> tpu7_pallas_mlsp
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, TextIO

from .types import AlgInput, AlgParams, AlgResult, Status

AlignFn = Callable[[AlgParams, AlgInput, AlgResult], Status]
TraceFn = Callable[[AlgInput, AlgResult, bool], Status]
HashFn = Callable[[AlgInput, AlgResult], Status]
PrintFn = Callable[[TextIO, AlgInput, AlgResult], Status]


@dataclasses.dataclass
class Algorithm:
    align: AlignFn
    trace: TraceFn
    hash: HashFn
    print_score: PrintFn
    print_trace: PrintFn


def get_algorithm_map() -> Dict[str, Algorithm]:
    """Build the name -> Algorithm map (insertion-ordered)."""
    from ..models import cpu_algs
    from ..trace import plain, sparse
    from ..ops import xla_kernels, pallas_kernels

    def dense(align_fn: AlignFn) -> Algorithm:
        return Algorithm(
            align=align_fn,
            trace=plain.trace_plain,
            hash=plain.hash_plain,
            print_score=plain.print_score_plain,
            print_trace=plain.print_trace_plain,
        )

    def mlsp(align_fn: AlignFn) -> Algorithm:
        return Algorithm(
            align=align_fn,
            trace=sparse.trace_sparse,
            hash=sparse.hash_sparse,
            print_score=sparse.print_score_sparse,
            print_trace=plain.print_trace_plain,
        )

    algs: Dict[str, Algorithm] = {}

    # Host oracles.
    algs["cpu1_st_row"] = dense(cpu_algs.align_cpu1_st_row)
    algs["cpu2_st_diag"] = dense(cpu_algs.align_cpu2_st_diag)
    algs["cpu3_st_diagrow"] = dense(cpu_algs.align_cpu3_st_diagrow)
    algs["cpu4_mt_diagrow"] = dense(cpu_algs.align_cpu4_mt_diagrow)

    # TPU kernels.
    algs["tpu1_xla_diag"] = dense(xla_kernels.align_xla_diag)
    algs["tpu2_xla_rowscan"] = dense(xla_kernels.align_xla_rowscan)
    algs["tpu3_pallas_dense"] = dense(pallas_kernels.align_pallas_dense)
    algs["tpu7_pallas_mlsp"] = mlsp(pallas_kernels.align_pallas_mlsp)

    # Distributed giant-pair engine (extension; no reference analog —
    # the reference is single-GPU): one pair's columns split into one
    # band per device, ppermute halo exchange per pipeline step. On TPU
    # the per-band fill is the banded v2 Pallas kernel (all specs); on
    # other backends the portable XLA giant engine (NW_LG).
    def align_giant(pr, nw, res):
        import jax

        from ..parallel.giant import align_giant_mlsp
        from ..parallel.giant2 import align_giant2
        from .types import AlignKind, GapKind

        if jax.default_backend() == "tpu":
            return align_giant2(pr, nw, res)
        if nw.spec.kind == AlignKind.NW and nw.spec.gap == GapKind.LINEAR:
            return align_giant_mlsp(pr, nw, res)
        # Extension specs have no XLA giant form; run the banded Pallas
        # engine in interpret mode so the full CLI surface (all four
        # specs) stays drivable off-TPU.
        return align_giant2(pr, nw, res, interpret=True)

    algs["tpu9_giant_mlsp"] = mlsp(align_giant)

    # Reference-name aliases (same objects).
    aliases = {
        "NwAlign_Cpu1_St_Row": "cpu1_st_row",
        "NwAlign_Cpu2_St_Diag": "cpu2_st_diag",
        "NwAlign_Cpu3_St_DiagRow": "cpu3_st_diagrow",
        "NwAlign_Cpu4_Mt_DiagRow": "cpu4_mt_diagrow",
        "NwAlign_Gpu1_Ml_Diag": "tpu1_xla_diag",
        "NwAlign_Gpu2_Ml_DiagRow2Pass": "tpu2_xla_rowscan",
        "NwAlign_Gpu3_Ml_DiagDiag": "tpu3_pallas_dense",
        "NwAlign_Gpu4_Ml_DiagDiag2Pass": "tpu3_pallas_dense",
        "NwAlign_Gpu5_Coop_DiagDiag": "tpu3_pallas_dense",
        "NwAlign_Gpu6_Coop_DiagDiag2Pass": "tpu3_pallas_dense",
        "NwAlign_Gpu7_Mlsp_DiagDiag": "tpu7_pallas_mlsp",
        "NwAlign_Gpu8_Mlsp_DiagDiag": "tpu7_pallas_mlsp",
        "NwAlign_Gpu9_Mlsp_DiagDiagDiag": "tpu7_pallas_mlsp",
    }
    for ref_name, our_name in aliases.items():
        algs[ref_name] = algs[our_name]

    return algs
