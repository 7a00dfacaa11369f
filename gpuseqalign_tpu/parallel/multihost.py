"""Multi-host batch alignment: shard the pair list across processes and
merge per-pair results over DCN (SURVEY.md §5 "distributed communication
backend": batch sharding across hosts, results gathered with
process_allgather — the reference is single-process, so this layer is new
TPU-native capability).

Each process aligns the pairs it owns (round-robin by process index) on
its local devices through parallel/batch.py, then all processes exchange
fixed-size result blocks with ``multihost_utils.process_allgather``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.types import AlignSpec
from .batch import BatchResult, align_pairs_batched


def align_pairs_multihost(
    spec: AlignSpec,
    subst: np.ndarray,
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    gapo: int,
    gape: int = 0,
    quantum: int = 256,
) -> BatchResult:
    """Align the GLOBAL pair list (identical on every process); returns the
    full per-pair results on every process.

    Call after ``jax.distributed.initialize`` (see parallel.mesh
    .distributed_init). Single-process callers fall through to the local
    batch engine unchanged.
    """
    import jax

    n_proc = jax.process_count()
    if n_proc == 1:
        return align_pairs_batched(
            spec, subst, pairs, gapo, gape, quantum=quantum
        )

    from jax.experimental import multihost_utils

    pid = jax.process_index()
    n = len(pairs)
    my_idx = list(range(pid, n, n_proc))
    mine = [pairs[i] for i in my_idx]
    local = align_pairs_batched(
        spec, subst, mine, gapo, gape, quantum=quantum
    )

    # Fixed-size exchange block: every process owns at most ceil(n/P) pairs.
    per = -(-n // n_proc)
    block = np.zeros((per, 4), np.int32)  # [global_idx, cost, bi, bj]
    block[:, 0] = -1
    for row, gi in enumerate(my_idx):
        block[row] = (gi, local.costs[row], local.best_i[row],
                      local.best_j[row])

    gathered = np.asarray(
        multihost_utils.process_allgather(block)
    ).reshape(n_proc * per, 4)

    costs = np.zeros(n, np.int32)
    best_i = np.zeros(n, np.int32)
    best_j = np.zeros(n, np.int32)
    for gi, cost, bi, bj in gathered:
        if gi >= 0:
            costs[gi] = cost
            best_i[gi] = bi
            best_j[gi] = bj
    return BatchResult(costs, best_i, best_j)
