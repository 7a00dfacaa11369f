"""Multi-chip engines: batched pairs (data parallel) and giant pairs
(sequence parallel with ICI halo exchange). SURVEY.md §2.9 / §5."""

from .mesh import batch_sharding, distributed_init, make_mesh, replicated
from .batch import BatchResult, align_pairs_batched, bucket_pairs, scores_batch
from .giant import align_giant_mlsp, giant_mlsp_nw_lg
from .giant2 import (
    align_giant2,
    align_giant2_nw_lg,
    align_giant2_stream,
    giant2_fill,
)
from .multihost import align_pairs_multihost

__all__ = [
    "BatchResult",
    "align_giant2",
    "align_giant2_nw_lg",
    "align_giant2_stream",
    "giant2_fill",
    "align_giant_mlsp",
    "align_pairs_multihost",
    "align_pairs_batched",
    "batch_sharding",
    "bucket_pairs",
    "distributed_init",
    "giant_mlsp_nw_lg",
    "make_mesh",
    "replicated",
    "scores_batch",
]
