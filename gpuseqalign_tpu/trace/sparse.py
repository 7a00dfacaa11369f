"""Sparse (mlsp) result ops: tile-recompute traceback, rolling-row hash.

Re-design of the reference's sparse result ops (ref: src/nwtrace2_sparse.cpp).
The score matrix is represented ONLY by per-tile header rows/columns
(tileHrowMat / tileHcolMat, layouts identical to
ref: src/nwalign_gpu7_mlsp_diagdiag.cu:348-352); the traceback recomputes one
tile interior at a time from its stored headers, stepping to the up/left
neighbour tile when it crosses into the header row/column
(ref: src/nwtrace2_sparse.cpp:186-205). The score hash recomputes the full
matrix with two rolling rows so the byte stream — and therefore the hash —
is identical to the dense hash (ref: src/nwtrace2_sparse.cpp:263-340).

Currently implemented for the NW linear-gap spec (the reference's parity
surface); affine/SW sparse ops are routed to their dense equivalents by the
registry until the E/F header representation lands.
"""

from __future__ import annotations

import dataclasses
from typing import TextIO, Tuple

import numpy as np

from ..core.hashing import djb2_array, djb2_init, djb2_ints, djb2_str
from ..core.transcript import rle_from_edits
from ..core.types import AlgInput, AlgResult, AlignKind, GapKind, Status
from ..models.oracle import _row_chain_max


@dataclasses.dataclass
class TileCo:
    i_tile: int = 0
    j_tile: int = 0
    i_elem: int = 0
    j_elem: int = 0


def get_tile_and_elem_ij(nw: AlgInput, i: int, j: int) -> TileCo:
    """(ref: src/nwtrace2_sparse.cpp:8-38) Tiles are extended with their
    header row/column and exclude their last row/column (which is the next
    tile's header). Saturates at the last tile row/column."""
    co = TileCo()
    th = nw.tile_hcol_len - 1  # tile height (rows per tile, sans header)
    tw = nw.tile_hrow_len - 1  # tile width
    co.i_tile, co.i_elem = divmod(i, th)
    co.j_tile, co.j_elem = divmod(j, tw)
    if co.i_tile == nw.tile_hdr_mat_rows:
        co.i_tile -= 1
        co.i_elem += th
    if co.j_tile == nw.tile_hdr_mat_cols:
        co.j_tile -= 1
        co.j_elem += tw
    return co


def align_tile(tile: np.ndarray, nw: AlgInput, co: TileCo) -> None:
    """Recompute one tile interior from its stored headers
    (ref: src/nwtrace2_sparse.cpp:40-96). Rows are computed with the
    max-plus prefix scan; cells past adjrows/adjcols are zero-filled."""
    hrow_len = nw.tile_hrow_len
    hcol_len = nw.tile_hcol_len
    k = nw.tile_hdr_mat_cols * co.i_tile + co.j_tile

    tile[0, :] = nw.tileHrowMat[k]
    tile[:, 0] = nw.tileHcolMat[k]

    ibeg = co.i_tile * (hcol_len - 1)
    jbeg = co.j_tile * (hrow_len - 1)
    iend = min(hcol_len, co.i_elem + 1)
    jend = min(hrow_len, co.j_elem + 1)
    if iend <= 1 or jend <= 1:
        return

    g = np.int32(nw.gapo_cost)
    jj = jbeg + np.arange(1, jend)
    j_in = np.minimum(jj, nw.adjcols - 1)  # clamp for x-letter lookup
    xs = nw.seqX[j_in]
    valid_j = jj < nw.adjcols

    for i in range(1, iend):
        gi = ibeg + i
        if gi >= nw.adjrows:
            tile[i, 1:jend] = 0
            continue
        prev = tile[i - 1, :jend]
        srow = nw.subst[nw.seqY[gi], xs]
        cand = np.maximum(prev[:-1] + srow, prev[1:] + g).astype(np.int32)
        row = _row_chain_max(cand, int(tile[i, 0]), nw.gapo_cost)
        row[1:][~valid_j] = 0
        tile[i, 1:jend] = row[1:]


def _sparse_supported(nw: AlgInput) -> bool:
    return nw.spec.kind == AlignKind.NW and nw.spec.gap == GapKind.LINEAR


def trace_sparse(nw: AlgInput, res: AlgResult, calc_debug_trace: bool) -> Status:
    """(ref: src/nwtrace2_sparse.cpp:102-257)"""
    if not _sparse_supported(nw) or nw.tileHrowMat is None:
        return Status.errorInvalidValue

    sw = res.sw_trace
    sw.start()
    tile = np.zeros((nw.tile_hcol_len, nw.tile_hrow_len), dtype=np.int32)
    sw.lap("trace.alloc")

    i = nw.adjrows - 1
    j = nw.adjcols - 1
    co = get_tile_and_elem_ij(nw, i, j)
    align_tile(tile, nw, co)

    edits = []  # walk order (bottom-right to top-left)
    cells = []
    while True:
        if calc_debug_trace:
            cells.append(int(tile[co.i_elem, co.j_elem]))

        mx = None
        di = dj = 0
        edit = None
        if co.i_elem > 0 and co.j_elem > 0:
            mx = int(tile[co.i_elem - 1, co.j_elem - 1])
            di = dj = -1
            edit = "=" if nw.seqX[j] == nw.seqY[i] else "X"
        if co.i_elem > 0 and (mx is None or mx < int(tile[co.i_elem - 1, co.j_elem])):
            mx = int(tile[co.i_elem - 1, co.j_elem])
            di, dj = -1, 0
            edit = "I"
        if co.j_elem > 0 and (mx is None or mx < int(tile[co.i_elem, co.j_elem - 1])):
            mx = int(tile[co.i_elem, co.j_elem - 1])
            di, dj = 0, -1
            edit = "D"
        i += di
        j += dj
        co.i_elem += di
        co.j_elem += dj

        di_tile = -1 if (co.i_elem == 0 and co.i_tile > 0) else 0
        dj_tile = -1 if (co.j_elem == 0 and co.j_tile > 0) else 0
        if di_tile != 0 or dj_tile != 0:
            co.i_tile += di_tile
            co.j_tile += dj_tile
            if co.i_elem == 0 and di != 0:
                co.i_elem = nw.tile_hcol_len - 1
            if co.j_elem == 0 and dj != 0:
                co.j_elem = nw.tile_hrow_len - 1
            align_tile(tile, nw, co)

        if edit is not None:
            edits.append(edit)
        if di == 0 and dj == 0:
            break

    edits.reverse()
    cells.reverse()
    res.edit_trace = rle_from_edits(edits)
    sw.lap("trace.calc")

    if calc_debug_trace:
        nw.trace = cells
    h = djb2_str(res.edit_trace, djb2_init())
    if calc_debug_trace:
        h = djb2_ints(cells, h)
    res.trace_hash = h
    return Status.success


def _recompute_rows(nw: AlgInput):
    """Yield every row of the full logical score matrix, recomputed with two
    rolling rows (observable behavior of ref: src/nwtrace2_sparse.cpp:263-340)."""
    g = np.int32(nw.gapo_cost)
    adjcols = nw.adjcols
    xs = nw.seqX[1:]
    row = (np.arange(adjcols, dtype=np.int32) * g).astype(np.int32)
    yield row
    prev = row
    for i in range(1, nw.adjrows):
        srow = nw.subst[nw.seqY[i], xs]
        cand = np.maximum(prev[:-1] + srow, prev[1:] + g).astype(np.int32)
        prev = _row_chain_max(cand, int(np.int32(i) * g), nw.gapo_cost)
        yield prev


def hash_sparse(nw: AlgInput, res: AlgResult) -> Status:
    if not _sparse_supported(nw):
        return Status.errorInvalidValue
    sw = res.sw_hash
    sw.start()
    h = djb2_init()
    for row in _recompute_rows(nw):
        h = djb2_array(row, h)
    res.score_hash = h
    sw.lap("hash.calc")
    return Status.success


def print_score_sparse(os: TextIO, nw: AlgInput, res: AlgResult) -> Status:
    """(ref: src/nwtrace2_sparse.cpp:346-419)"""
    if not _sparse_supported(nw):
        return Status.errorInvalidValue
    for row in _recompute_rows(nw):
        os.write("".join(f"{int(v):4d}," for v in row))
        os.write("\n")
    return Status.success
