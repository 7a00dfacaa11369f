"""Skew/unskew transforms: anti-diagonals <-> rows, via pad+reshape only.

The wavefront kernels vectorize the DP over anti-diagonals. To keep the
per-step memory access contiguous, the substitution profile is pre-SKEWED so
that step c reads row c; the dense kernels' outputs are UN-skewed back to
matrix rows. Both transforms are pure pad+transpose+reshape (free-ish data
movement for XLA), no gathers — the TPU analog of the reference's
parallelogram subtiling (ref: src/nwalign_gpu9_mlsp_diagdiagdiag.cu:205-316).

Index math (skew): given P of shape (R, C), produce S of shape (R+C-1, C)
with S[d, j] = P[d-j, j] wherever 0 <= d-j < R (other entries are junk that
callers must mask). Using the column-major flattening fc of P padded to
Rp = R+C rows: fc[j*Rp + i] = Ppad[i, j], so
    S[d, j] = fc[j*Rp + (d-j)] = fc[j*(Rp-1) + d]
i.e. S^T is fc reshaped with row stride Rp-1.

Index math (unskew): given S of shape (NS, C) holding S[d, j] = H[d-j, j],
recover H (R, C): H[i, j] = S[i+j, j]. With fc the column-major flattening
of S padded to NSp = NS+1 rows: H[i, j] = fc[j*NSp + i + j] = fc[j*(NSp+1) + i].
"""

from __future__ import annotations


def skew_rows(xp, P):
    """S[d, j] = P[d-j, j]; S shape (R+C-1, C); junk where d-j outside [0,R)."""
    R, C = P.shape
    Rp = R + C
    Ppad = xp.pad(P, ((0, Rp - R), (0, 0)))
    fc = Ppad.T.reshape(-1)  # fc[j*Rp + i] = Ppad[i, j]
    T = fc[: C * (Rp - 1)].reshape(C, Rp - 1)  # T[j, d] = fc[j*(Rp-1)+d]
    return T[:, : R + C - 1].T


def unskew_rows(xp, S, R):
    """H[i, j] = S[i+j, j]; S shape (NS, C) with NS >= R+C-1; H shape (R, C)."""
    NS, C = S.shape
    NSp = NS + 1
    Spad = xp.pad(S, ((0, 1), (0, 0)))
    fc = Spad.T.reshape(-1)  # fc[j*NSp + d] = Spad[d, j]
    fc = xp.pad(fc, (0, C * (NSp + 1) - fc.shape[0]))
    T = fc.reshape(C, NSp + 1)  # T[j, i] = fc[j*(NSp+1)+i]
    return T[:, :R].T


def unskew_cols(xp, V, C):
    """H[r, u] = V[u+r, r]; V shape (NS, R) with NS >= R+C-1; H shape (R, C).

    Used to turn a wavefront history (step-major, lane=row) back into the
    row-major score block: lane r at step c holds the cell in row r,
    column u = c - r.
    """
    NS, R = V.shape
    # H[r, u] = V[u+r, r] — same as unskew_rows with (i, j) -> (u, r), then
    # transpose: unskew_rows gives U[u, r] = V[u+r, r].
    return unskew_rows(xp, V, C).T
