"""Giant-pair engine v2: column bands x Pallas banded kernel, ALL specs.

Same decomposition as parallel/giant.py (one giant pair's columns split
into one band per chip; row blocks advance in an echelon pipeline; the
only cross-chip traffic is the band's right-edge header column(s) over
ICI via lax.ppermute) — but the per-device block fill is the full-speed
v2 Pallas kernel (ops/pallas_banded.py) instead of the XLA row-scan, so
each chip contributes ~its single-pair v2 throughput.

Pipeline: pass p covers BL = KB*K row blocks (KB echelon groups run as
ONE wrap-echelon pallas_call when KB > 1 — see pick_kb); at step t device
k runs pass t - k. The halo message per step is (BL*R + 1) int32 H values
(plus BL*R E values for affine specs — a tile's left-column dependency
set under Gotoh is the (H, E) pair, see core/types.py AlignSpec).

Efficiency model: the scan runs n_pass + D - 1 steps of which each
device computes during n_pass, so the fill/drain bubble bounds
per-device utilization at n_pass / (n_pass + D - 1) — e.g. a 100k-row
pair at R=2048, K=4 has n_pass = 13, so 13/16 = 81% at D=4 before ICI
costs. Choose K*R (the rows per pass) small enough that n_pass >> D.
bench/scaling_report.py measures the realized ratio on a CPU mesh
("giant_pair": D=4 per-device GCUPS over D=1). NW linear-gap is the
reference's mlsp surface (ref: src/nwalign_gpu7_mlsp_diagdiag.cu:247-285
lifted across chips); NW_AG / SW_LG / SW_AG are capability extensions
verified against models/oracle.py. SW's global argmax is reduced from the
per-lane in-kernel bv/bc captures on host after the gather, with the
reference's row-major-first tie order.

Outputs are the standard mlsp sparse layout (plus F-row / E-col header
mats for affine), so sparse traceback/hash (trace/sparse.py) verify
bit-exactly against the CPU oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.types import (
    AlgInput,
    AlgParams,
    AlgResult,
    AlignKind,
    GapKind,
    NEG_INF_I32,
    Status,
)
from ..ops.pallas_banded import banded_pass, wrap_ok
from ..ops.pallas_wavefront2 import _cdiv, _pack_planes

# Wrap-banded (KB > 1) on REAL TPU hardware: auto-KB engages only after
# the kernel has passed the on-chip differential drive
# (bench/validate_wrap_tpu.py), which persists `wrap_tpu_validated` in
# the per-device-kind tuned cache. The module flag is a test override.
_WRAP_TPU_VALIDATED = False


def _wrap_validated() -> bool:
    from ..ops.pallas_wavefront2 import tuned_flag

    return _WRAP_TPU_VALIDATED or tuned_flag("wrap_tpu_validated")


def _kernel_flags(
    pr: AlgParams, spec
) -> "tuple[int, bool, bool, bool, bool]":
    """(K_override, packedx, packedef, remath, subprow) for the banded
    kernel.

    Explicit params always win. Otherwise, on a real TPU, the tuned
    cache's per-spec ``banded`` sub-entry applies once the on-chip
    differential drive has persisted ``banded_flags_tpu_validated``
    (bench/validate_banded_flags_tpu.py) — the same gating pattern as
    wrap_tpu_validated. Elsewhere (CPU mesh, interpret) the flags stay
    off unless explicitly requested.
    """
    px = pr.get("packedx", None)
    pe = pr.get("packedef", None)
    rm = pr.get("rematHdr", None)
    sp = pr.get("subProw", None)
    k_b = 0
    if px is None and pe is None and rm is None and sp is None:
        try:
            from ..ops.pallas_wavefront2 import tuned_cache, tuned_flag

            if (jax.default_backend() == "tpu"
                    and tuned_flag("banded_flags_tpu_validated")):
                name = f"{spec.kind.value}" \
                       f"_{'ag' if spec.gap == GapKind.AFFINE else 'lg'}"
                ent = tuned_cache().get(name, {}).get("banded", {})
                px = ent.get("packedx", 0)
                pe = ent.get("packedef", 0)
                rm = ent.get("rematHdr", 0)
                sp = ent.get("subProw", 0)
                k_b = int(ent.get("kChains", 0))
        except Exception:
            pass
    return (k_b, bool(px or 0), bool(pe or 0), bool(rm or 0),
            bool(sp or 0))


def pick_kb(n_blocks, K: int, D: int, *, R: int, W: int,
            band_cols: int, kb_max: int = 8) -> int:
    """Echelon groups per pass (pass height = KB*K*R rows), by the analytic
    efficiency model: per-device utilization is
        [n_pass / (n_pass + D - 1)]        cross-device pipeline fill/drain
      * [KB*SPB / (KB*SPB + (K-1)*offw)]   in-kernel echelon drain per pass
      / [padded-rows factor]               row padding to n_pass*KB*K*R
    KB > 1 runs the wrap (continuous) echelon inside banded_pass, paying
    the in-kernel drain once per PASS instead of once per K-block group —
    a win when passes are plentiful (n_pass >> D), a loss when the bigger
    pass height starves the cross-device pipeline.

    n_blocks: per-pair row-block count — an int, or a sequence for a
    pipelined stream of pairs (align_giant2_stream), where the pipeline
    bubble is paid once over sum(n_pass_i) but padding accrues per pair.
    """
    nbs = [n_blocks] if isinstance(n_blocks, int) else list(n_blocks)
    if max(nbs) <= K or not wrap_ok(R=R, W=W, K=K, band_cols=band_cols):
        return 1
    NSpad = _cdiv(R + band_cols - 1 + 128, W) * W
    SPB = NSpad // W
    drain = (K - 1) * (W * _cdiv(R + 256, W)) // W
    nb_tot = sum(nbs)
    best_kb, best_eff = 1, 0.0
    for kb in range(1, kb_max + 1):
        n2 = sum(_cdiv(nb, K * kb) for nb in nbs)
        pad = (n2 * K * kb) / nb_tot
        eff = (n2 / (n2 + D - 1)) * (kb * SPB) / (kb * SPB + drain) / pad
        if eff > best_eff + 1e-9:
            best_kb, best_eff = kb, eff
    return best_kb


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "R", "W", "TW", "K", "band_cols", "n_pass",
        "kind", "gap", "interpret", "KB", "masked", "packedx",
        "packedef", "remath", "subprow",
    ),
)
def giant2_fill(subst, y, x_nohdr, gapo, gape, adjr, adjc, *, mesh: Mesh,
                axis: str = "sp", R: int, W: int, TW: int, K: int,
                band_cols: int, n_pass: int, kind: str = "nw",
                gap: str = "linear", interpret: bool = False, KB: int = 1,
                pass2pair=None, pass2local=None,
                masked: "bool | None" = None, packedx: bool = False,
                packedef: bool = False, remath: bool = False,
                subprow: bool = False):
    """Distributed sparse fill, any spec — one pair or a PIPELINED STREAM
    of pairs (align_giant2_stream): the scan runs sum(n_pass_i) + D - 1
    steps total, so the cross-device fill/drain bubble (D - 1 steps) is
    paid once per stream instead of once per pair.

    y: (1 + n_pass*KB*K*R,) with header element, replicated — for a
       stream, the pairs' padded row letters concatenated pass-major
       behind one shared header element.
    x_nohdr: (n_pairs, D * band_cols) letters without header (each pair's
       row padded to cols_p; sharded into bands along axis 1).
    adjr/adjc: (n_pairs,) true dims incl. header (traced; SW masking).
    pass2pair/pass2local: (n_pass,) int32 — global pass -> (pair index,
       pair-local pass). None = single pair (zeros / arange). A pass's
       carries (predecessor H/F rows) reset to the analytic header row at
       pass2local == 0; the ICI halo protocol is pair-agnostic because a
       global pass belongs to one pair on every device.
    KB: echelon groups per pass (see pick_kb) — each scan step fills
    BL = KB*K row blocks per band via banded_pass's wrap echelon.

    Returns a dict of gathered per-band streams:
      hrows: (B, D, prev_len)   per-band rows (b+1)*R, j=0 at c0
      hcols: (B, D, jtE+1, R)   per-band header cols at TW steps
      frows/ecols (affine):     F rows / E cols, same shapes
      bv/bc (SW):               (B, D, R) per-lane best value / local step
    (B = n_pass*KB*K; jtE = band_cols // TW; hcols[..., jl, :] holds column
    c0 + jl*TW; jl = jtE is the band's right edge. For a stream, block
    index b belongs to pair pass2pair[b // BL], local block
    pass2local[b // BL] * BL + b % BL.)
    """
    D = mesh.devices.size
    SUB = R // 128
    NSpad = _cdiv(R + band_cols - 1 + 128, W) * W
    prev_len = NSpad + 128
    jtE = band_cols // TW
    BL = KB * K
    B = n_pass * BL
    g = gapo
    ge = gape
    affine = gap == "affine"
    is_sw = kind == "sw"
    ninf = jnp.int32(NEG_INF_I32)

    if pass2pair is None:
        pass2pair = jnp.zeros(n_pass, jnp.int32)
    if pass2local is None:
        pass2local = jnp.arange(n_pass, dtype=jnp.int32)
    if x_nohdr.ndim == 1:
        x_nohdr = x_nohdr.reshape(1, -1)
    adjr = jnp.asarray(adjr, jnp.int32).reshape(-1)
    adjc = jnp.asarray(adjc, jnp.int32).reshape(-1)
    n_pairs = x_nohdr.shape[0]

    planes = _pack_planes(subst, y, B, R)  # (B, 8, SUB, 128), replicated

    def device_fn(subst_planes, xb, gsc, gesc, adjr, adjc, p2p, p2l):
        k = lax.axis_index(axis)
        g, ge = gsc, gesc
        c0 = k * band_cols
        # xb: (n_pairs, band_cols) — this band's letters per pair.
        xpad = jnp.zeros((n_pairs, NSpad), jnp.int32)
        xpad = xpad.at[:, :band_cols].set(xb)
        xwin_all = xpad.reshape(n_pairs, NSpad // W, W // 128, 128)

        # H[0, c0 + j]: the spec's header row at this band's columns
        # (pair-independent: same spec/costs across a stream).
        jj = c0 + jnp.arange(prev_len, dtype=jnp.int32)
        if is_sw:
            prev0 = jnp.zeros(prev_len, jnp.int32)
        elif affine:
            prev0 = jnp.where(jj == 0, 0, g + jj * ge)
        else:
            prev0 = jj * g
        prevF0 = jnp.full(prev_len, ninf, jnp.int32) if affine else None

        msg_len = BL * R + 1 + (BL * R if affine else 0)
        msg0 = jnp.zeros(msg_len, jnp.int32)
        perm = [(s, (s + 1) % D) for s in range(D)]

        def step(carry, t):
            prev_row, prevF_row, msg = carry
            halo = lax.ppermute(msg, axis, perm)
            p = t - k
            active = (p >= 0) & (p < n_pass)
            pc = jnp.clip(p, 0, n_pass - 1)
            pid = p2p[pc]
            pl = p2l[pc]
            row0 = pl * BL * R
            # A new pair's first pass starts from the analytic header row,
            # not the previous pair's carry.
            prev_in = jnp.where(pl == 0, prev0, prev_row)
            prevF_in = None
            if affine:
                prevF_in = jnp.where(pl == 0, prevF0, prevF_row)
            # Device 0's left border is the true DP header column.
            ii = row0 + jnp.arange(BL * R + 1, dtype=jnp.int32)
            if is_sw:
                hdrH = jnp.zeros(BL * R + 1, jnp.int32)
            elif affine:
                hdrH = jnp.where(ii == 0, 0, g + ii * ge)
            else:
                hdrH = ii * g
            haloH = jnp.where(k == 0, hdrH, halo[: BL * R + 1])
            haloE = None
            if affine:
                # E[i, 0] is undefined (-inf) at the true header column.
                haloE = jnp.where(
                    k == 0,
                    jnp.full(BL * R, ninf, jnp.int32),
                    halo[BL * R + 1:],
                )

            planes_p = lax.dynamic_slice(
                subst_planes, (pc * BL, 0, 0, 0), (BL, 8, SUB, 128)
            )
            xwin = lax.dynamic_slice(
                xwin_all, (pid, 0, 0, 0),
                (1, NSpad // W, W // 128, 128),
            )[0]
            out = banded_pass(
                planes_p, xwin, g, ge, prev_in, prevF_in, haloH, haloE,
                adjr[pid] - row0, adjc[pid] - c0,
                R=R, W=W, TW=TW, K=K, band_cols=band_cols, kind=kind,
                gap=gap, interpret=interpret, B=BL, masked=masked,
                packedx=packedx, packedef=packedef, remath=remath,
                subprow=subprow,
            )
            edge_top = prev_in[band_cols]
            rightH = out["hcol"][:, jtE].reshape(BL * R)
            parts = [edge_top[None], rightH]
            if affine:
                parts.append(out["ecol"][:, jtE].reshape(BL * R))
            new_msg = jnp.concatenate(parts)
            prev_row = jnp.where(active, out["hrow"][BL - 1], prev_row)
            if affine:
                prevF_row = jnp.where(
                    active, out["frow"][BL - 1], prevF_row
                )
            msg = jnp.where(active, new_msg, msg)

            ys = {
                "hrows": out["hrow"],
                "hcols": out["hcol"][:, : jtE + 1].reshape(BL, jtE + 1, R),
            }
            if affine:
                ys["frows"] = out["frow"]
                ys["ecols"] = out["ecol"][:, : jtE + 1].reshape(
                    BL, jtE + 1, R
                )
            if is_sw:
                ys["bv"] = out["bv"].reshape(BL, R)
                ys["bc"] = out["bc"].reshape(BL, R)
            return (prev_row, prevF_row, msg), ys

        steps = n_pass + D - 1
        _, ys_t = lax.scan(
            step, (prev0, prevF0, msg0), jnp.arange(steps, dtype=jnp.int32)
        )

        # Device k's pass p lives at step t = p + k.
        def pick(a):
            a = lax.dynamic_slice_in_dim(a, k, n_pass)
            return a.reshape((B, 1) + a.shape[2:])

        return {name: pick(a) for name, a in ys_t.items()}

    out_spec = {"hrows": P(None, axis), "hcols": P(None, axis)}
    if affine:
        out_spec["frows"] = P(None, axis)
        out_spec["ecols"] = P(None, axis)
    if is_sw:
        out_spec["bv"] = P(None, axis)
        out_spec["bc"] = P(None, axis)

    fn = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(), P(), P(), P(), P(), P()),
        out_specs=out_spec,
        check_vma=False,
    )
    out = fn(
        planes, x_nohdr, g, ge, adjr, adjc,
        jnp.asarray(pass2pair, jnp.int32),
        jnp.asarray(pass2local, jnp.int32),
    )
    if jax.process_count() > 1:
        # Multi-host: replicate the gathered streams (an all-gather over
        # DCN/ICI) so every process can device_get the full result.
        from jax.sharding import NamedSharding

        rep = NamedSharding(mesh, P())
        out = {kk: jax.lax.with_sharding_constraint(v, rep)
               for kk, v in out.items()}
    return out


def _tile_params(pr: AlgParams, spec) -> "tuple[int, int, int]":
    """(R, TW, K) for the banded engine: explicit params beat the
    per-device autotune cache (TPU only) beat the 128/128/2 fallback.

    The cache's per-spec ``banded`` sub-entry pins its OWN geometry
    (tileBy/tileBx) alongside its flags: the banded kernels are
    hardware-validated (giant_ab_tpu / validate_banded_flags_tpu) at that
    geometry, and the top-level tileBy can move independently when the
    full-matrix autotuner retunes — a sub-entry preference keeps the
    production banded path on the geometry its _gcups and bit-equality
    checks were actually measured at."""
    r_def, tw_def, k_def = 128, 128, 2
    try:
        if jax.default_backend() == "tpu":
            from ..ops.pallas_wavefront2 import tuned_cache, tuned_defaults

            tuned = tuned_defaults(spec.kind.value, spec.gap.value)
            name = f"{spec.kind.value}" \
                   f"_{'ag' if spec.gap == GapKind.AFFINE else 'lg'}"
            band = tuned_cache().get(name, {}).get("banded", {})
            r_def = int(band.get("tileBy", 0) or tuned.get("tileBy", r_def))
            tw_def = int(band.get("tileBx", 0) or tuned.get("tileBx", tw_def))
            k_def = int(tuned.get("kChains", k_def))
    except Exception:
        pass
    R = int(pr.get("tileBy", 0) or r_def)
    TW = int(pr.get("tileBx", 0) or tw_def)
    K = int(pr.get("kChains", 0) or k_def)
    return R, TW, K


def _tile_params_ok(R: int, TW: int, K: int) -> bool:
    """Geometry the banded engine can actually run: the kernel packs
    (R/128, 128) vectors and reshapes the band by W//128 chunks, so both
    tile dims must be positive multiples of 128 (an undersized explicit
    tileBy/tileBx is an invalid param combo, not a crash)."""
    return (R >= 128 and R % 128 == 0 and TW >= 128 and TW % 128 == 0
            and K >= 1)


def align_giant2(
    pr: AlgParams,
    nw: AlgInput,
    res: AlgResult,
    mesh: Optional[Mesh] = None,
    interpret: bool = False,
    masked: "bool | None" = None,
) -> Status:
    """Registry-shaped align fn for the v2 giant engine, any spec: pads,
    runs the distributed fill, and massages outputs into the reference
    sparse layout (plus the affine F/E header mats and the SW argmax) so
    sparse traceback/hash/align_cost run unchanged."""
    from .mesh import make_mesh

    spec = nw.spec
    affine = spec.gap == GapKind.AFFINE
    is_sw = spec.kind == AlignKind.SW
    if affine and (nw.gapo_cost > 0 or nw.gape_cost > 0):
        return Status.errorInvalidValue  # vectorized Gotoh needs costs <= 0
    if mesh is None:
        mesh = make_mesh(axis_name="sp")
    D = int(mesh.devices.size)

    sw = res.sw_align
    sw.start()
    rows = nw.adjrows - 1
    cols = nw.adjcols - 1
    R, TW, K = _tile_params(pr, spec)
    k_b, packedx, packedef, remath, subprow = _kernel_flags(pr, spec)
    if k_b and not pr.get("kChains", 0):
        K = k_b
    packedef = packedef and affine and -255 <= nw.gapo_cost <= 0
    if not _tile_params_ok(R, TW, K):
        return Status.errorInvalidValue
    band_cols = _cdiv(max(cols, 1), D * TW) * TW
    cols_p = band_cols * D
    n_blocks = _cdiv(max(rows, 1), R)
    KB = int(pr.get("passBlocks", 0) or 0)
    if KB > 1 and not wrap_ok(R=R, W=min(512, TW), K=K,
                              band_cols=band_cols):
        # Explicitly-requested wrap with a hazard-violating geometry is an
        # invalid param combo (same contract as bad affine costs above).
        return Status.errorInvalidValue
    if not KB:
        # Auto KB > 1 engages the wrap-banded echelon. On the real-TPU
        # path it stays off until the kernel has been hardware-validated
        # by the differential drive (interpret mode clamps OOB VMEM
        # accesses; real TPUs wrap them into adjacent buffers — see
        # CLAUDE.md): flip _WRAP_TPU_VALIDATED after that run.
        if interpret or _wrap_validated() or \
                jax.default_backend() != "tpu":
            KB = pick_kb(n_blocks, K, D, R=R, W=min(512, TW),
                         band_cols=band_cols)
        else:
            KB = 1
    BL = KB * K
    n_pass = _cdiv(n_blocks, BL)
    rows_p = n_pass * BL * R
    jtE = band_cols // TW

    y = np.zeros(1 + rows_p, np.int32)
    x = np.zeros(1 + cols_p, np.int32)
    y[: nw.adjrows] = nw.seqY
    x[: nw.adjcols] = nw.seqX
    sw.lap("align.alloc")

    if jax.process_count() > 1:
        # Multi-host: every process holds the same full inputs; convert
        # them to replicated GLOBAL arrays over the (multi-process) mesh
        # so the sharded fill can run across hosts.
        from jax.experimental import multihost_utils

        def put(a):
            return multihost_utils.host_local_array_to_global_array(
                a, mesh, P()
            )
    else:
        put = jax.device_put
    subst_d = put(np.asarray(nw.subst))
    y_d = put(y)
    x_d = put(x[1:])
    jax.block_until_ready((subst_d, y_d, x_d))
    sw.lap("align.cpy_dev")

    out_d = giant2_fill(
        subst_d, y_d, x_d, jnp.int32(nw.gapo_cost), jnp.int32(nw.gape_cost),
        nw.adjrows, nw.adjcols,
        mesh=mesh, R=R, W=min(512, TW), TW=TW, K=K,
        band_cols=band_cols, n_pass=n_pass, KB=KB,
        kind=spec.kind.value, gap=spec.gap.value, interpret=interpret,
        masked=masked, packedx=packedx, packedef=packedef, remath=remath,
        subprow=subprow,
    )
    jax.block_until_ready(out_d)
    sw.lap("align.calc")

    out = {kk: np.asarray(jax.device_get(v)) for kk, v in out_d.items()}
    sw.lap("align.cpy_host")
    nw.note_device_alloc(sum(int(v.nbytes) for v in out.values()))

    # Analytic per-device on-chip peaks of the banded pallas_call.
    from ..ops.pallas_wavefront2 import v2_regmem_bytes, v2_vmem_bytes

    W = min(512, TW)
    SUBv = R // 128
    NSpadv = _cdiv(R + band_cols - 1 + 128, W) * W
    res.shmem_peak_allocs = max(res.shmem_peak_allocs, v2_vmem_bytes(
        K=K, SUB=SUBv, prev_len=NSpadv + 128, W=W,
        affine=affine, is_sw=is_sw,
    ))
    res.regmem_peak_allocs = max(res.regmem_peak_allocs, v2_regmem_bytes(
        K=K, SUB=SUBv, affine=affine, is_sw=is_sw,
    ))

    stat = _gathered_to_sparse(
        nw, res, out, D=D, R=R, TW=TW, BL=BL, n_pass=n_pass,
        band_cols=band_cols,
    )
    return stat


def _gathered_to_sparse(nw: AlgInput, res: AlgResult, out: dict, *, D: int,
                        R: int, TW: int, BL: int, n_pass: int,
                        band_cols: int) -> Status:
    """Massage one pair's gathered per-band streams (hrows/hcols [+ frows/
    ecols/bv/bc], block index LOCAL to the pair) into the reference sparse
    layout and store via _mlsp_store. Shared by the single-pair engine and
    the multi-pair stream (align_giant2_stream slices its gathered arrays
    per pair before calling)."""
    from ..ops.pallas_kernels import _mlsp_store

    spec = nw.spec
    affine = spec.gap == GapKind.AFFINE
    is_sw = spec.kind == AlignKind.SW
    cols_p = band_cols * D
    rows_p = n_pass * BL * R
    jtE = band_cols // TW
    B = n_pass * BL
    g = nw.gapo_cost
    ge = nw.gape_cost
    ninf = np.int32(NEG_INF_I32)
    width = 1 + cols_p
    tcols = cols_p // TW

    # hrows[it]: full row it*R incl. header col element; band d's stream
    # covers global columns 1 + d*band_cols .. (d+1)*band_cols.
    def rows_from(stream, hdr0, col0):
        m = np.empty((B, width), np.int32)
        m[0] = hdr0
        if B > 1:
            m[1:, 0] = col0
            for d in range(D):
                m[1:, 1 + d * band_cols: 1 + (d + 1) * band_cols] = \
                    stream[: B - 1, d, 1: band_cols + 1]
        return m

    jw = np.arange(width, dtype=np.int64)
    iw = np.arange(1, B, dtype=np.int64) * R
    if is_sw:
        hdr0 = np.zeros(width, np.int32)
        col0 = np.zeros(B - 1, np.int32)
    elif affine:
        hdr0 = (g + jw * ge).astype(np.int32)
        hdr0[0] = 0
        col0 = (g + iw * ge).astype(np.int32)
    else:
        hdr0 = (jw * g).astype(np.int32)
        col0 = (iw * g).astype(np.int32)
    hrows = rows_from(out["hrows"], hdr0, col0)

    # hcols[it, r, jt]: column jt*TW of block it; global tile column jt
    # maps to band jt // jtE's local capture jt % jtE (jl == 0 entries are
    # the previous band's right edge).
    def cols_from(stream, first_col):
        m = np.empty((B, R, tcols), np.int32)
        m[:, :, 0] = first_col
        for jt in range(1, tcols):
            d, jl = divmod(jt, jtE)
            if jl == 0:
                d, jl = d - 1, jtE
            m[:, :, jt] = stream[:, d, jl, :]
        return m

    ii = np.arange(1, rows_p + 1, dtype=np.int64).reshape(B, R)
    if is_sw:
        col0_h = np.zeros((B, R), np.int32)
    elif affine:
        col0_h = (g + ii * ge).astype(np.int32)
    else:
        col0_h = (ii * g).astype(np.int32)
    hcols = cols_from(out["hcols"], col0_h)

    frows = ecols = None
    if affine:
        frows = rows_from(out["frows"], np.full(width, ninf, np.int32),
                          np.full(B - 1, ninf, np.int32))
        frows[:, 0] = ninf
        ecols = cols_from(out["ecols"], np.full((B, R), ninf, np.int32))

    best = None
    if is_sw:
        bv = out["bv"]  # (B, D, R)
        bc = out["bc"]
        if bv.max(initial=0) <= 0:
            best = np.array([0, 0, 0], np.int32)
        else:
            lane = np.arange(R).reshape(1, 1, R)
            iv = np.broadcast_to(
                (np.arange(B).reshape(B, 1, 1)) * R + lane + 1, bv.shape
            )
            jv = (
                np.arange(D).reshape(1, D, 1) * band_cols
                + bc - lane + 1
            )
            order = np.lexsort((jv.ravel(), iv.ravel(), -bv.ravel()))
            b0 = order[0]
            best = np.array(
                [bv.ravel()[b0], iv.ravel()[b0], jv.ravel()[b0]], np.int32
            )

    stat = _mlsp_store(
        nw, res, hrows, hcols, R, TW, B, tcols,
        frows=frows, ecols=ecols, best=best,
    )
    return stat


def align_giant2_stream(
    pr: AlgParams,
    inputs: "list[AlgInput]",
    results: "list[AlgResult]",
    mesh: Optional[Mesh] = None,
    interpret: bool = False,
    masked: "bool | None" = None,
) -> "list[Status]":
    """Align a STREAM of giant pairs through ONE pipelined distributed
    fill: the scan runs sum(n_pass_i) + D - 1 steps total, so the
    cross-device fill/drain bubble (D - 1 steps) is paid once per stream
    instead of once per pair — at D=8 and a pair with n_pass=4, the
    per-pair bubble bound is 4/11 = 36% utilization; a 16-pair stream of
    the same pairs runs at 64/71 = 90%.

    All pairs must share spec, costs, and substitution matrix (the
    per-pass carry reset keys only on pair-LOCAL pass index; costs are
    scan-invariant). Returns one Status per pair; each pair's AlgResult
    gets the standard sparse layout so trace/hash verify per pair.
    Stopwatch laps are the shared phases' wall time attributed to each
    pair proportional to its cell count (sum over the stream ~= the
    stream's wall time, so aggregate GCUPS stays honest).
    """
    import time as _time

    from .mesh import make_mesh

    n = len(inputs)
    if n == 0:
        return []
    spec = inputs[0].spec
    gapo, gape = inputs[0].gapo_cost, inputs[0].gape_cost
    affine = spec.gap == GapKind.AFFINE
    uniform = all(
        nw.spec == spec and nw.gapo_cost == gapo and nw.gape_cost == gape
        and np.array_equal(nw.subst, inputs[0].subst)
        for nw in inputs[1:]
    )
    if not uniform or (affine and (gapo > 0 or gape > 0)):
        return [Status.errorInvalidValue] * n
    if mesh is None:
        mesh = make_mesh(axis_name="sp")
    D = int(mesh.devices.size)

    cells = np.array(
        [(nw.adjrows - 1) * (nw.adjcols - 1) for nw in inputs], np.float64
    )
    share = cells / max(float(cells.sum()), 1.0)
    t_ref = _time.perf_counter()

    def lap_all(name: str) -> None:
        nonlocal t_ref
        now = _time.perf_counter()
        dt_ms = (now - t_ref) * 1000.0
        for res_i, sh in zip(results, share):
            res_i.sw_align.add_ms(name, dt_ms * float(sh))
        t_ref = now

    R, TW, K = _tile_params(pr, spec)
    k_b, packedx, packedef, remath, subprow = _kernel_flags(pr, spec)
    if k_b and not pr.get("kChains", 0):
        K = k_b
    packedef = packedef and affine and -255 <= gapo <= 0
    if not _tile_params_ok(R, TW, K):
        return [Status.errorInvalidValue] * n
    W = min(512, TW)
    rows_l = [nw.adjrows - 1 for nw in inputs]
    cols_l = [nw.adjcols - 1 for nw in inputs]
    band_cols = _cdiv(max(max(cols_l), 1), D * TW) * TW
    cols_p = band_cols * D
    nb_l = [_cdiv(max(r, 1), R) for r in rows_l]
    KB = int(pr.get("passBlocks", 0) or 0)
    if KB > 1 and not wrap_ok(R=R, W=W, K=K, band_cols=band_cols):
        return [Status.errorInvalidValue] * n
    if not KB:
        if interpret or _wrap_validated() or \
                jax.default_backend() != "tpu":
            KB = pick_kb(nb_l, K, D, R=R, W=W, band_cols=band_cols)
        else:
            KB = 1
    BL = KB * K
    np_l = [_cdiv(nb, BL) for nb in nb_l]
    starts = np.concatenate(([0], np.cumsum(np_l))).astype(np.int64)
    total_pass = int(starts[-1])
    rows_tot = total_pass * BL * R

    y = np.zeros(1 + rows_tot, np.int32)
    x = np.zeros((n, cols_p), np.int32)
    p2p = np.zeros(total_pass, np.int32)
    p2l = np.zeros(total_pass, np.int32)
    for i, nw in enumerate(inputs):
        off = int(starts[i]) * BL * R
        y[1 + off: 1 + off + rows_l[i]] = nw.seqY[1: nw.adjrows]
        x[i, : cols_l[i]] = nw.seqX[1: nw.adjcols]
        p2p[starts[i]: starts[i + 1]] = i
        p2l[starts[i]: starts[i + 1]] = np.arange(np_l[i])
    adjr = np.array([nw.adjrows for nw in inputs], np.int32)
    adjc = np.array([nw.adjcols for nw in inputs], np.int32)
    lap_all("align.alloc")

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def put(a):
            return multihost_utils.host_local_array_to_global_array(
                a, mesh, P()
            )
    else:
        put = jax.device_put
    subst_d = put(np.asarray(inputs[0].subst))
    y_d = put(y)
    x_d = put(x)
    jax.block_until_ready((subst_d, y_d, x_d))
    lap_all("align.cpy_dev")

    out_d = giant2_fill(
        subst_d, y_d, x_d, jnp.int32(gapo), jnp.int32(gape), adjr, adjc,
        mesh=mesh, R=R, W=W, TW=TW, K=K,
        band_cols=band_cols, n_pass=total_pass, KB=KB,
        kind=spec.kind.value, gap=spec.gap.value, interpret=interpret,
        masked=masked, packedx=packedx, packedef=packedef, remath=remath,
        subprow=subprow,
        pass2pair=p2p, pass2local=p2l,
    )
    jax.block_until_ready(out_d)
    lap_all("align.calc")

    out = {kk: np.asarray(jax.device_get(v)) for kk, v in out_d.items()}
    lap_all("align.cpy_host")

    from ..ops.pallas_wavefront2 import v2_regmem_bytes, v2_vmem_bytes

    SUBv = R // 128
    NSpadv = _cdiv(R + band_cols - 1 + 128, W) * W
    vmem = v2_vmem_bytes(K=K, SUB=SUBv, prev_len=NSpadv + 128, W=W,
                         affine=affine, is_sw=spec.kind == AlignKind.SW)
    regmem = v2_regmem_bytes(K=K, SUB=SUBv, affine=affine,
                             is_sw=spec.kind == AlignKind.SW)

    stats = []
    for i, (nw, res) in enumerate(zip(inputs, results)):
        s, e = int(starts[i]) * BL, int(starts[i + 1]) * BL
        out_i = {kk: v[s:e] for kk, v in out.items()}
        nw.note_device_alloc(sum(int(v.nbytes) for v in out_i.values()))
        res.shmem_peak_allocs = max(res.shmem_peak_allocs, vmem)
        res.regmem_peak_allocs = max(res.regmem_peak_allocs, regmem)
        stats.append(_gathered_to_sparse(
            nw, res, out_i, D=D, R=R, TW=TW, BL=BL, n_pass=np_l[i],
            band_cols=band_cols,
        ))
    return stats


def align_giant2_nw_lg(
    pr: AlgParams,
    nw: AlgInput,
    res: AlgResult,
    mesh: Optional[Mesh] = None,
    interpret: bool = False,
    masked: "bool | None" = None,
) -> Status:
    """Back-compat wrapper: the original NW linear-gap-only surface."""
    if not (nw.spec.kind == AlignKind.NW and nw.spec.gap == GapKind.LINEAR):
        return Status.errorInvalidValue
    return align_giant2(pr, nw, res, mesh=mesh, interpret=interpret)
