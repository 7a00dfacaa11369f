"""v2 multi-chain wavefront kernel vs the oracle (interpret mode on CPU).

The echelon/cross-chain dataflow plus the in-kernel packed substitution
lookup are the risky parts; sizes below cover chain counts 1/2/4, row
padding (rows not a multiple of K*R), rectangular shapes, and the full
align_mlsp_v2 wrapper path through the reference sparse layout with
sparse traceback/hash parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpuseqalign_tpu.core.types import AlgInput, AlgParams, AlgResult, AlignSpec, Status
from gpuseqalign_tpu.models.oracle import (
    oracle_align_dense,
    oracle_hash_dense,
    oracle_trace_dense,
)
from gpuseqalign_tpu.ops.pallas_wavefront2 import (
    align_mlsp_v2,
    pallas_mlsp_nw_lg_v2,
)
from gpuseqalign_tpu.trace.sparse import hash_sparse, trace_sparse

from conftest import random_seq

SPEC = AlignSpec.from_name("nw_lg")


def _pad_to(n, m):
    return ((n + m - 1) // m) * m


@pytest.mark.parametrize(
    "rows,cols,R,W,TW,K",
    [
        (300, 600, 128, 128, 128, 2),
        (290, 300, 256, 256, 512, 1),
    ],
)
def test_v2_matches_oracle(blosum62, rng, rows, cols, R, W, TW, K):
    B = _pad_to(-(-rows // R), K)
    rows_p = B * R
    cols_p = _pad_to(cols, TW)
    Y = np.zeros(1 + rows_p, np.int32)
    Y[1: 1 + rows] = random_seq(rng, rows)[1:]
    X = np.zeros(1 + cols_p, np.int32)
    X[1: 1 + cols] = random_seq(rng, cols)[1:]
    H_ref = oracle_align_dense(SPEC, blosum62, Y, X, -11)["H"]
    hrow, hcol = pallas_mlsp_nw_lg_v2(
        jnp.asarray(blosum62), jnp.asarray(Y), jnp.asarray(X),
        jnp.int32(-11), R=R, W=W, TW=TW, K=K, interpret=True,
    )
    hrow = np.asarray(hrow)
    hcol = np.asarray(hcol)
    for b in range(B - 1):
        np.testing.assert_array_equal(
            hrow[b, : cols_p + 1], H_ref[(b + 1) * R], err_msg=f"hrow b={b}"
        )
    for b in range(B):
        for jt in range(1, cols_p // TW):
            np.testing.assert_array_equal(
                hcol[b, jt].reshape(R),
                H_ref[b * R + 1: (b + 1) * R + 1, jt * TW],
                err_msg=f"hcol b={b} jt={jt}",
            )


def test_align_mlsp_v2_end_to_end(blosum62, rng):
    """Wrapper path: sparse layout + traceback + hash parity vs oracle."""
    Y = random_seq(rng, 200)
    X = random_seq(rng, 380)

    nw = AlgInput()
    nw.subst = blosum62
    nw.substsz = blosum62.shape[0]
    nw.seqY, nw.seqX = Y, X
    nw.adjrows, nw.adjcols = len(Y), len(X)
    nw.gapo_cost = -11
    nw.spec = SPEC

    res = AlgResult()
    tile_h, tile_w = 128, 256
    trows = -(-200 // tile_h)
    tcols = -(-380 // tile_w)
    stat = align_mlsp_v2(
        AlgParams({}), nw, res, tile_h, tile_w, trows, tcols, interpret=True
    )
    assert stat == Status.success

    mats = oracle_align_dense(SPEC, blosum62, Y, X, -11)
    assert res.align_cost == int(mats["H"][-1, -1])

    assert trace_sparse(nw, res, False) == Status.success
    transcript, thash, _ = oracle_trace_dense(SPEC, mats, blosum62, Y, X, -11)
    assert res.edit_trace == transcript
    assert res.trace_hash == thash

    assert hash_sparse(nw, res) == Status.success
    assert res.score_hash == oracle_hash_dense(mats["H"])

    # Analytic on-chip telemetry must be populated (VMEM + register
    # carry-state peaks; ref analog: src/nwalign_shared.cpp).
    assert res.shmem_peak_allocs > 0
    assert res.regmem_peak_allocs > 0


@pytest.mark.parametrize("spec_name", ["nw_ag", "sw_lg", "sw_ag"])
def test_align_mlsp_v2_specs(blosum62, rng, spec_name):
    """General-spec v2 kernel end to end (interpret): sparse layout +
    traceback + hash parity vs the dense oracle."""
    from gpuseqalign_tpu.models.oracle import align_cost_of

    spec = AlignSpec.from_name(spec_name)
    Y = random_seq(rng, 150)
    X = random_seq(rng, 260)

    nw = AlgInput()
    nw.subst = blosum62
    nw.substsz = blosum62.shape[0]
    nw.seqY, nw.seqX = Y, X
    nw.adjrows, nw.adjcols = len(Y), len(X)
    nw.gapo_cost, nw.gape_cost = -11, -2
    nw.spec = spec

    res = AlgResult()
    tile_h, tile_w = 128, 128
    trows = -(-150 // tile_h)
    tcols = -(-260 // tile_w)
    stat = align_mlsp_v2(
        AlgParams({"kChains": [2]}), nw, res, tile_h, tile_w, trows, tcols,
        interpret=True,
    )
    assert stat == Status.success

    mats = oracle_align_dense(spec, blosum62, Y, X, -11, -2)
    assert res.align_cost == align_cost_of(spec, mats)

    assert trace_sparse(nw, res, False) == Status.success
    transcript, thash, _ = oracle_trace_dense(
        spec, mats, blosum62, Y, X, -11, -2
    )
    assert res.edit_trace == transcript
    assert res.trace_hash == thash

    assert hash_sparse(nw, res) == Status.success
    assert res.score_hash == oracle_hash_dense(mats["H"])


@pytest.mark.parametrize(
    "rows,cols,R,W,TW,K",
    [
        # Wide enough that NSpad >= (K-1)*OFF + R + W + 256 -> the
        # CONTINUOUS echelon (wrap) engages, with >= 2 block groups so
        # chains roll across group boundaries while their predecessor
        # row buffers are still being written (the cross-pass pipeline).
        (700, 1400, 128, 128, 128, 3),
        (290, 1200, 128, 128, 256, 2),
    ],
)
def test_v2_wrap_matches_oracle(blosum62, rng, rows, cols, R, W, TW, K):
    """Continuous-echelon (wrap) grid vs oracle: hrow + hcol bit-exact."""
    from gpuseqalign_tpu.ops import pallas_wavefront2 as w2

    B = _pad_to(-(-rows // R), K)
    rows_p = B * R
    cols_p = _pad_to(cols, TW)
    # The config must actually trigger wrap (guard the test setup).
    NSpad = _pad_to(R + cols_p - 1 + 128, W)
    OFF = W * (-(-(R + 256) // W))
    assert NSpad >= (K - 1) * OFF + R + W + 256
    assert B // K >= 2
    Y = np.zeros(1 + rows_p, np.int32)
    Y[1: 1 + rows] = random_seq(rng, rows)[1:]
    X = np.zeros(1 + cols_p, np.int32)
    X[1: 1 + cols] = random_seq(rng, cols)[1:]
    H_ref = oracle_align_dense(SPEC, blosum62, Y, X, -11)["H"]
    hrow, hcol = w2.pallas_mlsp_nw_lg_v2(
        jnp.asarray(blosum62), jnp.asarray(Y), jnp.asarray(X),
        jnp.int32(-11), R=R, W=W, TW=TW, K=K, interpret=True,
    )
    hrow = np.asarray(hrow)
    hcol = np.asarray(hcol)
    for b in range(B - 1):
        np.testing.assert_array_equal(
            hrow[b, : cols_p + 1], H_ref[(b + 1) * R], err_msg=f"hrow b={b}"
        )
    for b in range(B):
        for jt in range(1, cols_p // TW):
            np.testing.assert_array_equal(
                hcol[b, jt].reshape(R),
                H_ref[b * R + 1: (b + 1) * R + 1, jt * TW],
                err_msg=f"hcol b={b} jt={jt}",
            )


@pytest.mark.parametrize("spec_name,K,extra", [
    ("sw_lg", 2, {}),
    ("sw_ag", 3, {"packedx": [1], "packedef": [1], "rematHdr": [1]}),
])
def test_align_mlsp_v2_nobc(blosum62, rng, spec_name, K, extra):
    """noBc (value-only SW argmax, bc carry dropped): the host recovers
    the best cell's column from the stored sparse headers, so the
    traceback start — and therefore the transcript/hash — must still
    reproduce the oracle's row-major first-occurrence tie-break."""
    from gpuseqalign_tpu.models.oracle import align_cost_of

    spec = AlignSpec.from_name(spec_name)
    Y = random_seq(rng, 430)
    X = random_seq(rng, 1000)

    nw = AlgInput()
    nw.subst = blosum62
    nw.substsz = blosum62.shape[0]
    nw.seqY, nw.seqX = Y, X
    nw.adjrows, nw.adjcols = len(Y), len(X)
    nw.gapo_cost = -11
    nw.gape_cost = -2 if spec.gap.value == "affine" else 0
    nw.spec = spec

    res = AlgResult()
    tile_h = tile_w = 128
    trows = -(-430 // tile_h)
    tcols = -(-1000 // tile_w)
    stat = align_mlsp_v2(
        AlgParams({"kChains": [K], "noBc": [1], **extra}),
        nw, res, tile_h, tile_w, trows, tcols, interpret=True,
    )
    assert stat == Status.success

    mats = oracle_align_dense(spec, blosum62, Y, X, -11, nw.gape_cost)
    assert res.align_cost == align_cost_of(spec, mats)
    assert (nw.best_i, nw.best_j) == tuple(int(v) for v in mats["best"])
    assert trace_sparse(nw, res, False) == Status.success
    transcript, thash, _ = oracle_trace_dense(
        spec, mats, blosum62, Y, X, -11, nw.gape_cost
    )
    assert res.edit_trace == transcript
    assert res.trace_hash == thash


@pytest.mark.parametrize("spec_name", ["nw_ag", "sw_ag"])
def test_align_mlsp_v2_wrap_specs(blosum62, rng, spec_name):
    """Wrap grid through the full sparse wrapper for the extension specs:
    cost + sparse traceback + both hashes bit-exact vs the oracle."""
    from gpuseqalign_tpu.models.oracle import align_cost_of

    spec = AlignSpec.from_name(spec_name)
    Y = random_seq(rng, 430)
    X = random_seq(rng, 1000)

    nw = AlgInput()
    nw.subst = blosum62
    nw.substsz = blosum62.shape[0]
    nw.seqY, nw.seqX = Y, X
    nw.adjrows, nw.adjcols = len(Y), len(X)
    nw.gapo_cost, nw.gape_cost = -11, -2
    nw.spec = spec

    res = AlgResult()
    tile_h, tile_w = 128, 128
    trows = -(-430 // tile_h)
    tcols = -(-1000 // tile_w)
    stat = align_mlsp_v2(
        AlgParams({"kChains": [2]}), nw, res, tile_h, tile_w, trows, tcols,
        interpret=True,
    )
    assert stat == Status.success

    mats = oracle_align_dense(spec, blosum62, Y, X, -11, -2)
    assert res.align_cost == align_cost_of(spec, mats)
    assert trace_sparse(nw, res, False) == Status.success
    transcript, thash, _ = oracle_trace_dense(
        spec, mats, blosum62, Y, X, -11, -2
    )
    assert res.edit_trace == transcript
    assert res.trace_hash == thash
    assert hash_sparse(nw, res) == Status.success
    assert res.score_hash == oracle_hash_dense(mats["H"])


@pytest.mark.parametrize("spec_name,K", [("nw_lg", 2), ("sw_lg", 2),
                                         ("nw_ag", 3), ("sw_ag", 3)])
def test_batch_kernel_matches_oracle(blosum62, rng, spec_name, K):
    """Batched variant (pairs-as-chains, self-chained row buffers): costs
    and SW argmax vs the dense oracle, mixed true lengths in one bucket.
    The affine specs run K=3 chains (exercising the per-pair F/E carry
    buffers through parallel/batch.py's dispatch)."""
    import jax.numpy as jnp
    from gpuseqalign_tpu.models.oracle import align_cost_of
    from gpuseqalign_tpu.ops.pallas_wavefront2 import pallas_mlsp_batch_v2

    spec = AlignSpec.from_name(spec_name)
    R, W, TW = 128, 128, 128
    sizes = [(150, 260), (250, 170), (127, 129)][:K]
    rows_p, cols_p = 384, 384
    Ys = np.zeros((K, 1 + rows_p), np.int32)
    Xs = np.zeros((K, 1 + cols_p), np.int32)
    adjrs = np.zeros(K, np.int32)
    adjcs = np.zeros(K, np.int32)
    seqs = []
    for k, (r, c) in enumerate(sizes):
        y = random_seq(rng, r)
        x = random_seq(rng, c)
        Ys[k, : 1 + r] = y
        Xs[k, : 1 + c] = x
        adjrs[k], adjcs[k] = r + 1, c + 1
        seqs.append((y, x))

    out = pallas_mlsp_batch_v2(
        jnp.asarray(blosum62), jnp.asarray(Ys), jnp.asarray(Xs),
        jnp.int32(-11), jnp.int32(-2), jnp.asarray(adjrs),
        jnp.asarray(adjcs),
        R=R, W=W, TW=TW, kind=spec.kind.value, gap=spec.gap.value,
        interpret=True,
    )
    for k, (y, x) in enumerate(seqs):
        mats = oracle_align_dense(spec, blosum62, y, x, -11, -2)
        want = align_cost_of(spec, mats)
        if spec_name.startswith("sw"):
            bv = np.asarray(out["bv"][k]).reshape(-1)
            bc = np.asarray(out["bc"][k]).reshape(-1)
            got = int(bv.max(initial=0))
            iv = 1 + np.arange(bv.shape[0])
            jv = bc - (np.arange(bv.shape[0]) % R) + 1
            o = np.lexsort((jv, iv, -bv))[0]
            assert got == want
            assert (iv[o], jv[o]) == tuple(int(v) for v in mats["best"])
        else:
            assert int(np.asarray(out["cost"][k]).max()) == want
        # Block-0 bottom row must equal the oracle row on the padded pair.
        Hp = oracle_align_dense(
            spec, blosum62, Ys[k], Xs[k], -11, -2
        )["H"]
        np.testing.assert_array_equal(
            np.asarray(out["hrow"][k, 0, : cols_p + 1]), Hp[R, : cols_p + 1]
        )


@pytest.mark.parametrize("spec_name", ["nw_ag", "sw_lg"])
def test_align_dense_v2(blosum62, rng, spec_name):
    """Dense v2 wrapper (the gpu3-gpu6 alias surface): full H + plain
    trace/hash bit-exact vs the dense oracle, any spec."""
    from gpuseqalign_tpu.models.oracle import align_cost_of
    from gpuseqalign_tpu.ops.pallas_wavefront2 import align_dense_v2
    from gpuseqalign_tpu.trace.plain import hash_plain, trace_plain
    from gpuseqalign_tpu.core.hashing import djb2_array

    spec = AlignSpec.from_name(spec_name)
    Y = random_seq(rng, 150)
    X = random_seq(rng, 260)

    nw = AlgInput()
    nw.subst = blosum62
    nw.substsz = blosum62.shape[0]
    nw.seqY, nw.seqX = Y, X
    nw.adjrows, nw.adjcols = len(Y), len(X)
    nw.gapo_cost, nw.gape_cost = -11, -2
    nw.spec = spec

    res = AlgResult()
    stat = align_dense_v2(AlgParams({"kChains": [2]}), nw, res,
                          interpret=True)
    assert stat == Status.success

    mats = oracle_align_dense(spec, blosum62, Y, X, -11, -2)
    np.testing.assert_array_equal(nw.score, mats["H"])
    assert res.align_cost == align_cost_of(spec, mats)

    assert trace_plain(nw, res, False) == Status.success
    transcript, thash, _ = oracle_trace_dense(
        spec, mats, blosum62, Y, X, -11, -2
    )
    assert res.edit_trace == transcript
    assert res.trace_hash == thash
    assert hash_plain(nw, res) == Status.success
    assert res.score_hash == djb2_array(mats["H"])
    assert res.shmem_peak_allocs > 0


def test_pack_x_streams(rng):
    """pack_x_streams parity with the per-chain xwin layout (ROOFLINE
    agenda #1: the packedx host-side stream). For every live (ch, w, tt)
    position of every chain, in BOTH grid modes' index maps, the byte
    extracted from the shared packed plane at block (ch mod SPB) must
    equal the letter the chain reads today from its own xwin ref at
    block wrap_loc/clip(ch - k*offw)."""
    from gpuseqalign_tpu.ops.pallas_wavefront2 import (
        pack_x_streams, wrap_loc,
    )

    for R, W, K, cols_p, BBtot in [
        (128, 128, 2, 512, 3),
        (256, 128, 5, 1024, 2),  # K > 4: two packed planes
        (128, 256, 3, 768, 2),
        (256, 256, 7, 2048, 1),
    ]:
        def cdiv(a, b):
            return -(-a // b)

        OFF = W * cdiv(R + 256, W)
        NS = R + cols_p - 1
        NSpad = cdiv(NS + 128, W) * W
        SPB = NSpad // W
        offw = OFF // W
        CH = (NSpad + (K - 1) * OFF) // W

        x = rng.integers(0, 25, size=NSpad + 1).astype(np.int32)
        xpad = np.zeros(NSpad + 1, np.int32)
        xpad[:cols_p] = x[1 : 1 + cols_p]
        xs = xpad[:NSpad]
        xwin = xs.reshape(SPB, W // 128, 128)

        planes = [np.asarray(p) for p in
                  pack_x_streams(jnp.asarray(xs), OFF=OFF, K=K)]
        assert len(planes) == cdiv(K, 4)

        def packed_byte(ch, w, tt, k):
            word = planes[k // 4][(ch % SPB) * W + w * 128 + tt]
            return (word >> (8 * (k % 4))) & 255

        # Echelon-mode live positions: block index ch - k*offw in range.
        for k in range(K):
            for ch in range(k * offw, min(CH, k * offw + SPB)):
                for (w, tt) in [(0, 0), (0, 127), (W // 128 - 1, 63)]:
                    want = xwin[ch - k * offw, w, tt]
                    assert packed_byte(ch, w, tt, k) == want, (
                        "echelon", R, W, K, ch, w, tt, k)

        # Wrap-mode live positions: wrap_loc's within-block chunk.
        grid = BBtot * SPB + (K - 1) * offw
        for k in range(K):
            for ch in range(grid):
                lch = ch - k * offw
                if not (0 <= lch < BBtot * SPB):
                    continue  # bubble: letters are junk-tolerated
                _, wch = wrap_loc(ch, k, offw=offw, SPB=SPB, BBtot=BBtot)
                wch = int(wch)
                for (w, tt) in [(0, 1), (W // 128 - 1, 127)]:
                    want = xwin[wch, w, tt]
                    assert packed_byte(ch, w, tt, k) == want, (
                        "wrap", R, W, K, ch, w, tt, k)


@pytest.mark.parametrize(
    "rows,cols,R,W,TW,K,spec_name",
    [
        (300, 900, 128, 128, 128, 2, "nw_lg"),    # wrap engages
        (290, 300, 128, 128, 256, 5, "nw_lg"),    # echelon; two planes
        (400, 300, 128, 128, 128, 2, "nw_lg"),    # echelon, BB=2 passes
        (300, 900, 128, 128, 128, 2, "sw_ag"),    # wrap + all carries
        (290, 300, 128, 128, 256, 5, "sw_ag"),    # echelon + all carries
        (400, 300, 128, 128, 128, 2, "sw_ag"),    # echelon, BB=2 passes
    ],
)
def test_v2_packedx_matches_base(blosum62, rng, rows, cols, R, W, TW, K,
                                 spec_name):
    """packedx (shared byte-packed xd streams, ROOFLINE agenda #1) must be
    bit-identical to the per-chain xd carry in every output stream, in
    both grid modes, for K <= 4 (one plane) and K > 4 (two planes)."""
    from gpuseqalign_tpu.ops.pallas_wavefront2 import pallas_mlsp_v2

    spec = AlignSpec.from_name(spec_name)
    gapo, gape = -11, (-2 if spec.gap.value == "affine" else 0)
    y = random_seq(rng, rows)
    x = random_seq(rng, cols)
    rows_p = _pad_to(rows, K * R)
    cols_p = _pad_to(cols, TW)
    yp = np.zeros(1 + rows_p, np.int32)
    yp[: 1 + rows] = y
    xp = np.zeros(1 + cols_p, np.int32)
    xp[: 1 + cols] = x

    kw = dict(R=R, W=W, TW=TW, K=K, kind=spec.kind.value,
              gap=spec.gap.value, interpret=True)
    base = pallas_mlsp_v2(
        blosum62, jnp.asarray(yp), jnp.asarray(xp),
        jnp.int32(gapo), jnp.int32(gape), 1 + rows, 1 + cols, **kw)
    packed = pallas_mlsp_v2(
        blosum62, jnp.asarray(yp), jnp.asarray(xp),
        jnp.int32(gapo), jnp.int32(gape), 1 + rows, 1 + cols,
        packedx=True, **kw)
    assert set(base.keys()) == set(packed.keys())
    for key in base:
        np.testing.assert_array_equal(
            np.asarray(base[key]), np.asarray(packed[key]), err_msg=key)


SLOW = pytest.mark.slow


@pytest.mark.parametrize(
    "rows,cols,R,W,TW,K,spec_name,flags",
    [
        # Default tier: the two linear subProw cases only (the production
        # lever + the R=256 sub_flush boundary). EVERY affine lever case
        # is slow-tier: a single affine interpret compile can run
        # multi-HOUR on this box's XLA:CPU (observed 3 h on the first
        # packedef case, 2026-08-20); the lever configs are instead
        # hardware-validated by the on-chip differential drives
        # (bench/validate_flags_tpu.py).
        #
        # packedef: packed E/F byte deltas — an exact refactoring of the
        # affine carries (see the _make_kernel packedef doc), so FULL
        # output arrays must match base in masked/interpret mode.
        pytest.param(300, 900, 128, 128, 128, 2, "nw_ag",
                     dict(packedef=True), marks=SLOW),
        pytest.param(290, 300, 128, 128, 256, 5, "sw_ag",
                     dict(packedef=True), marks=SLOW),
        pytest.param(400, 300, 128, 128, 128, 2, "sw_ag",
                     dict(packedef=True), marks=SLOW),
        # remath: scalar header rematerialization, all header shapes
        # (NW linear, NW affine, SW linear, SW affine).
        pytest.param(300, 900, 128, 128, 128, 2, "nw_lg",
                     dict(remath=True), marks=SLOW),
        pytest.param(290, 300, 128, 128, 256, 5, "nw_ag",
                     dict(remath=True), marks=SLOW),
        pytest.param(400, 300, 128, 128, 128, 2, "sw_lg",
                     dict(remath=True), marks=SLOW),
        pytest.param(300, 900, 128, 128, 128, 2, "sw_ag",
                     dict(remath=True), marks=SLOW),
        # the full register-lever stack, both grid modes
        pytest.param(300, 900, 128, 128, 128, 2, "nw_ag",
                     dict(packedx=True, packedef=True, remath=True),
                     marks=SLOW),
        pytest.param(290, 300, 128, 128, 256, 5, "sw_ag",
                     dict(packedx=True, packedef=True, remath=True),
                     marks=SLOW),
        # subprow: per-step bottom-sublane scratch store + per-window
        # strided-roll prow rebuild (ROADMAP lever #4) — prow/prowF
        # leave the loop carry, so every spec's output-row stream (and
        # affine's F rows) must still match bit-exactly, both grid modes.
        (300, 900, 128, 128, 128, 2, "nw_lg", dict(subprow=True)),
        # R=256 (SUB=2): sub_flush's strided-roll split boundary — the
        # qq=62 group's per-sublane shift reaches exactly 128, which must
        # take the split (static roll + stride-only roll) path rather
        # than rely on Mosaic's bound being inclusive.
        (300, 900, 256, 256, 256, 2, "nw_lg", dict(subprow=True)),
        pytest.param(290, 300, 128, 128, 256, 5, "nw_ag",
                     dict(subprow=True), marks=SLOW),
        pytest.param(400, 300, 128, 128, 128, 2, "sw_lg",
                     dict(subprow=True), marks=SLOW),
        pytest.param(300, 900, 128, 128, 128, 2, "sw_ag",
                     dict(packedx=True, packedef=True, remath=True,
                          subprow=True), marks=SLOW),
    ],
)
def test_v2_packedef_remath_matches_base(blosum62, rng, rows, cols, R, W,
                                         TW, K, spec_name, flags):
    """packedef (shared byte-packed E/F delta carries) and remath
    (scalar header rematerialization) must be bit-identical to the base
    kernel in every output stream, in both grid modes."""
    from gpuseqalign_tpu.ops.pallas_wavefront2 import pallas_mlsp_v2

    spec = AlignSpec.from_name(spec_name)
    gapo, gape = -11, (-2 if spec.gap.value == "affine" else 0)
    y = random_seq(rng, rows)
    x = random_seq(rng, cols)
    rows_p = _pad_to(rows, K * R)
    cols_p = _pad_to(cols, TW)
    yp = np.zeros(1 + rows_p, np.int32)
    yp[: 1 + rows] = y
    xp = np.zeros(1 + cols_p, np.int32)
    xp[: 1 + cols] = x

    kw = dict(R=R, W=W, TW=TW, K=K, kind=spec.kind.value,
              gap=spec.gap.value, interpret=True)
    base = pallas_mlsp_v2(
        blosum62, jnp.asarray(yp), jnp.asarray(xp),
        jnp.int32(gapo), jnp.int32(gape), 1 + rows, 1 + cols, **kw)
    new = pallas_mlsp_v2(
        blosum62, jnp.asarray(yp), jnp.asarray(xp),
        jnp.int32(gapo), jnp.int32(gape), 1 + rows, 1 + cols,
        **flags, **kw)
    assert set(base.keys()) == set(new.keys())
    for key in base:
        np.testing.assert_array_equal(
            np.asarray(base[key]), np.asarray(new[key]), err_msg=key)
