"""Multi-chip engines, exercised on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8; SURVEY.md §4)."""

import numpy as np
import pytest

from gpuseqalign_tpu.core.types import AlgInput, AlgParams, AlgResult, AlignSpec, Status
from gpuseqalign_tpu.models.oracle import (
    align_cost_of,
    oracle_align_dense,
    oracle_hash_dense,
    oracle_trace_dense,
)
from gpuseqalign_tpu.parallel import (
    align_giant_mlsp,
    align_pairs_batched,
    bucket_pairs,
    make_mesh,
)
from gpuseqalign_tpu.trace.sparse import hash_sparse, trace_sparse

from conftest import random_seq

SPECS = ["nw_lg", "nw_ag", "sw_lg", "sw_ag"]


def _mk_pairs(rng, sizes):
    return [(random_seq(rng, m), random_seq(rng, n)) for m, n in sizes]


@pytest.fixture(scope="module")
def mesh8():
    import jax

    assert len(jax.devices()) >= 8
    return make_mesh(8, axis_name="pairs")


class TestBatch:
    SIZES = [(1, 1), (3, 200), (130, 75), (257, 513), (64, 64), (200, 3)]

    @pytest.mark.parametrize("spec_name", SPECS)
    def test_costs_match_oracle(self, rng, blosum62, spec_name):
        spec = AlignSpec.from_name(spec_name)
        gapo, gape = -11, -2
        pairs = _mk_pairs(rng, self.SIZES)
        out = align_pairs_batched(spec, blosum62, pairs, gapo, gape)
        for k, (y, x) in enumerate(pairs):
            mats = oracle_align_dense(spec, blosum62, y, x, gapo, gape)
            assert out.costs[k] == align_cost_of(spec, mats), (spec_name, k)
            if spec_name.startswith("sw"):
                assert out.best_i[k] == mats["best"][0], (spec_name, k)
                assert out.best_j[k] == mats["best"][1], (spec_name, k)

    @pytest.mark.parametrize("spec_name", ["nw_lg", "sw_ag"])
    def test_sharded_matches_unsharded(self, rng, blosum62, mesh8, spec_name):
        spec = AlignSpec.from_name(spec_name)
        pairs = _mk_pairs(rng, [(100 + 13 * k, 150 + 7 * k) for k in range(11)])
        plain = align_pairs_batched(spec, blosum62, pairs, -11, -2)
        sharded = align_pairs_batched(spec, blosum62, pairs, -11, -2, mesh=mesh8)
        np.testing.assert_array_equal(plain.costs, sharded.costs)
        np.testing.assert_array_equal(plain.best_i, sharded.best_i)
        np.testing.assert_array_equal(plain.best_j, sharded.best_j)

    def test_bucketing(self, rng):
        pairs = _mk_pairs(rng, [(10, 10), (200, 200), (11, 9), (250, 250)])
        buckets = bucket_pairs(pairs, quantum=256)
        assert buckets == {(256, 256): [0, 1, 2, 3]}
        buckets = bucket_pairs(pairs, quantum=128)
        assert buckets == {(128, 128): [0, 2], (256, 256): [1, 3]}


class TestGiant:
    @pytest.mark.parametrize("rows,cols", [(300, 2100), (128, 1024), (1, 1),
                                           (5, 2000), (700, 1100)])
    def test_matches_oracle_full(self, rng, blosum62, rows, cols):
        """Distributed fill over 8 CPU devices: cost + sparse trace + sparse
        hash must all equal the dense oracle."""
        mesh = make_mesh(8, axis_name="sp")
        spec = AlignSpec.from_name("nw_lg")
        gapo = -11
        y = random_seq(rng, rows)
        x = random_seq(rng, cols)

        nw = AlgInput()
        nw.subst = blosum62
        nw.substsz = blosum62.shape[0]
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost = gapo
        nw.spec = spec

        res = AlgResult()
        stat = align_giant_mlsp(AlgParams({"blockH": [128]}), nw, res, mesh=mesh)
        assert stat == Status.success

        mats = oracle_align_dense(spec, blosum62, y, x, gapo)
        assert res.align_cost == int(mats["H"][-1, -1])

        assert trace_sparse(nw, res, False) == Status.success
        transcript, thash, _ = oracle_trace_dense(
            spec, mats, blosum62, y, x, gapo
        )
        assert res.edit_trace == transcript
        assert res.trace_hash == thash

        assert hash_sparse(nw, res) == Status.success
        assert res.score_hash == oracle_hash_dense(mats["H"])

    def test_single_device_mesh(self, rng, blosum62):
        mesh = make_mesh(1, axis_name="sp")
        spec = AlignSpec.from_name("nw_lg")
        y = random_seq(rng, 77)
        x = random_seq(rng, 333)
        nw = AlgInput()
        nw.subst = blosum62
        nw.substsz = blosum62.shape[0]
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost = -11
        nw.spec = spec
        res = AlgResult()
        stat = align_giant_mlsp(AlgParams({}), nw, res, mesh=mesh)
        assert stat == Status.success
        mats = oracle_align_dense(spec, blosum62, y, x, -11)
        assert res.align_cost == int(mats["H"][-1, -1])


class TestGiant2:
    def _run(self, blosum62, spec_name, y, x, mesh, params=None):
        """Run the banded giant engine (interpret) and assert cost +
        sparse trace + sparse hash bit-exact vs the dense oracle."""
        from gpuseqalign_tpu.models.oracle import align_cost_of
        from gpuseqalign_tpu.parallel.giant2 import align_giant2

        spec = AlignSpec.from_name(spec_name)
        gapo, gape = -11, -2
        nw = AlgInput()
        nw.subst = blosum62
        nw.substsz = blosum62.shape[0]
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost = gapo
        nw.gape_cost = gape
        nw.spec = spec
        res = AlgResult()
        stat = align_giant2(
            AlgParams(params or
                      {"tileBy": [128], "tileBx": [128], "kChains": [2]}),
            nw, res, mesh=mesh, interpret=True,
        )
        assert stat == Status.success
        mats = oracle_align_dense(spec, blosum62, y, x, gapo, gape)
        assert res.align_cost == align_cost_of(spec, mats)
        assert trace_sparse(nw, res, False) == Status.success
        transcript, thash, _ = oracle_trace_dense(
            spec, mats, blosum62, y, x, gapo, gape
        )
        assert res.edit_trace == transcript
        assert res.trace_hash == thash
        assert hash_sparse(nw, res) == Status.success
        assert res.score_hash == oracle_hash_dense(mats["H"])

    @pytest.mark.parametrize("spec_name", SPECS)
    def test_banded_v2_matches_oracle(self, rng, blosum62, spec_name):
        """Pallas-banded giant engine on a 2-device mesh, all four specs
        (the ICI halo carries H for linear and (H, E) for affine).
        300 rows with R=128, K=2 forces n_pass=2 (pass-to-pass H/F row
        carry); 500 cols gives band_cols=256 > TW (the jl capture map)."""
        mesh = make_mesh(2, axis_name="sp")
        self._run(blosum62, spec_name, random_seq(rng, 300),
                  random_seq(rng, 500), mesh)

    @pytest.mark.parametrize("spec_name,rows,cols",
                             [("nw_ag", 1, 1), ("sw_ag", 5, 300)])
    def test_banded_v2_degenerate(self, rng, blosum62, spec_name, rows,
                                  cols):
        mesh = make_mesh(2, axis_name="sp")
        self._run(blosum62, spec_name, random_seq(rng, rows),
                  random_seq(rng, cols), mesh,
                  params={"tileBy": [128], "tileBx": [128],
                          "kChains": [1]})

    @pytest.mark.parametrize("spec_name,k", [("nw_lg", 1), ("nw_ag", 2),
                                             ("sw_lg", 2), ("sw_ag", 2)])
    def test_banded_v2_wrap_kb2(self, rng, blosum62, spec_name, k):
        """Wrap (continuous) echelon inside the banded kernel: passBlocks=2
        makes each pass fill BL = KB*K row blocks in ONE pallas_call
        (cross-GROUP predecessor-row cascade through the prevb scratch,
        per-block halo-column windows, per-block SMEM seeds). cols=1100
        gives band_cols=640 so the wrap hazard guard holds exactly
        (NSpad = 896 = (K-1)*OFF + R + W + 256 at R=TW=W=128, K=2);
        rows=700 -> 6 blocks -> 2 passes with 2 blocks of row padding.
        nw_lg runs K=1 — the reference-parity spec through the
        single-chain wrap (kp == k self-predecessor) configuration."""
        mesh = make_mesh(2, axis_name="sp")
        self._run(blosum62, spec_name, random_seq(rng, 700),
                  random_seq(rng, 1100), mesh,
                  params={"tileBy": [128], "tileBx": [128],
                          "kChains": [k], "passBlocks": [2]})

    @pytest.mark.parametrize(
        "spec_name,k,flags",
        [
            # packedx + halo-stripe remath through the echelon grid
            ("nw_lg", 2, {"packedx": [1], "rematHdr": [1]}),
            # Affine lever cases are slow-tier: single XLA:CPU interpret
            # compiles of the affine lever bodies run 20+ min on this
            # box (CLAUDE.md test tiers); the lever configs are also
            # hardware-validated by validate_banded_flags_tpu.
            pytest.param("nw_ag", 2,
                         {"packedx": [1], "packedef": [1],
                          "rematHdr": [1]}, marks=pytest.mark.slow),
            # packedef alone, K=5 spans two packed groups
            pytest.param("sw_ag", 5, {"packedef": [1]},
                         marks=pytest.mark.slow),
            # subProw: scratch-store bottom-row capture + strided-roll
            # window rebuild (round 4), linear + affine (prow AND prowF)
            ("nw_lg", 2, {"subProw": [1]}),
            pytest.param("sw_ag", 2,
                         {"packedx": [1], "packedef": [1],
                          "subProw": [1]}, marks=pytest.mark.slow),
        ],
    )
    def test_banded_v2_flags(self, rng, blosum62, spec_name, k, flags):
        """Banded register levers (packedx / packedef / halo-stripe
        remath) must stay oracle-exact through the giant engine."""
        mesh = make_mesh(2, axis_name="sp")
        self._run(blosum62, spec_name, random_seq(rng, 700),
                  random_seq(rng, 500), mesh,
                  params={"tileBy": [128], "tileBx": [128],
                          "kChains": [k], **flags})

    @pytest.mark.parametrize(
        "spec_name,flags",
        [
            pytest.param("nw_ag",
                         {"packedx": [1], "packedef": [1],
                          "rematHdr": [1]}, marks=pytest.mark.slow),
            ("sw_lg", {"packedx": [1], "rematHdr": [1]}),
            # nw_ag subProw through the wrap grid stays default-tier:
            # it is the PRODUCTION giant config (plain K6 subProw).
            ("nw_ag", {"subProw": [1]}),
        ],
    )
    def test_banded_v2_flags_wrap(self, rng, blosum62, spec_name, flags):
        """Same levers through the wrap (continuous-echelon) banded grid
        (passBlocks=2; see test_banded_v2_wrap_kb2 for the geometry)."""
        mesh = make_mesh(2, axis_name="sp")
        self._run(blosum62, spec_name, random_seq(rng, 700),
                  random_seq(rng, 1100), mesh,
                  params={"tileBy": [128], "tileBx": [128],
                          "kChains": [2], "passBlocks": [2], **flags})

    def test_banded_v2_wrap_invalid_geometry(self, rng, blosum62):
        """Explicit passBlocks > 1 with a hazard-violating geometry (narrow
        band) must return errorInvalidValue, not crash mid-trace."""
        from gpuseqalign_tpu.parallel.giant2 import align_giant2

        mesh = make_mesh(2, axis_name="sp")
        y, x = random_seq(rng, 300), random_seq(rng, 500)
        nw = AlgInput()
        nw.subst = blosum62
        nw.substsz = blosum62.shape[0]
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost = -11
        nw.spec = AlignSpec.from_name("nw_lg")
        res = AlgResult()
        stat = align_giant2(
            AlgParams({"tileBy": [128], "tileBx": [128], "kChains": [2],
                       "passBlocks": [2]}),
            nw, res, mesh=mesh, interpret=True,
        )
        assert stat == Status.errorInvalidValue

    def test_pick_kb_model(self):
        """KB picker: 1 when the wrap hazard guard fails or blocks are
        scarce; > 1 when passes are plentiful and the per-pass drain
        dominates; never exceeds what n_blocks supports by much (padding
        is penalized)."""
        from gpuseqalign_tpu.parallel.giant2 import pick_kb

        # Narrow band: wrap_ok fails -> 1.
        assert pick_kb(100, 2, 4, R=128, W=128, band_cols=256) == 1
        # Few blocks -> 1.
        assert pick_kb(2, 2, 4, R=128, W=128, band_cols=640) == 1
        # Plentiful blocks, D=1 (no pipeline cost): drain amortization
        # pushes KB up.
        kb = pick_kb(512, 4, 1, R=2048, W=512, band_cols=8192)
        assert kb >= 4
        # Same shape, D=8: pipeline bubble tempers KB.
        kb8 = pick_kb(64, 4, 8, R=2048, W=512, band_cols=8192)
        assert kb8 <= kb
        # Stream form: many small pairs give the same pipeline total but
        # per-pair padding, so KB is capped by the pair height (any KB
        # whose pass exceeds one pair's blocks only adds padding).
        kb_s = pick_kb([8] * 64, 4, 8, R=2048, W=512,
                       band_cols=8192)
        assert kb_s <= 2
        # Single-int and 1-element-list forms agree.
        assert kb8 == pick_kb([64], 4, 8, R=2048, W=512,
                              band_cols=8192)

    def test_sw_band_argmax_unmasked(self):
        """PRODUCTION-body (masked=False) guard: SW's in-kernel argmax
        must never capture junk cells past the band edge.

        For a non-rightmost band, adjc - c0 exceeds band_cols, and the
        cells at u >= band_cols are computed from the zero-padded X tail
        — letter 0 scores like a real letter, so under the SW zero clamp
        those junk cells can beat every true cell. banded_pass clamps
        adjc_loc to band_cols + 1 before it reaches the uok mask;
        without the clamp this exact setup captures bv = 1200 (120
        letter-0 junk matches x +10) instead of <= 0.

        Every other interpret test runs masked=True (the blanket
        dead-lane mask keeps XLA:CPU compiles tractable), which hides
        this class of bug — so this one test pays the slow (~5 min)
        unmasked compile to exercise the real-TPU mask logic. sw_ag
        shares the identical spec-independent uok path (same `is_sw`
        block in _make_kernel), so sw_lg alone covers it.
        """
        import jax.numpy as jnp

        from gpuseqalign_tpu.ops.pallas_banded import banded_pass
        from gpuseqalign_tpu.ops.pallas_wavefront2 import _pack_planes

        ss = 8
        subst = np.full((ss, ss), -3, np.int32)
        np.fill_diagonal(subst, 10)
        R = W = TW = band_cols = 128
        B = K = 1
        NSpad = 384
        rng = np.random.default_rng(7)
        y = np.zeros(1 + B * R, np.int32)  # all letter 0
        xpad = np.zeros(NSpad, np.int32)
        # Band letters never 0 -> every TRUE band cell scores <= 0.
        xpad[:band_cols] = rng.integers(1, ss, band_cols)
        out = banded_pass(
            _pack_planes(jnp.asarray(subst), jnp.asarray(y), B, R),
            jnp.asarray(xpad.reshape(NSpad // W, W // 128, 128)),
            jnp.int32(-4), jnp.int32(0),
            jnp.zeros(NSpad + 128, jnp.int32),  # SW header row = 0
            None,
            jnp.zeros(B * R + 1, jnp.int32),    # SW header col = 0
            None,
            jnp.int32(121), jnp.int32(300),     # pair extends PAST band 0
            R=R, W=W, TW=TW, K=K, band_cols=band_cols,
            kind="sw", gap="linear", interpret=True, masked=False,
        )
        assert int(np.asarray(out["bv"]).max()) <= 0


class TestGiant2Stream:
    def _mk_input(self, blosum62, spec, y, x, gapo=-11, gape=-2):
        nw = AlgInput()
        nw.subst = blosum62
        nw.substsz = blosum62.shape[0]
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost = gapo
        nw.gape_cost = gape
        nw.spec = spec
        return nw

    def _check_pair(self, blosum62, spec, nw, res, stat):
        assert stat == Status.success
        mats = oracle_align_dense(
            spec, blosum62, nw.seqY, nw.seqX, nw.gapo_cost, nw.gape_cost
        )
        assert res.align_cost == align_cost_of(spec, mats)
        assert trace_sparse(nw, res, False) == Status.success
        transcript, thash, _ = oracle_trace_dense(
            spec, mats, blosum62, nw.seqY, nw.seqX,
            nw.gapo_cost, nw.gape_cost,
        )
        assert res.edit_trace == transcript
        assert res.trace_hash == thash
        assert hash_sparse(nw, res) == Status.success
        assert res.score_hash == oracle_hash_dense(mats["H"])

    @pytest.mark.parametrize("spec_name", SPECS)
    def test_stream_matches_oracle(self, rng, blosum62, spec_name):
        """Three unequal pairs through ONE pipelined fill on a 2-device
        mesh: per-pair pass counts 2/1/3 exercise the carry reset at
        pair-local pass 0, the per-pair column windows (middle pair is
        narrower than band_cols), and the per-pair SW argmax slicing."""
        from gpuseqalign_tpu.parallel.giant2 import align_giant2_stream

        mesh = make_mesh(2, axis_name="sp")
        spec = AlignSpec.from_name(spec_name)
        sizes = [(300, 500), (90, 150), (600, 400)]
        inputs = [
            self._mk_input(blosum62, spec, random_seq(rng, m),
                           random_seq(rng, n))
            for m, n in sizes
        ]
        results = [AlgResult() for _ in inputs]
        stats = align_giant2_stream(
            AlgParams({"tileBy": [128], "tileBx": [128], "kChains": [2]}),
            inputs, results, mesh=mesh, interpret=True,
        )
        for nw, res, stat in zip(inputs, results, stats):
            self._check_pair(blosum62, spec, nw, res, stat)

    def test_stream_wrap_kb2(self, rng, blosum62):
        """Stream + wrap echelon (explicit passBlocks=2): the in-kernel
        multi-group pass and the pair-boundary carry reset compose."""
        from gpuseqalign_tpu.parallel.giant2 import align_giant2_stream

        mesh = make_mesh(2, axis_name="sp")
        spec = AlignSpec.from_name("nw_ag")
        inputs = [
            self._mk_input(blosum62, spec, random_seq(rng, 700),
                           random_seq(rng, 1100)),
            self._mk_input(blosum62, spec, random_seq(rng, 350),
                           random_seq(rng, 900)),
        ]
        results = [AlgResult() for _ in inputs]
        stats = align_giant2_stream(
            AlgParams({"tileBy": [128], "tileBx": [128], "kChains": [2],
                       "passBlocks": [2]}),
            inputs, results, mesh=mesh, interpret=True,
        )
        for nw, res, stat in zip(inputs, results, stats):
            self._check_pair(blosum62, spec, nw, res, stat)

    def test_stream_singleton_matches_single(self, rng, blosum62):
        """A 1-pair stream is the single-pair engine (same layout, same
        sparse bytes)."""
        from gpuseqalign_tpu.parallel.giant2 import (
            align_giant2,
            align_giant2_stream,
        )

        mesh = make_mesh(2, axis_name="sp")
        spec = AlignSpec.from_name("sw_lg")
        y, x = random_seq(rng, 300), random_seq(rng, 500)
        params = AlgParams(
            {"tileBy": [128], "tileBx": [128], "kChains": [2]}
        )
        nw1 = self._mk_input(blosum62, spec, y, x)
        res1 = AlgResult()
        assert align_giant2(params, nw1, res1, mesh=mesh,
                            interpret=True) == Status.success
        nw2 = self._mk_input(blosum62, spec, y, x)
        res2 = AlgResult()
        (stat,) = align_giant2_stream(params, [nw2], [res2], mesh=mesh,
                                      interpret=True)
        assert stat == Status.success
        assert res1.align_cost == res2.align_cost
        np.testing.assert_array_equal(nw1.tileHrowMat, nw2.tileHrowMat)
        np.testing.assert_array_equal(nw1.tileHcolMat, nw2.tileHcolMat)

    def test_stream_mixed_costs_rejected(self, rng, blosum62):
        from gpuseqalign_tpu.parallel.giant2 import align_giant2_stream

        mesh = make_mesh(2, axis_name="sp")
        spec = AlignSpec.from_name("nw_lg")
        a = self._mk_input(blosum62, spec, random_seq(rng, 60),
                           random_seq(rng, 60), gapo=-11)
        b = self._mk_input(blosum62, spec, random_seq(rng, 60),
                           random_seq(rng, 60), gapo=-4)
        stats = align_giant2_stream(
            AlgParams({}), [a, b], [AlgResult(), AlgResult()],
            mesh=mesh, interpret=True,
        )
        assert stats == [Status.errorInvalidValue] * 2


class TestGiant2Params:
    def test_undersized_tiles_rejected(self, blosum62, rng):
        """Explicit tileBy/tileBx that aren't positive 128-multiples are
        an invalid param combo for the banded engine — errorInvalidValue,
        not a reshape crash (found by bench/fuzz.py)."""
        from gpuseqalign_tpu.parallel.giant2 import (
            align_giant2, align_giant2_stream,
        )

        y, x = random_seq(rng, 50), random_seq(rng, 60)
        nw = AlgInput()
        nw.subst = blosum62
        nw.substsz = blosum62.shape[0]
        nw.seqY, nw.seqX = y, x
        nw.adjrows, nw.adjcols = len(y), len(x)
        nw.gapo_cost, nw.gape_cost = -11, 0
        nw.spec = AlignSpec.from_name("nw_lg")
        mesh = make_mesh(1, axis_name="sp")
        for params in ({"tileBy": [64]}, {"tileBx": [32]},
                       {"tileBy": [192], "tileBx": [100]}):
            stat = align_giant2(AlgParams(params), nw, AlgResult(),
                                mesh=mesh, interpret=True)
            assert stat == Status.errorInvalidValue, params
            stats = align_giant2_stream(AlgParams(params), [nw],
                                        [AlgResult()], mesh=mesh,
                                        interpret=True)
            assert stats == [Status.errorInvalidValue], params
