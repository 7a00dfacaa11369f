"""Core utilities: djb2 hashing, RLE transcripts, parameter odometer."""

import numpy as np

from gpuseqalign_tpu.core.hashing import djb2_array, djb2_ints, djb2_str
from gpuseqalign_tpu.core.transcript import expand_transcript, rle_from_edits
from gpuseqalign_tpu.core.types import AlgParams, AlignSpec, Range


def djb2_ref(values):
    h = 5381
    for v in values:
        h = (((h << 5) + h) & 0xFFFFFFFF) ^ (int(v) & 0xFFFFFFFF)
    return h


def test_djb2_ints_matches_definition():
    vals = [0, 1, -1, 123456, -987654, 2**31 - 1, -(2**31)]
    assert djb2_ints(vals) == djb2_ref(vals)


def test_djb2_str_ascii():
    s = "193=1X2I"
    assert djb2_str(s) == djb2_ref([ord(c) for c in s])


def test_djb2_array_matches_python():
    rng = np.random.default_rng(0)
    arr = rng.integers(-(2**31), 2**31 - 1, size=10_000, dtype=np.int64).astype(
        np.int32
    )
    assert djb2_array(arr) == djb2_ints(arr.tolist())


def test_djb2_chaining():
    arr = np.arange(-50, 50, dtype=np.int32)
    h1 = djb2_array(arr[:30])
    h2 = djb2_array(arr[30:], h1)
    assert h2 == djb2_array(arr)


def test_rle_transcript_format():
    # Count-then-letter runs, path order (the reference's double-reversal
    # construction collapses to this, ref: src/nwtrace1_plain.cpp:81-103).
    edits = ["="] * 193 + ["X"] + ["I", "I"]
    assert rle_from_edits(edits) == "193=1X2I"
    assert expand_transcript("193=1X2I") == "=" * 193 + "X" + "II"


def test_rle_single_run():
    assert rle_from_edits(["D"] * 12) == "12D"


def test_params_odometer_last_param_fastest():
    # (ref: src/run_types.cpp:69-83) the LAST parameter increments first.
    pr = AlgParams({"a": [1, 2], "b": [10, 20, 30]})
    seen = []
    while pr.has_curr():
        seen.append((pr.at("a"), pr.at("b")))
        pr.next()
    assert seen == [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20), (2, 30),
    ]
    pr.reset()
    assert pr.has_curr() and pr.at("a") == 1 and pr.at("b") == 10


def test_params_empty_iterates_once():
    pr = AlgParams({})
    assert pr.has_curr()
    pr.next()
    assert not pr.has_curr()


def test_range_equality_ignores_flags():
    # (ref: src/run_types.cpp:5-14) only l/r compared.
    a = Range(l=0, r=10, l_not_default=True)
    b = Range(l=0, r=10)
    assert a == b
    assert Range(l=0, r=10) != Range(l=1, r=10)


def test_range_id_suffix():
    assert Range(l=0, r=10).id_suffix() == ""
    assert Range(l=2, r=10, l_not_default=True).id_suffix() == "[2:]"
    assert Range(l=0, r=7, r_not_default=True).id_suffix() == "[:7]"
    assert (
        Range(l=2, r=7, l_not_default=True, r_not_default=True).id_suffix()
        == "[2:7]"
    )


def test_align_spec_names():
    for name in ("nw_lg", "nw_ag", "sw_lg", "sw_ag"):
        assert AlignSpec.from_name(name).name == name


def test_params_empty_list_rejected():
    """An empty parameter value list has no current combination — it
    must fail fast (construction / parse), not IndexError mid-benchmark
    inside the driver loop."""
    import json

    import pytest

    from gpuseqalign_tpu.core.types import AlgParams
    from gpuseqalign_tpu.io.params import parse_alg_params_file

    with pytest.raises(ValueError):
        AlgParams({"tileBy": []})
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "p.json")
        with open(p, "w") as f:
            json.dump({"tpu3_pallas_dense": {"blocksz": []}}, f)
        with pytest.raises(ValueError):
            parse_alg_params_file(p)


def test_peak_mem_resets_per_cycle():
    """ram/glmem peaks are PER-CYCLE: a small pair benchmarked after a
    large one must not inherit the large pair's footprint."""
    import numpy as np

    from gpuseqalign_tpu.core.types import AlgInput

    nw = AlgInput()
    nw.seqY = np.zeros(10, np.int32)
    nw.seqX = np.zeros(10, np.int32)
    nw.score = np.zeros((4000, 4000), np.int32)  # a big cycle's matrix
    nw.note_host_alloc()
    nw.note_device_alloc(123456)
    big = nw.host_peak_bytes
    assert big > 4000 * 4000 * 4 - 1
    nw.reset_cycle()
    assert nw.host_peak_bytes < 1000  # just the surviving sequences
    assert nw.device_peak_bytes == 0


def test_djb2_array_uses_native_fast_path(monkeypatch):
    """djb2_array must actually reach the native C++ djb2 when the
    library is available (a broken symbol lookup once silently fell back
    to the ~400x slower Python loop on every score hash)."""
    import numpy as np

    from gpuseqalign_tpu import native
    from gpuseqalign_tpu.core import hashing

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    sentinel = 0xDEADBEE
    monkeypatch.setattr(native, "djb2_i32", lambda arr, h=5381: sentinel)
    assert hashing.djb2_array(np.arange(10, dtype=np.int32)) == sentinel
