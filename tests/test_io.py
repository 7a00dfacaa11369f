"""IO layer: subst JSON, FASTA, pair files, TSV schema."""

import io
import os

import numpy as np
import pytest

from gpuseqalign_tpu.core.types import AlgResult, Range
from gpuseqalign_tpu.io.fasta import FormatError, read_fasta
from gpuseqalign_tpu.io.pairs import default_pairs, parse_seq_pair_file, read_seq_pairs
from gpuseqalign_tpu.io.tsv import TsvPrintCtl, write_result_to_tsv

RESRC = os.path.join(os.path.dirname(__file__), "..", "resrc")


def test_subst_blosum62(subst_data):
    assert subst_data.letters == 25
    b62 = subst_data.subst_map["blosum62"]
    assert b62.shape == (25, 25)
    lm = subst_data.letter_map
    # Known BLOSUM62 entries: s(A,A)=4, s(W,W)=11, s(A,R)=-1.
    assert b62[lm["A"], lm["A"]] == 4
    assert b62[lm["W"], lm["W"]] == 11
    assert b62[lm["A"], lm["R"]] == -1
    assert set(subst_data.subst_map) == {
        "blosum45", "blosum50", "blosum62", "blosum80", "blosum90"
    }


def test_fasta_fixture(subst_data, seq_data):
    seqs = seq_data.seq_map
    assert "len1" in seqs and "len23728" in seqs
    # Header element 0 prepended: stored length = 1 + n.
    assert len(seqs["len1"].seq) == 2
    assert seqs["len1"].seq[0] == 0
    assert len(seqs["len728"].seq) == 729
    assert len(seqs["len23728"].seq) == 23729
    # len1 is 'M'.
    assert seqs["len1"].seq[1] == subst_data.letter_map["M"]


def test_fasta_multiline_and_whitespace(subst_data):
    text = ">s1 some info here\nMY\n M Y\n\n>s2\nAR\n"
    data = read_fasta("mem", io.StringIO(text), subst_data.letter_map)
    assert list(data.seq_map) == ["s1", "s2"]
    s1 = data.seq_map["s1"]
    assert s1.info == "some info here"
    lm = subst_data.letter_map
    assert s1.seq.tolist() == [0, lm["M"], lm["Y"], lm["M"], lm["Y"]]


def test_fasta_duplicate_id(subst_data):
    text = ">a\nM\n>a\nY\n"
    with pytest.raises(FormatError) as ei:
        read_fasta("f.fa", io.StringIO(text), subst_data.letter_map)
    assert "duplicate sequence id" in str(ei.value)
    assert "f.fa:3:1" in str(ei.value)


def test_fasta_bad_letter_carries_position(subst_data):
    text = ">a\nM7\n"
    with pytest.raises(FormatError) as ei:
        read_fasta("f.fa", io.StringIO(text), subst_data.letter_map)
    # Line 2, col 2 (1-based).
    assert "f.fa:2:2" in str(ei.value)
    assert "letter not found" in str(ei.value)


def test_fasta_header_without_sequence(subst_data):
    with pytest.raises(FormatError) as ei:
        read_fasta(
            "f.fa", io.StringIO(">a\n>b\nM\n"), subst_data.letter_map
        )
    assert "expected sequence after header" in str(ei.value)


def test_pair_debug_fixture(seq_data):
    pairs = parse_seq_pair_file(
        os.path.join(RESRC, "pair_debug.txt"), seq_data.seq_map
    )
    assert len(pairs) == 173  # 191 lines minus blank separators
    assert pairs[0].seqY_id == "len1" and pairs[0].seqX_id == "len1"
    # mlsp precondition: Y is never longer than X in the fixtures.
    for p in pairs:
        assert (p.seqY_range.r - p.seqY_range.l) <= (
            p.seqX_range.r - p.seqX_range.l
        )


def test_pair_ranges(seq_data):
    text = "len512[2:] len728[:726]\nlen64[:] len128[3:100]\n"
    pairs = read_seq_pairs("p.txt", io.StringIO(text), seq_data.seq_map)
    p0, p1 = pairs
    assert p0.seqY_range == Range(l=2, r=512)
    assert p0.seqY_range.l_not_default and not p0.seqY_range.r_not_default
    assert p0.seqX_range == Range(l=0, r=726)
    assert p1.seqY_range == Range(l=0, r=64)
    assert not p1.seqY_range.l_not_default and not p1.seqY_range.r_not_default
    assert p1.seqX_range == Range(l=3, r=100)


def test_pair_range_bounds(seq_data):
    for bad, msg in [
        ("len64[64:] len128", "left bound greater than or equal"),
        ("len64[:65] len128", "right bound greater than sequence length"),
        ("len64[5:5] len128", "right bound must be greater than left"),
        ("len64[-1:] len128", "left bound must be non-negative"),
        ("nope len128", "unknown sequence id"),
        ("len64 len128 extra", "expected next line"),
    ]:
        with pytest.raises(FormatError) as ei:
            read_seq_pairs("p.txt", io.StringIO(bad + "\n"), seq_data.seq_map)
        assert msg in str(ei.value), bad


def test_default_pairs(seq_data):
    pairs = default_pairs(seq_data.seq_map)
    ids = list(seq_data.seq_map)
    assert len(pairs) == len(ids) - 1
    assert all(p.seqX_id == ids[0] for p in pairs)
    assert [p.seqY_id for p in pairs] == ids[1:]


# Reference column names/order (ref: src/file_formats.cpp:467-520) plus
# the extension columns gape_cost/align_kind/error_msg APPENDED after the
# last reference column, so every reference column keeps its reference
# position (positional parsers of reference TSVs keep working) — the
# reference is NW-linear-only, so these have no reference analog.
EXPECTED_COLS = [
    "alg_name", "seqY_idx", "seqX_idx", "seqY_id", "seqX_id",
    "seqY_len", "seqX_len", "subst_name", "gapo_cost", "warmup_runs",
    "sample_runs", "last_run_idx", "alg_params", "err_step", "nw_stat",
    "cuda_stat", "align_cost", "score_hash", "trace_hash",
    "sm_count",
    "ram_peak_allocs", "glmem_peak_allocs", "shmem_peak_allocs",
    "locmem_peak_allocs", "regmem_peak_allocs", "align.alloc",
    "align.cpy_dev", "align.init_hdr", "align.calc_init", "align.calc",
    "align.cpy_host", "hash.calc", "trace.alloc", "trace.calc", "edit_trace",
    "gape_cost", "align_kind", "error_msg",
]


def test_tsv_schema_matches_reference():
    # Column order from ref: src/file_formats.cpp:467-520.
    buf = io.StringIO()
    ctl = TsvPrintCtl(
        write_col_name=True, f_print_score_stats=True, f_print_trace_stats=True
    )
    write_result_to_tsv(buf, AlgResult(), ctl)
    assert buf.getvalue().rstrip("\n").split("\t") == EXPECTED_COLS


def test_tsv_value_formats():
    res = AlgResult()
    res.alg_name = "cpu1_st_row"
    res.score_hash = 0xDEADBEEF
    res.trace_hash = 0x1234
    res.alg_params = {"tileBx": 76, "warpDivFactorB": 1}
    res.seqY_id = "len512"
    res.seqY_range = Range(l=2, r=512, l_not_default=True)
    res.sw_align.add_ms("align.calc", 1.23456)
    buf = io.StringIO()
    ctl = TsvPrintCtl(
        write_value=True, f_print_score_stats=True, f_print_trace_stats=True
    )
    write_result_to_tsv(buf, res, ctl)
    cells = dict(zip(EXPECTED_COLS, buf.getvalue().rstrip("\n").split("\t")))
    assert cells["score_hash"] == "deadbeef"
    assert cells["trace_hash"] == "00001234"
    assert cells["alg_params"] == '{"tileBx":76,"warpDivFactorB":1}'
    assert cells["seqY_id"] == "len512[2:]"
    assert cells["align.calc"] == "1.2346"
    assert cells["align.alloc"] == "0.0000"


def test_iter_fasta_streaming_matches_batch(tmp_path):
    """iter_fasta (the streaming reader) must yield exactly what
    read_fasta loads, in file order, one record at a time."""
    from gpuseqalign_tpu.io.fasta import iter_seq_file, parse_seq_file

    lm = {"A": 0, "C": 1, "G": 2, "T": 3}
    p = tmp_path / "s.fa"
    p.write_text(">a one\nACGT\nAC\n\n>b\nGG TT\n>c info here\nA\n")
    batch = parse_seq_file(str(p), lm)
    streamed = list(iter_seq_file(str(p), lm))
    assert [s.id for s in streamed] == list(batch.seq_map.keys())
    for s in streamed:
        b = batch.seq_map[s.id]
        assert s.info == b.info
        np.testing.assert_array_equal(s.seq, b.seq)
    assert streamed[0].seq.tolist() == [0, 0, 1, 2, 3, 0, 1]
