"""CIGAR math tests vs reference semantics (src/bamutil.cpp:204-336)."""

import numpy as np

from gencore_tpu.utils import cigar as cig


def test_parse_roundtrip():
    c = cig.from_string("5S95M")
    ops, lens = cig.ops_lens(c)
    assert list(ops) == [cig.CSOFT_CLIP, cig.CMATCH]
    assert list(lens) == [5, 95]
    assert cig.query_len(c) == 100
    assert cig.ref_len(c) == 95


def test_ref_offset_scalar():
    c = cig.from_string("5S10M2D10M3I10M")
    # softclip positions -> -1
    for i in range(5):
        assert cig.ref_offset(c, i) == -1
    # first M: query 5..14 -> ref 0..9
    assert cig.ref_offset(c, 5) == 0
    assert cig.ref_offset(c, 14) == 9
    # second M after 2D: query 15..24 -> ref 12..21
    assert cig.ref_offset(c, 15) == 12
    assert cig.ref_offset(c, 24) == 21
    # insertion -> -1
    assert cig.ref_offset(c, 25) == -1
    assert cig.ref_offset(c, 27) == -1
    # third M: query 28..37 -> ref 22..31
    assert cig.ref_offset(c, 28) == 22
    assert cig.ref_offset(c, 37) == 31
    # past end
    assert cig.ref_offset(c, 38) == -1


def test_ref_offsets_vector_matches_scalar():
    rng = np.random.default_rng(0)
    cigs = ["100M", "5S95M", "50M3I47M", "10M2D90M", "3S40M5D40M2I15M2S", "4H96M"]
    for s in cigs:
        c = cig.from_string(s)
        n = cig.query_len(c)
        vec = cig.ref_offsets_vector(c, n)
        for i in range(n):
            assert vec[i] == cig.ref_offset(c, i), (s, i)


def test_first_m():
    assert cig.first_m_offset_len(cig.from_string("100M")) == (0, 100)
    assert cig.first_m_offset_len(cig.from_string("5S95M")) == (5, 95)
    assert cig.first_m_offset_len(cig.from_string("3I97M")) == (3, 97)
    assert cig.first_m_offset_len(cig.from_string("5H95M")) == (0, 95)
    assert cig.first_m_offset_len(cig.from_string("10I")) == (0, 0)


def test_is_part_of_left():
    M100 = cig.from_string("100M")
    M90 = cig.from_string("90M")
    assert cig.is_part_of(M90, M100, True)
    assert not cig.is_part_of(M100, M90, True)
    assert cig.is_part_of(M100, M100, True)
    # op mismatch
    assert not cig.is_part_of(cig.from_string("90M"), cig.from_string("5S95M"), True)
    # shortfall in non-last op -> only allowed before trailing hard clip
    assert not cig.is_part_of(cig.from_string("40M10S"), cig.from_string("50M10S"), True)
    assert cig.is_part_of(cig.from_string("40M10H"), cig.from_string("50M10H"), True)
    # whole has more ops
    assert cig.is_part_of(cig.from_string("50M"), cig.from_string("50M10S"), True)


def test_is_part_of_right():
    # right-aligned comparison walks from the back
    assert cig.is_part_of(cig.from_string("90M"), cig.from_string("100M"), False)
    assert cig.is_part_of(cig.from_string("90M"), cig.from_string("5S95M"), False)
    assert not cig.is_part_of(cig.from_string("5S90M"), cig.from_string("95M"), False)


def test_right_ref_pos():
    assert cig.right_ref_pos(100, cig.from_string("50M")) == 150
    assert cig.right_ref_pos(100, cig.from_string("5S45M")) == 145
    assert cig.right_ref_pos(100, cig.from_string("20M5D20M")) == 145
    assert cig.right_ref_pos(-1, cig.from_string("50M")) == -1
