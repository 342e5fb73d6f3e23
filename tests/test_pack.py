import numpy as np

from minicom_tpu.ops import pack


def test_ascii_roundtrip(rng):
    a = rng.integers(0, 5, size=(7, 33)).astype(np.uint8)
    ascii_ = pack.codes_to_ascii(a)
    assert np.array_equal(pack.ascii_to_codes(ascii_), a)


def test_pack_2bit_roundtrip(rng):
    codes = rng.integers(0, 4, size=(5, 101)).astype(np.uint8)
    packed = pack.pack_2bit(codes)
    assert packed.shape == (5, 26)
    assert np.array_equal(pack.unpack_2bit(packed, 101), codes)


def test_pack_2bit_layout_matches_dna_push():
    # DNA_push packs base i into bits [2i, 2i+2) (breads.h:232-239)
    codes = np.array([1, 2, 3, 0, 2], dtype=np.uint8)
    packed = pack.pack_2bit(codes)
    assert packed[0] == (1 | (2 << 2) | (3 << 4) | (0 << 6))
    assert packed[1] == 2


def test_pack_bits_roundtrip(rng):
    bits = rng.integers(0, 2, size=(3, 19)).astype(np.uint8)
    packed = pack.pack_bits(bits)
    assert np.array_equal(pack.unpack_bits(packed, 19), bits)


def test_revcomp():
    codes = pack.ascii_to_codes(np.frombuffer(b"ACGTN", np.uint8))
    rc = pack.revcomp_codes(codes)
    assert pack.codes_to_ascii(rc).tobytes() == b"NACGT"


def test_words_popcount(rng):
    codes = rng.integers(0, 4, size=(4, 50)).astype(np.uint8)
    w = pack.pack_2bit_words(codes)
    assert w.shape == (4, 4)
    x = pack.pack_2bit_words(np.zeros((4, 50), np.uint8))
    # popcount of (codes ^ 0) counts set bits of the 2-bit codes
    expect = np.array([[bin(int(c)).count("1") for c in row] for row in codes]).sum(1)
    assert np.array_equal(pack.popcount_u32(w ^ x).sum(axis=1), expect)
