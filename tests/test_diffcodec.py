"""Diff-string codec: exact reference rules + roundtrip properties."""

import numpy as np
import pytest

from minicom_tpu import native


def _enc1(ref: bytes, read: bytes, rule: int) -> bytes:
    out = native.diff_encode(np.frombuffer(ref, np.uint8).reshape(1, -1),
                             np.frombuffer(read, np.uint8).reshape(1, -1), rule)
    assert out.endswith(b"\n")
    return out[:-1]


def test_cluster_rule_examples():
    # run >= 2 -> digits; run of 1 -> literal matched char
    # (kthread_dump.c:198-220)
    assert _enc1(b"AAAAAAAA", b"AAAAAAAA", 0) == b"0"
    assert _enc1(b"AAAAAAAA", b"AAATAAAA", 0) == b"3T"
    assert _enc1(b"AAAAAAAA", b"TAAAAAAA", 0) == b"T"
    # isolated match between mismatches is emitted literally
    assert _enc1(b"AAAAA", b"TATAA", 0) == b"TAT"
    # trailing matches are dropped
    assert _enc1(b"AAAAA", b"TAAAA", 0) == b"T"


def test_aattnn_rule_examples():
    # any match-run >= 1 -> digits (kthread_dump.c:580-596)
    assert _enc1(b"AAAAA", b"TATAA", 1) == b"T1T"
    assert _enc1(b"AAAAA", b"AAAAA", 1) == b"0"
    assert _enc1(b"AAAAA", b"AAAAT", 1) == b"4T"


@pytest.mark.parametrize("rule", [0, 1])
def test_roundtrip_random(rng, rule):
    M, L = 200, 101
    bases = np.frombuffer(b"ACGTN", np.uint8)
    ref = bases[rng.integers(0, 4, size=(M, L))]
    read = ref.copy()
    mut = rng.random((M, L)) < 0.08
    read[mut] = bases[rng.integers(0, 5, size=int(mut.sum()))]
    text = native.diff_encode(ref, read, rule)
    back = native.diff_decode(text, ref, M)
    assert np.array_equal(back, read)


@pytest.mark.parametrize("rule", [0, 1])
def test_native_matches_python(rng, rule):
    M, L = 50, 64
    bases = np.frombuffer(b"ACGTN", np.uint8)
    ref = bases[rng.integers(0, 4, size=(M, L))]
    read = ref.copy()
    mut = rng.random((M, L)) < 0.15
    read[mut] = bases[rng.integers(0, 5, size=int(mut.sum()))]
    assert native.diff_encode(ref, read, rule) == native._py_encode(ref, read, rule)
    lens = native.diff_encode_lengths(ref, read, rule)
    enc = native.diff_encode(ref, read, rule).split(b"\n")[:-1]
    assert list(lens) == [len(x) for x in enc]
