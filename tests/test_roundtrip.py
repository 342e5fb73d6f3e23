"""End-to-end compress -> decompress roundtrips for all three modes."""

import numpy as np
import pytest

from minicom_tpu import CompressorConfig, compressor
from tests.conftest import genome_reads, random_reads, write_fastq


def _special_reads(L):
    """Exercise every special class (SURVEY.md §4 test plan)."""
    rows = [
        b"A" * L,                      # allA
        b"T" * L,                      # allT
        b"N" * L,                      # allN
        b"A" * (L - 2) + b"CG",        # nearA
        b"T" * (L - 3) + b"GCA",       # nearT
        b"N" * (L - 2) + b"AC",        # mostlyN
        b"AN" * (L // 2) + b"A" * (L % 2),   # >40% N -> single_N
    ]
    return np.array([list(r) for r in rows], dtype=np.uint8)


def _sorted_lines(path):
    with open(path, "rb") as f:
        return sorted(f.read().splitlines())


def _lines(path):
    with open(path, "rb") as f:
        return f.read().splitlines()


@pytest.mark.parametrize("L", [100, 64])
def test_roundtrip_unordered(tmp_path, rng, L):
    reads = np.concatenate([
        genome_reads(rng, 600, L, genome_len=4000, err=0.01, p_n=0.002),
        random_reads(rng, 30, L),
        _special_reads(L),
    ])
    fq = tmp_path / "in.fastq"
    write_fastq(fq, reads)
    arc = tmp_path / "out.mtc"
    out = tmp_path / "dec.reads"
    summary = compressor.compress(str(fq), str(arc))
    compressor.decompress(str(arc), str(out))
    want = sorted(bytes(r) for r in reads)
    assert _sorted_lines(out) == want
    assert summary["archive_bytes"] < summary["input_bytes"]


def test_roundtrip_order(tmp_path, rng):
    L = 100
    reads = np.concatenate([
        genome_reads(rng, 500, L, genome_len=3000, err=0.01, p_n=0.002),
        _special_reads(L),
        random_reads(rng, 20, L),
    ])
    perm = rng.permutation(len(reads))
    reads = reads[perm]
    fq = tmp_path / "in.fastq"
    write_fastq(fq, reads)
    arc = tmp_path / "out.mtc"
    out = tmp_path / "dec.reads"
    compressor.compress(str(fq), str(arc), CompressorConfig(order=True))
    compressor.decompress(str(arc), str(out))
    assert _lines(out) == [bytes(r) for r in reads]


def test_roundtrip_pe(tmp_path, rng):
    L = 100
    n = 400
    r1 = np.concatenate([
        genome_reads(rng, n, L, genome_len=3000, err=0.01),
        _special_reads(L)])
    r2 = np.concatenate([
        genome_reads(rng, n, L, genome_len=3000, err=0.01),
        _special_reads(L)])
    fq1, fq2 = tmp_path / "in1.fastq", tmp_path / "in2.fastq"
    write_fastq(fq1, r1)
    write_fastq(fq2, r2)
    arc = tmp_path / "out.mtc"
    o1, o2 = tmp_path / "d1.reads", tmp_path / "d2.reads"
    compressor.compress(str(fq1), str(arc), reads_path2=str(fq2))
    compressor.decompress(str(arc), str(o1), str(o2))
    # pairing invariant: the multiset of (mate1, mate2) pairs is preserved
    got = sorted(zip(_lines(o1), _lines(o2)))
    want = sorted(zip([bytes(r) for r in r1], [bytes(r) for r in r2]))
    assert got == want


def test_roundtrip_tiny_edge_cases(tmp_path, rng):
    # all-identical reads, single read, two reads
    L = 60
    for reads in [
        np.tile(random_reads(rng, 1, L), (5, 1)),
        random_reads(rng, 1, L),
        random_reads(rng, 2, L),
    ]:
        fq = tmp_path / "in.fastq"
        write_fastq(fq, reads)
        arc = tmp_path / "out.mtc"
        out = tmp_path / "dec.reads"
        compressor.compress(str(fq), str(arc))
        compressor.decompress(str(arc), str(out))
        assert _sorted_lines(out) == sorted(bytes(r) for r in reads)


def test_archive_deterministic(tmp_path, rng):
    L = 100
    reads = genome_reads(rng, 300, L, genome_len=2000)
    fq = tmp_path / "in.fastq"
    write_fastq(fq, reads)
    a1, a2 = tmp_path / "a1.mtc", tmp_path / "a2.mtc"
    compressor.compress(str(fq), str(a1))
    compressor.compress(str(fq), str(a2))
    assert a1.read_bytes() == a2.read_bytes()


def test_roundtrip_hard_profile(tmp_path):
    """The second bench distribution (150 bp, 2% error, power-law coverage
    skew — bench.py profile='hard') roundtrips exactly; guards the L=150
    shape ladder and high-error paths the default profile never hits."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench import make_dataset
    fq = tmp_path / "hard.fastq"
    make_dataset(str(fq), 20_000, profile="hard")
    arc, dec = tmp_path / "h.mtc", tmp_path / "h.reads"
    compressor.compress(str(fq), str(arc))
    compressor.decompress(str(arc), str(dec))
    want = sorted(open(fq, "rb").read().splitlines()[1::4])
    got = sorted(open(dec, "rb").read().splitlines())
    assert want == got
