"""CLI surface: flags parse, compress/decompress drive the pipeline."""

import numpy as np

from minicom_tpu import cli
from tests.conftest import genome_reads, write_fastq


def test_cli_roundtrip(tmp_path, rng):
    reads = genome_reads(rng, 200, 80, genome_len=1500)
    fq = tmp_path / "in.fastq"
    write_fastq(fq, reads)
    arc = tmp_path / "out.mtc"
    out = tmp_path / "dec.reads"
    assert cli.main(["-r", str(fq), "-o", str(arc), "-k", "17", "-e", "3"]) == 0
    assert cli.main(["-d", str(arc), "-o", str(out)]) == 0
    got = sorted(open(out, "rb").read().splitlines())
    assert got == sorted(bytes(r) for r in reads)


def test_cli_order_flag(tmp_path, rng):
    reads = genome_reads(rng, 150, 80, genome_len=1200)
    fq = tmp_path / "in.fastq"
    write_fastq(fq, reads)
    arc = tmp_path / "out.mtc"
    out = tmp_path / "dec.reads"
    assert cli.main(["-r", str(fq), "-o", str(arc), "-p"]) == 0
    assert cli.main(["-d", str(arc), "-o", str(out)]) == 0
    got = open(out, "rb").read().splitlines()
    assert got == [bytes(r) for r in reads]


def test_cli_no_args_shows_help(capsys):
    assert cli.main([]) == 2
