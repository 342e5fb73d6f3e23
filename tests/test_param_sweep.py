"""Parameter-sweep e2e roundtrips (VERDICT r02 missing #5).

The reference records per-dataset non-default flag combinations
(/root/reference/non-default-parameters.txt:1-6); each set must run through
compress -> decompress bit-exactly. Read lengths are chosen so the derived
defaults (k, rw, numdict_s — minicommain.c:92-143, preprocess.c:89-107,
kthread_hash_realign.c:153-171) exercise both the short- and long-read
branches under the overrides."""

import numpy as np
import pytest

from minicom_tpu import CompressorConfig, compressor
from tests.conftest import genome_reads, random_reads, write_fastq

# (flags-as-kwargs, read length) — one entry per non-default-parameters.txt
# line, plus the two derived-default corner lengths with no overrides
SWEEP = [
    ({"k": 17}, 100),                                        # SRR689233
    ({"k": 17, "contig_window": 3, "first_minimizers": 20}, 64),  # SRR554369
    ({"first_minimizers": 20, "diff_threshold": 2,
      "max_threshold": 16}, 100),                            # MH0001.081026
    ({"k": 25, "first_minimizers": 30, "contig_window": 20,
      "diff_threshold": 18, "thr_step": 5}, 100),            # SRR870667_1
    ({"k": 23, "diff_threshold": 2, "first_minimizers": 30,
      "contig_window": 5, "max_threshold": 24}, 100),        # SRR870667_2
    ({"k": 25, "first_minimizers": 25, "contig_window": 15}, 120),  # ERR174310
    ({}, 76),   # derived defaults, short-read branch (L < 80 -> k=17)
    ({}, 150),  # derived defaults, long-read branch
]


@pytest.mark.parametrize("kwargs,L", SWEEP,
                         ids=[f"L{L}-" + ("-".join(f"{k}{v}" for k, v
                                                   in kw.items()) or "default")
                              for kw, L in SWEEP])
def test_param_sweep_roundtrip(tmp_path, rng, kwargs, L):
    reads = np.concatenate([
        genome_reads(rng, 500, L, genome_len=4000, err=0.01, p_n=0.002),
        random_reads(rng, 25, L),
    ])
    fq = tmp_path / "in.fastq"
    write_fastq(fq, reads)
    arc = tmp_path / "out.mtc"
    out = tmp_path / "dec.reads"
    summary = compressor.compress(str(fq), str(arc),
                                  CompressorConfig(**kwargs))
    compressor.decompress(str(arc), str(out))
    got = sorted(open(out, "rb").read().splitlines())
    assert got == sorted(bytes(r) for r in reads)
    assert summary["archive_bytes"] < summary["input_bytes"]


def test_param_sweep_order_mode(tmp_path, rng):
    """One non-default set through the order-preserving mode too."""
    L = 100
    reads = genome_reads(rng, 400, L, genome_len=3000, err=0.01, p_n=0.002)
    fq = tmp_path / "in.fastq"
    write_fastq(fq, reads)
    arc = tmp_path / "out.mtc"
    out = tmp_path / "dec.reads"
    compressor.compress(str(fq), str(arc),
                        CompressorConfig(k=17, first_minimizers=20,
                                         order=True))
    compressor.decompress(str(arc), str(out))
    assert open(out, "rb").read().splitlines() == [bytes(r) for r in reads]
