"""Parameter-surface sweep (non-default-parameters.txt in the reference):
every published flag combination roundtrips bit-exactly."""

import numpy as np
import pytest

from minicom_tpu import CompressorConfig, compressor
from tests.conftest import genome_reads, write_fastq

# flag sets from the reference's non-default-parameters.txt:1-6
SWEEP = [
    dict(k=17),
    dict(k=17, contig_window=3, first_minimizers=20),
    dict(first_minimizers=20, diff_threshold=2, max_threshold=16),
    dict(k=25, first_minimizers=30, contig_window=20, diff_threshold=18,
         thr_step=5),
    dict(k=23, diff_threshold=2, first_minimizers=30, contig_window=5,
         max_threshold=24),
    dict(k=25, first_minimizers=25, contig_window=15),
]


@pytest.mark.parametrize("kw", SWEEP)
def test_param_sweep_roundtrip(tmp_path, rng, kw):
    L = 100
    reads = genome_reads(rng, 400, L, genome_len=2500, err=0.01, p_n=0.001)
    fq = tmp_path / "in.fastq"
    write_fastq(fq, reads)
    arc = tmp_path / "out.mtc"
    out = tmp_path / "dec.reads"
    compressor.compress(str(fq), str(arc), CompressorConfig(**kw))
    compressor.decompress(str(arc), str(out))
    got = sorted(open(out, "rb").read().splitlines())
    assert got == sorted(bytes(r) for r in reads)


def test_config_derived_defaults():
    # minicommain.c:92-143, preprocess.c:89-107, kthread_hash_realign.c:153-171
    r = CompressorConfig().resolve(100)
    assert r.k == 31 and r.diff_threshold == 4 and r.cb_threshold == 8
    assert r.thr_step == 4 and r.max_threshold == 50
    assert r.contig_window == 100 // 2 - 31
    assert r.num_dicts == 100 // 17 and r.dict_seg_len == 17

    r = CompressorConfig().resolve(64)
    assert r.k == 17 and r.contig_window == 3
    assert r.dict_seg_len == 11 and r.num_dicts == 64 // 11

    r = CompressorConfig(diff_threshold=18).resolve(100)
    assert r.thr_step == 5 and r.cb_threshold == 36

    r = CompressorConfig(num_dicts=2).resolve(100)
    assert r.num_dicts == 2 and r.dicts_centered
    ranges = r.dict_ranges()
    assert ranges[0][0] == 100 // 2 - 17 and len(ranges) == 2

    # widening rule (preprocess.c:169-172)
    r = CompressorConfig().resolve(100, n_singletons=1000)
    assert r.max_search == 2000
    r = CompressorConfig().resolve(100, n_singletons=6_000_000)
    assert r.max_search == 500


def test_readlen_bounds():
    with pytest.raises(ValueError):
        CompressorConfig().resolve(257)
