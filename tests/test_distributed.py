"""Multi-process determinism: archives must be byte-identical for any process
count (SURVEY.md §4 item 3 — the reference cannot do this: its format bakes in
the thread count and its clusters depend on scheduling, kthread_dump.c:375).

Runs real jax.distributed process groups (CPU backend) via subprocess workers.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import genome_reads, write_fastq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_group(nproc: int, fq: str, outdir: str,
               write_all: bool = True) -> list[str]:
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               MTC_WRITE_ALL_RANKS="1" if write_all else "0")
    procs, outs = [], []
    for pid in range(nproc):
        out = os.path.join(outdir, f"r{nproc}_{pid}.mtc")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, coord, str(nproc), str(pid), fq, out],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, stdout.decode(errors="replace")[-3000:]
    return outs


@pytest.mark.parametrize("nproc", [2, 3])
def test_archive_independent_of_process_count(tmp_path, rng, nproc):
    reads = genome_reads(rng, 1500, 60, genome_len=6000, err=0.01, p_n=0.002)
    fq = str(tmp_path / "in.fastq")
    write_fastq(fq, reads)

    # golden single-process archive
    from minicom_tpu import compressor
    golden_path = str(tmp_path / "golden.mtc")
    compressor.compress(fq, golden_path)
    golden = open(golden_path, "rb").read()

    outs = _run_group(nproc, fq, str(tmp_path))
    for pid, out in enumerate(outs):
        assert open(out, "rb").read() == golden, (
            f"rank {pid}/{nproc} archive differs from single-process bytes")


def test_sharded_decode_parity(tmp_path, rng):
    """Decode shards too (stream-partitioned entropy decode + member-range
    cluster unpack, VERDICT r04 missing #7): every rank's decoded output is
    byte-identical to the single-process decompress."""
    reads = genome_reads(rng, 1500, 60, genome_len=6000, err=0.01, p_n=0.002)
    fq = str(tmp_path / "in.fastq")
    write_fastq(fq, reads)

    from minicom_tpu import compressor
    golden_path = str(tmp_path / "golden.mtc")
    compressor.compress(fq, golden_path)
    compressor.decompress(golden_path, golden_path + ".dec")
    golden_dec = open(golden_path + ".dec", "rb").read()

    os.environ["MTC_DIST_DECODE"] = "1"
    try:
        outs = _run_group(2, fq, str(tmp_path))
    finally:
        del os.environ["MTC_DIST_DECODE"]
    for pid, out in enumerate(outs):
        assert open(out + ".dec", "rb").read() == golden_dec, (
            f"rank {pid} decode differs from single-process bytes")


def test_rank0_only_write_by_default(tmp_path, rng):
    """Without MTC_WRITE_ALL_RANKS only rank 0 writes the archive (others
    barrier) — N concurrent writers to one shared-FS path are fragile even
    when their bytes are identical (VERDICT r02 weak #8)."""
    reads = genome_reads(rng, 600, 60, genome_len=4000, err=0.01)
    fq = str(tmp_path / "in.fastq")
    write_fastq(fq, reads)

    from minicom_tpu import compressor
    golden_path = str(tmp_path / "golden.mtc")
    compressor.compress(fq, golden_path)
    golden = open(golden_path, "rb").read()

    outs = _run_group(2, fq, str(tmp_path), write_all=False)
    assert open(outs[0], "rb").read() == golden
    assert not os.path.exists(outs[1]), "rank 1 must not write an archive"


def test_partition_contiguous_balanced():
    from minicom_tpu.parallel import distributed as dist
    dist.set_process_grid(0, 4)
    try:
        w = np.array([5, 1, 1, 1, 8, 1, 1, 1, 1, 4])
        parts = dist.partition(w)
        assert parts[0][0] == 0 and parts[-1][1] == len(w)
        for (a, b), (c, d) in zip(parts, parts[1:]):
            assert b == c and a <= b and c <= d
        # empty-weight and single-item edge cases
        assert dist.partition(np.zeros(0))[-1] == (0, 0)
        assert dist.partition(np.array([7]))[-1][1] == 1
    finally:
        dist.set_process_grid(0, 1)
