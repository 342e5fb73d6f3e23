"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere
(the driver separately dry-runs the multi-chip path the same way).

MTC_REAL_TPU=1 skips the CPU forcing so the real-backend tests
(tests/test_tpu_pallas.py) can reach the hardware:
    MTC_REAL_TPU=1 python -m pytest tests/test_tpu_pallas.py -q
"""

import os

_REAL_TPU = os.environ.get("MTC_REAL_TPU") == "1"
if not _REAL_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon site customization pins jax_platforms to the TPU plugin; tests
# must run on the virtual 8-device CPU mesh regardless
if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_reads(rng, n, L, p_n=0.0):
    """Random [n, L] ASCII read matrix with optional N probability."""
    codes = rng.integers(0, 4, size=(n, L))
    out = np.frombuffer(b"ACGT", dtype=np.uint8)[codes].copy()
    if p_n > 0:
        out[rng.random((n, L)) < p_n] = ord("N")
    return out


def genome_reads(rng, n, L, genome_len=10_000, err=0.01, p_n=0.0,
                 revcomp=True):
    """Reads sampled from a random genome with substitution errors — the
    workload shape the clustering pipeline is built for."""
    genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
    starts = rng.integers(0, genome_len - L, size=n)
    reads = genome[starts[:, None] + np.arange(L)]
    # substitution errors
    em = rng.random((n, L)) < err
    reads = np.where(em, (reads + rng.integers(1, 4, size=(n, L))) % 4, reads)
    reads = reads.astype(np.uint8)
    if revcomp:
        flip = rng.random(n) < 0.5
        rc = np.flip(3 - reads[flip], axis=1)
        reads[flip] = rc
    out = np.frombuffer(b"ACGT", dtype=np.uint8)[reads].copy()
    if p_n > 0:
        out[rng.random((n, L)) < p_n] = ord("N")
    return out


def write_fastq(path, ascii_mat):
    with open(path, "wb") as f:
        for i, row in enumerate(ascii_mat):
            f.write(b"@r%d\n" % i)
            f.write(row.tobytes() + b"\n")
            f.write(b"+\n")
            f.write(b"I" * len(row) + b"\n")
