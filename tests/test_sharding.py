"""Multi-device sharding: archives are byte-identical for any device count
(SURVEY.md §4.3 — the reference's per-thread-shard format can't offer this;
our canonical stream order makes it automatic). Runs on the virtual 8-device
CPU mesh from conftest."""

import jax
import numpy as np
import pytest

from minicom_tpu import compressor
from minicom_tpu.parallel import mesh as mesh_mod
from tests.conftest import genome_reads, write_fastq


@pytest.fixture(autouse=True)
def _reset_mesh():
    yield
    mesh_mod.set_mesh(None)


def test_archive_identical_across_device_counts(tmp_path, rng):
    reads = genome_reads(rng, 700, 100, genome_len=3000, err=0.01, p_n=0.002)
    fq = tmp_path / "in.fastq"
    write_fastq(fq, reads)

    outs = {}
    for n_dev in (None, 2, 8):
        arc = tmp_path / f"out_{n_dev}.mtc"
        mesh_mod.set_mesh(None if n_dev is None
                          else mesh_mod.make_mesh(n_dev))
        compressor.compress(str(fq), str(arc))
        outs[n_dev] = arc.read_bytes()

    assert outs[None] == outs[2] == outs[8]
    # and it still roundtrips
    mesh_mod.set_mesh(None)
    dec = tmp_path / "dec.reads"
    compressor.decompress(str(tmp_path / "out_8.mtc"), str(dec))
    got = sorted(open(dec, "rb").read().splitlines())
    assert got == sorted(bytes(r) for r in reads)


def test_sharded_cluster_step_matches_single(rng):
    """The fused step (graft entry) gives identical results sharded vs not."""
    from minicom_tpu.ops.step import cluster_step
    from minicom_tpu.parallel.mesh import make_mesh, sharded_cluster_step
    import jax.numpy as jnp

    N, L, k = 128, 48, 17
    codes = jnp.asarray(rng.integers(0, 4, size=(N, L), dtype=np.uint8))
    ref = cluster_step(codes, k, span_cols=N * 2 * L)
    step = sharded_cluster_step(make_mesh(8), k, span_cols=N * 2 * L)
    got = step(codes)
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))
