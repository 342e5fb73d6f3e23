"""COMPILED Pallas parity on the real TPU backend (VERDICT r02 weak #6).

The interpret-mode test (test_sketch.py) checks kernel semantics but not the
Mosaic compiler's lowering — a miscompile of the kind the kernel already
works around (pallas_sketch._shl's roll-based windowing) would surface as a
silent compression-ratio loss, not a test failure. This module runs the
actual compiled kernel against the XLA reference path on hardware, through
the exact gather + sketch split the merge stage dispatches
(pipeline/merge.py::sketch_contigs).

Skipped on CPU. Run with:  MTC_REAL_TPU=1 python -m pytest tests/test_tpu_pallas.py -q
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="real TPU backend required (set MTC_REAL_TPU=1 outside the CPU "
           "test sandbox)")


def _both_paths(ref_flat, starts, lengths, k, w, m, Lmax):
    """Run the Pallas and XLA kernels over the same gathered rows; returns
    the two packed buffers (key32 | meta | nv)."""
    from minicom_tpu.ops.pallas_sketch import sketch_windowed_pallas_compact32
    from minicom_tpu.ops.sketch import (gather_contig_rows,
                                        sketch_windowed_compact32)
    sl = jnp.asarray(np.stack([starts, lengths]).astype(np.int32))
    codes, ln = gather_contig_rows(jnp.asarray(ref_flat), sl, Lmax)
    a = np.asarray(sketch_windowed_pallas_compact32(codes, ln, k, w, m))
    b = np.asarray(sketch_windowed_compact32(codes, ln, k, w, m))
    return a, b


def _assert_valid_slots_equal(a, b, rows, m):
    # compare only the VALID slots per row (padding slots are unspecified)
    cm = rows * m
    nv_a = a[2 * cm:].view(np.int32)
    nv_b = b[2 * cm:].view(np.int32)
    np.testing.assert_array_equal(nv_a, nv_b)
    va = np.arange(m)[None, :] < nv_a[:, None]
    for sec in range(2):  # key32 plane, meta plane
        pa = a[sec * cm:(sec + 1) * cm].reshape(rows, m)
        pb = b[sec * cm:(sec + 1) * cm].reshape(rows, m)
        np.testing.assert_array_equal(pa[va], pb[va])


@requires_tpu
@pytest.mark.parametrize("k,w,Lmax", [(31, 19, 128), (17, 3, 128),
                                      (31, 34, 512), (23, 5, 512)])
def test_pallas_compiled_matches_xla(k, w, Lmax):
    rng = np.random.default_rng(11)
    rows = 64
    m = 48
    total = 1 << 15
    ref_flat = np.concatenate([rng.integers(0, 4, total, dtype=np.uint8),
                               np.zeros(Lmax, np.uint8)])
    lengths = rng.integers(k + 1, Lmax + 1, rows).astype(np.int32)
    starts = rng.integers(0, total - Lmax, rows).astype(np.int32)
    a, b = _both_paths(ref_flat, starts, lengths, k,
                       min(w, Lmax - k + 1), m, Lmax)
    _assert_valid_slots_equal(a, b, rows, m)


@requires_tpu
def test_pallas_compiled_on_real_contigs():
    """Same parity check on contig-shaped data (clustered genome reads),
    exactly the input distribution the merge stage feeds the kernel."""
    from minicom_tpu import CompressorConfig
    from minicom_tpu.ops.pack import ascii_to_codes
    from minicom_tpu.pipeline import classify as classify_mod
    from minicom_tpu.pipeline import cluster as cluster_mod
    from tests.conftest import genome_reads

    rng = np.random.default_rng(4)
    reads = genome_reads(rng, 900, 100, genome_len=3000, err=0.005)
    cfg = CompressorConfig().resolve(100)
    cls = classify_mod.classify(ascii_to_codes(reads), cfg)
    cset, _ = cluster_mod.cluster_rounds(cls.codes_sub, cls.pool, cfg)
    assert cset.n_clusters >= 2

    lens = cset.ref_lengths().astype(np.int32)
    Lmax = 1 << int(max(int(lens.max()), 128) - 1).bit_length()
    rows = 1 << int(max(cset.n_clusters, 8) - 1).bit_length()
    starts = np.full(rows, len(cset.ref_flat) + Lmax, np.int32)
    starts[: cset.n_clusters] = cset.ref_ptr[:-1]
    lens_pad = np.zeros(rows, np.int32)
    lens_pad[: cset.n_clusters] = lens
    ref_flat = np.concatenate([cset.ref_flat, np.zeros(Lmax, np.uint8)])
    m = 48
    w = min(cfg.contig_window, Lmax - cfg.k + 1)
    a, b = _both_paths(ref_flat, starts, lens_pad, cfg.k, w, m, Lmax)
    _assert_valid_slots_equal(a, b, rows, m)


@requires_tpu
def test_verify_pallas_compiled_matches_host():
    """Compiled popcount-verify kernels (XLA + Pallas) on hardware match the
    host basediff popcount (ops/pallas_verify.py, SURVEY §7 step 7)."""
    from minicom_tpu.ops.pack import pack_2bit_words, popcount_u32
    from minicom_tpu.ops.pallas_verify import (popcount_verify,
                                               popcount_verify_pallas)
    rng = np.random.default_rng(9)
    N, L = 1024, 100
    aw = pack_2bit_words(rng.integers(0, 4, (N, L)).astype(np.uint8))
    bw = pack_2bit_words(rng.integers(0, 4, (N, L)).astype(np.uint8))
    want = popcount_u32(aw ^ bw).sum(axis=1).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(popcount_verify(jnp.asarray(aw), jnp.asarray(bw))), want)
    np.testing.assert_array_equal(
        np.asarray(popcount_verify_pallas(jnp.asarray(aw), jnp.asarray(bw),
                                          block=256)), want)
