"""Contig merge stage: overlapping clusters collapse into longer contigs."""

import numpy as np

from minicom_tpu import CompressorConfig
from minicom_tpu.pipeline import classify as classify_mod
from minicom_tpu.pipeline import cluster as cluster_mod
from minicom_tpu.pipeline.merge import merge_contigs, _select
from tests.conftest import genome_reads


def _build(rng, n=800, L=100, genome_len=2500):
    reads = genome_reads(rng, n, L, genome_len=genome_len, err=0.005)
    codes = np.frombuffer(b"ACGT", np.uint8)  # noqa
    from minicom_tpu.ops.pack import ascii_to_codes
    cmat = ascii_to_codes(reads)
    cfg = CompressorConfig().resolve(L)
    cls = classify_mod.classify(cmat, cfg)
    cset, sg = cluster_mod.cluster_rounds(cls.codes_sub, cls.pool, cfg)
    return cls, cset, sg, cfg


def test_merge_reduces_clusters_and_grows_contigs(rng):
    cls, cset, sg, cfg = _build(rng)
    c0 = cset.n_clusters
    m0 = cset.n_members
    len0 = cset.ref_lengths().max() if c0 else 0
    merged = merge_contigs(cset, cfg)
    assert merged.n_members == m0          # merging never loses reads
    assert merged.n_clusters <= c0
    if merged.n_clusters < c0:
        assert merged.ref_lengths().max() > len0

    # invariants: offsets in range, span == max(off) + L per cluster
    L = cset.readlen
    sizes = merged.cluster_sizes()
    seg = np.repeat(np.arange(merged.n_clusters), sizes)
    max_off = np.zeros(merged.n_clusters, np.int64)
    np.maximum.at(max_off, seg, merged.mem_off)
    assert np.array_equal(merged.ref_lengths(), max_off + L)
    min_off = np.full(merged.n_clusters, 1 << 60, np.int64)
    np.minimum.at(min_off, seg, merged.mem_off)
    assert (min_off == 0).all()


def test_merge_roundtrip_members_match_reads(rng):
    """After merging, every member decodes back to its exact read through
    the SAME diff encode/decode path the serializer uses."""
    from minicom_tpu.native import diff_decode, diff_encode
    from minicom_tpu.ops.pack import codes_to_ascii, revcomp_codes

    cls, cset, sg, cfg = _build(rng, n=500)
    merged = merge_contigs(cset, cfg)
    L = merged.readlen
    sizes = merged.cluster_sizes()
    seg = np.repeat(np.arange(merged.n_clusters), sizes)
    assert (merged.mem_off >= 0).all()
    assert (merged.mem_off + L <= merged.ref_lengths()[seg]).all()

    # encode each member as a diff vs its ref window, decode, compare
    win = (merged.ref_ptr[seg] + merged.mem_off)[:, None] + np.arange(L)
    ref_rows = codes_to_ascii(merged.ref_flat[win])
    restored = cls.codes_sub[merged.mem_rid].copy()
    restored[cls.n_mask[merged.mem_rid]] = 4
    rc = revcomp_codes(restored)
    oriented = np.where((merged.mem_dir == 1)[:, None], rc, restored)
    blob = diff_encode(ref_rows, codes_to_ascii(oriented), 0)
    got = diff_decode(blob, ref_rows, merged.n_members)
    np.testing.assert_array_equal(got, codes_to_ascii(oriented))
    # and orientation undoes exactly: decoded member == original read text
    from minicom_tpu.ops.pack import ascii_to_codes
    back = ascii_to_codes(got)
    back = np.where((merged.mem_dir == 1)[:, None],
                    revcomp_codes(back), back)
    np.testing.assert_array_equal(codes_to_ascii(back),
                                  codes_to_ascii(restored))


def _canon(cs):
    """Canonical form of a ClusterSet: clusters keyed by their sorted member
    list, members sorted by (rid, off, dir), with the consensus bytes."""
    out = []
    for c in range(cs.n_clusters):
        m0, m1 = cs.cluster_ptr[c], cs.cluster_ptr[c + 1]
        mem = sorted(zip(cs.mem_rid[m0:m1].tolist(),
                         cs.mem_off[m0:m1].tolist(),
                         cs.mem_dir[m0:m1].tolist()))
        ref = cs.ref_flat[cs.ref_ptr[c]:cs.ref_ptr[c + 1]].tobytes()
        out.append((mem, ref))
    return sorted(out)


def test_incremental_equals_full_research(rng):
    """Property (VERDICT r02 weak #5): the incremental two-half candidate
    search after round 1 (merge.py new_from) merges EXACTLY what a full
    re-sketch + re-search each generation (the reference's behavior,
    kthread_cb.c:580) would — the maximal-matching argument, verified."""
    for seed, n, glen, repeat in [(1, 700, 2000, False), (2, 900, 3000, True),
                                  (3, 1200, 2500, True), (5, 600, 1500, False)]:
        r = np.random.default_rng(seed)
        glen_eff = glen
        if repeat:
            # repeat-rich genome: duplicated segments force multi-generation
            # merging, exactly where the incremental search must not diverge
            glen_eff = glen + glen // 2
        reads = genome_reads(r, n, 100, genome_len=glen_eff, err=0.005)
        if repeat:
            reads = np.concatenate([reads, reads[: n // 3]])
        from minicom_tpu.ops.pack import ascii_to_codes
        cfg = CompressorConfig().resolve(100)
        cls = classify_mod.classify(ascii_to_codes(reads), cfg)
        cset, _ = cluster_mod.cluster_rounds(cls.codes_sub, cls.pool, cfg)
        if cset.n_clusters < 2:
            continue
        inc = merge_contigs(cset, cfg, incremental=True)
        full = merge_contigs(cset, cfg, incremental=False)
        assert _canon(inc) == _canon(full), (
            f"incremental merge diverged from full re-search (seed {seed})")


def test_select_subset(rng):
    cls, cset, sg, cfg = _build(rng, n=300)
    if cset.n_clusters < 3:
        return
    idx = np.array([0, cset.n_clusters - 1])
    sub = _select(cset, idx)
    assert sub.n_clusters == 2
    for j, c in enumerate(idx):
        np.testing.assert_array_equal(
            sub.mem_rid[sub.cluster_ptr[j]:sub.cluster_ptr[j + 1]],
            cset.mem_rid[cset.cluster_ptr[c]:cset.cluster_ptr[c + 1]])
        np.testing.assert_array_equal(
            sub.ref_flat[sub.ref_ptr[j]:sub.ref_ptr[j + 1]],
            cset.ref_flat[cset.ref_ptr[c]:cset.ref_ptr[c + 1]])


def test_revote_consensus_is_member_majority_vote(rng):
    """merge_revote: the merged consensus equals a brute-force majority vote
    over all oriented members (construct_ref2, kthread_cb.c:105-218), with
    the argmax-tie-to-lowest-code rule shared by every consensus path."""
    cls, cset, sg, cfg = _build(rng, n=900, L=100, genome_len=2000)
    if cset.n_clusters < 2:
        return
    merged = merge_contigs(cset, cfg, codes_host=cls.codes_sub)
    L = merged.readlen
    codes = cls.codes_sub
    for c in range(merged.n_clusters):
        m0, m1 = merged.cluster_ptr[c], merged.cluster_ptr[c + 1]
        span = int(merged.ref_ptr[c + 1] - merged.ref_ptr[c])
        counts = np.zeros((span, 4), np.int64)
        for m in range(m0, m1):
            r = codes[merged.mem_rid[m]]
            if merged.mem_dir[m]:
                r = (3 - r)[::-1]
            o = merged.mem_off[m]
            counts[np.arange(o, o + L), r] += 1
        want = np.argmax(counts, axis=1).astype(np.uint8)
        got = merged.ref_flat[merged.ref_ptr[c]:merged.ref_ptr[c + 1]]
        np.testing.assert_array_equal(got, want)


def test_native_probe_pairs_match_numpy(rng):
    """The native candidate join (sketch.cpp probe_index_pairs) and the numpy
    searchsorted probe select the same deduped (a, b, shift) set, including
    the per-probe hit cap and the drop count."""
    from minicom_tpu import native
    from minicom_tpu.pipeline import merge as mg
    if not native.has_native():
        import pytest
        pytest.skip("native toolchain unavailable")
    n = 4000
    key = rng.integers(0, 300, n).astype(np.uint32)   # dense keys -> big runs
    cid = rng.integers(0, 60, n).astype(np.int64)
    pos = rng.integers(0, 500, n).astype(np.int32)
    strand = rng.integers(0, 2, n).astype(np.int8)
    rank = rng.integers(0, 30, n).astype(np.int32)
    for cap in (3, 64):
        stats_np, stats_nat = {}, {}
        import unittest.mock as mock
        with mock.patch.object(native, "probe_index_pairs",
                               lambda *a, **k: None):  # force numpy fallback
            a1, b1, d1 = mg._candidate_pairs(key, cid, pos, strand, rank, 6,
                                             stats_np, None, cap)
        a2, b2, d2 = mg._candidate_pairs(key, cid, pos, strand, rank, 6,
                                         stats_nat, None, cap)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(d1, d2)
        assert (stats_np.get("merge_probe_drops", 0)
                == stats_nat.get("merge_probe_drops", 0))


def test_host_sketch_archive_identical(tmp_path, rng, monkeypatch):
    """The native host contig sketch (single-chip fast path) and the device
    sketch path produce byte-identical archives — which path ran is never
    observable in the output (the consensus.cpp dual-path guarantee, extended
    to the merge stage)."""
    from minicom_tpu import compressor, native
    from tests.conftest import write_fastq
    if not native.has_native():
        import pytest
        pytest.skip("native toolchain unavailable")
    reads = genome_reads(rng, 1200, 100, genome_len=3000, err=0.01)
    fq = str(tmp_path / "in.fastq")
    write_fastq(fq, reads)
    blobs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("MTC_HOST_SKETCH", flag)
        arc = str(tmp_path / f"s{flag}.mtc")
        compressor.compress(fq, arc, CompressorConfig())
        blobs[flag] = open(arc, "rb").read()
    assert blobs["1"] == blobs["0"]


def test_revote_roundtrip_and_size(tmp_path, rng):
    """End-to-end: revote on (default) and off both roundtrip; revote never
    produces a larger archive on clusterable data."""
    from minicom_tpu import compressor
    from tests.conftest import write_fastq
    reads = genome_reads(rng, 1500, 100, genome_len=4000, err=0.01)
    fq = str(tmp_path / "in.fastq")
    write_fastq(fq, reads)
    sizes = {}
    for revote in (True, False):
        arc = str(tmp_path / f"r{revote}.mtc")
        out = str(tmp_path / f"r{revote}.reads")
        compressor.compress(fq, arc, CompressorConfig(merge_revote=revote))
        compressor.decompress(arc, out)
        got = sorted(open(out, "rb").read().splitlines())
        assert got == sorted(bytes(r) for r in reads)
        sizes[revote] = len(open(arc, "rb").read())
    assert sizes[True] <= sizes[False] * 1.01, sizes
