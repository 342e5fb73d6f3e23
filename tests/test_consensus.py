"""Native host consensus (consensus.cpp) vs the XLA device kernels: same
segments, same members -> identical consensus bytes and member diffs (the
single-chip product path and the sharded device path must produce identical
archives)."""

import numpy as np
import pytest

from minicom_tpu import native
from minicom_tpu.pipeline.cluster import consensus_from_members
from minicom_tpu.parallel.mesh import upload_read_store


@pytest.mark.skipif(not native.has_native(), reason="native lib unavailable")
def test_host_consensus_matches_device(rng):
    N, L, C = 500, 73, 40
    codes = rng.integers(0, 4, (N, L), dtype=np.uint8)
    sizes = rng.integers(1, 30, C)
    M = int(sizes.sum())
    seg = np.repeat(np.arange(C), sizes)
    offsets = rng.integers(0, 50, M).astype(np.int32)
    # each segment must anchor at column 0 (callers rebase)
    first = np.r_[0, np.cumsum(sizes)[:-1]]
    offsets[first] = 0
    rids = rng.integers(0, N, M).astype(np.int64)
    dirs = rng.integers(0, 2, M).astype(np.int8)

    codes_dev = upload_read_store(codes)
    ref_d, rptr_d, diffs_d = consensus_from_members(
        L, seg, offsets, rids, dirs, C, codes_dev)
    ref_h, rptr_h, diffs_h = consensus_from_members(
        L, seg, offsets, rids, dirs, C, codes_dev, codes_host=codes)
    np.testing.assert_array_equal(rptr_d, rptr_h)
    np.testing.assert_array_equal(ref_d, ref_h)
    np.testing.assert_array_equal(diffs_d, diffs_h)


@pytest.mark.skipif(not native.has_native(), reason="native lib unavailable")
def test_host_consensus_tie_rule(rng):
    # two members disagreeing at every column: tie -> lowest base code
    L = 16
    codes = np.stack([np.full(L, 2, np.uint8), np.full(L, 1, np.uint8)])
    ref, diffs = native.consensus_host(
        codes, np.array([0, 2], np.int32), np.array([0, 0], np.int64),
        np.array([0, 2], np.int64), np.array([0, L], np.int64), L,
        True, True)
    assert (ref == 1).all()          # min(1, 2) wins the tie
    np.testing.assert_array_equal(diffs, [L, 0])
