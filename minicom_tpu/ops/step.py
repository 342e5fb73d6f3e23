"""Fused, fully-jittable encode step: sketch -> sort -> segment -> consensus.

This is the single-dispatch "forward step" of the compressor: given a padded
batch of reads it computes each read's canonical minimizer, groups equal
k-mers by an on-device sort, aligns members by mirrored minimizer position,
builds every cluster's majority-vote consensus with one scatter-add, and
scores each read's mismatch count — i.e. one full clustering round
(kthread_bucket.c:381-509) as one XLA program. The host pipeline uses the
same math via pipeline/cluster.py; this fused form is what `__graft_entry__`
compile-checks and what the multi-chip dry run shards.

Everything is 32-bit (see ops/sketch.py). The 62-bit k-mer sort key is
realized as two stable 32-bit argsorts (lo then hi).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from minicom_tpu.ops.consensus import orient
from minicom_tpu.ops.sketch import _kmer_pairs, _take1


@functools.partial(jax.jit, static_argnames=("k", "span_cols"))
def cluster_step(codes: jnp.ndarray, k: int, span_cols: int):
    """One clustering round over a [N, L] batch.

    Returns (consensus [span_cols] uint8, coverage [span_cols] int32,
    diffs [N] int32, seg_id [N] int32, order [N] int32): the flat consensus
    column space, per-read mismatch counts vs its cluster consensus, the
    cluster id of each (sorted) read and the sort permutation.
    """
    N, L = codes.shape
    h, hi, lo, strand, _ = _kmer_pairs(codes, k)
    s = jnp.argmin(h, axis=1)
    khi, klo, z = _take1(hi, s), _take1(lo, s), _take1(strand, s)
    pos = (s + k - 1).astype(jnp.int32)
    mpos = jnp.where(z == 1, L - pos + k - 2, pos).astype(jnp.int32)

    # stable 64-bit sort via two 32-bit passes (lo then hi)
    o1 = jnp.argsort(klo, stable=True)
    o2 = jnp.argsort(khi[o1], stable=True)
    order = o1[o2]
    khi, klo, z, mpos = khi[order], klo[order], z[order], mpos[order]

    new_seg = jnp.concatenate([
        jnp.ones_like(khi[:1], dtype=bool),
        (khi[1:] != khi[:-1]) | (klo[1:] != klo[:-1])])
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1

    # segment max mpos anchors column 0 of each cluster
    nseg_cap = N
    seg_max = jnp.zeros_like(mpos, shape=(nseg_cap,)).at[seg_id].max(mpos)
    off = seg_max[seg_id] - mpos

    # per-cluster column base: seg_id * 2L bounds every span (offsets < L)
    base = seg_id * (2 * L)
    oriented = orient(codes[order], z)
    cols = (base + off)[:, None] + np.arange(L, dtype=np.int32)[None, :]
    table = jnp.zeros_like(cols, shape=(span_cols, 4))
    table = table.at[cols, oriented.astype(jnp.int32)].add(1, mode="drop")
    consensus = jnp.argmax(table, axis=1).astype(jnp.uint8)
    coverage = table.sum(axis=1)
    ref_at = consensus.at[cols].get(mode="fill", fill_value=255)
    diffs = (ref_at != oriented).sum(axis=1, dtype=jnp.int32)
    return consensus, coverage, diffs, seg_id, order.astype(jnp.int32)
