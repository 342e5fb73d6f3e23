"""Pallas TPU kernel for the windowed (w,k)-minimizer sketch.

The jnp implementation (`ops/sketch.py::_sketch_windowed_body`) materializes
~10 full [C, S] intermediates (k-mer pairs, sliding-min sparse tables, tie
masks) in HBM between XLA fusions. This kernel keeps the whole per-row-block
computation resident in VMEM: 2-bit k-mer pair assembly (k static shifted
ORs), canonical-strand selection, O(log w) sliding-window min/max sparse
tables, tie-emission mask, and first-m selection — one HBM read of the code
block, six [block, m] writes out.

Semantics are identical to sketch_windowed (mm_sketch_lh_ori with tie
emission, sketch.c:116-165): position i is emitted iff its hash equals the
minimum of at least one window covering it; the first m emissions per row are
returned in position order.

The first-m selection avoids in-kernel scatter: for slot i the (unique) column
with emission-rank i+1 is extracted by a masked max — m is small (the
reference's first_mininum default is 6, minicommain.c:63).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32_MAX = np.uint32(0xFFFFFFFF)


def _mix32(hi, lo):
    h = (hi * np.uint32(0x9E3779B1)) ^ (lo * np.uint32(0x85EBCA77))
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    return h ^ (h >> np.uint32(16))


def _shl(x, s: int, fill):
    """Full-width shift toward lower indices: out[i] = x[i+s], tail = fill.

    Mosaic miscompiles offset slices on the minor (lane) dimension once the
    width exceeds one 128-lane tile, so EVERY windowed access in this kernel
    is a full-width lane rotation + iota mask instead of a strided slice."""
    if s == 0:
        return x
    W = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx < W - s, pltpu.roll(x, -s % W, 1), fill)


def _shr(x, s: int, fill):
    """Full-width shift toward higher indices: out[i] = x[i-s], head = fill."""
    if s == 0:
        return x
    W = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx >= s, pltpu.roll(x, s % W, 1), fill)


def _slide_l(x, w, op, fill):
    """op over the length-w window STARTING at each column (clipped windows
    padded with fill). Full width, roll-based."""
    f = x
    span = 1
    while span * 2 <= w:
        f = op(f, _shl(f, span, fill))
        span *= 2
    rem = w - span
    if rem:
        f = op(f, _shl(f, rem, fill))
    return f


def _slide_r(x, w, op, fill):
    """op over the length-w window ENDING at each column."""
    f = x
    span = 1
    while span * 2 <= w:
        f = op(f, _shr(f, span, fill))
        span *= 2
    rem = w - span
    if rem:
        f = op(f, _shr(f, rem, fill))
    return f


def _sketch_kernel(codes_ref, len_ref, hi_ref, lo_ref, meta_ref, nv_ref,
                   *, k: int, w: int, m: int):
    codes = codes_ref[:].astype(jnp.uint32)
    B, Lmax = codes.shape
    S = Lmax - k + 1
    lengths = len_ref[:]                                    # [B, 1] int32

    z = jnp.zeros((B, Lmax), jnp.uint32)
    f_hi, f_lo, r_hi, r_lo = z, z, z, z
    for j in range(k):
        cj = _shl(codes, j, np.uint32(0))   # base at position s + j
        comp = cj ^ np.uint32(3)
        foff = 2 * (k - 1 - j)
        roff = 2 * j
        if foff >= 32:
            f_hi = f_hi | (cj << np.uint32(foff - 32))
        else:
            f_lo = f_lo | (cj << np.uint32(foff))
        if roff >= 32:
            r_hi = r_hi | (comp << np.uint32(roff - 32))
        else:
            r_lo = r_lo | (comp << np.uint32(roff))

    # Mosaic has no unsigned min/max/compare — run every ORDERING in int32
    # via the order-preserving sign-flip bitcast (u ^ 0x80000000)
    s32 = lambda u: jax.lax.bitcast_convert_type(
        u ^ np.uint32(0x80000000), jnp.int32)
    I32_MAX = np.int32(0x7FFFFFFF)
    I32_MIN = np.int32(-0x80000000)

    fwd_smaller = (s32(f_hi) < s32(r_hi)) | (
        (f_hi == r_hi) & (s32(f_lo) < s32(r_lo)))
    palindrome = (f_hi == r_hi) & (f_lo == r_lo)
    strand = jnp.where(fwd_smaller, 0, 1).astype(jnp.int32)
    khi = jnp.where(fwd_smaller, f_hi, r_hi)
    klo = jnp.where(fwd_smaller, f_lo, r_lo)
    h = _mix32(khi, klo)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, Lmax), 1)
    valid = (~palindrome) & (pos + k <= lengths) & (pos < S)
    h = jnp.where(valid, h, U32_MAX)
    hs = s32(h)                                             # U32_MAX -> I32_MAX

    we = min(w, S)
    W = _slide_l(hs, we, jnp.minimum, I32_MAX)              # min over window
    Wz = jnp.where(W == I32_MAX, I32_MIN, W)
    # window-min maximum over all windows COVERING column i
    Wmax = _slide_r(Wz, we, jnp.maximum, I32_MIN)
    emitted = (Wmax == hs) & (hs != I32_MAX)

    # Hillis-Steele prefix sum of the emission mask (static log steps)
    order = emitted.astype(jnp.int32)
    d = 1
    while d < Lmax:
        order = order + _shr(order, d, np.int32(0))
        d *= 2

    nv_ref[:] = jnp.minimum(order[:, -1:], m)
    # selection by masked SUM (<= one hit per row; Mosaic has no unsigned
    # reductions, so uint32 payloads ride bit-exactly through int32)
    khi_i, klo_i = (jax.lax.bitcast_convert_type(v, jnp.int32)
                    for v in (khi, klo))
    meta = ((pos + (k - 1)) << 1) | strand          # end_pos << 1 | strand
    for i in range(m):
        sel = emitted & (order == i + 1)                    # <= one per row
        pick = lambda v: jnp.sum(jnp.where(sel, v, 0), axis=1, keepdims=True)
        hi_ref[:, i:i + 1] = jax.lax.bitcast_convert_type(pick(khi_i),
                                                          jnp.uint32)
        lo_ref[:, i:i + 1] = jax.lax.bitcast_convert_type(pick(klo_i),
                                                          jnp.uint32)
        meta_ref[:, i:i + 1] = pick(meta)


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "m", "block", "interpret"))
def sketch_windowed_pallas(codes: jnp.ndarray, lengths: jnp.ndarray,
                           k: int, w: int, m: int, block: int = 8,
                           interpret: bool = False):
    """Pallas counterpart of sketch_windowed_compact32's windowed-minimizer
    body: returns (kmer_hi, kmer_lo, meta = end_pos << 1 | strand, nvalid) —
    the transfer-minimal output set the merge stage ships through the tunnel.

    codes [C, Lmax] uint8 with C % block == 0; lengths [C] int32.
    """
    C, Lmax = codes.shape
    assert C % block == 0 and Lmax - k + 1 >= 1
    kern = functools.partial(_sketch_kernel, k=k, w=w, m=m)
    grid = (C // block,)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((block, Lmax), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((block, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM) for _ in range(3)]
        + [pl.BlockSpec((block, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((C, m), jnp.uint32),   # kmer hi
            jax.ShapeDtypeStruct((C, m), jnp.uint32),   # kmer lo
            jax.ShapeDtypeStruct((C, m), jnp.int32),    # end_pos << 1 | strand
            jax.ShapeDtypeStruct((C, 1), jnp.int32),    # n valid
        ],
    )(codes, lengths.reshape(C, 1).astype(jnp.int32))
    hi, lo, meta, nv = outs
    return hi, lo, meta, nv[:, 0]





@functools.partial(jax.jit, static_argnames=("k", "w", "m", "interpret"))
def sketch_windowed_pallas_compact32(codes: jnp.ndarray, lengths: jnp.ndarray,
                                     k: int, w: int, m: int,
                                     interpret: bool = False):
    """Pallas sketch over pre-gathered [rows, Lmax] codes with the
    transfer-minimal 32-bit-hashed output buffer. Shape depends only on the
    fixed (rows, Lmax, m) tile — precompilable from the config alone by
    merge.warmup_sketch_programs."""
    from minicom_tpu.ops.sketch import mix32
    hi, lo, meta, nv = sketch_windowed_pallas(codes, lengths, k, w, m,
                                              interpret=interpret)
    return jnp.concatenate([
        mix32(hi, lo).reshape(-1),
        jax.lax.bitcast_convert_type(meta.reshape(-1), jnp.uint32),
        jax.lax.bitcast_convert_type(nv, jnp.uint32)])
