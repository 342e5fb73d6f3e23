"""Device realign-verify kernel: batched XOR-popcount over 2-bit-packed
words (SURVEY.md §7 step 7; reference semantics: basediff,
bbhashdict.c:247-254 — the Hamming verification inside realign_hash_search,
kthread_hash_realign.c:388-393).

The realign search verifies a candidate (read, contig window) placement by
popcounting the XOR of their 2-bit packed encodings against the threshold.
As a batch this is ideal TPU material: [N, W] uint32 elementwise XOR +
SWAR popcount + row reduction, VMEM-resident via Pallas.

Two entry points:
* :func:`popcount_verify` — plain XLA (jit) version, any backend,
* :func:`popcount_verify_pallas` — Pallas VMEM kernel for real TPU.

Both are parity-tested against the numpy oracle and against each other
(tests/test_realign.py::test_device_verify_matches_native). On the
single-tunneled-chip topology the HOST path (realign.cpp) remains the
default: the candidate batch must cross a ~60 MB/s link both ways, so the
device kernel wins only when the chip is local or the verify batch is
already device-resident — the measured A/B lives in tools/realign_ab.py
(the same honest dual-path pattern as consensus and the contig sketch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount of a uint32 array."""
    x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> np.uint32(2))
                                       & np.uint32(0x33333333))
    x = (x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
    return (x * np.uint32(0x01010101)) >> np.uint32(24)


@jax.jit
def popcount_verify(a_words: jnp.ndarray, b_words: jnp.ndarray) -> jnp.ndarray:
    """Per-row XOR popcount: a/b [N, W] uint32 -> [N] int32 bit-differences
    (basediff semantics on 2-bit-packed sequence words)."""
    return _popcount32(a_words ^ b_words).astype(jnp.int32).sum(axis=1)


def _verify_kernel(a_ref, b_ref, out_ref):
    x = a_ref[...] ^ b_ref[...]
    out_ref[...] = _popcount32(x).astype(jnp.int32).sum(axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def popcount_verify_pallas(a_words: jnp.ndarray, b_words: jnp.ndarray,
                           block: int = 256, interpret: bool = False):
    """Pallas VMEM twin of :func:`popcount_verify` (rows % block == 0)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, W = a_words.shape
    assert N % block == 0, (N, block)
    out = pl.pallas_call(
        _verify_kernel,
        grid=(N // block,),
        interpret=interpret,
        in_specs=[pl.BlockSpec((block, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
    )(a_words, b_words)
    return out[:, 0]
