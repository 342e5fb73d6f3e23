"""minicom_tpu — TPU-native lossless short-read (FASTQ) compressor.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference compressor (yuansliu/minicom, see /root/reference): minimizer-indexed
contig clustering, suffix-prefix contig merging, dictionary-based singleton
realignment, diff-stream serialization, and an entropy-coded container — designed
as deterministic sort/scan/segment kernels over fixed-shape device arrays instead
of the reference's pthread/lock/MPHF C++ design.

Modes (reference `minicom:15-33`): single-end unordered (default),
order-preserving (`-p`), paired-end (`-1/-2`); full parameter surface
`-t -k -e -m -w -s -S -E -g -R`.
"""

# Device code is pure 32-bit by design (see ops/sketch.py): 64-bit integer
# emulation on TPU compiles pathologically, so k-mers travel as uint32 pairs
# and only the HOST reassembles them into native uint64 sort keys.

import os as _os

import jax as _jax

# XLA compiles through the TPU tunnel cost 10-70 s each; persist them so any
# shape is compiled at most once per machine.
_cache_dir = _os.environ.get(
    "MINICOM_TPU_XLA_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "minicom_tpu_xla"))
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"

from minicom_tpu.config import CompressorConfig  # noqa: E402,F401
