"""Pluggable entropy backends (reference: external bsc/7z, C23 in SURVEY.md).

The reference shells out to `bsc e -b64p -e2` per stream and `7z` for one PE
stream (`minicom:115-148,247`). Here each stream is entropy-coded in-process
through a named backend. "xz" (LZMA) is the default host backend; "rans" is
the on-chip target backend (minicom_tpu.entropy.rans).

Streams are independent, so archives remain deterministic and
host/device-count independent.
"""

from __future__ import annotations

import bz2
import lzma
import zlib


_XZ_FILTERS = [{"id": lzma.FILTER_LZMA2, "preset": 9 | lzma.PRESET_EXTREME}]


def compress(name: str, data: bytes) -> bytes:
    if name == "store":
        return data
    if name == "xz":
        return lzma.compress(data, format=lzma.FORMAT_RAW, filters=_XZ_FILTERS)
    if name == "bz2":
        return bz2.compress(data, 9)
    if name == "zlib":
        return zlib.compress(data, 9)
    if name == "rans":
        from minicom_tpu.entropy import rans
        return rans.compress(data)
    raise ValueError(f"unknown codec {name!r}")


def decompress(name: str, data: bytes, raw_len: int) -> bytes:
    if name == "store":
        return data
    if name == "xz":
        return lzma.decompress(data, format=lzma.FORMAT_RAW, filters=_XZ_FILTERS)
    if name == "bz2":
        return bz2.decompress(data)
    if name == "zlib":
        return zlib.decompress(data)
    if name == "rans":
        from minicom_tpu.entropy import rans
        return rans.decompress(data, raw_len)
    raise ValueError(f"unknown codec {name!r}")


def best_of(candidates: list[str], data: bytes) -> tuple[str, bytes]:
    """Pick the smallest encoding among candidate backends (deterministic)."""
    best = None
    for name in candidates:
        blob = compress(name, data)
        if best is None or len(blob) < len(best[1]):
            best = (name, blob)
    return best
