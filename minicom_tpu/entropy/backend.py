"""Pluggable entropy backends (reference: external bsc/7z, C23 in SURVEY.md).

The reference shells out to `bsc e -b64p -e2` per stream and `7z` for one PE
stream (`minicom:115-148,247`). Here each stream is entropy-coded in-process
through a named backend:

* "xz"   — LZMA raw stream (host, stdlib),
* "o1rc" — the package's native order-1 adaptive binary range coder
           (minicom_tpu/native/rangecoder.cpp),
* "auto" — per-stream best of {xz, o1rc} (recorded in the stream table),
* "bz2" / "zlib" / "store" — stdlib alternatives.

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
    if name == "o1rc":
        from minicom_tpu import native
        return native.o1rc_encode(data)
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
    if name == "o1rc":
        from minicom_tpu import native
        return native.o1rc_decode(data, raw_len)
    raise ValueError(f"unknown codec {name!r}")


def best_of(candidates: list[str], data: bytes) -> tuple[str, bytes]:
    """Pick the smallest encoding among candidate backends (deterministic)."""
    best = None
    for name in candidates:
        blob = compress(name, data)
        if best is None or len(blob) < len(best[1]):
            best = (name, blob)
    return best
