"""FASTQ ingestion — vectorized host-side parser (reference: bseq.c/kseq.h).

The reference streams the file through kseq and keeps only the sequence lines,
enforcing a uniform read length (`bseq.c:54-57`). Here the whole file is read
and the sequence lines are extracted with numpy in one pass: for a well-formed
fixed-length FASTQ, line starts are computed from the newline index and every
4*i+1-th line is sliced as a [N, L] uint8 matrix. gzip input is supported like
the reference's zlib path.
"""

from __future__ import annotations

import gzip
import io
import os

import numpy as np

from minicom_tpu.ops.pack import ascii_to_codes, codes_to_ascii


def _read_all(path: str) -> bytes:
    with open(path, "rb") as f:
        head = f.read(2)
        f.seek(0)
        if head == b"\x1f\x8b":
            return gzip.open(f, "rb").read()
        return f.read()


def read_fastq(path: str) -> np.ndarray:
    """Parse a FASTQ (optionally gzipped) into a [N, L] uint8 ASCII matrix.

    Raises ValueError on non-uniform sequence length (the reference aborts,
    bseq.c:54-57) and on read length > 256 (minicom:51-54).
    """
    data = _read_all(path)
    if not data:
        return np.zeros((0, 0), dtype=np.uint8)
    if not data.endswith(b"\n"):
        data += b"\n"
    buf = np.frombuffer(data, dtype=np.uint8)
    nl = np.flatnonzero(buf == ord("\n"))
    n_lines = nl.size
    if n_lines % 4 != 0:
        raise ValueError(f"{path}: truncated FASTQ ({n_lines} lines)")
    starts = np.concatenate([[0], nl[:-1] + 1])
    seq_starts = starts[1::4]
    seq_ends = nl[1::4]
    lens = seq_ends - seq_starts
    L = int(lens[0]) if lens.size else 0
    if lens.size and not np.all(lens == L):
        raise ValueError(f"{path}: reads have non-uniform length")
    if L > 256:
        raise ValueError(f"{path}: read length {L} exceeds the 256 bp limit")
    # gather [N, L]
    idx = seq_starts[:, None] + np.arange(L)[None, :]
    return buf[idx]


def read_fastq_codes(path: str) -> np.ndarray:
    """FASTQ -> [N, L] base codes (0..3, N/other = 4)."""
    from minicom_tpu import native
    data = _read_all(path)
    if data and not data.endswith(b"\n"):
        data += b"\n"
    try:
        codes = native.fastq_parse_codes(data)
    except ValueError as e:
        raise ValueError(f"{path}: {e}") from None
    if codes is not None:
        return codes
    return ascii_to_codes(read_fastq(path))


def write_reads(path: str, ascii_mat: np.ndarray) -> None:
    """Write a [N, L] uint8 ASCII matrix as newline-terminated sequence lines."""
    n, L = ascii_mat.shape
    out = np.empty((n, L + 1), dtype=np.uint8)
    out[:, :L] = ascii_mat
    out[:, L] = ord("\n")
    with open(path, "wb") as f:
        f.write(out.tobytes())


def reads_to_lines(codes: np.ndarray) -> bytes:
    """[N, L] base codes -> newline-joined ASCII bytes."""
    return b"" if codes.size == 0 else (
        np.hstack([codes_to_ascii(codes),
                   np.full((codes.shape[0], 1), ord("\n"), np.uint8)]).tobytes()
    )
