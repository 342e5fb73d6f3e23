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
    """FASTQ -> [N, L] base codes (0..3, N/other = 4).

    Multi-process: each rank parses only its byte-range slice of the file
    (snapped to record boundaries via an ordered exchange of per-slice line
    counts) and the code matrices are reassembled with an ordered all-gather
    — every rank ends with the identical full matrix at 1/P of the parse
    work (plain files only; gzip streams cannot be random-accessed and fall
    back to a full parse per rank, like the reference's zlib path)."""
    from minicom_tpu.parallel import distributed as dist
    _, nproc = dist.process_grid()
    if nproc > 1:
        with open(path, "rb") as f:
            is_gz = f.read(2) == b"\x1f\x8b"
        if not is_gz:
            return _read_fastq_codes_sharded(path)
    data = _read_all(path)
    if data and not data.endswith(b"\n"):
        data += b"\n"
    return _parse_codes(data, path)


def read_fastq_store(path: str):
    """FASTQ -> read store for the compression pipeline: the plain [N, L]
    matrix on single-process runs, a row-sharded ShardedReadStore on
    multi-process runs (each rank KEEPS only its parse slice — per-rank RSS
    is store/P instead of the full dataset, VERDICT r04 missing #4).
    MTC_SHARD_STORE=0 restores the replicated full matrix."""
    from minicom_tpu.parallel import distributed as dist
    _, nproc = dist.process_grid()
    if nproc == 1 or os.environ.get("MTC_SHARD_STORE", "1") == "0":
        return read_fastq_codes(path)
    from minicom_tpu.parallel.store import ShardedReadStore, maybe_shard
    with open(path, "rb") as f:
        is_gz = f.read(2) == b"\x1f\x8b"
    if is_gz:   # gzip cannot byte-shard: full parse, keep only my slice
        return maybe_shard(read_fastq_codes(path))
    local = _parse_slice(path)
    counts = dist.allgather_ragged(
        np.array([local.shape[0], local.shape[1]], np.int64)).reshape(-1, 2)
    Ls = counts[counts[:, 0] > 0, 1]
    if len(Ls) and not np.all(Ls == Ls[0]):
        raise ValueError(f"{path}: reads have non-uniform length")
    L = int(Ls[0]) if len(Ls) else 0
    bounds = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts[:, 0], out=bounds[1:])
    if local.shape[0] == 0 and L:
        local = local.reshape(0, L)
    return ShardedReadStore(np.ascontiguousarray(local), bounds)


def _parse_codes(data: bytes, path: str) -> np.ndarray:
    from minicom_tpu import native
    codes = None
    try:
        codes = native.fastq_parse_codes(data)
    except ValueError as e:
        raise ValueError(f"{path}: {e}") from None
    if codes is None:
        buf = np.frombuffer(data, np.uint8)
        nl = np.flatnonzero(buf == ord("\n"))
        if len(nl) % 4:
            raise ValueError(f"{path}: truncated FASTQ ({len(nl)} lines)")
        starts = np.concatenate([[0], nl[:-1] + 1])
        seq_starts, seq_ends = starts[1::4], nl[1::4]
        lens = seq_ends - seq_starts
        L = int(lens[0]) if lens.size else 0
        if lens.size and not np.all(lens == L):
            raise ValueError(f"{path}: reads have non-uniform length")
        if L > 256:
            raise ValueError(f"{path}: read length {L} exceeds the 256 bp limit")
        codes = ascii_to_codes(buf[seq_starts[:, None] + np.arange(L)[None, :]])
    return codes


def _read_fastq_codes_sharded(path: str) -> np.ndarray:
    """Byte-range-sharded parse + full reassembly; see read_fastq_codes."""
    from minicom_tpu.parallel import distributed as dist
    codes = _parse_slice(path)
    empty = codes.shape[0] == 0 and codes.shape[1] == 0
    shape = np.array([0, -1] if empty else codes.shape, np.int64)
    _, nproc = dist.process_grid()
    shapes = dist.allgather_ragged(shape).reshape(nproc, 2)
    Ls = shapes[shapes[:, 1] >= 0, 1]
    if len(Ls) and not np.all(Ls == Ls[0]):
        raise ValueError(f"{path}: reads have non-uniform length")
    L = int(Ls[0]) if len(Ls) else 0
    allc = dist.allgather_ragged(codes.reshape(-1))
    return allc.reshape(-1, L) if L else np.zeros((0, 0), np.uint8)


def _parse_slice(path: str) -> np.ndarray:
    """Parse THIS rank's byte-range slice of a plain FASTQ into [n_i, L]
    codes (record-boundary snapping via an ordered line-count exchange)."""
    from minicom_tpu.parallel import distributed as dist
    pid, nproc = dist.process_grid()
    size = os.path.getsize(path)
    lo = size * pid // nproc
    hi = size * (pid + 1) // nproc
    with open(path, "rb") as f:
        at_start = lo == 0
        if not at_start:
            f.seek(lo - 1)
            at_start = f.read(1) == b"\n"  # a line starts exactly at lo
        buf = np.frombuffer(f.read(hi - lo), np.uint8)
    # global line parity: exchange per-slice newline counts so each rank
    # knows the global line index at its slice start (records = 4 lines)
    nl = np.flatnonzero(buf == ord("\n"))
    counts = dist.allgather_ragged(np.array([len(nl)], np.int64))
    first_line = int(counts[:pid].sum())
    # line starts within the slice (byte offsets, slice-relative) and their
    # global line indices (= number of '\n' before the start byte)
    if at_start:
        starts = np.concatenate([[0], nl + 1])
        line_of = first_line + np.arange(len(starts))
    else:
        starts = nl + 1
        line_of = first_line + 1 + np.arange(len(starts))
    rec = starts[line_of % 4 == 0]
    rec = rec[rec < len(buf)]  # a start at the slice end belongs to the next rank
    my_records = b""
    if len(rec):
        r0 = int(rec[0])
        # records starting in this slice may end past hi: a record is 4
        # lines, so finish the open one from the next bytes of the file
        done = int((nl >= r0).sum())  # complete lines from r0 to slice end
        need = (4 - done % 4) % 4
        tail = b""
        if need:
            with open(path, "rb") as f:
                f.seek(hi)
                tail = f.read(1 << 20)
            t = np.frombuffer(tail, np.uint8)
            tnl = np.flatnonzero(t == ord("\n"))
            if len(tnl) >= need:
                tail = tail[: int(tnl[need - 1]) + 1]
            elif hi + len(tail) == size and len(tnl) == need - 1:
                tail += b"\n"  # unterminated final line at EOF
            else:
                raise ValueError(f"{path}: truncated FASTQ at EOF")
        my_records = buf[r0:].tobytes() + tail
        if not my_records.endswith(b"\n") and hi == size:
            my_records += b"\n"
    codes = _parse_codes(my_records, path) if my_records else None
    return codes if codes is not None else np.zeros((0, 0), np.uint8)


def write_lines(path: str, lines_mat: np.ndarray) -> None:
    """Write an [N, L+1] matrix whose last column is already '\\n' (built by
    pipeline.decode._alloc_lines): pure I/O, no copy."""
    with open(path, "wb") as f:
        f.write(memoryview(lines_mat).cast("B"))


def write_reads(path: str, ascii_mat: np.ndarray) -> None:
    """Write a [N, L] uint8 ASCII matrix as newline-terminated sequence
    lines, in bounded row chunks (a whole-matrix (L+1) copy would add a full
    extra dataset of peak RSS at the 5M-read scale)."""
    n, L = ascii_mat.shape
    CH = 1 << 21
    with open(path, "wb") as f:
        for s in range(0, n, CH):
            t = min(s + CH, n)
            out = np.empty((t - s, L + 1), dtype=np.uint8)
            out[:, :L] = ascii_mat[s:t]
            out[:, L] = ord("\n")
            f.write(out.tobytes())


def reads_to_lines(codes: np.ndarray) -> bytes:
    """[N, L] base codes -> newline-joined ASCII bytes."""
    return b"" if codes.size == 0 else (
        np.hstack([codes_to_ascii(codes),
                   np.full((codes.shape[0], 1), ord("\n"), np.uint8)]).tobytes()
    )
