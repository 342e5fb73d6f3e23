"""Native (C++) helpers: diff-string codec, with pure-Python fallbacks.

The shared library is built on first import with the system g++ (no pip) and
cached next to this file. If the toolchain is unavailable the Python fallback
keeps everything correct (slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_native.so")
_SRCS = [os.path.join(_DIR, "diffcodec.cpp"),
         os.path.join(_DIR, "rangecoder.cpp"),
         os.path.join(_DIR, "realign.cpp"),
         os.path.join(_DIR, "fastq.cpp"),
         os.path.join(_DIR, "consensus.cpp"),
         os.path.join(_DIR, "sketch.cpp"),
         os.path.join(_DIR, "dnalz.cpp")]

_lib = None


def _build() -> bool:
    try:
        newest_src = max(os.path.getmtime(s) for s in _SRCS)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= newest_src:
            return True
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
               *_SRCS, "-o", _SO + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        print(f"minicom_tpu: native build failed ({e}); using Python fallback",
              file=sys.stderr)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _build():
        lib = ctypes.CDLL(_SO)
        lib.diff_encode.restype = ctypes.c_int64
        lib.diff_encode.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int, ctypes.c_void_p]
        lib.diff_decode.restype = ctypes.c_int64
        lib.diff_decode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_void_p]
        lib.diff_encode_lengths.restype = None
        lib.diff_encode_lengths.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_int64, ctypes.c_int64,
                                            ctypes.c_int, ctypes.c_void_p]
        for fam in ("o1rc", "o2rc", "dnarc"):
            for fn in (getattr(lib, fam + "_encode"),
                       getattr(lib, fam + "_decode")):
                fn.restype = ctypes.c_int64
                fn.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_void_p, ctypes.c_int64]
        lib.diff_decode_win_strided.restype = ctypes.c_int64
        lib.diff_decode_win_strided.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64]
        lib.decode_cluster_meta.restype = ctypes.c_int64
        lib.decode_cluster_meta.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_void_p]
        lib.dz_encode.restype = ctypes.c_int64
        lib.dz_encode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int64]
        lib.dz_decode.restype = ctypes.c_int64
        lib.dz_decode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int64]
        lib.dz_encode_parts.restype = ctypes.c_int64
        lib.dz_encode_parts.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_void_p]
        lib.dz_decode_parts.restype = ctypes.c_int64
        lib.dz_decode_parts.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_int64]
        lib.rc_encode_blocked.restype = ctypes.c_int64
        lib.rc_encode_blocked.argtypes = [ctypes.c_int, ctypes.c_void_p,
                                          ctypes.c_int64, ctypes.c_int64,
                                          ctypes.c_void_p, ctypes.c_int64]
        lib.rc_decode_blocked.restype = ctypes.c_int64
        lib.rc_decode_blocked.argtypes = [ctypes.c_int, ctypes.c_void_p,
                                          ctypes.c_int64, ctypes.c_void_p,
                                          ctypes.c_int64]
        lib.realign_probe.restype = ctypes.c_int64
        lib.realign_probe.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.diff_encode_win.restype = ctypes.c_int64
        lib.diff_encode_win.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int, ctypes.c_void_p]
        lib.diff_decode_win.restype = ctypes.c_int64
        lib.diff_decode_win.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_void_p]
        lib.fastq_scan.restype = ctypes.c_int64
        lib.fastq_scan.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p, ctypes.c_void_p]
        lib.fastq_extract.restype = ctypes.c_int64
        lib.fastq_extract.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_void_p]
        lib.codes_to_lines.restype = None
        lib.codes_to_lines.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_void_p]
        lib.set_num_threads.restype = None
        lib.set_num_threads.argtypes = [ctypes.c_int]
        lib.score_overlaps.restype = None
        lib.score_overlaps.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_void_p]
        lib.sketch_windowed_host.restype = None
        lib.sketch_windowed_host.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.sketch_reads_host.restype = None
        lib.sketch_reads_host.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.popcounts_at.restype = None
        lib.popcounts_at.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_void_p]
        lib.probe_index_pairs.restype = ctypes.c_int64
        lib.probe_index_pairs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
        lib.consensus_host.restype = None
        lib.consensus_host.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int, ctypes.c_void_p,
                                       ctypes.c_void_p]
        _lib = lib
    else:
        _lib = False
    return _lib


def _as_c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint8)


def diff_encode(ref_rows: np.ndarray, read_rows: np.ndarray, rule: int) -> bytes:
    """ref/read: [M, L] uint8 ASCII -> '\n'-separated diff lines (bytes)."""
    M, L = read_rows.shape
    if M == 0:
        return b""
    lib = _load()
    ref_rows, read_rows = _as_c(ref_rows), _as_c(read_rows)
    if lib:
        out = np.empty(M * (L + 12), dtype=np.uint8)
        n = lib.diff_encode(ref_rows.ctypes.data, read_rows.ctypes.data,
                            M, L, rule, out.ctypes.data)
        return out[:n].tobytes()
    return _py_encode(ref_rows, read_rows, rule)


def diff_decode(text: bytes, ref_rows: np.ndarray, n_rows: int) -> np.ndarray:
    """'\n'-separated diff lines + [M, L] uint8 ASCII refs -> read rows."""
    M, L = ref_rows.shape
    assert M == n_rows
    if M == 0:
        return np.zeros((0, L), np.uint8)
    lib = _load()
    ref_rows = _as_c(ref_rows)
    buf = np.frombuffer(text, dtype=np.uint8)
    if lib:
        out = np.empty((M, L), dtype=np.uint8)
        r = lib.diff_decode(buf.ctypes.data, len(buf), ref_rows.ctypes.data,
                            M, L, out.ctypes.data)
        if r != M:
            raise ValueError(f"diff_decode failed at row {-r - 1}")
        return out
    return _py_decode(text, ref_rows)


def diff_encode_win(ref_codes: np.ndarray, win_base: np.ndarray,
                    read_codes: np.ndarray, dirs, rule: int):
    """Windowed diff encode on base codes: row r's ref window starts at
    ref_codes[win_base[r]]; read row r is RC'd when dirs[r]==1. Returns the
    '\\n'-separated diff text, or None if the native lib is unavailable."""
    lib = _load()
    if not lib:
        return None
    M, L = read_codes.shape
    if M == 0:
        return b""
    ref_codes = _as_c(ref_codes)
    read_codes = _as_c(read_codes)
    win_base = np.ascontiguousarray(win_base, np.int64)
    dptr = 0
    if dirs is not None:
        dirs = np.ascontiguousarray(dirs, np.int8)
        dptr = dirs.ctypes.data
    out = np.empty(M * (L + 12), dtype=np.uint8)
    n = lib.diff_encode_win(ref_codes.ctypes.data, win_base.ctypes.data,
                            read_codes.ctypes.data, dptr, M, L, rule,
                            out.ctypes.data)
    return out[:n].tobytes()


def diff_decode_win(text: bytes, ref_codes: np.ndarray, win_base: np.ndarray,
                    dirs, n_rows: int, L: int, out: np.ndarray | None = None):
    """Windowed diff decode -> [n_rows, L] ASCII read rows (RC applied where
    dirs==1), or None if the native lib is unavailable. Pass a C-contiguous
    [n_rows, L] `out` to decode in place (the 5M decode path writes straight
    into the final output matrix, saving a full-matrix copy)."""
    lib = _load()
    if not lib:
        return None
    if n_rows == 0:
        return np.zeros((0, L), np.uint8)
    ref_codes = _as_c(ref_codes)
    win_base = np.ascontiguousarray(win_base, np.int64)
    dptr = 0
    if dirs is not None:
        dirs = np.ascontiguousarray(dirs, np.int8)
        dptr = dirs.ctypes.data
    buf = np.frombuffer(text, dtype=np.uint8)
    if out is None:
        out = np.empty((n_rows, L), dtype=np.uint8)
    # out may be a row-strided view (e.g. the [:, :L] slice of an [N, L+1]
    # output-with-newlines matrix): rows must be contiguous internally
    assert out.shape == (n_rows, L) and out.dtype == np.uint8 \
        and out.strides[1] == 1 and out.strides[0] >= L
    r = lib.diff_decode_win_strided(
        buf.ctypes.data, len(buf), ref_codes.ctypes.data,
        win_base.ctypes.data, dptr, n_rows, L,
        out.ctypes.data, out.strides[0])
    if r != n_rows:
        raise ValueError(f"diff_decode_win failed at row {-r - 1}")
    return out


def decode_cluster_meta(cnt: np.ndarray, d16: np.ndarray, dx: np.ndarray,
                        dirbits: np.ndarray, M: int, L: int, esc: int):
    """Cluster streams -> (win_base int64[M], dirs int8[M], ref_total bases)
    in one native pass, or None if the native lib is unavailable."""
    lib = _load()
    if not lib:
        return None
    cnt = np.ascontiguousarray(cnt, np.uint32)
    d16 = np.ascontiguousarray(d16, np.uint16)
    dx = np.ascontiguousarray(dx, np.uint32)
    dirbits = np.ascontiguousarray(dirbits, np.uint8)
    win_base = np.empty(M, np.int64)
    dirs = np.empty(M, np.int8)
    total = lib.decode_cluster_meta(
        cnt.ctypes.data, len(cnt), d16.ctypes.data, dx.ctypes.data, len(dx),
        dirbits.ctypes.data, M, L, esc, win_base.ctypes.data,
        dirs.ctypes.data)
    if total < 0:
        raise ValueError("corrupt cluster metadata streams")
    return win_base, dirs, int(total)


def diff_encode_lengths(ref_rows: np.ndarray, read_rows: np.ndarray,
                        rule: int) -> np.ndarray:
    """Per-row encoded length (without the newline)."""
    M, L = read_rows.shape
    if M == 0:
        return np.zeros(0, np.int32)
    lib = _load()
    ref_rows, read_rows = _as_c(ref_rows), _as_c(read_rows)
    if lib:
        out = np.empty(M, dtype=np.int32)
        lib.diff_encode_lengths(ref_rows.ctypes.data, read_rows.ctypes.data,
                                M, L, rule, out.ctypes.data)
        return out
    enc = _py_encode(ref_rows, read_rows, rule).split(b"\n")[:-1]
    return np.array([len(x) for x in enc], np.int32)


# ---------------------------------------------------------------- fallbacks
def _py_encode(ref_rows, read_rows, rule) -> bytes:
    run_min = 2 if rule == 0 else 1
    out = bytearray()
    for rf, rd in zip(ref_rows, read_rows):
        row = bytearray()
        eq = 0
        for i in range(len(rd)):
            if rf[i] != rd[i]:
                if eq >= run_min:
                    row += str(eq).encode()
                else:
                    row += bytes(rd[i - eq:i])
                eq = 0
                row.append(rd[i])
            else:
                eq += 1
        if not row:
            row += b"0"
        out += row + b"\n"
    return bytes(out)


def _py_decode(text: bytes, ref_rows) -> np.ndarray:
    M, L = ref_rows.shape
    out = np.empty((M, L), np.uint8)
    lines = text.split(b"\n")
    for r in range(M):
        rf = ref_rows[r]
        rd = out[r]
        pos = 0
        eq = 0
        for c in lines[r]:
            if 65 <= c <= 90:
                while eq > 0 and pos < L:
                    rd[pos] = rf[pos]
                    pos += 1
                    eq -= 1
                if pos < L:
                    rd[pos] = c
                    pos += 1
            else:
                eq = eq * 10 + (c - 48)
        while pos < L:
            rd[pos] = rf[pos]
            pos += 1
    return out


# family ids for the blocked container (rangecoder.cpp)
_RC_FAMILY = {"o1rc": 0, "o2rc": 1, "dnarc": 2}

# Independent-block sizes (bytes of RAW stream). Blocks restart the adaptive
# model, so they are LARGE — the restart cost is negligible at the sizes
# where splitting engages — and fixed, so archives are a pure function of the
# data (never of the thread count). dnarc streams are 2-bit packed: 4 MiB of
# raw bytes = 16 Mbases per block.
_RC_BLOCK = {"o1rc": 8 << 20, "o2rc": 8 << 20, "dnarc": 4 << 20}


def rc_encode(family: str, data: bytes) -> bytes:
    """Adaptive range coder encode: family in {o1rc, o2rc, dnarc}
    (native only — no fallback). Streams larger than the family block size
    are split into independently-coded blocks (OpenMP-parallel both ways)."""
    lib = _load()
    if not lib:
        raise RuntimeError("native range coder unavailable")
    buf = np.frombuffer(data, dtype=np.uint8)
    nb = max(1, -(-len(buf) // _RC_BLOCK[family]))
    cap = len(buf) + len(buf) // 4 + 64 + 12 + 8 * nb
    while True:
        out = np.empty(cap, dtype=np.uint8)
        n = lib.rc_encode_blocked(_RC_FAMILY[family], buf.ctypes.data,
                                  len(buf), _RC_BLOCK[family],
                                  out.ctypes.data, cap)
        if n >= 0:
            return out[:n].tobytes()
        cap *= 4  # adversarial input can expand; retry with more room


def rc_decode(family: str, data: bytes, raw_len: int) -> bytes:
    lib = _load()
    if not lib:
        raise RuntimeError("native range coder unavailable")
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(raw_len, dtype=np.uint8)
    r = lib.rc_decode_blocked(_RC_FAMILY[family], buf.ctypes.data, len(buf),
                              out.ctypes.data, raw_len)
    if r != raw_len:
        raise ValueError(f"{family}: corrupt blocked stream")
    return out.tobytes()


def dz_encode(data: bytes) -> bytes:
    """Base-level LZ + blocked-dnarc literals for packed-DNA streams
    (dnalz.cpp; native only — no fallback)."""
    lib = _load()
    if not lib:
        raise RuntimeError("native dz codec unavailable")
    buf = np.frombuffer(data, dtype=np.uint8)
    cap = len(buf) + len(buf) // 2 + 4096
    while True:
        out = np.empty(cap, dtype=np.uint8)
        n = lib.dz_encode(buf.ctypes.data, len(buf), out.ctypes.data, cap)
        if n >= 0:
            return out[:n].tobytes()
        cap *= 4


def dz_decode(data: bytes, raw_len: int) -> bytes:
    lib = _load()
    if not lib:
        raise RuntimeError("native dz codec unavailable")
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(raw_len, dtype=np.uint8)
    r = lib.dz_decode(buf.ctypes.data, len(buf), out.ctypes.data, raw_len)
    if r != raw_len:
        raise ValueError("dz: corrupt stream")
    return out.tobytes()


def dz_encode_parts(data: bytes):
    """Run the dz matcher only: returns (token_planes bytes, n_tokens,
    packed_literal bytes) with no entropy coding — the split transform for
    the on-chip literal path (codec 'dzt'). None if native unavailable."""
    lib = _load()
    if not lib:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    nb = len(buf) * 4
    tok_cap = 12 * (nb // 32 + 2)
    lit_cap = len(buf) + 8
    tok = np.empty(tok_cap, np.uint8)
    lit = np.empty(lit_cap, np.uint8)
    nt = ctypes.c_int64()
    nlit = ctypes.c_int64()
    r = lib.dz_encode_parts(buf.ctypes.data, len(buf),
                            tok.ctypes.data, tok_cap,
                            lit.ctypes.data, lit_cap,
                            ctypes.byref(nt), ctypes.byref(nlit))
    if r < 0:
        raise RuntimeError("dz_encode_parts: buffer sizing bug")
    return (tok[: 12 * nt.value].tobytes(), nt.value,
            lit[: nlit.value].tobytes())


def dz_decode_parts(tok: bytes, nt: int, lit_packed: bytes,
                    raw_len: int) -> bytes:
    lib = _load()
    if not lib:
        raise RuntimeError("native dz codec unavailable")
    tb = np.frombuffer(tok, np.uint8)
    lb = np.frombuffer(lit_packed, np.uint8)
    out = np.empty(raw_len, np.uint8)
    r = lib.dz_decode_parts(tb.ctypes.data, nt, lb.ctypes.data, len(lb),
                            out.ctypes.data, raw_len)
    if r != raw_len:
        raise ValueError("dzt: corrupt stream")
    return out.tobytes()


def o1rc_encode(data: bytes) -> bytes:
    return rc_encode("o1rc", data)


def o1rc_decode(data: bytes, raw_len: int) -> bytes:
    return rc_decode("o1rc", data, raw_len)


def has_native() -> bool:
    return bool(_load())


def score_overlaps(ref_flat: np.ndarray, ref_ptr: np.ndarray,
                   a: np.ndarray, b: np.ndarray, d: np.ndarray,
                   cap: int):
    """match_pro mismatch scores for merge candidate pairs (None if the
    native lib is unavailable; numpy fallback lives in pipeline/merge.py)."""
    lib = _load()
    if not lib:
        return None
    n = len(a)
    out = np.empty(n, np.int32)
    if n:
        ref_flat = _as_c(ref_flat)
        ref_ptr = np.ascontiguousarray(ref_ptr, np.int64)
        a = np.ascontiguousarray(a, np.int64)
        b = np.ascontiguousarray(b, np.int64)
        d = np.ascontiguousarray(d, np.int64)
        lib.score_overlaps(ref_flat.ctypes.data, ref_ptr.ctypes.data,
                           a.ctypes.data, b.ctypes.data, d.ctypes.data,
                           n, cap, out.ctypes.data)
    return out


def consensus_host(codes_sub: np.ndarray, rid2d: np.ndarray, col: np.ndarray,
                   segptr: np.ndarray, colptr: np.ndarray, span: int,
                   want_ref: bool, want_diffs: bool):
    """Segmented majority-vote consensus + member diffs on the host
    (consensus.cpp — the single-chip twin of ops/consensus.py's device
    kernels; identical tie rule, so both paths produce identical archives).
    Returns (ref[span] uint8 or None, diffs[M] int32 or None), or None when
    the native lib is unavailable."""
    lib = _load()
    if not lib:
        return None
    codes_sub = _as_c(codes_sub)
    rid2d = np.ascontiguousarray(rid2d, np.int32)
    col = np.ascontiguousarray(col, np.int64)
    segptr = np.ascontiguousarray(segptr, np.int64)
    colptr = np.ascontiguousarray(colptr, np.int64)
    M = len(rid2d)
    ref = np.empty(span, np.uint8)
    diffs = np.empty(M, np.int32) if want_diffs else np.empty(0, np.int32)
    want = (1 if want_ref else 0) | (2 if want_diffs else 0)
    lib.consensus_host(codes_sub.ctypes.data, codes_sub.shape[0],
                       codes_sub.shape[1], rid2d.ctypes.data,
                       col.ctypes.data, M, segptr.ctypes.data,
                       colptr.ctypes.data, len(segptr) - 1, span, want,
                       ref.ctypes.data, diffs.ctypes.data)
    return (ref if want_ref else None), (diffs if want_diffs else None)


def sketch_windowed_host(ref_flat: np.ndarray, starts: np.ndarray,
                         rlens: np.ndarray, k: int, we_row: np.ndarray,
                         mcap_row: np.ndarray, m_max: int):
    """Windowed-minimizer sketch of rows at (start, len) into ref_flat, on
    the host (sketch.cpp — the single-chip twin of
    ops/sketch.py::sketch_windowed_compact32; identical emission rule and
    32-bit ranking hash, so both paths produce identical archives).
    Returns (key32 [R, m_max] u32, meta [R, m_max] i32, nv [R] i32) or None
    when the native lib is unavailable."""
    lib = _load()
    if not lib:
        return None
    n_rows = len(starts)
    ref_flat = _as_c(ref_flat)
    starts = np.ascontiguousarray(starts, np.int64)
    rlens = np.ascontiguousarray(rlens, np.int32)
    we_row = np.ascontiguousarray(we_row, np.int32)
    mcap_row = np.ascontiguousarray(mcap_row, np.int32)
    key = np.zeros((n_rows, m_max), np.uint32)
    meta = np.zeros((n_rows, m_max), np.int32)
    nv = np.zeros(n_rows, np.int32)
    if n_rows:
        lib.sketch_windowed_host(
            ref_flat.ctypes.data, starts.ctypes.data, rlens.ctypes.data,
            n_rows, int(k), we_row.ctypes.data, mcap_row.ctypes.data,
            int(m_max), key.ctypes.data, meta.ctypes.data, nv.ctypes.data)
    return key, meta, nv


def sketch_reads_host(codes: np.ndarray, rids: np.ndarray, k: int):
    """Whole-read canonical minimizer of codes[rids] on the host
    (sketch.cpp sketch_reads_host — bit-identical to the device
    sketch_reads_dyn path). Returns (kmer_hi u32, kmer_lo u32,
    end_pos i32, strand i8) or None if native unavailable."""
    lib = _load()
    if not lib:
        return None
    codes = _as_c(codes)
    rids = np.ascontiguousarray(rids, np.int64)
    n = len(rids)
    hi = np.empty(n, np.uint32)
    lo = np.empty(n, np.uint32)
    pos = np.empty(n, np.int32)
    strand = np.empty(n, np.int8)
    if n:
        lib.sketch_reads_host(codes.ctypes.data, codes.shape[1],
                              rids.ctypes.data, n, int(k), hi.ctypes.data,
                              lo.ctypes.data, pos.ctypes.data,
                              strand.ctypes.data)
    return hi, lo, pos, strand


def popcounts_at(codes: np.ndarray, rids: np.ndarray):
    """(pop_vs_allA, pop_vs_allT) int32 2-bit XOR popcounts of the rows
    codes[rids] (sketch.cpp popcounts_at), or None if native unavailable."""
    lib = _load()
    if not lib:
        return None
    codes = _as_c(codes)
    rids = np.ascontiguousarray(rids, np.int64)
    n = len(rids)
    pa = np.empty(n, np.int32)
    pt = np.empty(n, np.int32)
    if n:
        lib.popcounts_at(codes.ctypes.data, codes.shape[1], rids.ctypes.data,
                         n, pa.ctypes.data, pt.ctypes.data)
    return pa, pt


def probe_index_pairs(ikey, icid, ipos, istrand, pkey, pcid, ppos, pstrand,
                      cap: int):
    """Merge candidate join (sketch.cpp probe_index_pairs): probes walk the
    per-key index buckets (array order, first `cap` per probe), emitting
    (a, b, shift) for different-contig same-strand hits. Returns
    (a, b, d, drops) or None if native unavailable."""
    lib = _load()
    if not lib:
        return None
    ikey = np.ascontiguousarray(ikey, np.uint32)
    icid = np.ascontiguousarray(icid, np.int64)
    ipos = np.ascontiguousarray(ipos, np.int32)
    istrand = np.ascontiguousarray(istrand, np.int8)
    pkey = np.ascontiguousarray(pkey, np.uint32)
    pcid = np.ascontiguousarray(pcid, np.int64)
    ppos = np.ascontiguousarray(ppos, np.int32)
    pstrand = np.ascontiguousarray(pstrand, np.int8)
    drops = np.zeros(1, np.int64)
    out_cap = max(1 << 16, len(pkey) * 2)
    while True:
        a = np.empty(out_cap, np.int64)
        b = np.empty(out_cap, np.int64)
        d = np.empty(out_cap, np.int64)
        n = lib.probe_index_pairs(
            ikey.ctypes.data, icid.ctypes.data, ipos.ctypes.data,
            istrand.ctypes.data, len(ikey),
            pkey.ctypes.data, pcid.ctypes.data, ppos.ctypes.data,
            pstrand.ctypes.data, len(pkey),
            int(cap), drops.ctypes.data,
            a.ctypes.data, b.ctypes.data, d.ctypes.data, out_cap)
        if n >= 0:
            return a[:n], b[:n], d[:n], int(drops[0])
        out_cap = -n


def set_threads(n: int) -> None:
    """Cap the native OpenMP worker count (the -t flag; results are
    byte-identical for any thread count — see realign.cpp's per-contig
    buffers and diffcodec's two-pass design)."""
    lib = _load()
    if lib and n > 0:
        lib.set_num_threads(int(n))


def fastq_parse_codes(data: bytes):
    """FASTQ buffer -> [N, L] base-code matrix (None if native unavailable).

    Raises ValueError on the same malformed inputs the Python parser rejects
    (truncated record structure, non-uniform length, L > 256)."""
    lib = _load()
    if not lib:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    n_reads = ctypes.c_int64()
    L = ctypes.c_int64()
    rc = lib.fastq_scan(buf.ctypes.data, len(buf),
                        ctypes.byref(n_reads), ctypes.byref(L))
    if rc == -1:
        raise ValueError("truncated FASTQ (line count not a multiple of 4)")
    if rc == -2:
        raise ValueError("reads have non-uniform length")
    if rc == -3:
        raise ValueError("read length exceeds the 256 bp limit")
    out = np.empty((n_reads.value, L.value), dtype=np.uint8)
    if n_reads.value:
        lib.fastq_extract(buf.ctypes.data, len(buf), n_reads.value, L.value,
                          out.ctypes.data)
    return out


def codes_to_lines(codes: np.ndarray):
    """[N, L] base codes -> b'ACGT...\\n' per row (None if no native lib)."""
    lib = _load()
    if not lib:
        return None
    codes = _as_c(codes)
    n, L = codes.shape
    out = np.empty(n * (L + 1), dtype=np.uint8)
    lib.codes_to_lines(codes.ctypes.data, n, L, out.ctypes.data)
    return out.tobytes()


def realign_probe(ref_flat: np.ndarray, ref_ptr: np.ndarray,
                  sg_codes: np.ndarray, dict_starts: np.ndarray,
                  seg_len: int, thr: int, max_search: int,
                  rc_skip_cost: bool):
    """Native realign probe (realign.cpp); returns winner arrays
    (sg_idx, contig, offset, dir, popcount) — the best placement per
    singleton under the claim order (pop, contig, offset, dir), at most one
    row per singleton, in singleton order."""
    lib = _load()
    if not lib:
        return None
    n_sg, L = sg_codes.shape
    ref_flat = _as_c(ref_flat)
    ref_ptr = np.ascontiguousarray(ref_ptr, np.int64)
    sg_codes = _as_c(sg_codes)
    dict_starts = np.ascontiguousarray(dict_starts, np.int32)
    cap = max(1, n_sg)
    out = [np.empty(cap, np.int32), np.empty(cap, np.int32),
           np.empty(cap, np.int32), np.empty(cap, np.int8),
           np.empty(cap, np.int32)]
    n = lib.realign_probe(
        ref_flat.ctypes.data, ref_ptr.ctypes.data, len(ref_ptr) - 1,
        sg_codes.ctypes.data, n_sg, L,
        dict_starts.ctypes.data, seg_len, len(dict_starts),
        thr, max_search, int(rc_skip_cost),
        out[0].ctypes.data, out[1].ctypes.data, out[2].ctypes.data,
        out[3].ctypes.data, out[4].ctypes.data, cap)
    if n < 0:
        raise RuntimeError("realign_probe failed")
    return tuple(o[:n] for o in out)
