"""Decompressor (reference: decompress.c).

Reverses `pipeline.encode.serialize` exactly. The reference's lazy contig
extension (`getRef`, decompress.c:92-100) becomes an explicit rule: a
cluster's consensus length = last member position + readlen, so per-cluster
ref extents are a prefix-sum and the whole reconstruction is vectorized:
Δpos prefix-sums, one ragged gather for ref windows, one native diff-decode
pass, and a masked reverse-complement.

Output assembly by mode (decompress.c:1225-1317):
* unordered: canonical emission order (allA, allT, allN, AA, TT, NN,
  single_N, single, cluster members) — a permutation of the input multiset.
* ORDER: every read is placed at its original index via the id streams.
* PE: file bit 0 -> append to mate-1 output; bit 1 -> place at slot `peid`
  of the mate-2 output so line i of file 2 is the mate of line i of file 1.
"""

from __future__ import annotations

import numpy as np

from minicom_tpu import native
from minicom_tpu.native import diff_decode
from minicom_tpu.ops.pack import (ascii_to_codes, codes_to_ascii, unpack_2bit,
                                  unpack_bits)
from minicom_tpu.pipeline.encode import DPOS_ESCAPE


def _unpack_cluster_reads(meta: dict, streams: dict,
                          stats: dict | None = None,
                          out: np.ndarray | None = None,
                          sink=None) -> np.ndarray:
    """Reconstruct all cluster member reads -> [M, L] uint8 ASCII rows, in
    canonical emission order (into `out` when given: rows are written in
    place, saving a second full-matrix copy in the assembler; ``sink(lo,hi)``
    is called per finished row chunk so the caller can stream them out)."""
    from minicom_tpu.pipeline.merge import _sub
    with _sub(stats, "decode_clusters"):
        return _unpack_cluster_reads_inner(meta, streams, stats, out, sink)


def _unpack_cluster_reads_inner(meta: dict, streams: dict,
                                stats: dict | None = None,
                                out: np.ndarray | None = None,
                                sink=None) -> np.ndarray:
    import time as _time

    def _t(key, t0):
        if stats is not None:
            k = f"decode_cl_{key}_s"
            t1 = _time.perf_counter()
            stats[k] = round(stats.get(k, 0.0) + t1 - t0, 4)
            return t1
        return t0

    L = meta["readlen"]
    M = meta["n_members"]
    C = meta["n_clusters"]
    if M == 0:
        return np.zeros((0, L), np.uint8)
    t0 = _time.perf_counter()
    cnt = np.frombuffer(streams["cnt"], np.uint32)
    d16 = np.frombuffer(streams["dpos"], np.uint16)
    dx = np.frombuffer(streams["dposx"], np.uint32)
    nm = native.decode_cluster_meta(cnt, d16, dx,
                                    np.frombuffer(streams["dir"], np.uint8),
                                    M, L, DPOS_ESCAPE)
    if nm is not None:
        base, dirs8, ref_total = nm
    else:   # pure-numpy meta path
        delta = d16.astype(np.int64)
        esc = d16 == DPOS_ESCAPE
        delta[esc] = dx
        dirs8 = unpack_bits(np.frombuffer(streams["dir"], np.uint8),
                            M).astype(np.int8)
        cnt64 = cnt.astype(np.int64)
        ptr = np.zeros(C + 1, np.int64)
        np.cumsum(cnt64, out=ptr[1:])
        segc = np.repeat(np.arange(C), cnt64)
        # per-cluster prefix sum of deltas -> positions
        gpos = np.cumsum(delta)
        cbase = np.zeros(C, np.int64)
        cbase[1:] = gpos[ptr[1:-1] - 1]
        pos = gpos - cbase[segc]
        # ref extents: last pos + L per cluster
        last_pos = gpos[ptr[1:] - 1] - cbase
        rptr = np.zeros(C + 1, np.int64)
        np.cumsum(last_pos + L, out=rptr[1:])
        base = rptr[segc] + pos
        ref_total = int(rptr[-1])
    t0 = _t("meta", t0)
    ref_cat = unpack_2bit(np.frombuffer(streams["ref"], np.uint8), ref_total)
    t0 = _t("unpackref", t0)

    # multi-process: member rows partition into contiguous rank ranges; each
    # rank diff-decodes its slice (the diff text cuts at its range's
    # newline) and the row blocks reassemble with an ordered all-gather —
    # the decode twin of the serializer's member sharding (VERDICT r04
    # missing #7). Output rows are independent, so the result is
    # byte-identical to the serial pass.
    from minicom_tpu.parallel import distributed as dist
    _, nproc = dist.process_grid()
    if nproc > 1 and nm is not None:
        d0, d1 = dist.my_partition(np.ones(M, np.int32))
        buf = np.frombuffer(streams["diff"], np.uint8)
        nl = np.flatnonzero(buf == ord("\n"))
        t_lo = 0 if d0 == 0 else int(nl[d0 - 1]) + 1
        t_hi = int(nl[d1 - 1]) + 1 if d1 > 0 else 0
        my = native.diff_decode_win(
            streams["diff"][t_lo:t_hi], ref_cat, base[d0:d1],
            dirs8[d0:d1], d1 - d0, L)
        # exchange row blocks in bounded ROUNDS (one whole-output padded
        # allgather would spike per-rank RSS by ~P x output size — the
        # memory the sharded store just saved)
        if out is None:
            out = np.empty((M, L), np.uint8)
        CH = max(1, (64 << 20) // (L * nproc))
        bnds = dist.partition(np.ones(M, np.int32))
        rounds = max(-(-(p1 - p0) // CH) for p0, p1 in bnds)
        for r in range(rounds):
            lo = min(d0 + r * CH, d1)
            hi = min(lo + CH, d1)
            blk = dist.allgather_ragged(
                my[lo - d0:hi - d0].reshape(-1)).reshape(-1, L)
            # reassemble: each rank's r-th chunk, in rank order
            pos = 0
            for p in range(nproc):
                p0, p1 = bnds[p]
                plo = min(p0 + r * CH, p1)
                phi = min(plo + CH, p1)
                out[plo:phi] = blk[pos:pos + (phi - plo)]
                pos += phi - plo
        _t("diff", t0)
        return out

    if sink is not None and out is not None and native.has_native():
        # chunked decode + streaming handoff: each finished row range goes
        # to the writer while the next range decodes
        buf = np.frombuffer(streams["diff"], np.uint8)
        nl = np.flatnonzero(buf == ord("\n"))
        CH = 1 << 20
        for lo in range(0, M, CH):
            hi = min(lo + CH, M)
            s_lo = 0 if lo == 0 else int(nl[lo - 1]) + 1
            s_hi = int(nl[hi - 1]) + 1
            native.diff_decode_win(streams["diff"][s_lo:s_hi], ref_cat,
                                   base[lo:hi], dirs8[lo:hi], hi - lo, L,
                                   out=out[lo:hi])
            sink(lo, hi)
        _t("diff", t0)
        return out

    reads = native.diff_decode_win(streams["diff"], ref_cat, base,
                                   dirs8, M, L, out=out)
    _t("diff", t0)
    if reads is not None and sink is not None:
        sink(0, M)
    dirs = dirs8
    if reads is None:  # pure-Python fallback
        win = base[:, None] + np.arange(L)[None, :]
        ref_rows = codes_to_ascii(ref_cat[win])
        reads = diff_decode(streams["diff"], ref_rows, M)
        rc_mask = dirs == 1
        if rc_mask.any():
            codes = ascii_to_codes(reads[rc_mask])
            comp = np.where(codes < 4, 3 - codes, codes).astype(np.uint8)
            reads[rc_mask] = codes_to_ascii(np.flip(comp, axis=1))
        if out is not None:
            out[:] = reads
            reads = out
        if sink is not None and out is not None:
            sink(0, M)
    return reads


def _const_reads(char: bytes, n: int, L: int) -> np.ndarray:
    return np.full((n, L), char[0], np.uint8)


def _iter_class_blocks(meta: dict, streams: dict,
                       stats: dict | None = None,
                       cluster_out: np.ndarray | None = None,
                       cluster_sink=None):
    """Yield (class_key, [*, L] uint8 ASCII block) in canonical emission
    order, one at a time — callers place each block into the output and drop
    it before the next is built, so peak memory stays ~1 block + output
    instead of every class at once (the r03 ORDER-decode RSS blowup,
    decode.c analogue: decompress.c writes streams incrementally).

    Per-class build seconds land in stats as decode_<class>_s so the decode
    wall is attributable below the stage level."""
    import time as _time

    def _t(key, fn):
        t0 = _time.perf_counter()
        blk = fn()
        if stats is not None:
            k = f"decode_{key}_s"
            stats[k] = round(stats.get(k, 0.0)
                             + _time.perf_counter() - t0, 4)
        return blk

    L = meta["readlen"]
    yield "alla", _const_reads(b"A", meta["n_alla"], L)
    yield "allt", _const_reads(b"T", meta["n_allt"], L)
    yield "alln", _const_reads(b"N", meta["n_alln"], L)
    yield "aa", _t("aattnn", lambda: diff_decode(
        streams["aa"], _const_reads(b"A", meta["n_aa"], L), meta["n_aa"]))
    yield "tt", _t("aattnn", lambda: diff_decode(
        streams["tt"], _const_reads(b"T", meta["n_tt"], L), meta["n_tt"]))
    yield "nn", _t("aattnn", lambda: diff_decode(
        streams["nn"], _const_reads(b"N", meta["n_nn"], L), meta["n_nn"]))
    ns = np.frombuffer(streams["nsingle"], np.uint8)
    yield "nsingle", (ns.reshape(meta["n_nsingle"], L + 1)[:, :L]
                      if meta["n_nsingle"] else np.zeros((0, L), np.uint8))

    def _singles():
        sg = unpack_2bit(np.frombuffer(streams["single"], np.uint8),
                         meta["n_single"] * L)
        return codes_to_ascii(sg.reshape(meta["n_single"], L))

    yield "single", _t("single", _singles)
    yield "clusters", _unpack_cluster_reads(meta, streams, stats, cluster_out,
                                            cluster_sink)


def decode_streams(meta: dict, streams: dict) -> dict:
    """Decode every stream -> dict of [*, L] uint8 ASCII blocks keyed by class."""
    return dict(_iter_class_blocks(meta, streams))


_CLASS_ORDER = ["alla", "allt", "alln", "aa", "tt", "nn", "nsingle", "single",
                "clusters"]


def _hugepage_empty(n: int, L1: int) -> np.ndarray:
    """[n, L1] uint8 backed by an anonymous mmap with MADV_HUGEPAGE: the
    kernel's page-fault zeroing of a fresh 500 MB output matrix costs ~2.3s
    in 4 KiB pages but ~0.9s with huge pages (measured r05); the prefault
    thread (Prealloc) then hides even that under the entropy decode."""
    size = n * L1
    if size < (8 << 20):
        return np.empty((n, L1), np.uint8)
    import ctypes
    import mmap as _mmap
    buf = _mmap.mmap(-1, size)
    try:
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        ctypes.CDLL(None).madvise(ctypes.c_void_p(addr),
                                  ctypes.c_size_t(size), 14)  # MADV_HUGEPAGE
    except Exception:
        pass
    return np.frombuffer(buf, np.uint8).reshape(n, L1)


def _alloc_lines(n: int, L: int) -> tuple[np.ndarray, np.ndarray]:
    """Output-with-newlines matrix [n, L+1] (newline column preset) and its
    [:, :L] payload view: decode writes rows in place and the writer dumps
    the full buffer without any copy (r05 decode-win plumbing)."""
    full = _hugepage_empty(n, L + 1)
    full[:, L] = ord("\n")
    return full, full[:, :L]


class Prealloc:
    """Output matrices allocated + first-touched on a background thread while
    the entropy streams decode (the stream decoders release the GIL): by
    assembly time every output page is faulted in, so row writes run at
    memory speed instead of page-fault speed."""

    def __init__(self, meta: dict):
        import threading
        L = meta["readlen"]
        self._pairs = []
        if meta.get("pe"):
            shapes = [meta["half"], meta["half"]]
        else:
            shapes = [meta["n_seq"]]
        self._shapes = [(s, L) for s in shapes]
        self._thread = threading.Thread(target=self._build, daemon=True)
        self._thread.start()

    def _build(self):
        try:
            for n, L in self._shapes:
                full = _hugepage_empty(n, L + 1)
                # touch ONE byte per 4 KiB page: faults + kernel zeroing
                # happen now, at ~1/64 of the memory traffic of a full
                # column write (which runs at cache speed later)
                step = max(1, 4096 // (L + 1))
                if n:
                    full[::step, 0] = 0
                self._pairs.append(full)
        except BaseException as e:   # re-raised on take()
            self._err = e

    def take(self):
        """Blocks until allocation finishes; returns [(full, view), ...]."""
        self._thread.join()
        if getattr(self, "_err", None) is not None:
            raise self._err
        out = []
        for (n, L), full in zip(self._shapes, self._pairs):
            full[:, L] = ord("\n")   # pages are faulted: runs at cache speed
            out.append((full, full[:, :L]))
        return out


def assemble_unordered(meta: dict, streams: dict,
                       stats: dict | None = None,
                       pre: "Prealloc | None" = None,
                       sink=None) -> np.ndarray:
    """Returns the [n_seq, L+1] lines matrix (newline column included).

    With ``sink`` (callable taking row-range views of the lines matrix),
    finished regions are handed over DURING assembly — the decompressor's
    writer thread streams them to disk while the cluster rows still decode,
    like the reference's per-thread OpenMP writes (decompress.c:1271-1296).
    This matters on throttled-writeback hosts, where a single end-of-decode
    505 MB write can cost more than the whole decode."""
    full, out = pre.take()[0] if pre else _alloc_lines(meta["n_seq"],
                                                       meta["readlen"])
    M = meta["n_members"]
    # cluster members are the LAST class block, so they decode straight into
    # the output tail (no second full-matrix copy — at 5M reads the cluster
    # block is ~90% of the 505 MB output)
    pos = 0
    for key, blk in _iter_class_blocks(
            meta, streams, stats,
            cluster_out=out[meta["n_seq"] - M:],
            cluster_sink=(None if sink is None else
                          (lambda lo, hi:
                           sink(full[meta["n_seq"] - M + lo:
                                     meta["n_seq"] - M + hi])))):
        if key != "clusters" or blk.base is not full:
            out[pos:pos + len(blk)] = blk
        if sink is not None and key != "clusters":
            sink(full[pos:pos + len(blk)])
        pos += len(blk)
    assert pos == meta["n_seq"], "class blocks do not partition the read set"
    return full


def _class_ids(meta: dict, streams: dict) -> dict:
    ids = {}
    for key, stream in [("alla", "ids_alla"), ("allt", "ids_allt"),
                        ("alln", "ids_alln"), ("aa", "ids_aa"),
                        ("tt", "ids_tt"), ("nn", "ids_nn"),
                        ("nsingle", "ids_nsingle"), ("single", "ids_single")]:
        ids[key] = np.cumsum(np.frombuffer(streams[stream], np.uint32)
                             .astype(np.int64))
    return ids


def _cluster_ids(meta: dict, streams: dict) -> np.ndarray:
    """Decode the abs/delta cluster id stream (kthread_dump.c:117-128)."""
    M = meta["n_members"]
    if M == 0:
        return np.zeros(0, np.int64)
    cnt = np.frombuffer(streams["cnt"], np.uint32).astype(np.int64)
    d16 = np.frombuffer(streams["dpos"], np.uint16)
    raw = np.frombuffer(streams["ids"], np.uint32)
    C = meta["n_clusters"]
    ptr = np.zeros(C + 1, np.int64)
    np.cumsum(cnt, out=ptr[1:])
    first = np.zeros(M, bool)
    first[ptr[:-1]] = True
    is_abs = first | (d16 != 0)
    # ids[i] = raw[i] if abs else ids[i-1] + raw[i]  (uint32 wraparound,
    # kthread_dump.c:121-126) — a segmented cumsum anchored at abs entries:
    # out[i] = csum[i] - csum[a] + raw[a] for the latest abs index a <= i.
    seg = np.cumsum(is_abs) - 1
    csum = np.cumsum(raw, dtype=np.uint64).astype(np.uint32)
    abs_idx = np.flatnonzero(is_abs)
    out = (csum - csum[abs_idx][seg] + raw[abs_idx][seg]).astype(np.uint32)
    return out.astype(np.int64)


def assemble_order(meta: dict, streams: dict,
                   pre: "Prealloc | None" = None) -> np.ndarray:
    """Every read placed at its original index via the id streams. Class
    blocks are decoded, scattered into the output and freed ONE AT A TIME —
    the id lists partition [0, n_seq), so the output is written exactly
    once and peak RSS is output + one block (not output + all blocks)."""
    ids = _class_ids(meta, streams)
    L = meta["readlen"]
    full, out = pre.take()[0] if pre else _alloc_lines(meta["n_seq"], L)
    placed = 0
    for key, blk in _iter_class_blocks(meta, streams):
        tgt = _cluster_ids(meta, streams) if key == "clusters" else ids[key]
        if len(blk):
            out[tgt] = blk
        placed += len(blk)
    assert placed == meta["n_seq"], "id streams do not partition the read set"
    return full


def assemble_pe(meta: dict, streams: dict,
                pre: "Prealloc | None" = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """File bit 0 -> append to mate-1 output in emission order; bit 1 ->
    place at slot peid of the mate-2 output. Streaming per class block (one
    block live at a time), tracking the running emission ordinal."""
    n_emit = meta["n_seq"]
    fbits = unpack_bits(np.frombuffer(streams["fbits"], np.uint8), n_emit)
    peids = np.frombuffer(streams["peids"], np.uint32).astype(np.int64)
    L = meta["readlen"]
    half = meta["half"]
    if pre:
        (full1, file1), (full2, file2) = pre.take()
    else:
        full1, file1 = _alloc_lines(half, L)
        full2, file2 = _alloc_lines(half, L)
    pos = n1 = n2 = 0
    for _, blk in _iter_class_blocks(meta, streams):
        seg = fbits[pos:pos + len(blk)] == 1
        m1 = blk[~seg]
        file1[n1:n1 + len(m1)] = m1
        file2[peids[n2:n2 + int(seg.sum())]] = blk[seg]
        n1 += len(m1)
        n2 += int(seg.sum())
        pos += len(blk)
    assert pos == n_emit and n1 == half and n2 == half, \
        "PE streams do not pair up"
    return full1, full2
