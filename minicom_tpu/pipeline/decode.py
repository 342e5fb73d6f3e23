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
                          out: np.ndarray | None = None) -> np.ndarray:
    """Reconstruct all cluster member reads -> [M, L] uint8 ASCII rows, in
    canonical emission order (into `out` when given: rows are written in
    place, saving a second full-matrix copy in the assembler)."""
    from minicom_tpu.pipeline.merge import _sub
    with _sub(stats, "decode_clusters"):
        return _unpack_cluster_reads_inner(meta, streams, stats, out)


def _unpack_cluster_reads_inner(meta: dict, streams: dict,
                                stats: dict | None = None,
                                out: np.ndarray | None = None) -> np.ndarray:
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
    cnt = np.frombuffer(streams["cnt"], np.uint32).astype(np.int64)
    d16 = np.frombuffer(streams["dpos"], np.uint16)
    dx = np.frombuffer(streams["dposx"], np.uint32)
    delta = d16.astype(np.int64)
    esc = d16 == DPOS_ESCAPE
    delta[esc] = dx
    dirs = unpack_bits(np.frombuffer(streams["dir"], np.uint8), M)

    ptr = np.zeros(C + 1, np.int64)
    np.cumsum(cnt, out=ptr[1:])
    segc = np.repeat(np.arange(C), cnt)
    # per-cluster prefix sum of deltas -> positions
    gpos = np.cumsum(delta)
    base = np.zeros(C, np.int64)
    base[1:] = gpos[ptr[1:-1] - 1]
    pos = gpos - base[segc]

    # ref extents: last pos + L per cluster
    last_pos = gpos[ptr[1:] - 1] - base
    ref_len = last_pos + L
    rptr = np.zeros(C + 1, np.int64)
    np.cumsum(ref_len, out=rptr[1:])
    t0 = _t("meta", t0)
    ref_cat = unpack_2bit(np.frombuffer(streams["ref"], np.uint8), int(rptr[-1]))
    t0 = _t("unpackref", t0)

    base = rptr[segc] + pos
    reads = native.diff_decode_win(streams["diff"], ref_cat, base,
                                   dirs.astype(np.int8), M, L, out=out)
    _t("diff", t0)
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
    return reads


def _const_reads(char: bytes, n: int, L: int) -> np.ndarray:
    return np.full((n, L), char[0], np.uint8)


def _iter_class_blocks(meta: dict, streams: dict,
                       stats: dict | None = None,
                       cluster_out: np.ndarray | None = None):
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
    yield "clusters", _unpack_cluster_reads(meta, streams, stats, cluster_out)


def decode_streams(meta: dict, streams: dict) -> dict:
    """Decode every stream -> dict of [*, L] uint8 ASCII blocks keyed by class."""
    return dict(_iter_class_blocks(meta, streams))


_CLASS_ORDER = ["alla", "allt", "alln", "aa", "tt", "nn", "nsingle", "single",
                "clusters"]


def assemble_unordered(meta: dict, streams: dict,
                       stats: dict | None = None) -> np.ndarray:
    out = np.empty((meta["n_seq"], meta["readlen"]), np.uint8)
    # cluster members are the LAST class block, so they decode straight into
    # the output tail (no second full-matrix copy — at 5M reads the cluster
    # block is ~90% of the 505 MB output)
    pos = 0
    for key, blk in _iter_class_blocks(
            meta, streams, stats,
            cluster_out=out[meta["n_seq"] - meta["n_members"]:]):
        if key != "clusters" or blk.base is not out:
            out[pos:pos + len(blk)] = blk
        pos += len(blk)
    assert pos == meta["n_seq"], "class blocks do not partition the read set"
    return out


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


def assemble_order(meta: dict, streams: dict) -> np.ndarray:
    """Every read placed at its original index via the id streams. Class
    blocks are decoded, scattered into the output and freed ONE AT A TIME —
    the id lists partition [0, n_seq), so the output is written exactly
    once and peak RSS is output + one block (not output + all blocks)."""
    ids = _class_ids(meta, streams)
    L = meta["readlen"]
    out = np.empty((meta["n_seq"], L), np.uint8)
    placed = 0
    for key, blk in _iter_class_blocks(meta, streams):
        tgt = _cluster_ids(meta, streams) if key == "clusters" else ids[key]
        if len(blk):
            out[tgt] = blk
        placed += len(blk)
    assert placed == meta["n_seq"], "id streams do not partition the read set"
    return out


def assemble_pe(meta: dict, streams: dict) -> tuple[np.ndarray, np.ndarray]:
    """File bit 0 -> append to mate-1 output in emission order; bit 1 ->
    place at slot peid of the mate-2 output. Streaming per class block (one
    block live at a time), tracking the running emission ordinal."""
    n_emit = meta["n_seq"]
    fbits = unpack_bits(np.frombuffer(streams["fbits"], np.uint8), n_emit)
    peids = np.frombuffer(streams["peids"], np.uint32).astype(np.int64)
    L = meta["readlen"]
    half = meta["half"]
    file1 = np.empty((half, L), np.uint8)
    file2 = np.empty((half, L), np.uint8)
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
    return file1, file2
