"""Stage checkpoint / resume (SURVEY.md §5 — the reference has none; crashes
mid-run just leave scratch dirs behind, kthread_hash_realign.c:22,63).

The pipeline's stage boundaries are plain numpy arrays, so a checkpoint is one
``.npz`` per completed expensive stage (``cluster`` -> ``merge`` ->
``realign``), written atomically (tmp + rename). A rerun of ``compress`` with
the same inputs and parameters resumes from the newest valid stage and skips
everything before it; archives produced with and without resume are
byte-identical because every stage is deterministic.

A fingerprint guards against stale state: sha256 over each input file's size,
head and tail bytes, 64 KiB chunks at 64 evenly strided interior offsets, plus
the full user config. Any mismatch makes old checkpoints invisible (they are
simply ignored, never deleted — a rerun with the original input can still use
them).
"""

from __future__ import annotations

import dataclasses
import hashlib
import io
import json
import os

import numpy as np

#: pipeline order; resume picks the latest stage present & valid
STAGES = ("cluster", "merge", "realign")

_HEAD_TAIL = 1 << 20   # bytes of each input hashed from both ends
_N_STRIDES = 64        # interior sample points between head and tail
_STRIDE_CHUNK = 1 << 16  # bytes hashed at each interior sample


def fingerprint(paths: list[str], cfg) -> str:
    """Content+config fingerprint. Hashes the head/tail megabyte plus 64 KiB
    at 64 evenly strided interior offsets — O(MB) for multi-GB inputs, but a
    single-byte edit anywhere leaves at most a ~(size/64) blind span, and the
    size itself participates so same-prefix growth is always caught."""
    h = hashlib.sha256()
    for p in paths:
        size = os.path.getsize(p)
        h.update(f"{os.path.basename(p)}:{size}:".encode())
        with open(p, "rb") as f:
            h.update(f.read(_HEAD_TAIL))
            lo, hi = _HEAD_TAIL, max(_HEAD_TAIL, size - _HEAD_TAIL)
            if 0 < hi - lo <= _N_STRIDES * _STRIDE_CHUNK:
                h.update(f.read(hi - lo))  # small interior: hash it all
            elif hi - lo > 0:
                for i in range(_N_STRIDES):
                    off = lo + (hi - lo) * i // _N_STRIDES
                    f.seek(off)
                    h.update(f.read(min(_STRIDE_CHUNK, hi - off)))
            if size > _HEAD_TAIL:
                f.seek(hi)
                h.update(f.read(_HEAD_TAIL))
    d = dataclasses.asdict(cfg)
    d.pop("checkpoint_dir", None)  # resuming is not parameter-relevant
    h.update(json.dumps(d, sort_keys=True).encode())
    return h.hexdigest()


class StageCheckpoint:
    """Save/load the (ClusterSet, singleton, …) state at stage boundaries."""

    def __init__(self, ckpt_dir: str, paths: list[str], cfg):
        self.dir = ckpt_dir
        self.fp = fingerprint(paths, cfg)
        os.makedirs(ckpt_dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}.npz")

    # -- write ----------------------------------------------------------
    def save(self, stage: str, cset, sg: np.ndarray,
             extra: dict[str, np.ndarray] | None = None) -> None:
        assert stage in STAGES, stage
        arrays = {
            "cs_mem_rid": cset.mem_rid, "cs_mem_off": cset.mem_off,
            "cs_mem_dir": cset.mem_dir, "cs_cluster_ptr": cset.cluster_ptr,
            "cs_ref_flat": cset.ref_flat, "cs_ref_ptr": cset.ref_ptr,
            "readlen": np.int64(cset.readlen), "sg": sg,
            "fp": np.frombuffer(self.fp.encode(), np.uint8),
        }
        for k, v in (extra or {}).items():
            arrays["x_" + k] = v
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        tmp = self._path(stage) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, self._path(stage))

    # -- read -----------------------------------------------------------
    def load(self, stage: str):
        """-> (ClusterSet, sg, extra_dict) or None if absent/invalid."""
        path = self._path(stage)
        if not os.path.exists(path):
            return None
        try:
            z = np.load(path)
            if bytes(z["fp"]).decode() != self.fp:
                return None
            from minicom_tpu.pipeline.cluster import ClusterSet
            cset = ClusterSet(
                int(z["readlen"]), z["cs_mem_rid"], z["cs_mem_off"],
                z["cs_mem_dir"], z["cs_cluster_ptr"], z["cs_ref_flat"],
                z["cs_ref_ptr"])
            extra = {k[2:]: z[k] for k in z.files if k.startswith("x_")}
            return cset, z["sg"], extra
        except Exception:
            return None  # unreadable/truncated checkpoint: recompute

    def latest(self):
        """Newest valid stage -> (stage_name, state) or (None, None)."""
        for stage in reversed(STAGES):
            state = self.load(stage)
            if state is not None:
                return stage, state
        return None, None
