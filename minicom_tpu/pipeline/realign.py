"""Singleton realignment ladder (reference: realign_hash,
kthread_hash_realign.c:569-594).

Implemented in the next milestone; currently a pass-through so the end-to-end
slice (classify -> cluster -> serialize -> roundtrip) is exercised first.
"""

from __future__ import annotations

import numpy as np

from minicom_tpu.config import ResolvedConfig
from minicom_tpu.pipeline.cluster import ClusterSet


def realign_ladder(cset: ClusterSet, sg: np.ndarray, codes_sub: np.ndarray,
                   n_mask: np.ndarray, cfg: ResolvedConfig):
    extra = np.zeros(0, np.int64)
    return cset, sg, extra, extra
