"""Contig merge rounds (reference: combine_cluster, kthread_cb.c:570-661).

Implemented in the next milestone; currently a pass-through so the end-to-end
slice (classify -> cluster -> serialize -> roundtrip) is exercised first.
"""

from __future__ import annotations

from minicom_tpu.config import ResolvedConfig
from minicom_tpu.pipeline.cluster import ClusterSet


def merge_contigs(cset: ClusterSet, cfg: ResolvedConfig) -> ClusterSet:
    return cset
