"""Read classification & N-substitution (reference: kthread_reads.c:40-230).

Routes each read into one of the special classes or the clustering pool,
reproducing the reference's rule order exactly:

1. all bases A            -> allA
2. all bases T            -> allT
3. all bases N            -> allN
4. #(T,G,C,N) <= e        -> nearA  (AA stream)
5. #(A,G,C,N) <= e        -> nearT  (TT stream)
6. #(A,T,G,C) <= e        -> mostlyN (NN stream)
7. else if #N <= 0.4*L    -> substitute N with the majority base
                             (priority A,T,G,C on ties) and sketch/cluster
8. else                   -> nfile  (single_N stream)

Everything is a vectorized reduction over the [N, L] code matrix — the
reference's per-read loop with 8 mutex-guarded output lists becomes a handful
of masked counts (SURVEY.md §2 C9).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from minicom_tpu.config import ResolvedConfig


@dataclasses.dataclass
class Classified:
    codes_sub: np.ndarray     # [N, L] uint8 codes with N substituted (0..3)
    has_n: np.ndarray         # [N] bool — read contained at least one N
    n_mask: np.ndarray        # [N, L] bool — positions that were N
    all_a: np.ndarray         # rid arrays, in input order
    all_t: np.ndarray
    all_n: np.ndarray
    near_a: np.ndarray
    near_t: np.ndarray
    mostly_n: np.ndarray
    nfile: np.ndarray         # N-heavy singles (single_N stream)
    pool: np.ndarray          # rids entering the clustering pipeline


def classify(codes: np.ndarray, cfg: ResolvedConfig) -> Classified:
    """codes: [N, L] uint8 with N=4. Does not modify its input."""
    n, L = codes.shape
    e = cfg.diff_threshold
    cnt = np.zeros((5, n), dtype=np.int32)
    for b in range(5):
        cnt[b] = (codes == b).sum(axis=1, dtype=np.int32)
    cA, cC, cG, cT, cN = cnt

    is_all_a = cA == L
    is_all_t = cT == L
    is_all_n = cN == L
    taken = is_all_a | is_all_t | is_all_n
    is_near_a = ~taken & (cT + cG + cC + cN <= e)
    taken |= is_near_a
    is_near_t = ~taken & (cA + cG + cC + cN <= e)
    taken |= is_near_t
    is_mostly_n = ~taken & (cA + cT + cG + cC <= e)
    taken |= is_mostly_n
    is_nfile = ~taken & (cN > 0.4 * L)
    is_pool = ~taken & ~is_nfile

    # N substitution with majority base, tie priority A,T,G,C
    # (kthread_reads.c:182-205)
    n_mask = codes == 4
    has_n = cN > 0
    maj_order = np.stack([cA, cT, cG, cC])          # reference if-chain order
    maj_idx = np.argmax(maj_order, axis=0)          # 0=A,1=T,2=G,3=C
    maj_code = np.array([0, 3, 2, 1], dtype=np.uint8)[maj_idx]
    codes_sub = np.where(n_mask, maj_code[:, None], codes).astype(np.uint8)

    rid = np.arange(n, dtype=np.int64)
    return Classified(
        codes_sub=codes_sub, has_n=has_n, n_mask=n_mask,
        all_a=rid[is_all_a], all_t=rid[is_all_t], all_n=rid[is_all_n],
        near_a=rid[is_near_a], near_t=rid[is_near_t],
        mostly_n=rid[is_mostly_n], nfile=rid[is_nfile], pool=rid[is_pool],
    )


def restore_n(codes_sub: np.ndarray, n_mask: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Original codes (N restored) for the given read rows — used at dump time
    (kthread_dump.c:181-186 puts N back before diff encoding)."""
    out = codes_sub[rows].copy()
    out[n_mask[rows]] = 4
    return out
