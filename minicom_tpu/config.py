"""Runtime configuration — replaces the reference's compile-time config codegen.

The reference bakes read length, thread count and all tuning knobs into
`src/config.h` and recompiles the binary per input (`minicom:56-104`,
`install.sh:17-28`). Here everything is a runtime dataclass; read length is a
runtime (padded) dimension.

Default/derived values mirror `src/minicommain.c:81-216` and
`src/preprocess.c:89-107`, `src/kthread_hash_realign.c:142-239`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class CompressorConfig:
    """Full parameter surface of the reference CLI (`minicom:436-478`).

    Attributes map to flags: k=-k, diff_threshold=-e, first_minimizers=-m,
    contig_window=-w, num_dicts=-s, thr_step=-S, max_threshold=-E,
    cb_threshold=-g, max_rounds=-R, order=-p, threads=-t.
    """

    # user-facing knobs (0 / None = "use derived default")
    k: int = 0                      # minimizer k-mer size           (-k)
    diff_threshold: int = 4         # per-read mismatch budget e     (-e)
    first_minimizers: int = 6       # contig minimizers indexed m    (-m)
    contig_window: int = 0          # (w,k) window for contigs       (-w)
    num_dicts: int = 0              # realign dictionaries s         (-s)
    thr_step: int = 0               # realign threshold step S       (-S)
    max_threshold: int = 0          # realign threshold cap E        (-E)
    cb_threshold: int = 0           # contig-merge mismatch cap g    (-g)
    max_rounds: int = 35            # clustering rounds cap R        (-R)
    order: bool = False             # order-preserving mode          (-p)
    paired: bool = False            # paired-end mode                (-1/-2)
    threads: int = 0                # host worker threads            (-t); 0 = auto

    # fixed internals (minicommain.c:77; preprocess.c:169-172). The
    # reference's 2^b bucket space and maxmatch shift table have no analogue
    # here: grouping is one global sort and the realign search uses only the
    # zero-shift window (the reference itself only ever probes shift 0,
    # kthread_hash_realign.c:360), so neither is a config knob.
    max_search: int = 500           # realign candidates scanned per probe

    # contig-merge fidelity/breadth knobs. merge_revote=True rebuilds each
    # merged contig's consensus by re-voting ALL members (the reference's
    # construct_ref2, kthread_cb.c:105-218); False splices the two old
    # consensus strings with a coverage vote (faster, ~0.3% larger archives).
    # merge_rank_cap / merge_probe_cap bound minimizers probed per contig and
    # index hits walked per probe (0 = auto defaults; the reference bounds
    # neither, kthread_cb.c:267-274 — drops are counted in the run summary).
    merge_revote: bool = True
    merge_rank_cap: int = 0
    merge_probe_cap: int = 0

    # entropy backend: "auto" (best per stream) | "xz" | "o1rc" | "o2rc"
    # | "dnarc" | "trans" (on-chip rANS) | "bz2" | "zlib" | "store"
    codec: str = "auto"

    # stage checkpoint/resume directory (None = off). Reruns with the same
    # input + parameters resume from the newest completed stage snapshot.
    checkpoint_dir: Optional[str] = None

    # ------------------------------------------------------------------
    def resolve(self, readlen: int, n_singletons: Optional[int] = None) -> "ResolvedConfig":
        """Apply the reference's derived-default rules for a concrete read length.

        Mirrors minicommain.c:92-143 (k, e, g, S, E defaults),
        preprocess.c:89-107 (contig window rw), kthread_hash_realign.c:153-171
        (numdict_s), preprocess.c:169-172 (maxmatch/maxsearch widening).
        """
        if readlen < 1 or readlen > 256:
            raise ValueError(f"read length {readlen} out of supported range [1, 256]")

        k = self.k if self.k > 0 else (31 if readlen >= 80 else 17)
        if k > min(31, readlen):
            k = min(31, readlen)
        e = self.diff_threshold
        g = self.cb_threshold if self.cb_threshold > 0 else 2 * e
        step = self.thr_step if self.thr_step > 0 else (5 if e > 10 else e)
        max_thr = self.max_threshold if self.max_threshold > 0 else readlen // 2
        m = self.first_minimizers

        if self.contig_window > 0:
            rw = self.contig_window
        elif readlen >= 70:
            rw = max(1, readlen // 2 - k)
        else:
            rw = 3

        seg_len = 17 if readlen > 80 else 11
        num_dicts = max(1, readlen // seg_len)
        centered = False
        if 1 < self.num_dicts < num_dicts:
            num_dicts = self.num_dicts
            centered = True  # user-shrunk dicts are centered (kthread_hash_realign.c:197-201)

        max_search = self.max_search
        if n_singletons is not None and n_singletons <= 5_000_000:
            max_search = 2000   # widened search (preprocess.c:169-172)

        return ResolvedConfig(
            readlen=readlen, k=k, diff_threshold=e, cb_threshold=g,
            thr_step=step, max_threshold=max_thr, first_minimizers=m,
            contig_window=rw, num_dicts=num_dicts, dict_seg_len=seg_len,
            dicts_centered=centered, max_rounds=self.max_rounds,
            max_search=max_search, order=self.order, paired=self.paired,
            threads=self.threads, codec=self.codec,
            merge_revote=self.merge_revote,
            merge_rank_cap=self.merge_rank_cap or 128,
            merge_probe_cap=self.merge_probe_cap or 64,
        )


@dataclasses.dataclass(frozen=True)
class ResolvedConfig:
    """All knobs concrete for one input (read length known)."""

    readlen: int
    k: int
    diff_threshold: int
    cb_threshold: int
    thr_step: int
    max_threshold: int
    first_minimizers: int
    contig_window: int
    num_dicts: int
    dict_seg_len: int
    dicts_centered: bool
    max_rounds: int
    max_search: int
    threads: int
    order: bool
    paired: bool
    codec: str
    merge_revote: bool = True
    merge_rank_cap: int = 128
    merge_probe_cap: int = 64

    def dict_ranges(self) -> list[tuple[int, int]]:
        """[start, end] (inclusive) base ranges of the realign key dictionaries.

        Contiguous windows of dict_seg_len bases (kthread_hash_realign.c:197-206);
        centered in the read when the user shrank the dict count.
        """
        start0 = 0
        if self.dicts_centered:
            start0 = self.readlen // 2 - (self.dict_seg_len * self.num_dicts) // 2
        out = []
        s = start0
        for _ in range(self.num_dicts):
            out.append((s, s + self.dict_seg_len - 1))
            s += self.dict_seg_len
        return out
