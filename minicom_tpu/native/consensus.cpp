// Native segmented majority-vote consensus (the host twin of
// ops/consensus.py's device kernels — reference semantics: construct_ref,
// kthread_bucket.c:69-377).
//
// On a single host driving ONE tunneled chip, XLA's scatter-add lowering
// costs ~2s per 1M-member pass; the same counting here is a cluster-
// partitioned loop with no atomics (members arrive sorted by segment and
// each segment owns a disjoint column range, so threads split at segment
// boundaries). Ties in the argmax resolve to the LOWEST base code — exactly
// the device kernel's jnp.argmax rule — so both paths emit identical
// consensus bytes and the archive does not depend on which one ran.
//
// Memory: counting uses a PER-THREAD scratch table sized to the largest
// single segment the thread processes (grown geometrically), NOT a
// span*16-byte global table — peak scratch is O(threads * max_contig_span)
// regardless of how many segments a pass carries, so an SRR-scale first
// round (hundreds of millions of consensus columns) costs megabytes, not
// gigabytes.
//
// consensus_host:
//   codes  [N, L] uint8 base codes (0..3; N already substituted)
//   rid2d  [M] int32 = rid*2 + dir   (dir 1 = reverse complement)
//   col    [M] int64 member start column in the flat span
//   segptr [C+1] int64 member ranges per segment (sorted)
//   colptr [C+1] int64 column ranges per segment
//   out_ref [span] uint8, out_diffs [M] int32 (mismatches vs consensus)
//   want = 1: ref only, 2: diffs only, 3: both (diffs always need the ref;
//   "ref only" skips the diff pass).

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

void consensus_host(const uint8_t* codes, int64_t N, int64_t L,
                    const int32_t* rid2d, const int64_t* col, int64_t M,
                    const int64_t* segptr, const int64_t* colptr, int64_t C,
                    int64_t span, int want,
                    uint8_t* out_ref, int32_t* out_diffs) {
    (void)N;
    (void)M;
    (void)span;

#ifdef _OPENMP
#pragma omp parallel
#endif
    {
#ifdef _OPENMP
        int nt = omp_get_num_threads();
        int t = omp_get_thread_num();
#else
        int nt = 1, t = 0;
#endif
        // split SEGMENTS (not members) across threads: each segment's
        // columns are disjoint, so counting needs no atomics; the scratch
        // count table is per-thread and sized to one segment at a time
        std::vector<uint32_t> counts;
        int64_t c0 = C * t / nt, c1 = C * (t + 1) / nt;
        for (int64_t c = c0; c < c1; ++c) {
            const int64_t cbase = colptr[c];
            const int64_t cspan = colptr[c + 1] - cbase;
            if (cspan <= 0) continue;
            if ((int64_t)counts.size() < cspan * 4)
                counts.resize((size_t)cspan * 4);
            std::memset(counts.data(), 0, (size_t)cspan * 4 * sizeof(uint32_t));
            for (int64_t m = segptr[c]; m < segptr[c + 1]; ++m) {
                const uint8_t* r = codes + (int64_t)(rid2d[m] >> 1) * L;
                uint32_t* cnt = counts.data() + (size_t)(col[m] - cbase) * 4;
                if (rid2d[m] & 1) {       // reverse complement
                    for (int64_t j = 0; j < L; ++j)
                        ++cnt[j * 4 + (3 - r[L - 1 - j])];
                } else {
                    for (int64_t j = 0; j < L; ++j)
                        ++cnt[j * 4 + r[j]];
                }
            }
            // consensus for this segment's columns (ties -> lowest code)
            uint8_t* ref = out_ref + cbase;
            for (int64_t p = 0; p < cspan; ++p) {
                const uint32_t* cnt = counts.data() + (size_t)p * 4;
                uint8_t best = 0;
                uint32_t bv = cnt[0];
                for (uint8_t b = 1; b < 4; ++b)
                    if (cnt[b] > bv) { bv = cnt[b]; best = b; }
                ref[p] = best;
            }
            if (want & 2) {
                for (int64_t m = segptr[c]; m < segptr[c + 1]; ++m) {
                    const uint8_t* r = codes + (int64_t)(rid2d[m] >> 1) * L;
                    const uint8_t* rf = out_ref + col[m];
                    int32_t d = 0;
                    if (rid2d[m] & 1) {
                        for (int64_t j = 0; j < L; ++j)
                            d += rf[j] != (uint8_t)(3 - r[L - 1 - j]);
                    } else {
                        for (int64_t j = 0; j < L; ++j)
                            d += rf[j] != r[j];
                    }
                    out_diffs[m] = d;
                }
            }
        }
    }
}

}  // extern "C"
