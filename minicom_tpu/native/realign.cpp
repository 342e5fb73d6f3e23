// Native realignment probe core (reference hot loop 6:
// realign_hash_search, kthread_hash_realign.c:316-508).
//
// For every contig offset, probes each substring-key dictionary forward and
// reverse-complement, verifies candidates by XOR-popcount over 2-bit-packed
// words (basediff, bbhashdict.c:247-254) against the threshold, and applies
// the encode-cost <= 0.4*L rule (encode_byte, kthread_hash_realign.c:283-314;
// on the rc path only when threshold > 24, :461). Dictionaries are sorted-key
// gather tables (keys sorted with their singleton index; lookup = binary
// search) — the deterministic replacement for BooPHF + lock-striped deletion.
//
// Single deterministic pass: candidates are emitted in (window, dict, strand,
// table-rank) order; the Python side picks one winner per read.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline uint64_t pack_window(const uint8_t* codes, int len) {
    uint64_t key = 0;
    for (int i = 0; i < len; ++i) key |= (uint64_t)codes[i] << (2 * i);
    return key;
}

inline void pack_words(const uint8_t* codes, int64_t L, uint64_t* words) {
    int64_t W = (L + 31) / 32;
    for (int64_t w = 0; w < W; ++w) words[w] = 0;
    for (int64_t i = 0; i < L; ++i)
        words[i >> 5] |= (uint64_t)codes[i] << (2 * (i & 31));
}

inline int popcount_xor(const uint64_t* a, const uint64_t* b, int64_t W) {
    int c = 0;
    for (int64_t w = 0; w < W; ++w) c += __builtin_popcountll(a[w] ^ b[w]);
    return c;
}

// diff-string encoded length, cluster rule (run >= 2 -> digits), vs capped
// early exit once the 0.4*L budget is exceeded.
inline bool encode_cost_ok(const uint8_t* ref_win, const uint8_t* read,
                           int64_t L, int64_t budget) {
    int64_t total = 0, eq = 0;
    for (int64_t i = 0; i < L; ++i) {
        if (ref_win[i] != read[i]) {
            if (eq >= 2) {
                int64_t q = eq;
                do { ++total; q /= 10; } while (q);
            } else {
                total += eq;
            }
            eq = 0;
            ++total;
            if (total > budget) return false;
        } else {
            ++eq;
        }
    }
    if (total == 0) total = 1;
    return total <= budget;
}

}  // namespace

extern "C" {

// Returns number of candidates written (clipped at out_cap; if the return
// value equals out_cap the caller should retry with a larger buffer).
int64_t realign_probe(
    const uint8_t* ref_flat,      // contig consensus codes, flat
    const int64_t* ref_ptr,       // [n_contigs + 1]
    int64_t n_contigs,
    const uint8_t* sg_codes,      // [n_sg, L] singleton codes (N substituted)
    int64_t n_sg, int64_t L,
    const int32_t* dict_start,    // [n_dicts] window starts
    int32_t seg_len,              // bases per dictionary key (<= 31)
    int32_t n_dicts,
    int32_t thr, int32_t max_search, int32_t rc_skip_cost,  // thr <= 24
    int32_t* out_sg, int32_t* out_contig, int32_t* out_off,
    int8_t* out_dir, int32_t* out_pop, int64_t out_cap) {

    const int64_t W = (L + 31) / 32;

    // pack singleton reads once
    std::vector<uint64_t> sg_words((size_t)n_sg * W);
    for (int64_t i = 0; i < n_sg; ++i)
        pack_words(sg_codes + i * L, L, sg_words.data() + i * W);

    // sorted-key tables: per dict, (key, sg_idx) sorted by key then idx
    std::vector<std::vector<std::pair<uint64_t, uint32_t>>> dicts(n_dicts);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int32_t d = 0; d < n_dicts; ++d) {
        auto& tab = dicts[d];
        tab.resize(n_sg);
        for (int64_t i = 0; i < n_sg; ++i)
            tab[i] = {pack_window(sg_codes + i * L + dict_start[d], seg_len),
                      (uint32_t)i};
        std::sort(tab.begin(), tab.end());
    }

    const int64_t cost_budget = (int64_t)(0.4 * L);

    // Parallel over contigs with per-contig result buffers, concatenated in
    // contig order afterwards: the output is byte-identical to the serial
    // (contig, offset, strand, dict, table-rank) scan — thread count never
    // changes the archive (unlike the reference's trylock races).
    struct Cand { int32_t sg, off; int32_t pop; int8_t dir; };
    std::vector<std::vector<Cand>> per_contig(n_contigs);

#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<uint8_t> rc(L), rc_read(L);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 16)
#endif
        for (int64_t c = 0; c < n_contigs; ++c) {
            auto& out = per_contig[c];
            const uint8_t* ref = ref_flat + ref_ptr[c];
            int64_t clen = ref_ptr[c + 1] - ref_ptr[c];
            for (int64_t jj = 0; jj + L <= clen; ++jj) {
                const uint8_t* win = ref + jj;
                // reverse complement of the window
                for (int64_t i = 0; i < L; ++i) rc[i] = 3 - win[L - 1 - i];
                uint64_t win_words[8], rc_words[8];
                pack_words(win, L, win_words);
                pack_words(rc.data(), L, rc_words);

                for (int strand = 0; strand < 2; ++strand) {
                    const uint8_t* q = strand ? rc.data() : win;
                    const uint64_t* qw = strand ? rc_words : win_words;
                    for (int32_t d = 0; d < n_dicts; ++d) {
                        uint64_t key = pack_window(q + dict_start[d], seg_len);
                        auto& tab = dicts[d];
                        auto lo = std::lower_bound(
                            tab.begin(), tab.end(),
                            std::make_pair(key, (uint32_t)0));
                        int32_t scanned = 0;
                        for (auto it = lo;
                             it != tab.end() && it->first == key &&
                             scanned < max_search; ++it, ++scanned) {
                            uint32_t sgi = it->second;
                            int pop = popcount_xor(
                                qw, sg_words.data() + (size_t)sgi * W, W);
                            if (pop > thr) continue;
                            // cost rule compares the ORIENTED READ against the
                            // window (encode_byte semantics): fwd -> read vs
                            // window; rc -> rc(read) vs window (only when the
                            // threshold exceeds 24).
                            if (strand == 0) {
                                if (!encode_cost_ok(
                                        win, sg_codes + (size_t)sgi * L,
                                        L, cost_budget))
                                    continue;
                            } else if (!rc_skip_cost) {
                                const uint8_t* rd = sg_codes + (size_t)sgi * L;
                                for (int64_t i = 0; i < L; ++i)
                                    rc_read[i] = 3 - rd[L - 1 - i];
                                if (!encode_cost_ok(win, rc_read.data(), L,
                                                    cost_budget))
                                    continue;
                            }
                            out.push_back({(int32_t)sgi, (int32_t)jj,
                                           pop, (int8_t)strand});
                        }
                    }
                }
            }
        }
    }

    int64_t n_out = 0;
    for (int64_t c = 0; c < n_contigs; ++c) {
        for (const Cand& cd : per_contig[c]) {
            if (n_out < out_cap) {
                out_sg[n_out] = cd.sg;
                out_contig[n_out] = (int32_t)c;
                out_off[n_out] = cd.off;
                out_dir[n_out] = cd.dir;
                out_pop[n_out] = cd.pop;
            }
            ++n_out;
            if (n_out >= out_cap) return out_cap;
        }
    }
    return n_out;
}

}  // extern "C"
