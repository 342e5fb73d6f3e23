// Native realignment probe core (reference hot loop 6:
// realign_hash_search, kthread_hash_realign.c:316-508).
//
// For every contig offset, probes each substring-key dictionary forward and
// reverse-complement, verifies candidates by XOR-popcount over 2-bit-packed
// words (basediff, bbhashdict.c:247-254) against the threshold, and applies
// the encode-cost <= 0.4*L rule (encode_byte, kthread_hash_realign.c:283-314;
// on the rc path only when threshold > 24, :461). Dictionaries are
// open-addressing hash tables over the sorted singleton keys (key ->
// CSR slice of singleton ids) — the deterministic replacement for BooPHF +
// lock-striped deletion, with O(1) membership for the ~99% of window probes
// that miss.
//
// The window scan is incremental: the packed forward/rc window words roll by
// one base per offset (O(W) updates instead of O(L) repacking), and each
// dictionary key is extracted from the packed words with two shifts.
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

// 2*seg_len bits of the packed window starting at base ds (seg_len <= 31, so
// the key spans at most two words). words must have one zero guard word.
inline uint64_t extract_key(const uint64_t* words, int ds, int seg_len) {
    int shift = 2 * (ds & 31);
    uint64_t key = words[ds >> 5] >> shift;
    if (shift) key |= words[(ds >> 5) + 1] << (64 - shift);
    return key & ((seg_len < 32) ? ((1ULL << (2 * seg_len)) - 1) : ~0ULL);
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

inline uint64_t mix64(uint64_t x) {  // splitmix64 finalizer
    x += 0x9E3779B97F4A7C15ULL;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
    return x ^ (x >> 31);
}

// Open-addressing map key -> (start, count) into the sorted (key, idx) table,
// fronted by a compact block-Bloom filter: ~99% of window probes miss, and a
// miss that resolves in the small filter (one cache line, two bits of one
// 64-bit word) avoids touching the much larger key table entirely — the
// probe scan is memory-latency-bound on the miss path (VERDICT r03 item 1).
struct KeyMap {
    std::vector<uint64_t> keys;       // EMPTY = sentinel
    std::vector<uint64_t> slot;       // start << 24 | count (count capped)
    std::vector<uint64_t> bloom;      // 2 bits/key, ~16x n bits total
    uint64_t mask = 0;
    uint64_t bmask = 0;
    static constexpr uint64_t EMPTY = ~0ULL;

    void build(const std::vector<std::pair<uint64_t, uint32_t>>& tab) {
        size_t cap = 16;
        while (cap < tab.size() * 2 + 16) cap <<= 1;
        keys.assign(cap, EMPTY);
        slot.assign(cap, 0);
        mask = cap - 1;
        size_t bw = 1024;  // >= 16 bits/key keeps the false-pass rate ~1-2%
        while (bw * 64 < tab.size() * 16) bw <<= 1;
        bloom.assign(bw, 0);
        bmask = bw - 1;
        size_t i = 0;
        while (i < tab.size()) {
            size_t j = i;
            while (j < tab.size() && tab[j].first == tab[i].first) ++j;
            uint64_t k = tab[i].first;
            uint64_t hv = mix64(k);
            uint64_t h = hv & mask;
            while (keys[h] != EMPTY) h = (h + 1) & mask;
            keys[h] = k;
            uint64_t cnt = j - i;
            if (cnt > 0xFFFFFF) cnt = 0xFFFFFF;  // callers cap at max_search
            slot[h] = ((uint64_t)i << 24) | cnt;
            bloom[(hv >> 24) & bmask] |=
                (1ULL << (hv & 63)) | (1ULL << ((hv >> 6) & 63));
            i = j;
        }
    }
    inline uint64_t bloom_word_idx(uint64_t hv) const {
        return (hv >> 24) & bmask;
    }
    inline bool bloom_pass(uint64_t hv) const {
        uint64_t w = bloom[(hv >> 24) & bmask];
        return ((w >> (hv & 63)) & 1) && ((w >> ((hv >> 6) & 63)) & 1);
    }
    // returns count, sets *start; 0 on miss. hv = mix64(key).
    inline uint32_t find(uint64_t k, uint64_t hv, uint32_t* start) const {
        uint64_t h = hv & mask;
        while (true) {
            uint64_t kk = keys[h];
            if (kk == k) {
                uint64_t s = slot[h];
                *start = (uint32_t)(s >> 24);
                return (uint32_t)(s & 0xFFFFFF);
            }
            if (kk == EMPTY) return 0;
            h = (h + 1) & mask;
        }
    }
};

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
    const uint64_t top_mask =
        (L & 31) ? ((1ULL << (2 * (L & 31))) - 1) : ~0ULL;
    if (n_dicts > 32) return -1;  // config caps at L/11 <= 23 (readlen <= 256)

    // pack singleton reads once
    std::vector<uint64_t> sg_words((size_t)n_sg * W);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n_sg; ++i)
        pack_words(sg_codes + i * L, L, sg_words.data() + i * W);

    // sorted-key tables + hash maps: per dict, (key, sg_idx) sorted by key
    std::vector<std::vector<std::pair<uint64_t, uint32_t>>> dicts(n_dicts);
    std::vector<KeyMap> maps(n_dicts);
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
        maps[d].build(tab);
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
        // +1 guard word for extract_key
        std::vector<uint64_t> win_words(W + 1, 0), rc_words(W + 1, 0);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 16)
#endif
        for (int64_t c = 0; c < n_contigs; ++c) {
            auto& out = per_contig[c];
            const uint8_t* ref = ref_flat + ref_ptr[c];
            int64_t clen = ref_ptr[c + 1] - ref_ptr[c];
            if (clen < L) continue;
            for (int64_t jj = 0; jj + L <= clen; ++jj) {
                const uint8_t* win = ref + jj;
                if (jj == 0) {
                    // initial pack; rc lazily materialized only on a hit
                    pack_words(win, L, win_words.data());
                    win_words[W] = 0;
                    for (int64_t i = 0; i < L; ++i) rc[i] = 3 - win[L - 1 - i];
                    pack_words(rc.data(), L, rc_words.data());
                    rc_words[W] = 0;
                } else {
                    // roll forward window: drop base 0, append base L-1
                    for (int64_t w = 0; w < W - 1; ++w)
                        win_words[w] = (win_words[w] >> 2) |
                                       (win_words[w + 1] << 62);
                    win_words[W - 1] >>= 2;
                    uint64_t nb = win[L - 1];
                    win_words[(L - 1) >> 5] |= nb << (2 * ((L - 1) & 31));
                    // rc window: drop LAST base, prepend complement of new
                    for (int64_t w = W - 1; w > 0; --w)
                        rc_words[w] = (rc_words[w] << 2) |
                                      (rc_words[w - 1] >> 62);
                    rc_words[0] = (rc_words[0] << 2) | (nb ^ 3ULL);
                    rc_words[W - 1] &= top_mask;
                }

                // phase 1: all 2*n_dicts keys + hashes, prefetch the Bloom
                // words — the filter tests then overlap their cache misses
                uint64_t pk[2 * 32], ph[2 * 32];
                for (int strand = 0; strand < 2; ++strand) {
                    const uint64_t* qw =
                        strand ? rc_words.data() : win_words.data();
                    for (int32_t d = 0; d < n_dicts; ++d) {
                        uint64_t key = extract_key(qw, dict_start[d], seg_len);
                        uint64_t hv = mix64(key);
                        pk[strand * n_dicts + d] = key;
                        ph[strand * n_dicts + d] = hv;
                        __builtin_prefetch(
                            &maps[d].bloom[maps[d].bloom_word_idx(hv)]);
                    }
                }
                for (int strand = 0; strand < 2; ++strand) {
                    const uint64_t* qw =
                        strand ? rc_words.data() : win_words.data();
                    for (int32_t d = 0; d < n_dicts; ++d) {
                        uint64_t key = pk[strand * n_dicts + d];
                        uint64_t hv = ph[strand * n_dicts + d];
                        if (!maps[d].bloom_pass(hv)) continue;
                        uint32_t start, cnt;
                        cnt = maps[d].find(key, hv, &start);
                        if (!cnt) continue;
                        if ((int32_t)cnt > max_search) cnt = max_search;
                        auto& tab = dicts[d];
                        for (uint32_t r = 0; r < cnt; ++r) {
                            uint32_t sgi = tab[start + r].second;
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
                                // rc window as codes for the cost check
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


// match_pro overlap scoring for the merge stage (kthread_cb.c:36-52):
// mismatches of contig b shifted by d into contig a's coordinates over the
// full overlap, early-exited at cap+1.
extern "C" void score_overlaps(const uint8_t* ref_flat, const int64_t* ref_ptr,
                    const int64_t* a, const int64_t* b, const int64_t* d,
                    int64_t n, int32_t cap, int32_t* out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) {
        int64_t la = ref_ptr[a[i] + 1] - ref_ptr[a[i]];
        int64_t lb = ref_ptr[b[i] + 1] - ref_ptr[b[i]];
        int64_t lo = d[i] > 0 ? d[i] : 0;
        int64_t hi = la < d[i] + lb ? la : d[i] + lb;
        if (hi <= lo) { out[i] = cap + 1; continue; }
        const uint8_t* pa = ref_flat + ref_ptr[a[i]] + lo;
        const uint8_t* pb = ref_flat + ref_ptr[b[i]] + lo - d[i];
        int32_t s = 0;
        int64_t len = hi - lo;
        for (int64_t j = 0; j < len; ++j) {
            s += pa[j] != pb[j];
            if (s > cap) { s = cap + 1; break; }
        }
        out[i] = s;
    }
}

extern "C" void set_num_threads(int n) {
#ifdef _OPENMP
    if (n > 0) omp_set_num_threads(n);
#endif
    (void)n;
}
