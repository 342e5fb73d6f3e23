// Native codecs for minicom_tpu: diff-string encode/decode.
//
// Reimplements the reference's textual diff codec exactly
// (print_encode, kthread_dump.c:198-220 — cluster rule: match-run >= 2 emits
// decimal digits, run <= 1 emits the matched char(s) literally; AA/TT/NN rule,
// kthread_dump.c:580-596 — any match-run >= 1 emits digits; empty diff = "0";
// decoder: decompress.c:567-590). Exposed with a plain C ABI for ctypes.
//
// Encode parallelizes over rows with a two-pass (lengths -> prefix offsets ->
// write) scheme; decode indexes the newlines first, then decodes rows in
// parallel. Output bytes are identical for any thread count.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC ... -o _native.so

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline int64_t row_encoded_len(const uint8_t* rf, const uint8_t* rd,
                               int64_t len, int run_min) {
    int64_t total = 0, eq = 0;
    for (int64_t i = 0; i < len; ++i) {
        if (rf[i] != rd[i]) {
            if (eq >= run_min) {
                int64_t q = eq, d = 0;
                do { ++d; q /= 10; } while (q);
                total += d;
            } else {
                total += eq;
            }
            eq = 0;
            ++total;
        } else {
            ++eq;
        }
    }
    return total == 0 ? 1 : total;
}

inline uint8_t* encode_row(const uint8_t* rf, const uint8_t* rd, int64_t len,
                           int run_min, uint8_t* o) {
    uint8_t* row_start = o;
    int64_t eq = 0;
    for (int64_t i = 0; i < len; ++i) {
        if (rf[i] != rd[i]) {
            if (eq >= run_min) {
                char buf[12];
                int n = snprintf(buf, sizeof buf, "%lld", (long long)eq);
                memcpy(o, buf, n);
                o += n;
            } else {
                for (int64_t j = i - eq; j < i; ++j) *o++ = rd[j];
            }
            eq = 0;
            *o++ = rd[i];
        } else {
            ++eq;
        }
    }
    if (o == row_start) *o++ = '0';
    *o++ = '\n';
    return o;
}

}  // namespace

extern "C" {

// rows encoded against per-row refs; rule: 0 = cluster (run>=2 -> digits),
// 1 = aattnn (run>=1 -> digits). Returns bytes written to out ('\n' after
// each row). out must hold at least n_rows * (len + 12) bytes.
int64_t diff_encode(const uint8_t* ref, const uint8_t* read,
                    int64_t n_rows, int64_t len, int rule, uint8_t* out) {
    const int run_min = rule == 0 ? 2 : 1;
    std::vector<int64_t> off(n_rows + 1);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t r = 0; r < n_rows; ++r)
        off[r + 1] = row_encoded_len(ref + r * len, read + r * len,
                                     len, run_min) + 1;  // + '\n'
    off[0] = 0;
    for (int64_t r = 0; r < n_rows; ++r) off[r + 1] += off[r];
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t r = 0; r < n_rows; ++r)
        encode_row(ref + r * len, read + r * len, len, run_min, out + off[r]);
    return off[n_rows];
}

// Decode n_rows diff lines ('\n'-separated) against per-row refs into read
// rows. Returns number of rows decoded (== n_rows on success, < 0 on error).
int64_t diff_decode(const uint8_t* text, int64_t text_len,
                    const uint8_t* ref, int64_t n_rows, int64_t len,
                    uint8_t* out) {
    // index the line starts once (memchr scan), then decode rows in parallel
    std::vector<const uint8_t*> starts(n_rows + 1);
    const uint8_t* p = text;
    const uint8_t* end = text + text_len;
    for (int64_t r = 0; r < n_rows; ++r) {
        starts[r] = p;
        const uint8_t* nl =
            (const uint8_t*)memchr(p, '\n', (size_t)(end - p));
        p = nl ? nl + 1 : end;
    }
    starts[n_rows] = p;

    int64_t bad = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t r = 0; r < n_rows; ++r) {
        const uint8_t* q = starts[r];
        const uint8_t* qe = starts[r + 1];
        const uint8_t* rf = ref + r * len;
        uint8_t* rd = out + r * len;
        int64_t pos = 0;
        int64_t eq = 0;
        while (q < qe && *q != '\n') {
            uint8_t c = *q++;
            if (c >= 'A' && c <= 'Z') {
                while (eq > 0 && pos < len) { rd[pos] = rf[pos]; ++pos; --eq; }
                if (pos < len) rd[pos++] = c;
            } else if (c >= '0' && c <= '9') {
                eq = eq * 10 + (c - '0');
            } else {
#ifdef _OPENMP
#pragma omp critical
#endif
                { if (!bad || r + 1 < bad) bad = r + 1; }  // lowest row: deterministic errors
                break;
            }
        }
        while (pos < len) { rd[pos] = rf[pos]; ++pos; }
    }
    return bad ? -bad : n_rows;
}

// Windowed variants working directly on BASE CODES (0..4): the ref window of
// row r starts at ref_codes + win_base[r] in the flat consensus stream, the
// read row is reverse-complemented in place when dirs[r] == 1, and both are
// mapped to ASCII on the fly — replacing three full-matrix host passes
// (gather, orient, code->ASCII) per serialize/decode call.

static const char CODE2ASCII[5] = {'A', 'C', 'G', 'T', 'N'};

int64_t diff_encode_win(const uint8_t* ref_codes, const int64_t* win_base,
                        const uint8_t* read_codes, const int8_t* dirs,
                        int64_t n_rows, int64_t len, int rule, uint8_t* out) {
    const int run_min = rule == 0 ? 2 : 1;
    std::vector<int64_t> off(n_rows + 1);
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<uint8_t> rf(len), rd(len);
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
        for (int64_t r = 0; r < n_rows; ++r) {
            const uint8_t* w = ref_codes + win_base[r];
            const uint8_t* rr = read_codes + r * len;
            for (int64_t i = 0; i < len; ++i) rf[i] = CODE2ASCII[w[i]];
            if (dirs && dirs[r]) {
                for (int64_t i = 0; i < len; ++i) {
                    uint8_t c = rr[len - 1 - i];
                    rd[i] = CODE2ASCII[c < 4 ? 3 - c : c];
                }
            } else {
                for (int64_t i = 0; i < len; ++i) rd[i] = CODE2ASCII[rr[i]];
            }
            off[r + 1] =
                row_encoded_len(rf.data(), rd.data(), len, run_min) + 1;
        }
    }
    off[0] = 0;
    for (int64_t r = 0; r < n_rows; ++r) off[r + 1] += off[r];
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<uint8_t> rf(len), rd(len);
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
        for (int64_t r = 0; r < n_rows; ++r) {
            const uint8_t* w = ref_codes + win_base[r];
            const uint8_t* rr = read_codes + r * len;
            for (int64_t i = 0; i < len; ++i) rf[i] = CODE2ASCII[w[i]];
            if (dirs && dirs[r]) {
                for (int64_t i = 0; i < len; ++i) {
                    uint8_t c = rr[len - 1 - i];
                    rd[i] = CODE2ASCII[c < 4 ? 3 - c : c];
                }
            } else {
                for (int64_t i = 0; i < len; ++i) rd[i] = CODE2ASCII[rr[i]];
            }
            encode_row(rf.data(), rd.data(), len, run_min, out + off[r]);
        }
    }
    return off[n_rows];
}

// Windowed decode: diff lines + flat ref codes -> ASCII read rows, applying
// the reverse complement where dirs[r] == 1 (decompress.c:573-602 semantics).
int64_t diff_decode_win(const uint8_t* text, int64_t text_len,
                        const uint8_t* ref_codes, const int64_t* win_base,
                        const int8_t* dirs, int64_t n_rows, int64_t len,
                        uint8_t* out) {
    std::vector<const uint8_t*> starts(n_rows + 1);
    const uint8_t* p = text;
    const uint8_t* end = text + text_len;
    for (int64_t r = 0; r < n_rows; ++r) {
        starts[r] = p;
        const uint8_t* nl =
            (const uint8_t*)memchr(p, '\n', (size_t)(end - p));
        p = nl ? nl + 1 : end;
    }
    starts[n_rows] = p;

    int64_t bad = 0;
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<uint8_t> rf(len), row(len);
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
        for (int64_t r = 0; r < n_rows; ++r) {
            const uint8_t* w = ref_codes + win_base[r];
            for (int64_t i = 0; i < len; ++i) rf[i] = CODE2ASCII[w[i]];
            const uint8_t* q = starts[r];
            const uint8_t* qe = starts[r + 1];
            uint8_t* rd = row.data();
            int64_t pos = 0, eq = 0;
            while (q < qe && *q != '\n') {
                uint8_t c = *q++;
                if (c >= 'A' && c <= 'Z') {
                    while (eq > 0 && pos < len) {
                        rd[pos] = rf[pos]; ++pos; --eq;
                    }
                    if (pos < len) rd[pos++] = c;
                } else if (c >= '0' && c <= '9') {
                    eq = eq * 10 + (c - '0');
                } else {
#ifdef _OPENMP
#pragma omp critical
#endif
                    { if (!bad || r + 1 < bad) bad = r + 1; }  // lowest row: deterministic errors
                    break;
                }
            }
            while (pos < len) { rd[pos] = rf[pos]; ++pos; }
            uint8_t* o = out + r * len;
            if (dirs && dirs[r]) {
                for (int64_t i = 0; i < len; ++i) {
                    uint8_t c = rd[len - 1 - i];
                    o[i] = c == 'A' ? 'T' : c == 'C' ? 'G'
                         : c == 'G' ? 'C' : c == 'T' ? 'A' : c;
                }
            } else {
                memcpy(o, rd, len);
            }
        }
    }
    return bad ? -bad : n_rows;
}

// Encoded length per row without materializing (used for the 0.4*L accept
// rule in realignment, encode_byte, kthread_hash_realign.c:283-314).
void diff_encode_lengths(const uint8_t* ref, const uint8_t* read,
                         int64_t n_rows, int64_t len, int rule,
                         int32_t* out_lens) {
    const int run_min = rule == 0 ? 2 : 1;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t r = 0; r < n_rows; ++r)
        out_lens[r] = (int32_t)row_encoded_len(ref + r * len, read + r * len,
                                               len, run_min);
}

}  // extern "C"
