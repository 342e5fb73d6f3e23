// Native codecs for minicom_tpu: diff-string encode/decode.
//
// Reimplements the reference's textual diff codec exactly
// (print_encode, kthread_dump.c:198-220 — cluster rule: match-run >= 2 emits
// decimal digits, run <= 1 emits the matched char(s) literally; AA/TT/NN rule,
// kthread_dump.c:580-596 — any match-run >= 1 emits digits; empty diff = "0";
// decoder: decompress.c:567-590). Exposed with a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC diffcodec.cpp -o _native.so

#include <cstdint>
#include <cstring>
#include <cstdio>

extern "C" {

// rows encoded against per-row refs; rule: 0 = cluster (run>=2 -> digits),
// 1 = aattnn (run>=1 -> digits). Returns bytes written to out ('\n' after
// each row). out must hold at least n_rows * (len + 12) bytes.
int64_t diff_encode(const uint8_t* ref, const uint8_t* read,
                    int64_t n_rows, int64_t len, int rule, uint8_t* out) {
    uint8_t* o = out;
    const int run_min = rule == 0 ? 2 : 1;
    for (int64_t r = 0; r < n_rows; ++r) {
        const uint8_t* rf = ref + r * len;
        const uint8_t* rd = read + r * len;
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
    }
    return o - out;
}

// Decode n_rows diff lines ('\n'-separated) against per-row refs into read
// rows. Returns number of rows decoded (== n_rows on success, < 0 on error).
int64_t diff_decode(const uint8_t* text, int64_t text_len,
                    const uint8_t* ref, int64_t n_rows, int64_t len,
                    uint8_t* out) {
    const uint8_t* p = text;
    const uint8_t* end = text + text_len;
    for (int64_t r = 0; r < n_rows; ++r) {
        const uint8_t* rf = ref + r * len;
        uint8_t* rd = out + r * len;
        int64_t pos = 0;
        int64_t eq = 0;
        while (p < end && *p != '\n') {
            uint8_t c = *p++;
            if (c >= 'A' && c <= 'Z') {
                while (eq > 0 && pos < len) { rd[pos] = rf[pos]; ++pos; --eq; }
                if (pos < len) rd[pos++] = c;
            } else if (c >= '0' && c <= '9') {
                eq = eq * 10 + (c - '0');
            } else {
                return -(r + 1);
            }
        }
        if (p < end) ++p;  // skip '\n'
        while (pos < len) { rd[pos] = rf[pos]; ++pos; }
    }
    return n_rows;
}

// Encoded length per row without materializing (used for the 0.4*L accept
// rule in realignment, encode_byte, kthread_hash_realign.c:283-314).
void diff_encode_lengths(const uint8_t* ref, const uint8_t* read,
                         int64_t n_rows, int64_t len, int rule,
                         int32_t* out_lens) {
    const int run_min = rule == 0 ? 2 : 1;
    for (int64_t r = 0; r < n_rows; ++r) {
        const uint8_t* rf = ref + r * len;
        const uint8_t* rd = read + r * len;
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
        out_lens[r] = (int32_t)(total == 0 ? 1 : total);
    }
}

}  // extern "C"
