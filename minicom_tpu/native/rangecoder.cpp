// Order-1 adaptive binary range coder — the in-process entropy backend that
// replaces the reference's external `bsc e -b64p -e2` subprocesses
// (minicom:115-148, SURVEY.md C23).
//
// Each byte is coded as 8 binary decisions through a 255-node bit tree whose
// context is the previous byte: 256 x 256 adaptive 12-bit probabilities.
// Carryless 32-bit range coder (LZMA-style renormalization). One pass,
// no tables in the stream, fully deterministic.
//
// Build together with diffcodec.cpp into _native.so (see native/__init__.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kTop = 1u << 24;
constexpr int kProbBits = 12;
constexpr uint16_t kProbInit = 1u << (kProbBits - 1);
constexpr int kMoveBits = 5;

struct Encoder {
    uint8_t* out;
    int64_t cap, n = 0;
    uint32_t range = 0xFFFFFFFFu;
    uint64_t low = 0;
    uint8_t cache = 0;
    int64_t cache_size = 1;

    explicit Encoder(uint8_t* o, int64_t c) : out(o), cap(c) {}

    void shift_low() {
        if ((uint32_t)(low >> 32) != 0 || (uint32_t)low < 0xFF000000u) {
            uint8_t carry = (uint8_t)(low >> 32);
            while (cache_size) {
                if (n < cap) out[n] = (uint8_t)(cache + carry);
                ++n;
                cache = 0xFF;
                --cache_size;
            }
            cache = (uint8_t)(low >> 24);
        }
        ++cache_size;
        low = (low << 8) & 0xFFFFFFFFu;
    }

    void encode(uint16_t* p, int bit) {
        uint32_t bound = (range >> kProbBits) * *p;
        if (!bit) {
            range = bound;
            *p += (uint16_t)(((1u << kProbBits) - *p) >> kMoveBits);
        } else {
            low += bound;
            range -= bound;
            *p -= (uint16_t)(*p >> kMoveBits);
        }
        while (range < kTop) { shift_low(); range <<= 8; }
    }

    void flush() { for (int i = 0; i < 5; ++i) shift_low(); }
};

struct Decoder {
    const uint8_t* in;
    int64_t len, pos = 0;
    uint32_t range = 0xFFFFFFFFu, code = 0;

    Decoder(const uint8_t* i, int64_t l) : in(i), len(l) {
        ++pos;  // first byte emitted by the encoder cache is always 0
        for (int i2 = 0; i2 < 4; ++i2)
            code = (code << 8) | (pos < len ? in[pos++] : 0);
    }

    int decode(uint16_t* p) {
        uint32_t bound = (range >> kProbBits) * *p;
        int bit;
        if (code < bound) {
            range = bound;
            *p += (uint16_t)(((1u << kProbBits) - *p) >> kMoveBits);
            bit = 0;
        } else {
            code -= bound;
            range -= bound;
            *p -= (uint16_t)(*p >> kMoveBits);
            bit = 1;
        }
        while (range < kTop) {
            code = (code << 8) | (pos < len ? in[pos++] : 0);
            range <<= 8;
        }
        return bit;
    }
};

}  // namespace

extern "C" {

// Encode `len` bytes; out must hold len + len/8 + 64 bytes. Returns bytes
// written, or -1 if out was too small.
int64_t o1rc_encode(const uint8_t* data, int64_t len, uint8_t* out,
                    int64_t out_cap) {
    std::vector<uint16_t> probs((size_t)256 * 256, kProbInit);
    Encoder enc(out, out_cap);
    uint8_t prev = 0;
    for (int64_t i = 0; i < len; ++i) {
        uint16_t* tree = probs.data() + (size_t)prev * 256;
        uint32_t node = 1;
        uint8_t b = data[i];
        for (int k = 7; k >= 0; --k) {
            int bit = (b >> k) & 1;
            enc.encode(&tree[node], bit);
            node = (node << 1) | bit;
        }
        prev = b;
    }
    enc.flush();
    return enc.n <= out_cap ? enc.n : -1;
}

// Decode exactly raw_len bytes.
int64_t o1rc_decode(const uint8_t* data, int64_t len, uint8_t* out,
                    int64_t raw_len) {
    std::vector<uint16_t> probs((size_t)256 * 256, kProbInit);
    Decoder dec(data, len);
    uint8_t prev = 0;
    for (int64_t i = 0; i < raw_len; ++i) {
        uint16_t* tree = probs.data() + (size_t)prev * 256;
        uint32_t node = 1;
        for (int k = 0; k < 8; ++k) node = (node << 1) | dec.decode(&tree[node]);
        uint8_t b = (uint8_t)(node & 0xFF);
        out[i] = b;
        prev = b;
    }
    return raw_len;
}

}  // extern "C"
