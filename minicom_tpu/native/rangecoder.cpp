// Adaptive binary range coders — the in-process entropy backends that
// replace the reference's external `bsc e -b64p -e2` subprocesses
// (minicom:115-148, SURVEY.md C23). Three context models share one
// carryless 32-bit range coder (LZMA-style renormalization); one pass,
// no tables in the stream, fully deterministic:
//
// * o1rc — bytes through a 255-node bit tree, context = previous byte.
// * o2rc — same tree, context = previous TWO bytes (64K trees); wins on the
//   structured diff-text streams.
// * dnarc — 2-bit base symbols (packed 4/byte in the stream), context = a
//   rolling hash of the previous 16 bases into 2^22 slots. High-order
//   context modeling is what lets repeated genome regions across contigs
//   predict the next base nearly perfectly — the same redundancy the
//   reference outsources to bsc's BWT, at a fraction of the time.
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

    // explicit 12-bit P(bit==0), caller owns the model update
    void encode_p(uint32_t p0, int bit) {
        uint32_t bound = (range >> kProbBits) * p0;
        if (!bit) {
            range = bound;
        } else {
            low += bound;
            range -= bound;
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

    int decode_p(uint32_t p0) {
        uint32_t bound = (range >> kProbBits) * p0;
        int bit;
        if (code < bound) {
            range = bound;
            bit = 0;
        } else {
            code -= bound;
            range -= bound;
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

// ---- order-2 byte coder ---------------------------------------------------

int64_t o2rc_encode(const uint8_t* data, int64_t len, uint8_t* out,
                    int64_t out_cap) {
    std::vector<uint16_t> probs((size_t)65536 * 256, kProbInit);
    Encoder enc(out, out_cap);
    uint32_t ctx = 0;  // prev1 | prev2 << 8
    for (int64_t i = 0; i < len; ++i) {
        uint16_t* tree = probs.data() + (size_t)ctx * 256;
        uint32_t node = 1;
        uint8_t b = data[i];
        for (int k = 7; k >= 0; --k) {
            int bit = (b >> k) & 1;
            enc.encode(&tree[node], bit);
            node = (node << 1) | bit;
        }
        ctx = ((ctx << 8) | b) & 0xFFFF;
    }
    enc.flush();
    return enc.n <= out_cap ? enc.n : -1;
}

int64_t o2rc_decode(const uint8_t* data, int64_t len, uint8_t* out,
                    int64_t raw_len) {
    std::vector<uint16_t> probs((size_t)65536 * 256, kProbInit);
    Decoder dec(data, len);
    uint32_t ctx = 0;
    for (int64_t i = 0; i < raw_len; ++i) {
        uint16_t* tree = probs.data() + (size_t)ctx * 256;
        uint32_t node = 1;
        for (int k = 0; k < 8; ++k) node = (node << 1) | dec.decode(&tree[node]);
        uint8_t b = (uint8_t)(node & 0xFF);
        out[i] = b;
        ctx = ((ctx << 8) | b) & 0xFFFF;
    }
    return raw_len;
}

// ---- DNA 2-bit symbol coder -----------------------------------------------
//
// The stream is packed 2-bit codes, 4 bases/byte little-endian-in-byte (the
// pack_2bit layout). Each base is coded as 2 binary decisions through a
// 3-node counter tree selected by hashing the previous 16 bases (rolling
// 32-bit history) into 2^22 contexts, linearly mixed with an order-6 (12-bit
// direct context) fallback. Probabilities are COUNT-BASED (sharpened KT
// estimator), not exponentially-adapted: high-order contexts on contig
// streams are seen only a handful of times, and next-base consistency within
// a repeated context is ~98%, so a confident prediction after ONE
// observation is the right bias — that lets repeated genome regions across
// contigs code at a fraction of a bit per base (the redundancy the reference
// outsources to bsc's BWT). An INVERTED-REPEAT update additionally inserts
// the reverse-complement view of the trailing window into the same table
// (the classic IR model of DNA compressors): contigs covering the same
// region in opposite orientations — ubiquitous here because read strands are
// canonicalized per cluster — predict each other. Trailing pad bases of the
// final byte are coded too (deterministic zeros).

namespace {
constexpr int kDnaCtxBits = 22;
inline uint32_t dna_ctx(uint32_t hist) {
    return (hist * 0x9E3779B1u) >> (32 - kDnaCtxBits);
}

struct Ctr {  // bit counters, capped by halving
    uint8_t n0 = 0, n1 = 0;
    inline uint32_t p0() const {  // P(bit==0) in 12-bit fixed point
        return (((uint32_t)(8 * n0 + 1)) << 12) / (8u * (n0 + n1) + 2);
    }
    inline void update(int bit) {
        if (bit) ++n1; else ++n0;
        if (n0 + n1 >= 60) { n0 >>= 1; n1 >>= 1; }
    }
};

// division-free probability/mix paths (hot: 2 per base on encode AND
// decode). P0[n0][n1] is exactly Ctr::p0(); RECIP[d] is an over-estimate
// reciprocal making num*RECIP[d] >> 40 an EXACT floor division for every
// numerator this model can produce (< 2^18) — the coded bitstream is
// bit-identical to the divide version.
struct DnaTables {
    uint16_t P0[60][60];
    uint64_t RECIP[50];
    DnaTables() {
        for (int a = 0; a < 60; ++a)
            for (int b = 0; b < 60; ++b)
                P0[a][b] = (uint16_t)((((uint32_t)(8 * a + 1)) << 12) /
                                      (8u * (a + b) + 2));
        for (int d = 1; d < 50; ++d)
            RECIP[d] = ((uint64_t)1 << 40) / d + 1;
    }
};
static const DnaTables kDna;

struct DnaModel {
    std::vector<Ctr> hi;   // 3 nodes per hashed order-16 context
    std::vector<Ctr> lo;   // 3 nodes per direct order-6 context
    DnaModel() : hi((size_t)3 << kDnaCtxBits), lo((size_t)3 << 12) {}

    // mixed P(bit==0); trust the high-order context with its sample count
    static inline uint32_t mix(const Ctr& h, const Ctr& l) {
        uint32_t w = 8u * (h.n0 + h.n1);
        if (w > 48) w = 48;
        uint32_t num = w * kDna.P0[h.n0][h.n1] + kDna.P0[l.n0][l.n1];
        return (uint32_t)(((uint64_t)num * kDna.RECIP[w + 1]) >> 40);
    }

    inline void update_at(uint32_t ctx, uint32_t sym) {
        Ctr* t = &hi[(size_t)3 * ctx];
        int b1 = (sym >> 1) & 1;
        t[0].update(b1);
        t[1 + b1].update(sym & 1);
    }
};

// Rolling state shared by encode/decode: hist packs the last 16 bases
// (newest at bits 0-1), rhist their reverse complement in the rc stream's
// own reading order — rhist equals the hist the decoder of the rc sequence
// would hold at the mirrored position.
struct DnaState {
    uint32_t hist = 0, rhist = 0;
    int64_t n = 0;

    inline void advance(DnaModel& m, uint32_t sym) {
        uint32_t oldest = (hist >> 30) & 3;
        hist = (hist << 2) | sym;
        rhist = (rhist >> 2) | ((sym ^ 3u) << 30);
        if (++n >= 17)  // IR insert: ctx = rc window, symbol = comp(oldest)
            m.update_at(dna_ctx(rhist), oldest ^ 3u);
    }
};
}  // namespace

int64_t dnarc_encode(const uint8_t* data, int64_t len, uint8_t* out,
                     int64_t out_cap) {
    DnaModel m;
    DnaState st;
    Encoder enc(out, out_cap);
    for (int64_t i = 0; i < len; ++i) {
        uint8_t byte = data[i];
        for (int s = 0; s < 4; ++s) {
            uint32_t sym = (byte >> (2 * s)) & 3;
            Ctr* th = &m.hi[(size_t)3 * dna_ctx(st.hist)];
            Ctr* tl = &m.lo[(size_t)3 * (st.hist & 0xFFF)];
            int b1 = (sym >> 1) & 1, b0 = sym & 1;
            enc.encode_p(DnaModel::mix(th[0], tl[0]), b1);
            th[0].update(b1); tl[0].update(b1);
            enc.encode_p(DnaModel::mix(th[1 + b1], tl[1 + b1]), b0);
            th[1 + b1].update(b0); tl[1 + b1].update(b0);
            st.advance(m, sym);
        }
    }
    enc.flush();
    return enc.n <= out_cap ? enc.n : -1;
}

int64_t dnarc_decode(const uint8_t* data, int64_t len, uint8_t* out,
                     int64_t raw_len) {
    DnaModel m;
    DnaState st;
    Decoder dec(data, len);
    for (int64_t i = 0; i < raw_len; ++i) {
        uint8_t byte = 0;
        for (int s = 0; s < 4; ++s) {
            Ctr* th = &m.hi[(size_t)3 * dna_ctx(st.hist)];
            Ctr* tl = &m.lo[(size_t)3 * (st.hist & 0xFFF)];
            int b1 = dec.decode_p(DnaModel::mix(th[0], tl[0]));
            th[0].update(b1); tl[0].update(b1);
            int b0 = dec.decode_p(DnaModel::mix(th[1 + b1], tl[1 + b1]));
            th[1 + b1].update(b0); tl[1 + b1].update(b0);
            uint32_t sym = (uint32_t)((b1 << 1) | b0);
            byte |= (uint8_t)(sym << (2 * s));
            st.advance(m, sym);
        }
        out[i] = byte;
    }
    return raw_len;
}

}  // extern "C"
