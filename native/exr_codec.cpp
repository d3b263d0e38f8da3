// OpenEXR scanline codec in C++ (tinyexr role — the reference vendors
// tinyexr for all EXR IO, engine/fileformats/exr.zig). Implements the same
// subset as the Python codec (moonshine_tpu/io/exr.py): single-part
// scanline, NONE/RLE/ZIPS/ZIP/PIZ compression, half/float channels;
// writes ZIP- or PIZ-compressed float scanlines (MsnExrWrite2).
//
// The PIZ coder (bitmap/LUT + 16-bit 2D Haar-like wavelet + canonical
// Huffman with a run-length escape) is written against the OpenEXR format
// semantics (ImfPizCompressor / ImfWav / ImfHuf) as an implementation
// INDEPENDENT of moonshine_tpu/io/exr.py, so the two cross-validate each
// other in tests/test_native.py — files produced by either load in the
// other.

#include "moonshine_tpu.h"

#include <zlib.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kMagic = 20000630u;
enum PixelType : int32_t { UINT = 0, HALF = 1, FLOAT = 2 };
enum Compression : uint8_t { NONE = 0, RLE = 1, ZIPS = 2, ZIP = 3, PIZ = 4 };

float half_to_float(uint16_t h) {
    uint32_t sign = (h >> 15) & 1, exp = (h >> 10) & 0x1F, man = h & 0x3FF;
    uint32_t f;
    if (exp == 0) {
        if (man == 0) {
            f = sign << 31;
        } else {
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; --exp; }
            man &= 0x3FF;
            f = (sign << 31) | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        f = (sign << 31) | 0x7F800000u | (man << 13);
    } else {
        f = (sign << 31) | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &f, 4);
    return out;
}

// EXR ZIP post-decompress: un-delta then interleave halves (ImfZip)
void zip_postprocess(std::vector<uint8_t> &data) {
    for (size_t i = 1; i < data.size(); ++i)
        data[i] = (uint8_t)(data[i] + data[i - 1] - 128);
    std::vector<uint8_t> out(data.size());
    size_t half = (data.size() + 1) / 2;
    for (size_t i = 0; i < half; ++i) out[i * 2] = data[i];
    for (size_t i = half; i < data.size(); ++i)
        out[(i - half) * 2 + 1] = data[i];
    data.swap(out);
}

// EXR ZIP pre-compress: split halves then delta
void zip_preprocess(std::vector<uint8_t> &data) {
    std::vector<uint8_t> tmp(data.size());
    size_t half = (data.size() + 1) / 2;
    for (size_t i = 0; i < half; ++i) tmp[i] = data[i * 2];
    for (size_t i = half; i < data.size(); ++i)
        tmp[i] = data[(i - half) * 2 + 1];
    uint8_t prev = tmp.empty() ? 0 : tmp[0];
    for (size_t i = 1; i < tmp.size(); ++i) {
        uint8_t cur = tmp[i];
        tmp[i] = (uint8_t)((int)cur - (int)prev + 128);
        prev = cur;
    }
    data.swap(tmp);
}

struct Channel {
    std::string name;
    int32_t type;
};

struct Reader {
    const uint8_t *p;
    size_t n, off = 0;
    bool ok = true;

    explicit Reader(const std::vector<uint8_t> &buf)
        : p(buf.data()), n(buf.size()) {}

    template <typename T>
    T read() {
        T v{};
        if (off + sizeof(T) > n) { ok = false; return v; }
        std::memcpy(&v, p + off, sizeof(T));
        off += sizeof(T);
        return v;
    }
    std::string cstring() {
        std::string s;
        while (off < n && p[off]) s.push_back((char)p[off++]);
        if (off < n) ++off;  // skip NUL
        return s;
    }
    void skip(size_t k) { off = std::min(off + k, n); ok &= off <= n; }
};

// ---------------------------------------------------------------------
// PIZ — 16-bit wavelet + Huffman, per the OpenEXR file format.
// ---------------------------------------------------------------------
namespace piz {

constexpr int kBitmapSize = 8192;      // 65536 values / 8 bits per byte
constexpr int kUShortRange = 1 << 16;
constexpr int kEncSize = kUShortRange + 1;  // + run-length pseudo symbol
constexpr int kDecBits = 14;
constexpr int kDecSize = 1 << kDecBits;
constexpr int kDecMask = kDecSize - 1;
constexpr int kShortZerorun = 59;
constexpr int kLongZerorun = 63;
constexpr int kShortestLongRun = 2 + kLongZerorun - kShortZerorun;
constexpr int kLongestLongRun = 255 + kShortestLongRun;
constexpr int kMaxCodeLen = 58;

// --- wavelet (wav2) ---

constexpr int kNBits = 16;
constexpr int kAOffset = 1 << (kNBits - 1);
constexpr int kModMask = (1 << kNBits) - 1;

inline void wenc14(uint16_t a, uint16_t b, uint16_t &l, uint16_t &h) {
    int16_t as = (int16_t)a, bs = (int16_t)b;
    int ms = (as + bs) >> 1;
    int ds = as - bs;
    l = (uint16_t)ms;
    h = (uint16_t)ds;
}

inline void wdec14(uint16_t l, uint16_t h, uint16_t &a, uint16_t &b) {
    int16_t ls = (int16_t)l, hs = (int16_t)h;
    int hi = (int)hs;
    int ai = ls + (hi & 1) + (hi >> 1);
    int16_t as = (int16_t)ai;
    int16_t bs = (int16_t)(ai - hi);
    a = (uint16_t)as;
    b = (uint16_t)bs;
}

inline void wenc16(uint16_t a, uint16_t b, uint16_t &l, uint16_t &h) {
    int ao = (a + kAOffset) & kModMask;
    int m = (ao + b) >> 1;
    int d = ao - b;
    if (d < 0) m = (m + kAOffset) & kModMask;
    d &= kModMask;
    l = (uint16_t)m;
    h = (uint16_t)d;
}

inline void wdec16(uint16_t l, uint16_t h, uint16_t &a, uint16_t &b) {
    int m = l, d = h;
    int bb = (m - (d >> 1)) & kModMask;
    int aa = (d + bb - kAOffset) & kModMask;
    a = (uint16_t)aa;
    b = (uint16_t)bb;
}

// in-place 2D transform of a (ny, nx) plane with strides ox, oy
void wav2Encode(uint16_t *in, int nx, int ox, int ny, int oy, uint16_t mx) {
    bool w14 = mx < (1 << 14);
    int n = nx > ny ? ny : nx;
    int p = 1, p2 = 2;
    while (p2 <= n) {
        uint16_t *py = in;
        uint16_t *ey = in + oy * (ny - p2);
        int oy1 = oy * p, oy2 = oy * p2;
        int ox1 = ox * p, ox2 = ox * p2;
        for (; py <= ey; py += oy2) {
            uint16_t *px = py;
            uint16_t *ex = py + ox * (nx - p2);
            for (; px <= ex; px += ox2) {
                uint16_t *p01 = px + ox1;
                uint16_t *p10 = px + oy1;
                uint16_t *p11 = p10 + ox1;
                uint16_t i00, i01, i10, i11;
                if (w14) {
                    wenc14(*px, *p01, i00, i01);
                    wenc14(*p10, *p11, i10, i11);
                    wenc14(i00, i10, *px, *p10);
                    wenc14(i01, i11, *p01, *p11);
                } else {
                    wenc16(*px, *p01, i00, i01);
                    wenc16(*p10, *p11, i10, i11);
                    wenc16(i00, i10, *px, *p10);
                    wenc16(i01, i11, *p01, *p11);
                }
            }
            if (nx & p) {  // odd column: vertical-only pair
                uint16_t *p10 = px + oy1;
                if (w14) wenc14(*px, *p10, *px, *p10);
                else wenc16(*px, *p10, *px, *p10);
            }
        }
        if (ny & p) {  // odd row: horizontal-only pairs
            uint16_t *px = py;
            uint16_t *ex = py + ox * (nx - p2);
            for (; px <= ex; px += ox2) {
                uint16_t *p01 = px + ox1;
                if (w14) wenc14(*px, *p01, *px, *p01);
                else wenc16(*px, *p01, *px, *p01);
            }
        }
        p = p2;
        p2 <<= 1;
    }
}

void wav2Decode(uint16_t *in, int nx, int ox, int ny, int oy, uint16_t mx) {
    bool w14 = mx < (1 << 14);
    int n = nx > ny ? ny : nx;
    int p = 1;
    while (p <= n) p <<= 1;
    p >>= 1;
    int p2 = p;
    p >>= 1;
    while (p >= 1) {
        uint16_t *py = in;
        uint16_t *ey = in + oy * (ny - p2);
        int oy1 = oy * p, oy2 = oy * p2;
        int ox1 = ox * p, ox2 = ox * p2;
        for (; py <= ey; py += oy2) {
            uint16_t *px = py;
            uint16_t *ex = py + ox * (nx - p2);
            for (; px <= ex; px += ox2) {
                uint16_t *p01 = px + ox1;
                uint16_t *p10 = px + oy1;
                uint16_t *p11 = p10 + ox1;
                uint16_t i00, i01, i10, i11;
                if (w14) {
                    wdec14(*px, *p10, i00, i10);
                    wdec14(*p01, *p11, i01, i11);
                    wdec14(i00, i01, *px, *p01);
                    wdec14(i10, i11, *p10, *p11);
                } else {
                    wdec16(*px, *p10, i00, i10);
                    wdec16(*p01, *p11, i01, i11);
                    wdec16(i00, i01, *px, *p01);
                    wdec16(i10, i11, *p10, *p11);
                }
            }
            if (nx & p) {
                uint16_t *p10 = px + oy1;
                if (w14) wdec14(*px, *p10, *px, *p10);
                else wdec16(*px, *p10, *px, *p10);
            }
        }
        if (ny & p) {
            uint16_t *px = py;
            uint16_t *ex = py + ox * (nx - p2);
            for (; px <= ex; px += ox2) {
                uint16_t *p01 = px + ox1;
                if (w14) wdec14(*px, *p01, *px, *p01);
                else wdec16(*px, *p01, *px, *p01);
            }
        }
        p2 = p;
        p >>= 1;
    }
}

// --- bitmap / lookup tables ---

uint16_t reverseLutFromBitmap(const uint8_t *bitmap, uint16_t *lut) {
    int k = 0;
    for (int i = 0; i < kUShortRange; ++i)
        if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7))))
            lut[k++] = (uint16_t)i;
    int n = k - 1;
    while (k < kUShortRange) lut[k++] = 0;
    return (uint16_t)n;  // maximum LUT output value
}

uint16_t forwardLutFromBitmap(const uint8_t *bitmap, uint16_t *lut) {
    int k = 0;
    for (int i = 0; i < kUShortRange; ++i) {
        if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7))))
            lut[i] = (uint16_t)k++;
        else
            lut[i] = 0;
    }
    return (uint16_t)(k - 1);
}

inline void applyLut(const uint16_t *lut, uint16_t *data, size_t n) {
    for (size_t i = 0; i < n; ++i) data[i] = lut[data[i]];
}

// --- Huffman (canonical codes, RLE escape symbol, 6-bit packed table) ---

struct BitWriter {
    std::vector<uint8_t> out;
    uint64_t acc = 0;
    int nbits = 0;
    void put(uint64_t v, int n) {
        acc = (acc << n) | (v & ((n == 64 ? 0 : (1ull << n)) - 1));
        nbits += n;
        while (nbits >= 8) {
            out.push_back((uint8_t)(acc >> (nbits - 8)));
            nbits -= 8;
        }
    }
    void flush() {
        if (nbits) {
            out.push_back((uint8_t)(acc << (8 - nbits)));
            nbits = 0;
        }
    }
};

struct BitReader {
    const uint8_t *p;
    size_t n, i = 0;
    uint64_t acc = 0;
    int nbits = 0;
    BitReader(const uint8_t *p_, size_t n_) : p(p_), n(n_) {}
    bool fill(int want) {
        while (nbits < want) {
            if (i >= n) return false;
            acc = (acc << 8) | p[i++];
            nbits += 8;
        }
        return true;
    }
    uint64_t take(int k) {
        uint64_t v = (acc >> (nbits - k)) & ((k == 64 ? 0 : (1ull << k)) - 1);
        nbits -= k;
        return v;
    }
};

// canonical code assignment from lengths (hufCanonicalCodeTable semantics)
void canonicalCodes(const uint8_t *len, uint64_t *code) {
    uint64_t cnt[kMaxCodeLen + 1] = {0};
    for (int i = 0; i < kEncSize; ++i) cnt[len[i]]++;
    uint64_t c = 0;
    uint64_t base[kMaxCodeLen + 1] = {0};
    for (int l = kMaxCodeLen; l >= 1; --l) {
        uint64_t nc = (c + cnt[l]) >> 1;
        base[l] = c;
        c = nc;
    }
    for (int i = 0; i < kEncSize; ++i)
        code[i] = len[i] ? base[len[i]]++ : 0;
}

// code lengths by pairing-merge over symbol sets; ties resolved by symbol
// order. Any set of lengths decodes correctly once canonicalized.
bool buildCodeLengths(const uint64_t *freq, uint8_t *len) {
    struct Node {
        uint64_t f;
        int id;
        std::vector<int> syms;
    };
    std::vector<Node> pool;
    for (int i = 0; i < kEncSize; ++i)
        if (freq[i]) pool.push_back({freq[i], i, {i}});
    std::memset(len, 0, kEncSize);
    if (pool.empty()) return false;
    if (pool.size() == 1) {
        len[pool[0].id] = 1;
        return true;
    }
    auto cmp = [](const Node *a, const Node *b) {
        return a->f != b->f ? a->f > b->f : a->id > b->id;
    };
    std::vector<Node *> heap;
    for (auto &nd : pool) heap.push_back(&nd);
    std::make_heap(heap.begin(), heap.end(), cmp);
    std::vector<Node> merged;
    merged.reserve(pool.size());
    int uid = kEncSize;
    while (heap.size() > 1) {
        std::pop_heap(heap.begin(), heap.end(), cmp);
        Node *a = heap.back();
        heap.pop_back();
        std::pop_heap(heap.begin(), heap.end(), cmp);
        Node *b = heap.back();
        heap.pop_back();
        merged.push_back({a->f + b->f, uid++, {}});
        Node &m = merged.back();
        m.syms.reserve(a->syms.size() + b->syms.size());
        m.syms.insert(m.syms.end(), a->syms.begin(), a->syms.end());
        m.syms.insert(m.syms.end(), b->syms.begin(), b->syms.end());
        for (int s : m.syms)
            if (++len[s] > kMaxCodeLen) return false;
        heap.push_back(&m);
        std::push_heap(heap.begin(), heap.end(), cmp);
    }
    return true;
}

// 6-bit packed code-length table with zero-run escapes
void packEncTable(const uint8_t *len, int im, int iM, BitWriter &bw) {
    int i = im;
    while (i <= iM) {
        int l = len[i];
        if (l == 0) {
            int run = 1;
            while (i + run <= iM && len[i + run] == 0 &&
                   run < kLongestLongRun)
                ++run;
            if (run >= kShortestLongRun) {
                bw.put(kLongZerorun, 6);
                bw.put(run - kShortestLongRun, 8);
                i += run;
                continue;
            }
            if (run >= 2) {
                if (run > 5) run = 5;
                bw.put(kShortZerorun + run - 2, 6);
                i += run;
                continue;
            }
        }
        bw.put(l, 6);
        ++i;
    }
    bw.flush();
}

bool unpackEncTable(BitReader &br, int im, int iM, uint8_t *len) {
    std::memset(len, 0, kEncSize);
    int i = im;
    while (i <= iM) {
        if (!br.fill(6)) return false;
        int l = (int)br.take(6);
        if (l == kLongZerorun) {
            if (!br.fill(8)) return false;
            i += (int)br.take(8) + kShortestLongRun;
        } else if (l >= kShortZerorun) {
            i += l - kShortZerorun + 2;
        } else {
            if (i >= kEncSize) return false;
            len[i++] = (uint8_t)l;
        }
        if (i > kEncSize) return false;
    }
    return true;
}

struct DecTable {
    // fast path: codes of <= kDecBits bits resolved by table lookup
    std::vector<uint8_t> flen;   // [kDecSize]
    std::vector<uint32_t> fsym;  // [kDecSize]
    // slow path: per 14-bit prefix, the long codes sharing it
    struct LongCode {
        uint8_t len;
        uint64_t code;
        uint32_t sym;
    };
    std::map<uint32_t, std::vector<LongCode>> longs;

    bool build(const uint8_t *len, const uint64_t *code) {
        flen.assign(kDecSize, 0);
        fsym.assign(kDecSize, 0);
        for (int i = 0; i < kEncSize; ++i) {
            int l = len[i];
            if (!l) continue;
            if (l > kDecBits) {
                uint32_t prefix = (uint32_t)(code[i] >> (l - kDecBits));
                if (prefix >= kDecSize) return false;
                longs[prefix].push_back({(uint8_t)l, code[i], (uint32_t)i});
            } else {
                uint64_t start = code[i] << (kDecBits - l);
                uint64_t span = 1ull << (kDecBits - l);
                if (start + span > kDecSize) return false;
                for (uint64_t k = 0; k < span; ++k) {
                    flen[start + k] = (uint8_t)l;
                    fsym[start + k] = (uint32_t)i;
                }
            }
        }
        return true;
    }
};

bool hufDecode(const uint8_t *data, size_t nbytes, int nBits, uint32_t rlc,
               const DecTable &dt, uint16_t *out, size_t nOut) {
    size_t oi = 0;
    uint64_t c = 0;
    int lc = 0;
    size_t i = 0;

    auto emit = [&](uint32_t sym) -> bool {
        if (sym == rlc) {
            if (lc < 8) {
                if (i >= nbytes) return false;
                c = (c << 8) | data[i++];
                lc += 8;
            }
            lc -= 8;
            int cs = (int)((c >> lc) & 0xFF);
            if (oi == 0 || oi + (size_t)cs > nOut) return false;
            uint16_t prev = out[oi - 1];
            for (int k = 0; k < cs; ++k) out[oi++] = prev;
        } else {
            if (oi >= nOut) return false;
            out[oi++] = (uint16_t)sym;
        }
        return true;
    };

    while (i < nbytes) {
        c = (c << 8) | data[i++];
        lc += 8;
        while (lc >= kDecBits) {
            uint32_t idx = (uint32_t)((c >> (lc - kDecBits)) & kDecMask);
            int l = dt.flen[idx];
            if (l) {
                lc -= l;
                if (!emit(dt.fsym[idx])) return false;
            } else {
                auto it = dt.longs.find(idx);
                if (it == dt.longs.end()) return false;
                bool found = false;
                for (const auto &lcd : it->second) {
                    while (lc < lcd.len && i < nbytes) {
                        c = (c << 8) | data[i++];
                        lc += 8;
                    }
                    if (lc >= lcd.len &&
                        ((c >> (lc - lcd.len)) &
                         ((1ull << lcd.len) - 1)) == lcd.code) {
                        lc -= lcd.len;
                        if (!emit(lcd.sym)) return false;
                        found = true;
                        break;
                    }
                }
                if (!found) return false;
            }
        }
    }

    // discard the final byte's pad bits, then drain remaining short codes
    int pad = (8 - nBits) & 7;
    c >>= pad;
    lc -= pad;
    while (lc > 0) {
        uint32_t idx = (uint32_t)((c << (kDecBits - lc)) & kDecMask);
        int l = dt.flen[idx];
        if (l && l <= lc) {
            lc -= l;
            if (!emit(dt.fsym[idx])) return false;
        } else {
            break;
        }
    }
    return oi == nOut;
}

// full hufCompress-format blob: im, iM, tableLen, nBits, 0, table, stream
std::vector<uint8_t> hufCompress(const uint16_t *raw, size_t n) {
    std::vector<uint64_t> freq(kEncSize, 0);
    for (size_t i = 0; i < n; ++i) freq[raw[i]]++;
    uint32_t maxSym = 0;
    for (int i = 0; i < kUShortRange; ++i)
        if (freq[i]) maxSym = (uint32_t)i;
    uint32_t rlc = maxSym + 1;  // run-length pseudo symbol
    freq[rlc] = 1;

    std::vector<uint8_t> len(kEncSize, 0);
    if (!buildCodeLengths(freq.data(), len.data())) return {};
    std::vector<uint64_t> code(kEncSize, 0);
    canonicalCodes(len.data(), code.data());

    uint32_t im = 0;
    while (im < (uint32_t)kEncSize && !len[im]) ++im;
    uint32_t iM = rlc;

    BitWriter table;
    packEncTable(len.data(), (int)im, (int)iM, table);

    BitWriter bw;
    uint64_t nBits = 0;
    auto sendSym = [&](uint32_t s) {
        bw.put(code[s], len[s]);
        nBits += len[s];
    };
    size_t j = 0;
    while (j < n) {
        uint16_t s = raw[j];
        size_t run = 1;
        while (j + run < n && raw[j + run] == s && run < 256) ++run;
        int extra = (int)run - 1;
        if ((uint64_t)extra * len[s] > (uint64_t)len[s] + len[rlc] + 8) {
            sendSym(s);
            sendSym(rlc);
            bw.put((uint64_t)extra, 8);
            nBits += 8;
        } else {
            for (size_t k = 0; k < run; ++k) sendSym(s);
        }
        j += run;
    }
    bw.flush();

    std::vector<uint8_t> outv(20);
    uint32_t hdr[5] = {im, iM, (uint32_t)table.out.size(), (uint32_t)nBits,
                       0};
    std::memcpy(outv.data(), hdr, 20);
    outv.insert(outv.end(), table.out.begin(), table.out.end());
    outv.insert(outv.end(), bw.out.begin(), bw.out.end());
    return outv;
}

bool hufUncompress(const uint8_t *data, size_t n, uint16_t *out,
                   size_t nOut) {
    if (n < 20) return false;
    uint32_t hdr[5];
    std::memcpy(hdr, data, 20);
    uint32_t im = hdr[0], iM = hdr[1], tableLen = hdr[2], nBits = hdr[3];
    if (im >= (uint32_t)kEncSize || iM >= (uint32_t)kEncSize || im > iM)
        return false;
    BitReader br(data + 20, n - 20);
    std::vector<uint8_t> len(kEncSize, 0);
    if (!unpackEncTable(br, (int)im, (int)iM, len.data())) return false;
    std::vector<uint64_t> code(kEncSize, 0);
    canonicalCodes(len.data(), code.data());
    DecTable dt;
    if (!dt.build(len.data(), code.data())) return false;
    // bitstream starts exactly tableLen bytes past the 20-byte header
    if (20 + (size_t)tableLen > n) return false;
    const uint8_t *stream = data + 20 + tableLen;
    size_t streamBytes = ((size_t)nBits + 7) / 8;
    if (20 + (size_t)tableLen + streamBytes > n) return false;
    return hufDecode(stream, streamBytes, (int)nBits, iM, dt, out, nOut);
}

// u16 components per pixel of a channel in the PIZ plane layout
inline int chanSize(int32_t type) { return type == HALF ? 1 : 2; }

// PIZ chunk payload -> scanline-interleaved raw bytes (like ZIP output)
bool uncompress(const uint8_t *payload, size_t n,
                const std::vector<Channel> &channels, uint32_t width,
                uint32_t nLines, std::vector<uint8_t> &raw) {
    if (n < 4) return false;
    uint16_t minNz, maxNz;
    std::memcpy(&minNz, payload, 2);
    std::memcpy(&maxNz, payload + 2, 2);
    size_t off = 4;
    std::vector<uint8_t> bitmap(kBitmapSize, 0);
    if (minNz <= maxNz) {
        if (maxNz >= kBitmapSize) return false;
        size_t cnt = (size_t)maxNz - minNz + 1;
        if (off + cnt > n) return false;
        std::memcpy(bitmap.data() + minNz, payload + off, cnt);
        off += cnt;
    }
    std::vector<uint16_t> lut(kUShortRange);
    uint16_t maxValue = reverseLutFromBitmap(bitmap.data(), lut.data());

    if (off + 4 > n) return false;
    int32_t hufLen;
    std::memcpy(&hufLen, payload + off, 4);
    off += 4;
    if (hufLen < 0 || off + (size_t)hufLen > n) return false;

    size_t nU16 = 0;
    for (const auto &c : channels)
        nU16 += (size_t)width * nLines * chanSize(c.type);
    std::vector<uint16_t> tmp(nU16);
    if (!hufUncompress(payload + off, (size_t)hufLen, tmp.data(), nU16))
        return false;

    size_t pos = 0;
    for (const auto &c : channels) {
        int sz = chanSize(c.type);
        for (int j = 0; j < sz; ++j)
            wav2Decode(tmp.data() + pos + j, (int)width, sz, (int)nLines,
                       (int)width * sz, maxValue);
        pos += (size_t)width * nLines * sz;
    }
    applyLut(lut.data(), tmp.data(), nU16);

    // plane-major u16 -> scanline-interleaved bytes
    raw.resize(nU16 * 2);
    size_t rowOff = 0;
    std::vector<size_t> planeStart(channels.size());
    {
        size_t s = 0;
        for (size_t ci = 0; ci < channels.size(); ++ci) {
            planeStart[ci] = s;
            s += (size_t)width * nLines * chanSize(channels[ci].type);
        }
    }
    for (uint32_t line = 0; line < nLines; ++line) {
        for (size_t ci = 0; ci < channels.size(); ++ci) {
            size_t rowU16 = (size_t)width * chanSize(channels[ci].type);
            std::memcpy(raw.data() + rowOff,
                        tmp.data() + planeStart[ci] + line * rowU16,
                        rowU16 * 2);
            rowOff += rowU16 * 2;
        }
    }
    return true;
}

// scanline-interleaved raw bytes -> PIZ chunk payload
std::vector<uint8_t> compress(const std::vector<uint8_t> &raw,
                              const std::vector<Channel> &channels,
                              uint32_t width, uint32_t nLines) {
    size_t nU16 = raw.size() / 2;
    std::vector<uint16_t> tmp(nU16);
    // reorder to plane-major
    std::vector<size_t> planeStart(channels.size());
    {
        size_t s = 0;
        for (size_t ci = 0; ci < channels.size(); ++ci) {
            planeStart[ci] = s;
            s += (size_t)width * nLines * chanSize(channels[ci].type);
        }
    }
    size_t rowOff = 0;
    for (uint32_t line = 0; line < nLines; ++line) {
        for (size_t ci = 0; ci < channels.size(); ++ci) {
            size_t rowU16 = (size_t)width * chanSize(channels[ci].type);
            std::memcpy(tmp.data() + planeStart[ci] + line * rowU16,
                        raw.data() + rowOff, rowU16 * 2);
            rowOff += rowU16 * 2;
        }
    }

    std::vector<uint8_t> bitmap(kBitmapSize, 0);
    for (size_t i = 0; i < nU16; ++i)
        bitmap[tmp[i] >> 3] |= (uint8_t)(1 << (tmp[i] & 7));
    bitmap[0] &= ~1;  // zero is always present implicitly
    std::vector<uint16_t> lut(kUShortRange);
    uint16_t maxValue = forwardLutFromBitmap(bitmap.data(), lut.data());
    applyLut(lut.data(), tmp.data(), nU16);

    for (const auto &c : channels) {
        int sz = chanSize(c.type);
        size_t start = planeStart[&c - channels.data()];
        for (int j = 0; j < sz; ++j)
            wav2Encode(tmp.data() + start + j, (int)width, sz, (int)nLines,
                       (int)width * sz, maxValue);
    }

    std::vector<uint8_t> huf = hufCompress(tmp.data(), nU16);
    if (huf.empty()) return {};

    uint16_t minNz = kBitmapSize - 1, maxNz = 0;
    for (int i = 0; i < kBitmapSize; ++i)
        if (bitmap[i]) {
            if (i < minNz) minNz = (uint16_t)i;
            maxNz = (uint16_t)i;
        }
    std::vector<uint8_t> payload;
    payload.insert(payload.end(), (uint8_t *)&minNz, (uint8_t *)&minNz + 2);
    payload.insert(payload.end(), (uint8_t *)&maxNz, (uint8_t *)&maxNz + 2);
    if (minNz <= maxNz)
        payload.insert(payload.end(), bitmap.begin() + minNz,
                       bitmap.begin() + maxNz + 1);
    int32_t hufLen = (int32_t)huf.size();
    payload.insert(payload.end(), (uint8_t *)&hufLen, (uint8_t *)&hufLen + 4);
    payload.insert(payload.end(), huf.begin(), huf.end());
    return payload;
}

}  // namespace piz

// EXR RLE decode (ImfRle): signed count, then the same predictor +
// half-deinterleave post-pass as ZIP
bool rle_uncompress(const uint8_t *src, size_t n, std::vector<uint8_t> &out,
                    size_t expected) {
    out.clear();
    out.reserve(expected);
    size_t i = 0;
    while (i < n) {
        int8_t c = (int8_t)src[i++];
        if (c < 0) {
            size_t cnt = (size_t)(-(int)c);
            if (i + cnt > n || out.size() + cnt > expected) return false;
            out.insert(out.end(), src + i, src + i + cnt);
            i += cnt;
        } else {
            size_t cnt = (size_t)c + 1;
            if (i >= n || out.size() + cnt > expected) return false;
            out.insert(out.end(), cnt, src[i++]);
        }
    }
    return out.size() == expected;
}

}  // namespace

extern "C" {

int MsnExrWrite2(const char *path, const float *rgb, uint32_t width,
                 uint32_t height, uint32_t channels, uint32_t compression) {
    if (!path || !rgb || channels < 3 || channels > 4) return 1;
    if (compression != ZIP && compression != PIZ) return 1;
    const char *names3[] = {"B", "G", "R"};
    const char *names4[] = {"A", "B", "G", "R"};
    const int src3[] = {2, 1, 0};
    const int src4[] = {3, 2, 1, 0};
    const char **names = channels == 4 ? names4 : names3;
    const int *src = channels == 4 ? src4 : src3;

    std::vector<uint8_t> header;
    auto put = [&](const void *d, size_t k) {
        const uint8_t *b = (const uint8_t *)d;
        header.insert(header.end(), b, b + k);
    };
    auto attr = [&](const char *name, const char *type,
                    const std::vector<uint8_t> &data) {
        put(name, strlen(name) + 1);
        put(type, strlen(type) + 1);
        int32_t size = (int32_t)data.size();
        put(&size, 4);
        put(data.data(), data.size());
    };

    std::vector<uint8_t> chlist;
    for (uint32_t c = 0; c < channels; ++c) {
        const char *nm = names[c];
        chlist.insert(chlist.end(), (const uint8_t *)nm,
                      (const uint8_t *)nm + strlen(nm) + 1);
        int32_t vals[4] = {FLOAT, 1 /* pLinear+reserved packed */, 1, 1};
        // layout: pixelType(i32), pLinear(u8)+3 reserved, xSampling, ySampling
        int32_t ptype = FLOAT;
        uint8_t plinear[4] = {1, 0, 0, 0};
        int32_t samp = 1;
        (void)vals;
        chlist.insert(chlist.end(), (uint8_t *)&ptype, (uint8_t *)&ptype + 4);
        chlist.insert(chlist.end(), plinear, plinear + 4);
        chlist.insert(chlist.end(), (uint8_t *)&samp, (uint8_t *)&samp + 4);
        chlist.insert(chlist.end(), (uint8_t *)&samp, (uint8_t *)&samp + 4);
    }
    chlist.push_back(0);

    int32_t box[4] = {0, 0, (int32_t)width - 1, (int32_t)height - 1};
    std::vector<uint8_t> boxv((uint8_t *)box, (uint8_t *)box + 16);
    float onef = 1.0f;
    float two[2] = {0.f, 0.f};

    attr("channels", "chlist", chlist);
    attr("compression", "compression", {(uint8_t)compression});
    attr("dataWindow", "box2i", boxv);
    attr("displayWindow", "box2i", boxv);
    attr("lineOrder", "lineOrder", {0});
    attr("pixelAspectRatio", "float",
         std::vector<uint8_t>((uint8_t *)&onef, (uint8_t *)&onef + 4));
    attr("screenWindowCenter", "v2f",
         std::vector<uint8_t>((uint8_t *)two, (uint8_t *)two + 8));
    attr("screenWindowWidth", "float",
         std::vector<uint8_t>((uint8_t *)&onef, (uint8_t *)&onef + 4));
    header.push_back(0);

    const uint32_t lines_per_chunk = compression == PIZ ? 32 : 16;
    const uint32_t n_chunks = (height + lines_per_chunk - 1) / lines_per_chunk;
    std::vector<Channel> chan_meta;
    for (uint32_t c = 0; c < channels; ++c)
        chan_meta.push_back({names[c], FLOAT});

    std::vector<std::vector<uint8_t>> chunks;
    for (uint32_t ci = 0; ci < n_chunks; ++ci) {
        uint32_t y0 = ci * lines_per_chunk;
        uint32_t n_lines = std::min(lines_per_chunk, height - y0);
        std::vector<uint8_t> raw(n_lines * channels * width * 4);
        size_t pos = 0;
        for (uint32_t line = 0; line < n_lines; ++line) {
            for (uint32_t c = 0; c < channels; ++c) {
                const float *rowbase = rgb + (size_t)(y0 + line) * width * channels;
                float *dst = (float *)(raw.data() + pos);
                for (uint32_t x = 0; x < width; ++x)
                    dst[x] = rowbase[x * channels + src[c]];
                pos += width * 4;
            }
        }
        std::vector<uint8_t> packed;
        if (compression == PIZ) {
            packed = piz::compress(raw, chan_meta, width, n_lines);
            if (packed.empty()) return 2;
        } else {
            std::vector<uint8_t> pre = raw;
            zip_preprocess(pre);
            uLongf bound = compressBound((uLong)pre.size());
            packed.resize(bound);
            if (compress2(packed.data(), &bound, pre.data(),
                          (uLong)pre.size(), 6) != Z_OK)
                return 2;
            packed.resize(bound);
        }
        if (packed.size() >= raw.size()) packed = raw;  // store raw

        std::vector<uint8_t> chunk(8 + packed.size());
        int32_t y = (int32_t)y0, sz = (int32_t)packed.size();
        std::memcpy(chunk.data(), &y, 4);
        std::memcpy(chunk.data() + 4, &sz, 4);
        std::memcpy(chunk.data() + 8, packed.data(), packed.size());
        chunks.push_back(std::move(chunk));
    }

    FILE *f = std::fopen(path, "wb");
    if (!f) return 3;
    uint32_t magic = kMagic;
    int32_t version = 2;
    std::fwrite(&magic, 4, 1, f);
    std::fwrite(&version, 4, 1, f);
    std::fwrite(header.data(), 1, header.size(), f);
    uint64_t offset = 8 + header.size() + 8ull * n_chunks;
    for (auto &c : chunks) {
        std::fwrite(&offset, 8, 1, f);
        offset += c.size();
    }
    for (auto &c : chunks) std::fwrite(c.data(), 1, c.size(), f);
    std::fclose(f);
    return 0;
}

int MsnExrWrite(const char *path, const float *rgb, uint32_t width,
                uint32_t height, uint32_t channels) {
    return MsnExrWrite2(path, rgb, width, height, channels, ZIP);
}

int MsnExrRead(const char *path, float **out_rgba, uint32_t *out_width,
               uint32_t *out_height) {
    if (!path || !out_rgba || !out_width || !out_height) return 1;
    FILE *f = std::fopen(path, "rb");
    if (!f) return 3;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)size);
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
        std::fclose(f);
        return 3;
    }
    std::fclose(f);

    Reader r(buf);
    if (r.read<uint32_t>() != kMagic) return 4;
    int32_t version = r.read<int32_t>();
    if (version & 0x200) return 5;  // multi-part unsupported

    std::vector<Channel> channels;
    uint8_t compression = NONE;
    int32_t xmin = 0, ymin = 0, xmax = 0, ymax = 0;

    while (r.ok && r.off < r.n && buf[r.off] != 0) {
        std::string name = r.cstring();
        std::string type = r.cstring();
        int32_t asize = r.read<int32_t>();
        if (asize < 0 || r.off + (size_t)asize > r.n) return 6;
        size_t next = r.off + (size_t)asize;
        if (name == "channels") {
            while (r.off < next && buf[r.off] != 0) {
                Channel c;
                c.name = r.cstring();
                c.type = r.read<int32_t>();
                r.skip(4);  // pLinear + reserved
                r.skip(8);  // sampling
                channels.push_back(c);
            }
        } else if (name == "compression") {
            if (asize < 1 || r.off >= r.n) return 6;
            compression = buf[r.off];
        } else if (name == "dataWindow") {
            xmin = r.read<int32_t>();
            ymin = r.read<int32_t>();
            xmax = r.read<int32_t>();
            ymax = r.read<int32_t>();
        }
        r.off = next;
    }
    r.skip(1);  // header terminator
    if (!r.ok || channels.empty()) return 6;
    if (compression > PIZ) return 7;  // B44/DWA and friends unsupported

    if (xmax < xmin || ymax < ymin) return 6;
    uint32_t width = (uint32_t)(xmax - xmin + 1);
    uint32_t height = (uint32_t)(ymax - ymin + 1);
    uint32_t lines_per_chunk =
        compression == ZIP ? 16 : compression == PIZ ? 32 : 1;
    uint32_t n_chunks = (height + lines_per_chunk - 1) / lines_per_chunk;
    r.skip(8ull * n_chunks);  // offset table; chunks follow in order

    size_t row_bytes = 0;
    for (auto &c : channels)
        row_bytes += (size_t)width * (c.type == HALF ? 2 : 4);

    std::map<std::string, std::vector<float>> planes;
    for (auto &c : channels)
        planes[c.name] = std::vector<float>((size_t)width * height, 0.f);

    for (uint32_t ci = 0; ci < n_chunks && r.ok; ++ci) {
        int32_t y = r.read<int32_t>();
        int32_t packed_size = r.read<int32_t>();
        if (!r.ok || packed_size < 0 ||
            r.off + (size_t)packed_size > r.n || y < ymin || y > ymax)
            return 6;
        uint32_t n_lines =
            std::min<uint32_t>(lines_per_chunk, (uint32_t)(ymax - y + 1));
        size_t expected = row_bytes * n_lines;

        std::vector<uint8_t> raw;
        if ((compression == ZIP || compression == ZIPS) &&
            (size_t)packed_size != expected) {
            raw.resize(expected);
            uLongf dest = (uLongf)expected;
            if (uncompress(raw.data(), &dest, buf.data() + r.off,
                           (uLong)packed_size) != Z_OK ||
                dest != (uLongf)expected)
                return 8;
            zip_postprocess(raw);
        } else if (compression == RLE && (size_t)packed_size != expected) {
            if (!rle_uncompress(buf.data() + r.off, (size_t)packed_size,
                                raw, expected))
                return 8;
            zip_postprocess(raw);
        } else if (compression == PIZ && (size_t)packed_size != expected) {
            if (!piz::uncompress(buf.data() + r.off, (size_t)packed_size,
                                 channels, width, n_lines, raw) ||
                raw.size() != expected)
                return 8;
        } else {
            // stored-raw chunk (NONE, or incompressible ZIP chunk stored
            // verbatim): its size must be exactly the scanline payload the
            // copy loop below reads — reject truncated/malformed files
            if ((size_t)packed_size != expected) return 6;
            raw.assign(buf.data() + r.off, buf.data() + r.off + packed_size);
        }
        r.skip((size_t)packed_size);

        size_t pos = 0;
        for (uint32_t line = 0; line < n_lines; ++line) {
            uint32_t yy = (uint32_t)(y - ymin) + line;
            if (yy >= height) break;
            for (auto &c : channels) {
                float *dst = planes[c.name].data() + (size_t)yy * width;
                if (c.type == HALF) {
                    const uint16_t *s = (const uint16_t *)(raw.data() + pos);
                    for (uint32_t x = 0; x < width; ++x)
                        dst[x] = half_to_float(s[x]);
                    pos += (size_t)width * 2;
                } else {
                    std::memcpy(dst, raw.data() + pos, (size_t)width * 4);
                    pos += (size_t)width * 4;
                }
            }
        }
    }

    float *out = (float *)std::malloc((size_t)width * height * 4 * sizeof(float));
    if (!out) return 9;
    const char *wanted[4] = {"R", "G", "B", "A"};
    for (uint32_t c = 0; c < 4; ++c) {
        auto it = planes.find(wanted[c]);
        if (it == planes.end() && c < 3) it = planes.find("Y");
        for (size_t i = 0; i < (size_t)width * height; ++i)
            out[i * 4 + c] = it != planes.end() ? it->second[i]
                                                : (c == 3 ? 1.0f : 0.0f);
    }
    *out_rgba = out;
    *out_width = width;
    *out_height = height;
    return 0;
}

void MsnExrFree(float *p) { std::free(p); }

}  // extern "C"
