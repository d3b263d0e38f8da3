// OpenEXR scanline codec in C++ (tinyexr role — the reference vendors
// tinyexr for all EXR IO, engine/fileformats/exr.zig). Implements the same
// subset as the Python codec (moonshine_tpu/io/exr.py): single-part
// scanline, NONE/ZIP/ZIPS compression, half/float channels; writes
// ZIP-compressed float scanlines.

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
enum Compression : uint8_t { NONE = 0, RLE = 1, ZIPS = 2, ZIP = 3 };

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

}  // namespace

extern "C" {

int MsnExrWrite(const char *path, const float *rgb, uint32_t width,
                uint32_t height, uint32_t channels) {
    if (!path || !rgb || channels < 3 || channels > 4) return 1;
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
    attr("compression", "compression", {ZIP});
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

    const uint32_t lines_per_chunk = 16;
    const uint32_t n_chunks = (height + lines_per_chunk - 1) / lines_per_chunk;

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
        std::vector<uint8_t> pre = raw;
        zip_preprocess(pre);
        uLongf bound = compressBound((uLong)pre.size());
        std::vector<uint8_t> packed(bound);
        if (compress2(packed.data(), &bound, pre.data(), (uLong)pre.size(),
                      6) != Z_OK)
            return 2;
        packed.resize(bound);
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
    if (compression != NONE && compression != ZIP && compression != ZIPS)
        return 7;  // PIZ and friends unsupported

    if (xmax < xmin || ymax < ymin) return 6;
    uint32_t width = (uint32_t)(xmax - xmin + 1);
    uint32_t height = (uint32_t)(ymax - ymin + 1);
    uint32_t lines_per_chunk = compression == ZIP ? 16 : 1;
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
