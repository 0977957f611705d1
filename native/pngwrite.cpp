// Native PNG encoder for the datagen image writer.
//
// The reference's datagen throughput metric is scene-generation wall time
// (coco_data_generator.py:384-393); on directly-attached hardware our
// pipeline is bounded by host-side PNG encoding (PIL's adaptive filtering
// + zlib level 6). This encoder writes filter-0 rows at a caller-chosen
// zlib level (default 1) — ~2.5x faster than PIL for datagen-sized RGB
// frames at a modest size cost, and ctypes releases the GIL during the
// call so the io/native.py thread pool encodes scenes genuinely in
// parallel with device rendering.
//
// PNG layout: signature, IHDR, one IDAT (zlib stream), IEND. CRC32 and
// deflate come from zlib itself.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
    out.push_back(uint8_t(v >> 24));
    out.push_back(uint8_t(v >> 16));
    out.push_back(uint8_t(v >> 8));
    out.push_back(uint8_t(v));
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
    put_be32(out, uint32_t(len));
    size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    if (len) out.insert(out.end(), data, data + len);
    uint32_t crc = crc32(0L, out.data() + start, uInt(4 + len));
    put_be32(out, crc);
}

}  // namespace

extern "C" {

// Encode w x h x channels 8-bit image (channels 1 = gray, 3 = RGB) to a
// PNG file. level: zlib 0-9 (datagen uses 1). Returns 0 on success,
// negative on error.
int png_write8(const char* path, int64_t w, int64_t h, int64_t channels,
               const uint8_t* data, int level) {
    if (w <= 0 || h <= 0 || (channels != 1 && channels != 3 && channels != 4))
        return -1;

    // raw scanlines with filter byte 0 prepended
    const size_t stride = size_t(w) * size_t(channels);
    std::vector<uint8_t> raw((stride + 1) * size_t(h));
    for (int64_t y = 0; y < h; ++y) {
        uint8_t* row = raw.data() + size_t(y) * (stride + 1);
        row[0] = 0;  // filter: None
        std::memcpy(row + 1, data + size_t(y) * stride, stride);
    }

    uLongf bound = compressBound(uLong(raw.size()));
    std::vector<uint8_t> idat(bound);
    if (compress2(idat.data(), &bound, raw.data(), uLong(raw.size()),
                  level) != Z_OK)
        return -2;
    idat.resize(bound);

    std::vector<uint8_t> out;
    out.reserve(idat.size() + 128);
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    out.insert(out.end(), sig, sig + 8);

    uint8_t ihdr[13];
    ihdr[0] = uint8_t(uint32_t(w) >> 24);
    ihdr[1] = uint8_t(uint32_t(w) >> 16);
    ihdr[2] = uint8_t(uint32_t(w) >> 8);
    ihdr[3] = uint8_t(uint32_t(w));
    ihdr[4] = uint8_t(uint32_t(h) >> 24);
    ihdr[5] = uint8_t(uint32_t(h) >> 16);
    ihdr[6] = uint8_t(uint32_t(h) >> 8);
    ihdr[7] = uint8_t(uint32_t(h));
    ihdr[8] = 8;  // bit depth
    ihdr[9] = channels == 1 ? 0 : (channels == 3 ? 2 : 6);  // color type
    ihdr[10] = 0;  // compression
    ihdr[11] = 0;  // filter method
    ihdr[12] = 0;  // no interlace
    put_chunk(out, "IHDR", ihdr, sizeof(ihdr));
    put_chunk(out, "IDAT", idat.data(), idat.size());
    put_chunk(out, "IEND", nullptr, 0);

    FILE* f = std::fopen(path, "wb");
    if (!f) return -3;
    size_t n = std::fwrite(out.data(), 1, out.size(), f);
    if (std::fclose(f) != 0 || n != out.size()) return -4;
    return 0;
}

}  // extern "C"
