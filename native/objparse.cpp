// Fast OBJ parser — native host-side data loading for torch_renderer_tpu.
//
// The reference delegates mesh IO to pytorch3d's load_obj (Python) and its
// heavy compute to external native libraries (SURVEY.md §2c). This framework
// keeps the TPU compute path in JAX/XLA and implements the *runtime* pieces
// natively: this translation unit parses OBJ text (v / vt / vn / f records,
// polygon fan-triangulation, v/vt/vn index splitting, negative indices) in a
// single pass over a caller-provided buffer, ~20-50x faster than the Python
// line loop for multi-MB meshes.
//
// Exposed as a C ABI for ctypes (io/native.py). Two-call protocol:
//   objparse_count(buf, len, counts[4])      -> verts, uvs, normals, tris
//   objparse_parse(buf, len, v, vt, vn, f, fuv, fn)  -> fills caller arrays
// All output arrays are float32 / int32 allocated by the caller at the
// counted sizes; f/fuv/fn are (tris, 3). Missing uv/normal indices are -1.

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* next_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

// Fast float parse (accepts scientific notation); advances *pp.
inline float parse_float(const char** pp, const char* end) {
    const char* p = skip_ws(*pp, end);
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    double val = 0.0;
    while (p < end && *p >= '0' && *p <= '9') { val = val * 10.0 + (*p - '0'); ++p; }
    if (p < end && *p == '.') {
        ++p;
        double frac = 0.0, scale = 1.0;
        while (p < end && *p >= '0' && *p <= '9') {
            frac = frac * 10.0 + (*p - '0'); scale *= 10.0; ++p;
        }
        val += frac / scale;
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        ++p;
        bool eneg = false;
        if (p < end && (*p == '-' || *p == '+')) { eneg = (*p == '-'); ++p; }
        int ex = 0;
        while (p < end && *p >= '0' && *p <= '9') { ex = ex * 10 + (*p - '0'); ++p; }
        double pow10 = 1.0;
        for (int i = 0; i < ex; ++i) pow10 *= 10.0;
        val = eneg ? val / pow10 : val * pow10;
    }
    *pp = p;
    return static_cast<float>(neg ? -val : val);
}

inline long parse_int(const char** pp, const char* end) {
    const char* p = *pp;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    long v = 0;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
    *pp = p;
    return neg ? -v : v;
}

// Parse one face corner "v", "v/vt", "v//vn", "v/vt/vn". Returns 0-based
// indices (resolving negative OBJ indices against current counts), -1 absent.
inline bool parse_corner(const char** pp, const char* end,
                         long nv, long nvt, long nvn,
                         int32_t* vi, int32_t* ti, int32_t* ni) {
    const char* p = skip_ws(*pp, end);
    if (p >= end || !((*p >= '0' && *p <= '9') || *p == '-')) { *pp = p; return false; }
    long v = parse_int(&p, end);
    long t = 0, n = 0;
    bool has_t = false, has_n = false;
    if (p < end && *p == '/') {
        ++p;
        if (p < end && *p != '/') { t = parse_int(&p, end); has_t = true; }
        if (p < end && *p == '/') { ++p; n = parse_int(&p, end); has_n = true; }
    }
    *vi = static_cast<int32_t>(v > 0 ? v - 1 : nv + v);
    *ti = has_t ? static_cast<int32_t>(t > 0 ? t - 1 : nvt + t) : -1;
    *ni = has_n ? static_cast<int32_t>(n > 0 ? n - 1 : nvn + n) : -1;
    *pp = p;
    return true;
}

}  // namespace

extern "C" {

// counts[0]=verts, counts[1]=uvs, counts[2]=normals, counts[3]=triangles
int objparse_count(const char* buf, int64_t len, int64_t counts[4]) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t nv = 0, nvt = 0, nvn = 0, ntri = 0;
    while (p < end) {
        p = skip_ws(p, end);
        if (p + 1 < end && p[0] == 'v') {
            if (p[1] == ' ' || p[1] == '\t') ++nv;
            else if (p[1] == 't') ++nvt;
            else if (p[1] == 'n') ++nvn;
        } else if (p + 1 < end && p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
            // count corners -> fan gives (k - 2) triangles
            const char* q = p + 1;
            int corners = 0;
            while (q < end && *q != '\n') {
                q = skip_ws(q, end);
                if (q < end && ((*q >= '0' && *q <= '9') || *q == '-')) {
                    ++corners;
                    while (q < end && *q != ' ' && *q != '\t' && *q != '\n' && *q != '\r') ++q;
                } else break;
            }
            if (corners >= 3) ntri += corners - 2;
        }
        p = next_line(p, end);
    }
    counts[0] = nv; counts[1] = nvt; counts[2] = nvn; counts[3] = ntri;
    return 0;
}

int objparse_parse(const char* buf, int64_t len,
                   float* verts, float* uvs, float* normals,
                   int32_t* faces, int32_t* faces_uv, int32_t* faces_n) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t iv = 0, ivt = 0, ivn = 0, itri = 0;
    while (p < end) {
        p = skip_ws(p, end);
        if (p + 1 < end && p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
            const char* q = p + 1;
            verts[iv * 3 + 0] = parse_float(&q, end);
            verts[iv * 3 + 1] = parse_float(&q, end);
            verts[iv * 3 + 2] = parse_float(&q, end);
            ++iv;
        } else if (p + 2 < end && p[0] == 'v' && p[1] == 't') {
            const char* q = p + 2;
            uvs[ivt * 2 + 0] = parse_float(&q, end);
            uvs[ivt * 2 + 1] = parse_float(&q, end);
            ++ivt;
        } else if (p + 2 < end && p[0] == 'v' && p[1] == 'n') {
            const char* q = p + 2;
            normals[ivn * 3 + 0] = parse_float(&q, end);
            normals[ivn * 3 + 1] = parse_float(&q, end);
            normals[ivn * 3 + 2] = parse_float(&q, end);
            ++ivn;
        } else if (p + 1 < end && p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
            const char* q = p + 1;
            int32_t v0, t0, n0, v1, t1, n1, v2, t2, n2;
            if (parse_corner(&q, end, iv, ivt, ivn, &v0, &t0, &n0) &&
                parse_corner(&q, end, iv, ivt, ivn, &v1, &t1, &n1)) {
                while (parse_corner(&q, end, iv, ivt, ivn, &v2, &t2, &n2)) {
                    faces[itri * 3 + 0] = v0;
                    faces[itri * 3 + 1] = v1;
                    faces[itri * 3 + 2] = v2;
                    faces_uv[itri * 3 + 0] = t0;
                    faces_uv[itri * 3 + 1] = t1;
                    faces_uv[itri * 3 + 2] = t2;
                    faces_n[itri * 3 + 0] = n0;
                    faces_n[itri * 3 + 1] = n1;
                    faces_n[itri * 3 + 2] = n2;
                    ++itri;
                    v1 = v2; t1 = t2; n1 = n2;  // fan
                }
            }
        }
        p = next_line(p, end);
    }
    return 0;
}

// COCO uncompressed RLE over a column-major uint8 mask. Returns the number of
// counts written (caller buffer must hold h*w+1 int32s).
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w, int32_t* counts) {
    int64_t n = h * w;
    int64_t ci = 0;
    uint8_t cur = 0;  // COCO counts start with the zero-run
    int64_t run = 0;
    // column-major traversal
    for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) {
            uint8_t v = mask[y * w + x] ? 1 : 0;
            if (v == cur) {
                ++run;
            } else {
                counts[ci++] = static_cast<int32_t>(run);
                cur = v;
                run = 1;
            }
        }
    }
    counts[ci++] = static_cast<int32_t>(run);
    (void)n;
    return ci;
}

}  // extern "C"
