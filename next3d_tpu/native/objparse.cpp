// Fast Wavefront .obj / landmark .txt parsing for the training input
// pipeline. The reference parses FLAME meshes with per-line Python string
// splitting inside the dataset __getitem__ (reference: dataset.py:356-371)
// — far too slow to feed TPUs. next3d_tpu prebakes meshes to arrays
// (data/dataset.py); this native parser accelerates the prebake pass and
// any on-demand parsing (e.g. reenactment driving sequences).
//
// Exposed via a C ABI for ctypes (no pybind11 in this toolchain).
//
// Build: see next3d_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// fast float parse: sign, int part, frac part, exponent
inline const char* parse_float(const char* p, const char* end, float* out) {
    while (p < end && (*p == ' ' || *p == '\t')) ++p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) {
        neg = (*p == '-');
        ++p;
    }
    double val = 0.0;
    while (p < end && *p >= '0' && *p <= '9') {
        val = val * 10.0 + (*p - '0');
        ++p;
    }
    if (p < end && *p == '.') {
        ++p;
        double scale = 0.1;
        while (p < end && *p >= '0' && *p <= '9') {
            val += (*p - '0') * scale;
            scale *= 0.1;
            ++p;
        }
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        ++p;
        bool eneg = false;
        if (p < end && (*p == '-' || *p == '+')) {
            eneg = (*p == '-');
            ++p;
        }
        int ex = 0;
        while (p < end && *p >= '0' && *p <= '9') {
            ex = ex * 10 + (*p - '0');
            ++p;
        }
        double m = 1.0;
        for (int i = 0; i < ex; ++i) m *= 10.0;
        val = eneg ? val / m : val * m;
    }
    *out = static_cast<float>(neg ? -val : val);
    return p;
}

inline const char* next_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

}  // namespace

extern "C" {

// Parse only 'v x y z' lines. Returns number of vertices written (capped at
// max_verts), or -1 on file error.
int64_t objparse_vertices(const char* path, float* out, int64_t max_verts) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = static_cast<char*>(malloc(size));
    if (!buf) { fclose(f); return -1; }
    if (fread(buf, 1, size, f) != static_cast<size_t>(size)) {
        free(buf); fclose(f); return -1;
    }
    fclose(f);

    const char* p = buf;
    const char* end = buf + size;
    int64_t n = 0;
    while (p < end && n < max_verts) {
        if (p + 1 < end && p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            p = parse_float(p, end, &out[n * 3 + 0]);
            p = parse_float(p, end, &out[n * 3 + 1]);
            p = parse_float(p, end, &out[n * 3 + 2]);
            ++n;
        }
        p = next_line(p, end);
    }
    free(buf);
    return n;
}

// Parse whitespace-separated floats (landmark .txt files). Returns count.
int64_t objparse_floats(const char* path, float* out, int64_t max_floats) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = static_cast<char*>(malloc(size));
    if (!buf) { fclose(f); return -1; }
    if (fread(buf, 1, size, f) != static_cast<size_t>(size)) {
        free(buf); fclose(f); return -1;
    }
    fclose(f);

    const char* p = buf;
    const char* end = buf + size;
    int64_t n = 0;
    while (p < end && n < max_floats) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r')) ++p;
        if (p >= end) break;
        p = parse_float(p, end, &out[n]);
        ++n;
    }
    free(buf);
    return n;
}

}  // extern "C"
