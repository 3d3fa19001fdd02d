// Native host-side fast paths for speck_tpu.
//
// Fast MatrixMarket body tokenizer: the reference's .mtx parsing is C++
// (loadMTX, /root/reference/source/COO.cpp:52-164) because istringstream
// per line is the bottleneck at 100M+ nnz. This is a from-scratch
// single-pass tokenizer over the already-read body buffer; header/size-line
// handling, validation, and symmetry expansion stay in Python.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC speck_native.cpp -o libspeck_native.so

#include <cstdint>
#include <cstdlib>
#include <cctype>
#include <cstdio>

namespace {

inline const char* skip_ws_and_comments(const char* p, const char* end) {
    while (p < end) {
        if (*p == '%') {  // comment line: skip to newline
            while (p < end && *p != '\n') ++p;
        } else if (std::isspace(static_cast<unsigned char>(*p))) {
            ++p;
        } else {
            break;
        }
    }
    return p;
}

inline bool parse_uint(const char*& p, const char* end, unsigned int& out) {
    p = skip_ws_and_comments(p, end);
    if (p >= end || !std::isdigit(static_cast<unsigned char>(*p))) return false;
    std::uint64_t v = 0;
    while (p < end && std::isdigit(static_cast<unsigned char>(*p))) {
        v = v * 10 + static_cast<std::uint64_t>(*p - '0');
        ++p;
    }
    out = static_cast<unsigned int>(v);
    return true;
}

inline bool parse_double(const char*& p, const char* end, double& out) {
    p = skip_ws_and_comments(p, end);
    if (p >= end) return false;
    char* q = nullptr;
    out = std::strtod(p, &q);
    if (q == p) return false;
    p = q;
    return true;
}

}  // namespace

extern "C" {

// Parses `count` entries of `ncol` whitespace-separated fields each from
// `body`. ncol: 2 = pattern (r c), 3 = real (r c v), 4 = complex
// (r c re im; the real part is kept, matching loadMTX which streams one
// value). Returns the number of entries parsed (== count on success).
long long speck_mtx_parse(const char* body, long long len, long long count,
                          int ncol, unsigned int* rows, unsigned int* cols,
                          double* vals) {
    const char* p = body;
    const char* end = body + len;
    for (long long i = 0; i < count; ++i) {
        if (!parse_uint(p, end, rows[i])) return i;
        if (!parse_uint(p, end, cols[i])) return i;
        if (ncol >= 3) {
            if (!parse_double(p, end, vals[i])) return i;
        } else {
            vals[i] = 1.0;
        }
        if (ncol == 4) {
            double imag;
            if (!parse_double(p, end, imag)) return i;
        }
    }
    return count;
}

// Formats `count` entries as "r c v\n" (1-based ids, %.17g values — exact
// float64 round-trip) into `out`. ncol: 2 = pattern "r c\n", 3 = real.
// Returns bytes written, or -1 if `out_cap` is insufficient. The writer
// counterpart of the parser above; np.savetxt's per-row python loop is
// unusable at 1e8 nnz.
long long speck_mtx_format(const unsigned int* rows, const unsigned int* cols,
                           const double* vals, long long count, int ncol,
                           char* out, long long out_cap) {
    char* p = out;
    char* end = out + out_cap;
    for (long long i = 0; i < count; ++i) {
        if (end - p < 64) return -1;
        int n;
        if (ncol >= 3) {
            n = std::snprintf(p, static_cast<std::size_t>(end - p),
                              "%u %u %.17g\n", rows[i] + 1, cols[i] + 1,
                              vals[i]);
        } else {
            n = std::snprintf(p, static_cast<std::size_t>(end - p),
                              "%u %u\n", rows[i] + 1, cols[i] + 1);
        }
        if (n <= 0 || p + n >= end) return -1;
        p += n;
    }
    return static_cast<long long>(p - out);
}

}  // extern "C"
