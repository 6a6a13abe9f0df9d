// LZF block compression (the codec inside PCL's `DATA binary_compressed`
// PCD encoding, PointCloudStorage.h:249-312 / pcl::lzfCompress semantics).
//
// Fresh implementation of the LZF stream format (BSD liblzf's wire format:
// literal runs `ctrl<32` of ctrl+1 bytes; back-references `ctrl>=32` with
// 3-bit length (7 = extended by one byte) and 13-bit distance). Any
// conforming stream decodes identically under pcl::lzfDecompress, so maps
// and logs written here load in LidarView/PCL and vice versa.
//
// C ABI consumed by lidarslam_tpu/io/lzf.py (ctypes); built into
// liblidarslam_native.so by native/build.sh.

#include <cstdint>
#include <cstring>

namespace {

constexpr int HLOG = 14;            // 16k-entry chain table
constexpr uint32_t HSIZE = 1u << HLOG;
constexpr int64_t MAX_OFF = 1 << 13;   // 8192: 13-bit distance field
constexpr int64_t MAX_REF_LEN = 264;   // 2 + 7 + 255
constexpr int64_t MAX_LIT = 32;        // literal run per control byte

static inline uint32_t hash3(const uint8_t* p) {
    uint32_t v = ((uint32_t)p[0] << 16) | ((uint32_t)p[1] << 8) | p[2];
    return (v * 2654435761u) >> (32 - HLOG);
}

}  // namespace

extern "C" {

// Compress `in_len` bytes into `out` (capacity `out_cap`). Returns the
// compressed length, or 0 when the output does not fit. The stream always
// fits when out_cap >= in_len + in_len/32 + 2.
int64_t lst_lzf_compress(const uint8_t* in, int64_t in_len,
                         uint8_t* out, int64_t out_cap) {
    if (in_len <= 0) return 0;
    int64_t table[HSIZE];
    for (uint32_t i = 0; i < HSIZE; ++i) table[i] = -1;

    int64_t ip = 0, op = 0, lit_start = 0;

    auto flush_literals = [&](int64_t end) -> bool {
        int64_t n = end - lit_start;
        while (n > 0) {
            int64_t run = n < MAX_LIT ? n : MAX_LIT;
            if (op + 1 + run > out_cap) return false;
            out[op++] = (uint8_t)(run - 1);
            std::memcpy(out + op, in + lit_start, (size_t)run);
            op += run;
            lit_start += run;
            n -= run;
        }
        return true;
    };

    while (ip + 2 < in_len) {
        uint32_t h = hash3(in + ip);
        int64_t ref = table[h];
        table[h] = ip;
        int64_t off = ip - ref - 1;
        if (ref >= 0 && off < MAX_OFF &&
            in[ref] == in[ip] && in[ref + 1] == in[ip + 1] &&
            in[ref + 2] == in[ip + 2]) {
            // extend the match
            int64_t maxlen = in_len - ip;
            if (maxlen > MAX_REF_LEN) maxlen = MAX_REF_LEN;
            int64_t len = 3;
            while (len < maxlen && in[ref + len] == in[ip + len]) ++len;

            if (!flush_literals(ip)) return 0;
            int64_t l = len - 2;
            if (l < 7) {
                if (op + 2 > out_cap) return 0;
                out[op++] = (uint8_t)((off >> 8) | (l << 5));
            } else {
                if (op + 3 > out_cap) return 0;
                out[op++] = (uint8_t)((off >> 8) | (7 << 5));
                out[op++] = (uint8_t)(l - 7);
            }
            out[op++] = (uint8_t)(off & 0xFF);
            // seed the table through the matched region (cheap, improves ratio)
            int64_t stop = ip + len - 2;
            for (int64_t j = ip + 1; j < stop; ++j) table[hash3(in + j)] = j;
            ip += len;
            lit_start = ip;
        } else {
            ++ip;
        }
    }
    if (!flush_literals(in_len)) return 0;
    return op;
}

// Decompress into `out` (capacity `out_cap`). Returns the decompressed
// length, or -1 on malformed input / overflow.
int64_t lst_lzf_decompress(const uint8_t* in, int64_t in_len,
                           uint8_t* out, int64_t out_cap) {
    int64_t ip = 0, op = 0;
    while (ip < in_len) {
        uint8_t ctrl = in[ip++];
        if (ctrl < 32) {                      // literal run
            int64_t run = ctrl + 1;
            if (ip + run > in_len || op + run > out_cap) return -1;
            std::memcpy(out + op, in + ip, (size_t)run);
            ip += run;
            op += run;
        } else {                              // back reference
            int64_t len = ctrl >> 5;
            if (len == 7) {
                if (ip >= in_len) return -1;
                len += in[ip++];
            }
            len += 2;
            if (ip >= in_len) return -1;
            int64_t off = (((int64_t)(ctrl & 0x1F)) << 8) | in[ip++];
            int64_t ref = op - off - 1;
            if (ref < 0 || op + len > out_cap) return -1;
            for (int64_t j = 0; j < len; ++j)   // may self-overlap: byte copy
                out[op + j] = out[ref + j];
            op += len;
        }
    }
    return op;
}

}  // extern "C"
