// blama_tpu native runtime library.
//
// C++ implementations of the host-side hot loops: GGUF block dequantization
// and the TPU-layout Q4_K repack (unpack + transpose + nibble re-pair fused
// in one multithreaded pass). The reference gets these from llama.cpp's
// C/C++ kernels (SURVEY.md §2.2); here they accelerate model load on the
// Python side via ctypes (blama_tpu/native.py), with numpy as fallback.
//
// Build: cc -O3 -shared -fPIC -march=native -pthread (see native.py
// bootstrap). Plain C ABI, no dependencies.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {
            // subnormal: value = man * 2^-24; after normalizing (leading
            // bit at position 10) the f32 exponent is -14 - shift
            // (NOT -15 - shift: f16 subnormals share the 2^-14 scale of
            // the smallest normal — the off-by-one halved every subnormal
            // block scale, caught by tests/test_native.py subnormal cases)
            int shift = 0;
            while (!(man & 0x400)) { man <<= 1; ++shift; }
            man &= 0x3FF;
            bits = sign | ((127 - 14 - shift) << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000 | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

inline void get_scale_min_k4(int j, const uint8_t* q, uint8_t* d, uint8_t* m) {
    if (j < 4) {
        *d = q[j] & 63;
        *m = q[j + 4] & 63;
    } else {
        *d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
        *m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
    }
}

template <typename F>
void parallel_for(int64_t n, F&& fn) {
    unsigned hw = std::max(1u, std::thread::hardware_concurrency());
    int64_t n_threads = std::min<int64_t>(hw, n);
    if (n_threads <= 1) {
        fn((int64_t)0, n);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int64_t t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=, &fn] { fn(lo, hi); });
    }
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Q4_K superblocks (144 B) → float32, n_blocks * 256 values.
void blama_dequant_q4k(const uint8_t* src, float* dst, int64_t n_blocks) {
    parallel_for(n_blocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t* blk = src + b * 144;
            float* out = dst + b * 256;
            float d = f16_to_f32(*(const uint16_t*)blk);
            float dmin = f16_to_f32(*(const uint16_t*)(blk + 2));
            const uint8_t* scales = blk + 4;
            const uint8_t* qs = blk + 16;
            for (int c = 0; c < 4; ++c) {
                uint8_t sc1, m1, sc2, m2;
                get_scale_min_k4(2 * c, scales, &sc1, &m1);
                get_scale_min_k4(2 * c + 1, scales, &sc2, &m2);
                float d1 = d * sc1, mm1 = dmin * m1;
                float d2 = d * sc2, mm2 = dmin * m2;
                const uint8_t* q = qs + 32 * c;
                float* o = out + 64 * c;
                for (int l = 0; l < 32; ++l) {
                    o[l] = d1 * (q[l] & 0xF) - mm1;
                    o[l + 32] = d2 * (q[l] >> 4) - mm2;
                }
            }
        }
    });
}

// Q6_K superblocks (210 B) → float32.
void blama_dequant_q6k(const uint8_t* src, float* dst, int64_t n_blocks) {
    parallel_for(n_blocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t* blk = src + b * 210;
            float* out = dst + b * 256;
            const uint8_t* ql = blk;
            const uint8_t* qh = blk + 128;
            const int8_t* sc = (const int8_t*)(blk + 192);
            float d = f16_to_f32(*(const uint16_t*)(blk + 208));
            for (int h = 0; h < 2; ++h) {
                const uint8_t* lql = ql + 64 * h;
                const uint8_t* lqh = qh + 32 * h;
                const int8_t* lsc = sc + 8 * h;
                float* o = out + 128 * h;
                for (int l = 0; l < 32; ++l) {
                    int is = l / 16;
                    int q1 = (lql[l] & 0xF) | (((lqh[l] >> 0) & 3) << 4);
                    int q2 = (lql[l + 32] & 0xF) | (((lqh[l] >> 2) & 3) << 4);
                    int q3 = (lql[l] >> 4) | (((lqh[l] >> 4) & 3) << 4);
                    int q4 = (lql[l + 32] >> 4) | (((lqh[l] >> 6) & 3) << 4);
                    o[l] = d * lsc[is] * (q1 - 32);
                    o[l + 32] = d * lsc[is + 2] * (q2 - 32);
                    o[l + 64] = d * lsc[is + 4] * (q3 - 32);
                    o[l + 96] = d * lsc[is + 6] * (q4 - 32);
                }
            }
        }
    });
}

// Q8_0 blocks (34 B) → float32, n_blocks * 32 values.
void blama_dequant_q8_0(const uint8_t* src, float* dst, int64_t n_blocks) {
    // ceil: a floor here dropped the tail (up to 4095 blocks) whenever
    // n_blocks wasn't a 4096 multiple, leaving dst uninitialized (caught by
    // tests/test_native.py tail case, round 4)
    parallel_for(std::max<int64_t>((n_blocks + 4095) / 4096, 1), [&](int64_t clo, int64_t chi) {
        int64_t lo = clo * 4096, hi = std::min(n_blocks, chi * 4096);
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t* blk = src + b * 34;
            float d = f16_to_f32(*(const uint16_t*)blk);
            const int8_t* q = (const int8_t*)(blk + 2);
            float* o = dst + b * 32;
            for (int l = 0; l < 32; ++l) o[l] = d * q[l];
        }
    });
}

// Q5_K superblocks (176 B) → float32.
void blama_dequant_q5k(const uint8_t* src, float* dst, int64_t n_blocks) {
    parallel_for(n_blocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t* blk = src + b * 176;
            float* out = dst + b * 256;
            float d = f16_to_f32(*(const uint16_t*)blk);
            float dmin = f16_to_f32(*(const uint16_t*)(blk + 2));
            const uint8_t* scales = blk + 4;
            const uint8_t* qh = blk + 16;
            const uint8_t* qs = blk + 48;
            for (int c = 0; c < 4; ++c) {
                uint8_t sc1, m1, sc2, m2;
                get_scale_min_k4(2 * c, scales, &sc1, &m1);
                get_scale_min_k4(2 * c + 1, scales, &sc2, &m2);
                float d1 = d * sc1, mm1 = dmin * m1;
                float d2 = d * sc2, mm2 = dmin * m2;
                const uint8_t* q = qs + 32 * c;
                float* o = out + 64 * c;
                uint8_t u1 = 1 << (2 * c), u2 = 2 << (2 * c);
                for (int l = 0; l < 32; ++l) {
                    int lo4 = (q[l] & 0xF) | ((qh[l] & u1) ? 16 : 0);
                    int hi4 = (q[l] >> 4) | ((qh[l] & u2) ? 16 : 0);
                    o[l] = d1 * lo4 - mm1;
                    o[l + 32] = d2 * hi4 - mm2;
                }
            }
        }
    });
}

// Q2_K superblocks (84 B) → float32: 16 sub-blocks of 16 with 4-bit
// scale/min pairs under fp16 super-scales; byte l of 32-byte half h holds
// sub-blocks 8h+2j(+1) at bit 2j.
void blama_dequant_q2k(const uint8_t* src, float* dst, int64_t n_blocks) {
    parallel_for(n_blocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t* blk = src + b * 84;
            float* out = dst + b * 256;
            const uint8_t* scales = blk;
            const uint8_t* qs = blk + 16;
            float d = f16_to_f32(*(const uint16_t*)(blk + 80));
            float dmin = f16_to_f32(*(const uint16_t*)(blk + 82));
            int is = 0;
            for (int h = 0; h < 2; ++h) {
                const uint8_t* q = qs + 32 * h;
                for (int j = 0; j < 4; ++j) {
                    int shift = 2 * j;
                    for (int half = 0; half < 2; ++half) {
                        uint8_t sc = scales[is++];
                        float dl = d * (sc & 0xF), ml = dmin * (sc >> 4);
                        const uint8_t* qq = q + 16 * half;
                        for (int l = 0; l < 16; ++l)
                            *out++ = dl * ((qq[l] >> shift) & 3) - ml;
                    }
                }
            }
        }
    });
}

// Q3_K superblocks (110 B) → float32: 2 low bits in qs at bit 2j, high bit
// in hmask at bit 4h+j (clear bit = subtract 4); 16 6-bit scales via the
// kmask shuffle, used as (stored - 32).
void blama_dequant_q3k(const uint8_t* src, float* dst, int64_t n_blocks) {
    parallel_for(n_blocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t* blk = src + b * 110;
            float* out = dst + b * 256;
            const uint8_t* hm = blk;
            const uint8_t* qs = blk + 32;
            const uint8_t* s = blk + 96;
            float d = f16_to_f32(*(const uint16_t*)(blk + 108));
            int sc[16];
            for (int k = 0; k < 4; ++k) {
                sc[k] = (s[k] & 0xF) | ((s[8 + k] & 3) << 4);
                sc[4 + k] = (s[4 + k] & 0xF) | (((s[8 + k] >> 2) & 3) << 4);
                sc[8 + k] = (s[k] >> 4) | (((s[8 + k] >> 4) & 3) << 4);
                sc[12 + k] = (s[4 + k] >> 4) | (((s[8 + k] >> 6) & 3) << 4);
            }
            int is = 0;
            for (int h = 0; h < 2; ++h) {
                const uint8_t* q = qs + 32 * h;
                for (int j = 0; j < 4; ++j) {
                    int shift = 2 * j;
                    uint8_t m = (uint8_t)(1 << (4 * h + j));
                    for (int half = 0; half < 2; ++half) {
                        float dl = d * (sc[is++] - 32);
                        const uint8_t* qq = q + 16 * half;
                        const uint8_t* hh = hm + 16 * half;
                        for (int l = 0; l < 16; ++l)
                            *out++ = dl * (((qq[l] >> shift) & 3) -
                                           ((hh[l] & m) ? 0 : 4));
                    }
                }
            }
        }
    });
}

// Q4_K GGUF bytes → TPU fused-kernel layout, fused unpack+transpose+pair:
//   codes_packed u8 [K/2, N_pad] (pairing rows j and j+128 within 256-tiles)
//   scales f32 [K/32, N_pad], mins f32 [K/32, N_pad]
// N = n_rows (outputs), K = row_len (inputs); N_pad = ceil(N/256)*256
// (padding left zeroed by the caller's allocation).
void blama_repack_q4k(
    const uint8_t* src, int64_t n_rows, int64_t row_len, int64_t n_pad,
    uint8_t* codes_packed, float* scales, float* mins) {
    const int64_t blocks_per_row = row_len / 256;
    parallel_for(n_rows, [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; ++r) {
            const uint8_t* row = src + r * blocks_per_row * 144;
            for (int64_t bb = 0; bb < blocks_per_row; ++bb) {
                const uint8_t* blk = row + bb * 144;
                float d = f16_to_f32(*(const uint16_t*)blk);
                float dmin = f16_to_f32(*(const uint16_t*)(blk + 2));
                const uint8_t* sb = blk + 4;
                const uint8_t* qs = blk + 16;
                int64_t k0 = bb * 256;  // first input index of this superblock
                // scales/mins: one entry per 32-group
                for (int g = 0; g < 8; ++g) {
                    uint8_t sc, mn;
                    get_scale_min_k4(g, sb, &sc, &mn);
                    scales[((k0 / 32) + g) * n_pad + r] = d * sc;
                    mins[((k0 / 32) + g) * n_pad + r] = dmin * mn;
                }
                // codes: within this 256-tile, packed row j holds
                // (code[k0+j] | code[k0+128+j] << 4), j in [0,128)
                uint8_t tile[256];
                for (int c = 0; c < 4; ++c) {
                    const uint8_t* q = qs + 32 * c;
                    for (int l = 0; l < 32; ++l) {
                        tile[64 * c + l] = q[l] & 0xF;
                        tile[64 * c + 32 + l] = q[l] >> 4;
                    }
                }
                uint8_t* out_base = codes_packed + (k0 / 2) * n_pad + r;
                for (int j = 0; j < 128; ++j) {
                    out_base[(int64_t)j * n_pad] =
                        (uint8_t)(tile[j] | (tile[j + 128] << 4));
                }
            }
        }
    });
}

// Q4_K GGUF bytes → native-layout (4.5 bits/weight) TPU kernel arrays:
//   codes_packed u8 [K/2, N_pad] (pairing as blama_repack_q4k)
//   ddm   i32 [K/256, N_pad]   d f16 bits | dmin f16 bits << 16
//   scmn  i32 [3*K/256, N_pad] the 12-byte 6-bit sc/mn block as 3 LE words
void blama_repack_q4k_native(
    const uint8_t* src, int64_t n_rows, int64_t row_len, int64_t n_pad,
    uint8_t* codes_packed, int32_t* ddm, int32_t* scmn) {
    const int64_t blocks_per_row = row_len / 256;
    parallel_for(n_rows, [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; ++r) {
            const uint8_t* row = src + r * blocks_per_row * 144;
            for (int64_t bb = 0; bb < blocks_per_row; ++bb) {
                const uint8_t* blk = row + bb * 144;
                uint32_t dd;
                memcpy(&dd, blk, 4);  // d | dmin<<16 (LE)
                ddm[bb * n_pad + r] = (int32_t)dd;
                for (int wd = 0; wd < 3; ++wd) {
                    uint32_t w;
                    memcpy(&w, blk + 4 + 4 * wd, 4);
                    scmn[(bb * 3 + wd) * n_pad + r] = (int32_t)w;
                }
                const uint8_t* qs = blk + 16;
                int64_t k0 = bb * 256;
                uint8_t tile[256];
                for (int c = 0; c < 4; ++c) {
                    const uint8_t* q = qs + 32 * c;
                    for (int l = 0; l < 32; ++l) {
                        tile[64 * c + l] = q[l] & 0xF;
                        tile[64 * c + 32 + l] = q[l] >> 4;
                    }
                }
                uint8_t* out_base = codes_packed + (k0 / 2) * n_pad + r;
                for (int j = 0; j < 128; ++j) {
                    out_base[(int64_t)j * n_pad] =
                        (uint8_t)(tile[j] | (tile[j + 128] << 4));
                }
            }
        }
    });
}

int blama_native_version(void) { return 1; }

}  // extern "C"
