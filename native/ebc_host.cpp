// Native host-side data-pipeline kernels for clip_ebc_tpu.
//
// The reference framework leaves all host work to torch/numpy inside
// DataLoader workers (reference datasets/crowd.py, datasets/utils.py).
// Here the per-batch collate hot path is one fused C++ pass per image:
// uint8 HWC -> float32 ImageNet-normalized NHWC, dot-map rasterization
// directly into reduction blocks (fusing generate_density_map +
// _reshape_density: reference datasets/utils.py:11-28, losses/utils.py:4-9),
// and ragged point packing into the padded (P_max, 2) + mask layout the
// vmapped OT loss consumes.
//
// Build: make -C native   (produces libebc_host.so; loaded via ctypes by
// clip_ebc_tpu/data/native.py, with a numpy fallback when absent).

#include <cstdint>
#include <cstring>
#include <algorithm>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// uint8 HWC [0,255] -> float32 HWC, (x/255 - mean)/std. In-place-free.
void normalize_u8(const uint8_t* src, float* dst, int64_t n_pixels,
                  const float* mean, const float* std_) {
    const float s0 = 1.0f / (255.0f * std_[0]);
    const float s1 = 1.0f / (255.0f * std_[1]);
    const float s2 = 1.0f / (255.0f * std_[2]);
    const float b0 = -mean[0] / std_[0];
    const float b1 = -mean[1] / std_[1];
    const float b2 = -mean[2] / std_[2];
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_pixels; ++i) {
        dst[i * 3 + 0] = (float)src[i * 3 + 0] * s0 + b0;
        dst[i * 3 + 1] = (float)src[i * 3 + 1] * s1 + b1;
        dst[i * 3 + 2] = (float)src[i * 3 + 2] * s2 + b2;
    }
}

// float32 HWC [0,1] -> normalized float32 HWC.
void normalize_f32(const float* src, float* dst, int64_t n_pixels,
                   const float* mean, const float* std_) {
    const float s0 = 1.0f / std_[0], s1 = 1.0f / std_[1], s2 = 1.0f / std_[2];
    const float b0 = -mean[0] / std_[0], b1 = -mean[1] / std_[1], b2 = -mean[2] / std_[2];
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_pixels; ++i) {
        dst[i * 3 + 0] = src[i * 3 + 0] * s0 + b0;
        dst[i * 3 + 1] = src[i * 3 + 1] * s1 + b1;
        dst[i * 3 + 2] = src[i * 3 + 2] * s2 + b2;
    }
}

// Rasterize a dot map straight into (h/r, w/r) reduction blocks.
// Reference semantics: int-truncate then clamp coordinates; coincident
// points within a *pixel* collapse to 1.0 (assignment, not accumulation),
// while distinct pixels in the same block sum (reference
// datasets/utils.py:20-24 followed by block-sum).
// scratch must hold h*w bytes (zeroed here).
void rasterize_blocks(const float* points, int64_t n_points, int h, int w,
                      int reduction, float* out_blocks, uint8_t* scratch) {
    const int hb = h / reduction, wb = w / reduction;
    std::memset(out_blocks, 0, sizeof(float) * hb * wb);
    std::memset(scratch, 0, (size_t)h * w);
    for (int64_t i = 0; i < n_points; ++i) {
        int64_t x = (int64_t)points[i * 2 + 0];  // trunc toward zero
        int64_t y = (int64_t)points[i * 2 + 1];
        x = std::max<int64_t>(0, std::min<int64_t>(w - 1, x));
        y = std::max<int64_t>(0, std::min<int64_t>(h - 1, y));
        scratch[y * w + x] = 1;
    }
    for (int by = 0; by < hb; ++by) {
        for (int bx = 0; bx < wb; ++bx) {
            float acc = 0.0f;
            for (int dy = 0; dy < reduction; ++dy) {
                const uint8_t* row = scratch + (size_t)(by * reduction + dy) * w + bx * reduction;
                for (int dx = 0; dx < reduction; ++dx) acc += row[dx];
            }
            out_blocks[by * wb + bx] = acc;
        }
    }
}

// Count-preserving block-sum pooling of a full-resolution density map.
void block_sum(const float* density, int h, int w, int reduction, float* out) {
    const int hb = h / reduction, wb = w / reduction;
#pragma omp parallel for schedule(static)
    for (int b = 0; b < hb * wb; ++b) {
        const int by = b / wb, bx = b % wb;
        float acc = 0.0f;
        for (int dy = 0; dy < reduction; ++dy) {
            const float* row = density + (size_t)(by * reduction + dy) * w + bx * reduction;
            for (int dx = 0; dx < reduction; ++dx) acc += row[dx];
        }
        out[b] = acc;
    }
}

// Pack B ragged point lists (concatenated, with per-image counts) into
// (B, max_points, 2) float32 + (B, max_points) uint8 mask.
void pad_points(const float* points_cat, const int64_t* counts, int64_t batch,
                int64_t max_points, float* out_points, uint8_t* out_mask) {
    std::memset(out_points, 0, sizeof(float) * batch * max_points * 2);
    std::memset(out_mask, 0, (size_t)batch * max_points);
    int64_t offset = 0;
    for (int64_t b = 0; b < batch; ++b) {
        const int64_t n = std::min(counts[b], max_points);
        std::memcpy(out_points + b * max_points * 2, points_cat + offset * 2,
                    sizeof(float) * n * 2);
        std::memset(out_mask + b * max_points, 1, (size_t)n);
        offset += counts[b];
    }
}

// Salt-and-pepper noise from a caller-provided uniform(0,1) noise field
// (keeps RNG ownership in Python for reproducibility).
void pepper_salt(float* image, const float* noise, int64_t n,
                 float saltiness, float spiciness) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        if (noise[i] < saltiness) image[i] = 1.0f;
        else if (noise[i] > 1.0f - spiciness) image[i] = 0.0f;
    }
}

int ebc_host_version() { return 2; }

}  // extern "C"

// Fused 2-D bicubic upscale of a window: for each output pixel, the 4x4
// tap stencil (row/col taps precomputed by the caller — the same
// _torch_cubic_taps tables the numpy path uses) is accumulated in ONE
// float32 pass. Replaces the numpy two-pass path's two full-size
// intermediates + 8 gather/multiply/add sweeps with a cache-resident
// stencil (the 4 source rows of consecutive output rows overlap).
// C channels, HWC layout, C-minor.
extern "C" void bicubic_upscale_window(
    const float* src, int ih, int iw, int c,
    const int32_t* idx_y, const float* wy,   // (ch, 4)
    const int32_t* idx_x, const float* wx,   // (cw, 4)
    int ch_out, int cw_out, float* dst) {
    (void)ih;
#pragma omp parallel for schedule(static)
    for (int oy = 0; oy < ch_out; ++oy) {
        const float wy0 = wy[oy * 4 + 0], wy1 = wy[oy * 4 + 1];
        const float wy2 = wy[oy * 4 + 2], wy3 = wy[oy * 4 + 3];
        const float* r0 = src + (int64_t)idx_y[oy * 4 + 0] * iw * c;
        const float* r1 = src + (int64_t)idx_y[oy * 4 + 1] * iw * c;
        const float* r2 = src + (int64_t)idx_y[oy * 4 + 2] * iw * c;
        const float* r3 = src + (int64_t)idx_y[oy * 4 + 3] * iw * c;
        float* out_row = dst + (int64_t)oy * cw_out * c;
        for (int ox = 0; ox < cw_out; ++ox) {
            const int32_t* ix = idx_x + ox * 4;
            const float* wxp = wx + ox * 4;
            for (int ci = 0; ci < c; ++ci) {
                float acc = 0.0f;
                for (int t = 0; t < 4; ++t) {
                    const int64_t off = (int64_t)ix[t] * c + ci;
                    const float col =
                        wy0 * r0[off] + wy1 * r1[off] +
                        wy2 * r2[off] + wy3 * r3[off];
                    acc += wxp[t] * col;
                }
                out_row[ox * c + ci] = acc;
            }
        }
    }
}
