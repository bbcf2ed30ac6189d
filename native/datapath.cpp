// Native data-pipeline kernels (C++/OpenMP), exposed via a C ABI for ctypes.
//
// The reference's runtime-adjacent native code is CUDA kernels (pointops
// kNN, softsplat) plus GNU-parallel shell orchestration for the data
// factory. On TPU the device kernels are Pallas/XLA; the host-side data
// pipeline is where native code pays off: these kernels replace the
// numpy hot loops in `mvtracker_tpu/datasets` (blur, resizes, photometric
// normalization, depth validity stats) with multithreaded C++ so loader
// workers keep V*T frame stacks moving while the chip computes.
//
// Build: `make -C native` (produces libdatapath.so). Loaded by
// `mvtracker_tpu/native.py`; every entry point has a numpy fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Separable gaussian blur over the last two axes of a [n, h, w] float32
// stack (reflect padding). In-place-safe via an internal scratch row.
void gaussian_blur_f32(float* data, int64_t n, int64_t h, int64_t w,
                       int kernel, float sigma) {
  const int r = kernel / 2;
  float* g = new float[kernel];
  float sum = 0.f;
  for (int i = 0; i < kernel; ++i) {
    const float x = float(i - r) / sigma;
    g[i] = std::exp(-0.5f * x * x);
    sum += g[i];
  }
  for (int i = 0; i < kernel; ++i) g[i] /= sum;

#pragma omp parallel
  {
    float* tmp = new float[std::max(h, w)];
#pragma omp for schedule(static)
    for (int64_t img = 0; img < n; ++img) {
      float* base = data + img * h * w;
      // Horizontal pass.
      for (int64_t y = 0; y < h; ++y) {
        float* row = base + y * w;
        for (int64_t x = 0; x < w; ++x) {
          float acc = 0.f;
          for (int k = 0; k < kernel; ++k) {
            int64_t xx = x + k - r;
            if (xx < 0) xx = -xx;                    // reflect
            if (xx >= w) xx = 2 * w - xx - 2;
            // Re-clamp: for kernel/2 >= w the right reflection can go
            // negative again (out-of-bounds heap read otherwise).
            if (xx < 0) xx = 0;
            if (xx >= w) xx = w - 1;
            acc += g[k] * row[xx];
          }
          tmp[x] = acc;
        }
        std::memcpy(row, tmp, w * sizeof(float));
      }
      // Vertical pass.
      for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) {
          float acc = 0.f;
          for (int k = 0; k < kernel; ++k) {
            int64_t yy = y + k - r;
            if (yy < 0) yy = -yy;
            if (yy >= h) yy = 2 * h - yy - 2;
            if (yy < 0) yy = 0;
            if (yy >= h) yy = h - 1;
            acc += g[k] * base[yy * w + x];
          }
          tmp[y] = acc;
        }
        for (int64_t y = 0; y < h; ++y) base[y * w + x] = tmp[y];
      }
    }
    delete[] tmp;
  }
  delete[] g;
}

// Nearest-neighbor resize of a [n, h, w, c] float32 stack (torch
// `interpolate(mode='nearest')` semantics: src = floor(dst * in/out)).
void nearest_resize_f32(const float* src, float* dst, int64_t n, int64_t h,
                        int64_t w, int64_t c, int64_t oh, int64_t ow) {
#pragma omp parallel for schedule(static)
  for (int64_t img = 0; img < n; ++img) {
    const float* in = src + img * h * w * c;
    float* out = dst + img * oh * ow * c;
    for (int64_t y = 0; y < oh; ++y) {
      const int64_t sy = y * h / oh;
      for (int64_t x = 0; x < ow; ++x) {
        const int64_t sx = x * w / ow;
        std::memcpy(out + (y * ow + x) * c, in + (sy * w + sx) * c,
                    c * sizeof(float));
      }
    }
  }
}

// Bilinear resize with align_corners=true over [n, h, w, c] float32.
void bilinear_resize_ac_f32(const float* src, float* dst, int64_t n,
                            int64_t h, int64_t w, int64_t c, int64_t oh,
                            int64_t ow) {
#pragma omp parallel for schedule(static)
  for (int64_t img = 0; img < n; ++img) {
    const float* in = src + img * h * w * c;
    float* out = dst + img * oh * ow * c;
    for (int64_t y = 0; y < oh; ++y) {
      const float fy = (oh == 1) ? 0.f : float(y) * (h - 1) / (oh - 1);
      const int64_t y0 = int64_t(fy);
      const int64_t y1 = std::min(y0 + 1, h - 1);
      const float wy = fy - y0;
      for (int64_t x = 0; x < ow; ++x) {
        const float fx = (ow == 1) ? 0.f : float(x) * (w - 1) / (ow - 1);
        const int64_t x0 = int64_t(fx);
        const int64_t x1 = std::min(x0 + 1, w - 1);
        const float wx = fx - x0;
        const float* p00 = in + (y0 * w + x0) * c;
        const float* p01 = in + (y0 * w + x1) * c;
        const float* p10 = in + (y1 * w + x0) * c;
        const float* p11 = in + (y1 * w + x1) * c;
        float* o = out + (y * ow + x) * c;
        for (int64_t ch = 0; ch < c; ++ch) {
          o[ch] = (1 - wy) * ((1 - wx) * p00[ch] + wx * p01[ch]) +
                  wy * ((1 - wx) * p10[ch] + wx * p11[ch]);
        }
      }
    }
  }
}

// uint8 [n, h, w, 3] -> float32 normalized to 2*(x/255)-1 (the encoder's
// input normalization, fused with the dtype conversion).
void normalize_rgb_u8_f32(const uint8_t* src, float* dst, int64_t count) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < count; ++i) {
    dst[i] = 2.f * (float(src[i]) / 255.f) - 1.f;
  }
}

// Photometric jitter, matching datasets/augmentations.py exactly:
//   xc = (x - mean)*contrast + mean          (mean: caller-supplied, per
//                                             augmentation GROUP, not image)
//   xs = (xc - gray)*sat + gray              (gray: channel mean of xc)
//   out = xs * brightness                    (clamping is the caller's job)
void photometric_jitter_f32(float* data, int64_t n, int64_t hw,
                            const float* mean, const float* brightness,
                            const float* contrast, const float* saturation) {
#pragma omp parallel for schedule(static)
  for (int64_t img = 0; img < n; ++img) {
    float* p = data + img * hw * 3;
    const float m = mean[img];
    const float b = brightness[img], ct = contrast[img], s = saturation[img];
    for (int64_t i = 0; i < hw; ++i) {
      float* px = p + i * 3;
      float vc[3];
      for (int j = 0; j < 3; ++j) vc[j] = (px[j] - m) * ct + m;
      const float gray = (vc[0] + vc[1] + vc[2]) / 3.f;
      for (int j = 0; j < 3; ++j) px[j] = ((vc[j] - gray) * s + gray) * b;
    }
  }
}

// Depth validity stats: fraction of zero-depth pixels (the reference logs
// this per batch, `mvtracker.py:455-456`).
double depth_invalid_fraction_f32(const float* depth, int64_t count) {
  int64_t zeros = 0;
#pragma omp parallel for reduction(+ : zeros) schedule(static)
  for (int64_t i = 0; i < count; ++i) {
    if (depth[i] == 0.f) ++zeros;
  }
  return double(zeros) / double(count);
}

}  // extern "C"
