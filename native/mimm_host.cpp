// mimm_host — native host-side data ops for mimm_tpu.
//
// The reference's data loader spends its time in Python/PIL transforming
// full-resolution CXRs (helpers.py:146-161).  This library implements the
// fused inverse-map affine + center-crop + max-normalize (the exact
// algorithm of mimm_tpu/data/transforms.py::affine_crop + max_normalize,
// same PIL pixel-center floor rounding) in C++ so that:
//   * the per-image transform drops from ~7.6 ms (numpy gather) to well
//     under a millisecond, and
//   * ctypes calls release the GIL, so the Loader's decode threads scale
//     across cores instead of serializing on Python.
//
// Build: native/build.sh (g++ -O3 -shared; no external dependencies).

#include <cmath>
#include <cstdint>
#include <algorithm>

// Inverse-affine sample of the centered out_size x out_size crop.
// matrix m[6]: output pixel-center (x+0.5, y+0.5) -> source coords
// (torchvision _get_inverse_affine_matrix convention, scale=1, shear=0).
// Pixels mapping outside the source are 0 (PIL fillcolor=0).
// Returns the max sample value (for normalization).
template <typename T>
static double affine_crop_impl(const T* img, int64_t h, int64_t w,
                               const double* m, int64_t top, int64_t left,
                               int64_t out_size, float* out) {
  double maxv = 0.0;
  for (int64_t oy = 0; oy < out_size; ++oy) {
    const double fy = static_cast<double>(oy + top) + 0.5;
    const double base_x = m[1] * fy + m[2];
    const double base_y = m[4] * fy + m[5];
    float* row = out + oy * out_size;
    for (int64_t ox = 0; ox < out_size; ++ox) {
      const double fx = static_cast<double>(ox + left) + 0.5;
      const int64_t sx = static_cast<int64_t>(std::floor(m[0] * fx + base_x));
      const int64_t sy = static_cast<int64_t>(std::floor(m[3] * fx + base_y));
      float v = 0.0f;
      if (sx >= 0 && sx < w && sy >= 0 && sy < h) {
        v = static_cast<float>(img[sy * w + sx]);
      }
      row[ox] = v;
      if (v > maxv) maxv = v;
    }
  }
  return maxv;
}

static void normalize_inplace(float* out, int64_t n, double maxv) {
  // true division (not reciprocal-multiply) for bit-exact parity with the
  // numpy reference path (img / max(1e-3, img.max()))
  const float denom = static_cast<float>(std::max(1e-3, maxv));
  for (int64_t i = 0; i < n; ++i) out[i] /= denom;
}

extern "C" {

// uint8 source (standard MIMIC-CXR JPEGs)
void affine_crop_norm_u8(const uint8_t* img, int64_t h, int64_t w,
                         const double* matrix, int64_t top, int64_t left,
                         int64_t out_size, float* out) {
  const double maxv = affine_crop_impl(img, h, w, matrix, top, left, out_size, out);
  normalize_inplace(out, out_size * out_size, maxv);
}

// uint16 source (IMREAD_ANYDEPTH can produce 16-bit)
void affine_crop_norm_u16(const uint16_t* img, int64_t h, int64_t w,
                          const double* matrix, int64_t top, int64_t left,
                          int64_t out_size, float* out) {
  const double maxv = affine_crop_impl(img, h, w, matrix, top, left, out_size, out);
  normalize_inplace(out, out_size * out_size, maxv);
}

}  // extern "C"

// Raw (un-normalized, source-dtype) affine-crop variants for the compact
// host->device transfer path: the loader ships the integer crop (1-2 bytes
// per pixel instead of a 4-byte float) and the jitted train step performs
// the identical float32 cast + max-normalize on device
// (mimm_tpu/ops/image_norm.py) — bit-exact with the fused variants above,
// at half/quarter the PCIe (or tunnel) traffic.
template <typename T>
static void affine_crop_raw_impl(const T* img, int64_t h, int64_t w,
                                 const double* m, int64_t top, int64_t left,
                                 int64_t out_size, T* out) {
  for (int64_t oy = 0; oy < out_size; ++oy) {
    const double fy = static_cast<double>(oy + top) + 0.5;
    const double base_x = m[1] * fy + m[2];
    const double base_y = m[4] * fy + m[5];
    T* row = out + oy * out_size;
    for (int64_t ox = 0; ox < out_size; ++ox) {
      const double fx = static_cast<double>(ox + left) + 0.5;
      const int64_t sx = static_cast<int64_t>(std::floor(m[0] * fx + base_x));
      const int64_t sy = static_cast<int64_t>(std::floor(m[3] * fx + base_y));
      T v = 0;
      if (sx >= 0 && sx < w && sy >= 0 && sy < h) {
        v = img[sy * w + sx];
      }
      row[ox] = v;
    }
  }
}

extern "C" {

void affine_crop_raw_u8(const uint8_t* img, int64_t h, int64_t w,
                        const double* matrix, int64_t top, int64_t left,
                        int64_t out_size, uint8_t* out) {
  affine_crop_raw_impl(img, h, w, matrix, top, left, out_size, out);
}

void affine_crop_raw_u16(const uint16_t* img, int64_t h, int64_t w,
                         const double* matrix, int64_t top, int64_t left,
                         int64_t out_size, uint16_t* out) {
  affine_crop_raw_impl(img, h, w, matrix, top, left, out_size, out);
}

}  // extern "C"

// Plain center-crop (+ zero pad) + normalize — the eval path.
template <typename T>
static void center_crop_impl(const T* img, int64_t h, int64_t w,
                             int64_t top, int64_t left, int64_t out_size,
                             float* out) {
  double maxv = 0.0;
  for (int64_t oy = 0; oy < out_size; ++oy) {
    const int64_t sy = oy + top;
    float* row = out + oy * out_size;
    for (int64_t ox = 0; ox < out_size; ++ox) {
      const int64_t sx = ox + left;
      float v = 0.0f;
      if (sx >= 0 && sx < w && sy >= 0 && sy < h) {
        v = static_cast<float>(img[sy * w + sx]);
      }
      row[ox] = v;
      if (v > maxv) maxv = v;
    }
  }
  normalize_inplace(out, out_size * out_size, maxv);
}

extern "C" {

void center_crop_norm_u8(const uint8_t* img, int64_t h, int64_t w,
                         int64_t top, int64_t left, int64_t out_size,
                         float* out) {
  center_crop_impl(img, h, w, top, left, out_size, out);
}

void center_crop_norm_u16(const uint16_t* img, int64_t h, int64_t w,
                          int64_t top, int64_t left, int64_t out_size,
                          float* out) {
  center_crop_impl(img, h, w, top, left, out_size, out);
}

}  // extern "C"

// Raw center-crop (eval-path counterpart of affine_crop_raw_*).
template <typename T>
static void center_crop_raw_impl(const T* img, int64_t h, int64_t w,
                                 int64_t top, int64_t left, int64_t out_size,
                                 T* out) {
  for (int64_t oy = 0; oy < out_size; ++oy) {
    const int64_t sy = oy + top;
    T* row = out + oy * out_size;
    for (int64_t ox = 0; ox < out_size; ++ox) {
      const int64_t sx = ox + left;
      T v = 0;
      if (sx >= 0 && sx < w && sy >= 0 && sy < h) {
        v = img[sy * w + sx];
      }
      row[ox] = v;
    }
  }
}

extern "C" {

void center_crop_raw_u8(const uint8_t* img, int64_t h, int64_t w,
                        int64_t top, int64_t left, int64_t out_size,
                        uint8_t* out) {
  center_crop_raw_impl(img, h, w, top, left, out_size, out);
}

void center_crop_raw_u16(const uint16_t* img, int64_t h, int64_t w,
                         int64_t top, int64_t left, int64_t out_size,
                         uint16_t* out) {
  center_crop_raw_impl(img, h, w, top, left, out_size, out);
}

}  // extern "C"
