// fss_native: fused CPU kernels for the episode input pipeline.
//
// The hot host-side path decodes an image and then runs four separate passes
// in the Python layer (bilinear resize, canvas pad, /255 scale, mean/std
// normalize) plus a nearest resize + pad for the label. At 80+ episodes/sec
// the loader must keep up with ~170 image transforms/sec per host; this
// library fuses each chain into one cache-friendly pass.
//
// Semantics mirror the framework's numpy/cv2 reference implementation
// (few_shot_seg_cwt_tpu/data/transforms.py): bilinear sampling on the
// half-pixel grid (cv2 INTER_LINEAR in float mode), nearest sampling with
// cv2's truncation convention, bottom/right zero-or-mean padding, label
// padding 255. The Python layer keeps the numpy path as a fallback and for
// bit-exactness tests.
//
// Build: native/build.sh (g++ -O3 -shared). ABI: plain C, ctypes-friendly.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Bilinear-resize an HxWx3 float32 image to (nh, nw), write into a
// (size, size, 3) float32 canvas pre-filled by the caller contract:
// out[y][x][c] = ((sample / 255) - mean[c]) / std[c] for y<nh, x<nw;
// remaining pixels get ((pad[c]/255) - mean[c]) / std[c].
void resize_pad_normalize_f32(
    const float* img, int64_t in_h, int64_t in_w,
    float* out, int64_t size, int64_t nh, int64_t nw,
    const float* mean, const float* stdv, const float* pad_value) {
  const double sy = static_cast<double>(in_h) / static_cast<double>(nh);
  const double sx = static_cast<double>(in_w) / static_cast<double>(nw);

  float pad_norm[3];
  for (int c = 0; c < 3; ++c) {
    const float pv = pad_value ? pad_value[c] : 0.0f;
    pad_norm[c] = (pv / 255.0f - mean[c]) / stdv[c];
  }

  // padded region (rows below nh, columns right of nw)
  for (int64_t y = 0; y < size; ++y) {
    float* row = out + y * size * 3;
    const int64_t x_start = (y < nh) ? nw : 0;
    for (int64_t x = x_start; x < size; ++x) {
      row[x * 3 + 0] = pad_norm[0];
      row[x * 3 + 1] = pad_norm[1];
      row[x * 3 + 2] = pad_norm[2];
    }
  }

  for (int64_t y = 0; y < nh; ++y) {
    // half-pixel source coordinate, clamped like cv2's border replication
    double fy = (y + 0.5) * sy - 0.5;
    if (fy < 0) fy = 0;
    int64_t y0 = static_cast<int64_t>(fy);
    if (y0 > in_h - 1) y0 = in_h - 1;
    int64_t y1 = std::min<int64_t>(y0 + 1, in_h - 1);
    const float wy = static_cast<float>(fy - y0);
    const float* r0 = img + y0 * in_w * 3;
    const float* r1 = img + y1 * in_w * 3;
    float* row = out + y * size * 3;

    for (int64_t x = 0; x < nw; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      if (fx < 0) fx = 0;
      int64_t x0 = static_cast<int64_t>(fx);
      if (x0 > in_w - 1) x0 = in_w - 1;
      int64_t x1 = std::min<int64_t>(x0 + 1, in_w - 1);
      const float wx = static_cast<float>(fx - x0);
      const float w00 = (1.0f - wy) * (1.0f - wx);
      const float w01 = (1.0f - wy) * wx;
      const float w10 = wy * (1.0f - wx);
      const float w11 = wy * wx;
      for (int c = 0; c < 3; ++c) {
        const float v = w00 * r0[x0 * 3 + c] + w01 * r0[x1 * 3 + c] +
                        w10 * r1[x0 * 3 + c] + w11 * r1[x1 * 3 + c];
        row[x * 3 + c] = (v / 255.0f - mean[c]) / stdv[c];
      }
    }
  }
}

// Nearest-resize a uint8 label to (nh, nw) inside a (size, size) int32
// canvas padded with 255, binarizing on the fly: target_class -> 1,
// 255 -> 255, everything else -> 0. target_class < 0 skips binarization.
void resize_pad_label_i32(
    const uint8_t* label, int64_t in_h, int64_t in_w,
    int32_t* out, int64_t size, int64_t nh, int64_t nw,
    int32_t target_class) {
  const double sy = static_cast<double>(in_h) / static_cast<double>(nh);
  const double sx = static_cast<double>(in_w) / static_cast<double>(nw);

  for (int64_t y = 0; y < size; ++y) {
    int32_t* row = out + y * size;
    if (y >= nh) {
      std::fill(row, row + size, 255);
      continue;
    }
    // cv2 INTER_NEAREST: src = floor(dst * scale) (truncation of dst*sy)
    int64_t yy = static_cast<int64_t>(y * sy);
    if (yy > in_h - 1) yy = in_h - 1;
    const uint8_t* src_row = label + yy * in_w;
    for (int64_t x = 0; x < nw; ++x) {
      int64_t xx = static_cast<int64_t>(x * sx);
      if (xx > in_w - 1) xx = in_w - 1;
      int32_t v = src_row[xx];
      if (target_class >= 0) {
        v = (v == target_class) ? 1 : (v == 255 ? 255 : 0);
      }
      row[x] = v;
    }
    for (int64_t x = nw; x < size; ++x) row[x] = 255;
  }
}

// Fused normalize-only path (square resize already done or not needed):
// out = (img/255 - mean) / std, both HxWx3 float32.
void normalize_f32(const float* img, int64_t n_pixels,
                   float* out, const float* mean, const float* stdv) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    for (int c = 0; c < 3; ++c) {
      out[i * 3 + c] = (img[i * 3 + c] / 255.0f - mean[c]) / stdv[c];
    }
  }
}

int fss_native_abi_version() { return 1; }

}  // extern "C"
