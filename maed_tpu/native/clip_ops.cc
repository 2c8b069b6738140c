// Fused host-side clip assembly: affine crop (bilinear, constant border) +
// either [0,255] -> ImageNet-normalized float32 OR a rounded uint8 crop
// (the DEVICE_PREPROC shipping contract: the device normalizes in-jit, the
// host ships 1/4 the bytes), multi-threaded over frames.
//
// This is the hot host path of the input pipeline (the equivalent of the
// reference's cv2.warpAffine + ToTensor + Normalize chain,
// /root/reference/lib/data_utils/transforms/{crop,basic}.py) fused into one
// pass over the output pixels: one gather + one FMA per channel, no
// intermediate uint8 crop buffer, no separate normalize pass. Exposed to
// Python via ctypes (maed_tpu/native/__init__.py); build with build.sh.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#ifdef HAVE_LIBJPEG
#include <cstdio>
#include <jpeglib.h>
#endif

namespace {

// mean/std in [0,1] space; folded into the 1/255 scale below.
constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

// Output policies: float32 stores the ImageNet-normalized value; uint8
// stores the rounded bilinear sample (cv2.warpAffine-on-uint8 semantics to
// within 1 LSB of cv2's fixed-point rounding).
inline void store_px(float* dst, float v, float scale, float bias) {
  *dst = v * scale + bias;
}
inline void store_px(uint8_t* dst, float v, float, float) {
  const float c = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
  *dst = static_cast<uint8_t>(std::lrintf(c));
}

template <typename OutT>
struct FrameTask {
  const uint8_t* src;   // H_in x W_in x 3, RGB
  int src_h, src_w;
  const double* inv;    // 2x3 inverse affine (output px -> input px)
  OutT* dst;            // out_h x out_w x 3
};

template <typename OutT>
inline void process_frame(const FrameTask<OutT>& t, int out_h, int out_w) {
  const float scale[3] = {1.0f / (255.0f * kStd[0]), 1.0f / (255.0f * kStd[1]),
                          1.0f / (255.0f * kStd[2])};
  const float bias[3] = {-kMean[0] / kStd[0], -kMean[1] / kStd[1],
                         -kMean[2] / kStd[2]};
  const double a = t.inv[0], b = t.inv[1], c = t.inv[2];
  const double d = t.inv[3], e = t.inv[4], f = t.inv[5];

  const size_t stride = static_cast<size_t>(t.src_w) * 3;

  for (int y = 0; y < out_h; ++y) {
    OutT* row = t.dst + static_cast<size_t>(y) * out_w * 3;
    // input coordinates move linearly along the row: precompute start + step
    const double row_sx = b * y + c;
    const double row_sy = e * y + f;

    // interior span: output x where all 4 bilinear taps are in-bounds for
    // BOTH coordinates. Solve the linear constraints 0 <= x0, x0+1 < W,
    // 0 <= y0, y0+1 < H conservatively.
    int lo = 0, hi = out_w;  // [lo, hi) handled by the fast path
    auto clamp_span = [&](double step, double start, double min_v, double max_v) {
      // need min_v <= start + step*x <= max_v for x in [lo, hi)
      if (std::fabs(step) < 1e-12) {
        if (start < min_v || start > max_v) { lo = 0; hi = 0; }
        return;
      }
      double x1 = (min_v - start) / step;
      double x2 = (max_v - start) / step;
      if (x1 > x2) std::swap(x1, x2);
      lo = std::max(lo, static_cast<int>(std::ceil(x1)));
      hi = std::min(hi, static_cast<int>(std::floor(x2)) + 1);
    };
    clamp_span(a, row_sx, 0.0, static_cast<double>(t.src_w) - 2.0);
    clamp_span(d, row_sy, 0.0, static_cast<double>(t.src_h) - 2.0);
    if (lo > hi) { lo = hi = 0; }

    auto slow_pixel = [&](int x) {
      const double sx = row_sx + a * x;
      const double sy = row_sy + d * x;
      const int x0 = static_cast<int>(std::floor(sx));
      const int y0 = static_cast<int>(std::floor(sy));
      const float fx = static_cast<float>(sx - x0);
      const float fy = static_cast<float>(sy - y0);
      const bool in00 = (x0 >= 0) & (x0 < t.src_w) & (y0 >= 0) & (y0 < t.src_h);
      const bool in10 = (x0 + 1 >= 0) & (x0 + 1 < t.src_w) & (y0 >= 0) & (y0 < t.src_h);
      const bool in01 = (x0 >= 0) & (x0 < t.src_w) & (y0 + 1 >= 0) & (y0 + 1 < t.src_h);
      const bool in11 = (x0 + 1 >= 0) & (x0 + 1 < t.src_w) & (y0 + 1 >= 0) & (y0 + 1 < t.src_h);
      const float w00 = (1 - fx) * (1 - fy);
      const float w10 = fx * (1 - fy);
      const float w01 = (1 - fx) * fy;
      const float w11 = fx * fy;
      const uint8_t* p00 = in00 ? t.src + (static_cast<size_t>(y0) * t.src_w + x0) * 3 : nullptr;
      const uint8_t* p10 = in10 ? t.src + (static_cast<size_t>(y0) * t.src_w + x0 + 1) * 3 : nullptr;
      const uint8_t* p01 = in01 ? t.src + (static_cast<size_t>(y0 + 1) * t.src_w + x0) * 3 : nullptr;
      const uint8_t* p11 = in11 ? t.src + (static_cast<size_t>(y0 + 1) * t.src_w + x0 + 1) * 3 : nullptr;
      for (int ch = 0; ch < 3; ++ch) {
        float v = 0.f;
        if (p00) v += w00 * p00[ch];
        if (p10) v += w10 * p10[ch];
        if (p01) v += w01 * p01[ch];
        if (p11) v += w11 * p11[ch];
        store_px(row + x * 3 + ch, v, scale[ch], bias[ch]);
      }
    };

    for (int x = 0; x < lo; ++x) slow_pixel(x);
    // branch-free interior
    for (int x = lo; x < hi; ++x) {
      const double sx = row_sx + a * x;
      const double sy = row_sy + d * x;
      const int x0 = static_cast<int>(sx);
      const int y0 = static_cast<int>(sy);
      const float fx = static_cast<float>(sx - x0);
      const float fy = static_cast<float>(sy - y0);
      const float w00 = (1 - fx) * (1 - fy);
      const float w10 = fx * (1 - fy);
      const float w01 = (1 - fx) * fy;
      const float w11 = fx * fy;
      const uint8_t* p00 = t.src + static_cast<size_t>(y0) * stride + x0 * 3;
      const uint8_t* p01 = p00 + stride;
      for (int ch = 0; ch < 3; ++ch) {
        const float v = w00 * p00[ch] + w10 * p00[3 + ch] +
                        w01 * p01[ch] + w11 * p01[3 + ch];
        store_px(row + x * 3 + ch, v, scale[ch], bias[ch]);
      }
    }
    for (int x = hi; x < out_w; ++x) slow_pixel(x);
  }
}

// Shared frame-parallel driver for the decoded-frames entry points.
template <typename OutT>
void run_crop(const uint8_t** frames, const int* src_hw, int T,
              const double* inv_trans, int out_h, int out_w, OutT* out,
              int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > T) n_threads = T;

  std::atomic<int> next(0);
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < T) {
      FrameTask<OutT> task;
      task.src = frames[i];
      task.src_h = src_hw[i * 2];
      task.src_w = src_hw[i * 2 + 1];
      task.inv = inv_trans + i * 6;
      task.dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      process_frame(task, out_h, out_w);
    }
  };

  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int i = 0; i < n_threads; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

#ifdef HAVE_LIBJPEG

struct JpegErr {
  jpeg_error_mgr pub;
  std::jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(e->jb, 1);
}

// Largest dimension we will allocate for (a dataset frame is <= 4K video;
// the JPEG format header allows up to 65500 x 65500 x 3 ~= 12.8 GB, so a
// corrupt/hostile header must be rejected BEFORE the resize below or the
// std::bad_alloc would escape the worker thread and std::terminate the
// whole training process — advisor finding, round 2).
constexpr int kMaxJpegDim = 8192;

// Decode a JPEG byte buffer to RGB; returns false on corrupt, oversized, or
// allocation-failing input (any failure converts into the caller's
// failed-frame path instead of an exception crossing the thread boundary).
bool decode_jpeg(const uint8_t* buf, size_t len, std::vector<uint8_t>& out,
                 int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  if (*w <= 0 || *h <= 0 || *w > kMaxJpegDim || *h > kMaxJpegDim) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  try {
    out.resize(static_cast<size_t>(*w) * *h * 3);
  } catch (const std::bad_alloc&) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() +
                   static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Threaded JPEG-decode + crop driver shared by the f32/u8 entry points.
template <typename OutT>
int run_decode_crop(const uint8_t** jpegs, const int64_t* jpeg_lens, int T,
                    const double* inv_trans, int out_h, int out_w, OutT* out,
                    int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > T) n_threads = T;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  auto worker = [&]() {
    std::vector<uint8_t> pixels;  // reused per thread
    int i;
    while ((i = next.fetch_add(1)) < T) {
      int h = 0, w = 0;
      if (!decode_jpeg(jpegs[i], static_cast<size_t>(jpeg_lens[i]), pixels,
                       &h, &w)) {
        failed.store(1);
        continue;
      }
      FrameTask<OutT> task;
      task.src = pixels.data();
      task.src_h = h;
      task.src_w = w;
      task.inv = inv_trans + i * 6;
      task.dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      process_frame(task, out_h, out_w);
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int i = 0; i < n_threads; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failed.load() ? -2 : 0;
}

#endif  // HAVE_LIBJPEG

}  // namespace

extern "C" {

// frames: T pointers to H_in x W_in x 3 uint8 RGB buffers (per-frame sizes in
// src_hw, shape (T, 2) as h, w). inv_trans: (T, 6) row-major 2x3 inverse
// affines mapping OUTPUT pixel (x, y) to INPUT coordinates. out: float32
// buffer (T, out_h, out_w, 3). n_threads <= 0 selects hardware concurrency.
void clip_crop_normalize(const uint8_t** frames, const int* src_hw, int T,
                         const double* inv_trans, int out_h, int out_w,
                         float* out, int n_threads) {
  run_crop(frames, src_hw, T, inv_trans, out_h, out_w, out, n_threads);
}

// Same crop, uint8 output, NO normalize (the device normalizes in-jit):
// the DEVICE_PREPROC host half. Rounding matches cv2.warpAffine-on-uint8 to
// within 1 LSB.
void clip_crop_u8(const uint8_t** frames, const int* src_hw, int T,
                  const double* inv_trans, int out_h, int out_w,
                  uint8_t* out, int n_threads) {
  run_crop(frames, src_hw, T, inv_trans, out_h, out_w, out, n_threads);
}

// 1 when this build can decode JPEGs natively (libjpeg linked in).
int has_jpeg_decode() {
#ifdef HAVE_LIBJPEG
  return 1;
#else
  return 0;
#endif
}

// Threaded JPEG-decode + fused crop/normalize: the full host input pipeline
// for a clip in one native call (the reference's cv2.imread + warpAffine +
// ToTensor + Normalize chain). jpegs: T pointers to encoded buffers with
// byte lengths jpeg_lens. Returns 0 on success, -1 if built without
// libjpeg, -2 if any frame failed to decode.
int clip_decode_crop_normalize(const uint8_t** jpegs, const int64_t* jpeg_lens,
                               int T, const double* inv_trans, int out_h,
                               int out_w, float* out, int n_threads) {
#ifndef HAVE_LIBJPEG
  (void)jpegs; (void)jpeg_lens; (void)T; (void)inv_trans; (void)out_h;
  (void)out_w; (void)out; (void)n_threads;
  return -1;
#else
  return run_decode_crop(jpegs, jpeg_lens, T, inv_trans, out_h, out_w, out,
                         n_threads);
#endif
}

// Threaded JPEG-decode + crop to a uint8 buffer (device-normalize mode).
int clip_decode_crop_u8(const uint8_t** jpegs, const int64_t* jpeg_lens,
                        int T, const double* inv_trans, int out_h,
                        int out_w, uint8_t* out, int n_threads) {
#ifndef HAVE_LIBJPEG
  (void)jpegs; (void)jpeg_lens; (void)T; (void)inv_trans; (void)out_h;
  (void)out_w; (void)out; (void)n_threads;
  return -1;
#else
  return run_decode_crop(jpegs, jpeg_lens, T, inv_trans, out_h, out_w, out,
                         n_threads);
#endif
}

}  // extern "C"
