// clipself_tpu native data-loader core.
//
// TPU-native equivalent of the host-side work torch's C++ DataLoader +
// PIL/torchvision do for the reference pipelines (SURVEY.md §2.5): JPEG/PNG
// decode, antialiased separable resize (PIL BILINEAR-parity triangle
// filter), crop, normalize, and pad — executed by a C++ thread pool writing
// straight into caller-owned float32 buffers that Python hands to
// jax.device_put. The Python side (clipself_tpu/data/native_loader.py) binds
// this via ctypes; everything degrades to the pure-PIL path when the shared
// library is not built.
//
// Build: make -C native  (g++ -O3 -shared -fPIC loader.cc -ljpeg -lpng -lpthread)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// decoding

struct ImageU8 {
  std::vector<uint8_t> data;  // HWC RGB
  int w = 0, h = 0;
  bool ok = false;
};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(mgr->jump, 1);
}

ImageU8 decode_jpeg_file(const char* path) {
  ImageU8 out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.data.resize(size_t(out.w) * out.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data.data() + size_t(cinfo.output_scanline) * out.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  out.ok = true;
  return out;
}

ImageU8 decode_png_file(const char* path) {
  ImageU8 out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return out;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);          // palette/gray->8bit
  png_set_strip_16(png);        // 16bit -> 8bit
  png_set_strip_alpha(png);     // drop alpha
  png_set_gray_to_rgb(png);     // gray -> rgb
  png_read_update_info(png, info);
  out.w = png_get_image_width(png, info);
  out.h = png_get_image_height(png, info);
  out.data.resize(size_t(out.w) * out.h * 3);
  std::vector<png_bytep> rows(out.h);
  for (int y = 0; y < out.h; ++y) rows[y] = out.data.data() + size_t(y) * out.w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  out.ok = true;
  return out;
}

ImageU8 decode_file(const char* path) {
  size_t n = strlen(path);
  if (n >= 4 && (strcasecmp(path + n - 4, ".png") == 0)) return decode_png_file(path);
  ImageU8 img = decode_jpeg_file(path);
  if (!img.ok) img = decode_png_file(path);  // extension lied; try png
  return img;
}

// ---------------------------------------------------------------------------
// antialiased separable resize (PIL BILINEAR parity: triangle filter whose
// support scales with the downscale factor)

struct FilterWeights {
  std::vector<int> bounds;     // [out] first source index
  std::vector<int> counts;     // [out] number of taps
  std::vector<float> weights;  // [out * max_taps]
  int max_taps = 0;
};

enum class Kernel { kBilinear, kBicubic };

double filter_eval(Kernel k, double x) {
  x = std::abs(x);
  if (k == Kernel::kBilinear) return x < 1.0 ? 1.0 - x : 0.0;
  // PIL BICUBIC: Keys kernel, a = -0.5
  const double a = -0.5;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

FilterWeights filter_weights(int in_size, int out_size, float crop_lo, float crop_len,
                             Kernel kernel) {
  FilterWeights fw;
  double base_support = kernel == Kernel::kBicubic ? 2.0 : 1.0;
  double scale = double(crop_len) / out_size;
  double filt = std::max(1.0, scale);  // antialias: widen filter on downscale
  double support = base_support * filt;
  fw.max_taps = int(std::ceil(support * 2)) + 2;
  fw.bounds.resize(out_size);
  fw.counts.resize(out_size);
  fw.weights.assign(size_t(out_size) * fw.max_taps, 0.f);
  for (int i = 0; i < out_size; ++i) {
    double center = crop_lo + (i + 0.5) * scale;
    int lo = std::max(0, int(std::floor(center - support)));
    int hi = std::min(in_size, int(std::ceil(center + support)));
    double total = 0.0;
    int cnt = std::max(hi - lo, 0);
    for (int k = 0; k < cnt; ++k) {
      double w = filter_eval(kernel, (lo + k + 0.5 - center) / filt);
      fw.weights[size_t(i) * fw.max_taps + k] = float(w);
      total += w;
    }
    if (total != 0) {
      for (int k = 0; k < cnt; ++k) fw.weights[size_t(i) * fw.max_taps + k] /= float(total);
    }
    fw.bounds[i] = lo;
    fw.counts[i] = cnt;
  }
  return fw;
}

// resize a crop window of src (u8 HWC) to dw x dh float HWC (0..255 range)
void resize_crop(const uint8_t* src, int sw, int sh, float x0, float y0, float cw,
                 float ch, float* dst, int dw, int dh,
                 Kernel kernel = Kernel::kBilinear) {
  // identity fast path: a whole-image "resize" to the same size (common for
  // det transforms of images already at the target longest side) is a pure
  // u8 -> float copy — the triangle filter at scale 1 with integer-aligned
  // centers reduces to the identity
  if (dw == sw && dh == sh && x0 == 0.f && y0 == 0.f &&
      cw == float(sw) && ch == float(sh)) {
    const size_t n = size_t(sw) * sh * 3;
    for (size_t i = 0; i < n; ++i) dst[i] = float(src[i]);
    return;
  }
  FilterWeights fx = filter_weights(sw, dw, x0, cw, kernel);
  FilterWeights fy = filter_weights(sh, dh, y0, ch, kernel);
  // the vertical pass only reads rows in the crop window's filter support —
  // restrict the horizontal pass to those (crop-heavy grid items would
  // otherwise filter the whole image height per crop)
  int y_lo = sh, y_hi = 0;
  for (int y = 0; y < dh; ++y) {
    y_lo = std::min(y_lo, fy.bounds[y]);
    y_hi = std::max(y_hi, fy.bounds[y] + fy.counts[y]);
  }
  y_lo = std::max(0, y_lo);
  y_hi = std::min(sh, std::max(y_hi, y_lo));
  // horizontal pass into temp [y_hi - y_lo, dw, 3] (window rows only)
  std::vector<float> tmp(size_t(y_hi - y_lo) * dw * 3);
  for (int y = y_lo; y < y_hi; ++y) {
    const uint8_t* row = src + size_t(y) * sw * 3;
    float* trow = tmp.data() + size_t(y - y_lo) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = fx.weights.data() + size_t(x) * fx.max_taps;
      int lo = fx.bounds[x], cnt = fx.counts[x];
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < cnt; ++k) {
        const uint8_t* p = row + size_t(lo + k) * 3;
        r += w[k] * p[0];
        g += w[k] * p[1];
        b += w[k] * p[2];
      }
      // PIL's 8bpc pipeline rounds and clamps EACH separable pass to
      // [0,255] (clip8 of the fixed-point accumulator): without this,
      // Keys-kernel overshoot at hard edges leaks values like 263 or -6
      // into the normalize step that PIL can never produce
      trow[x * 3 + 0] = std::min(255.f, std::max(0.f, std::round(r)));
      trow[x * 3 + 1] = std::min(255.f, std::max(0.f, std::round(g)));
      trow[x * 3 + 2] = std::min(255.f, std::max(0.f, std::round(b)));
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    const float* w = fy.weights.data() + size_t(y) * fy.max_taps;
    int lo = fy.bounds[y], cnt = fy.counts[y];
    float* drow = dst + size_t(y) * dw * 3;
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0;
      for (int k = 0; k < cnt; ++k) acc += w[k] * tmp[size_t(lo + k - y_lo) * dw * 3 + x];
      drow[x] = std::min(255.f, std::max(0.f, std::round(acc)));
    }
  }
}

void normalize_inplace(float* buf, size_t n_px, const float* mean, const float* stdv) {
  // y = (x/255 - mean)/std rewritten as x*a + b: divides cost ~20 cycles and
  // defeat vectorization; two fused multiply-adds per channel do not
  const float a0 = 1.f / (255.f * stdv[0]), b0 = -mean[0] / stdv[0];
  const float a1 = 1.f / (255.f * stdv[1]), b1 = -mean[1] / stdv[1];
  const float a2 = 1.f / (255.f * stdv[2]), b2 = -mean[2] / stdv[2];
  for (size_t i = 0; i < n_px; ++i) {
    float* p = buf + i * 3;
    p[0] = p[0] * a0 + b0;
    p[1] = p[1] * a1 + b1;
    p[2] = p[2] * a2 + b2;
  }
}

// ---------------------------------------------------------------------------
// thread pool

class Pool {
 public:
  explicit Pool(int n) : stop_(false), pending_(0), errors_(0) {
    for (int i = 0; i < n; ++i) workers_.emplace_back([this] { run(); });
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<bool()> job) {
    size_t id;
    {
      std::unique_lock<std::mutex> lk(mu_);
      id = status_.size();
      status_.push_back(2);  // pending
      jobs_.push({id, std::move(job)});
      ++pending_;
    }
    cv_.notify_one();
  }
  int wait_all() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
    status_.clear();
    return errors_.exchange(0);
  }
  // Wait, then write per-job success flags (1 ok, 0 failed) in submission
  // order into `out` (up to cap); returns the job count since the last wait.
  // Lets callers confine slow-path fallbacks to the jobs that failed.
  int wait_status(uint8_t* out, int cap) {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
    int n = static_cast<int>(status_.size());
    if (out) {
      for (int i = 0; i < n && i < cap; ++i) out[i] = status_[i] == 1 ? 1 : 0;
    }
    status_.clear();
    errors_.exchange(0);
    return n;
  }

 private:
  void run() {
    for (;;) {
      std::pair<size_t, std::function<bool()>> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (stop_) {
          // DISCARD queued jobs on teardown: they write through raw
          // pointers into caller buffers that may already be freed.
          // In-flight jobs finish (the destructor joins us afterwards).
          while (!jobs_.empty()) {
            status_[jobs_.front().first] = 0;
            jobs_.pop();
            --pending_;
          }
          done_cv_.notify_all();
          return;
        }
        job = std::move(jobs_.front());
        jobs_.pop();
      }
      bool ok = false;
      try {
        ok = job.second();
      } catch (...) {
      }
      if (!ok) ++errors_;
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (job.first < status_.size()) status_[job.first] = ok ? 1 : 0;
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::queue<std::pair<size_t, std::function<bool()>>> jobs_;
  std::vector<uint8_t> status_;
  std::vector<std::thread> workers_;
  bool stop_;
  int pending_;
  std::atomic<int> errors_;
};

}  // namespace

// ---------------------------------------------------------------------------
// C API

extern "C" {

void* csl_pool_create(int num_threads) { return new Pool(std::max(1, num_threads)); }
void csl_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }
int csl_pool_wait(void* pool) { return static_cast<Pool*>(pool)->wait_all(); }
int csl_pool_wait_status(void* pool, uint8_t* out, int cap) {
  return static_cast<Pool*>(pool)->wait_status(out, cap);
}

// Synchronous decode: returns malloc'd RGB u8 buffer (caller frees with
// csl_free) and writes w/h.
uint8_t* csl_decode(const char* path, int* w, int* h) {
  ImageU8 img = decode_file(path);
  if (!img.ok) return nullptr;
  auto* buf = static_cast<uint8_t*>(malloc(img.data.size()));
  memcpy(buf, img.data.data(), img.data.size());
  *w = img.w;
  *h = img.h;
  return buf;
}
void csl_free(void* p) { free(p); }

// One distillation item, fully async: decode `path` once, then
//  - resize longest side to det_size, normalize, pad bottom-right into
//    det_out [det_size, det_size, 3] (zero padding after normalize=0)
//  - for each of num_crops boxes (xyxy in ORIGINAL pixel coords), resize the
//    crop window to crop_size^2 and normalize into crops_out.
// Mirrors GridDistillDataset/ProposalDistillDataset host work
// (reference src/training/data.py:226-277).
// Paint the normalized-black pad value into the margins of a W x H x 3
// canvas NOT covered by the pasted image rows [y0, y0+ih) x cols [x0, x0+iw)
// — covered pixels are written by the subsequent memcpy, so filling them
// first would be wasted stores.
static void fill_pad_margins(float* out, int W, int H, int x0, int y0, int iw,
                             int ih, const float* padv) {
  auto fill_row = [&](float* row, int n) {
    for (int x = 0; x < n; ++x) {
      row[x * 3 + 0] = padv[0];
      row[x * 3 + 1] = padv[1];
      row[x * 3 + 2] = padv[2];
    }
  };
  for (int y = 0; y < H; ++y) {
    float* row = out + size_t(y) * W * 3;
    if (y < y0 || y >= y0 + ih) {
      fill_row(row, W);
      continue;
    }
    if (x0 > 0) fill_row(row, x0);
    if (x0 + iw < W) fill_row(row + size_t(x0 + iw) * 3, W - x0 - iw);
  }
}

// black padded BEFORE normalization (reference ResizeLongest fill=0 then
// Normalize): padding value = (0 - mean) / std
static void compute_padv(const std::vector<float>& m, const std::vector<float>& s,
                         float* padv) {
  for (int c = 0; c < 3; ++c) padv[c] = (0.f - m[c]) / s[c];
}

int csl_submit_distill_item(void* pool, const char* path, int det_size, int crop_size,
                            int num_crops, const float* crop_boxes, const float* mean,
                            const float* stdv, float* det_out, float* crops_out) {
  std::string p(path);
  std::vector<float> boxes(crop_boxes, crop_boxes + size_t(num_crops) * 4);
  std::vector<float> m(mean, mean + 3), s(stdv, stdv + 3);
  static_cast<Pool*>(pool)->submit([=]() -> bool {
    ImageU8 img = decode_file(p.c_str());
    if (!img.ok) return false;
    float padv[3];
    compute_padv(m, s, padv);
    float scale = float(det_size) / std::max(img.w, img.h);
    int nw = std::max(1, int(std::round(img.w * scale)));
    int nh = std::max(1, int(std::round(img.h * scale)));
    std::vector<float> resized(size_t(nw) * nh * 3);
    resize_crop(img.data.data(), img.w, img.h, 0, 0, float(img.w), float(img.h),
                resized.data(), nw, nh, Kernel::kBicubic);
    normalize_inplace(resized.data(), size_t(nw) * nh, m.data(), s.data());
    fill_pad_margins(det_out, det_size, det_size, 0, 0, nw, nh, padv);
    for (int y = 0; y < nh; ++y)
      memcpy(det_out + size_t(y) * det_size * 3, resized.data() + size_t(y) * nw * 3,
             size_t(nw) * 3 * sizeof(float));
    for (int c = 0; c < num_crops; ++c) {
      float x0 = boxes[c * 4 + 0], y0 = boxes[c * 4 + 1];
      float x1 = boxes[c * 4 + 2], y1 = boxes[c * 4 + 3];
      x0 = std::max(0.f, x0);
      y0 = std::max(0.f, y0);
      x1 = std::min(float(img.w), x1);
      y1 = std::min(float(img.h), y1);
      float cw = std::max(1.f, x1 - x0), ch = std::max(1.f, y1 - y0);
      // aspect-preserving: longest side -> crop_size, center pad
      // (reference ResizeMaxSize, transform.py:26-49)
      float cscale = float(crop_size) / std::max(cw, ch);
      int ow = std::max(1, int(std::round(cw * cscale)));
      int oh = std::max(1, int(std::round(ch * cscale)));
      std::vector<float> cbuf(size_t(ow) * oh * 3);
      resize_crop(img.data.data(), img.w, img.h, x0, y0, cw, ch, cbuf.data(), ow, oh,
                  Kernel::kBicubic);
      normalize_inplace(cbuf.data(), size_t(ow) * oh, m.data(), s.data());
      float* out = crops_out + size_t(c) * crop_size * crop_size * 3;
      int offx = (crop_size - ow) / 2, offy = (crop_size - oh) / 2;
      fill_pad_margins(out, crop_size, crop_size, offx, offy, ow, oh, padv);
      for (int y = 0; y < oh; ++y)
        memcpy(out + (size_t(y + offy) * crop_size + offx) * 3,
               cbuf.data() + size_t(y) * ow * 3, size_t(ow) * 3 * sizeof(float));
    }
    return true;
  });
  return 0;
}

// Generic: decode + keep-ratio resize into a padded square target
// (detector eval path). Writes the applied scale into *scale_out.
int csl_submit_resize_pad(void* pool, const char* path, int target, const float* mean,
                          const float* stdv, float* out, float* scale_out) {
  std::string p(path);
  std::vector<float> m(mean, mean + 3), s(stdv, stdv + 3);
  static_cast<Pool*>(pool)->submit([=]() -> bool {
    ImageU8 img = decode_file(p.c_str());
    if (!img.ok) return false;
    float scale = float(target) / std::max(img.w, img.h);
    int nw = std::max(1, int(std::round(img.w * scale)));
    int nh = std::max(1, int(std::round(img.h * scale)));
    std::vector<float> resized(size_t(nw) * nh * 3);
    // bicubic + black-then-normalize padding, matching det_transform and
    // csl_submit_distill_item above (PIL-parity path)
    resize_crop(img.data.data(), img.w, img.h, 0, 0, float(img.w), float(img.h),
                resized.data(), nw, nh, Kernel::kBicubic);
    normalize_inplace(resized.data(), size_t(nw) * nh, m.data(), s.data());
    float padv[3];
    compute_padv(m, s, padv);
    fill_pad_margins(out, target, target, 0, 0, nw, nh, padv);
    for (int y = 0; y < nh; ++y)
      memcpy(out + size_t(y) * target * 3, resized.data() + size_t(y) * nw * 3,
             size_t(nw) * 3 * sizeof(float));
    *scale_out = scale;
    return true;
  });
  return 0;
}

}  // extern "C"
