// Host-side image preprocessing for the multimodal data path.
//
// The training loader and the ModalSampler need: JPEG decode -> bicubic
// resize to the vision resolution (384x384) -> float32 CHW in [0, 1].
// Doing this in Python (PIL) is the per-example host bottleneck when
// feeding the TPU during SFT; this library does the same work in C++ with
// libjpeg and a PIL-compatible separable bicubic (Catmull-Rom a=-0.5,
// support widened by the scale factor when downscaling, exactly PIL's
// antialias resampling), parallelized across a batch with std::thread.
//
// Exposed as a plain C ABI consumed via ctypes
// (cadence_gemma_tpu/utils/image_cpp.py); build with native/Makefile.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decodes a JPEG file to interleaved RGB8. Returns false on failure.
bool DecodeJpeg(const char* path, std::vector<uint8_t>* rgb, int* width,
                int* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *width = static_cast<int>(cinfo.output_width);
  *height = static_cast<int>(cinfo.output_height);
  const int row_stride = *width * 3;
  rgb->resize(static_cast<size_t>(row_stride) * *height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() +
                   static_cast<size_t>(cinfo.output_scanline) * row_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// PIL-compatible bicubic kernel (Catmull-Rom, a = -0.5).
inline double BicubicKernel(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct ResamplePlan {
  int taps;                     // kernel taps per output position
  std::vector<int> bounds;      // [out] first input index
  std::vector<int> counts;      // [out] active taps
  std::vector<double> weights;  // [out * taps]
};

// Matches PIL's precompute_coeffs: support widens by the scale factor when
// downscaling (antialiasing).
ResamplePlan PlanResample(int in_size, int out_size) {
  const double filterscale = std::max(
      static_cast<double>(in_size) / out_size, 1.0);
  const double support = 2.0 * filterscale;  // bicubic support = 2
  const int taps = static_cast<int>(std::ceil(support)) * 2 + 1;

  ResamplePlan plan;
  plan.taps = taps;
  plan.bounds.resize(out_size);
  plan.counts.resize(out_size);
  plan.weights.assign(static_cast<size_t>(out_size) * taps, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * in_size / out_size;
    int xmin = static_cast<int>(center - support + 0.5);
    xmin = std::max(xmin, 0);
    int xmax = static_cast<int>(center + support + 0.5);
    xmax = std::min(xmax, in_size);
    double* w = &plan.weights[static_cast<size_t>(xx) * taps];
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      const double v = BicubicKernel((x - center + 0.5) / filterscale);
      w[x - xmin] = v;
      total += v;
    }
    if (total != 0.0) {
      for (int i = 0; i < xmax - xmin; ++i) w[i] /= total;
    }
    plan.bounds[xx] = xmin;
    plan.counts[xx] = xmax - xmin;
  }
  return plan;
}

// Pillow's 8-bit fixed-point pipeline: int16-quantized coefficients
// (PRECISION_BITS = 32 - 8 - 2) and a uint8-rounded+clipped intermediate
// between the horizontal and vertical passes. Reproducing it bit-for-bit
// matters because the reference preprocesses with PIL-backed transforms.
constexpr int kPrecisionBits = 32 - 8 - 2;

std::vector<int32_t> QuantizeCoeffs(const ResamplePlan& plan, int out_size) {
  std::vector<int32_t> kk(static_cast<size_t>(out_size) * plan.taps, 0);
  for (int xx = 0; xx < out_size; ++xx) {
    for (int i = 0; i < plan.counts[xx]; ++i) {
      const double w = plan.weights[static_cast<size_t>(xx) * plan.taps + i];
      const double v = w * (1 << kPrecisionBits);
      kk[static_cast<size_t>(xx) * plan.taps + i] = static_cast<int32_t>(
          v < 0.0 ? v - 0.5 : v + 0.5);
    }
  }
  return kk;
}

inline uint8_t Clip8(int64_t v) {
  v >>= kPrecisionBits;
  return static_cast<uint8_t>(std::min<int64_t>(std::max<int64_t>(v, 0), 255));
}

// Separable resize of interleaved RGB8 [h, w] to float32 CHW [3, out, out]
// scaled to [0, 1], matching PIL.Image.resize(..., BICUBIC) exactly.
void ResizeToChw(const uint8_t* rgb, int in_w, int in_h, int out_size,
                 float* out) {
  const ResamplePlan xplan = PlanResample(in_w, out_size);
  const ResamplePlan yplan = PlanResample(in_h, out_size);
  const std::vector<int32_t> xk = QuantizeCoeffs(xplan, out_size);
  const std::vector<int32_t> yk = QuantizeCoeffs(yplan, out_size);
  const int64_t half = 1 << (kPrecisionBits - 1);

  // Horizontal pass: [in_h, out_size, 3] uint8 (PIL keeps uint8 between
  // passes).
  std::vector<uint8_t> tmp(static_cast<size_t>(in_h) * out_size * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = rgb + static_cast<size_t>(y) * in_w * 3;
    for (int xx = 0; xx < out_size; ++xx) {
      const int32_t* k = &xk[static_cast<size_t>(xx) * xplan.taps];
      const int xmin = xplan.bounds[xx];
      const int count = xplan.counts[xx];
      int64_t acc[3] = {half, half, half};
      for (int i = 0; i < count; ++i) {
        const uint8_t* px = row + static_cast<size_t>(xmin + i) * 3;
        acc[0] += static_cast<int64_t>(k[i]) * px[0];
        acc[1] += static_cast<int64_t>(k[i]) * px[1];
        acc[2] += static_cast<int64_t>(k[i]) * px[2];
      }
      uint8_t* dst = &tmp[(static_cast<size_t>(y) * out_size + xx) * 3];
      dst[0] = Clip8(acc[0]);
      dst[1] = Clip8(acc[1]);
      dst[2] = Clip8(acc[2]);
    }
  }

  // Vertical pass straight into CHW planes, scaling to [0, 1].
  const size_t plane = static_cast<size_t>(out_size) * out_size;
  for (int yy = 0; yy < out_size; ++yy) {
    const int32_t* k = &yk[static_cast<size_t>(yy) * yplan.taps];
    const int ymin = yplan.bounds[yy];
    const int count = yplan.counts[yy];
    for (int xx = 0; xx < out_size; ++xx) {
      int64_t acc[3] = {half, half, half};
      for (int i = 0; i < count; ++i) {
        const uint8_t* px =
            &tmp[(static_cast<size_t>(ymin + i) * out_size + xx) * 3];
        acc[0] += static_cast<int64_t>(k[i]) * px[0];
        acc[1] += static_cast<int64_t>(k[i]) * px[1];
        acc[2] += static_cast<int64_t>(k[i]) * px[2];
      }
      const size_t pos = static_cast<size_t>(yy) * out_size + xx;
      for (int c = 0; c < 3; ++c) {
        out[c * plane + pos] = static_cast<float>(Clip8(acc[c])) / 255.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode + resize one JPEG into out[3 * size * size] (CHW float32, [0,1]).
// Returns 0 on success, nonzero on failure.
int imageproc_load_jpeg(const char* path, int size, float* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!DecodeJpeg(path, &rgb, &w, &h)) return 1;
  ResizeToChw(rgb.data(), w, h, size, out);
  return 0;
}

// Resize a raw RGB8 buffer [h, w, 3] (e.g. from any decoder) likewise.
int imageproc_resize_rgb(const uint8_t* rgb, int w, int h, int size,
                         float* out) {
  if (w <= 0 || h <= 0 || size <= 0) return 1;
  ResizeToChw(rgb, w, h, size, out);
  return 0;
}

// Batched loader: n paths (NUL-separated) into out[n, 3, size, size], using
// up to `threads` worker threads. Returns the number of failures.
int imageproc_load_batch(const char* paths, int n, int size, float* out,
                         int threads) {
  std::vector<std::string> files;
  files.reserve(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    files.emplace_back(p);
    p += files.back().size() + 1;
  }

  const size_t stride = 3ull * size * size;
  std::vector<int> failures(n, 0);
  threads = std::max(1, std::min<int>(threads, n));
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += threads) {
        failures[i] =
            imageproc_load_jpeg(files[i].c_str(), size, out + stride * i);
      }
    });
  }
  for (auto& th : pool) th.join();

  int total = 0;
  for (int f : failures) total += f;
  return total;
}

}  // extern "C"
