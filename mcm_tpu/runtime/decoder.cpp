// mcm_tpu native host pipeline: JPEG decode + resize + center crop.
//
// The eval hot path feeds the TPU uint8 [224,224,3] batches; Python/PIL
// decode tops out well below device throughput (GIL + per-image Python
// overhead). This translation unit provides a GIL-free batch decoder:
//   * libjpeg decompression, optionally DCT-prescaled (fast mode decodes
//     at 1/2, 1/4 or 1/8 scale when the target is much smaller);
//   * separable antialiased triangle-filter (bilinear) resample of the
//     shorter side to `out_size` — the same filter geometry PIL uses, so
//     output matches the reference torchvision pipeline
//     (train_eval_util.py:29-31) within rounding;
//   * torchvision-rounding center crop;
//   * an std::thread pool for whole-batch decoding.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <jerror.h>  // JWRN_* codes for warning classification

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
  long serious_warnings;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Keep worker threads from spamming stderr with libjpeg corruption
// warnings; SERIOUS warnings still fail the decode below.
void output_message(j_common_ptr) {}

// Classify warnings instead of failing on any (round-2 advisory): junk
// bytes between/after entropy segments (JWRN_EXTRANEOUS_DATA) and
// metadata oddities leave the decoded pixels untouched and PIL accepts
// such files without raising — pushing them onto the per-image PIL
// fallback would only cost throughput.  Everything else (premature EOF,
// bad Huffman/arith codes, marker resync) means libjpeg invented pixel
// data, where the PIL reference path raises — those must keep failing
// the native decode so the fallback reproduces reference behavior.
void emit_message(j_common_ptr cinfo, int msg_level) {
  if (msg_level >= 0) return;  // trace chatter, not a warning
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  const int code = cinfo->err->msg_code;
  const bool benign = code == JWRN_EXTRANEOUS_DATA ||
                      code == JWRN_JFIF_MAJOR ||
                      code == JWRN_ADOBE_XFORM;
  if (!benign) err->serious_warnings++;
  cinfo->err->num_warnings++;  // keep libjpeg's own bookkeeping intact
}

// Decode a JPEG from either an open file (f != nullptr) or an in-memory
// buffer (serving path: request bodies never touch the filesystem) into an
// RGB buffer. Returns false on any failure. In fast mode, asks libjpeg for
// the smallest M/8 DCT scale that keeps the shorter side >= out_size; the
// triangle downfilter finishes the job. The caller owns `f`.
bool decode_jpeg_src(FILE* f, const unsigned char* buf, unsigned long len,
                     int out_size, bool fast,
                     std::vector<unsigned char>& rgb, int& w, int& h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = output_message;
  jerr.pub.emit_message = emit_message;
  jerr.serious_warnings = 0;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  if (f) {
    jpeg_stdio_src(&cinfo, f);
  } else {
    // libjpeg 9's jpeg_mem_src takes unsigned char* (non-const); the
    // source manager never writes through it
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), len);
  }
  jpeg_read_header(&cinfo, TRUE);
  // Decompression-bomb guard: the serving path decodes untrusted bytes,
  // and a ~1 KB JPEG whose SOF declares 65500x65500 would force a
  // ~12.9 GB rgb allocation per pool thread.  Cap at PIL's default
  // MAX_IMAGE_PIXELS (89,478,485) so a native reject falls back to the
  // PIL path with its own bomb policy (warn above 1x, raise above 2x),
  // bounding native allocations at ~256 MB/thread while keeping
  // accepted-image behavior identical to the reference pipeline.
  if (static_cast<double>(cinfo.image_width) *
          static_cast<double>(cinfo.image_height) > 89478485.0) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;

  if (fast && out_size > 0) {
    // Smallest M/8 DCT-domain prescale keeping the shorter side >= target
    // (libjpeg supports any M in 1..16; DCT-domain scaling is a proper
    // low-pass, the triangle filter finishes the remaining <=12.5%).
    const int shorter = std::min<int>(cinfo.image_width, cinfo.image_height);
    int M = 8;
    while (M > 1 &&
           static_cast<long>(shorter) * (M - 1) / 8 >= out_size) --M;
    cinfo.scale_num = M;
    cinfo.scale_denom = 8;
    cinfo.dct_method = JDCT_IFAST;       // SIMD fast IDCT
    cinfo.do_fancy_upsampling = FALSE;   // the downfilter erases the diff
  }

  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  const int stride = w * cinfo.output_components;
  try {
    rgb.resize(static_cast<size_t>(stride) * h);
  } catch (...) {  // bad_alloc must not leak the live libjpeg state
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() +
        static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  const int comps = cinfo.output_components;
  jpeg_finish_decompress(&cinfo);
  // Corrupt-entropy data (e.g. a truncated scan) is a *warning* in libjpeg:
  // it fakes an EOI and fills the remaining MCU rows with gray, returning
  // "success".  The PIL reference path raises for such files, so silently
  // accepting them would diverge scores — fail here and let the per-image
  // PIL fallback reproduce the reference behavior exactly.  Benign
  // warnings (extraneous bytes, metadata oddities) are filtered by
  // emit_message above: pixels are unaffected and PIL accepts them.
  const long warnings = jerr.serious_warnings;
  jpeg_destroy_decompress(&cinfo);
  // JCS_RGB above makes libjpeg do gray->RGB itself, so comps is 3 for
  // every color space it can convert (it error_exits on ones it can't).
  return comps == 3 && warnings == 0;
}

bool decode_jpeg(const char* path, int out_size, bool fast,
                 std::vector<unsigned char>& rgb, int& w, int& h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  const bool ok = decode_jpeg_src(f, nullptr, 0, out_size, fast, rgb, w, h);
  std::fclose(f);
  return ok;
}

// PIL-geometry triangle filter coefficients for in_size -> out_size.
struct Filter {
  std::vector<int> xmin, xlen;
  std::vector<float> weights;  // packed per output index
  int max_len = 0;
};

// Coefficients only for output indices [lo, hi) — the crop consumes just a
// `size`-wide window, and building the full output range is O(out_size)
// work+memory that explodes on extreme aspect ratios (1×65000 source →
// 14.5M-row vertical filter of which 224 rows are read).  Index the
// returned arrays by (i - lo); per-index geometry is unchanged, so the
// window is bit-identical to slicing a full filter.
Filter build_filter(int in_size, int out_size, int lo, int hi) {
  Filter flt;
  const int count = hi - lo;
  const double scale = static_cast<double>(in_size) / out_size;
  const double fscale = std::max(scale, 1.0);
  const double support = 1.0 * fscale;
  flt.xmin.resize(count);
  flt.xlen.resize(count);
  flt.max_len = static_cast<int>(std::ceil(support)) * 2 + 2;
  flt.weights.assign(static_cast<size_t>(count) * flt.max_len, 0.f);
  for (int i = lo; i < hi; ++i) {
    const int k = i - lo;
    const double center = (i + 0.5) * scale;
    int xmin = std::max(static_cast<int>(center - support + 0.5), 0);
    int xmax = std::min(static_cast<int>(center + support + 0.5), in_size);
    double total = 0.0;
    std::vector<double> w(xmax - xmin);
    for (int x = xmin; x < xmax; ++x) {
      double t = 1.0 - std::fabs((x + 0.5 - center) / fscale);
      w[x - xmin] = t > 0.0 ? t : 0.0;
      total += w[x - xmin];
    }
    flt.xmin[k] = xmin;
    flt.xlen[k] = xmax - xmin;
    for (int j = 0; j < xmax - xmin; ++j) {
      flt.weights[static_cast<size_t>(k) * flt.max_len + j] =
          total > 0 ? static_cast<float>(w[j] / total) : 0.f;
    }
    if (total <= 0 && xmax > xmin) {
      flt.weights[static_cast<size_t>(k) * flt.max_len] = 1.f;
    }
  }
  return flt;
}

inline unsigned char clamp_u8(float v) {
  int r = static_cast<int>(v + 0.5f);
  return static_cast<unsigned char>(r < 0 ? 0 : (r > 255 ? 255 : r));
}

// Python round() (banker's: ties to even) for the crop offset — torchvision
// computes int(round((dim - size) / 2.0)); std::lround rounds .5 away from
// zero and shifts the crop window one pixel on ~1/4 of non-square images.
inline long python_round_half(double v) {
  const double f = std::floor(v);
  if (v - f == 0.5) {
    const long lf = static_cast<long>(f);
    return (lf % 2 == 0) ? lf : lf + 1;
  }
  return std::lround(v);
}

// Shorter-side resize to `size`, then torchvision-rounded center crop to
// size x size. src is RGB w x h.
void resize_crop(const std::vector<unsigned char>& src, int w, int h,
                 int size, unsigned char* out) {
  int ow, oh;
  if (w <= h) {
    ow = size;
    oh = static_cast<int>(static_cast<long long>(size) * h / w);
  } else {
    oh = size;
    ow = static_cast<int>(static_cast<long long>(size) * w / h);
  }
  if (w == ow && h == oh) {
    const int top = static_cast<int>(python_round_half((h - size) / 2.0));
    const int left = static_cast<int>(python_round_half((w - size) / 2.0));
    for (int y = 0; y < size; ++y) {
      std::memcpy(out + static_cast<size_t>(y) * size * 3,
                  src.data() + ((static_cast<size_t>(top + y) * w) + left) * 3,
                  static_cast<size_t>(size) * 3);
    }
    return;
  }

  // The crop windows are known up front, so the horizontal pass computes
  // ONLY the cropped column window (same filter weights → bit-identical to
  // cropping afterwards) and the vertical pass runs as contiguous weighted
  // row accumulation (auto-vectorizes; the strided per-pixel gather it
  // replaces was the pass's cache bottleneck).
  const int top = static_cast<int>(python_round_half((oh - size) / 2.0));
  const int left = static_cast<int>(python_round_half((ow - size) / 2.0));

  // horizontal pass: w -> columns [left, left+size) of the ow-wide resize
  Filter fh = build_filter(w, ow, left, left + size);
  std::vector<float> tmp(static_cast<size_t>(size) * h * 3);
  for (int y = 0; y < h; ++y) {
    const unsigned char* row = src.data() + static_cast<size_t>(y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      const float* wts = &fh.weights[static_cast<size_t>(x) * fh.max_len];
      const int x0 = fh.xmin[x], n = fh.xlen[x];
      float r = 0.f, g = 0.f, b = 0.f;
      for (int j = 0; j < n; ++j) {
        const unsigned char* px = row + (x0 + j) * 3;
        r += wts[j] * px[0];
        g += wts[j] * px[1];
        b += wts[j] * px[2];
      }
      trow[x * 3] = r;
      trow[x * 3 + 1] = g;
      trow[x * 3 + 2] = b;
    }
  }

  // vertical pass h -> rows [top, top+size), accumulating whole rows
  Filter fv = build_filter(h, oh, top, top + size);
  const int row_elems = size * 3;
  std::vector<float> acc(row_elems);
  for (int y = 0; y < size; ++y) {
    const float* wts = &fv.weights[static_cast<size_t>(y) * fv.max_len];
    const int y0 = fv.xmin[y], n = fv.xlen[y];
    std::fill(acc.begin(), acc.end(), 0.f);
    for (int j = 0; j < n; ++j) {
      const float wj = wts[j];
      const float* srow = tmp.data() + static_cast<size_t>(y0 + j) * row_elems;
      for (int k = 0; k < row_elems; ++k) acc[k] += wj * srow[k];
    }
    unsigned char* orow = out + static_cast<size_t>(y) * row_elems;
    for (int k = 0; k < row_elems; ++k) orow[k] = clamp_u8(acc[k]);
  }
}

// Shared thread-pool driver for the extern-C batch entry points below
// (defined here: templates cannot carry C language linkage).
template <typename DecodeOne>
int run_pool(int n, int n_threads, int* status, DecodeOne decode_one) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const int rc = decode_one(i);
      status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  const int k = std::min(n_threads, n);
  try {
    pool.reserve(k);
    // k - 1: the calling thread always joins the work below, so thread
    // exhaustion (std::system_error from std::thread) can never abort
    // the batch — with zero spawned threads it degrades to serial
    for (int t = 0; t < k - 1; ++t) pool.emplace_back(worker);
  } catch (...) {
    // whatever threads did spawn keep draining `next`; fall through
  }
  worker();
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // namespace

extern "C" {

// Decode one image file to out[size*size*3]. Returns 0 on success.
// No C++ exception may cross this extern "C" boundary (ctypes cannot
// unwind it; from a pool thread it would std::terminate the process) —
// bad_alloc in the resample buffers/filters maps to status 3 and the
// caller's per-image PIL fallback.
int mcm_decode_one(const char* path, int size, unsigned char* out, int fast) {
  try {
    std::vector<unsigned char> rgb;
    int w = 0, h = 0;
    if (!decode_jpeg(path, size, fast != 0, rgb, w, h)) return 1;
    if (w < 1 || h < 1) return 2;
    resize_crop(rgb, w, h, size, out);
    return 0;
  } catch (...) {
    return 3;
  }
}

// Decode one in-memory JPEG (e.g. an HTTP request body) to
// out[size*size*3]. Returns 0 on success. Same no-throw contract as
// mcm_decode_one.
int mcm_decode_mem(const unsigned char* data, long len, int size,
                   unsigned char* out, int fast) {
  try {
    if (!data || len <= 0) return 1;
    std::vector<unsigned char> rgb;
    int w = 0, h = 0;
    if (!decode_jpeg_src(nullptr, data, static_cast<unsigned long>(len),
                         size, fast != 0, rgb, w, h)) {
      return 1;
    }
    if (w < 1 || h < 1) return 2;
    resize_crop(rgb, w, h, size, out);
    return 0;
  } catch (...) {
    return 3;
  }
}

// Decode n files with a thread pool into out[n*size*size*3];
// status[i] = per-image return code. Returns count of failures.
int mcm_decode_batch(const char** paths, int n, int size, unsigned char* out,
                     int n_threads, int fast, int* status) {
  return run_pool(n, n_threads, status, [&](int i) {
    return mcm_decode_one(
        paths[i], size, out + static_cast<size_t>(i) * size * size * 3,
        fast);
  });
}

// Decode n in-memory JPEGs (serving bulk requests) with a thread pool.
// datas[i]/lens[i] describe each buffer; same out/status contract as
// mcm_decode_batch.
int mcm_decode_mem_batch(const unsigned char** datas, const long* lens,
                         int n, int size, unsigned char* out, int n_threads,
                         int fast, int* status) {
  return run_pool(n, n_threads, status, [&](int i) {
    return mcm_decode_mem(
        datas[i], lens[i], size,
        out + static_cast<size_t>(i) * size * size * 3, fast);
  });
}

}  // extern "C"
