// Native batch image decoder for the rxtpu input pipeline.
//
// TPU-native replacement for the per-sample cv2.imdecode calls in the
// reference's DataLoader workers (cell_classifier/dataloader.py:141-146):
// one C call decodes a whole batch of grayscale JPEGs into a contiguous
// uint8 tensor using a std::thread pool over libjpeg, so Python's GIL and
// process-pool overheads are out of the hot path entirely. Also provides a
// batch grayscale JPEG *encoder* used by the PNG->JPEG conversion tool
// (reference png_to_jpeg.py).
//
// Build: g++ -O3 -shared -fPIC decoder.cpp -o librxtpu_decode.so \
//        -ljpeg -lz -lzstd
// (done automatically by rxtpu/data/decode.py at first import).

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdlib>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <zlib.h>
#include <zstd.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void silent_output(j_common_ptr) {}  // keep libjpeg warnings off stderr

// Decode one grayscale JPEG buffer into out[h*w]; returns 0 on success,
// negative on failure.
int decode_one(const uint8_t* buf, size_t len, uint8_t* out, int out_h,
               int out_w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = silent_output;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;  // corrupt stream
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  // reject wrong/oversized dimensions BEFORE start_decompress: a crafted
  // header declaring e.g. 65500x65500 would otherwise drive full-width
  // internal buffer allocation on every pool thread before the check.
  // No scaling is configured, so header dims == output dims.
  if (static_cast<int>(cinfo.image_height) != out_h ||
      static_cast<int>(cinfo.image_width) != out_w) {
    jpeg_destroy_decompress(&cinfo);
    return -3;  // unexpected dimensions
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != out_h ||
      static_cast<int>(cinfo.output_width) != out_w) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;  // unexpected dimensions
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * out_w;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Encode one grayscale plane to a libjpeg-allocated buffer (*mem). The
// caller owns *mem and must free it (also on failure, if non-null).
// *mem/*mem_size live in the CALLER's frame: locals of the function that
// contains setjmp must not be modified between setjmp and longjmp (UB),
// so the jpeg-managed output pointer is threaded in from outside.
int encode_one(const uint8_t* src, int h, int w, int quality,
               unsigned char** mem, unsigned long* mem_size) {
  jpeg_compress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = silent_output;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_compress(&cinfo);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, mem, mem_size);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 1;
  cinfo.in_color_space = JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<uint8_t*>(src) +
                   static_cast<size_t>(cinfo.next_scanline) * w;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  return 0;
}

// ---- PNG-style row pre-filter for the compressed rxpack ------------------
// Raw microscopy planes are spatially smooth, so a per-row predictive
// filter (the PNG none/sub/up/avg/paeth family, adaptive per row by the
// libpng minimum-sum-of-absolute-residuals heuristic) turns most bytes
// into near-zero residuals that deflate 2-4x instead of ~1.3x. The
// filtered layout per plane is h rows of [1 filter-id byte][w residual
// bytes]; planes of a view are concatenated.

inline int paeth_pred(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Filter one plane (h x w) into dst[h*(w+1)], choosing per row among the
// five PNG filters. Predictors reference the RAW previous row/column
// (encode side has the originals), matching the decode recurrence.
void filter_plane(const uint8_t* src, int64_t h, int64_t w, uint8_t* dst,
                  std::vector<uint8_t>& cand) {
  cand.resize(static_cast<size_t>(5) * w);
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* row = src + y * w;
    const uint8_t* up = y ? src + (y - 1) * w : nullptr;
    uint8_t* c[5];
    for (int f = 0; f < 5; ++f) c[f] = cand.data() + static_cast<size_t>(f) * w;
    for (int64_t x = 0; x < w; ++x) {
      int v = row[x];
      int a = x ? row[x - 1] : 0;
      int b = up ? up[x] : 0;
      int d = (x && up) ? up[x - 1] : 0;
      c[0][x] = static_cast<uint8_t>(v);
      c[1][x] = static_cast<uint8_t>(v - a);
      c[2][x] = static_cast<uint8_t>(v - b);
      c[3][x] = static_cast<uint8_t>(v - ((a + b) >> 1));
      c[4][x] = static_cast<uint8_t>(v - paeth_pred(a, b, d));
    }
    int best = 0;
    long best_cost = -1;
    for (int f = 0; f < 5; ++f) {
      long s = 0;
      for (int64_t x = 0; x < w; ++x) {
        int8_t sv = static_cast<int8_t>(c[f][x]);
        s += sv < 0 ? -static_cast<long>(sv) : sv;
      }
      if (best_cost < 0 || s < best_cost) { best_cost = s; best = f; }
    }
    uint8_t* d = dst + y * (w + 1);
    d[0] = static_cast<uint8_t>(best);
    std::memcpy(d + 1, c[best], static_cast<size_t>(w));
  }
}

// Reconstruct one plane from its filtered form; false on a corrupt
// filter id. Sequential per row (the sub/avg/paeth recurrences carry
// left-neighbor state), ~1 byte/ns scalar — parallelism comes from the
// per-view thread pool, not SIMD.
bool unfilter_plane(const uint8_t* f, int64_t h, int64_t w, uint8_t* dst) {
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* src = f + y * (w + 1);
    int ft = src[0];
    const uint8_t* row = src + 1;
    uint8_t* out = dst + y * w;
    const uint8_t* up = y ? dst + (y - 1) * w : nullptr;
    switch (ft) {
      case 0:
        std::memcpy(out, row, static_cast<size_t>(w));
        break;
      case 1: {
        int a = 0;
        for (int64_t x = 0; x < w; ++x) {
          a = (row[x] + a) & 0xFF;
          out[x] = static_cast<uint8_t>(a);
        }
        break;
      }
      case 2:
        if (up) {
          for (int64_t x = 0; x < w; ++x)
            out[x] = static_cast<uint8_t>(row[x] + up[x]);
        } else {
          std::memcpy(out, row, static_cast<size_t>(w));
        }
        break;
      case 3: {
        int a = 0;
        for (int64_t x = 0; x < w; ++x) {
          int b = up ? up[x] : 0;
          a = (row[x] + ((a + b) >> 1)) & 0xFF;
          out[x] = static_cast<uint8_t>(a);
        }
        break;
      }
      case 4: {
        int a = 0, c = 0;
        for (int64_t x = 0; x < w; ++x) {
          int b = up ? up[x] : 0;
          a = (row[x] + paeth_pred(a, b, c)) & 0xFF;
          c = b;
          out[x] = static_cast<uint8_t>(a);
        }
        break;
      }
      default:
        return false;  // corrupt filter id
    }
  }
  return true;
}

// ---- codec dispatch: zlib (codec 0) or zstd (codec 1) --------------------
// zstd decompresses 3-5x faster than zlib at comparable ratios, which is
// what makes a lossless compressed rxpack meet the <2% input-stall target
// on a reference-core host (zlib inflate alone needed >14 cores). Level
// semantics differ per codec: zlib 1-9, zstd 1-22 (compression is a
// one-time pack cost; decompression speed is level-independent for zstd).

// Compress src[n] into dst[cap]; returns compressed size, or 0 on failure.
size_t compress_any(int codec, uint8_t* dst, size_t cap, const uint8_t* src,
                    size_t n, int level) {
  if (codec == 1) {
    size_t r = ZSTD_compress(dst, cap, src, n, level);
    return ZSTD_isError(r) ? 0 : r;
  }
  uLongf dst_len = static_cast<uLongf>(cap);
  if (compress2(dst, &dst_len, src, static_cast<uLong>(n), level) != Z_OK)
    return 0;
  return static_cast<size_t>(dst_len);
}

// Decompress src[n] into dst[cap]; returns decompressed size, 0 on failure.
size_t decompress_any(int codec, uint8_t* dst, size_t cap, const uint8_t* src,
                      size_t n) {
  if (codec == 1) {
    size_t r = ZSTD_decompress(dst, cap, src, n);
    return ZSTD_isError(r) ? 0 : r;
  }
  uLongf dst_len = static_cast<uLongf>(cap);
  if (uncompress(dst, &dst_len, src, static_cast<uLong>(n)) != Z_OK) return 0;
  return static_cast<size_t>(dst_len);
}

// Shared thread-pool policy: clamp nthreads, hand out items via an atomic
// counter, count failures. fn(i, scratch) returns true on success;
// `scratch` is a per-thread reusable byte buffer (file reads).
template <typename F>
int run_pool(int n, int nthreads, F&& fn) {
  if (nthreads <= 0) nthreads = static_cast<int>(std::thread::hardware_concurrency());
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    std::vector<uint8_t> scratch;
    int i;
    while ((i = next.fetch_add(1)) < n) {
      if (!fn(i, scratch)) failures.fetch_add(1);
    }
  };
  if (nthreads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failures.load();
}

}  // namespace

extern "C" {

// Decode n grayscale JPEGs (concatenated in `data` at `offsets`/`lengths`)
// into out[n, out_h, out_w]. Returns number of failures; failed slots are
// zero-filled. nthreads <= 0 selects hardware concurrency.
int rxtpu_decode_batch(const uint8_t* data, const int64_t* offsets,
                       const int64_t* lengths, int n, uint8_t* out, int out_h,
                       int out_w, int nthreads) {
  const size_t plane = static_cast<size_t>(out_h) * out_w;
  return run_pool(n, nthreads, [&](int i, std::vector<uint8_t>&) {
    uint8_t* dst = out + plane * i;
    int rc = decode_one(data + offsets[i], static_cast<size_t>(lengths[i]),
                        dst, out_h, out_w);
    if (rc != 0) std::memset(dst, 0, plane);
    return rc == 0;
  });
}

// Read + decode n grayscale JPEG FILES into out[n, out_h, out_w]: the whole
// open/read/decode path runs inside the thread pool, so the Python side of
// the input pipeline only assembles path lists (no per-file IO under the
// GIL). paths = concatenated NUL-terminated strings. Returns failure count;
// failed slots zero-fill.
int rxtpu_decode_files(const char* paths, const int64_t* path_offsets, int n,
                       uint8_t* out, int out_h, int out_w, int nthreads) {
  const size_t plane = static_cast<size_t>(out_h) * out_w;
  return run_pool(n, nthreads, [&](int i, std::vector<uint8_t>& buf) {
    uint8_t* dst = out + plane * i;
    const char* path = paths + path_offsets[i];
    FILE* f = fopen(path, "rb");
    bool ok = false;
    if (f) {
      fseek(f, 0, SEEK_END);
      long sz = ftell(f);
      fseek(f, 0, SEEK_SET);
      if (sz > 0) {
        buf.resize(static_cast<size_t>(sz));
        if (fread(buf.data(), 1, static_cast<size_t>(sz), f) ==
            static_cast<size_t>(sz)) {
          ok = decode_one(buf.data(), static_cast<size_t>(sz), dst, out_h,
                          out_w) == 0;
        }
      }
      fclose(f);
    }
    if (!ok) std::memset(dst, 0, plane);
    return ok;
  });
}

// Encode n grayscale planes in[n, h, w] to JPEG (quality q) into per-slot
// buffers out + i*cap; out_lengths[i] receives the encoded size (0 on
// failure/overflow). Returns number of failures.
int rxtpu_encode_batch(const uint8_t* in, int n, int h, int w, int quality,
                       uint8_t* out, int64_t cap, int64_t* out_lengths,
                       int nthreads) {
  const size_t plane = static_cast<size_t>(h) * w;
  return run_pool(n, nthreads, [&](int i, std::vector<uint8_t>&) {
    unsigned char* mem = nullptr;
    unsigned long mem_size = 0;
    int rc = encode_one(in + plane * i, h, w, quality, &mem, &mem_size);
    bool ok = rc == 0 && static_cast<int64_t>(mem_size) <= cap;
    if (ok) {
      std::memcpy(out + static_cast<size_t>(cap) * i, mem, mem_size);
      out_lengths[i] = static_cast<int64_t>(mem_size);
    } else {
      out_lengths[i] = 0;
    }
    if (mem) free(mem);
    return ok;
  });
}

// Inflate n zlib/zstd streams (concatenated in `data` at
// `offsets`/`lengths`, codec 0=zlib 1=zstd) into out[n * item_bytes].
// Used by the compressed rxpack reader: storage-bandwidth-bound hosts
// trade pool-thread CPU for a ~2-4x smaller pack. Every stream must
// decompress to EXACTLY item_bytes (fixed-size raw views);
// short/long/corrupt streams count as failures and zero-fill.
int rxtpu_inflate_batch(const uint8_t* data, const int64_t* offsets,
                        const int64_t* lengths, int n, uint8_t* out,
                        int64_t item_bytes, int codec, int nthreads) {
  const size_t item = static_cast<size_t>(item_bytes);
  return run_pool(n, nthreads, [&](int i, std::vector<uint8_t>&) {
    uint8_t* dst = out + item * i;
    size_t got = decompress_any(codec, dst, item, data + offsets[i],
                                static_cast<size_t>(lengths[i]));
    bool ok = (got == item);
    if (!ok) std::memset(dst, 0, item);
    return ok;
  });
}

// Filter (optional) + deflate n raw views in[n, c, h, w] into per-slot
// buffers out + i*cap; out_lengths[i] receives the compressed size (0 on
// failure/overflow). use_filter selects the PNG-style per-row adaptive
// pre-filter (see filter_plane); codec 0=zlib 1=zstd. Returns number of
// failures.
int rxtpu_deflate_filtered_batch(const uint8_t* in, int n, int64_t c,
                                 int64_t h, int64_t w, int level,
                                 int use_filter, uint8_t* out, int64_t cap,
                                 int64_t* out_lengths, int codec,
                                 int nthreads) {
  const size_t view = static_cast<size_t>(c) * h * w;
  const size_t filtered = static_cast<size_t>(c) * h * (w + 1);
  return run_pool(n, nthreads, [&](int i, std::vector<uint8_t>& scratch) {
    const uint8_t* src = in + view * i;
    size_t got;
    if (use_filter) {
      scratch.resize(filtered);
      std::vector<uint8_t> cand;  // 5-row candidate workspace (tiny)
      for (int64_t p = 0; p < c; ++p)
        filter_plane(src + p * h * w, h, w,
                     scratch.data() + static_cast<size_t>(p) * h * (w + 1),
                     cand);
      got = compress_any(codec, out + static_cast<size_t>(cap) * i,
                         static_cast<size_t>(cap), scratch.data(), filtered,
                         level);
    } else {
      got = compress_any(codec, out + static_cast<size_t>(cap) * i,
                         static_cast<size_t>(cap), src, view, level);
    }
    out_lengths[i] = static_cast<int64_t>(got);
    return got != 0;
  });
}

// Inflate + unfilter n filtered zlib/zstd streams (located in `data` by
// `offsets`/`lengths`, codec 0=zlib 1=zstd) into out[n, c, h, w]. The
// inverse of rxtpu_deflate_filtered_batch(use_filter=1): each stream must
// decompress to exactly c*h*(w+1) bytes. Failures zero-fill; returns the
// failure count.
int rxtpu_inflate_unfilter_batch(const uint8_t* data, const int64_t* offsets,
                                 const int64_t* lengths, int n, uint8_t* out,
                                 int64_t c, int64_t h, int64_t w, int codec,
                                 int nthreads) {
  const size_t view = static_cast<size_t>(c) * h * w;
  const size_t filtered = static_cast<size_t>(c) * h * (w + 1);
  return run_pool(n, nthreads, [&](int i, std::vector<uint8_t>& scratch) {
    uint8_t* dst = out + view * i;
    scratch.resize(filtered);
    size_t got = decompress_any(codec, scratch.data(), filtered,
                                data + offsets[i],
                                static_cast<size_t>(lengths[i]));
    bool ok = (got == filtered);
    for (int64_t p = 0; ok && p < c; ++p)
      ok = unfilter_plane(scratch.data() + static_cast<size_t>(p) * h * (w + 1),
                          h, w, dst + p * h * w);
    if (!ok) std::memset(dst, 0, view);
    return ok;
  });
}

}  // extern "C"
