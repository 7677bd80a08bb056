// mtgv_native — native host-side IO/runtime for mtgvision_tpu.
//
// The reference delegates all native compute to libraries (SURVEY.md §2.4:
// zero in-repo native code; OpenCV/libjpeg under cv2 do the host work).
// This library is the in-repo equivalent for the host hot paths that feed
// the TPU:
//   * JPEG decode (serving ingest path: every websocket frame,
//     mtgvision/server.py:273-274) with optional fused DCT-scaled decode +
//     bilinear resize — decode at 1/2^k via libjpeg's scale_num for big
//     downsamples, then resize exactly.
//   * JPEG encode (per-track thumbnails, server.py:222-225).
//   * a pthread worker pool for batch decode of catalog/background images
//     (data/catalog.py loading path).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
// Build: g++ -O3 -march=native -shared -fPIC -o libmtgv_native.so \
//        mtgv_native.cpp -ljpeg -lpthread

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <jpeglib.h>
#include <pthread.h>

#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// error handling: libjpeg longjmp trampoline (default handler exits the
// process — unacceptable inside a server)
// ---------------------------------------------------------------------------

struct mtgv_err_mgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

static void mtgv_error_exit(j_common_ptr cinfo) {
  mtgv_err_mgr *err = reinterpret_cast<mtgv_err_mgr *>(cinfo->err);
  longjmp(err->jump, 1);
}

// ---------------------------------------------------------------------------
// decode
// ---------------------------------------------------------------------------

// Decode a JPEG buffer to RGB8. Returns 0 on success, -1 on decode error,
// -2 if the output buffer is too small. On success *w/*h are set and `out`
// holds h*w*3 bytes.
int mtgv_decode_jpeg(const uint8_t *buf, size_t len, uint8_t *out,
                     size_t out_cap, int *w, int *h) {
  jpeg_decompress_struct cinfo;
  mtgv_err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = mtgv_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int W = cinfo.output_width, H = cinfo.output_height;
  if (static_cast<size_t>(W) * H * 3 > out_cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = out + static_cast<size_t>(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *w = W;
  *h = H;
  return 0;
}

// Bilinear RGB8 resize.
static void resize_bilinear(const uint8_t *src, int sh, int sw, uint8_t *dst,
                            int dh, int dw) {
  const float ry = dh > 1 ? float(sh - 1) / float(dh - 1) : 0.f;
  const float rx = dw > 1 ? float(sw - 1) / float(dw - 1) : 0.f;
  for (int y = 0; y < dh; ++y) {
    float fy = y * ry;
    int y0 = int(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = x * rx;
      int x0 = int(fx);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * sw + x0) * 3 + c];
        float v01 = src[(y0 * sw + x1) * 3 + c];
        float v10 = src[(y1 * sw + x0) * 3 + c];
        float v11 = src[(y1 * sw + x1) * 3 + c];
        float top = v00 * (1 - wx) + v01 * wx;
        float bot = v10 * (1 - wx) + v11 * wx;
        dst[(y * dw + x) * 3 + c] = uint8_t(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

// Decode + resize to exactly (th, tw) RGB8. Uses libjpeg DCT scaling (1/2^k)
// to avoid decoding full resolution for large downsamples, then bilinear to
// the final size. Returns 0 on success.
int mtgv_decode_jpeg_resize(const uint8_t *buf, size_t len, int th, int tw,
                            uint8_t *out) {
  jpeg_decompress_struct cinfo;
  mtgv_err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = mtgv_error_exit;
  std::vector<uint8_t> tmp;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // pick the smallest 1/2^k DCT scale that still covers the target
  int denom = 1;
  while (denom < 8 && int(cinfo.image_width) / (denom * 2) >= tw &&
         int(cinfo.image_height) / (denom * 2) >= th)
    denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);
  const int W = cinfo.output_width, H = cinfo.output_height;
  tmp.resize(static_cast<size_t>(W) * H * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = tmp.data() + static_cast<size_t>(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  resize_bilinear(tmp.data(), H, W, out, th, tw);
  return 0;
}

// ---------------------------------------------------------------------------
// encode
// ---------------------------------------------------------------------------

// Encode RGB8 (h, w) to JPEG at `quality`. Writes up to out_cap bytes into
// out; returns the JPEG size or -1/-2 on error/overflow.
long mtgv_encode_jpeg(const uint8_t *rgb, int h, int w, int quality,
                      uint8_t *out, size_t out_cap) {
  jpeg_compress_struct cinfo;
  mtgv_err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = mtgv_error_exit;
  unsigned char *mem = nullptr;
  unsigned long mem_size = 0;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_compress(&cinfo);
    if (mem) free(mem);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &mem, &mem_size);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<uint8_t *>(rgb) +
                   static_cast<size_t>(cinfo.next_scanline) * w * 3;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  long size = static_cast<long>(mem_size);
  if (static_cast<size_t>(size) > out_cap) {
    free(mem);
    return -2;
  }
  memcpy(out, mem, size);
  free(mem);
  return size;
}

// ---------------------------------------------------------------------------
// threaded batch decode+resize (the catalog/background loading hot path)
// ---------------------------------------------------------------------------

struct BatchJob {
  const uint8_t *const *bufs;
  const size_t *lens;
  uint8_t *out;  // (n, th, tw, 3) contiguous
  int th, tw, n;
  int *status;  // per-image return codes
  int next;     // work index
  pthread_mutex_t mu;
};

static void *batch_worker(void *arg) {
  BatchJob *job = static_cast<BatchJob *>(arg);
  for (;;) {
    pthread_mutex_lock(&job->mu);
    int i = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (i >= job->n) break;
    job->status[i] = mtgv_decode_jpeg_resize(
        job->bufs[i], job->lens[i], job->th, job->tw,
        job->out + static_cast<size_t>(i) * job->th * job->tw * 3);
  }
  return nullptr;
}

// Decode n JPEG buffers to a contiguous (n, th, tw, 3) RGB8 tensor using
// `threads` workers. Per-image status codes land in `status`. Returns the
// number of successful decodes.
int mtgv_decode_jpeg_batch(const uint8_t *const *bufs, const size_t *lens,
                           int n, int th, int tw, uint8_t *out, int *status,
                           int threads) {
  BatchJob job{bufs, lens, out, th, tw, n, status, 0, PTHREAD_MUTEX_INITIALIZER};
  threads = std::max(1, std::min(threads, n));
  std::vector<pthread_t> ts(threads);
  for (int t = 0; t < threads; ++t)
    pthread_create(&ts[t], nullptr, batch_worker, &job);
  for (int t = 0; t < threads; ++t) pthread_join(ts[t], nullptr);
  int ok = 0;
  for (int i = 0; i < n; ++i) ok += (status[i] == 0);
  return ok;
}

int mtgv_version() { return 1; }

}  // extern "C"
