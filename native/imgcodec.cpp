// Native image codec for the input pipeline.
//
// The reference feeds training from PIL via a single-worker torch DataLoader
// (main.py:72). Here decode runs in C++ (libjpeg) with the GIL released, so
// the Loader's thread pool gets real parallelism, and shorter-side resizing
// is folded into the decode itself via libjpeg's DCT-domain scaling
// (scale 1/1..1/8 costs ~nothing vs decoding full resolution and resizing).
//
// C ABI only (consumed through ctypes; pybind11 is not available in this
// image). All functions return 0 on success, negative on failure.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

}  // namespace

extern "C" {

// Peek dimensions after DCT-domain scaling by scale_denom in {1,2,4,8}.
int cd_jpeg_dims(const uint8_t* data, long len, int scale_denom,
                 int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = scale_denom;
  jpeg_calc_output_dimensions(&cinfo);
  *out_w = static_cast<int>(cinfo.output_width);
  *out_h = static_cast<int>(cinfo.output_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode to RGB8 into caller-provided buffer of out_w*out_h*3 bytes
// (dimensions must come from cd_jpeg_dims with the same scale_denom).
int cd_jpeg_decode(const uint8_t* data, long len, int scale_denom,
                   uint8_t* out, int out_w, int out_h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = scale_denom;
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != out_w ||
      static_cast<int>(cinfo.output_height) != out_h ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  const long stride = static_cast<long>(out_w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<long>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Encode RGB8 -> baseline JPEG into a caller-provided buffer.
// Returns bytes written, or negative on failure (-2: buffer too small —
// retry with a larger one; worst case is ~w*h*3 + 1024 for quality 100).
// Called with the GIL released via ctypes: server threads encode big
// stylized outputs in parallel instead of serializing in PIL.
long cd_jpeg_encode(const uint8_t* rgb, int w, int h, int quality,
                    uint8_t* out, long out_cap) {
  if (w <= 0 || h <= 0 || quality < 1 || quality > 100) return -1;
  jpeg_compress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  unsigned char* buf = out;
  unsigned long buf_len = static_cast<unsigned long>(out_cap);
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  // jpeg_mem_dest mallocs a bigger buffer if ours is too small; detect that
  // and report -2 so the caller retries (we never want a malloc'd result we
  // would have to copy + free across the ABI).
  jpeg_mem_dest(&cinfo, &buf, &buf_len);
  cinfo.image_width = static_cast<JDIMENSION>(w);
  cinfo.image_height = static_cast<JDIMENSION>(h);
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  const long stride = static_cast<long>(w) * 3;
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<uint8_t*>(
        rgb + static_cast<long>(cinfo.next_scanline) * stride);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  long written = static_cast<long>(buf_len);
  bool reallocated = (buf != out);
  jpeg_destroy_compress(&cinfo);
  if (reallocated) {
    free(buf);
    return -2;
  }
  return written;
}

// Box-filter resize RGB8 (for the shorter-side resize after DCT scaling).
int cd_resize_rgb(const uint8_t* src, int sw, int sh,
                  uint8_t* dst, int dw, int dh) {
  if (sw <= 0 || sh <= 0 || dw <= 0 || dh <= 0) return -1;
  for (int y = 0; y < dh; ++y) {
    long y0 = static_cast<long>(y) * sh / dh;
    long y1 = static_cast<long>(y + 1) * sh / dh;
    if (y1 <= y0) y1 = y0 + 1;
    for (int x = 0; x < dw; ++x) {
      long x0 = static_cast<long>(x) * sw / dw;
      long x1 = static_cast<long>(x + 1) * sw / dw;
      if (x1 <= x0) x1 = x0 + 1;
      long acc[3] = {0, 0, 0};
      long n = (y1 - y0) * (x1 - x0);
      for (long yy = y0; yy < y1; ++yy) {
        const uint8_t* row = src + (yy * sw + x0) * 3;
        for (long xx = 0; xx < (x1 - x0); ++xx) {
          acc[0] += row[xx * 3 + 0];
          acc[1] += row[xx * 3 + 1];
          acc[2] += row[xx * 3 + 2];
        }
      }
      uint8_t* o = dst + (static_cast<long>(y) * dw + x) * 3;
      o[0] = static_cast<uint8_t>(acc[0] / n);
      o[1] = static_cast<uint8_t>(acc[1] / n);
      o[2] = static_cast<uint8_t>(acc[2] / n);
    }
  }
  return 0;
}

}  // extern "C"
