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
  // mem-dest state lives behind a setjmp-safe volatile pointer: libjpeg may
  // realloc the buffer mid-compress, and the error longjmp must still see
  // the current pointer to free it (auto variables modified after setjmp
  // are unreliable after longjmp).
  struct Dest { unsigned char* buf; unsigned long len; } d;
  d.buf = out;
  d.len = static_cast<unsigned long>(out_cap);
  Dest* volatile dp = &d;
  if (setjmp(jerr.setjmp_buffer)) {
    if (dp->buf != out) free(dp->buf);
    jpeg_destroy_compress(&cinfo);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  // jpeg_mem_dest mallocs a bigger buffer if ours is too small; detect that
  // and report -2 so the caller retries (we never want a malloc'd result we
  // would have to copy + free across the ABI).
  jpeg_mem_dest(&cinfo, &dp->buf, &dp->len);
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
  long written = static_cast<long>(d.len);
  bool reallocated = (d.buf != out);
  jpeg_destroy_compress(&cinfo);
  if (reallocated) {
    free(d.buf);
    return -2;
  }
  return written;
}

// ---- Raw-plane JPEG I/O (no color conversion anywhere) ----
//
// JPEG's internal representation for ordinary photos IS YCbCr 4:2:0; the
// stylization pipeline moves exactly those planes across the host<->device
// link and converts on-device. Decoding to planes (jpeg_read_raw_data) and
// encoding from planes (jpeg_write_raw_data) therefore skips libjpeg's own
// color conversion AND the host-side RGB<->YUV pass — the host never touches
// pixel math for a JPEG-in/JPEG-out stylization.

// Decode a baseline YCbCr 4:2:0 JPEG straight to planes.
// y: w*h bytes; cbcr: (h/2)*(w/2)*2 interleaved. w and h must be the even
// full-scale dims from cd_jpeg_dims. Returns 0, or -4 when the file is not
// plain 4:2:0 (caller falls back to cd_jpeg_decode + cd_rgb_to_yuv420).
int cd_jpeg_decode_yuv420(const uint8_t* data, long len,
                          uint8_t* y, uint8_t* cbcr, int w, int h) {
  if (w <= 0 || h <= 0 || (w & 1) || (h & 1)) return -4;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  // band scratch is malloc'd behind a volatile pointer so the error longjmp
  // (e.g. a truncated file mid-scan) can free it — C++ destructors do not
  // run across longjmp, and serve feeds this attacker-controlled bytes.
  uint8_t* volatile scratch = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    free(const_cast<uint8_t*>(scratch));
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  const bool is420 =
      !cinfo.progressive_mode &&  // progressive buffers the full coefficient
      // array and blocks the first read on all scans — no streaming benefit;
      // let the caller fall back instead of silently degrading
      cinfo.jpeg_color_space == JCS_YCbCr && cinfo.num_components == 3 &&
      cinfo.comp_info[0].h_samp_factor == 2 &&
      cinfo.comp_info[0].v_samp_factor == 2 &&
      cinfo.comp_info[1].h_samp_factor == 1 &&
      cinfo.comp_info[1].v_samp_factor == 1 &&
      cinfo.comp_info[2].h_samp_factor == 1 &&
      cinfo.comp_info[2].v_samp_factor == 1;
  if (!is420 || static_cast<int>(cinfo.image_width) != w ||
      static_cast<int>(cinfo.image_height) != h) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  cinfo.raw_data_out = TRUE;
  cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&cinfo);
  // libjpeg hands back whole iMCU bands (16 Y rows / 8 chroma rows) at the
  // DCT-block-padded width; stage them in scratch and copy the valid region.
  const int y_stride = static_cast<int>(cinfo.comp_info[0].width_in_blocks) * DCTSIZE;
  const int c_stride = static_cast<int>(cinfo.comp_info[1].width_in_blocks) * DCTSIZE;
  const int w2 = w / 2, h2 = h / 2;
  scratch = static_cast<uint8_t*>(
      malloc(static_cast<size_t>(y_stride) * 16 + static_cast<size_t>(c_stride) * 16));
  if (scratch == nullptr) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  uint8_t* ybuf = const_cast<uint8_t*>(scratch);
  uint8_t* cbbuf = ybuf + static_cast<size_t>(y_stride) * 16;
  uint8_t* crbuf = cbbuf + static_cast<size_t>(c_stride) * 8;
  JSAMPROW yrows[16], cbrows[8], crrows[8];
  for (int i = 0; i < 16; ++i) yrows[i] = ybuf + static_cast<long>(i) * y_stride;
  for (int i = 0; i < 8; ++i) {
    cbrows[i] = cbbuf + static_cast<long>(i) * c_stride;
    crrows[i] = crbuf + static_cast<long>(i) * c_stride;
  }
  JSAMPARRAY planes[3] = {yrows, cbrows, crrows};
  while (cinfo.output_scanline < cinfo.output_height) {
    const int base = static_cast<int>(cinfo.output_scanline);
    if (jpeg_read_raw_data(&cinfo, planes, 16) == 0) {
      free(const_cast<uint8_t*>(scratch));
      jpeg_abort_decompress(&cinfo);
      jpeg_destroy_decompress(&cinfo);
      return -3;
    }
    const int ny = h - base < 16 ? h - base : 16;
    for (int r = 0; r < ny; ++r)
      std::memcpy(y + static_cast<long>(base + r) * w, yrows[r], w);
    const int cbase = base / 2;
    const int nc = h2 - cbase < 8 ? h2 - cbase : 8;
    for (int r = 0; r < nc; ++r) {
      uint8_t* o = cbcr + static_cast<long>(cbase + r) * w2 * 2;
      const uint8_t* pb = cbrows[r];
      const uint8_t* pr = crrows[r];
      for (int x = 0; x < w2; ++x) {
        o[x * 2] = pb[x];
        o[x * 2 + 1] = pr[x];
      }
    }
  }
  free(const_cast<uint8_t*>(scratch));
  scratch = nullptr;  // finish may still longjmp; avoid a double free
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Encode 4:2:0 planes straight to a baseline JPEG (inverse of the decoder;
// same buffer-too-small contract as cd_jpeg_encode: returns bytes or -2).
long cd_jpeg_encode_yuv420(const uint8_t* y, const uint8_t* cbcr,
                           int w, int h, int quality,
                           uint8_t* out, long out_cap) {
  if (w <= 0 || h <= 0 || (w & 1) || (h & 1) || quality < 1 || quality > 100)
    return -1;
  jpeg_compress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  // see cd_jpeg_encode / cd_jpeg_decode_yuv420 for the setjmp-safety notes
  struct Dest { unsigned char* buf; unsigned long len; } d;
  d.buf = out;
  d.len = static_cast<unsigned long>(out_cap);
  Dest* volatile dp = &d;
  uint8_t* volatile scratch = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    free(const_cast<uint8_t*>(scratch));
    if (dp->buf != out) free(dp->buf);
    jpeg_destroy_compress(&cinfo);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &dp->buf, &dp->len);
  cinfo.image_width = static_cast<JDIMENSION>(w);
  cinfo.image_height = static_cast<JDIMENSION>(h);
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_YCbCr;
  jpeg_set_defaults(&cinfo);  // YCbCr default sampling is already 2x2,1x1,1x1
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.raw_data_in = TRUE;
  jpeg_start_compress(&cinfo, TRUE);
  const int y_stride = static_cast<int>(cinfo.comp_info[0].width_in_blocks) * DCTSIZE;
  const int c_stride = static_cast<int>(cinfo.comp_info[1].width_in_blocks) * DCTSIZE;
  const int w2 = w / 2, h2 = h / 2;
  scratch = static_cast<uint8_t*>(
      malloc(static_cast<size_t>(y_stride) * 16 + static_cast<size_t>(c_stride) * 16));
  if (scratch == nullptr) {
    jpeg_destroy_compress(&cinfo);
    return -1;
  }
  uint8_t* ybuf = const_cast<uint8_t*>(scratch);
  uint8_t* cbbuf = ybuf + static_cast<size_t>(y_stride) * 16;
  uint8_t* crbuf = cbbuf + static_cast<size_t>(c_stride) * 8;
  JSAMPROW yrows[16], cbrows[8], crrows[8];
  for (int i = 0; i < 16; ++i) yrows[i] = ybuf + static_cast<long>(i) * y_stride;
  for (int i = 0; i < 8; ++i) {
    cbrows[i] = cbbuf + static_cast<long>(i) * c_stride;
    crrows[i] = crbuf + static_cast<long>(i) * c_stride;
  }
  JSAMPARRAY planes[3] = {yrows, cbrows, crrows};
  while (cinfo.next_scanline < cinfo.image_height) {
    const int base = static_cast<int>(cinfo.next_scanline);
    const int ny = h - base < 16 ? h - base : 16;
    for (int r = 0; r < 16; ++r) {
      const int src = base + (r < ny ? r : ny - 1);  // replicate last rows
      std::memcpy(yrows[r], y + static_cast<long>(src) * w, w);
      // replicate the last column into the block padding
      std::memset(yrows[r] + w, yrows[r][w - 1], y_stride - w);
    }
    const int cbase = base / 2;
    const int nc = h2 - cbase < 8 ? h2 - cbase : 8;
    for (int r = 0; r < 8; ++r) {
      const int src = cbase + (r < nc ? r : nc - 1);
      const uint8_t* p = cbcr + static_cast<long>(src) * w2 * 2;
      for (int x = 0; x < w2; ++x) {
        cbrows[r][x] = p[x * 2];
        crrows[r][x] = p[x * 2 + 1];
      }
      std::memset(cbrows[r] + w2, cbrows[r][w2 - 1], c_stride - w2);
      std::memset(crrows[r] + w2, crrows[r][w2 - 1], c_stride - w2);
    }
    jpeg_write_raw_data(&cinfo, planes, 16);
  }
  free(const_cast<uint8_t*>(scratch));
  scratch = nullptr;
  jpeg_finish_compress(&cinfo);
  long written = static_cast<long>(d.len);
  bool reallocated = (d.buf != out);
  jpeg_destroy_compress(&cinfo);
  if (reallocated) {
    free(d.buf);
    return -2;
  }
  return written;
}

// ---- JPEG-native YCbCr 4:2:0 <-> RGB conversion (fixed point) ----
//
// The stylization pipeline moves images across a slow host<->device relay;
// 4:2:0 planes are 1.5 B/px vs RGB's 3 B/px. The numpy mirrors of these
// conversions (utils/colorspace.py) walk 42 MPix UHD images through several
// 500 MB float temporaries and take ~20 s on this container's single CPU
// core; these integer loops do the same math (JFIF full-range BT.601, the
// libjpeg matrices) in a few hundred ms, matching numpy within +-1 LSB.
// Q16 fixed point; +0.5 rounding matches numpy's clip(x + 0.5).astype(u8).

namespace {
inline uint8_t clamp_u8(long v) {
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}
}  // namespace

// rgb: (h, w, 3) u8 with even h, w -> y: (h, w) u8, cbcr: (h/2, w/2, 2) u8
// (2x2 box-filtered chroma, JPEG-style).
int cd_rgb_to_yuv420(const uint8_t* rgb, int h, int w,
                     uint8_t* y, uint8_t* cbcr) {
  if (h <= 0 || w <= 0 || (h & 1) || (w & 1)) return -1;
  const long KYR = 19595, KYG = 38470, KYB = 7471;        // 0.299/0.587/0.114
  const long KBR = -11059, KBG = -21709, KBB = 32768;     // cb row
  const long KRR = 32768, KRG = -27439, KRB = -5329;      // cr row
  const long HALF = 1L << 15, OFF = 128L << 16;
  const int w2 = w / 2;
  for (int yy = 0; yy < h; yy += 2) {
    const uint8_t* r0 = rgb + static_cast<long>(yy) * w * 3;
    const uint8_t* r1 = r0 + static_cast<long>(w) * 3;
    uint8_t* y0 = y + static_cast<long>(yy) * w;
    uint8_t* y1 = y0 + w;
    uint8_t* cc = cbcr + static_cast<long>(yy / 2) * w2 * 2;
    for (int xx = 0; xx < w; xx += 2) {
      long cb_sum = 0, cr_sum = 0;
      const uint8_t* px[4] = {r0 + xx * 3, r0 + xx * 3 + 3,
                              r1 + xx * 3, r1 + xx * 3 + 3};
      uint8_t* yo[4] = {y0 + xx, y0 + xx + 1, y1 + xx, y1 + xx + 1};
      for (int k = 0; k < 4; ++k) {
        const long r = px[k][0], g = px[k][1], b = px[k][2];
        *yo[k] = clamp_u8((KYR * r + KYG * g + KYB * b + HALF) >> 16);
        cb_sum += KBR * r + KBG * g + KBB * b + OFF;
        cr_sum += KRR * r + KRG * g + KRB * b + OFF;
      }
      // mean of 4 Q16 values, +0.5: (sum + 2*65536) / (4*65536)
      uint8_t* o = cc + xx;  // xx/2*2 == xx for even xx
      o[0] = clamp_u8((cb_sum + (2L << 16)) >> 18);
      o[1] = clamp_u8((cr_sum + (2L << 16)) >> 18);
    }
  }
  return 0;
}

// y: (h, w) u8, cbcr: (h/2, w/2, 2) u8 -> rgb: (h, w, 3) u8
// (nearest chroma upsample; inverse of cd_rgb_to_yuv420).
int cd_yuv420_to_rgb(const uint8_t* y, const uint8_t* cbcr, int h, int w,
                     uint8_t* rgb) {
  if (h <= 0 || w <= 0 || (h & 1) || (w & 1)) return -1;
  const long KCR_R = 91881;                  // 1.402
  const long KCB_G = -22554, KCR_G = -46802; // -0.344136 / -0.714136
  const long KCB_B = 116130;                 // 1.772
  const long HALF = 1L << 15;
  const int w2 = w / 2;
  for (int yy = 0; yy < h; yy += 2) {
    const uint8_t* y0 = y + static_cast<long>(yy) * w;
    const uint8_t* y1 = y0 + w;
    const uint8_t* crow = cbcr + static_cast<long>(yy / 2) * w2 * 2;
    uint8_t* o0 = rgb + static_cast<long>(yy) * w * 3;
    uint8_t* o1 = o0 + static_cast<long>(w) * 3;
    for (int xx = 0; xx < w; xx += 2) {
      // chroma terms shared by the 2x2 block (nearest upsample)
      const long cb = static_cast<long>(crow[xx]) - 128;      // xx == (xx/2)*2
      const long cr = static_cast<long>(crow[xx + 1]) - 128;
      const long tr = KCR_R * cr + HALF;
      const long tg = KCB_G * cb + KCR_G * cr + HALF;
      const long tb = KCB_B * cb + HALF;
      const uint8_t* ys[4] = {y0 + xx, y0 + xx + 1, y1 + xx, y1 + xx + 1};
      uint8_t* os[4] = {o0 + xx * 3, o0 + xx * 3 + 3,
                        o1 + xx * 3, o1 + xx * 3 + 3};
      for (int k = 0; k < 4; ++k) {
        const long yv = static_cast<long>(*ys[k]) << 16;
        os[k][0] = clamp_u8((yv + tr) >> 16);
        os[k][1] = clamp_u8((yv + tg) >> 16);
        os[k][2] = clamp_u8((yv + tb) >> 16);
      }
    }
  }
  return 0;
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

// ---- Incremental 4:2:0-plane JPEG encoder ----
//
// The streamed stylization tail fetches the output in row bands while the
// device is still computing later bands; this encoder consumes those bands
// AS THEY ARRIVE (jpeg_write_raw_data per 16-row MCU group), so for a UHD
// serve response the entropy encode rides under the next band's fetch
// instead of starting after the whole image landed. State lives behind an
// opaque handle; after ANY negative return the handle is already freed.

namespace {

struct CdJpegEnc {
  jpeg_compress_struct cinfo;
  ErrorMgr jerr;
  // WE own the initial destination buffer (worst-case sized, so libjpeg
  // never grows it in practice). Passing a NULL buffer to jpeg_mem_dest
  // would make libjpeg malloc AND free superseded buffers on growth while
  // our copy of the pointer only updates at term_destination — freeing
  // that stale pointer on abort is a double free (found by fuzzing).
  unsigned char* orig;  // our malloc, never freed by libjpeg
  unsigned char* buf;   // == orig until term_destination publishes a
                        // (grown) replacement at finish
  unsigned long len;
  uint8_t* scratch;     // one MCU band (16 Y rows + 8+8 chroma rows)
  int w, h;
  int y_stride, c_stride;
};

void cd_enc_free(CdJpegEnc* st) {
  free(st->scratch);
  jpeg_destroy_compress(&st->cinfo);
  if (st->buf != st->orig) free(st->buf);  // grown + finished: ours per the
                                           // jpeg_mem_dest contract
  free(st->orig);
  free(st);
}

}  // namespace

extern "C" {

// Returns an opaque handle, or NULL on invalid args / allocation failure.
void* cd_jpeg_enc_begin(int w, int h, int quality) {
  if (w <= 0 || h <= 0 || (w & 1) || (h & 1) || quality < 1 || quality > 100)
    return nullptr;
  CdJpegEnc* st = static_cast<CdJpegEnc*>(calloc(1, sizeof(CdJpegEnc)));
  if (st == nullptr) return nullptr;
  st->w = w;
  st->h = h;
  st->cinfo.err = jpeg_std_error(&st->jerr.pub);
  st->jerr.pub.error_exit = error_exit;
  if (setjmp(st->jerr.setjmp_buffer)) {
    cd_enc_free(st);
    return nullptr;
  }
  jpeg_create_compress(&st->cinfo);
  // worst-case capacity: raw 4:2:0 is 1.5 B/px; pathological noise can
  // entropy-code larger, so budget 3 B/px + slack. If libjpeg still has to
  // grow, correctness is preserved (term_destination publishes the grown
  // buffer, which cd_enc_free then releases) at the cost of one copy.
  st->len = static_cast<unsigned long>(w) * h * 3 + (1u << 16);
  st->orig = static_cast<unsigned char*>(malloc(st->len));
  if (st->orig == nullptr) {
    cd_enc_free(st);
    return nullptr;
  }
  st->buf = st->orig;
  jpeg_mem_dest(&st->cinfo, &st->buf, &st->len);
  st->cinfo.image_width = static_cast<JDIMENSION>(w);
  st->cinfo.image_height = static_cast<JDIMENSION>(h);
  st->cinfo.input_components = 3;
  st->cinfo.in_color_space = JCS_YCbCr;
  jpeg_set_defaults(&st->cinfo);  // YCbCr default sampling is 2x2,1x1,1x1
  jpeg_set_quality(&st->cinfo, quality, TRUE);
  st->cinfo.raw_data_in = TRUE;
  jpeg_start_compress(&st->cinfo, TRUE);
  st->y_stride = static_cast<int>(st->cinfo.comp_info[0].width_in_blocks) * DCTSIZE;
  st->c_stride = static_cast<int>(st->cinfo.comp_info[1].width_in_blocks) * DCTSIZE;
  st->scratch = static_cast<uint8_t*>(
      malloc(static_cast<size_t>(st->y_stride) * 16 +
             static_cast<size_t>(st->c_stride) * 16));
  if (st->scratch == nullptr) {
    cd_enc_free(st);
    return nullptr;
  }
  return st;
}

// Append ``rows`` image rows (y: rows*w bytes; cbcr: (rows/2)*(w/2)*2,
// interleaved). ``rows`` must be even and a multiple of 16 unless this call
// delivers the final rows of the image (the tail of the last MCU group is
// replicated, as in cd_jpeg_encode_yuv420). Returns 0, or <0 (handle freed).
long cd_jpeg_enc_rows(void* handle, const uint8_t* y, const uint8_t* cbcr,
                      int rows) {
  CdJpegEnc* st = static_cast<CdJpegEnc*>(handle);
  if (st == nullptr) return -1;
  const int done = static_cast<int>(st->cinfo.next_scanline);
  if (rows <= 0 || (rows & 1) || done + rows > st->h ||
      ((rows % 16) != 0 && done + rows != st->h)) {
    cd_enc_free(st);
    return -3;
  }
  if (setjmp(st->jerr.setjmp_buffer)) {
    cd_enc_free(st);
    return -1;
  }
  const int w = st->w, w2 = st->w / 2, h2r = rows / 2;
  uint8_t* ybuf = st->scratch;
  uint8_t* cbbuf = ybuf + static_cast<size_t>(st->y_stride) * 16;
  uint8_t* crbuf = cbbuf + static_cast<size_t>(st->c_stride) * 8;
  JSAMPROW yrows[16], cbrows[8], crrows[8];
  for (int i = 0; i < 16; ++i)
    yrows[i] = ybuf + static_cast<long>(i) * st->y_stride;
  for (int i = 0; i < 8; ++i) {
    cbrows[i] = cbbuf + static_cast<long>(i) * st->c_stride;
    crrows[i] = crbuf + static_cast<long>(i) * st->c_stride;
  }
  JSAMPARRAY planes[3] = {yrows, cbrows, crrows};
  for (int base = 0; base < rows; base += 16) {
    const int ny = rows - base < 16 ? rows - base : 16;
    for (int r = 0; r < 16; ++r) {
      const int src = base + (r < ny ? r : ny - 1);  // replicate final rows
      std::memcpy(yrows[r], y + static_cast<long>(src) * w, w);
      std::memset(yrows[r] + w, yrows[r][w - 1], st->y_stride - w);
    }
    const int cbase = base / 2;
    const int nc = h2r - cbase < 8 ? h2r - cbase : 8;
    for (int r = 0; r < 8; ++r) {
      const int src = cbase + (r < nc ? r : nc - 1);
      const uint8_t* p = cbcr + static_cast<long>(src) * w2 * 2;
      for (int x = 0; x < w2; ++x) {
        cbrows[r][x] = p[x * 2];
        crrows[r][x] = p[x * 2 + 1];
      }
      std::memset(cbrows[r] + w2, cbrows[r][w2 - 1], st->c_stride - w2);
      std::memset(crrows[r] + w2, crrows[r][w2 - 1], st->c_stride - w2);
    }
    jpeg_write_raw_data(&st->cinfo, planes, 16);
  }
  return 0;
}

// Finish the stream; returns the total JPEG byte length (handle stays alive
// for cd_jpeg_enc_read_free), or <0 (handle freed). All h rows must have
// been written.
long cd_jpeg_enc_finish(void* handle) {
  CdJpegEnc* st = static_cast<CdJpegEnc*>(handle);
  if (st == nullptr) return -1;
  if (static_cast<int>(st->cinfo.next_scanline) < st->h) {
    cd_enc_free(st);
    return -3;
  }
  if (setjmp(st->jerr.setjmp_buffer)) {
    cd_enc_free(st);
    return -1;
  }
  jpeg_finish_compress(&st->cinfo);
  return static_cast<long>(st->len);
}

// Copy the finished JPEG into ``out`` (cap bytes) and free the handle.
// Returns the byte count, or -2 if cap was too small (handle freed either
// way).
long cd_jpeg_enc_read_free(void* handle, uint8_t* out, long cap) {
  CdJpegEnc* st = static_cast<CdJpegEnc*>(handle);
  if (st == nullptr) return -1;
  const long n = static_cast<long>(st->len);
  long rc = n;
  if (n > cap) {
    rc = -2;
  } else {
    std::memcpy(out, st->buf, static_cast<size_t>(n));
  }
  cd_enc_free(st);
  return rc;
}

// Abandon an in-progress encode (e.g. a band fetch failed).
void cd_jpeg_enc_abort(void* handle) {
  CdJpegEnc* st = static_cast<CdJpegEnc*>(handle);
  if (st == nullptr) return;
  if (setjmp(st->jerr.setjmp_buffer) == 0) {
    jpeg_abort_compress(&st->cinfo);
  }
  cd_enc_free(st);
}

}  // extern "C"

// ---- Incremental 4:2:0-plane JPEG decoder (input mirror of the encoder:
//      entropy-decode row bands while earlier bands already ride the
//      host->device link). Same handle/error contract: any negative return
//      (or returning 1 = complete) frees the handle. ----

namespace {

struct CdJpegDec {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  uint8_t* scratch;
  int w, h;
  int y_stride, c_stride;
};

void cd_dec_free(CdJpegDec* st) {
  free(st->scratch);
  jpeg_destroy_decompress(&st->cinfo);
  free(st);
}

}  // namespace

extern "C" {

// Open a baseline even-dimensioned 4:2:0 JPEG for banded raw decoding.
// ``data`` must stay valid for the handle's lifetime (the caller holds the
// bytes). Returns NULL for anything else (caller falls back to the
// whole-image decoders).
void* cd_jpeg_dec_begin(const uint8_t* data, long len, int* out_w, int* out_h) {
  CdJpegDec* st = static_cast<CdJpegDec*>(calloc(1, sizeof(CdJpegDec)));
  if (st == nullptr) return nullptr;
  st->cinfo.err = jpeg_std_error(&st->jerr.pub);
  st->jerr.pub.error_exit = error_exit;
  if (setjmp(st->jerr.setjmp_buffer)) {
    cd_dec_free(st);
    return nullptr;
  }
  jpeg_create_decompress(&st->cinfo);
  jpeg_mem_src(&st->cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&st->cinfo, TRUE) != JPEG_HEADER_OK) {
    cd_dec_free(st);
    return nullptr;
  }
  const bool is420 =
      !st->cinfo.progressive_mode &&  // see cd_jpeg_decode_yuv420: baseline only
      st->cinfo.jpeg_color_space == JCS_YCbCr && st->cinfo.num_components == 3 &&
      st->cinfo.comp_info[0].h_samp_factor == 2 &&
      st->cinfo.comp_info[0].v_samp_factor == 2 &&
      st->cinfo.comp_info[1].h_samp_factor == 1 &&
      st->cinfo.comp_info[1].v_samp_factor == 1 &&
      st->cinfo.comp_info[2].h_samp_factor == 1 &&
      st->cinfo.comp_info[2].v_samp_factor == 1;
  const int w = static_cast<int>(st->cinfo.image_width);
  const int h = static_cast<int>(st->cinfo.image_height);
  if (!is420 || (w & 1) || (h & 1)) {
    cd_dec_free(st);
    return nullptr;
  }
  st->w = w;
  st->h = h;
  st->cinfo.raw_data_out = TRUE;
  st->cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&st->cinfo);
  st->y_stride = static_cast<int>(st->cinfo.comp_info[0].width_in_blocks) * DCTSIZE;
  st->c_stride = static_cast<int>(st->cinfo.comp_info[1].width_in_blocks) * DCTSIZE;
  st->scratch = static_cast<uint8_t*>(
      malloc(static_cast<size_t>(st->y_stride) * 16 +
             static_cast<size_t>(st->c_stride) * 16));
  if (st->scratch == nullptr) {
    cd_dec_free(st);
    return nullptr;
  }
  *out_w = w;
  *out_h = h;
  return st;
}

// Decode the next ``rows`` image rows into y (rows*w) and cbcr
// ((rows/2)*(w/2)*2). ``rows`` must be even and a multiple of 16 unless it
// reaches the end of the image. Returns 0 (more rows remain), 1 (image
// complete — handle freed), or <0 (error — handle freed).
long cd_jpeg_dec_rows(void* handle, uint8_t* y, uint8_t* cbcr, int rows) {
  CdJpegDec* st = static_cast<CdJpegDec*>(handle);
  if (st == nullptr) return -1;
  const int done = static_cast<int>(st->cinfo.output_scanline);
  if (rows <= 0 || (rows & 1) || done + rows > st->h ||
      ((rows % 16) != 0 && done + rows != st->h)) {
    cd_dec_free(st);
    return -3;
  }
  if (setjmp(st->jerr.setjmp_buffer)) {
    cd_dec_free(st);
    return -1;
  }
  const int w = st->w, w2 = st->w / 2;
  uint8_t* ybuf = st->scratch;
  uint8_t* cbbuf = ybuf + static_cast<size_t>(st->y_stride) * 16;
  uint8_t* crbuf = cbbuf + static_cast<size_t>(st->c_stride) * 8;
  JSAMPROW yrows[16], cbrows[8], crrows[8];
  for (int i = 0; i < 16; ++i)
    yrows[i] = ybuf + static_cast<long>(i) * st->y_stride;
  for (int i = 0; i < 8; ++i) {
    cbrows[i] = cbbuf + static_cast<long>(i) * st->c_stride;
    crrows[i] = crbuf + static_cast<long>(i) * st->c_stride;
  }
  JSAMPARRAY planes[3] = {yrows, cbrows, crrows};
  for (int base = 0; base < rows;) {
    if (jpeg_read_raw_data(&st->cinfo, planes, 16) == 0) {
      cd_dec_free(st);
      return -2;
    }
    const int ny = rows - base < 16 ? rows - base : 16;
    for (int r = 0; r < ny; ++r)
      std::memcpy(y + static_cast<long>(base + r) * w, yrows[r], w);
    const int cbase = base / 2, nc = (ny + 1) / 2;
    for (int r = 0; r < nc; ++r) {
      uint8_t* o = cbcr + static_cast<long>(cbase + r) * w2 * 2;
      const uint8_t* pb = cbrows[r];
      const uint8_t* pr = crrows[r];
      for (int x = 0; x < w2; ++x) {
        o[x * 2] = pb[x];
        o[x * 2 + 1] = pr[x];
      }
    }
    base += 16;
  }
  if (static_cast<int>(st->cinfo.output_scanline) >= st->h) {
    jpeg_finish_decompress(&st->cinfo);
    cd_dec_free(st);
    return 1;
  }
  return 0;
}

// Abandon an in-progress decode.
void cd_jpeg_dec_abort(void* handle) {
  CdJpegDec* st = static_cast<CdJpegDec*>(handle);
  if (st == nullptr) return;
  if (setjmp(st->jerr.setjmp_buffer) == 0) {
    jpeg_abort_decompress(&st->cinfo);
  }
  cd_dec_free(st);
}

}  // extern "C"
