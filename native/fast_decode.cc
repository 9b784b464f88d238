// Fast host-side JPEG decode for the input pipeline.
//
// The reference leaned on torchvision's C++ ops for image decode+transform
// (reference main.py:22, 165-179); mic_tpu's equivalent is this small
// first-party library: libjpeg decode with DCT-domain scale-on-decode (the
// decoder itself downscales by N/8 before IDCT, skipping most of the work for
// big photos), then bilinear shortest-side resize + center crop to a fixed
// square in one pass. The device does the rest (bicubic to model size +
// normalize, mic_tpu/ops/image_prep.py).
//
// Exposed C ABI (ctypes-friendly, see mic_tpu/data/native.py):
//   int mic_decode_jpeg(const uint8_t* data, size_t len, int out_size,
//                       uint8_t* out);   // out: out_size*out_size*3 RGB
//   int mic_validate_jpeg(const uint8_t* data, size_t len);
// Return 0 on success, nonzero on decode failure.
//
// mic_validate_jpeg is the downloader's content check (download.py used to
// validate by a full PIL decode, which holds the GIL and serializes the
// thread pool — reference data/download_data.py:30-68 paid for this with
// 256 *processes*): it runs the entire entropy decode at the cheapest DCT
// scale (1/8) with no color conversion and no output buffer, so a corrupt
// stream is still caught anywhere in the file, in ~1/10 the work, off-GIL
// (ctypes.CDLL releases the GIL for the call's duration).
//
// Build: tools/build_native.sh  (g++ -O3 -shared -fPIC -ljpeg)

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear sample of src (h, w, 3) at (fy, fx).
inline void sample(const uint8_t* src, int h, int w, float fy, float fx,
                   uint8_t* out) {
  int x0 = static_cast<int>(fx);
  int y0 = static_cast<int>(fy);
  int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
  int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
  float ax = fx - x0, ay = fy - y0;
  for (int c = 0; c < 3; ++c) {
    float top = src[(y0 * w + x0) * 3 + c] * (1 - ax) +
                src[(y0 * w + x1) * 3 + c] * ax;
    float bot = src[(y1 * w + x0) * 3 + c] * (1 - ax) +
                src[(y1 * w + x1) * 3 + c] * ax;
    float v = top * (1 - ay) + bot * ay;
    out[c] = static_cast<uint8_t>(v + 0.5f);
  }
}

}  // namespace

extern "C" int mic_validate_jpeg(const uint8_t* data, size_t len) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  // full entropy decode at 1/8 DCT scale, raw DCT-space color (no convert)
  cinfo.scale_num = 1;
  cinfo.scale_denom = 8;
  cinfo.do_fancy_upsampling = FALSE;
  cinfo.dct_method = JDCT_FASTEST;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, comps = cinfo.output_components;
  if (w < 1 || comps < 1 || comps > 4) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  std::vector<uint8_t> row(static_cast<size_t>(w) * comps);
  uint8_t* rp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // truncation surfaces as a WARNING ("Premature end of JPEG file") with
  // fake-data fill, not error_exit — a validator must reject it
  const long warnings = cinfo.err->num_warnings;
  jpeg_destroy_decompress(&cinfo);
  return warnings > 0 ? 4 : 0;
}

extern "C" int mic_decode_jpeg(const uint8_t* data, size_t len, int out_size,
                               uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;

  // DCT scale-on-decode: largest denom keeping shortest side >= out_size.
  const unsigned full_w = cinfo.image_width, full_h = cinfo.image_height;
  unsigned denom = 1;
  for (unsigned d = 8; d >= 2; d /= 2) {
    unsigned short_side = (full_w < full_h ? full_w : full_h) / d;
    if (short_side >= static_cast<unsigned>(out_size)) {
      denom = d;
      break;
    }
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width, h = cinfo.output_height;
  const int comps = cinfo.output_components;
  if (comps != 3 || w < 1 || h < 1) {
    // grayscale/CMYK fall back to the Python path
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // shortest-side resize to out_size + center crop (same geometry as
  // mic_tpu/data/images.py load_image)
  const float scale = static_cast<float>(out_size) / (w < h ? w : h);
  const int nw = w * scale + 0.5f < out_size ? out_size
                                             : static_cast<int>(w * scale + 0.5f);
  const int nh = h * scale + 0.5f < out_size ? out_size
                                             : static_cast<int>(h * scale + 0.5f);
  const int left = (nw - out_size) / 2, top = (nh - out_size) / 2;
  for (int y = 0; y < out_size; ++y) {
    const float fy = (y + top + 0.5f) * h / nh - 0.5f;
    const float cy = fy < 0 ? 0 : (fy > h - 1 ? h - 1 : fy);
    for (int x = 0; x < out_size; ++x) {
      const float fx = (x + left + 0.5f) * w / nw - 0.5f;
      const float cx = fx < 0 ? 0 : (fx > w - 1 ? w - 1 : fx);
      sample(buf.data(), h, w, cy, cx, out + (y * out_size + x) * 3);
    }
  }
  return 0;
}
