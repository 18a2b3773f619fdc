// Native image-decode + resize for the data loader's host hot path.
//
// The reference leans on PIL/cv2 (C extensions driven per-image from Python
// worker processes) for file decode and ResizeShortestEdge
// (/root/reference/daod/data/annotation_mapper.py:20 via detectron2
// read_image / ResizeTransform, which call PIL). Here the per-image work is
// one C call — decode straight into a tight RGB8 buffer, then a
// Pillow-bit-exact BILINEAR resample — invoked from Python threads through
// ctypes (the call releases the GIL, so a thread pool scales across host
// cores without worker processes or pickling).
//
// The resample replicates Pillow's fixed-point two-pass algorithm
// (libImaging/Resample.c: triangle filter with support scaled by the
// downscale ratio, coefficients quantised to 1<<22, horizontal-then-vertical
// with a uint8 intermediate) so the loader's measured ResizeShortestEdge
// bit-parity with detectron2 (tests/test_loader.py) is preserved verbatim.
// tests/test_native_loader.py asserts bit-equality against PIL for both the
// decoders and the resample.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

// ---------------------------------------------------------------------------
// Pillow-exact BILINEAR resample (8 bits per channel fixed-point path)
// ---------------------------------------------------------------------------

constexpr int PRECISION_BITS = 32 - 8 - 2;  // Pillow Resample.c

inline double bilinear_filter(double x) {
  if (x < 0.0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

inline uint8_t clip8(int32_t in) {
  if (in >= (1 << (PRECISION_BITS + 8))) return 255;
  if (in <= 0) return 0;
  return static_cast<uint8_t>(in >> PRECISION_BITS);
}

// Pillow precompute_coeffs for the triangle (support=1.0) filter, followed by
// normalize_coeffs_8bpc quantisation. Returns ksize.
int precompute_coeffs(int in_size, int out_size, std::vector<int>* bounds,
                      std::vector<int32_t>* kk_fixed) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // BILINEAR support = 1.0
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  bounds->assign(out_size * 2, 0);
  std::vector<double> kk(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);  // Pillow rounds
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &kk[static_cast<size_t>(xx) * ksize];
    int x = 0;
    for (; x < xmax; x++) {
      double w = bilinear_filter((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (x = 0; x < xmax; x++) {
      if (ww != 0.0) k[x] /= ww;
    }
    (*bounds)[xx * 2 + 0] = xmin;
    (*bounds)[xx * 2 + 1] = xmax;
  }
  kk_fixed->assign(kk.size(), 0);
  for (size_t i = 0; i < kk.size(); i++) {
    (*kk_fixed)[i] = kk[i] < 0
                         ? static_cast<int32_t>(-0.5 + kk[i] * (1 << PRECISION_BITS))
                         : static_cast<int32_t>(0.5 + kk[i] * (1 << PRECISION_BITS));
  }
  return ksize;
}

// Horizontal pass: [h, w, c] -> [h, nw, c]
void resample_horizontal(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                         int nw, int ksize, const std::vector<int>& bounds,
                         const std::vector<int32_t>& kk) {
  for (int yy = 0; yy < h; yy++) {
    const uint8_t* line = src + static_cast<size_t>(yy) * w * c;
    uint8_t* out = dst + static_cast<size_t>(yy) * nw * c;
    for (int xx = 0; xx < nw; xx++) {
      int xmin = bounds[xx * 2 + 0];
      int xmax = bounds[xx * 2 + 1];
      const int32_t* k = &kk[static_cast<size_t>(xx) * ksize];
      for (int ch = 0; ch < c; ch++) {
        int32_t ss = 1 << (PRECISION_BITS - 1);
        for (int x = 0; x < xmax; x++) {
          ss += line[(x + xmin) * c + ch] * k[x];
        }
        out[xx * c + ch] = clip8(ss);
      }
    }
  }
}

// Vertical pass: [h, w, c] -> [nh, w, c]
void resample_vertical(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                       int nh, int ksize, const std::vector<int>& bounds,
                       const std::vector<int32_t>& kk) {
  for (int yy = 0; yy < nh; yy++) {
    int ymin = bounds[yy * 2 + 0];
    int ymax = bounds[yy * 2 + 1];
    const int32_t* k = &kk[static_cast<size_t>(yy) * ksize];
    uint8_t* out = dst + static_cast<size_t>(yy) * w * c;
    for (int xx = 0; xx < w; xx++) {
      for (int ch = 0; ch < c; ch++) {
        int32_t ss = 1 << (PRECISION_BITS - 1);
        for (int y = 0; y < ymax; y++) {
          ss += src[(static_cast<size_t>(y + ymin) * w + xx) * c + ch] * k[y];
        }
        out[xx * c + ch] = clip8(ss);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg, PIL-default settings: ISLOW DCT, fancy upsampling)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

int decode_jpeg(FILE* f, uint8_t** out, int32_t* h, int32_t* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  // volatile: modified between setjmp and longjmp — non-volatile locals are
  // indeterminate in the longjmp path (C standard; libjpeg example.c does
  // the same), which under -O3 can mean freeing a stale register value
  uint8_t* volatile buf = nullptr;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    free(buf);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // libjpeg converts YCbCr/grayscale
  jpeg_start_decompress(&cinfo);
  const int W = cinfo.output_width, H = cinfo.output_height;
  if (cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(H) * W * 3));
  if (!buf) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + static_cast<size_t>(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out = buf;
  *h = H;
  *w = W;
  return 0;
}

// ---------------------------------------------------------------------------
// PNG decode (libpng; 8-bit RGB out: palette/gray expanded, alpha stripped,
// 16-bit narrowed — the PIL convert("RGB") result for these modes)
// ---------------------------------------------------------------------------

int decode_png(FILE* f, uint8_t** out, int32_t* h, int32_t* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -5;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -5;
  }
  // volatile for the same setjmp/longjmp reason as decode_jpeg
  uint8_t* volatile buf = nullptr;
  std::vector<png_bytep>* volatile rows_ptr = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    free(buf);
    delete rows_ptr;
    return -6;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_bit_depth(png, info) == 16) {
    // 16-bit: strip_16 keeps the high byte, but PIL opens 16-bit grayscale
    // as mode "I" and convert("RGB") CLIPS at 255 — different pixels. Rare
    // in detection datasets; refuse and let the caller fall back to PIL so
    // the bit-parity contract holds for every file actually decoded here.
    png_destroy_read_struct(&png, &info, nullptr);
    return -9;
  }
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA) {
    png_set_gray_to_rgb(png);
  }
  png_set_interlace_handling(png);
  png_read_update_info(png, info);
  const int W = png_get_image_width(png, info);
  const int H = png_get_image_height(png, info);
  if (png_get_rowbytes(png, info) != static_cast<size_t>(W) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -7;
  }
  buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(H) * W * 3));
  if (!buf) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -4;
  }
  rows_ptr = new std::vector<png_bytep>(H);
  for (int y = 0; y < H; y++) (*rows_ptr)[y] = buf + static_cast<size_t>(y) * W * 3;
  png_read_image(png, rows_ptr->data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  delete rows_ptr;
  *out = buf;
  *h = H;
  *w = W;
  return 0;
}

}  // namespace

extern "C" {

// Decode a JPEG/PNG file (sniffed by magic) to tightly-packed RGB8.
// On success *out is malloc'd (release with sfod_image_free). Returns 0, or a
// negative error code (unreadable/unsupported/corrupt).
int sfod_image_decode(const char* path, uint8_t** out, int32_t* h, int32_t* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  int rc = -8;  // unknown format
  if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    rc = decode_jpeg(f, out, h, w);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    rc = decode_png(f, out, h, w);
  }
  fclose(f);
  return rc;
}

// Pillow-BILINEAR-bit-exact resize: src [h, w, c] uint8 -> dst [nh, nw, c]
// (caller-allocated). Two-pass fixed-point with a uint8 intermediate, exactly
// like Pillow's ImagingResample. Returns 0.
int sfod_resize_bilinear(const uint8_t* src, int32_t h, int32_t w, int32_t c,
                         uint8_t* dst, int32_t nh, int32_t nw) {
  if (h <= 0 || w <= 0 || c <= 0 || nh <= 0 || nw <= 0) return -1;
  const bool need_h = nw != w;
  const bool need_v = nh != h;
  std::vector<int> bounds;
  std::vector<int32_t> kk;
  if (!need_h && !need_v) {
    memcpy(dst, src, static_cast<size_t>(h) * w * c);
    return 0;
  }
  std::vector<uint8_t> tmp;
  const uint8_t* cur = src;
  int cur_h = h, cur_w = w;
  if (need_h) {
    int ksize = precompute_coeffs(w, nw, &bounds, &kk);
    if (need_v) {
      tmp.resize(static_cast<size_t>(h) * nw * c);
      resample_horizontal(cur, h, w, c, tmp.data(), nw, ksize, bounds, kk);
      cur = tmp.data();
    } else {
      resample_horizontal(cur, h, w, c, dst, nw, ksize, bounds, kk);
      return 0;
    }
    cur_w = nw;
  }
  int ksize = precompute_coeffs(cur_h, nh, &bounds, &kk);
  resample_vertical(cur, cur_h, cur_w, c, dst, nh, ksize, bounds, kk);
  return 0;
}

void sfod_image_free(void* p) { free(p); }

}  // extern "C"
