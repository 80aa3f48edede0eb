// tdr_decode — native PNG/JPEG decoding for the training data path.
//
// The loader's hottest host-side work is image decode (the reference leans
// on OpenCV's C++ imdecode through Python workers).  This links directly
// against libpng/libjpeg with a two-phase C ABI for ctypes:
//   probe(path)        -> (h, w) so the caller allocates
//   decode_into(path)  -> RGB uint8 into a caller buffer
// plus a threaded decode_batch.  Grayscale/palette/alpha inputs are
// expanded/stripped to 3-channel RGB; 16-bit PNG is reduced to 8-bit
// (matching cv2.IMREAD_COLOR semantics for the standard datasets).
//
// Build: make -C native  (produces libtdr_decode.so)

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <png.h>
#include <jpeglib.h>

namespace {

bool has_suffix(const char* path, const char* a, const char* b) {
  std::string s(path);
  for (auto& c : s) c = tolower(c);
  auto ends = [&](const char* suf) {
    size_t n = strlen(suf);
    return s.size() >= n && s.compare(s.size() - n, n, suf) == 0;
  };
  return ends(a) || (b && ends(b));
}

struct JErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jerr_exit(j_common_ptr cinfo) {
  JErr* e = reinterpret_cast<JErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

int probe_jpeg(FILE* f, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int decode_jpeg(FILE* f, uint8_t* dst, int h, int w) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != h || (int)cinfo.output_width != w) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = dst + (int64_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int probe_png(FILE* f, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

int decode_png(FILE* f, uint8_t* dst, int h, int w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  if ((int)png_get_image_height(png, info) != h ||
      (int)png_get_image_width(png, info) != w) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  // normalize to 8-bit RGB
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = dst + (int64_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

}  // namespace

extern "C" {

// returns 0 on success; fills h, w
int tdr_probe(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int rc = has_suffix(path, ".jpg", ".jpeg") ? probe_jpeg(f, h, w)
                                             : probe_png(f, h, w);
  fclose(f);
  return rc;
}

// dst must be h*w*3 bytes (RGB)
int tdr_decode(const char* path, uint8_t* dst, int h, int w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int rc = has_suffix(path, ".jpg", ".jpeg") ? decode_jpeg(f, dst, h, w)
                                             : decode_png(f, dst, h, w);
  fclose(f);
  return rc;
}

// threaded batch decode; paths NUL-joined, dims[i*2..] = (h, w),
// dsts = array of buffers
int tdr_decode_batch(const char** paths, uint8_t** dsts, const int* dims,
                     int n, int n_threads) {
  std::vector<int> rcs(n, 0);
  auto work = [&](int b, int e) {
    for (int i = b; i < e; ++i)
      rcs[i] = tdr_decode(paths[i], dsts[i], dims[i * 2], dims[i * 2 + 1]);
  };
  if (n_threads <= 1 || n <= 1) {
    work(0, n);
  } else {
    std::vector<std::thread> ts;
    int per = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int b = t * per, e = std::min(n, (t + 1) * per);
      if (b >= e) break;
      ts.emplace_back(work, b, e);
    }
    for (auto& t : ts) t.join();
  }
  for (int r : rcs)
    if (r != 0) return r;
  return 0;
}

}  // extern "C"
