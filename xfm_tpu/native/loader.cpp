// xfm_tpu native data loader: threaded JPEG/PNG decode + crop + bilinear
// resize. The TPU-native replacement for the host-side hot path the
// reference leaves to PIL inside torch DataLoader workers
// (reference dataset/pretrain_dataset.py:239-246, dataset/__init__.py:221-246).
//
// Plain C ABI, loaded via ctypes (no pybind11 in the image). Workers are
// std::threads; the caller releases the GIL for the whole batch.
//
// Build: g++ -O3 -shared -fPIC loader.cpp -o libxfmloader.so -ljpeg -lpng -lpthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // HWC, 3 channels
  int w = 0, h = 0;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const uint8_t* data, long len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ----
struct PngReadState {
  const uint8_t* data;
  long len;
  long pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + static_cast<long>(n) > s->len) {
    png_error(png, "eof");
    return;
  }
  memcpy(out, s->data + s->pos, n);
  s->pos += n;
}

bool decode_png(const uint8_t* data, long len, Image* out) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState st{data, len, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->rgb.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const uint8_t* data, long len, Image* out) {
  if (len > 3 && data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data, len, out);
  if (len > 8 && data[0] == 0x89 && data[1] == 'P')
    return decode_png(data, len, out);
  // try both as fallback
  return decode_jpeg(data, len, out) || decode_png(data, len, out);
}

// bilinear crop+resize from src (region x,y,w,h) to out_size×out_size RGB,
// optional horizontal flip.
void crop_resize(const Image& src, int cx, int cy, int cw, int ch,
                 int out_size, int hflip, uint8_t* out) {
  if (cw <= 0 || ch <= 0) {
    cx = 0; cy = 0; cw = src.w; ch = src.h;
  }
  if (cx < 0) cx = 0;
  if (cy < 0) cy = 0;
  if (cx + cw > src.w) cw = src.w - cx;
  if (cy + ch > src.h) ch = src.h - cy;
  const float sx = float(cw) / out_size;
  const float sy = float(ch) / out_size;
  for (int oy = 0; oy < out_size; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f + cy;
    if (fy < 0) fy = 0;
    int y0 = int(fy);
    int y1 = y0 + 1 < src.h ? y0 + 1 : y0;
    float wy = fy - y0;
    for (int ox = 0; ox < out_size; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f + cx;
      if (fx < 0) fx = 0;
      int x0 = int(fx);
      int x1 = x0 + 1 < src.w ? x0 + 1 : x0;
      float wx = fx - x0;
      int tx = hflip ? (out_size - 1 - ox) : ox;
      uint8_t* dst = out + (size_t(oy) * out_size + tx) * 3;
      for (int c = 0; c < 3; ++c) {
        float v00 = src.rgb[(size_t(y0) * src.w + x0) * 3 + c];
        float v01 = src.rgb[(size_t(y0) * src.w + x1) * 3 + c];
        float v10 = src.rgb[(size_t(y1) * src.w + x0) * 3 + c];
        float v11 = src.rgb[(size_t(y1) * src.w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Single image: decode + crop(x,y,w,h; w/h<=0 = full) + resize + flip.
// out must hold out_size*out_size*3 bytes. Returns 0 on success.
int xfm_decode_crop_resize(const uint8_t* data, long len, int cx, int cy,
                           int cw, int ch, int out_size, int hflip,
                           uint8_t* out) {
  Image img;
  if (!decode_any(data, len, &img)) return 1;
  crop_resize(img, cx, cy, cw, ch, out_size, hflip, out);
  return 0;
}

// Dimensions without full decode (decodes header region; full decode for
// simplicity/corruption-safety). Returns 0 on success.
int xfm_image_dims(const uint8_t* data, long len, int* w, int* h) {
  Image img;
  if (!decode_any(data, len, &img)) return 1;
  *w = img.w;
  *h = img.h;
  return 0;
}

// Header-only dimensions: JPEG SOF marker scan / PNG IHDR parse — no pixel
// decode, so it is a cheap validity+size probe for batch admission.
// Returns 0 on success.
int xfm_image_dims_fast(const uint8_t* data, long len, int* w, int* h) {
  if (len > 3 && data[0] == 0xFF && data[1] == 0xD8) {  // JPEG
    long i = 2;
    while (i + 9 < len) {
      if (data[i] != 0xFF) return 1;
      uint8_t marker = data[i + 1];
      if (marker == 0xFF) { ++i; continue; }
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) {
        i += 2;
        continue;  // standalone markers
      }
      long seglen = (long(data[i + 2]) << 8) | data[i + 3];
      if (seglen < 2 || i + 2 + seglen > len) return 1;
      // SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
      if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 &&
          marker != 0xC8 && marker != 0xCC) {
        if (seglen < 7) return 1;
        *h = (int(data[i + 5]) << 8) | data[i + 6];
        *w = (int(data[i + 7]) << 8) | data[i + 8];
        return (*w > 0 && *h > 0) ? 0 : 1;
      }
      i += 2 + seglen;
    }
    return 1;
  }
  if (len > 24 && data[0] == 0x89 && data[1] == 'P') {  // PNG IHDR
    *w = (int(data[16]) << 24) | (int(data[17]) << 16) |
         (int(data[18]) << 8) | int(data[19]);
    *h = (int(data[20]) << 24) | (int(data[21]) << 16) |
         (int(data[22]) << 8) | int(data[23]);
    return (*w > 0 && *h > 0) ? 0 : 1;
  }
  return 1;
}

// Threaded batch: datas[i]/lens[i] are encoded images, crops is [B*4]
// (x,y,w,h per image; w<=0 = full frame), hflips is [B]. out is
// [B, out_size, out_size, 3] uint8. Returns number of failed images
// (failed slots are zero-filled).
int xfm_decode_batch_status(const uint8_t** datas, const long* lens,
                            const int* crops, int out_size,
                            const int* hflips, uint8_t* out, int n,
                            int threads, int* status);

int xfm_decode_batch(const uint8_t** datas, const long* lens,
                     const int* crops, int out_size, const int* hflips,
                     uint8_t* out, int n, int threads) {
  return xfm_decode_batch_status(datas, lens, crops, out_size, hflips, out,
                                 n, threads, nullptr);
}

// As xfm_decode_batch, plus per-slot status (0 ok / 1 failed) when
// `status` is non-null — callers can substitute failed slots instead of
// training on zero-filled images.
int xfm_decode_batch_status(const uint8_t** datas, const long* lens,
                            const int* crops, int out_size,
                            const int* hflips, uint8_t* out, int n,
                            int threads, int* status) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  std::atomic<int> next(0), failed(0);
  const size_t stride = size_t(out_size) * out_size * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      if (!decode_any(datas[i], lens[i], &img)) {
        memset(out + stride * i, 0, stride);
        if (status) status[i] = 1;
        failed.fetch_add(1);
        continue;
      }
      if (status) status[i] = 0;
      crop_resize(img, crops[4 * i], crops[4 * i + 1], crops[4 * i + 2],
                  crops[4 * i + 3], out_size, hflips[i], out + stride * i);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failed.load();
}

}  // extern "C"
