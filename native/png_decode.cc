// High-throughput grayscale PNG decoding for the ingest pipeline.
//
// The encode path's host-side bottleneck is PNG decode (SURVEY §7 hard part
// 4): mammograms are large single-channel PNGs and Python/PIL decode cannot
// keep a TPU fed.  This shim exposes a minimal C ABI over libpng, called from
// Python via ctypes (mmgclip_tpu/ingest/png_reader.py) across a thread pool —
// libpng itself is thread-safe per-context, so decodes parallelize across
// cores without the GIL.
//
// ABI:
//   int mmg_png_read_info(const char* path, int* width, int* height, int* bit_depth);
//   int mmg_png_decode_gray(const char* path, void* out, size_t out_bytes);
// Both return 0 on success, nonzero on failure.  Output rows are packed
// width * (bit_depth > 8 ? 2 : 1) bytes; 16-bit samples are host-endian.

#include <png.h>

#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct PngReader {
  FILE* file = nullptr;
  png_structp png = nullptr;
  png_infop info = nullptr;

  ~PngReader() {
    if (png != nullptr) {
      png_destroy_read_struct(&png, info != nullptr ? &info : nullptr, nullptr);
    }
    if (file != nullptr) {
      fclose(file);
    }
  }

  // Opens the file and reads the header; returns false on any failure.
  bool Open(const char* path) {
    file = fopen(path, "rb");
    if (file == nullptr) return false;

    unsigned char sig[8];
    if (fread(sig, 1, 8, file) != 8 || png_sig_cmp(sig, 0, 8) != 0) return false;

    png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (png == nullptr) return false;
    info = png_create_info_struct(png);
    if (info == nullptr) return false;
    if (setjmp(png_jmpbuf(png))) return false;

    png_init_io(png, file);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);
    return true;
  }
};

}  // namespace

extern "C" {

int mmg_png_read_info(const char* path, int* width, int* height, int* bit_depth) {
  PngReader reader;
  if (!reader.Open(path)) return 1;
  // re-arm the error jmp_buf: the one set inside Open()'s frame is stale
  // once Open returns, and a png_error longjmp through a dead frame is UB
  if (setjmp(png_jmpbuf(reader.png))) return 2;
  *width = static_cast<int>(png_get_image_width(reader.png, reader.info));
  *height = static_cast<int>(png_get_image_height(reader.png, reader.info));
  *bit_depth = png_get_bit_depth(reader.png, reader.info);
  return 0;
}

int mmg_png_decode_gray(const char* path, void* out, size_t out_bytes) {
  PngReader reader;
  if (!reader.Open(path)) return 1;
  if (setjmp(png_jmpbuf(reader.png))) return 2;

  png_structp png = reader.png;
  png_infop info = reader.info;

  const png_uint_32 width = png_get_image_width(png, info);
  const png_uint_32 height = png_get_image_height(png, info);
  const int color_type = png_get_color_type(png, info);
  int bit_depth = png_get_bit_depth(png, info);

  // normalize every input to single-channel gray at the native bit depth
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  const bool has_trns = png_get_valid(png, info, PNG_INFO_tRNS);
  if (has_trns) png_set_tRNS_to_alpha(png);
  // ITU-R 601 luma weights (x100000), matching PIL's convert("L")
  // (299/587/114) so the PIL fallback in png_reader.py decodes color
  // inputs to IDENTICAL gray values — libpng's default coefficients
  // (709-ish) would silently skew cached features across environments
  if (color_type & PNG_COLOR_MASK_COLOR) png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);
  // strip alpha whether it came from the color type OR from a tRNS chunk
  // (gray/palette PNGs lack the alpha mask bit but tRNS_to_alpha above
  // still adds a channel — without this the rowbytes double and decode
  // fails the size check)
  if ((color_type & PNG_COLOR_MASK_ALPHA) || has_trns) png_set_strip_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // PNG is big-endian; emit host LE

  png_read_update_info(png, info);
  const size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes * height > out_bytes) return 3;

  std::vector<png_bytep> rows(height);
  auto* base = static_cast<unsigned char*>(out);
  for (png_uint_32 y = 0; y < height; ++y) {
    rows[y] = base + y * rowbytes;
  }
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  return 0;
}

}  // extern "C"
