// Streaming (scanline-incremental) JPEG encoder for mosaic output.
//
// The reference writes its panorama with cv::imwrite after the blend
// finishes (stitch_app.cpp:262-263) — a serial encode of the full mosaic
// (~60-100 s host time for a 380 MP ortho). This encoder accepts row
// bands as the tiled blender materializes them, so JPEG entropy coding
// overlaps the remaining tiles' device compute instead of trailing it.
//
// Exports (C ABI, ctypes-bound in utils/native.py):
//   tm_jpeg_enc_start(path, w, h, quality) -> opaque handle or NULL
//   tm_jpeg_enc_write_bgr(handle, rows, n_rows) -> 0 ok (input is BGR8,
//     swizzled to RGB per row here; libjpeg consumes scanlines in order)
//   tm_jpeg_enc_finish(handle) -> 0 ok; closes + frees
//   tm_jpeg_enc_abort(handle)  -> cleanup without finishing the file

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>

#include <jpeglib.h>

extern "C" {

struct tm_enc_error_mgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void tm_enc_error_exit(j_common_ptr cinfo) {
  tm_enc_error_mgr* err = reinterpret_cast<tm_enc_error_mgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

struct tm_jpeg_encoder {
  jpeg_compress_struct cinfo;
  tm_enc_error_mgr jerr;
  FILE* f;
  int w;
  int h;
  unsigned char* rowbuf;  // one RGB row for the BGR->RGB swizzle
  int failed;
};

void* tm_jpeg_enc_start(const char* path, int w, int h, int quality) {
  if (w <= 0 || h <= 0) return nullptr;
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  tm_jpeg_encoder* enc =
      static_cast<tm_jpeg_encoder*>(calloc(1, sizeof(tm_jpeg_encoder)));
  if (!enc) {
    fclose(f);
    return nullptr;
  }
  enc->f = f;
  enc->w = w;
  enc->h = h;
  enc->rowbuf = static_cast<unsigned char*>(malloc(3 * (size_t)w));
  if (!enc->rowbuf) {
    fclose(f);
    free(enc);
    return nullptr;
  }
  enc->cinfo.err = jpeg_std_error(&enc->jerr.pub);
  enc->jerr.pub.error_exit = tm_enc_error_exit;
  if (setjmp(enc->jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&enc->cinfo);
    fclose(enc->f);
    free(enc->rowbuf);
    free(enc);
    return nullptr;
  }
  jpeg_create_compress(&enc->cinfo);
  jpeg_stdio_dest(&enc->cinfo, f);
  enc->cinfo.image_width = w;
  enc->cinfo.image_height = h;
  enc->cinfo.input_components = 3;
  enc->cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&enc->cinfo);
  jpeg_set_quality(&enc->cinfo, quality, TRUE);
  jpeg_start_compress(&enc->cinfo, TRUE);
  return enc;
}

int tm_jpeg_enc_write_bgr(void* handle, const unsigned char* rows,
                          int n_rows) {
  tm_jpeg_encoder* enc = static_cast<tm_jpeg_encoder*>(handle);
  if (!enc || enc->failed || n_rows < 0) return 1;
  if (setjmp(enc->jerr.setjmp_buffer)) {
    enc->failed = 1;
    return 1;
  }
  const size_t stride = 3 * (size_t)enc->w;
  for (int r = 0; r < n_rows; ++r) {
    const unsigned char* src = rows + r * stride;
    unsigned char* dst = enc->rowbuf;
    for (int x = 0; x < enc->w; ++x) {
      dst[0] = src[2];
      dst[1] = src[1];
      dst[2] = src[0];
      src += 3;
      dst += 3;
    }
    JSAMPROW rowp = enc->rowbuf;
    if (jpeg_write_scanlines(&enc->cinfo, &rowp, 1) != 1) {
      enc->failed = 1;
      return 1;
    }
  }
  return 0;
}

int tm_jpeg_enc_finish(void* handle) {
  tm_jpeg_encoder* enc = static_cast<tm_jpeg_encoder*>(handle);
  if (!enc) return 1;
  int rc = 1;
  if (!enc->failed &&
      enc->cinfo.next_scanline == (JDIMENSION)enc->h &&
      !setjmp(enc->jerr.setjmp_buffer)) {
    jpeg_finish_compress(&enc->cinfo);
    rc = 0;
  }
  jpeg_destroy_compress(&enc->cinfo);
  if (fclose(enc->f) != 0) rc = 1;
  free(enc->rowbuf);
  free(enc);
  return rc;
}

void tm_jpeg_enc_abort(void* handle) {
  tm_jpeg_encoder* enc = static_cast<tm_jpeg_encoder*>(handle);
  if (!enc) return;
  jpeg_destroy_compress(&enc->cinfo);
  fclose(enc->f);
  free(enc->rowbuf);
  free(enc);
}

}  // extern "C"
