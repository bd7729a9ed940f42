// Native host-side JPEG decode for the ingest feed.
//
// The reference's loader spends its time in cv::imread
// (image_loader.cpp:52,85); this is the TPU framework's native equivalent:
// a minimal libjpeg-turbo decode path producing BGR8 buffers that the
// Python feed layer pins and ships to HBM (runtime/feed.py). Built as a
// plain shared library, bound via ctypes (no pybind11 in the image).
//
// Exports (C ABI):
//   tm_decode_jpeg(path, out_w, out_h) -> malloc'd BGR buffer or NULL
//   tm_free(buf)
//   tm_decode_jpeg_batch(paths, n, bufs, ws, hs, n_threads) -> 0 on success
//     (simple pthread pool; each worker decodes a stripe of the list)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <pthread.h>

#include <jpeglib.h>

extern "C" {

struct tm_error_mgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void tm_error_exit(j_common_ptr cinfo) {
  tm_error_mgr* err = reinterpret_cast<tm_error_mgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// scale_denom in {1,2,4,8}: libjpeg DCT-domain scaling — a denom-2 decode
// runs ~2.5-3x faster than full resolution and is a proper low-pass
// (the grouping stage detects at <=1800 px, so half-res sources lose no
// registration quality while quartering the host->device transfer).
unsigned char* tm_decode_jpeg_scaled(const char* path, int* out_w,
                                     int* out_h, int scale_denom) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;

  jpeg_decompress_struct cinfo;
  tm_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = tm_error_exit;
  // volatile: modified after setjmp and read in the longjmp handler — a
  // plain local's value would be indeterminate there (C99 7.13.2.1).
  unsigned char* volatile buf = nullptr;

  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(buf);
    return nullptr;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return nullptr;
  }
#ifdef JCS_EXTENSIONS
  cinfo.out_color_space = JCS_EXT_BGR;  // libjpeg-turbo: decode straight
                                        // into the BGR layout cv::Mat uses
#else
  cinfo.out_color_space = JCS_RGB;
#endif
  if (scale_denom == 2 || scale_denom == 4 || scale_denom == 8) {
    cinfo.scale_num = 1;
    cinfo.scale_denom = static_cast<unsigned int>(scale_denom);
  }
  jpeg_start_decompress(&cinfo);

  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  const int ch = static_cast<int>(cinfo.output_components);
  if (ch != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return nullptr;
  }
  const size_t stride = static_cast<size_t>(w) * 3;
  buf = static_cast<unsigned char*>(malloc(stride * h));
  if (!buf) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return nullptr;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = buf + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);

#ifndef JCS_EXTENSIONS
  // swap R<->B in place when the turbo extension is unavailable
  for (size_t i = 0; i + 2 < stride * h; i += 3) {
    unsigned char t = buf[i];
    buf[i] = buf[i + 2];
    buf[i + 2] = t;
  }
#endif
  *out_w = w;
  *out_h = h;
  return buf;
}

unsigned char* tm_decode_jpeg(const char* path, int* out_w, int* out_h) {
  return tm_decode_jpeg_scaled(path, out_w, out_h, 1);
}

// Raw 4:2:0 decode: returns the JPEG's NATIVE planar YCbCr representation
// without the upsample + color-convert passes (a ~30-40% faster decode),
// packed as (H*3/2, W) uint8 rows: Y (H x W), then U ((H/2 x W/2) raveled
// into H/4 rows of W), then V likewise — exactly cv2's I420 layout.
//
// Why: host->device transfer is the ingest bottleneck on a remote relay
// (a 200-frame 4K sortie is ~5 GB as BGR8); the source JPEGs already
// subsample chroma 4:2:0, so shipping their native planes moves 1.5
// bytes/px instead of 3 with no information loss. The device converts
// YCbCr->BGR inside the consuming fused programs, and the detect stages
// read the Y plane directly (it IS the BT.601 luma the gray conversion
// computes).
//
// Returns NULL (callers fall back to the BGR path) unless the file is a
// 3-component YCbCr JPEG with 2x2/1x1/1x1 sampling and even dimensions.
unsigned char* tm_decode_jpeg_yuv420(const char* path, int* out_w,
                                     int* out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;

  jpeg_decompress_struct cinfo;
  tm_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = tm_error_exit;
  unsigned char* volatile out = nullptr;
  unsigned char* volatile scratch = nullptr;

  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(out);
    free(scratch);
    return nullptr;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return nullptr;
  }
  const bool is420 =
      cinfo.num_components == 3 && cinfo.jpeg_color_space == JCS_YCbCr &&
      cinfo.comp_info[0].h_samp_factor == 2 &&
      cinfo.comp_info[0].v_samp_factor == 2 &&
      cinfo.comp_info[1].h_samp_factor == 1 &&
      cinfo.comp_info[1].v_samp_factor == 1 &&
      cinfo.comp_info[2].h_samp_factor == 1 &&
      cinfo.comp_info[2].v_samp_factor == 1;
  const int w = static_cast<int>(cinfo.image_width);
  const int h = static_cast<int>(cinfo.image_height);
  if (!is420 || (w % 2) || (h % 2) || w < 2 || h < 2) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return nullptr;
  }
  cinfo.raw_data_out = TRUE;
  jpeg_start_decompress(&cinfo);

  const int cw = w / 2, chh = h / 2;
  // row strides libjpeg writes: luma rows padded to the iMCU width (16),
  // chroma to 8 — decode into padded scratch stripes, compact into `out`
  const int ypad = ((w + 15) / 16) * 16;
  const int cpad = ((cw + 7) / 8) * 8;
  out = static_cast<unsigned char*>(
      malloc(static_cast<size_t>(w) * (h + chh)));
  // one iMCU stripe: 16 luma rows + 8 rows per chroma plane
  scratch = static_cast<unsigned char*>(
      malloc(static_cast<size_t>(16) * ypad + 2 * 8 * cpad));
  if (!out || !scratch) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(out);
    free(scratch);
    return nullptr;
  }
  unsigned char* ybuf = scratch;
  unsigned char* ubuf = scratch + static_cast<size_t>(16) * ypad;
  unsigned char* vbuf = ubuf + static_cast<size_t>(8) * cpad;
  JSAMPROW yrows[16], urows[8], vrows[8];
  for (int r = 0; r < 16; ++r) yrows[r] = ybuf + static_cast<size_t>(r) * ypad;
  for (int r = 0; r < 8; ++r) {
    urows[r] = ubuf + static_cast<size_t>(r) * cpad;
    vrows[r] = vbuf + static_cast<size_t>(r) * cpad;
  }
  JSAMPARRAY planes[3] = {yrows, urows, vrows};

  unsigned char* yout = out;
  unsigned char* uout = out + static_cast<size_t>(w) * h;
  unsigned char* vout = uout + static_cast<size_t>(cw) * chh;
  int yrow = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_raw_data(&cinfo, planes, 16);
    const int take = (h - yrow < 16) ? (h - yrow) : 16;
    for (int r = 0; r < take; ++r)
      memcpy(yout + static_cast<size_t>(yrow + r) * w,
             yrows[r], static_cast<size_t>(w));
    const int crow = yrow / 2;
    const int ctake = (chh - crow < 8) ? (chh - crow) : 8;
    for (int r = 0; r < ctake; ++r) {
      memcpy(uout + static_cast<size_t>(crow + r) * cw, urows[r],
             static_cast<size_t>(cw));
      memcpy(vout + static_cast<size_t>(crow + r) * cw, vrows[r],
             static_cast<size_t>(cw));
    }
    yrow += take;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  free(scratch);
  *out_w = w;
  *out_h = h;
  return out;
}

void tm_free(unsigned char* p) { free(p); }

struct BatchJob {
  const char** paths;
  unsigned char** bufs;
  int* ws;
  int* hs;
  int n;
  int n_threads;
  int tid;
  int scale_denom;
  int yuv420;
};

static void* batch_worker(void* arg) {
  BatchJob* job = static_cast<BatchJob*>(arg);
  for (int i = job->tid; i < job->n; i += job->n_threads) {
    job->bufs[i] =
        job->yuv420
            ? tm_decode_jpeg_yuv420(job->paths[i], &job->ws[i], &job->hs[i])
            : tm_decode_jpeg_scaled(job->paths[i], &job->ws[i], &job->hs[i],
                                    job->scale_denom);
  }
  return nullptr;
}

static int batch_run(const char** paths, int n, unsigned char** bufs,
                     int* ws, int* hs, int n_threads, int scale_denom,
                     int yuv420) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  pthread_t threads[64];
  BatchJob jobs[64];
  bool spawned[64];
  if (n_threads > 64) n_threads = 64;
  for (int t = 0; t < n_threads; ++t) {
    jobs[t] = BatchJob{paths, bufs,        ws, hs,
                       n,     n_threads,   t,  scale_denom,
                       yuv420};
    spawned[t] =
        pthread_create(&threads[t], nullptr, batch_worker, &jobs[t]) == 0;
    if (!spawned[t]) batch_worker(&jobs[t]);  // degrade to inline execution
  }
  for (int t = 0; t < n_threads; ++t) {
    if (spawned[t]) pthread_join(threads[t], nullptr);
  }
  return 0;
}

int tm_decode_jpeg_batch_scaled(const char** paths, int n,
                                unsigned char** bufs, int* ws, int* hs,
                                int n_threads, int scale_denom) {
  return batch_run(paths, n, bufs, ws, hs, n_threads, scale_denom, 0);
}

int tm_decode_jpeg_batch(const char** paths, int n, unsigned char** bufs,
                         int* ws, int* hs, int n_threads) {
  return batch_run(paths, n, bufs, ws, hs, n_threads, 1, 0);
}

int tm_decode_jpeg_batch_yuv420(const char** paths, int n,
                                unsigned char** bufs, int* ws, int* hs,
                                int n_threads) {
  return batch_run(paths, n, bufs, ws, hs, n_threads, 1, 1);
}

}  // extern "C"
