// Native data-loader core: JPEG decode + bilinear letterbox, C ABI.
//
// TPU-native counterpart of the reference's host decode path
// (reference utils/datasets.py:686-705 load_image: cv2.imread +
// cv2.resize). Two advantages over the cv2 path:
//   1. scaled IDCT decode: libjpeg can decode directly at 1/2, 1/4, 1/8
//      scale inside the inverse DCT, so a 4000px photo headed for a
//      640px canvas never materializes at full resolution. The scale is
//      chosen PER AXIS against the letterbox output dims (gain set by
//      the longer side), so any image >= 2x its target engages it;
//   2. decode -> resize -> letterbox-pad runs in one pass into the
//      caller's pinned batch buffer. When the chosen IDCT scale lands
//      exactly on the letterbox dims (e.g. 1280x960 -> 640 canvas:
//      1/2-scale decode IS 640x480) the entropy decoder writes straight
//      into the canvas slot — no intermediate buffer at all. libjpeg-
//      turbo's JCS_EXT_BGR emits cv2.imread's channel order directly.
//
// Exposed via ctypes (efficientteacher_tpu/utils/native_loader.py);
// built on demand by build.sh (g++ -O3 -shared, links system libjpeg).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

#ifdef JCS_EXTENSIONS
// libjpeg-turbo HEADERS: decode directly to cv2.imread's BGR order (same
// DCT / upsample / color-convert math as JCS_RGB — only the byte order
// moves, so bit-parity with the cv2 path is unchanged).
//
// JCS_EXTENSIONS is a COMPILE-TIME header property; the RUNTIME library the
// .so binds can still be plain libjpeg, whose jpeg_start_decompress rejects
// JCS_EXT_BGR — which would fail EVERY decode (the batch API would return
// all ok=0 with only a per-image fallback downstream). Probe once at load:
// decode a tiny embedded JPEG with JCS_EXT_BGR; on rejection, warn loudly
// and fall back to JCS_RGB + swizzle for the process lifetime.
const uint8_t kProbeJpeg[] = {
    0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10, 0x4a, 0x46, 0x49, 0x46, 0x00, 0x01,
    0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00, 0xff, 0xdb, 0x00, 0x43,
    0x00, 0x0a, 0x07, 0x07, 0x08, 0x07, 0x06, 0x0a, 0x08, 0x08, 0x08, 0x0b,
    0x0a, 0x0a, 0x0b, 0x0e, 0x18, 0x10, 0x0e, 0x0d, 0x0d, 0x0e, 0x1d, 0x15,
    0x16, 0x11, 0x18, 0x23, 0x1f, 0x25, 0x24, 0x22, 0x1f, 0x22, 0x21, 0x26,
    0x2b, 0x37, 0x2f, 0x26, 0x29, 0x34, 0x29, 0x21, 0x22, 0x30, 0x41, 0x31,
    0x34, 0x39, 0x3b, 0x3e, 0x3e, 0x3e, 0x25, 0x2e, 0x44, 0x49, 0x43, 0x3c,
    0x48, 0x37, 0x3d, 0x3e, 0x3b, 0xff, 0xdb, 0x00, 0x43, 0x01, 0x0a, 0x0b,
    0x0b, 0x0e, 0x0d, 0x0e, 0x1c, 0x10, 0x10, 0x1c, 0x3b, 0x28, 0x22, 0x28,
    0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b,
    0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b,
    0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b,
    0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b, 0x3b,
    0x3b, 0x3b, 0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x08, 0x00, 0x08, 0x03,
    0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01, 0xff, 0xc4, 0x00,
    0x1f, 0x00, 0x00, 0x01, 0x05, 0x01, 0x01, 0x01, 0x01, 0x01, 0x01, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x01, 0x02, 0x03, 0x04, 0x05,
    0x06, 0x07, 0x08, 0x09, 0x0a, 0x0b, 0xff, 0xc4, 0x00, 0xb5, 0x10, 0x00,
    0x02, 0x01, 0x03, 0x03, 0x02, 0x04, 0x03, 0x05, 0x05, 0x04, 0x04, 0x00,
    0x00, 0x01, 0x7d, 0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21,
    0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81,
    0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25,
    0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a,
    0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56,
    0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a,
    0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86,
    0x87, 0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99,
    0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3,
    0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6,
    0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe1, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1,
    0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa, 0xff, 0xc4, 0x00,
    0x1f, 0x01, 0x00, 0x03, 0x01, 0x01, 0x01, 0x01, 0x01, 0x01, 0x01, 0x01,
    0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x01, 0x02, 0x03, 0x04, 0x05,
    0x06, 0x07, 0x08, 0x09, 0x0a, 0x0b, 0xff, 0xc4, 0x00, 0xb5, 0x11, 0x00,
    0x02, 0x01, 0x02, 0x04, 0x04, 0x03, 0x04, 0x07, 0x05, 0x04, 0x04, 0x00,
    0x01, 0x02, 0x77, 0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31,
    0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08,
    0x14, 0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18,
    0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55,
    0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84,
    0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97,
    0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa,
    0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4,
    0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7,
    0xd8, 0xd9, 0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa, 0xff, 0xda, 0x00,
    0x0c, 0x03, 0x01, 0x00, 0x02, 0x11, 0x03, 0x11, 0x00, 0x3f, 0x00, 0x28,
    0xa2, 0x8a, 0x00, 0xff, 0xd9};

bool probe_ext_bgr() {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = on_error;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fprintf(stderr,
                 "[loader_core] runtime libjpeg rejected JCS_EXT_BGR "
                 "(built against libjpeg-turbo headers, running against "
                 "plain libjpeg?) — falling back to JCS_RGB + swizzle\n");
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, kProbeJpeg, sizeof(kProbeJpeg));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_EXT_BGR;
  jpeg_start_decompress(&cinfo);
  uint8_t rowbuf[8 * 3];
  JSAMPROW row = rowbuf;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// evaluated once at dlopen, before any decode job can run
const bool kUseExtBgr = probe_ext_bgr();
const J_COLOR_SPACE kOutSpace = kUseExtBgr ? JCS_EXT_BGR : JCS_RGB;
const bool kSwapRB = !kUseExtBgr;  // swizzle RGB->BGR at the copy/resize
#else
constexpr J_COLOR_SPACE kOutSpace = JCS_RGB;
constexpr bool kSwapRB = true;  // swizzle RGB->BGR at the copy/resize
#endif

// Bilinear resize (cv2.INTER_LINEAR half-pixel-center convention) into a
// sub-rectangle of the canvas. Channel order: src is already BGR under
// libjpeg-turbo (kSwapRB=false); plain-libjpeg RGB swizzles at the store.
void resize_into(const uint8_t* src, int sw, int sh, uint8_t* dst,
                 int dstride_px, int dw, int dh) {
  if (sw == dw && sh == dh) {
    // identity scale: straight row copy (or swizzle copy without turbo)
    for (int y = 0; y < dh; ++y) {
      const uint8_t* in = src + static_cast<size_t>(y) * sw * 3;
      uint8_t* out = dst + static_cast<size_t>(y) * dstride_px * 3;
      if (!kSwapRB) {
        std::memcpy(out, in, static_cast<size_t>(dw) * 3);
      } else {
        for (int x = 0; x < dw; ++x) {
          out[x * 3 + 0] = in[x * 3 + 2];
          out[x * 3 + 1] = in[x * 3 + 1];
          out[x * 3 + 2] = in[x * 3 + 0];
        }
      }
    }
    return;
  }
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> fxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    float t = fx - x0;
    if (x0 < 0) { x0 = 0; t = 0.f; }
    int x1 = std::min(x0 + 1, sw - 1);
    x0 = std::min(x0, sw - 1);
    x0s[x] = x0; x1s[x] = x1; fxs[x] = t;
  }
  // Separable form with a rolling pair of horizontally-lerped rows: the
  // cached rows ARE the fused loop's `top`/`bot` terms (same float
  // expressions, so output stays bit-identical), but adjacent output rows
  // reuse them and the vertical blend below is a gather-free stream the
  // compiler vectorizes.
  std::vector<float> rowa(static_cast<size_t>(dw) * 3);
  std::vector<float> rowb(static_cast<size_t>(dw) * 3);
  int ya = -1, yb = -1;
  auto hlerp = [&](int srow, float* o) {
    const uint8_t* r = src + static_cast<size_t>(srow) * sw * 3;
    for (int x = 0; x < dw; ++x) {
      const int a = x0s[x] * 3, b = x1s[x] * 3;
      const float tx = fxs[x];
      o[x * 3 + 0] = r[a + 0] + tx * (r[b + 0] - r[a + 0]);
      o[x * 3 + 1] = r[a + 1] + tx * (r[b + 1] - r[a + 1]);
      o[x * 3 + 2] = r[a + 2] + tx * (r[b + 2] - r[a + 2]);
    }
  };
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float ty = fy - y0;
    if (y0 < 0) { y0 = 0; ty = 0.f; }
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::min(y0, sh - 1);
    if (ya != y0) {
      if (yb == y0) {
        std::swap(rowa, rowb);
        std::swap(ya, yb);
      } else {
        hlerp(y0, rowa.data());
        ya = y0;
      }
    }
    const float* pa = rowa.data();
    const float* pb;
    if (y1 == ya) {
      pb = pa;
    } else {
      if (yb != y1) {
        hlerp(y1, rowb.data());
        yb = y1;
      }
      pb = rowb.data();
    }
    uint8_t* out = dst + static_cast<size_t>(y) * dstride_px * 3;
    for (int x = 0; x < dw; ++x) {
      const float v0 = pa[x * 3 + 0] + ty * (pb[x * 3 + 0] - pa[x * 3 + 0]);
      const float v1 = pa[x * 3 + 1] + ty * (pb[x * 3 + 1] - pa[x * 3 + 1]);
      const float v2 = pa[x * 3 + 2] + ty * (pb[x * 3 + 2] - pa[x * 3 + 2]);
      if (!kSwapRB) {
        out[x * 3 + 0] = static_cast<uint8_t>(v0 + 0.5f);
        out[x * 3 + 1] = static_cast<uint8_t>(v1 + 0.5f);
        out[x * 3 + 2] = static_cast<uint8_t>(v2 + 0.5f);
      } else {
        out[x * 3 + 0] = static_cast<uint8_t>(v2 + 0.5f);  // RGB->BGR
        out[x * 3 + 1] = static_cast<uint8_t>(v1 + 0.5f);
        out[x * 3 + 2] = static_cast<uint8_t>(v0 + 0.5f);
      }
    }
  }
}

// Resize destination computed from the full-resolution dims once the
// header is parsed (letterbox round vs load_image trunc conventions live
// in the caller's plan lambda).
struct Plan {
  int new_w, new_h;   // resize output dims
  uint8_t* dst;       // top-left of the destination sub-rectangle
  int stride_px;      // destination row stride in pixels
};

// Decode `path`, pick the largest IDCT downscale d in {1,2,4,8} with
// full_w >= new_w*2d AND full_h >= new_h*2d (decoded dims stay >= the
// resize target with >= 2x headroom, so no prescale ever triggers for
// images under 2x their target — the bit-parity contract), then resize
// into the planned rectangle. When the decoded dims land exactly on
// (new_w, new_h) under turbo-BGR, scanlines stream straight into dst.
template <typename PlanFn>
bool decode_jpeg_to(const char* path, PlanFn make_plan,
                    int* full_w, int* full_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = on_error;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  const int fw = static_cast<int>(cinfo.image_width);
  const int fh = static_cast<int>(cinfo.image_height);
  *full_w = fw;
  *full_h = fh;
  Plan p = make_plan(fw, fh);
  int denom = 1;
  while (denom < 8 &&
         fw >= p.new_w * denom * 2 && fh >= p.new_h * denom * 2) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = static_cast<unsigned>(denom);
  cinfo.out_color_space = kOutSpace;
  jpeg_start_decompress(&cinfo);
  const int ow = static_cast<int>(cinfo.output_width);
  const int oh = static_cast<int>(cinfo.output_height);
  if (!kSwapRB && ow == p.new_w && oh == p.new_h) {
    // decoded scale == resize target: entropy-decode rows directly into
    // the (strided) destination rectangle, no intermediate buffer
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW row = p.dst +
          static_cast<size_t>(cinfo.output_scanline) * p.stride_px * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
  } else {
    // reused across jobs on the same pool thread (no per-image alloc)
    thread_local std::vector<uint8_t> scratch;
    const size_t need = static_cast<size_t>(ow) * oh * 3;
    if (scratch.size() < need) scratch.resize(need);
    JSAMPROW row;
    while (cinfo.output_scanline < cinfo.output_height) {
      row = scratch.data() +
          static_cast<size_t>(cinfo.output_scanline) * ow * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    resize_into(scratch.data(), ow, oh, p.dst, p.stride_px,
                p.new_w, p.new_h);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

struct Job {
  const char* path;
  uint8_t* out;      // (img_size, img_size, 3) slot
  int img_size;
  int pad_value;
  int* hw0;          // [h0, w0]
  float* ratio_pad;  // [rh, rw, dw, dh]
  int* ok;
};

void run_job(const Job& j) {
  int fw = 0, fh = 0;
  int new_w = 0, new_h = 0, pad_x = 0, pad_y = 0;
  const bool good = decode_jpeg_to(
      j.path,
      [&](int fw_, int fh_) {
        // letterbox convention: round() on double, like data/augment.py:48
        const double gain = std::min(
            static_cast<double>(j.img_size) / fw_,
            static_cast<double>(j.img_size) / fh_);
        new_w = std::max(1, static_cast<int>(std::lround(fw_ * gain)));
        new_h = std::max(1, static_cast<int>(std::lround(fh_ * gain)));
        pad_x = (j.img_size - new_w) / 2;
        pad_y = (j.img_size - new_h) / 2;
        std::memset(j.out, j.pad_value,
                    static_cast<size_t>(j.img_size) * j.img_size * 3);
        return Plan{new_w, new_h,
                    j.out + (static_cast<size_t>(pad_y) * j.img_size +
                             pad_x) * 3,
                    j.img_size};
      },
      &fw, &fh);
  if (!good) {
    *j.ok = 0;
    return;
  }
  j.hw0[0] = fh;
  j.hw0[1] = fw;
  // recorded native->canvas transform, same contract as the rect loader's
  // ratio_pad (validator scale_coords input)
  j.ratio_pad[0] = static_cast<float>(new_h) / fh;
  j.ratio_pad[1] = static_cast<float>(new_w) / fw;
  j.ratio_pad[2] = static_cast<float>(pad_x);
  j.ratio_pad[3] = static_cast<float>(pad_y);
  *j.ok = 1;
}

}  // namespace

extern "C" {

// Decode + letterbox a batch of JPEGs into out (n, img_size, img_size, 3)
// BGR u8 (cv2.imread convention; flipped to RGB at collate —
// utils/native_loader.py documents the channel contract). hw0: (n, 2)
// native dims; ratio_pad: (n, 4) [rh, rw, dw, dh]; ok: (n,) per-image
// success. Returns number of successfully loaded images.
int et_load_letterbox_batch(const char** paths, int n, uint8_t* out,
                            int img_size, int pad_value, int* hw0,
                            float* ratio_pad, int* ok, int threads) {
  std::vector<Job> jobs(n);
  for (int i = 0; i < n; ++i) {
    jobs[i] = Job{
        paths[i],
        out + static_cast<size_t>(i) * img_size * img_size * 3,
        img_size,
        pad_value,
        hw0 + 2 * i,
        ratio_pad + 4 * i,
        ok + i,
    };
  }
  if (threads <= 1 || n <= 1) {
    for (auto& j : jobs) run_job(j);
  } else {
    std::atomic<int> next{0};
    auto worker = [&]() {
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= n) return;
        run_job(jobs[i]);
      }
    };
    const int t = std::min(threads, n);
    std::vector<std::thread> pool;
    pool.reserve(t);
    for (int i = 0; i < t; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  int good = 0;
  for (int i = 0; i < n; ++i) good += ok[i];
  return good;
}

// Single-image decode to the caller's buffer at the post-resize size the
// reference's load_image produces (longer side == img_size). Returns 0 on
// failure; on success fills out (resized_h, resized_w) and native dims.
int et_load_image(const char* path, uint8_t* out, int img_size,
                  int* h0w0, int* hw) {
  int fw = 0, fh = 0;
  int new_w = 0, new_h = 0;
  const bool good = decode_jpeg_to(
      path,
      [&](int fw_, int fh_) {
        // load_image convention: int() TRUNCATION on double, like
        // data/datasets.py load_image `int(w0 * r)` (reference
        // datasets.py:1213)
        const double r = static_cast<double>(img_size) / std::max(fw_, fh_);
        new_w = std::max(1, static_cast<int>(fw_ * r));
        new_h = std::max(1, static_cast<int>(fh_ * r));
        return Plan{new_w, new_h, out, new_w};
      },
      &fw, &fh);
  if (!good) return 0;
  h0w0[0] = fh;
  h0w0[1] = fw;
  hw[0] = new_h;
  hw[1] = new_w;
  return 1;
}

}  // extern "C"
