// Native data-loading core for the UnrealStereo4K pipeline.
//
// The reference's data layer is pure Python feeding CUDA; here the host-side
// hot loop (raw 2160x3840x3 BGR blob -> normalized RGB float32, plus the
// torch-exact bilinear align_corners=True resize used for image_lr and patch
// crops) runs as vectorizable C++ invoked through ctypes
// (patchrefinerv2_tpu/datasets/native.py). Keeps TPU input pipelines fed
// without a Python inner loop.
//
// Build: native/build.sh  ->  native/libprv2io.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Read a raw uint8 HxWx3 BGR blob from disk and emit float32 RGB in [0,1].
// Returns 0 on success, -1 on IO failure.
int load_raw_bgr_as_rgb_f32(const char* path, float* out, int h, int w) {
    const size_t n = (size_t)h * w * 3;
    std::vector<uint8_t> buf(n);
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    size_t got = fread(buf.data(), 1, n, f);
    fclose(f);
    if (got != n) return -1;
    const float inv = 1.0f / 255.0f;
    const uint8_t* src = buf.data();
    for (size_t i = 0; i < (size_t)h * w; ++i) {
        // BGR -> RGB swap
        out[i * 3 + 0] = src[i * 3 + 2] * inv;
        out[i * 3 + 1] = src[i * 3 + 1] * inv;
        out[i * 3 + 2] = src[i * 3 + 0] * inv;
    }
    return 0;
}

// Bilinear resize with torch align_corners=True semantics on HWC float32.
// Source coordinates computed in float32 exactly like torch
// (upsample_bilinear2d with align_corners).
void resize_bilinear_ac(const float* in, int ih, int iw, int c,
                        float* out, int oh, int ow) {
    const float sh = (oh > 1) ? (float)(ih - 1) / (float)(oh - 1) : 0.0f;
    const float sw = (ow > 1) ? (float)(iw - 1) / (float)(ow - 1) : 0.0f;
    std::vector<int> x0v(ow), x1v(ow);
    std::vector<float> lxv(ow);
    for (int x = 0; x < ow; ++x) {
        float sx = sw * (float)x;
        int x0 = (int)sx;
        if (x0 > iw - 1) x0 = iw - 1;
        int x1 = (x0 + 1 < iw) ? x0 + 1 : iw - 1;
        x0v[x] = x0; x1v[x] = x1; lxv[x] = sx - (float)x0;
    }
    for (int y = 0; y < oh; ++y) {
        float sy = sh * (float)y;
        int y0 = (int)sy;
        if (y0 > ih - 1) y0 = ih - 1;
        int y1 = (y0 + 1 < ih) ? y0 + 1 : ih - 1;
        float ly = sy - (float)y0;
        const float* row0 = in + (size_t)y0 * iw * c;
        const float* row1 = in + (size_t)y1 * iw * c;
        float* orow = out + (size_t)y * ow * c;
        for (int x = 0; x < ow; ++x) {
            const float lx = lxv[x];
            const float* p00 = row0 + (size_t)x0v[x] * c;
            const float* p01 = row0 + (size_t)x1v[x] * c;
            const float* p10 = row1 + (size_t)x0v[x] * c;
            const float* p11 = row1 + (size_t)x1v[x] * c;
            for (int k = 0; k < c; ++k) {
                float top = p00[k] + (p01[k] - p00[k]) * lx;
                float bot = p10[k] + (p11[k] - p10[k]) * lx;
                orow[(size_t)x * c + k] = top + (bot - top) * ly;
            }
        }
    }
}

// Crop a patch then resize (fused, avoids materializing the crop).
void crop_resize_bilinear_ac(const float* in, int ih, int iw, int c,
                             int y_start, int x_start, int ch, int cw,
                             float* out, int oh, int ow) {
    const float shf = (oh > 1) ? (float)(ch - 1) / (float)(oh - 1) : 0.0f;
    const float swf = (ow > 1) ? (float)(cw - 1) / (float)(ow - 1) : 0.0f;
    for (int y = 0; y < oh; ++y) {
        float sy = shf * (float)y;
        int y0 = (int)sy;
        if (y0 > ch - 1) y0 = ch - 1;
        int y1 = (y0 + 1 < ch) ? y0 + 1 : ch - 1;
        float ly = sy - (float)y0;
        const float* row0 = in + ((size_t)(y0 + y_start) * iw + x_start) * c;
        const float* row1 = in + ((size_t)(y1 + y_start) * iw + x_start) * c;
        float* orow = out + (size_t)y * ow * c;
        for (int x = 0; x < ow; ++x) {
            float sx = swf * (float)x;
            int x0 = (int)sx;
            if (x0 > cw - 1) x0 = cw - 1;
            int x1 = (x0 + 1 < cw) ? x0 + 1 : cw - 1;
            float lx = sx - (float)x0;
            const float* p00 = row0 + (size_t)x0 * c;
            const float* p01 = row0 + (size_t)x1 * c;
            const float* p10 = row1 + (size_t)x0 * c;
            const float* p11 = row1 + (size_t)x1 * c;
            for (int k = 0; k < c; ++k) {
                float top = p00[k] + (p01[k] - p00[k]) * lx;
                float bot = p10[k] + (p11[k] - p10[k]) * lx;
                orow[(size_t)x * c + k] = top + (bot - top) * ly;
            }
        }
    }
}

}  // extern "C"
