// Native preprocessing fast path for the host input pipeline.
//
// Fuses what the reference does in three python passes per image
// (cv2.resize -> ToTensor scale -> (ViT path) normalize;
// resnet_vqa_daquar_dataset.py:153-171) into one cache-friendly C++ loop:
// bilinear resize with OpenCV's half-pixel coordinate mapping, uint8 ->
// float32 [0,1] scaling, and optional per-channel mean/std normalization,
// writing the NHWC float output directly (no intermediate uint8 buffer).
//
// Built as libvqapreproc.so (see Makefile) and loaded via ctypes
// (native/loader.py); the cv2 python path remains the fallback and the
// golden in tests/test_native_preproc.py (agreement within 1 uint8 LSB).

#include <cstdint>
#include <cmath>
#include <algorithm>

extern "C" {

// src: uint8 [sh, sw, 3] RGB; dst: float32 [dh, dw, 3].
// mean/std: nullptr or float[3] applied as (x/255 - mean) / std.
void resize_bilinear_scale(const uint8_t* src, int sh, int sw,
                           float* dst, int dh, int dw,
                           const float* mean, const float* std_) {
    const float scale_y = static_cast<float>(sh) / dh;
    const float scale_x = static_cast<float>(sw) / dw;
    const float inv255 = 1.0f / 255.0f;

    float ch_scale[3] = {inv255, inv255, inv255};
    float ch_bias[3] = {0.0f, 0.0f, 0.0f};
    if (mean != nullptr && std_ != nullptr) {
        for (int c = 0; c < 3; ++c) {
            ch_scale[c] = inv255 / std_[c];
            ch_bias[c] = -mean[c] / std_[c];
        }
    }

    for (int dy = 0; dy < dh; ++dy) {
        // OpenCV half-pixel mapping: sy = (dy + 0.5) * scale - 0.5
        float fy = (dy + 0.5f) * scale_y - 0.5f;
        int y0 = static_cast<int>(std::floor(fy));
        float wy = fy - y0;
        int y1 = y0 + 1;
        y0 = std::clamp(y0, 0, sh - 1);
        y1 = std::clamp(y1, 0, sh - 1);
        const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
        const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
        float* out_row = dst + static_cast<size_t>(dy) * dw * 3;

        for (int dx = 0; dx < dw; ++dx) {
            float fx = (dx + 0.5f) * scale_x - 0.5f;
            int x0 = static_cast<int>(std::floor(fx));
            float wx = fx - x0;
            int x1 = x0 + 1;
            x0 = std::clamp(x0, 0, sw - 1);
            x1 = std::clamp(x1, 0, sw - 1);

            const float w00 = (1.0f - wy) * (1.0f - wx);
            const float w01 = (1.0f - wy) * wx;
            const float w10 = wy * (1.0f - wx);
            const float w11 = wy * wx;

            const uint8_t* p00 = row0 + x0 * 3;
            const uint8_t* p01 = row0 + x1 * 3;
            const uint8_t* p10 = row1 + x0 * 3;
            const uint8_t* p11 = row1 + x1 * 3;

            for (int c = 0; c < 3; ++c) {
                float v = w00 * p00[c] + w01 * p01[c] +
                          w10 * p10[c] + w11 * p11[c];
                out_row[dx * 3 + c] = v * ch_scale[c] + ch_bias[c];
            }
        }
    }
}

}  // extern "C"
