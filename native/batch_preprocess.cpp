// Native host-side batch preprocessor for the TPU input pipeline.
//
// Role parity: the reference's data path runs torchvision C++ transforms
// under its DataLoader workers; here a small C++ kernel handles the
// bandwidth-heavy uint8→float32 [-1,1] conversion (with optional horizontal
// flip) for NHWC batches, so Python never touches pixels element-wise.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libbatch_preprocess.so
//        batch_preprocess.cpp -pthread

#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// src: [n, h, w, c] uint8; dst: [n, h, w, c] float32 in [-1, 1];
// flip: [n] bytes (nonzero = mirror horizontally).
void normalize_batch(const uint8_t* src, float* dst, const uint8_t* flip,
                     int64_t n, int64_t h, int64_t w, int64_t c,
                     int num_threads) {
  const float scale = 2.0f / 255.0f;
  auto work = [&](int64_t img_begin, int64_t img_end) {
    for (int64_t i = img_begin; i < img_end; ++i) {
      const uint8_t* s_img = src + i * h * w * c;
      float* d_img = dst + i * h * w * c;
      const bool mirror = flip != nullptr && flip[i] != 0;
      for (int64_t y = 0; y < h; ++y) {
        const uint8_t* s_row = s_img + y * w * c;
        float* d_row = d_img + y * w * c;
        if (!mirror) {
          const int64_t count = w * c;
          for (int64_t k = 0; k < count; ++k) {
            d_row[k] = s_row[k] * scale - 1.0f;
          }
        } else {
          for (int64_t x = 0; x < w; ++x) {
            const uint8_t* s_px = s_row + (w - 1 - x) * c;
            float* d_px = d_row + x * c;
            for (int64_t ch = 0; ch < c; ++ch) {
              d_px[ch] = s_px[ch] * scale - 1.0f;
            }
          }
        }
      }
    }
  };

  if (num_threads <= 1 || n == 1) {
    work(0, n);
    return;
  }
  const int threads = static_cast<int>(
      std::min<int64_t>(num_threads, n));
  std::vector<std::thread> pool;
  const int64_t per = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t b = t * per;
    const int64_t e = std::min<int64_t>(b + per, n);
    if (b >= e) break;
    pool.emplace_back(work, b, e);
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
