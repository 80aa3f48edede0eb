// tdr_dataio — native host-side data-path kernels for the training loader.
//
// TPU-native replacement for the C/C++ the reference leans on through
// OpenCV/torch dataloader workers (SURVEY.md §2.4): the per-sample hot ops
// (uint8 -> float32 normalize, paired crop, 8-mode dihedral augmentation,
// Gaussian noise synthesis) run here as vectorizable single-pass loops, and
// batch assembly is multi-threaded over samples.  Exposed via a plain C ABI
// for ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libtdr_dataio.so)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// uint8 HWC -> float32 HWC in [0,1]
void u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kInv = 1.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * kInv;
}

// crop: src (H, W, C) f32 -> dst (ph, pw, C), top-left (top, left)
void crop_f32(const float* src, float* dst, int h, int w, int c, int top,
              int left, int ph, int pw) {
  (void)h;
  for (int y = 0; y < ph; ++y) {
    std::memcpy(dst + (int64_t)y * pw * c,
                src + ((int64_t)(top + y) * w + left) * c,
                sizeof(float) * pw * c);
  }
}

// 8-mode dihedral augmentation (matches data/transforms._aug_mode):
// 0: id, 1: flipud, 2: rot90, 3: flipud(rot90), 4: rot180,
// 5: flipud(rot180), 6: rot270, 7: flipud(rot270)
void augment_f32(const float* src, float* dst, int h, int w, int c,
                 int mode) {
  const bool swap = (mode == 2 || mode == 3 || mode == 6 || mode == 7);
  const int oh = swap ? w : h;
  const int ow = swap ? h : w;
  for (int oy = 0; oy < oh; ++oy) {
    for (int ox = 0; ox < ow; ++ox) {
      int sy, sx;
      switch (mode) {
        case 0: sy = oy; sx = ox; break;
        case 1: sy = h - 1 - oy; sx = ox; break;
        // np.rot90: out[i][j] = in[j][W-1-i]  (out is WxH)
        case 2: sy = ox; sx = w - 1 - oy; break;
        case 3: sy = ox; sx = w - 1 - (oh - 1 - oy); break;
        case 4: sy = h - 1 - oy; sx = w - 1 - ox; break;
        case 5: sy = oy; sx = w - 1 - ox; break;
        // rot270: out[i][j] = in[H-1-j][i]  (out is WxH)
        case 6: sy = h - 1 - ox; sx = oy; break;
        case 7: sy = h - 1 - ox; sx = oh - 1 - oy; break;
        default: sy = oy; sx = ox; break;
      }
      std::memcpy(dst + ((int64_t)oy * ow + ox) * c,
                  src + ((int64_t)sy * w + sx) * c, sizeof(float) * c);
    }
  }
}

// Gaussian noise synthesis: dst = src + N(0, sigma/255)^ per element.
// Deterministic per (seed) — mirrors the seeded eval protocol.
void add_gaussian_noise(const float* src, float* dst, int64_t n, float sigma,
                        uint64_t seed) {
  std::mt19937_64 gen(seed);
  std::normal_distribution<float> nd(0.0f, sigma / 255.0f);
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] + nd(gen);
}

struct BatchJob {
  const uint8_t* src;  // (H, W, C) uint8
  float* dst;          // (ph, pw, C) f32
  int h, w, c, top, left, ph, pw, aug_mode;
};

// batch_prepare: per-sample u8->f32 + crop + augment, threaded over samples.
// srcs/dsts are arrays of pointers; params packed per sample as
// [h, w, c, top, left, ph, pw, aug_mode].
void batch_prepare(const uint8_t** srcs, float** dsts, const int* params,
                   int n_samples, int n_threads) {
  auto work = [&](int begin, int end) {
    std::vector<float> tmp_a, tmp_b;
    for (int s = begin; s < end; ++s) {
      const int* p = params + s * 8;
      const int h = p[0], w = p[1], c = p[2], top = p[3], left = p[4],
                ph = p[5], pw = p[6], mode = p[7];
      tmp_a.resize((int64_t)h * w * c);
      u8_to_f32(srcs[s], tmp_a.data(), (int64_t)h * w * c);
      tmp_b.resize((int64_t)ph * pw * c);
      crop_f32(tmp_a.data(), tmp_b.data(), h, w, c, top, left, ph, pw);
      augment_f32(tmp_b.data(), dsts[s], ph, pw, c, mode);
    }
  };
  if (n_threads <= 1 || n_samples <= 1) {
    work(0, n_samples);
    return;
  }
  std::vector<std::thread> ts;
  const int per = (n_samples + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int b = t * per, e = std::min(n_samples, (t + 1) * per);
    if (b >= e) break;
    ts.emplace_back(work, b, e);
  }
  for (auto& t : ts) t.join();
}

// crc32c (Castagnoli, reflected) — slice-by-8 table method.  The packed
// TFRecord archive path (data/packed.py) computes two CRCs per record;
// a Python per-byte loop is ~1M interpreter iterations per MB, which makes
// packing real datasets on a 1-core host take hours.
static uint32_t g_crc_tables[8][256];
static bool g_crc_init = false;

static void crc32c_init_tables() {
  constexpr uint32_t kPoly = 0x82F63B78u;
  for (int i = 0; i < 256; ++i) {
    uint32_t c = (uint32_t)i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ kPoly : c >> 1;
    g_crc_tables[0][i] = c;
  }
  for (int t = 1; t < 8; ++t) {
    for (int i = 0; i < 256; ++i) {
      const uint32_t c = g_crc_tables[t - 1][i];
      g_crc_tables[t][i] = g_crc_tables[0][c & 0xFF] ^ (c >> 8);
    }
  }
  g_crc_init = true;
}

uint32_t crc32c(const uint8_t* data, int64_t n) {
  if (!g_crc_init) crc32c_init_tables();
  uint32_t crc = 0xFFFFFFFFu;
  int64_t i = 0;
  for (; i + 8 <= n; i += 8) {
    const uint32_t lo = crc ^ ((uint32_t)data[i] | ((uint32_t)data[i + 1] << 8) |
                               ((uint32_t)data[i + 2] << 16) |
                               ((uint32_t)data[i + 3] << 24));
    const uint32_t hi = (uint32_t)data[i + 4] | ((uint32_t)data[i + 5] << 8) |
                        ((uint32_t)data[i + 6] << 16) |
                        ((uint32_t)data[i + 7] << 24);
    crc = g_crc_tables[7][lo & 0xFF] ^ g_crc_tables[6][(lo >> 8) & 0xFF] ^
          g_crc_tables[5][(lo >> 16) & 0xFF] ^ g_crc_tables[4][lo >> 24] ^
          g_crc_tables[3][hi & 0xFF] ^ g_crc_tables[2][(hi >> 8) & 0xFF] ^
          g_crc_tables[1][(hi >> 16) & 0xFF] ^ g_crc_tables[0][hi >> 24];
  }
  for (; i < n; ++i)
    crc = g_crc_tables[0][(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

}  // extern "C"
