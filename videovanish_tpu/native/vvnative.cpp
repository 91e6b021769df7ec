// vvnative: host-side native runtime for videovanish_tpu.
//
// The reference leans on OpenCV/scipy C paths for its host image ops
// (distanceTransform/dilation/composite, diffuerase.py:26-31, 70-112)
// and has no decode/compute overlap at all. This library provides:
//   - exact two-pass 5x5 chamfer distance (OpenCV DIST_L2/5 weights)
//   - cross-shaped binary dilation (scipy default structuring element)
//   - fused feathered composite (the full diffuerase.py:75-112 math)
//   - a blocking frame ring buffer so a decode thread can run ahead of
//     the TPU compute loop (keeps codec I/O off the critical path,
//     SURVEY.md §7 hard-part #6)
// Exposed as a C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC vvnative.cpp -o libvvnative.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// chamfer distance: OpenCV DIST_L2 maskSize=5 weights (a=1, b=1.4, c=2.1969)
// two-pass over the image; dist[i] = chamfer distance from nonzero pixels
// of `mask` to the nearest zero pixel (0 on zero pixels).
// ---------------------------------------------------------------------------
void vv_chamfer_distance(float* dist, const uint8_t* mask, int h, int w) {
  const float INF = 1e9f, A = 1.0f, B = 1.4f, C = 2.1969f;
  for (int i = 0; i < h * w; ++i) dist[i] = mask[i] ? INF : 0.0f;

  auto at = [&](int y, int x) -> float& { return dist[y * w + x]; };
  auto relax = [&](int y, int x, int dy, int dx, float wgt) {
    int yy = y + dy, xx = x + dx;
    if (yy < 0 || yy >= h || xx < 0 || xx >= w) return;
    float cand = dist[yy * w + xx] + wgt;
    if (cand < dist[y * w + x]) dist[y * w + x] = cand;
  };

  // forward pass
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      if (at(y, x) == 0.0f) continue;
      relax(y, x, -1, 0, A); relax(y, x, 0, -1, A);
      relax(y, x, -1, -1, B); relax(y, x, -1, 1, B);
      relax(y, x, -2, -1, C); relax(y, x, -2, 1, C);
      relax(y, x, -1, -2, C); relax(y, x, -1, 2, C);
    }
  // backward pass
  for (int y = h - 1; y >= 0; --y)
    for (int x = w - 1; x >= 0; --x) {
      if (at(y, x) == 0.0f) continue;
      relax(y, x, 1, 0, A); relax(y, x, 0, 1, A);
      relax(y, x, 1, 1, B); relax(y, x, 1, -1, B);
      relax(y, x, 2, 1, C); relax(y, x, 2, -1, C);
      relax(y, x, 1, 2, C); relax(y, x, 1, -2, C);
    }
}

// ---------------------------------------------------------------------------
// cross-shaped binary dilation, `iters` iterations (scipy default struct)
// ---------------------------------------------------------------------------
void vv_binary_dilate(uint8_t* out, const uint8_t* in, int h, int w,
                      int iters) {
  std::vector<uint8_t> a(in, in + h * w), b(h * w);
  for (int i = 0; i < h * w; ++i) a[i] = a[i] ? 1 : 0;
  for (int it = 0; it < iters; ++it) {
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        uint8_t v = a[y * w + x];
        if (!v) {
          if (y > 0) v |= a[(y - 1) * w + x];
          if (!v && y < h - 1) v |= a[(y + 1) * w + x];
          if (!v && x > 0) v |= a[y * w + x - 1];
          if (!v && x < w - 1) v |= a[y * w + x + 1];
        }
        b[y * w + x] = v;
      }
    std::swap(a, b);
  }
  std::memcpy(out, a.data(), h * w);
}

// ---------------------------------------------------------------------------
// fused feathered composite (diffuerase.py:75-112 semantics):
//   alpha = clip(0.5 + (d_in - d_out) / (2*feather), 0, 1)  (feather > 0)
//   out   = clip(rint(alpha*inpainted + (1-alpha)*original), 0, 255)
// inpainted/original/out: HxWx3 uint8 (RGB); mask: HxW uint8 (nonzero=hole)
// ---------------------------------------------------------------------------
void vv_feather_composite(uint8_t* out, const uint8_t* inpainted,
                          const uint8_t* original, const uint8_t* mask,
                          int h, int w, float feather_px) {
  std::vector<float> d_in(h * w), d_out(h * w);
  std::vector<uint8_t> inv(h * w);
  for (int i = 0; i < h * w; ++i) inv[i] = mask[i] ? 0 : 1;
  if (feather_px > 0) {
    vv_chamfer_distance(d_in.data(), mask, h, w);
    vv_chamfer_distance(d_out.data(), inv.data(), h, w);
  }
  for (int i = 0; i < h * w; ++i) {
    float alpha;
    if (feather_px > 0) {
      alpha = 0.5f + (d_in[i] - d_out[i]) / (2.0f * feather_px);
      alpha = std::min(1.0f, std::max(0.0f, alpha));
    } else {
      alpha = mask[i] ? 1.0f : 0.0f;
    }
    for (int c = 0; c < 3; ++c) {
      float v = alpha * inpainted[3 * i + c] +
                (1.0f - alpha) * original[3 * i + c];
      v = std::nearbyintf(v);
      out[3 * i + c] = (uint8_t)std::min(255.0f, std::max(0.0f, v));
    }
  }
}

// ---------------------------------------------------------------------------
// blocking frame ring buffer (bounded queue): decode thread pushes,
// compute loop pops. Capacity bounds host memory for 1000+-frame runs.
// ---------------------------------------------------------------------------
struct VVRing {
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<std::vector<uint8_t>> q;
  size_t capacity;
  size_t frame_bytes;
  std::atomic<bool> closed{false};
};

void* vv_ring_create(int capacity, long frame_bytes) {
  auto* r = new VVRing();
  r->capacity = (size_t)capacity;
  r->frame_bytes = (size_t)frame_bytes;
  return r;
}

// returns 1 on success, 0 if the ring was closed
int vv_ring_push(void* ring, const uint8_t* data) {
  auto* r = (VVRing*)ring;
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_push.wait(lk, [&] { return r->q.size() < r->capacity || r->closed; });
  if (r->closed) return 0;
  r->q.emplace_back(data, data + r->frame_bytes);
  r->cv_pop.notify_one();
  return 1;
}

// returns 1 on success, 0 if closed AND drained
int vv_ring_pop(void* ring, uint8_t* out) {
  auto* r = (VVRing*)ring;
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_pop.wait(lk, [&] { return !r->q.empty() || r->closed; });
  if (r->q.empty()) return 0;
  std::memcpy(out, r->q.front().data(), r->frame_bytes);
  r->q.pop_front();
  r->cv_push.notify_one();
  return 1;
}

int vv_ring_size(void* ring) {
  auto* r = (VVRing*)ring;
  std::lock_guard<std::mutex> lk(r->mu);
  return (int)r->q.size();
}

void vv_ring_close(void* ring) {
  auto* r = (VVRing*)ring;
  {
    std::lock_guard<std::mutex> lk(r->mu);
    r->closed = true;
  }
  r->cv_push.notify_all();
  r->cv_pop.notify_all();
}

void vv_ring_destroy(void* ring) { delete (VVRing*)ring; }

}  // extern "C"
