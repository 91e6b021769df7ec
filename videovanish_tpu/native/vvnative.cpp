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
// cross-shaped binary dilation, `iters` iterations (scipy default struct).
// Computed as an exact two-pass L1 distance transform + threshold:
// r iterations of the 4-neighbour dilation mark exactly the pixels at
// 4-connected grid distance <= r from a seed, and in a rectangle that
// distance IS the L1 metric (a monotone staircase path never needs to
// leave the image). Two O(hw) passes replace the O(hw*iters) loop.
// ---------------------------------------------------------------------------
void vv_binary_dilate(uint8_t* out, const uint8_t* in, int h, int w,
                      int iters) {
  const int INF = 1 << 29;
  std::vector<int> d(h * w);
  for (int i = 0; i < h * w; ++i) d[i] = in[i] ? 0 : INF;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int& v = d[y * w + x];
      if (y > 0) v = std::min(v, d[(y - 1) * w + x] + 1);
      if (x > 0) v = std::min(v, d[y * w + x - 1] + 1);
    }
  for (int y = h - 1; y >= 0; --y)
    for (int x = w - 1; x >= 0; --x) {
      int& v = d[y * w + x];
      if (y < h - 1) v = std::min(v, d[(y + 1) * w + x] + 1);
      if (x < w - 1) v = std::min(v, d[y * w + x + 1] + 1);
    }
  for (int i = 0; i < h * w; ++i) out[i] = d[i] <= iters ? 1 : 0;
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
  // alpha is exactly 0 outside the mask bbox grown by the feather
  // width (chamfer distance >= Chebyshev distance, so d_out >= feather
  // there), so the chamfers + blend only need to run on that window;
  // everything else is the original. Window chamfers equal the global
  // ones inside it: both endpoints of a minimizing chamfer path are in
  // the (convex) window, so the path is too.
  int y0 = h, y1 = -1, x0 = w, x1 = -1;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = mask + y * w;
    for (int x = 0; x < w; ++x)
      if (row[x]) {
        if (y < y0) y0 = y;
        y1 = y;
        if (x < x0) x0 = x;
        if (x > x1) x1 = x;
      }
  }
  if (y1 < 0) {  // empty mask: alpha = 0 everywhere
    std::memcpy(out, original, (size_t)3 * h * w);
    return;
  }
  const int m = (int)std::ceil(feather_px) + 3;
  y0 = std::max(0, y0 - m); y1 = std::min(h - 1, y1 + m);
  x0 = std::max(0, x0 - m); x1 = std::min(w - 1, x1 + m);
  const int wh = y1 - y0 + 1, ww = x1 - x0 + 1;

  std::vector<float> d_in(wh * ww), d_out(wh * ww);
  std::vector<uint8_t> sub(wh * ww), inv(wh * ww);
  for (int y = 0; y < wh; ++y)
    for (int x = 0; x < ww; ++x) {
      uint8_t v = mask[(y0 + y) * w + (x0 + x)];
      sub[y * ww + x] = v;
      inv[y * ww + x] = v ? 0 : 1;
    }
  if (feather_px > 0) {
    vv_chamfer_distance(d_in.data(), sub.data(), wh, ww);
    vv_chamfer_distance(d_out.data(), inv.data(), wh, ww);
  }
  std::memcpy(out, original, (size_t)3 * h * w);
  for (int y = 0; y < wh; ++y)
    for (int x = 0; x < ww; ++x) {
      float alpha;
      const int i = y * ww + x;
      if (feather_px > 0) {
        alpha = 0.5f + (d_in[i] - d_out[i]) / (2.0f * feather_px);
        alpha = std::min(1.0f, std::max(0.0f, alpha));
      } else {
        alpha = sub[i] ? 1.0f : 0.0f;
      }
      const size_t g = (size_t)3 * ((y0 + y) * w + (x0 + x));
      for (int c = 0; c < 3; ++c) {
        float v = alpha * inpainted[g + c] +
                  (1.0f - alpha) * original[g + c];
        v = std::nearbyintf(v);
        out[g + c] = (uint8_t)std::min(255.0f, std::max(0.0f, v));
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
