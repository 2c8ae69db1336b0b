// Native batched 2D connected-component labeling (4-connectivity).
//
// TPU-native replacement for the reference's cupyx.scipy.ndimage.label call
// (frontend/segment/post_processer.py:39-64): the depth-discontinuity split
// runs once per keyframe on HOST-resident masks whose output feeds a host
// part loop, so the right place for this op is native host code next to the
// decoder (csrc/loader.cpp), not a device round-trip.  Label semantics match
// ops/connected_components.label_components exactly: background -1,
// foreground pixels carry the MINIMUM linear index of their component
// (union-by-min + path compression makes every root the component minimum).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

inline int32_t find_root(int32_t* parent, int32_t i) {
    int32_t r = i;
    while (parent[r] != r) r = parent[r];
    // path compression
    while (parent[i] != r) {
        int32_t n = parent[i];
        parent[i] = r;
        i = n;
    }
    return r;
}

inline void union_min(int32_t* parent, int32_t a, int32_t b) {
    int32_t ra = find_root(parent, a);
    int32_t rb = find_root(parent, b);
    if (ra == rb) return;
    if (ra < rb)
        parent[rb] = ra;
    else
        parent[ra] = rb;
}

void label_one(const uint8_t* mask, int H, int W, int32_t* parent,
               int32_t* out) {
    const int64_t n = (int64_t)H * W;
    for (int64_t i = 0; i < n; ++i) parent[i] = (int32_t)i;
    for (int r = 0; r < H; ++r) {
        const uint8_t* row = mask + (int64_t)r * W;
        int32_t base = r * W;
        for (int c = 0; c < W; ++c) {
            if (!row[c]) continue;
            if (c > 0 && row[c - 1]) union_min(parent, base + c, base + c - 1);
            if (r > 0 && mask[(int64_t)(r - 1) * W + c])
                union_min(parent, base + c, base + c - W);
        }
    }
    for (int64_t i = 0; i < n; ++i)
        out[i] = mask[i] ? find_root(parent, (int32_t)i) : -1;
}

}  // namespace

extern "C" {

// masks: (N, H, W) uint8 (0/1); out: (N, H, W) int32.
void sp_label_components(const uint8_t* masks, int N, int H, int W,
                         int32_t* out, int num_threads) {
    const int64_t hw = (int64_t)H * W;
    if (num_threads < 1) num_threads = 1;
    if (num_threads > N) num_threads = N > 0 ? N : 1;
    std::atomic<int> next(0);
    auto worker = [&]() {
        std::vector<int32_t> parent(hw);
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= N) break;
            label_one(masks + i * hw, H, W, parent.data(), out + i * hw);
        }
    };
    if (num_threads == 1) {
        worker();
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(num_threads);
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
}

namespace {

// Reflect-index helper (numpy "reflect": edge not repeated) for the Scharr
// pad; H>=2 always holds for real images.
inline int refl(int i, int n) {
    if (i < 0) return -i;
    if (i >= n) return 2 * n - 2 - i;
    return i;
}

// One segment of the depth-discontinuity test, mirroring
// frontend/post_process.depth_discontinuity (itself reference
// post_processer.py:13-29) in f32 with the same operation order:
//   depth = exp(logdepth); invalid -> -1
//   pooled = stride-1 kxk max pool, same padding (-inf outside)
//   (gx, gy) = Scharr/32 of pooled with reflect padding
//   out = (sqrt(gx^2+gy^2) > threshold) && valid
void disc_one(const float* logdepth, const uint8_t* valid, int H, int W,
              int filter_size, float threshold, float* depth, float* pooled,
              uint8_t* out) {
    const int64_t n = (int64_t)H * W;
    for (int64_t i = 0; i < n; ++i)
        depth[i] = valid[i] ? expf(logdepth[i]) : -1.0f;
    // separable same-padded max pool (-inf outside == clamped window):
    // horizontal pass into `pooled` (as scratch), vertical pass back over it
    // into `depth` then swap roles — final pooled result lands in `pooled`.
    const int pad = filter_size / 2;
    for (int r = 0; r < H; ++r) {
        const float* src = depth + (int64_t)r * W;
        float* dst = pooled + (int64_t)r * W;
        for (int c = 0; c < W; ++c) {
            const int c0 = c - pad < 0 ? 0 : c - pad;
            const int c1 = c + pad >= W ? W - 1 : c + pad;
            float m = src[c0];
            for (int cc = c0 + 1; cc <= c1; ++cc)
                if (src[cc] > m) m = src[cc];
            dst[c] = m;
        }
    }
    for (int r = 0; r < H; ++r) {
        const int r0 = r - pad < 0 ? 0 : r - pad;
        const int r1 = r + pad >= H ? H - 1 : r + pad;
        float* dst = depth + (int64_t)r * W;
        std::memcpy(dst, pooled + (int64_t)r0 * W, W * sizeof(float));
        for (int rr = r0 + 1; rr <= r1; ++rr) {
            const float* src = pooled + (int64_t)rr * W;
            for (int c = 0; c < W; ++c)
                if (src[c] > dst[c]) dst[c] = src[c];
        }
    }
    std::swap(depth, pooled);  // pooled now holds the pooled depth
    const float inv32 = 1.0f / 32.0f;
    for (int r = 0; r < H; ++r) {
        const float* pm = pooled + (int64_t)refl(r - 1, H) * W;
        const float* pz = pooled + (int64_t)r * W;
        const float* pp = pooled + (int64_t)refl(r + 1, H) * W;
        for (int c = 0; c < W; ++c) {
            const int cm = refl(c - 1, W), cp = refl(c + 1, W);
            const float gx = (-3.0f * pm[cm] + 3.0f * pm[cp]
                              - 10.0f * pz[cm] + 10.0f * pz[cp]
                              - 3.0f * pp[cm] + 3.0f * pp[cp]) * inv32;
            const float gy = (-3.0f * pm[cm] - 10.0f * pm[c] - 3.0f * pm[cp]
                              + 3.0f * pp[cm] + 10.0f * pp[c] + 3.0f * pp[cp])
                             * inv32;
            const int64_t i = (int64_t)r * W + c;
            out[i] = (sqrtf(gx * gx + gy * gy) > threshold) && valid[i];
        }
    }
}

}  // namespace

// logdepth: (N, H, W) float32; valid: (N, H, W) uint8; out: (N, H, W) uint8
// disc flags.
void sp_depth_discontinuity(const float* logdepth, const uint8_t* valid,
                            int N, int H, int W, int filter_size,
                            float threshold, uint8_t* out, int num_threads) {
    const int64_t hw = (int64_t)H * W;
    if (num_threads < 1) num_threads = 1;
    if (num_threads > N) num_threads = N > 0 ? N : 1;
    std::atomic<int> next(0);
    auto worker = [&]() {
        std::vector<float> depth(hw), pooled(hw);
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= N) break;
            disc_one(logdepth + i * hw, valid + i * hw, H, W, filter_size,
                     threshold, depth.data(), pooled.data(), out + i * hw);
        }
    };
    if (num_threads == 1) {
        worker();
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(num_threads);
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
}

}  // extern "C"
