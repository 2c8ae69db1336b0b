// Native threaded dataset loader for super_primitive_tpu.
//
// The reference's data path is synchronous Python/OpenCV reads on the
// critical loop (data/tum.py:94-95 inside Odometery.run). This library
// provides the TPU-native runtime equivalent: a C++ thread-pool prefetcher
// that decodes PNG (8-bit gray/RGB/RGBA and 16-bit gray depth, libpng) and
// JPEG (libjpeg) ahead of the consumer, exposed through a plain C ABI for
// ctypes (no pybind11 dependency).
//
// Build: g++ -O2 -shared -fPIC loader.cpp -lpng -ljpeg -lz -lpthread
//
// Semantics:
//   handle = sp_loader_open(paths, n, num_threads, lookahead)
//   sp_loader_get(handle, idx, out, cap, &h, &w, &c, &bpc)
//     - blocks until image idx is decoded; copies into out (row-major,
//       channels interleaved, native endian for 16-bit); returns 0 on
//       success, required byte count if cap too small, -1 on decode error.
//     - a capacity miss KEEPS the decoded image cached: retrying with a
//       buffer of the returned size copies without re-decoding.
//     - getting idx schedules prefetch of [idx+1, idx+lookahead].
//   sp_loader_close(handle)
//
// Concurrency contract: each index has a SINGLE consumer. A successful get
// consumes the cached image; two threads blocking on the same index would
// leave the loser waiting for a re-decode it never scheduled. The Python
// wrapper (native_loader.py) calls from one consumer thread, honoring this.

#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <set>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int height = 0, width = 0, channels = 0, bytes_per_channel = 1;
  std::vector<uint8_t> data;
  bool ok = false;
};

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; i++) {
    char a = s[s.size() - n + i];
    char b = suf[i];
    if (tolower(a) != tolower(b)) return false;
  }
  return true;
}

Image decode_png(const std::string& path) {
  Image img;
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return img;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return img;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(fp);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return img;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // little-endian native
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  int bpc = png_get_bit_depth(png, info) / 8;
  size_t rowbytes = png_get_rowbytes(png, info);

  img.height = (int)h;
  img.width = (int)w;
  img.channels = channels;
  img.bytes_per_channel = bpc;
  img.data.resize(rowbytes * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 i = 0; i < h; i++) rows[i] = img.data.data() + i * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  img.ok = true;
  return img;
}

Image decode_jpeg(const std::string& path) {
  Image img;
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return img;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return img;
  }
  jpeg_start_decompress(&cinfo);
  img.height = cinfo.output_height;
  img.width = cinfo.output_width;
  img.channels = cinfo.output_components;
  img.bytes_per_channel = 1;
  size_t row = (size_t)img.width * img.channels;
  img.data.resize(row * img.height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* ptr = img.data.data() + cinfo.output_scanline * row;
    jpeg_read_scanlines(&cinfo, &ptr, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  img.ok = true;
  return img;
}

// Plumb-bob (OpenCV) forward distortion -> undistort remap tables, the same
// math as cv2.initUndistortRectifyMap with newK == K (used by the
// reference's fr1 variant via cv2.undistort, data/tum_undistort.py:64-130).
void undistort_maps(const double* K, const double* dist, int h, int w,
                    float* map_x, float* map_y) {
  const double fx = K[0], cx = K[2], fy = K[4], cy = K[5];
  const double k1 = dist[0], k2 = dist[1], p1 = dist[2], p2 = dist[3],
               k3 = dist[4];
  for (int v = 0; v < h; v++) {
    const double y = (v - cy) / fy;
    for (int u = 0; u < w; u++) {
      const double x = (u - cx) / fx;
      const double r2 = x * x + y * y;
      const double rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3));
      const double xd = x * rad + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x);
      const double yd = y * rad + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y;
      map_x[(size_t)v * w + u] = (float)(xd * fx + cx);
      map_y[(size_t)v * w + u] = (float)(yd * fy + cy);
    }
  }
}

// Bilinear remap with constant-zero border (cv2.remap/undistort default).
void remap_u8(const uint8_t* src, int h, int w, int c, const float* map_x,
              const float* map_y, uint8_t* dst) {
  for (int v = 0; v < h; v++) {
    for (int u = 0; u < w; u++) {
      const float sx = map_x[(size_t)v * w + u];
      const float sy = map_y[(size_t)v * w + u];
      const int x0 = (int)std::floor(sx);
      const int y0 = (int)std::floor(sy);
      const float ax = sx - x0, ay = sy - y0;
      const float w00 = (1 - ax) * (1 - ay), w01 = ax * (1 - ay);
      const float w10 = (1 - ax) * ay, w11 = ax * ay;
      for (int ch = 0; ch < c; ch++) {
        float acc = 0.f;
        const bool in00 = x0 >= 0 && x0 < w && y0 >= 0 && y0 < h;
        const bool in01 = x0 + 1 >= 0 && x0 + 1 < w && y0 >= 0 && y0 < h;
        const bool in10 = x0 >= 0 && x0 < w && y0 + 1 >= 0 && y0 + 1 < h;
        const bool in11 = x0 + 1 >= 0 && x0 + 1 < w && y0 + 1 >= 0 && y0 + 1 < h;
        if (in00) acc += w00 * src[((size_t)y0 * w + x0) * c + ch];
        if (in01) acc += w01 * src[((size_t)y0 * w + x0 + 1) * c + ch];
        if (in10) acc += w10 * src[((size_t)(y0 + 1) * w + x0) * c + ch];
        if (in11) acc += w11 * src[((size_t)(y0 + 1) * w + x0 + 1) * c + ch];
        dst[((size_t)v * w + u) * c + ch] = (uint8_t)(acc + 0.5f);
      }
    }
  }
}

Image decode_any(const std::string& path) {
  if (has_suffix(path, ".png")) return decode_png(path);
  if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg"))
    return decode_jpeg(path);
  // try png then jpeg
  Image img = decode_png(path);
  if (!img.ok) img = decode_jpeg(path);
  return img;
}

class Loader {
 public:
  Loader(std::vector<std::string> paths, int num_threads, int lookahead)
      : paths_(std::move(paths)), lookahead_(std::max(1, lookahead)) {
    num_threads = std::max(1, num_threads);
    for (int i = 0; i < num_threads; i++)
      workers_.emplace_back([this] { work(); });
    schedule_range(0, lookahead_);
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocks until idx is decoded, then copies it into out under the lock.
  // Returns 0 on success (consumes the cache entry), the required byte
  // count when capacity is too small (entry stays cached for a retry), or
  // -1 on decode failure. Single consumer per index (see file header).
  long get_into(int idx, unsigned char* out, long capacity, int* height,
                int* width, int* channels, int* bytes_per_channel) {
    {
      // mark as awaited BEFORE scheduling so the eviction loop never drops it
      std::lock_guard<std::mutex> lk(mu_);
      waiting_.insert(idx);
    }
    schedule_range(idx, idx + lookahead_);
    std::unique_lock<std::mutex> lk(mu_);
    cv_done_.wait(lk, [&] { return done_.count(idx) > 0; });
    Image& img = done_[idx];
    if (!img.ok) {
      done_.erase(idx);
      scheduled_.erase(idx);
      waiting_.erase(idx);
      return -1;
    }
    *height = img.height;
    *width = img.width;
    *channels = img.channels;
    *bytes_per_channel = img.bytes_per_channel;
    long need = (long)img.data.size();
    if (need > capacity) return need;  // stays cached (and awaited) for retry
    memcpy(out, img.data.data(), need);
    done_.erase(idx);
    // allow future re-requests of this index to reschedule the decode
    scheduled_.erase(idx);
    waiting_.erase(idx);
    return 0;
  }

 private:
  void schedule_range(int lo, int hi) {
    std::lock_guard<std::mutex> lk(mu_);
    for (int i = lo; i <= hi && i < (int)paths_.size(); i++) {
      if (i < 0) continue;
      if (done_.count(i) || scheduled_.count(i)) continue;
      scheduled_.insert(i);
      queue_.push_back(i);
    }
    cv_work_.notify_all();
  }

  void work() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [&] { return stop_ || !queue_.empty(); });
        if (stop_) return;
        idx = queue_.front();
        queue_.pop_front();
      }
      // Decode + optional undistort on this thread (prefetch hides the
      // cost).  The generation check and the store happen under ONE mu_
      // hold — a set_undistort racing anywhere between the map read and
      // the store forces a re-decode with the fresh maps instead of
      // caching a stale-remapped image.
      for (;;) {
        Image img = decode_any(paths_[idx]);
        int gen_used = maybe_undistort(img);
        {
          std::lock_guard<std::mutex> lk(mu_);
          if (gen_used != undistort_gen_locked()) continue;
          done_[idx] = std::move(img);
          // bound the cache: drop entries nobody is waiting on (and
          // un-mark them as scheduled so later re-requests re-decode);
          // never evict an awaited index — that would strand its blocked
          // get() forever
          size_t cap = (size_t)(4 * lookahead_ + 8);
          for (auto it = done_.begin();
               it != done_.end() && done_.size() > cap;) {
            if (waiting_.count(it->first)) {
              ++it;
              continue;
            }
            scheduled_.erase(it->first);
            it = done_.erase(it);
          }
        }
        break;
      }
      cv_done_.notify_all();
    }
  }

  // Optional in-pipeline undistortion (8-bit images of matching size only —
  // 16-bit depth passes through, matching the reference which undistorts
  // the colour stream but not depth).  Map state lives under mu_; returns
  // the map generation used so the store path (also under mu_) can detect a
  // set_undistort that raced anywhere between the map read and the store.
  int maybe_undistort(Image& img) {
    std::vector<float> mx, my;
    int uh, uw, gen;
    {
      std::lock_guard<std::mutex> lk(mu_);
      gen = ugen_;
      if (umap_x_.empty()) return gen;
      if (!img.ok || img.bytes_per_channel != 1 || img.height != u_h_ ||
          img.width != u_w_)
        return gen;
      mx = umap_x_;  // copy so remap runs outside the lock
      my = umap_y_;
      uh = u_h_;
      uw = u_w_;
    }
    std::vector<uint8_t> out(img.data.size());
    remap_u8(img.data.data(), uh, uw, img.channels, mx.data(), my.data(),
             out.data());
    img.data = std::move(out);
    return gen;
  }

  // caller must hold mu_
  int undistort_gen_locked() const { return ugen_; }

 public:
  void set_undistort(const float* map_x, const float* map_y, int h, int w) {
    std::lock_guard<std::mutex> lk(mu_);
    umap_x_.assign(map_x, map_x + (size_t)h * w);
    umap_y_.assign(map_y, map_y + (size_t)h * w);
    u_h_ = h;
    u_w_ = w;
    ugen_++;
    // drop images decoded under the previous maps so they re-decode;
    // awaited entries are never evicted (their consumer already raced the
    // map change — documented contract: attach maps before consuming).
    // In-flight decodes are handled by the store-time generation check.
    for (auto it = done_.begin(); it != done_.end();) {
      if (waiting_.count(it->first)) {
        ++it;
        continue;
      }
      scheduled_.erase(it->first);
      it = done_.erase(it);
    }
  }

 private:
  std::vector<float> umap_x_, umap_y_;
  int u_h_ = 0, u_w_ = 0;
  int ugen_ = 0;

  std::vector<std::string> paths_;
  int lookahead_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_work_, cv_done_;
  std::deque<int> queue_;
  std::map<int, Image> done_;
  std::set<int> scheduled_;
  std::set<int> waiting_;
  bool stop_ = false;
};

}  // namespace

extern "C" {

void* sp_loader_open(const char** paths, int n, int num_threads,
                     int lookahead) {
  std::vector<std::string> v(paths, paths + n);
  return new Loader(std::move(v), num_threads, lookahead);
}

long sp_loader_get(void* handle, int idx, unsigned char* out, long capacity,
                   int* height, int* width, int* channels,
                   int* bytes_per_channel) {
  Loader* loader = (Loader*)handle;
  return loader->get_into(idx, out, capacity, height, width, channels,
                          bytes_per_channel);
}

void sp_loader_close(void* handle) { delete (Loader*)handle; }

// Attach undistort remap tables: subsequently decoded 8-bit images of
// (h, w) are remapped on the decode threads before being returned.
void sp_loader_set_undistort(void* handle, const float* map_x,
                             const float* map_y, int h, int w) {
  ((Loader*)handle)->set_undistort(map_x, map_y, h, w);
}

// Standalone map construction / remap (also used by tests).
void sp_undistort_maps(const double* K, const double* dist, int h, int w,
                       float* map_x, float* map_y) {
  undistort_maps(K, dist, h, w, map_x, map_y);
}

void sp_remap_u8(const unsigned char* src, int h, int w, int c,
                 const float* map_x, const float* map_y, unsigned char* dst) {
  remap_u8(src, h, w, c, map_x, map_y, dst);
}

}  // extern "C"
