// dfio — native data-loading runtime for dynamicfusion_tpu.
//
// Replaces the reference's input path (OpenCV imread of 16-bit depth PNGs in
// apps/demo.cpp:80-88 and the OpenNI capture in kfusion/src/capture.cpp)
// with a dependency-light C++ library exposed through a C ABI for ctypes:
//
//   - 16-bit (and 8-bit) grayscale PNG decode via libpng,
//   - a multi-threaded prefetching sequence loader: a worker pool decodes
//     frames ahead of the consumer into a bounded ring buffer, so PNG
//     decode overlaps TPU compute (the reference decodes synchronously on
//     the frame loop thread).
//
// Build: see native/Makefile (produces libdfio.so).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  uint32_t width = 0;
  uint32_t height = 0;
  uint32_t channels = 0;
  uint32_t bit_depth = 0;
  std::vector<uint8_t> data;  // row-major, native endianness for 16-bit
  bool ok = false;
  std::string error;
};

Image decode_png(const char* path) {
  Image img;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    img.error = "cannot open file";
    return img;
  }
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    img.error = "not a png";
    return img;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    img.error = "libpng error";
    return img;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  img.width = png_get_image_width(png, info);
  img.height = png_get_image_height(png, info);
  img.bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && img.bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (img.bit_depth == 16) png_set_swap(png);  // big-endian PNG -> host LE
  png_read_update_info(png, info);

  img.channels = png_get_channels(png, info);
  img.bit_depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  img.data.resize(rowbytes * img.height);

  std::vector<png_bytep> rows(img.height);
  for (uint32_t y = 0; y < img.height; ++y) rows[y] = img.data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  img.ok = true;
  return img;
}

// ---------------- prefetching sequence loader ----------------

struct Loader {
  std::vector<std::string> paths;
  size_t prefetch_depth;
  size_t next_submit = 0;   // next frame index to hand to a worker
  size_t next_consume = 0;  // next frame index the consumer expects
  std::map<size_t, Image> ready;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  Loader(std::vector<std::string> p, size_t threads, size_t depth)
      : paths(std::move(p)), prefetch_depth(depth) {
    for (size_t i = 0; i < threads; ++i)
      workers.emplace_back([this] { work(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> g(mu);
      stop = true;
    }
    cv_space.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers) t.join();
  }

  void work() {
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> g(mu);
        cv_space.wait(g, [this] {
          return stop || (next_submit < paths.size() &&
                          next_submit < next_consume + prefetch_depth);
        });
        if (stop || next_submit >= paths.size()) {
          if (stop) return;
          // all submitted; idle until stopped
          cv_space.wait(g, [this] { return stop.load(); });
          return;
        }
        idx = next_submit++;
      }
      Image img = decode_png(paths[idx].c_str());
      {
        std::lock_guard<std::mutex> g(mu);
        ready.emplace(idx, std::move(img));
      }
      cv_ready.notify_all();
    }
  }

  // blocks until frame `idx` (must be consumed in order) is decoded;
  // moves it out.
  bool get(size_t idx, Image* out) {
    std::unique_lock<std::mutex> g(mu);
    if (idx >= paths.size()) return false;
    cv_ready.wait(g, [this, idx] { return stop || ready.count(idx) > 0; });
    if (stop && !ready.count(idx)) return false;
    *out = std::move(ready[idx]);
    ready.erase(idx);
    next_consume = idx + 1;
    cv_space.notify_all();
    return true;
  }
};

std::mutex g_handles_mu;
std::map<int64_t, std::unique_ptr<Loader>> g_loaders;
std::map<int64_t, Image> g_images;
std::atomic<int64_t> g_next_handle{1};

}  // namespace

extern "C" {

// ---- single-image API ----
// Decodes `path`; returns a handle (>0) or 0 on failure. Query dims, then
// copy out and free.
int64_t dfio_decode(const char* path) {
  Image img = decode_png(path);
  if (!img.ok) return 0;
  int64_t h = g_next_handle++;
  std::lock_guard<std::mutex> g(g_handles_mu);
  g_images.emplace(h, std::move(img));
  return h;
}

int dfio_image_info(int64_t handle, uint32_t* w, uint32_t* hgt, uint32_t* ch,
                    uint32_t* bits) {
  std::lock_guard<std::mutex> g(g_handles_mu);
  auto it = g_images.find(handle);
  if (it == g_images.end()) return -1;
  *w = it->second.width;
  *hgt = it->second.height;
  *ch = it->second.channels;
  *bits = it->second.bit_depth;
  return 0;
}

int dfio_image_copy(int64_t handle, void* dst, size_t dst_bytes) {
  std::lock_guard<std::mutex> g(g_handles_mu);
  auto it = g_images.find(handle);
  if (it == g_images.end()) return -1;
  if (dst_bytes < it->second.data.size()) return -2;
  std::memcpy(dst, it->second.data.data(), it->second.data.size());
  return 0;
}

void dfio_image_free(int64_t handle) {
  std::lock_guard<std::mutex> g(g_handles_mu);
  g_images.erase(handle);
}

// ---- prefetching sequence loader API ----
// paths: '\n'-separated list. Returns loader handle (>0).
int64_t dfio_loader_open(const char* paths_joined, int threads, int prefetch_depth) {
  std::vector<std::string> paths;
  const char* p = paths_joined;
  while (*p) {
    const char* e = std::strchr(p, '\n');
    if (!e) e = p + std::strlen(p);
    if (e > p) paths.emplace_back(p, e - p);
    p = (*e) ? e + 1 : e;
  }
  if (paths.empty()) return 0;
  auto loader = std::make_unique<Loader>(
      std::move(paths), std::max(1, threads), std::max(1, prefetch_depth));
  int64_t h = g_next_handle++;
  std::lock_guard<std::mutex> g(g_handles_mu);
  g_loaders.emplace(h, std::move(loader));
  return h;
}

// Blocks for frame idx; on success returns an image handle usable with the
// single-image API (info/copy/free). Returns 0 at end/error.
int64_t dfio_loader_get(int64_t loader_handle, size_t idx) {
  Loader* l;
  {
    std::lock_guard<std::mutex> g(g_handles_mu);
    auto it = g_loaders.find(loader_handle);
    if (it == g_loaders.end()) return 0;
    l = it->second.get();
  }
  Image img;
  if (!l->get(idx, &img) || !img.ok) return 0;
  int64_t h = g_next_handle++;
  std::lock_guard<std::mutex> g(g_handles_mu);
  g_images.emplace(h, std::move(img));
  return h;
}

void dfio_loader_close(int64_t handle) {
  std::unique_ptr<Loader> doomed;
  {
    std::lock_guard<std::mutex> g(g_handles_mu);
    auto it = g_loaders.find(handle);
    if (it == g_loaders.end()) return;
    doomed = std::move(it->second);
    g_loaders.erase(it);
  }
  // destructor joins workers outside the global lock
}

}  // extern "C"
