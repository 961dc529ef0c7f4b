// Native dataset-loading runtime: PNG decode + TUM association + threaded
// prefetch, exposed through a C ABI consumed via ctypes
// (opencv_contrib_tpu/utils/native.py).
//
// This is the framework's native IO layer — the role the reference fills
// with main-repo imgcodecs + the datasets module's C++ readers
// (reference: datasets/src/slam_tumindoor.cpp, slam_kitti.cpp): decode and
// staging stay off the Python hot path so device feeding is not GIL-bound.
//
// Build: make -C native (produces libocvtpu_io.so).

#include <png.h>
#include <cstdio>
#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;
  int bit_depth = 0;
  std::vector<float> data;  // HWC float32; 8-bit -> /255, 16-bit -> /5000 (TUM depth) unless raw
};

bool decode_png(const std::string& path, Image* out, float depth_scale) {
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const int width = png_get_image_width(png, info);
  const int height = png_get_image_height(png, info);
  const int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // PNG is big-endian; we want host LE
  png_read_update_info(png, info);

  const int channels = png_get_channels(png, info);
  const size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<png_byte> buf(rowbytes * height);
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y) rows[y] = buf.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  out->width = width;
  out->height = height;
  out->channels = channels;
  out->bit_depth = bit_depth;
  out->data.resize(static_cast<size_t>(width) * height * channels);
  const size_t n = out->data.size();
  if (bit_depth == 16) {
    const uint16_t* src = reinterpret_cast<const uint16_t*>(buf.data());
    const float s = depth_scale > 0 ? 1.0f / depth_scale : 1.0f / 65535.0f;
    for (size_t i = 0; i < n; ++i) out->data[i] = src[i] * s;
  } else {
    const uint8_t* src = buf.data();
    for (size_t i = 0; i < n; ++i) out->data[i] = src[i] * (1.0f / 255.0f);
  }
  return true;
}

bool decode_jpeg(const std::string& path, Image* out) {
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }
  jpeg_start_decompress(&cinfo);
  const int width = cinfo.output_width;
  const int height = cinfo.output_height;
  const int channels = cinfo.output_components;
  out->width = width;
  out->height = height;
  out->channels = channels;
  out->bit_depth = 8;
  out->data.resize(static_cast<size_t>(width) * height * channels);
  std::vector<uint8_t> row(static_cast<size_t>(width) * channels);
  uint8_t* rowp = row.data();
  size_t off = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    for (size_t i = 0; i < row.size(); ++i) out->data[off + i] = row[i] * (1.0f / 255.0f);
    off += row.size();
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return true;
}

bool decode_image(const std::string& path, Image* out, float depth_scale) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot);
  for (auto& ch : ext) ch = static_cast<char>(std::tolower(ch));
  if (ext == ".jpg" || ext == ".jpeg") return decode_jpeg(path, out);
  return decode_png(path, out, depth_scale);
}

struct Pair {
  double t_rgb = 0, t_depth = 0;
  std::string rgb_path, depth_path;
};

std::vector<std::pair<double, std::string>> read_list(const std::string& path) {
  std::vector<std::pair<double, std::string>> out;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    double t;
    std::string p;
    if (ss >> t >> p) out.emplace_back(t, p);
  }
  return out;
}

// Greedy nearest-timestamp association (the TUM associate.py contract;
// mirrors utils/datasets.py::associate).
std::vector<Pair> associate(const std::vector<std::pair<double, std::string>>& rgb,
                            const std::vector<std::pair<double, std::string>>& depth,
                            double max_dt) {
  std::vector<Pair> pairs;
  std::vector<bool> used(depth.size(), false);
  for (const auto& [ta, pa] : rgb) {
    int best = -1;
    double best_dt = max_dt;
    for (size_t j = 0; j < depth.size(); ++j) {
      if (used[j]) continue;
      double dt = std::abs(depth[j].first - ta);
      if (dt < best_dt) {
        best_dt = dt;
        best = static_cast<int>(j);
      }
    }
    if (best >= 0) {
      used[best] = true;
      pairs.push_back({ta, depth[best].first, pa, depth[best].second});
    }
  }
  return pairs;
}

struct Frame {
  double t_rgb = 0, t_depth = 0;
  Image rgb, depth;
  bool ok = false;
};

// Threaded prefetching loader: worker threads decode ahead of the consumer
// (the role of the reference's stream/double-buffer IO patterns, P4).
struct Loader {
  std::vector<Pair> pairs;
  std::string root;
  float depth_scale;
  size_t next_submit = 0;
  size_t next_consume = 0;
  size_t capacity;
  std::deque<std::pair<size_t, std::shared_ptr<Frame>>> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::atomic<size_t> submit_idx{0};

  Loader(const std::string& r, std::vector<Pair> p, float scale, int n_threads, size_t cap)
      : pairs(std::move(p)), root(r), depth_scale(scale), capacity(cap) {
    for (int i = 0; i < n_threads; ++i) workers.emplace_back([this] { work(); });
  }

  ~Loader() {
    stop = true;
    cv_space.notify_all();
    cv_ready.notify_all();
    for (auto& w : workers) w.join();
  }

  void work() {
    while (!stop) {
      size_t idx = submit_idx.fetch_add(1);
      if (idx >= pairs.size()) break;
      auto frame = std::make_shared<Frame>();
      const Pair& p = pairs[idx];
      frame->t_rgb = p.t_rgb;
      frame->t_depth = p.t_depth;
      bool ok1 = decode_png(root + "/" + p.rgb_path, &frame->rgb, -1.0f);
      bool ok2 = decode_png(root + "/" + p.depth_path, &frame->depth, depth_scale);
      frame->ok = ok1 && ok2;
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [this] { return ready.size() < capacity || stop; });
      if (stop) break;
      ready.emplace_back(idx, std::move(frame));
      cv_ready.notify_all();
    }
  }

  std::shared_ptr<Frame> next() {
    std::unique_lock<std::mutex> lk(mu);
    for (;;) {
      for (auto it = ready.begin(); it != ready.end(); ++it) {
        if (it->first == next_consume) {
          auto f = it->second;
          ready.erase(it);
          ++next_consume;
          cv_space.notify_all();
          return f;
        }
      }
      if (next_consume >= pairs.size()) return nullptr;
      cv_ready.wait(lk);
      if (stop) return nullptr;
    }
  }
};

}  // namespace

extern "C" {

// ---- single-image decode ----
// Returns 0 on failure; fills dims. Call ocvtpu_read_image to copy pixels.
struct DecodedHandle {
  Image img;
};

// Decodes PNG (8/16-bit, depth_scale applies to 16-bit) or JPEG by
// extension — the native image-feed entry point for both the TUM depth
// stream and SfM photo sets (Sceaux-class .jpg inputs).
void* ocvtpu_decode_png(const char* path, float depth_scale, int* w, int* h, int* c, int* bits) {
  auto* handle = new DecodedHandle();
  if (!decode_image(path, &handle->img, depth_scale)) {
    delete handle;
    return nullptr;
  }
  *w = handle->img.width;
  *h = handle->img.height;
  *c = handle->img.channels;
  *bits = handle->img.bit_depth;
  return handle;
}

void ocvtpu_copy_pixels(void* handle, float* out) {
  auto* d = static_cast<DecodedHandle*>(handle);
  std::memcpy(out, d->img.data.data(), d->img.data.size() * sizeof(float));
}

void ocvtpu_free_decoded(void* handle) { delete static_cast<DecodedHandle*>(handle); }

// ---- TUM sequence loader ----
void* ocvtpu_tum_open(const char* root, float depth_scale, double max_dt, int n_threads, int prefetch) {
  std::string r(root);
  auto rgb = read_list(r + "/rgb.txt");
  auto depth = read_list(r + "/depth.txt");
  auto pairs = associate(rgb, depth, max_dt);
  if (pairs.empty()) return nullptr;
  return new Loader(r, std::move(pairs), depth_scale, n_threads, static_cast<size_t>(prefetch));
}

int ocvtpu_tum_size(void* loader) { return static_cast<int>(static_cast<Loader*>(loader)->pairs.size()); }

// Fetch next frame. Returns 1 on success, 0 at end/failure. Buffers must be
// sized rgb: h*w*3 floats, depth: h*w floats (dims from ocvtpu_tum_dims).
int ocvtpu_tum_next(void* loader, float* rgb_out, float* depth_out, double* t_rgb, double* t_depth) {
  auto f = static_cast<Loader*>(loader)->next();
  if (!f || !f->ok) return 0;
  std::memcpy(rgb_out, f->rgb.data.data(), f->rgb.data.size() * sizeof(float));
  std::memcpy(depth_out, f->depth.data.data(), f->depth.data.size() * sizeof(float));
  *t_rgb = f->t_rgb;
  *t_depth = f->t_depth;
  return 1;
}

// Peek dims of the first frame (decodes it synchronously once).
int ocvtpu_tum_dims(void* loader, int* w, int* h) {
  auto* l = static_cast<Loader*>(loader);
  Image img;
  if (!decode_png(l->root + "/" + l->pairs[0].rgb_path, &img, -1.0f)) return 0;
  *w = img.width;
  *h = img.height;
  return 1;
}

void ocvtpu_tum_close(void* loader) { delete static_cast<Loader*>(loader); }

}  // extern "C"
