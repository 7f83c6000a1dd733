// Native host runtime: threaded dataset prefetcher with in-house image
// decoding (PNG via zlib inflate + defilter, PGM/PPM), exposed to Python
// through a C ABI (ctypes).
//
// Role in the system: the reference's example mains do synchronous
// cv::imread on the tracking thread (reference Examples/Stereo/
// stereo_kitti.cc main loop) — at 30 fps the decode sits on the critical
// path. Here a worker pool decodes frames ahead of the tracker into a
// bounded ring of slots, so the Python side only memcpy-views ready frames
// and the TPU never waits on disk/decode. This is the native IO layer of
// the runtime (the compute path stays in XLA/Pallas).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC slam_io.cc -lz).

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;
  int bit_depth = 8;           // 8 or 16
  std::vector<uint8_t> data;   // row-major, native endian for 16-bit
  bool ok = false;
};

// ---------------------------------------------------------------------------
// PGM / PPM (P5 / P6, 8- or 16-bit)
// ---------------------------------------------------------------------------

static bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t rd = fread(out->data(), 1, n, f);
  fclose(f);
  return rd == static_cast<size_t>(n);
}

static int pnm_token(const std::vector<uint8_t>& buf, size_t* pos) {
  // skip whitespace + comments, parse an int
  while (*pos < buf.size()) {
    uint8_t c = buf[*pos];
    if (c == '#') {
      while (*pos < buf.size() && buf[*pos] != '\n') ++*pos;
    } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
      ++*pos;
    } else {
      break;
    }
  }
  int v = 0;
  while (*pos < buf.size() && buf[*pos] >= '0' && buf[*pos] <= '9') {
    v = v * 10 + (buf[*pos] - '0');
    ++*pos;
  }
  return v;
}

static Image decode_pnm(const std::vector<uint8_t>& buf) {
  Image img;
  if (buf.size() < 10 || buf[0] != 'P') return img;
  int kind = buf[1] - '0';
  if (kind != 5 && kind != 6) return img;
  size_t pos = 2;
  img.width = pnm_token(buf, &pos);
  img.height = pnm_token(buf, &pos);
  int maxv = pnm_token(buf, &pos);
  ++pos;  // single whitespace after maxval
  img.channels = (kind == 6) ? 3 : 1;
  img.bit_depth = (maxv > 255) ? 16 : 8;
  size_t bytes = static_cast<size_t>(img.width) * img.height * img.channels *
                 (img.bit_depth / 8);
  if (buf.size() < pos + bytes) return img;
  img.data.assign(buf.begin() + pos, buf.begin() + pos + bytes);
  if (img.bit_depth == 16) {
    // PNM is big-endian; convert to little-endian host order.
    for (size_t i = 0; i + 1 < img.data.size(); i += 2)
      std::swap(img.data[i], img.data[i + 1]);
  }
  img.ok = true;
  return img;
}

// ---------------------------------------------------------------------------
// PNG (8/16-bit gray, gray+alpha, RGB, RGBA; no interlace, no palette)
// ---------------------------------------------------------------------------

static uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

static Image decode_png(const std::vector<uint8_t>& buf) {
  Image img;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (buf.size() < 8 || memcmp(buf.data(), sig, 8) != 0) return img;
  size_t pos = 8;
  int color_type = -1;
  std::vector<uint8_t> idat;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
    const uint8_t* payload = &buf[pos + 8];
    if (memcmp(type, "IHDR", 4) == 0 && len >= 13) {
      img.width = be32(payload);
      img.height = be32(payload + 4);
      img.bit_depth = payload[8];
      color_type = payload[9];
      if (payload[12] != 0) return img;  // interlaced unsupported
      if (img.bit_depth != 8 && img.bit_depth != 16) return img;
      switch (color_type) {
        case 0: img.channels = 1; break;
        case 2: img.channels = 3; break;
        case 4: img.channels = 2; break;
        case 6: img.channels = 4; break;
        default: return img;  // palette unsupported
      }
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (img.width <= 0 || img.height <= 0 || idat.empty()) return img;

  int bpp = img.channels * (img.bit_depth / 8);
  size_t stride = static_cast<size_t>(img.width) * bpp;
  std::vector<uint8_t> raw((stride + 1) * img.height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return img;

  img.data.resize(stride * img.height);
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < img.height; ++y) {
    const uint8_t* src = &raw[(stride + 1) * y];
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = &img.data[stride * y];
    for (size_t x = 0; x < stride; ++x) {
      int a = (x >= static_cast<size_t>(bpp)) ? dst[x - bpp] : 0;
      int b = prev[x];
      int c = (x >= static_cast<size_t>(bpp)) ? prev[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return img;
      }
      dst[x] = static_cast<uint8_t>(v);
    }
    memcpy(prev.data(), dst, stride);
  }
  if (img.bit_depth == 16) {
    for (size_t i = 0; i + 1 < img.data.size(); i += 2)
      std::swap(img.data[i], img.data[i + 1]);  // big-endian -> host
  }
  img.ok = true;
  return img;
}

static Image decode_any(const std::string& path) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return Image{};
  if (buf.size() >= 2 && buf[0] == 'P') return decode_pnm(buf);
  return decode_png(buf);
}

// Grayscale conversion (BT.601 integer) + channel drop.
static void to_gray(const Image& img, std::vector<uint8_t>* out8,
                    std::vector<uint16_t>* out16) {
  size_t n = static_cast<size_t>(img.width) * img.height;
  if (img.bit_depth == 8) {
    out8->resize(n);
    if (img.channels == 1) {
      memcpy(out8->data(), img.data.data(), n);
    } else {
      for (size_t i = 0; i < n; ++i) {
        const uint8_t* p = &img.data[i * img.channels];
        (*out8)[i] = static_cast<uint8_t>((299 * p[0] + 587 * p[1 % img.channels] +
                                           114 * p[2 % img.channels]) / 1000);
      }
    }
  } else {
    out16->resize(n);
    const uint16_t* src = reinterpret_cast<const uint16_t*>(img.data.data());
    if (img.channels == 1) {
      memcpy(out16->data(), src, n * 2);
    } else {
      for (size_t i = 0; i < n; ++i) (*out16)[i] = src[i * img.channels];
    }
  }
}

// ---------------------------------------------------------------------------
// Prefetcher: worker pool + bounded in-order slot ring
// ---------------------------------------------------------------------------

struct Slot {
  std::vector<uint8_t> gray8;
  std::vector<uint16_t> gray16;
  int width = 0, height = 0, bit_depth = 8;
  bool ok = false;
  std::atomic<bool> ready{false};
};

struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<Slot> slots;        // one per frame index (allocated lazily)
  std::atomic<size_t> next_fetch{0};
  size_t window;                  // max frames decoded ahead of consume
  std::atomic<size_t> consumed{0};
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::mutex m;
  std::condition_variable cv_work;  // wake workers when window advances

  void worker() {
    while (!stop.load()) {
      size_t idx = next_fetch.fetch_add(1);
      if (idx >= paths.size()) break;
      // Bound the look-ahead window.
      while (!stop.load() && idx >= consumed.load() + window) {
        std::unique_lock<std::mutex> lk(m);
        cv_work.wait_for(lk, std::chrono::milliseconds(20));
      }
      if (stop.load()) break;
      Image img = decode_any(paths[idx]);
      Slot& s = slots[idx];
      if (img.ok) {
        to_gray(img, &s.gray8, &s.gray16);
        s.width = img.width;
        s.height = img.height;
        s.bit_depth = img.bit_depth;
        s.ok = true;
      }
      s.ready.store(true);
    }
  }
};

}  // namespace

extern "C" {

void* slam_prefetch_open(const char** paths, int n_paths, int n_threads,
                         int window) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n_paths);
  p->slots = std::vector<Slot>(n_paths);
  p->window = window > 0 ? window : 16;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

// Returns 0 on success; fills header [width, height, bit_depth, ok].
int slam_prefetch_get(void* handle, int index, int* header) {
  auto* p = static_cast<Prefetcher*>(handle);
  if (index < 0 || index >= static_cast<int>(p->paths.size())) return -1;
  Slot& s = p->slots[index];
  while (!s.ready.load()) std::this_thread::sleep_for(std::chrono::microseconds(200));
  header[0] = s.width;
  header[1] = s.height;
  header[2] = s.bit_depth;
  header[3] = s.ok ? 1 : 0;
  return 0;
}

// Copies pixel data into out (must be width*height*(bit_depth/8) bytes) and
// releases the slot; advances the prefetch window.
int slam_prefetch_take(void* handle, int index, void* out) {
  auto* p = static_cast<Prefetcher*>(handle);
  Slot& s = p->slots[index];
  if (!s.ready.load() || !s.ok) return -1;
  if (s.bit_depth == 8) {
    memcpy(out, s.gray8.data(), s.gray8.size());
    s.gray8.clear();
    s.gray8.shrink_to_fit();
  } else {
    memcpy(out, s.gray16.data(), s.gray16.size() * 2);
    s.gray16.clear();
    s.gray16.shrink_to_fit();
  }
  size_t c = p->consumed.load();
  while (c < static_cast<size_t>(index) + 1 &&
         !p->consumed.compare_exchange_weak(c, index + 1)) {
  }
  p->cv_work.notify_all();
  return 0;
}

void slam_prefetch_close(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  p->cv_work.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

// Standalone single-image decode (for tests / cold paths).
// out_header: [width, height, bit_depth, ok]; call with out=null to query
// size, then again with a buffer.
int slam_decode_image(const char* path, int* header, void* out) {
  Image img = decode_any(path);
  header[0] = img.width;
  header[1] = img.height;
  header[2] = img.bit_depth;
  header[3] = img.ok ? 1 : 0;
  if (!img.ok) return -1;
  if (out != nullptr) {
    std::vector<uint8_t> g8;
    std::vector<uint16_t> g16;
    to_gray(img, &g8, &g16);
    if (img.bit_depth == 8)
      memcpy(out, g8.data(), g8.size());
    else
      memcpy(out, g16.data(), g16.size() * 2);
  }
  return 0;
}

}  // extern "C"
