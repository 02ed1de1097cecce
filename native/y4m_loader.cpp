// Native data loader: threaded-prefetch YUV4MPEG2 (.y4m) frame decoder.
//
// Role: the host-side video-decode tier of the pipeline (the reference
// delegates this to OpenCV's C++ VideoCapture, processor.py:310-319; see
// SURVEY.md §2.4 "host-side decode ... feeding pinned host->HBM batches").
// Decodes 4:2:0/4:2:2/4:4:4 planar YUV to packed BGR on a background thread
// into a ring of reusable buffers so device compute overlaps host decode.
//
// C ABI (ctypes-friendly):
//   y4m_open(path)            -> handle (NULL on failure)
//   y4m_width/height/...      -> stream geometry
//   y4m_next(handle, out)     -> 1 on frame copied (H*W*3 BGR bytes), 0 on EOF
//   y4m_close(handle)
//
// Build: g++ -O3 -shared -fPIC -pthread -o liby4m.so y4m_loader.cpp

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kRingSlots = 4;

struct Stream {
  FILE* file = nullptr;
  int width = 0;
  int height = 0;
  int chroma_w = 0;  // chroma plane width
  int chroma_h = 0;  // chroma plane height

  // Prefetch ring.
  std::vector<std::vector<uint8_t>> ring;  // decoded BGR frames
  std::vector<bool> full;
  int head = 0;  // next slot the consumer reads
  int tail = 0;  // next slot the producer fills
  bool eof = false;
  std::mutex mu;
  std::condition_variable cv_space, cv_data;
  std::thread worker;
  std::atomic<bool> stop{false};
};

inline uint8_t clamp_u8(int v) { return v < 0 ? 0 : (v > 255 ? 255 : (uint8_t)v); }

// BT.601 full-range integer YUV -> BGR (what y4m from our writer contains).
void yuv_to_bgr(const uint8_t* y, const uint8_t* u, const uint8_t* v,
                int width, int height, int cw, int ch, uint8_t* out) {
  const int sx = width / cw;   // chroma subsample factors (1 or 2)
  const int sy = height / ch;
  for (int r = 0; r < height; ++r) {
    const uint8_t* yrow = y + (size_t)r * width;
    const uint8_t* urow = u + (size_t)(r / sy) * cw;
    const uint8_t* vrow = v + (size_t)(r / sy) * cw;
    uint8_t* orow = out + (size_t)r * width * 3;
    for (int c = 0; c < width; ++c) {
      const int yy = yrow[c];
      const int uu = urow[c / sx] - 128;
      const int vv = vrow[c / sx] - 128;
      // Fixed-point BT.601: R = Y + 1.402 V, G = Y - .344 U - .714 V,
      // B = Y + 1.772 U  (x256).
      const int rr = yy + ((359 * vv) >> 8);
      const int gg = yy - ((88 * uu + 183 * vv) >> 8);
      const int bb = yy + ((454 * uu) >> 8);
      orow[c * 3 + 0] = clamp_u8(bb);
      orow[c * 3 + 1] = clamp_u8(gg);
      orow[c * 3 + 2] = clamp_u8(rr);
    }
  }
}

// Reads one raw frame (FRAME\n + planes); returns false on EOF.
bool read_frame_raw(Stream* s, std::vector<uint8_t>& y, std::vector<uint8_t>& u,
                    std::vector<uint8_t>& v) {
  char line[256];
  if (!fgets(line, sizeof(line), s->file)) return false;
  if (strncmp(line, "FRAME", 5) != 0) return false;
  const size_t ysz = (size_t)s->width * s->height;
  const size_t csz = (size_t)s->chroma_w * s->chroma_h;
  y.resize(ysz);
  u.resize(csz);
  v.resize(csz);
  if (fread(y.data(), 1, ysz, s->file) != ysz) return false;
  if (fread(u.data(), 1, csz, s->file) != csz) return false;
  if (fread(v.data(), 1, csz, s->file) != csz) return false;
  return true;
}

void producer_loop(Stream* s) {
  std::vector<uint8_t> y, u, v;
  while (!s->stop.load()) {
    if (!read_frame_raw(s, y, u, v)) break;
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv_space.wait(lk, [s] { return s->stop.load() || !s->full[s->tail]; });
    if (s->stop.load()) return;
    const int slot = s->tail;
    lk.unlock();
    yuv_to_bgr(y.data(), u.data(), v.data(), s->width, s->height, s->chroma_w,
               s->chroma_h, s->ring[slot].data());
    lk.lock();
    s->full[slot] = true;
    s->tail = (slot + 1) % kRingSlots;
    s->cv_data.notify_one();
  }
  std::lock_guard<std::mutex> lk(s->mu);
  s->eof = true;
  s->cv_data.notify_all();
}

}  // namespace

extern "C" {

void* y4m_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  char header[512];
  if (!fgets(header, sizeof(header), f) || strncmp(header, "YUV4MPEG2", 9) != 0) {
    fclose(f);
    return nullptr;
  }
  auto* s = new Stream();
  s->file = f;
  std::string colorspace = "420";
  for (char* tok = strtok(header + 9, " \n"); tok; tok = strtok(nullptr, " \n")) {
    if (tok[0] == 'W') s->width = atoi(tok + 1);
    else if (tok[0] == 'H') s->height = atoi(tok + 1);
    else if (tok[0] == 'C') colorspace = std::string(tok + 1);
  }
  if (s->width <= 0 || s->height <= 0) {
    fclose(f);
    delete s;
    return nullptr;
  }
  if (colorspace.rfind("444", 0) == 0) {
    s->chroma_w = s->width;
    s->chroma_h = s->height;
  } else if (colorspace.rfind("422", 0) == 0) {
    s->chroma_w = s->width / 2;
    s->chroma_h = s->height;
  } else {  // 420 family
    s->chroma_w = s->width / 2;
    s->chroma_h = s->height / 2;
  }
  s->ring.assign(kRingSlots, std::vector<uint8_t>((size_t)s->width * s->height * 3));
  s->full.assign(kRingSlots, false);
  s->worker = std::thread(producer_loop, s);
  return s;
}

int y4m_width(void* h) { return ((Stream*)h)->width; }
int y4m_height(void* h) { return ((Stream*)h)->height; }

int y4m_next(void* h, uint8_t* out) {
  auto* s = (Stream*)h;
  std::unique_lock<std::mutex> lk(s->mu);
  s->cv_data.wait(lk, [s] { return s->full[s->head] || s->eof; });
  if (!s->full[s->head]) return 0;  // eof and ring drained
  const int slot = s->head;
  lk.unlock();
  memcpy(out, s->ring[slot].data(), s->ring[slot].size());
  lk.lock();
  s->full[slot] = false;
  s->head = (slot + 1) % kRingSlots;
  s->cv_space.notify_one();
  return 1;
}

void y4m_close(void* h) {
  auto* s = (Stream*)h;
  s->stop.store(true);
  s->cv_space.notify_all();
  s->cv_data.notify_all();
  if (s->worker.joinable()) s->worker.join();
  fclose(s->file);
  delete s;
}

}  // extern "C"
