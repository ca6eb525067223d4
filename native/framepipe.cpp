// framepipe — native host runtime for the TPU video stabilizer.
//
// The TPU owns all compute; what remains on the host at >500 fps of 1080p
// BGR (≈3 GB/s of input) is the data path: buffer management, batch
// assembly, color conversion for preview paths, and raw high-throughput
// video IO. The reference keeps the analogous layer in C++ too (cv::Mat <->
// Halide buffer interop + reallocation logic, imgproc.cpp:204-325); this is
// its TPU-era equivalent: an aligned buffer pool, a multi-threaded frame
// staging queue that assembles (T, H, W, 3) u8 batches ready for
// jax.device_put, and a zero-dependency Y4M reader for uncompressed
// high-rate capture files.
//
// Pure C ABI (used from Python via ctypes — see
// video_stabilizer_tpu/utils/native.py). C++17, no external deps.
//
// Build: make -C native   (produces libframepipe.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <new>
#include <string>
#include <thread>
#include <vector>

#define FP_API extern "C" __attribute__((visibility("default")))

namespace {

constexpr size_t kAlign = 128;  // TPU-transfer- and cacheline-friendly

void* aligned_malloc(size_t bytes) {
  void* p = nullptr;
  if (posix_memalign(&p, kAlign, bytes) != 0) return nullptr;
  return p;
}

}  // namespace

// ---------------------------------------------------------------------------
// Buffer pool: fixed-size aligned slabs, recycled without malloc churn.
// (The reference reallocates Halide buffers on size change and reuses them
// across frames — imgproc.cpp:34-44 etc.; same idea, explicit.)
// ---------------------------------------------------------------------------

struct fp_pool {
  size_t slab_bytes = 0;
  std::vector<void*> all;
  std::vector<void*> free_list;
  std::mutex mu;
};

FP_API fp_pool* fp_pool_create(size_t slab_bytes, int n_slabs) {
  auto* p = new (std::nothrow) fp_pool;
  if (!p) return nullptr;
  p->slab_bytes = slab_bytes;
  for (int i = 0; i < n_slabs; i++) {
    void* s = aligned_malloc(slab_bytes);
    if (!s) break;
    p->all.push_back(s);
    p->free_list.push_back(s);
  }
  return p;
}

FP_API void* fp_pool_acquire(fp_pool* p) {
  std::lock_guard<std::mutex> lk(p->mu);
  if (p->free_list.empty()) return nullptr;
  void* s = p->free_list.back();
  p->free_list.pop_back();
  return s;
}

FP_API void fp_pool_release(fp_pool* p, void* slab) {
  std::lock_guard<std::mutex> lk(p->mu);
  p->free_list.push_back(slab);
}

FP_API int fp_pool_available(fp_pool* p) {
  std::lock_guard<std::mutex> lk(p->mu);
  return (int)p->free_list.size();
}

FP_API void fp_pool_destroy(fp_pool* p) {
  for (void* s : p->all) free(s);
  delete p;
}

// ---------------------------------------------------------------------------
// Pixel kernels (host fallbacks / staging helpers). Plain loops the compiler
// auto-vectorizes; gray output matches OpenCV 5.x float weights + rounding.
// ---------------------------------------------------------------------------

FP_API void fp_bgr_to_gray(const uint8_t* bgr, uint8_t* gray, int64_t n_px) {
  for (int64_t i = 0; i < n_px; i++) {
    float v = 0.114f * bgr[3 * i] + 0.587f * bgr[3 * i + 1] +
              0.299f * bgr[3 * i + 2];
    gray[i] = (uint8_t)(v + 0.5f);
  }
}

// Interleave a batch slot: copy one (H, W, 3) frame into position t of a
// (T, H, W, 3) batch slab, with optional row stride on the source.
FP_API void fp_stage_frame(const uint8_t* src, int64_t src_row_bytes,
                           uint8_t* batch, int64_t t, int64_t h, int64_t w) {
  const int64_t row = w * 3;
  uint8_t* dst = batch + t * h * row;
  if (src_row_bytes == row) {
    memcpy(dst, src, (size_t)(h * row));
  } else {
    for (int64_t y = 0; y < h; y++)
      memcpy(dst + y * row, src + y * src_row_bytes, (size_t)row);
  }
}

// ---------------------------------------------------------------------------
// Staging queue: worker threads copy/convert incoming frames into batch
// slabs; the consumer pops completed (T, H, W, 3) batches. Keeps the Python
// feeding loop free of per-frame copies (the GIL-released memcpy/convert
// happens here).
// ---------------------------------------------------------------------------

struct fp_queue {
  int64_t h = 0, w = 0, batch_frames = 0;
  fp_pool* pool = nullptr;  // slabs of batch_frames*h*w*3 bytes

  struct Job {
    const uint8_t* src;
    int64_t src_row_bytes;
    uint8_t* slab;
    int64_t t;
    uint64_t seq;
  };

  std::deque<Job> jobs;
  std::deque<uint8_t*> ready;
  uint8_t* filling = nullptr;
  int64_t fill_count = 0;
  uint64_t submitted = 0;
  std::atomic<uint64_t> completed{0};

  std::mutex mu;
  std::condition_variable cv_jobs, cv_ready, cv_done;
  std::vector<std::thread> workers;
  bool stop = false;

  void worker() {
    for (;;) {
      Job j;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_jobs.wait(lk, [&] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        j = jobs.front();
        jobs.pop_front();
      }
      fp_stage_frame(j.src, j.src_row_bytes, j.slab, j.t, h, w);
      completed.fetch_add(1);
      cv_done.notify_all();
    }
  }
};

FP_API fp_queue* fp_queue_create(int64_t h, int64_t w, int64_t batch_frames,
                                 int n_slabs, int n_workers) {
  auto* q = new (std::nothrow) fp_queue;
  if (!q) return nullptr;
  q->h = h;
  q->w = w;
  q->batch_frames = batch_frames;
  q->pool = fp_pool_create((size_t)(batch_frames * h * w * 3), n_slabs);
  if (!q->pool) {
    delete q;
    return nullptr;
  }
  if (n_workers < 1) n_workers = 1;
  for (int i = 0; i < n_workers; i++)
    q->workers.emplace_back([q] { q->worker(); });
  return q;
}

// Submit one frame; the pointer must stay valid until the enclosing batch
// is complete (Python side keeps the frame object alive per batch).
// Returns the batch index the frame was staged into, or -1 if no slab is
// available (backpressure).
FP_API int64_t fp_queue_submit(fp_queue* q, const uint8_t* src,
                               int64_t src_row_bytes) {
  std::unique_lock<std::mutex> lk(q->mu);
  if (!q->filling) {
    q->filling = (uint8_t*)fp_pool_acquire(q->pool);
    if (!q->filling) return -1;
    q->fill_count = 0;
  }
  fp_queue::Job j{src, src_row_bytes, q->filling, q->fill_count,
                  q->submitted++};
  q->jobs.push_back(j);
  int64_t idx = q->fill_count++;
  if (q->fill_count == q->batch_frames) {
    q->ready.push_back(q->filling);
    q->filling = nullptr;
    // fill_count tracks jobs of the CURRENT partial batch; reset now, or
    // the pop-side completion wait (submitted - fill_count) under-counts
    // by a whole batch and can release a slab whose copies are in flight.
    q->fill_count = 0;
    q->cv_ready.notify_all();
  }
  q->cv_jobs.notify_one();
  return idx;
}

// Pop a completed batch slab (blocks until one is full AND all its copies
// finished). Returns the slab pointer; caller must fp_queue_recycle it.
FP_API uint8_t* fp_queue_pop_batch(fp_queue* q) {
  uint8_t* slab = nullptr;
  {
    std::unique_lock<std::mutex> lk(q->mu);
    q->cv_ready.wait(lk, [&] { return q->stop || !q->ready.empty(); });
    if (q->ready.empty()) return nullptr;
    slab = q->ready.front();
    q->ready.pop_front();
  }
  // Wait until every submitted copy job has completed (jobs are FIFO and a
  // batch is only in `ready` after all its frames were submitted).
  {
    std::unique_lock<std::mutex> lk(q->mu);
    q->cv_done.wait(lk, [&] {
      return q->completed.load() >= q->submitted - (uint64_t)q->fill_count ||
             q->stop;
    });
  }
  return slab;
}

FP_API void fp_queue_recycle(fp_queue* q, uint8_t* slab) {
  fp_pool_release(q->pool, slab);
}

FP_API void fp_queue_destroy(fp_queue* q) {
  {
    std::lock_guard<std::mutex> lk(q->mu);
    q->stop = true;
  }
  q->cv_jobs.notify_all();
  q->cv_ready.notify_all();
  q->cv_done.notify_all();
  for (auto& t : q->workers) t.join();
  fp_pool_destroy(q->pool);
  delete q;
}

// ---------------------------------------------------------------------------
// Y4M reader: zero-dependency uncompressed video input (YUV4MPEG2, C420).
// The high-rate capture path — no ffmpeg/OpenCV in the loop.
// ---------------------------------------------------------------------------

struct fp_y4m {
  FILE* f = nullptr;
  int64_t w = 0, h = 0;
  std::string colorspace;
  std::vector<uint8_t> framebuf;  // Y + U + V planes
};

FP_API fp_y4m* fp_y4m_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  char line[512];
  if (!fgets(line, sizeof line, f) ||
      strncmp(line, "YUV4MPEG2", 9) != 0) {
    fclose(f);
    return nullptr;
  }
  auto* y = new fp_y4m;
  y->f = f;
  y->colorspace = "420";
  for (char* tok = strtok(line + 9, " \n"); tok; tok = strtok(nullptr, " \n")) {
    if (tok[0] == 'W') y->w = atoll(tok + 1);
    else if (tok[0] == 'H') y->h = atoll(tok + 1);
    else if (tok[0] == 'C') y->colorspace = tok + 1;
  }
  if (y->w <= 0 || y->h <= 0) {
    fclose(f);
    delete y;
    return nullptr;
  }
  y->framebuf.resize((size_t)(y->w * y->h * 3 / 2));
  return y;
}

FP_API int64_t fp_y4m_width(fp_y4m* y) { return y->w; }
FP_API int64_t fp_y4m_height(fp_y4m* y) { return y->h; }

// Read the next frame's LUMA plane into `gray` (H*W bytes). Chroma is
// skipped — the aligner consumes grayscale. Returns 1 on success, 0 on EOF.
FP_API int fp_y4m_next_gray(fp_y4m* y, uint8_t* gray) {
  char line[512];
  if (!fgets(line, sizeof line, y->f) || strncmp(line, "FRAME", 5) != 0)
    return 0;
  size_t luma = (size_t)(y->w * y->h);
  if (fread(gray, 1, luma, y->f) != luma) return 0;
  // Skip chroma (C420: half-res U and V).
  size_t chroma = luma / 2;
  if (y->colorspace.rfind("420", 0) == 0) {
    if (fseek(y->f, (long)chroma, SEEK_CUR) != 0) return 0;
  } else if (y->colorspace.rfind("444", 0) == 0) {
    if (fseek(y->f, (long)(2 * luma), SEEK_CUR) != 0) return 0;
  } else if (y->colorspace.rfind("422", 0) == 0) {
    if (fseek(y->f, (long)luma, SEEK_CUR) != 0) return 0;
  } else {
    return 0;
  }
  return 1;
}

// Full-frame BT.601 YUV420 -> BGR conversion for the output/compare path.
FP_API int fp_y4m_next_bgr(fp_y4m* y, uint8_t* bgr) {
  char line[512];
  if (!fgets(line, sizeof line, y->f) || strncmp(line, "FRAME", 5) != 0)
    return 0;
  if (y->colorspace.rfind("420", 0) != 0) return 0;  // 420 only
  const int64_t w = y->w, h = y->h;
  size_t luma = (size_t)(w * h), chroma = luma / 4;
  uint8_t* Y = y->framebuf.data();
  uint8_t* U = Y + luma;
  uint8_t* V = U + chroma;
  if (fread(Y, 1, luma + 2 * chroma, y->f) != luma + 2 * chroma) return 0;
  for (int64_t r = 0; r < h; r++) {
    for (int64_t c = 0; c < w; c++) {
      float yy = (float)Y[r * w + c];
      float uu = (float)U[(r / 2) * (w / 2) + c / 2] - 128.f;
      float vv = (float)V[(r / 2) * (w / 2) + c / 2] - 128.f;
      float b = yy + 1.772f * uu;
      float g = yy - 0.344136f * uu - 0.714136f * vv;
      float rr = yy + 1.402f * vv;
      uint8_t* px = bgr + 3 * (r * w + c);
      px[0] = (uint8_t)(b < 0 ? 0 : b > 255 ? 255 : b + 0.5f);
      px[1] = (uint8_t)(g < 0 ? 0 : g > 255 ? 255 : g + 0.5f);
      px[2] = (uint8_t)(rr < 0 ? 0 : rr > 255 ? 255 : rr + 0.5f);
    }
  }
  return 1;
}

FP_API void fp_y4m_close(fp_y4m* y) {
  if (y->f) fclose(y->f);
  delete y;
}
