// Native data loader: multithreaded JPEG/PNG decode + canvas staging.
//
// TPU-native counterpart of the reference's host-side image path
// (/root/reference/tools/utils.py:339-355 `_read_img` + the py_function
// parser at utils.py:417-443, which is GIL-bound Python).  Here the whole
// hot path — file read, entropy decode, downscale-to-fit, canvas placement
// — runs in C++ worker threads with no Python in the loop; Python only
// receives completed fixed-shape uint8 batches (the device does letterbox
// / augment / normalize / label gridding, see data/pipeline.py).
//
// C ABI (ctypes-friendly):
//   yl_decode_image : one-shot decode into a caller canvas
//   yl_loader_create/next/destroy : threaded epoch-shuffled batch producer
//
// Decoded images larger than the canvas are box-downscaled (libjpeg DCT
// scaling when possible, then bilinear) so every output fits the fixed
// staging canvas; the true post-scale (h, w) is reported per image.

#include <cstdio>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jmp, 1);
}

bool decode_jpeg(FILE* f, int max_h, int max_w, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  // declared BEFORE setjmp: a longjmp from mid-decode returns through the
  // normal path below, so these are destroyed normally (no leaked buffers,
  // no UB from jumping over non-trivial initialization)
  std::vector<uint8_t> row;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // cheap DCT-domain downscale: pick the largest 1/1..1/8 that still covers
  // the canvas (full bilinear fit happens afterwards).
  if (max_h > 0 && max_w > 0) {
    unsigned denom = 1;
    while (denom < 8 &&
           (cinfo.image_height / (denom * 2) >= (unsigned)max_h ||
            cinfo.image_width / (denom * 2) >= (unsigned)max_w))
      denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  const int ch = cinfo.output_components;  // 3 (JCS_RGB)
  out->rgb.resize((size_t)out->h * out->w * 3);
  row.resize((size_t)out->w * ch);
  for (int y = 0; y < out->h; ++y) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = out->rgb.data() + (size_t)y * out->w * 3;
    if (ch == 3) {
      std::memcpy(dst, rp, (size_t)out->w * 3);
    } else {  // grayscale safety net
      for (int x = 0; x < out->w; ++x)
        dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = rp[x];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ----
bool decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  std::vector<png_bytep> rows;  // before setjmp: destroyed on the error return
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->h = png_get_image_height(png, info);
  out->w = png_get_image_width(png, info);
  out->rgb.resize((size_t)out->h * out->w * 3);
  rows.resize(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + (size_t)y * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ------------------------------------------------------------- resample ----
void bilinear_resize(const Image& src, int nh, int nw, Image* dst) {
  dst->h = nh;
  dst->w = nw;
  dst->rgb.resize((size_t)nh * nw * 3);
  const float sy = (float)src.h / nh, sx = (float)src.w / nw;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::clamp((int)fy, 0, src.h - 1);
    int y1 = std::min(y0 + 1, src.h - 1);
    float wy = std::clamp(fy - y0, 0.0f, 1.0f);
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::clamp((int)fx, 0, src.w - 1);
      int x1 = std::min(x0 + 1, src.w - 1);
      float wx = std::clamp(fx - x0, 0.0f, 1.0f);
      for (int c = 0; c < 3; ++c) {
        float a = src.rgb[((size_t)y0 * src.w + x0) * 3 + c] * (1 - wx) +
                  src.rgb[((size_t)y0 * src.w + x1) * 3 + c] * wx;
        float b = src.rgb[((size_t)y1 * src.w + x0) * 3 + c] * (1 - wx) +
                  src.rgb[((size_t)y1 * src.w + x1) * 3 + c] * wx;
        dst->rgb[((size_t)y * nw + x) * 3 + c] =
            (uint8_t)(a * (1 - wy) + b * wy + 0.5f);
      }
    }
  }
}

bool decode_any(const char* path, int max_h, int max_w, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, max_h, max_w, out);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    ok = decode_png(f, out);
  }
  std::fclose(f);
  if (!ok) return false;
  if (max_h > 0 && max_w > 0 && (out->h > max_h || out->w > max_w)) {
    float s = std::min((float)max_h / out->h, (float)max_w / out->w);
    int nh = std::max(1, (int)(out->h * s));
    int nw = std::max(1, (int)(out->w * s));
    Image shrunk;
    bilinear_resize(*out, nh, nw, &shrunk);
    *out = std::move(shrunk);
  }
  return true;
}

void stage_into_canvas(const Image& img, int ch, int cw, uint8_t* canvas,
                       int32_t* hw) {
  std::memset(canvas, 0, (size_t)ch * cw * 3);
  for (int y = 0; y < img.h; ++y)
    std::memcpy(canvas + (size_t)y * cw * 3,
                img.rgb.data() + (size_t)y * img.w * 3, (size_t)img.w * 3);
  hw[0] = img.h;
  hw[1] = img.w;
}

// ------------------------------------------------------ batch producer ----
struct Batch {
  std::vector<uint8_t> canvases;
  std::vector<int32_t> hws;
  std::vector<int32_t> indices;
  std::atomic<int> remaining{0};
  uint64_t seq = 0;  // schedule order; consumed strictly in sequence
};

struct Loader {
  std::vector<std::string> paths;
  int canvas_h, canvas_w, batch, prefetch;
  std::mt19937_64 rng;

  std::vector<std::unique_ptr<Batch>> ring;
  std::deque<int> ready;         // completed ring slots (completion order)
  uint64_t next_seq = 0;         // next sequence number to hand out
  uint64_t consume_seq = 0;      // next sequence number the consumer gets
  std::deque<int> free_slots;    // reusable ring slots
  std::deque<std::tuple<int, int, int>> jobs;  // (slot, pos, sample idx)
  std::vector<int> order;
  size_t cursor = 0;

  std::mutex mu;
  std::condition_variable cv_job, cv_ready;
  std::vector<std::thread> workers;
  bool stop = false;

  int next_index_locked() {
    if (cursor >= order.size()) {
      for (size_t i = 0; i < order.size(); ++i) order[i] = (int)i;
      std::shuffle(order.begin(), order.end(), rng);
      cursor = 0;
    }
    return order[cursor++];
  }

  void schedule_batch_locked(int slot) {
    Batch& b = *ring[slot];
    b.seq = next_seq++;
    b.remaining.store(batch);
    for (int pos = 0; pos < batch; ++pos)
      jobs.emplace_back(slot, pos, next_index_locked());
    cv_job.notify_all();
  }

  void worker() {
    for (;;) {
      std::tuple<int, int, int> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return stop || !jobs.empty(); });
        if (stop) return;
        job = jobs.front();
        jobs.pop_front();
      }
      auto [slot, pos, idx] = job;
      Batch& b = *ring[slot];
      uint8_t* canvas = b.canvases.data() + (size_t)pos * canvas_h * canvas_w * 3;
      int32_t* hw = b.hws.data() + (size_t)pos * 2;
      Image img;
      if (decode_any(paths[idx].c_str(), canvas_h, canvas_w, &img)) {
        stage_into_canvas(img, canvas_h, canvas_w, canvas, hw);
        b.indices[pos] = idx;
      } else {  // unreadable file: zero canvas + index -1 = explicit error
        std::memset(canvas, 0, (size_t)canvas_h * canvas_w * 3);
        hw[0] = hw[1] = 0;
        b.indices[pos] = -(idx + 1);  // caller recovers idx and raises
      }
      if (b.remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        ready.push_back(slot);
        cv_ready.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

// One-shot: decode path into caller-provided canvas [canvas_h*canvas_w*3]
// u8 + hw [2] i32.  Returns 0 on success.
int yl_decode_image(const char* path, int canvas_h, int canvas_w,
                    uint8_t* canvas, int32_t* hw) {
  Image img;
  if (!decode_any(path, canvas_h, canvas_w, &img)) return 1;
  stage_into_canvas(img, canvas_h, canvas_w, canvas, hw);
  return 0;
}

void* yl_loader_create(const char** paths, int n_paths, int canvas_h,
                       int canvas_w, int batch, int workers, int prefetch,
                       uint64_t seed) {
  if (n_paths <= 0 || batch <= 0) return nullptr;
  auto* L = new Loader();
  L->paths.assign(paths, paths + n_paths);
  L->canvas_h = canvas_h;
  L->canvas_w = canvas_w;
  L->batch = batch;
  L->prefetch = std::max(1, prefetch);
  L->rng.seed(seed);
  L->order.resize(n_paths);
  L->cursor = n_paths;  // force first-use shuffle
  for (int i = 0; i < L->prefetch + 1; ++i) {
    auto b = std::make_unique<Batch>();
    b->canvases.resize((size_t)batch * canvas_h * canvas_w * 3);
    b->hws.resize((size_t)batch * 2);
    b->indices.resize(batch);
    L->ring.push_back(std::move(b));
  }
  {
    std::lock_guard<std::mutex> lk(L->mu);
    for (int i = 0; i < L->prefetch; ++i) L->schedule_batch_locked(i);
    L->free_slots.push_back(L->prefetch);  // spare slot
  }
  int nw = std::max(1, workers);
  for (int i = 0; i < nw; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// Blocks until a batch is ready; copies it out and schedules a refill.
// Returns 0 on success.
int yl_loader_next(void* handle, uint8_t* canvases, int32_t* hws,
                   int32_t* indices) {
  auto* L = static_cast<Loader*>(handle);
  int slot = -1;
  {
    // deliver strictly in schedule order: completion may reorder slots,
    // but consumers must see a deterministic epoch stream
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] {
      if (L->stop) return true;
      for (int s : L->ready)
        if (L->ring[s]->seq == L->consume_seq) return true;
      return false;
    });
    if (L->stop) return 1;
    for (auto it = L->ready.begin(); it != L->ready.end(); ++it)
      if (L->ring[*it]->seq == L->consume_seq) {
        slot = *it;
        L->ready.erase(it);
        break;
      }
    ++L->consume_seq;
  }
  Batch& b = *L->ring[slot];
  std::memcpy(canvases, b.canvases.data(), b.canvases.size());
  std::memcpy(hws, b.hws.data(), b.hws.size() * sizeof(int32_t));
  std::memcpy(indices, b.indices.data(), b.indices.size() * sizeof(int32_t));
  {
    std::lock_guard<std::mutex> lk(L->mu);
    // refill: reuse a free slot now, return this one to the free pool
    int refill = L->free_slots.front();
    L->free_slots.pop_front();
    L->schedule_batch_locked(refill);
    L->free_slots.push_back(slot);
  }
  return 0;
}

void yl_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_job.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
