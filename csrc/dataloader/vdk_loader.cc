// Native host data pipeline: threaded JPEG/PNG decode + resize + letterbox
// into caller-owned uint8 NHWC batch buffers.
//
// Role in the framework: the reference leans on external native code for its
// hot host path (PIL-SIMD/libjpeg-turbo under PIL, OpenCV, torch DataLoader's
// C++ pin-memory workers). This library is the TPU framework's equivalent:
// the Python DataLoader (visiondk_tpu/data/loader.py) can swap its
// PIL-per-sample decode for one vdk_decode_batch call that fans out over a
// persistent C++ thread pool, releasing the GIL for the whole batch.
//
// C ABI only — consumed via ctypes (no pybind11 in the image).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Loader {
  std::unique_ptr<ThreadPool> pool;
  int height = 224;
  int width = 224;
  // 0 = plain resize, 1 = letterbox (ResizeAndPadding2Square semantics:
  // keep aspect, pad with zeros — dataset/transforms.py reference :325-388)
  int letterbox = 0;
};

void Letterbox(const cv::Mat& rgb, cv::Mat& dst, int h, int w) {
  const double scale =
      std::min(static_cast<double>(w) / rgb.cols, static_cast<double>(h) / rgb.rows);
  // round-half-to-even-free lround: matches the Python transform's
  // round(w*scale) geometry (ResizeAndPadding2Square)
  const int nw = std::max(1, std::min(w, static_cast<int>(std::lround(rgb.cols * scale))));
  const int nh = std::max(1, std::min(h, static_cast<int>(std::lround(rgb.rows * scale))));
  cv::Mat resized;
  cv::resize(rgb, resized, cv::Size(nw, nh), 0, 0,
             scale < 1.0 ? cv::INTER_AREA : cv::INTER_LINEAR);
  dst.setTo(cv::Scalar(0, 0, 0));
  const int top = (h - nh) / 2;
  const int left = (w - nw) / 2;
  resized.copyTo(dst(cv::Rect(left, top, nw, nh)));
}

// Decode one file into out[h*w*3] RGB uint8. Returns 0 on success.
int DecodeOne(const char* path, uint8_t* out, int h, int w, int letterbox) {
  cv::Mat img = cv::imread(path, cv::IMREAD_COLOR);  // BGR
  if (img.empty()) return 1;
  cv::Mat rgb;
  cv::cvtColor(img, rgb, cv::COLOR_BGR2RGB);

  cv::Mat dst(h, w, CV_8UC3, out);
  if (letterbox) {
    Letterbox(rgb, dst, h, w);
  } else {
    cv::resize(rgb, dst, cv::Size(w, h), 0, 0,
               (rgb.cols > w || rgb.rows > h) ? cv::INTER_AREA : cv::INTER_LINEAR);
  }
  return 0;
}

// Per-sample geometry op (int32[5] = mode, a, b, c, d):
//   mode 0 — letterbox (a-d unused)
//   mode 1 — crop rect (left=a, top=b, width=c, height=d) then resize to
//            (w, h): the host-side RandomResizedCrop with the rect sampled in
//            Python from the per-(seed,epoch,sample) stream (transforms.py
//            RandomResizedCrop.sample_params), so the native path reproduces
//            the PIL path's crop geometry exactly
//   mode 2 — plain stretch-resize (a-d unused)
int DecodeOneOp(const char* path, uint8_t* out, int h, int w,
                const int32_t* op) {
  cv::Mat img = cv::imread(path, cv::IMREAD_COLOR);  // BGR
  if (img.empty()) return 1;
  cv::Mat rgb;
  cv::cvtColor(img, rgb, cv::COLOR_BGR2RGB);

  cv::Mat dst(h, w, CV_8UC3, out);
  switch (op[0]) {
    case 1: {
      // clamp to decoded bounds (header dims can disagree on odd files)
      int left = std::max(0, std::min(static_cast<int>(op[1]), rgb.cols - 1));
      int top = std::max(0, std::min(static_cast<int>(op[2]), rgb.rows - 1));
      int cw = std::max(1, std::min(static_cast<int>(op[3]), rgb.cols - left));
      int ch = std::max(1, std::min(static_cast<int>(op[4]), rgb.rows - top));
      cv::Mat crop = rgb(cv::Rect(left, top, cw, ch));
      cv::resize(crop, dst, cv::Size(w, h), 0, 0,
                 (cw > w || ch > h) ? cv::INTER_AREA : cv::INTER_LINEAR);
      break;
    }
    case 2:
      cv::resize(rgb, dst, cv::Size(w, h), 0, 0,
                 (rgb.cols > w || rgb.rows > h) ? cv::INTER_AREA : cv::INTER_LINEAR);
      break;
    default:
      Letterbox(rgb, dst, h, w);
  }
  return 0;
}

}  // namespace

extern "C" {

void* vdk_loader_create(int height, int width, int threads, int letterbox) {
  auto* l = new Loader();
  l->height = height;
  l->width = width;
  l->letterbox = letterbox;
  l->pool = std::make_unique<ThreadPool>(threads > 0 ? threads : 4);
  return l;
}

void vdk_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// Decode `count` files into out [count, h, w, 3] uint8 (caller-allocated).
// ok[i] = 1 if file i decoded, else 0 (row left zeroed). Blocks until done.
void vdk_decode_batch(void* handle, const char** paths, int count, uint8_t* out,
                      uint8_t* ok) {
  auto* l = static_cast<Loader*>(handle);
  const size_t row = static_cast<size_t>(l->height) * l->width * 3;
  std::atomic<int> remaining(count);
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < count; ++i) {
    l->pool->Submit([&, i] {
      uint8_t* dst = out + row * i;
      int rc = DecodeOne(paths[i], dst, l->height, l->width, l->letterbox);
      if (rc != 0) std::memset(dst, 0, row);
      if (ok) ok[i] = rc == 0 ? 1 : 0;
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return remaining.load() == 0; });
}

// Decode `count` files with a per-sample geometry op (ops[i*5..i*5+4], see
// DecodeOneOp) into out [count, h, w, 3] uint8. ok[i] = 1 on success.
// Blocks until done. This is the randomized-train-path entry: the Python
// loader samples each file's crop from its reproducible per-sample RNG and
// the pool does decode+crop+resize GIL-free.
void vdk_decode_batch_ops(void* handle, const char** paths, int count,
                          const int32_t* ops, uint8_t* out, uint8_t* ok) {
  auto* l = static_cast<Loader*>(handle);
  const size_t row = static_cast<size_t>(l->height) * l->width * 3;
  std::atomic<int> remaining(count);
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < count; ++i) {
    l->pool->Submit([&, i] {
      uint8_t* dst = out + row * i;
      int rc = DecodeOneOp(paths[i], dst, l->height, l->width, ops + 5 * i);
      if (rc != 0) std::memset(dst, 0, row);
      if (ok) ok[i] = rc == 0 ? 1 : 0;
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return remaining.load() == 0; });
}

// Single-file decode (no pool) — handy for tools.
int vdk_decode_one(const char* path, uint8_t* out, int h, int w, int letterbox) {
  return DecodeOne(path, out, h, w, letterbox);
}

}  // extern "C"
