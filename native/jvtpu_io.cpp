// jvtpu_io — native IO runtime for jvector_tpu.
//
// TPU-native counterpart of the reference's native/IO tier:
//  - jvector-native's C++ kernels accelerate the CPU compute path; here the
//    compute path is the TPU, so the native layer instead owns the *host*
//    hot paths: dataset parsing (fvecs), checksums, positional parallel
//    writes (the ParallelGraphWriter analog, ParallelGraphWriter.java:17-110),
//    and an async prefetch reader (the ReaderSupplier/MappedChunkReader
//    analog for streaming larger-than-memory builds).
//
// C ABI only (consumed via ctypes). All functions return 0 on success or a
// negative errno-style code.

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <fcntl.h>
#include <mutex>
#include <sys/stat.h>
#include <sys/types.h>
#include <thread>
#include <unistd.h>
#include <vector>
#include <zlib.h>

namespace {

int64_t file_size(const char* path) {
  struct stat st;
  if (::stat(path, &st) != 0) return -1;
  return st.st_size;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Parallel CRC32 (zlib polynomial, combinable) — container integrity checks.
// ---------------------------------------------------------------------------
int jvtpu_crc32(const char* path, uint64_t offset, uint64_t length,
                int n_threads, uint32_t* out) {
  int64_t fsize = file_size(path);
  if (fsize < 0) return -errno;
  if (offset + length > (uint64_t)fsize) return -EINVAL;
  if (n_threads < 1) n_threads = 1;
  if ((uint64_t)n_threads > length / (1 << 20) + 1)
    n_threads = (int)(length / (1 << 20) + 1);

  uint64_t per = length / n_threads;
  std::vector<uint32_t> crcs(n_threads, 0);
  std::vector<uint64_t> lens(n_threads, 0);
  std::vector<std::thread> ts;
  std::atomic<int> err{0};
  for (int t = 0; t < n_threads; ++t) {
    uint64_t off = offset + per * t;
    uint64_t len = (t == n_threads - 1) ? length - per * t : per;
    lens[t] = len;
    ts.emplace_back([&, t, off, len]() {
      int fd = ::open(path, O_RDONLY);
      if (fd < 0) { err = -errno; return; }
      std::vector<unsigned char> buf(4 << 20);
      uint32_t crc = crc32(0L, Z_NULL, 0);
      uint64_t done = 0;
      while (done < len) {
        size_t want = std::min<uint64_t>(buf.size(), len - done);
        ssize_t got = ::pread(fd, buf.data(), want, off + done);
        if (got <= 0) { err = -EIO; break; }
        crc = crc32(crc, buf.data(), (uInt)got);
        done += got;
      }
      crcs[t] = crc;
      ::close(fd);
    });
  }
  for (auto& th : ts) th.join();
  if (err) return err;
  uint32_t crc = crcs[0];
  for (int t = 1; t < n_threads; ++t)
    crc = crc32_combine(crc, crcs[t], (z_off_t)lens[t]);
  *out = crc;
  return 0;
}

// ---------------------------------------------------------------------------
// fvecs parsing: validate + strip per-row dim prefixes into a dense matrix,
// reading in parallel (each thread owns a row range; rows are fixed-stride).
// ---------------------------------------------------------------------------
int jvtpu_fvecs_info(const char* path, int32_t* dim, int64_t* count) {
  int64_t fsize = file_size(path);
  if (fsize < 0) return -errno;
  if (fsize == 0) { *dim = 0; *count = 0; return 0; }
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -errno;
  int32_t d = 0;
  if (::pread(fd, &d, 4, 0) != 4) { ::close(fd); return -EIO; }
  ::close(fd);
  if (d <= 0 || d > (1 << 24)) return -EINVAL;
  int64_t row = 4 + (int64_t)d * 4;
  if (fsize % row != 0) return -EBADMSG;
  *dim = d;
  *count = fsize / row;
  return 0;
}

int jvtpu_fvecs_to_dense(const char* path, float* out, int64_t max_rows,
                         int n_threads) {
  int32_t d;
  int64_t n;
  int rc = jvtpu_fvecs_info(path, &d, &n);
  if (rc != 0) return rc;
  if (max_rows >= 0 && n > max_rows) n = max_rows;
  if (n == 0) return 0;
  if (n_threads < 1) n_threads = 1;
  int64_t row = 4 + (int64_t)d * 4;
  int64_t per = (n + n_threads - 1) / n_threads;
  std::vector<std::thread> ts;
  std::atomic<int> err{0};
  for (int t = 0; t < n_threads; ++t) {
    int64_t r0 = per * t;
    int64_t r1 = std::min<int64_t>(r0 + per, n);
    if (r0 >= r1) break;
    ts.emplace_back([&, r0, r1]() {
      int fd = ::open(path, O_RDONLY);
      if (fd < 0) { err = -errno; return; }
      std::vector<char> buf(row);
      for (int64_t r = r0; r < r1; ++r) {
        if (::pread(fd, buf.data(), row, r * row) != row) { err = -EIO; break; }
        int32_t rd;
        std::memcpy(&rd, buf.data(), 4);
        if (rd != d) { err = -EBADMSG; break; }
        std::memcpy(out + r * d, buf.data() + 4, (size_t)d * 4);
      }
      ::close(fd);
    });
  }
  for (auto& th : ts) th.join();
  return err;
}

// ---------------------------------------------------------------------------
// Positional parallel writes — the ParallelGraphWriter analog: N threads
// pwrite disjoint row ranges of a reserved extent.
// ---------------------------------------------------------------------------
int jvtpu_pwrite_rows(const char* path, uint64_t base_offset,
                      const void* data, uint64_t row_bytes, int64_t n_rows,
                      int64_t start_row, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  int64_t per = (n_rows + n_threads - 1) / n_threads;
  std::vector<std::thread> ts;
  std::atomic<int> err{0};
  for (int t = 0; t < n_threads; ++t) {
    int64_t r0 = per * t;
    int64_t r1 = std::min<int64_t>(r0 + per, n_rows);
    if (r0 >= r1) break;
    ts.emplace_back([&, r0, r1]() {
      int fd = ::open(path, O_WRONLY);
      if (fd < 0) { err = -errno; return; }
      const char* src = (const char*)data + (uint64_t)r0 * row_bytes;
      uint64_t off = base_offset + (uint64_t)(start_row + r0) * row_bytes;
      uint64_t len = (uint64_t)(r1 - r0) * row_bytes;
      uint64_t done = 0;
      while (done < len) {
        ssize_t got = ::pwrite(fd, src + done, len - done, off + done);
        if (got <= 0) { err = -EIO; break; }
        done += got;
      }
      ::close(fd);
    });
  }
  for (auto& th : ts) th.join();
  return err;
}

// ---------------------------------------------------------------------------
// Async prefetch reader — double-buffered background chunk reads for
// streaming (LTM) builds; the MappedChunkReader/ReaderSupplier analog.
// ---------------------------------------------------------------------------
struct Prefetcher {
  int fd = -1;
  uint64_t chunk = 0;
  uint64_t pos = 0;
  uint64_t size = 0;
  int depth = 2;
  std::deque<std::pair<uint64_t, std::vector<char>>> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<int> err{0};

  void run() {
    uint64_t off = 0;
    while (!stop && off < size) {
      uint64_t len = std::min<uint64_t>(chunk, size - off);
      std::vector<char> buf(len);
      uint64_t done = 0;
      while (done < len) {
        ssize_t got = ::pread(fd, buf.data() + done, len - done, off + done);
        if (got <= 0) { err = -EIO; stop = true; break; }
        done += got;
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return (int)ready.size() < depth || stop; });
      if (stop) break;
      ready.emplace_back(off, std::move(buf));
      cv_ready.notify_one();
      off += len;
    }
    std::lock_guard<std::mutex> lk(mu);
    stop = true;
    cv_ready.notify_all();
  }
};

// Parallel row gather: out[i] = src[idx[i]] for row_bytes-sized rows.
// The host side of graph-row streaming (HostGraphIndex): one memcpy per
// expansion row out of a memmap, fanned across threads (page-cache reads
// parallelize well; numpy fancy indexing is single-threaded).
int jvtpu_gather_rows(const char* src, uint64_t row_bytes, const int32_t* idx,
                      int64_t n_idx, int64_t n_rows, char* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if ((int64_t)n_threads > n_idx) n_threads = (int)(n_idx > 0 ? n_idx : 1);
  std::vector<std::thread> ts;
  std::atomic<int> err{0};
  int64_t per = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t a = t * per, b = std::min<int64_t>(a + per, n_idx);
    if (a >= b) break;
    ts.emplace_back([=, &err] {
      for (int64_t i = a; i < b; ++i) {
        int64_t r = idx[i];
        if (r < 0 || r >= n_rows) {
          std::memset(out + i * row_bytes, 0, row_bytes);
        } else {
          std::memcpy(out + i * row_bytes, src + (uint64_t)r * row_bytes,
                      row_bytes);
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  return err.load();
}

void* jvtpu_prefetch_open(const char* path, uint64_t chunk_bytes, int depth) {
  auto* p = new Prefetcher();
  p->fd = ::open(path, O_RDONLY);
  if (p->fd < 0) { delete p; return nullptr; }
  int64_t s = file_size(path);
  p->size = s < 0 ? 0 : (uint64_t)s;
  p->chunk = chunk_bytes ? chunk_bytes : (8 << 20);
  p->depth = depth > 0 ? depth : 2;
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Returns bytes copied (0 at EOF), or negative error.
int64_t jvtpu_prefetch_next(void* h, void* dst, uint64_t cap) {
  auto* p = (Prefetcher*)h;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [&] { return !p->ready.empty() || p->stop; });
  if (p->err) return p->err;
  if (p->ready.empty()) return 0;  // EOF
  auto& front = p->ready.front();
  if (front.second.size() > cap) return -ENOMEM;
  std::memcpy(dst, front.second.data(), front.second.size());
  int64_t got = (int64_t)front.second.size();
  p->ready.pop_front();
  p->cv_space.notify_one();
  return got;
}

void jvtpu_prefetch_close(void* h) {
  auto* p = (Prefetcher*)h;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
    p->cv_space.notify_all();
    p->cv_ready.notify_all();
  }
  if (p->worker.joinable()) p->worker.join();
  if (p->fd >= 0) ::close(p->fd);
  delete p;
}

}  // extern "C"
