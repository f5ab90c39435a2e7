// straps_io: native host-side IO for the TPU training/inference pipeline.
//
// Role parity: the reference feeds its training loop through a torch
// DataLoader worker pool (reference run_train.py:31-32, native C++ inside
// torch) and loads per-image artefacts one by one in Python during
// prediction (predict/predict_3D.py:100-126). This library provides the
// TPU-native host runtime equivalent:
//   * zero-copy .npy memory-mapping (header parse + mmap)
//   * multithreaded batched loading of many .npy files into one contiguous
//     pinned-style host buffer (feeds jax.device_put directly)
//   * deterministic xorshift epoch shuffling
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (straps_tpu/data/native_io.py). Build: `make -C native`.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct NpyInfo {
  void* data;         // pointer to the first element (inside the mmap)
  void* map_base;     // mmap base (for munmap)
  int64_t map_len;    // mmap length
  int64_t num_elems;  // total element count
  int32_t word_size;  // bytes per element
  int32_t ndim;
  int64_t shape[8];
  char dtype_char;    // 'f' float, 'i' int, 'u' uint, 'b' bool
};

// Parse a v1.x/v2.x .npy header. Returns 0 on success.
static int parse_npy_header(const char* buf, int64_t len, NpyInfo* info,
                            int64_t* data_offset) {
  if (len < 10 || memcmp(buf, "\x93NUMPY", 6) != 0) return -1;
  const uint8_t major = static_cast<uint8_t>(buf[6]);
  int64_t header_len, header_off;
  if (major == 1) {
    header_len = static_cast<uint16_t>(
        static_cast<uint8_t>(buf[8]) | (static_cast<uint8_t>(buf[9]) << 8));
    header_off = 10;
  } else {
    uint32_t hl;
    memcpy(&hl, buf + 8, 4);
    header_len = hl;
    header_off = 12;
  }
  if (header_off + header_len > len) return -2;
  std::string header(buf + header_off, static_cast<size_t>(header_len));
  *data_offset = header_off + header_len;

  // descr: e.g. '<f4', '<i8', '|b1'
  size_t dp = header.find("'descr'");
  if (dp == std::string::npos) return -3;
  size_t q1 = header.find('\'', dp + 7);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr.size() < 3) return -3;
  if (descr[0] == '>') return -4;  // big-endian unsupported
  info->dtype_char = descr[1];
  info->word_size = atoi(descr.c_str() + 2);

  if (header.find("'fortran_order': True") != std::string::npos) return -5;

  size_t sp = header.find("'shape'");
  if (sp == std::string::npos) return -3;
  size_t p1 = header.find('(', sp);
  size_t p2 = header.find(')', p1);
  std::string shape_s = header.substr(p1 + 1, p2 - p1 - 1);
  info->ndim = 0;
  info->num_elems = 1;
  const char* s = shape_s.c_str();
  char* end = nullptr;
  while (*s) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    int64_t dim = strtoll(s, &end, 10);
    if (end == s) break;
    info->shape[info->ndim++] = dim;
    info->num_elems *= dim;
    s = end;
  }
  if (info->ndim == 0) {  // scalar
    info->shape[0] = 1;
    info->ndim = 1;
  }
  return 0;
}

// Memory-map an .npy file. Returns 0 on success.
int si_open_npy(const char* path, NpyInfo* info) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -10;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -11;
  }
  void* base = mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                    MAP_PRIVATE, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return -12;
  int64_t data_off = 0;
  int rc = parse_npy_header(static_cast<const char*>(base), st.st_size, info,
                            &data_off);
  if (rc != 0) {
    munmap(base, static_cast<size_t>(st.st_size));
    return rc;
  }
  info->map_base = base;
  info->map_len = st.st_size;
  info->data = static_cast<char*>(base) + data_off;
  return 0;
}

void si_close_npy(NpyInfo* info) {
  if (info->map_base) {
    munmap(info->map_base, static_cast<size_t>(info->map_len));
    info->map_base = nullptr;
    info->data = nullptr;
  }
}

// Load `n` same-shaped float32 .npy files into one contiguous batch buffer,
// parallelised over `threads` workers. paths: array of C strings. Returns 0
// on success, else the first error code encountered.
int si_load_batch_f32(const char** paths, int64_t n, float* out,
                      int64_t elems_per_item, int32_t threads) {
  if (threads < 1) threads = 1;
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      NpyInfo info{};
      int rc = si_open_npy(paths[i], &info);
      if (rc != 0) {
        err.store(rc);
        return;
      }
      if (info.num_elems != elems_per_item || info.word_size != 4 ||
          info.dtype_char != 'f') {
        si_close_npy(&info);
        err.store(-20);
        return;
      }
      memcpy(out + i * elems_per_item, info.data,
             static_cast<size_t>(elems_per_item) * 4);
      si_close_npy(&info);
    }
  };
  std::vector<std::thread> pool;
  const int tn = static_cast<int>(threads < n ? threads : n);
  pool.reserve(static_cast<size_t>(tn));
  for (int t = 0; t < tn; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return err.load();
}

// Deterministic Fisher-Yates shuffle of [0, n) with xorshift64* RNG.
void si_shuffled_indices(int64_t n, uint64_t seed, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = i;
  uint64_t x = seed ? seed : 0x9E3779B97F4A7C15ULL;
  for (int64_t i = n - 1; i > 0; --i) {
    x ^= x >> 12;
    x ^= x << 25;
    x ^= x >> 27;
    uint64_t r = x * 0x2545F4914F6CDD1DULL;
    int64_t j = static_cast<int64_t>(r % static_cast<uint64_t>(i + 1));
    int64_t tmp = out[i];
    out[i] = out[j];
    out[j] = tmp;
  }
}

}  // extern "C"
