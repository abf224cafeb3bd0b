// fastio — native host-IO runtime for the data layer.
//
// The reference's data layer is pandas/scipy loops over hundreds of small
// per-subject CSV/.mat files (fMRI_CODE/run_fmri_v11.py:81-155 reads one CSV
// per subject x type with pandas; EEG loaders glob thousands of .mat files).
// pandas' per-file overhead (~ms each) dominates ingest. This library gives
// the framework a native ingest path: mmap'd zero-copy file reads, a tight
// strtof CSV parser, and a std::thread pool that parses many files into one
// caller-owned float32 arena in parallel. Python binds via ctypes
// (multimodal_eeg_fmri_tpu/data/native_io.py); everything degrades to the
// numpy path when the shared library is unavailable.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;      // file bytes
  size_t map_len = 0;   // mapped bytes (>= size + 1)
  int fd = -1;

  // Maps the file read-only with a guaranteed NUL byte after the data, so
  // strtof on a numeric field that runs to the last byte never reads past
  // the mapping. When the file size is not a page multiple, the kernel
  // zero-fills the tail of the last page; when it IS a page multiple, we
  // reserve one extra anonymous zero page and map the file over the front.
  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
      ::close(fd);
      fd = -1;
      return false;
    }
    size = static_cast<size_t>(st.st_size);
    const size_t page = static_cast<size_t>(sysconf(_SC_PAGESIZE));
    if (size % page == 0) {
      map_len = size + page;
      void* base = mmap(nullptr, map_len, PROT_READ,
                        MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
      if (base == MAP_FAILED) {
        ::close(fd);
        fd = -1;
        return false;
      }
      void* p = mmap(base, size, PROT_READ, MAP_PRIVATE | MAP_FIXED, fd, 0);
      if (p == MAP_FAILED) {
        munmap(base, map_len);
        ::close(fd);
        fd = -1;
        return false;
      }
      data = static_cast<const char*>(base);
    } else {
      map_len = size;
      void* p = mmap(nullptr, map_len, PROT_READ, MAP_PRIVATE, fd, 0);
      if (p == MAP_FAILED) {
        ::close(fd);
        fd = -1;
        return false;
      }
      data = static_cast<const char*>(p);
    }
    return true;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<char*>(data), map_len);
    if (fd >= 0) ::close(fd);
  }
};

// Parse one CSV buffer of floats into out (row-major), skipping a header
// row when its first field is not numeric. Non-numeric / empty fields
// (including NaN text) become 0.0f — matching the reference's
// np.nan_to_num ingest policy. Returns rows parsed; *cols gets the column
// count of the first data row.
int64_t parse_csv(const char* buf, size_t n, float* out, int64_t max_elems,
                  int64_t* cols_out, int skip_header) {
  size_t i = 0;
  int64_t rows = 0, cols = -1, written = 0;

  auto skip_line = [&]() {
    while (i < n && buf[i] != '\n') i++;
    if (i < n) i++;
  };

  if (skip_header > 0) {
    // pandas semantics: row 0 is always the header
    skip_line();
  } else if (skip_header == 0) {
    // auto: skip when the first field is not numeric-ish
    size_t j = i;
    while (j < n && (buf[j] == ' ' || buf[j] == '"')) j++;
    if (j < n &&
        !(isdigit(static_cast<unsigned char>(buf[j])) || buf[j] == '-' ||
          buf[j] == '+' || buf[j] == '.')) {
      skip_line();
    }
  }

  while (i < n) {
    if (buf[i] == '\n') {
      i++;
      continue;
    }
    int64_t row_cols = 0;
    while (i < n && buf[i] != '\n') {
      // one field
      char* end = nullptr;
      errno = 0;
      float v = strtof(buf + i, &end);
      if (end == buf + i) {
        // non-numeric field -> 0.0 (NaN scrub policy)
        v = 0.0f;
        while (i < n && buf[i] != ',' && buf[i] != '\n') i++;
      } else {
        if (v != v) v = 0.0f;  // NaN -> 0
        i = static_cast<size_t>(end - buf);
      }
      if (written < max_elems) out[written] = v;
      written++;
      row_cols++;
      if (i < n && buf[i] == ',') i++;
      while (i < n && (buf[i] == ' ' || buf[i] == '\r')) i++;
    }
    if (i < n) i++;  // consume newline
    if (row_cols > 0) {
      if (cols < 0) cols = row_cols;
      rows++;
    }
  }
  *cols_out = cols < 0 ? 0 : cols;
  return written <= max_elems ? rows : -rows;  // negative = truncated
}

}  // namespace

extern "C" {

// Read a raw float32 binary file into out. Returns elements read, or -1.
int64_t fio_read_f32(const char* path, float* out, int64_t max_elems) {
  MappedFile mf;
  if (!mf.open(path)) return -1;
  int64_t elems =
      std::min<int64_t>(max_elems, static_cast<int64_t>(mf.size / 4));
  memcpy(out, mf.data, static_cast<size_t>(elems) * 4);
  return elems;
}

// Parse one CSV of floats. Returns rows (negative if arena overflow);
// *cols receives the column count.
int64_t fio_read_csv(const char* path, float* out, int64_t max_elems,
                     int64_t* cols, int skip_header) {
  MappedFile mf;
  if (!mf.open(path)) return -1;
  return parse_csv(mf.data, mf.size, out, max_elems, cols, skip_header);
}

// Parse n_files CSVs in parallel with n_threads workers. Each file i gets
// the arena slice out + i*stride (stride floats). rows[i]/cols[i] receive
// per-file shapes (rows -1 on open failure). Returns files parsed OK.
int64_t fio_read_csv_batch(const char** paths, int64_t n_files, float* out,
                           int64_t stride, int64_t* rows, int64_t* cols,
                           int64_t n_threads, int skip_header) {
  std::atomic<int64_t> next(0), ok(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_files) return;
      MappedFile mf;
      if (!mf.open(paths[i])) {
        rows[i] = -1;
        cols[i] = 0;
        continue;
      }
      rows[i] = parse_csv(mf.data, mf.size, out + i * stride, stride,
                          &cols[i], skip_header);
      if (rows[i] >= 0) ok.fetch_add(1);
    }
  };
  // Always hand the work to spawned threads: running long loops on the
  // ctypes-calling thread is pathologically slow under some sandboxed
  // Python runtimes (observed 100x here), while worker threads run at
  // full speed. At least 2 workers even on 1-CPU hosts.
  int64_t hw = static_cast<int64_t>(std::thread::hardware_concurrency());
  int64_t t = std::max<int64_t>(2, std::min<int64_t>(n_threads, hw));
  std::vector<std::thread> pool;
  pool.reserve(static_cast<size_t>(t));
  for (int64_t i = 0; i < t; i++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

}  // extern "C"
