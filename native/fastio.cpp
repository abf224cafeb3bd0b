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
#include <limits>
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

// ---------------------------------------------------------------------------
// MAT v5 ("classic" MATLAB) parser — the EEG feature files.
//
// The reference ingests thousands of small per-subject .mat files
// (EEG_CODE/eeg_data_utils.py:46-119: conn_*.mat / powspctrm_*.mat) through
// scipy.io.loadmat, whose per-file Python overhead dominates at this file
// count exactly like pandas did for the fMRI CSVs. This parser reads the
// FIRST variable of a little-endian MAT v5 file — matching the loaders'
// `_first_mat_array` contract (data/loaders.py) — straight from the mmap
// into a caller float32 arena, inflating miCOMPRESSED variables with zlib.
// Anything it does not fully support (v7.3/HDF5 files, big-endian, sparse/
// struct/cell/char/complex first variable) returns a sentinel and the
// Python side falls back to scipy/h5py, so behavior never degrades.
//
// Values are written in file order (MATLAB column-major); the binding
// reshapes with order='F'. NaNs scrub to 0.0f (reference np.nan_to_num
// policy, same as the CSV path).

#include <zlib.h>

namespace {

// miTYPE codes (MAT v5 spec, table 1-1)
enum : uint32_t {
  miINT8 = 1, miUINT8 = 2, miINT16 = 3, miUINT16 = 4, miINT32 = 5,
  miUINT32 = 6, miSINGLE = 7, miDOUBLE = 9, miINT64 = 12, miUINT64 = 13,
  miMATRIX = 14, miCOMPRESSED = 15,
};

// mxCLASS codes (table 1-3); 6..15 are the numeric classes
enum : uint32_t { mxDOUBLE_CLASS = 6, mxUINT64_CLASS = 15 };

struct Elem {
  uint32_t type = 0;
  uint32_t nbytes = 0;
  const char* data = nullptr;  // nbytes of payload
  const char* next = nullptr;  // following element (8-byte aligned)
};

// Reads one data-element tag at p. Handles the small-element format
// (nbytes packed in the tag's upper 16 bits, payload in the same 8 bytes).
bool read_elem(const char* p, const char* end, Elem* e) {
  if (p + 8 > end) return false;
  uint32_t type_word, nbytes;
  memcpy(&type_word, p, 4);
  if (type_word >> 16) {  // small element
    e->type = type_word & 0xFFFF;
    e->nbytes = type_word >> 16;
    if (e->nbytes > 4) return false;
    e->data = p + 4;
    e->next = p + 8;
    return true;
  }
  memcpy(&nbytes, p + 4, 4);
  e->type = type_word;
  e->nbytes = nbytes;
  e->data = p + 8;
  size_t padded = (static_cast<size_t>(nbytes) + 7) & ~size_t{7};
  if (e->data + nbytes > end) return false;
  e->next = e->data + padded;
  if (e->next > end) e->next = end;  // final element may omit pad bytes
  return true;
}

// Converts n source values of miTYPE `type` to float32 with NaN→0 and
// ±Inf→±FLT_MAX — exactly np.nan_to_num on a float32 array, so a file
// parsed here agrees bit-for-bit with one handled by the scipy fallback
// (loaders._first_mat_array). Returns false on an unsupported source type.
bool convert_to_f32(uint32_t type, const char* src, size_t src_bytes,
                    float* out, int64_t max_elems, int64_t* n_out) {
  constexpr float kMax = std::numeric_limits<float>::max();
  auto emit = [&](auto get, size_t elem_size) {
    int64_t n = static_cast<int64_t>(src_bytes / elem_size);
    int64_t m = std::min(n, max_elems);
    for (int64_t i = 0; i < m; i++) {
      float v = get(src + i * elem_size);
      if (v != v) v = 0.0f;
      else if (v > kMax) v = kMax;
      else if (v < -kMax) v = -kMax;
      out[i] = v;
    }
    *n_out = n;
  };
  switch (type) {
    case miDOUBLE:
      emit([](const char* p) { double d; memcpy(&d, p, 8);
                               return static_cast<float>(d); }, 8);
      return true;
    case miSINGLE:
      emit([](const char* p) { float f; memcpy(&f, p, 4); return f; }, 4);
      return true;
    case miINT8:
      emit([](const char* p) { int8_t v; memcpy(&v, p, 1);
                               return static_cast<float>(v); }, 1);
      return true;
    case miUINT8:
      emit([](const char* p) { uint8_t v; memcpy(&v, p, 1);
                               return static_cast<float>(v); }, 1);
      return true;
    case miINT16:
      emit([](const char* p) { int16_t v; memcpy(&v, p, 2);
                               return static_cast<float>(v); }, 2);
      return true;
    case miUINT16:
      emit([](const char* p) { uint16_t v; memcpy(&v, p, 2);
                               return static_cast<float>(v); }, 2);
      return true;
    case miINT32:
      emit([](const char* p) { int32_t v; memcpy(&v, p, 4);
                               return static_cast<float>(v); }, 4);
      return true;
    case miUINT32:
      emit([](const char* p) { uint32_t v; memcpy(&v, p, 4);
                               return static_cast<float>(v); }, 4);
      return true;
    case miINT64:
      emit([](const char* p) { int64_t v; memcpy(&v, p, 8);
                               return static_cast<float>(v); }, 8);
      return true;
    case miUINT64:
      emit([](const char* p) { uint64_t v; memcpy(&v, p, 8);
                               return static_cast<float>(v); }, 8);
      return true;
    default:
      return false;
  }
}

// Parses one miMATRIX payload. Returns elements written (truncated at
// max_elems → negative count), or -2 when the matrix class is unsupported
// (sparse/cell/struct/char/complex) so the caller can fall back to scipy.
int64_t parse_matrix(const char* p, const char* end, float* out,
                     int64_t max_elems, int64_t* dims, int64_t max_dims,
                     int64_t* ndims_out) {
  Elem flags, dim_el, name_el, data_el;
  if (!read_elem(p, end, &flags) || flags.type != miUINT32 ||
      flags.nbytes < 8)
    return -2;
  uint32_t flags_word;
  memcpy(&flags_word, flags.data, 4);
  uint32_t cls = flags_word & 0xFF;
  bool is_complex = (flags_word & 0x0800) != 0;
  if (cls < mxDOUBLE_CLASS || cls > mxUINT64_CLASS || is_complex) return -2;

  if (!read_elem(flags.next, end, &dim_el) || dim_el.type != miINT32)
    return -2;
  int64_t ndims = dim_el.nbytes / 4;
  *ndims_out = ndims;
  if (ndims > max_dims) return -2;
  int64_t total = 1;
  for (int64_t i = 0; i < ndims; i++) {
    int32_t d;
    memcpy(&d, dim_el.data + i * 4, 4);
    dims[i] = d;
    total *= d;
  }
  if (!read_elem(dim_el.next, end, &name_el))  // array name: skip
    return -2;
  if (!read_elem(name_el.next, end, &data_el))  // pr (real part)
    return -2;
  int64_t n = 0;
  if (!convert_to_f32(data_el.type, data_el.data, data_el.nbytes, out,
                      max_elems, &n))
    return -2;
  if (n != total) return -2;  // storage-compression mismatch we don't expect
  return n <= max_elems ? n : -n;
}

// Finds and parses the FIRST variable (top-level miMATRIX, inflating
// miCOMPRESSED wrappers) of a MAT v5 buffer.
int64_t parse_mat_buffer(const char* buf, size_t n, float* out,
                         int64_t max_elems, int64_t* dims, int64_t max_dims,
                         int64_t* ndims_out) {
  if (n < 128 + 8) return -1;
  if (memcmp(buf, "MATLAB 5.0", 10) != 0) return -2;  // v7.3 is HDF5
  if (!(buf[126] == 'I' && buf[127] == 'M')) return -2;  // big-endian file
  const char* p = buf + 128;
  const char* end = buf + n;
  while (p + 8 <= end) {
    Elem e;
    if (!read_elem(p, end, &e)) return -2;
    if (e.type == miMATRIX) {
      return parse_matrix(e.data, e.data + e.nbytes, out, max_elems, dims,
                          max_dims, ndims_out);
    }
    if (e.type == miCOMPRESSED) {
      // Inflate, then the inflated stream is exactly one element.
      std::vector<char> inflated(static_cast<size_t>(e.nbytes) * 4 + 1024);
      z_stream zs;
      memset(&zs, 0, sizeof(zs));
      if (inflateInit(&zs) != Z_OK) return -2;
      zs.next_in =
          reinterpret_cast<Bytef*>(const_cast<char*>(e.data));
      zs.avail_in = e.nbytes;
      int rc;
      for (;;) {
        zs.next_out = reinterpret_cast<Bytef*>(inflated.data()) +
                      zs.total_out;
        zs.avail_out = static_cast<uInt>(inflated.size() - zs.total_out);
        rc = inflate(&zs, Z_NO_FLUSH);
        if (rc == Z_STREAM_END) break;
        if (rc != Z_OK) { inflateEnd(&zs); return -2; }
        if (zs.avail_out == 0) inflated.resize(inflated.size() * 2);
      }
      size_t out_len = zs.total_out;
      inflateEnd(&zs);
      Elem inner;
      if (!read_elem(inflated.data(), inflated.data() + out_len, &inner))
        return -2;
      if (inner.type == miMATRIX) {
        return parse_matrix(inner.data, inner.data + inner.nbytes, out,
                            max_elems, dims, max_dims, ndims_out);
      }
      // Not a matrix (rare): treat as "first variable unsupported".
      return -2;
    }
    p = e.next;  // skip non-variable element
  }
  return -2;  // no variable found
}

}  // namespace

extern "C" {

// Bumped whenever any exported signature changes (e.g. the round-4
// fio_read_mat_batch stride→offsets change). data/native_io.py refuses a
// library whose version doesn't match its own constant, so a stale
// pre-change .so can never be called through post-change argtypes.
int64_t fio_abi_version(void) { return 2; }

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

// Read the first variable of a classic little-endian MAT v5 file into out
// (float32, file/column-major order, NaN→0). dims[0..max_dims) and *ndims
// receive the MATLAB shape. Returns elements written, negative count on
// arena overflow, -1 on open failure, -2 on unsupported format/content
// (v7.3 HDF5, big-endian, sparse/struct/cell/char/complex first variable)
// — the binding falls back to scipy/h5py on any negative return.
int64_t fio_read_mat(const char* path, float* out, int64_t max_elems,
                     int64_t* dims, int64_t max_dims, int64_t* ndims) {
  MappedFile mf;
  if (!mf.open(path)) return -1;
  return parse_mat_buffer(mf.data, mf.size, out, max_elems, dims, max_dims,
                          ndims);
}

// Batch form: n_files MAT files on a thread pool, file i into the arena
// slice out + i*stride. elems[i] receives fio_read_mat's return for file i;
// dims is n_files × max_dims. Returns files parsed OK.
// `offsets` has n_files+1 entries: file i writes float32 elements into
// out[offsets[i] : offsets[i+1]] (per-file capacity — slices are sized
// from each file's own byte count, not the batch maximum, so one big
// file among thousands of small ones no longer inflates the whole arena;
// oversized idle arenas stall on first-touch page faults on this host).
int64_t fio_read_mat_batch(const char** paths, int64_t n_files, float* out,
                           const int64_t* offsets, int64_t* elems,
                           int64_t* dims, int64_t max_dims, int64_t* ndims,
                           int64_t n_threads) {
  std::atomic<int64_t> next(0), ok(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_files) return;
      elems[i] = fio_read_mat(paths[i], out + offsets[i],
                              offsets[i + 1] - offsets[i],
                              dims + i * max_dims, max_dims, &ndims[i]);
      if (elems[i] >= 0) ok.fetch_add(1);
    }
  };
  // Same rationale as fio_read_csv_batch: never parse on the ctypes thread.
  int64_t hw = static_cast<int64_t>(std::thread::hardware_concurrency());
  int64_t t = std::max<int64_t>(2, std::min<int64_t>(n_threads, hw));
  std::vector<std::thread> pool;
  pool.reserve(static_cast<size_t>(t));
  for (int64_t i = 0; i < t; i++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

}  // extern "C"
