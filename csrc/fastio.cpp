// Native multithreaded binary row reader for wholegraph_tpu.
//
// TPU-native equivalent of the reference's multi-threaded / O_DIRECT file
// loaders (reference: cpp/src/wholememory/file_io.cpp —
// read_file_list_to_local_memory_with_multi_threads :413,676 and the
// _directio variants :883,1121).  Reads a global row range [lo, hi) spanning
// an ordered list of binary files into a caller buffer, splitting the byte
// range across POSIX threads with pread(2).
//
// Exposed as a tiny C ABI consumed via ctypes (wholegraph_tpu/io/native.py).

#ifndef _GNU_SOURCE
#define _GNU_SOURCE 1  // O_DIRECT
#endif

#include <algorithm>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <thread>
#include <unistd.h>
#include <vector>

#include <cstdlib>

namespace {

struct FileSpan {
  int fd;
  int64_t file_row_start;  // global row index of this file's first row
  int64_t rows;            // rows in this file
  bool direct;             // fd opened with O_DIRECT
};

constexpr int64_t kDirectAlign = 4096;        // covers 512B and 4K sectors
constexpr int64_t kDirectChunk = 4 << 20;     // bounce-buffer size

// O_DIRECT pread with arbitrary offset/length through an aligned bounce
// buffer (the reference's _directio read path, file_io.cpp:883, reads
// block-aligned suffixes the same way).
int pread_direct(int fd, unsigned char* dst, int64_t bytes, int64_t off,
                 unsigned char* bounce) {
  while (bytes > 0) {
    int64_t aoff = off & ~(kDirectAlign - 1);
    int64_t lead = off - aoff;
    int64_t want = std::min(bytes + lead, kDirectChunk);
    // O_DIRECT requires length alignment too; reading past EOF returns the
    // short actual count, which is fine.
    int64_t alen = (want + kDirectAlign - 1) & ~(kDirectAlign - 1);
    ssize_t got = pread(fd, bounce, static_cast<size_t>(alen), aoff);
    if (got < 0) {
      if (errno == EINTR) continue;
      return errno;
    }
    if (got <= lead) return EIO;  // unexpected EOF
    int64_t usable = std::min(got - lead, bytes);
    std::memcpy(dst, bounce + lead, static_cast<size_t>(usable));
    dst += usable;
    off += usable;
    bytes -= usable;
  }
  return 0;
}

// Read rows [lo, hi) (global numbering over the file list) into out.
// Returns 0 on success, errno-style code on failure.
int read_range(const std::vector<FileSpan>& files, int64_t entry_size,
               int64_t lo, int64_t hi, unsigned char* out) {
  int64_t out_off = 0;
  unsigned char* bounce = nullptr;
  for (const auto& f : files) {
    int64_t fbeg = f.file_row_start;
    int64_t fend = f.file_row_start + f.rows;
    if (fend <= lo || fbeg >= hi) continue;
    int64_t r0 = std::max(lo, fbeg) - fbeg;
    int64_t r1 = std::min(hi, fend) - fbeg;
    int64_t bytes = (r1 - r0) * entry_size;
    int64_t foff = r0 * entry_size;
    unsigned char* dst = out + out_off;
    if (f.direct) {
      if (bounce == nullptr) {
        void* p = nullptr;
        if (posix_memalign(&p, kDirectAlign, kDirectChunk) != 0) return ENOMEM;
        bounce = static_cast<unsigned char*>(p);
      }
      int rc = pread_direct(f.fd, dst, bytes, foff, bounce);
      if (rc != 0) {
        free(bounce);
        return rc;
      }
      out_off += bytes;
      continue;
    }
    while (bytes > 0) {
      ssize_t got = pread(f.fd, dst, static_cast<size_t>(bytes), foff);
      if (got < 0) {
        if (errno == EINTR) continue;
        if (bounce) free(bounce);
        return errno;
      }
      if (got == 0) {
        if (bounce) free(bounce);
        return EIO;  // unexpected EOF
      }
      dst += got;
      foff += got;
      bytes -= got;
      out_off += got;
    }
  }
  if (bounce) free(bounce);
  return 0;
}

}  // namespace

extern "C" {

// paths: nfiles NUL-terminated strings; file_starts: nfiles+1 cumulative row
// counts; reads global rows [lo, hi) into out using up to nthreads threads.
// use_direct != 0 opens with O_DIRECT (page-cache bypass for cold bulk
// loads, the reference's _directio variants file_io.cpp:883,1121), falling
// back per file to buffered IO where the filesystem refuses it (tmpfs).
int wgtpu_read_rows_v2(const char** paths, int nfiles,
                       const int64_t* file_starts, int64_t entry_size,
                       int64_t lo, int64_t hi, unsigned char* out,
                       int nthreads, int use_direct) {
  if (lo >= hi) return 0;
  std::vector<FileSpan> files;
  files.reserve(nfiles);
  for (int i = 0; i < nfiles; ++i) {
    if (file_starts[i + 1] <= lo || file_starts[i] >= hi) continue;
    bool direct = use_direct != 0;
    int fd = -1;
    if (direct) {
      fd = open(paths[i], O_RDONLY | O_DIRECT);
      if (fd < 0) direct = false;  // e.g. EINVAL on tmpfs: fall back
    }
    if (fd < 0) fd = open(paths[i], O_RDONLY);
    if (fd < 0) {
      for (auto& f : files) close(f.fd);
      return errno;
    }
    files.push_back({fd, file_starts[i], file_starts[i + 1] - file_starts[i],
                     direct});
  }

  int64_t total_rows = hi - lo;
  if (nthreads < 1) nthreads = 1;
  int64_t rows_per_thread = (total_rows + nthreads - 1) / nthreads;
  std::vector<std::thread> threads;
  std::vector<int> rcs(nthreads, 0);
  for (int t = 0; t < nthreads; ++t) {
    int64_t tlo = lo + t * rows_per_thread;
    int64_t thi = std::min(hi, tlo + rows_per_thread);
    if (tlo >= thi) break;
    unsigned char* tout = out + (tlo - lo) * entry_size;
    threads.emplace_back([&files, entry_size, tlo, thi, tout, &rcs, t]() {
      rcs[t] = read_range(files, entry_size, tlo, thi, tout);
    });
  }
  for (auto& th : threads) th.join();
  for (auto& f : files) close(f.fd);
  for (int rc : rcs)
    if (rc != 0) return rc;
  return 0;
}

// Back-compat entry point: buffered reads.
int wgtpu_read_rows(const char** paths, int nfiles, const int64_t* file_starts,
                    int64_t entry_size, int64_t lo, int64_t hi,
                    unsigned char* out, int nthreads) {
  return wgtpu_read_rows_v2(paths, nfiles, file_starts, entry_size, lo, hi,
                            out, nthreads, 0);
}

// Write a buffer to a file (store_to_file analog,
// reference file_io.cpp store path): pre-sized with ftruncate, byte range
// split across POSIX threads with pwrite(2) — the multithread-write twin of
// wgtpu_read_rows.
int wgtpu_write_rows(const char* path, const unsigned char* data,
                     int64_t nbytes, int nthreads) {
  int fd = open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return errno;
  if (ftruncate(fd, nbytes) != 0) {
    int e = errno;
    close(fd);
    return e;
  }
  if (nthreads < 1) nthreads = 1;
  int64_t per = (nbytes + nthreads - 1) / nthreads;
  std::vector<std::thread> threads;
  std::vector<int> rcs(nthreads, 0);
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * per;
    int64_t hi = std::min(nbytes, lo + per);
    if (lo >= hi) break;
    threads.emplace_back([fd, data, lo, hi, &rcs, t]() {
      const unsigned char* src = data + lo;
      int64_t off = lo;
      int64_t left = hi - lo;
      while (left > 0) {
        ssize_t put = pwrite(fd, src, static_cast<size_t>(left), off);
        if (put < 0) {
          if (errno == EINTR) continue;
          rcs[t] = errno;
          return;
        }
        src += put;
        off += put;
        left -= put;
      }
    });
  }
  for (auto& th : threads) th.join();
  close(fd);
  for (int rc : rcs)
    if (rc != 0) return rc;
  return 0;
}

}  // extern "C"
