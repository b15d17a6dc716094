// Native word2vec text-format parser for gulon_tpu.
//
// Role counterpart of the reference's hand-rolled single-pass line scanner
// (reference WordVectors.scala:162-197, `readFast`): the ingest hot loop.
// Re-designed as a native data-loader for the TPU pipeline: the file is
// memory-mapped, split at newline boundaries into per-thread byte ranges,
// and each range is scanned twice (count, then fill) so the output arrays
// are allocated exactly once and written in parallel with no locks.
//
// Exposed as a tiny C ABI consumed via ctypes (gulon_tpu/utils/native.py).
//
// Build: make -C native  (produces libgulonio.so)

#ifndef _GNU_SOURCE
#define _GNU_SOURCE 1  // memrchr
#endif

#include <atomic>
#include <cctype>
#include <cerrno>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct ChunkStats {
  int64_t rows = 0;
  int64_t key_bytes = 0;
  bool malformed = false;  // non-empty line without a space separator
};

struct Handle {
  // mmap state
  int fd = -1;
  const char* data = nullptr;
  size_t size = 0;
  // parse results
  int64_t rows = 0;
  int32_t dim = 0;
  std::vector<float> vectors;      // rows * dim (full-parse mode only)
  std::vector<char> keys;          // concatenated utf-8 bytes
  std::vector<int64_t> key_offsets;  // rows + 1
  // index mode: byte offset of each data row's line start (-1 = the
  // unterminated tail line, kept in `tail`); the mapping stays open so
  // vectors parse on demand in row ranges (streaming builds)
  std::vector<int64_t> line_begin;
  std::string tail;
  bool indexed = false;
  std::string error;
};

inline const char* find_newline(const char* p, const char* end) {
  const void* nl = memchr(p, '\n', static_cast<size_t>(end - p));
  return nl ? static_cast<const char*>(nl) : end;
}

// Header iff the first line is exactly two base-10 integers
// (reference WordVectors.scala:143-160).
bool sniff_header(const char* line, const char* end, int64_t* count,
                  int32_t* dim) {
  const char* p = line;
  char* q = nullptr;
  errno = 0;
  long long a = strtoll(p, &q, 10);
  if (q == p || errno) return false;
  p = q;
  if (p >= end || *p != ' ') return false;
  ++p;
  long long b = strtoll(p, &q, 10);
  if (q == p || errno) return false;
  // Only whitespace may remain.
  for (p = q; p < end; ++p)
    if (*p != ' ' && *p != '\r') return false;
  if (a <= 0 || b <= 0) return false;
  *count = a;
  *dim = static_cast<int32_t>(b);
  return true;
}

// True iff [p, nl) is blank (spaces/CR only).
inline bool is_blank_line(const char* p, const char* nl) {
  for (; p < nl; ++p)
    if (*p != ' ' && *p != '\r') return false;
  return true;
}

// Count rows and key bytes in [begin, end); every line here is
// '\n'-terminated (the caller splits off any unterminated tail line).
// Non-empty lines without a space separator are malformed (the Python
// reader raises for them too — silent row drops would be data loss).
ChunkStats scan_chunk(const char* begin, const char* end) {
  ChunkStats st;
  const char* p = begin;
  while (p < end) {
    const char* nl = find_newline(p, end);
    if (nl > p && !is_blank_line(p, nl)) {
      const void* sp = memchr(p, ' ', static_cast<size_t>(nl - p));
      if (sp) {
        st.rows += 1;
        st.key_bytes += static_cast<const char*>(sp) - p;
      } else {
        st.malformed = true;
      }
    }
    p = nl + 1;
  }
  return st;
}

// Parse rows in [begin, end) into the output arrays starting at row_base /
// key_base. Returns false (and sets *err_row) on malformed input.
bool parse_chunk(const char* begin, const char* end, int32_t dim,
                 float* vectors, char* keys, int64_t* key_offsets,
                 int64_t row_base, int64_t key_base, int64_t* err_row) {
  const char* p = begin;
  int64_t row = row_base;
  int64_t kb = key_base;
  while (p < end) {
    const char* nl = find_newline(p, end);
    if (nl > p && !is_blank_line(p, nl)) {
      const void* spv = memchr(p, ' ', static_cast<size_t>(nl - p));
      if (!spv) {  // scan pass already errors; defensive here
        *err_row = row;
        return false;
      }
      {
        const char* sp = static_cast<const char*>(spv);
        int64_t klen = sp - p;
        memcpy(keys + kb, p, static_cast<size_t>(klen));
        key_offsets[row] = kb;
        kb += klen;

        float* out = vectors + row * dim;
        const char* fp = sp;
        for (int32_t j = 0; j < dim; ++j) {
          char* q = nullptr;
          errno = 0;
          float v = strtof(fp, &q);
          if (q == fp || q > nl) {
            *err_row = row;
            return false;
          }
          out[j] = v;
          fp = q;
        }
        // Only whitespace may remain on the line.
        for (; fp < nl; ++fp) {
          if (*fp != ' ' && *fp != '\r') {
            *err_row = row;
            return false;
          }
        }
        ++row;
      }
    }
    p = nl + 1;
  }
  key_offsets[row] = kb;  // chunk-final offset; overwritten by next chunk's base
  return true;
}

// Index-mode fill: record keys and line-start offsets, skip the floats.
bool index_chunk(const char* base, const char* begin, const char* end,
                 char* keys, int64_t* key_offsets, int64_t* line_begin,
                 int64_t row_base, int64_t key_base) {
  const char* p = begin;
  int64_t row = row_base;
  int64_t kb = key_base;
  while (p < end) {
    const char* nl = find_newline(p, end);
    if (nl > p && !is_blank_line(p, nl)) {
      const void* spv = memchr(p, ' ', static_cast<size_t>(nl - p));
      if (!spv) return false;
      const char* sp = static_cast<const char*>(spv);
      int64_t klen = sp - p;
      memcpy(keys + kb, p, static_cast<size_t>(klen));
      key_offsets[row] = kb;
      kb += klen;
      line_begin[row] = p - base;
      ++row;
    }
    p = nl + 1;
  }
  key_offsets[row] = kb;
  return true;
}

void close_handle(Handle* h) {
  if (h->data) munmap(const_cast<char*>(h->data), h->size);
  if (h->fd >= 0) close(h->fd);
  h->data = nullptr;
  h->fd = -1;
}

// Parse the floats of one indexed row into `out` (dim values).
bool parse_row(const Handle* h, int64_t r, float* out) {
  const char* p;
  const char* nl;
  int64_t lb = h->line_begin[static_cast<size_t>(r)];
  if (lb >= 0) {
    p = h->data + lb;
    nl = find_newline(p, h->data + h->size);
  } else {
    p = h->tail.data();
    nl = p + h->tail.size() - 1;  // stored tail always ends in '\n'
  }
  const void* spv = memchr(p, ' ', static_cast<size_t>(nl - p));
  if (!spv) return false;
  const char* fp = static_cast<const char*>(spv);
  for (int32_t j = 0; j < h->dim; ++j) {
    char* q = nullptr;
    errno = 0;
    float v = strtof(fp, &q);
    if (q == fp || q > nl) return false;
    out[j] = v;
    fp = q;
  }
  for (; fp < nl; ++fp)
    if (*fp != ' ' && *fp != '\r') return false;
  return true;
}

Handle* do_open(const char* path, int32_t num_threads, bool index_only);

}  // namespace

extern "C" {

void* w2v_open(const char* path, int32_t num_threads) {
  return do_open(path, num_threads, false);
}

// Index mode: parse keys + per-row line offsets only; the mapping stays
// open and vectors parse on demand via w2v_parse_rows/w2v_parse_gather —
// the streaming-build loader (host RSS stays O(chunk), not O(corpus)).
void* w2v_open_index(const char* path, int32_t num_threads) {
  return do_open(path, num_threads, true);
}

// Parse rows [row_start, row_start+count) into out (count x dim f32).
// Returns -1 on success, -2 on bad arguments, else the failing row.
int64_t w2v_parse_rows(void* hv, int64_t row_start, int64_t count,
                       float* out, int32_t num_threads) {
  Handle* h = static_cast<Handle*>(hv);
  if (!h->indexed || row_start < 0 || count < 0 ||
      row_start + count > h->rows)
    return -2;
  int nt = num_threads > 0
               ? num_threads
               : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (count < 4096) nt = 1;
  std::atomic<int64_t> bad(-1);
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&, t] {
      int64_t lo = count * t / nt, hi = count * (t + 1) / nt;
      for (int64_t i = lo; i < hi; ++i) {
        if (!parse_row(h, row_start + i,
                       out + static_cast<size_t>(i) * h->dim)) {
          int64_t expect = -1;
          bad.compare_exchange_strong(expect, row_start + i);
          return;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  return bad.load() >= 0 ? bad.load() : -1;
}

// Parse arbitrary row ids (the training-sample path). Same returns.
int64_t w2v_parse_gather(void* hv, const int64_t* ids, int64_t count,
                         float* out, int32_t num_threads) {
  Handle* h = static_cast<Handle*>(hv);
  if (!h->indexed || count < 0) return -2;
  for (int64_t i = 0; i < count; ++i)
    if (ids[i] < 0 || ids[i] >= h->rows) return -2;
  int nt = num_threads > 0
               ? num_threads
               : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (count < 4096) nt = 1;
  std::atomic<int64_t> bad(-1);
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&, t] {
      int64_t lo = count * t / nt, hi = count * (t + 1) / nt;
      for (int64_t i = lo; i < hi; ++i) {
        if (!parse_row(h, ids[i], out + static_cast<size_t>(i) * h->dim)) {
          int64_t expect = -1;
          bad.compare_exchange_strong(expect, ids[i]);
          return;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  return bad.load() >= 0 ? bad.load() : -1;
}

}  // extern "C"

namespace {

Handle* do_open(const char* path, int32_t num_threads, bool index_only) {
  Handle* h = new Handle();
  h->fd = open(path, O_RDONLY);
  if (h->fd < 0) {
    h->error = std::string("cannot open ") + path + ": " + strerror(errno);
    return h;
  }
  struct stat st;
  if (fstat(h->fd, &st) != 0 || st.st_size == 0) {
    h->error = "empty or unreadable file";
    return h;
  }
  h->size = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, h->size, PROT_READ, MAP_PRIVATE, h->fd, 0);
  if (m == MAP_FAILED) {
    h->error = std::string("mmap failed: ") + strerror(errno);
    return h;
  }
  madvise(m, h->size, MADV_SEQUENTIAL);
  h->data = static_cast<const char*>(m);

  const char* file_end = h->data + h->size;

  // strtof/strtoll need their reads bounded by the mapping: only lines that
  // end in '\n' (so the parser always hits a terminator inside the map) are
  // parsed in place. An unterminated final line is copied into a
  // NUL-terminated buffer and handled separately.
  const char* last_nl = static_cast<const char*>(
      memrchr(h->data, '\n', h->size));
  std::string tail;
  const char* end;  // one past the last in-map '\n'
  if (last_nl == nullptr) {
    tail.assign(h->data, h->size);
    end = h->data;
  } else {
    end = last_nl + 1;
    if (end < file_end) tail.assign(end, static_cast<size_t>(file_end - end));
  }
  if (!tail.empty()) tail.push_back('\n');  // terminated, past-end-safe

  const char* body = h->data;
  const char* tail_begin = tail.empty() ? nullptr : tail.data();
  const char* tail_end = tail.empty() ? nullptr : tail.data() + tail.size();

  // Header sniff with pushback semantics (header line must be terminated
  // unless the file is a single unterminated line).
  int64_t declared = -1;
  if (body < end) {
    const char* first_nl = find_newline(body, end);
    if (sniff_header(body, first_nl, &declared, &h->dim)) {
      body = first_nl + 1;
    }
  } else if (tail_begin &&
             sniff_header(tail_begin, find_newline(tail_begin, tail_end),
                          &declared, &h->dim)) {
    tail.clear();
    tail_begin = tail_end = nullptr;
  }

  // Dimension from the first non-blank data line when there was no header.
  if (h->dim == 0) {
    const char* p = body;
    const char* nl = p;
    while (p < end) {  // skip blank lines (python reader parity)
      nl = find_newline(p, end);
      if (nl > p && !is_blank_line(p, nl)) break;
      p = nl + 1;
    }
    bool have_line = p < end;
    if (!have_line && tail_begin) {
      p = tail_begin;
      nl = find_newline(tail_begin, tail_end);
      have_line = !is_blank_line(p, nl);
    }
    const void* spv =
        have_line ? memchr(p, ' ', static_cast<size_t>(nl - p)) : nullptr;
    if (!spv) {
      h->error = "malformed first line: no space separator";
      return h;
    }
    int32_t d = 0;
    const char* fp = static_cast<const char*>(spv);
    while (fp < nl) {
      char* q = nullptr;
      strtof(fp, &q);
      if (q == fp) break;
      ++d;
      fp = q;
    }
    if (d == 0) {
      h->error = "malformed first line: no parseable floats";
      return h;
    }
    h->dim = d;
  }

  int nt = num_threads > 0 ? num_threads
                           : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  size_t body_size = body < end ? static_cast<size_t>(end - body) : 0;
  if (body_size < (1 << 20)) nt = 1;  // small file: threading not worth it

  // Split the body into nt byte ranges aligned to newline boundaries.
  std::vector<const char*> bounds(static_cast<size_t>(nt) + 1);
  bounds[0] = body;
  bounds[static_cast<size_t>(nt)] = end;
  for (int t = 1; t < nt; ++t) {
    const char* guess = body + body_size * static_cast<size_t>(t) / nt;
    if (guess >= end) {
      bounds[static_cast<size_t>(t)] = end;
    } else {
      const char* nl = find_newline(guess, end);
      bounds[static_cast<size_t>(t)] = nl < end ? nl + 1 : end;
    }
  }
  for (int t = 1; t <= nt; ++t)
    if (bounds[t] < bounds[t - 1]) bounds[t] = bounds[t - 1];

  // Pass 1: per-chunk row/key-byte counts.
  std::vector<ChunkStats> stats(static_cast<size_t>(nt));
  {
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t)
      threads.emplace_back([&, t] { stats[t] = scan_chunk(bounds[t], bounds[t + 1]); });
    for (auto& th : threads) th.join();
  }
  // Tail line (if any) contributes one more row.
  ChunkStats tail_stats;
  if (tail_begin) tail_stats = scan_chunk(tail_begin, tail_end);

  int64_t total_rows = 0, total_kb = 0;
  std::vector<int64_t> row_base(static_cast<size_t>(nt)), key_base(static_cast<size_t>(nt));
  bool malformed = tail_stats.malformed;
  for (int t = 0; t < nt; ++t) {
    row_base[t] = total_rows;
    key_base[t] = total_kb;
    total_rows += stats[t].rows;
    total_kb += stats[t].key_bytes;
    malformed |= stats[t].malformed;
  }
  if (malformed) {
    h->error = "malformed line: missing space separator";
    return h;
  }
  int64_t tail_row_base = total_rows;
  int64_t tail_key_base = total_kb;
  total_rows += tail_stats.rows;
  total_kb += tail_stats.key_bytes;
  if (total_rows == 0) {
    h->error = "no data rows";
    return h;
  }
  h->rows = total_rows;
  if (!index_only)
    h->vectors.resize(static_cast<size_t>(total_rows) * h->dim);
  else
    h->line_begin.assign(static_cast<size_t>(total_rows), -1);
  h->keys.resize(static_cast<size_t>(total_kb));
  h->key_offsets.assign(static_cast<size_t>(total_rows) + 1, 0);

  // Pass 2: parallel fill (floats + keys, or keys + line offsets).
  std::atomic<int64_t> bad_row(-1);
  {
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) {
      threads.emplace_back([&, t] {
        int64_t err_row = -1;
        bool ok;
        if (index_only) {
          ok = index_chunk(h->data, bounds[t], bounds[t + 1],
                           h->keys.data(), h->key_offsets.data(),
                           h->line_begin.data(), row_base[t], key_base[t]);
          err_row = row_base[t];
        } else {
          ok = parse_chunk(bounds[t], bounds[t + 1], h->dim,
                           h->vectors.data(), h->keys.data(),
                           h->key_offsets.data(), row_base[t], key_base[t],
                           &err_row);
        }
        if (!ok) {
          int64_t expect = -1;
          bad_row.compare_exchange_strong(expect, err_row);
        }
      });
    }
    for (auto& th : threads) th.join();
  }
  if (bad_row.load() >= 0) {
    h->error = "malformed line at data row " + std::to_string(bad_row.load());
    return h;
  }
  if (tail_begin && tail_stats.rows) {
    int64_t err_row = -1;
    bool ok;
    if (index_only) {
      ok = index_chunk(tail_begin, tail_begin, tail_end, h->keys.data(),
                       h->key_offsets.data(), h->line_begin.data(),
                       tail_row_base, tail_key_base);
      if (ok) h->line_begin[static_cast<size_t>(tail_row_base)] = -1;
      err_row = tail_row_base;
    } else {
      ok = parse_chunk(tail_begin, tail_end, h->dim, h->vectors.data(),
                       h->keys.data(), h->key_offsets.data(), tail_row_base,
                       tail_key_base, &err_row);
    }
    if (!ok) {
      h->error = "malformed line at data row " + std::to_string(err_row);
      return h;
    }
  }
  h->key_offsets[static_cast<size_t>(total_rows)] = total_kb;
  if (index_only) {
    h->indexed = true;
    h->tail = tail;  // the one possibly-unterminated final line
  } else {
    close_handle(h);  // parsed arrays live on; the mapping can go
  }
  return h;
}

}  // namespace

extern "C" {

const char* w2v_error(void* hv) {
  Handle* h = static_cast<Handle*>(hv);
  return h->error.empty() ? nullptr : h->error.c_str();
}

int64_t w2v_rows(void* hv) { return static_cast<Handle*>(hv)->rows; }
int32_t w2v_dim(void* hv) { return static_cast<Handle*>(hv)->dim; }
const float* w2v_vectors(void* hv) { return static_cast<Handle*>(hv)->vectors.data(); }
const char* w2v_keys(void* hv) { return static_cast<Handle*>(hv)->keys.data(); }
const int64_t* w2v_key_offsets(void* hv) {
  return static_cast<Handle*>(hv)->key_offsets.data();
}

void w2v_close(void* hv) {
  Handle* h = static_cast<Handle*>(hv);
  close_handle(h);
  delete h;
}

}  // extern "C"
