// Native checkpoint IO runtime: zero-copy mmap safetensors reader + writer.
//
// TPU-native replacement for the runtime IO layer around the compute path
// (the reference delegates model IO to HF save_pretrained/safetensors python,
// /root/reference/ResNet/utils.py:28-38, testing_suite/utils.py:80-95).
// Reading a checkpoint here costs one mmap + a header parse; tensor data is
// served as zero-copy pointers into the mapping (numpy wraps them without
// materialising 45MB+ of copies per ResNet checkpoint, and page-cache-warm
// re-reads during eval sweeps are free).
//
// C ABI (ctypes-consumed from wavelettransforms_tpu/runtime/native.py):
//   wtt_st_open / wtt_st_count / wtt_st_name / wtt_st_info / wtt_st_data /
//   wtt_st_close / wtt_st_write / wtt_st_last_error
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

thread_local std::string g_error;

void set_error(const std::string &msg) { g_error = msg; }

// ---------------------------------------------------------------------------
// Minimal JSON parser (enough for safetensors headers: objects, arrays,
// strings, integers).
// ---------------------------------------------------------------------------
struct JsonParser {
  const char *p;
  const char *end;
  bool ok = true;

  explicit JsonParser(const char *data, size_t len)
      : p(data), end(data + len) {}

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) {
      ++p;
      return true;
    }
    ok = false;
    return false;
  }
  bool peek(char c) {
    skip_ws();
    return p < end && *p == c;
  }
  std::string parse_string() {
    skip_ws();
    std::string out;
    if (!consume('"')) return out;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        ++p;
        switch (*p) {
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          case 'r': out += '\r'; break;
          case 'u': {  // \uXXXX — keep ascii subset, skip others
            if (p + 4 < end) {
              unsigned v = 0;
              sscanf(p + 1, "%4x", &v);
              if (v < 128) out += static_cast<char>(v);
              p += 4;
            }
            break;
          }
          default: out += *p;
        }
      } else {
        out += *p;
      }
      ++p;
    }
    consume('"');
    return out;
  }
  int64_t parse_int() {
    skip_ws();
    bool neg = false;
    if (p < end && (*p == '-')) { neg = true; ++p; }
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    // swallow a fractional/exponent part if present (not expected)
    while (p < end && (*p == '.' || *p == 'e' || *p == 'E' || *p == '+' ||
                       *p == '-' || (*p >= '0' && *p <= '9')))
      ++p;
    return neg ? -v : v;
  }
  void skip_value();  // fwd
  void skip_object() {
    consume('{');
    skip_ws();
    if (peek('}')) { consume('}'); return; }
    while (ok) {
      parse_string();
      consume(':');
      skip_value();
      skip_ws();
      if (peek(',')) { consume(','); continue; }
      break;
    }
    consume('}');
  }
  void skip_array() {
    consume('[');
    skip_ws();
    if (peek(']')) { consume(']'); return; }
    while (ok) {
      skip_value();
      if (peek(',')) { consume(','); continue; }
      break;
    }
    consume(']');
  }
};

void JsonParser::skip_value() {
  skip_ws();
  if (p >= end) { ok = false; return; }
  switch (*p) {
    case '"': parse_string(); break;
    case '{': skip_object(); break;
    case '[': skip_array(); break;
    case 't': p += 4; break;   // true
    case 'f': p += 5; break;   // false
    case 'n': p += 4; break;   // null
    default: parse_int(); break;
  }
}

// ---------------------------------------------------------------------------
// Handle
// ---------------------------------------------------------------------------
struct TensorEntry {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  int64_t begin = 0;  // relative to data section
  int64_t end = 0;
};

struct StFile {
  int fd = -1;
  void *map = MAP_FAILED;
  size_t map_len = 0;
  size_t data_off = 0;  // byte offset of the data section
  std::vector<TensorEntry> tensors;

  ~StFile() {
    if (map != MAP_FAILED) munmap(map, map_len);
    if (fd >= 0) close(fd);
  }
  const TensorEntry *find(const char *name) const {
    for (const auto &t : tensors)
      if (t.name == name) return &t;
    return nullptr;
  }
};

}  // namespace

extern "C" {

const char *wtt_st_last_error() { return g_error.c_str(); }

void *wtt_st_open(const char *path) {
  auto f = new StFile();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) {
    set_error(std::string("open failed: ") + path);
    delete f;
    return nullptr;
  }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) {
    set_error("stat failed or file too small");
    delete f;
    return nullptr;
  }
  f->map_len = static_cast<size_t>(st.st_size);
  f->map = mmap(nullptr, f->map_len, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (f->map == MAP_FAILED) {
    set_error("mmap failed");
    delete f;
    return nullptr;
  }
  const auto *base = static_cast<const unsigned char *>(f->map);
  uint64_t header_len = 0;
  memcpy(&header_len, base, 8);  // little-endian hosts only
  if (8 + header_len > f->map_len) {
    set_error("corrupt header length");
    delete f;
    return nullptr;
  }
  f->data_off = 8 + header_len;

  JsonParser jp(reinterpret_cast<const char *>(base + 8), header_len);
  jp.consume('{');
  jp.skip_ws();
  if (!jp.peek('}')) {
    while (jp.ok) {
      std::string name = jp.parse_string();
      jp.consume(':');
      if (name == "__metadata__") {
        jp.skip_object();
      } else {
        TensorEntry t;
        t.name = name;
        jp.consume('{');
        while (jp.ok) {
          std::string key = jp.parse_string();
          jp.consume(':');
          if (key == "dtype") {
            t.dtype = jp.parse_string();
          } else if (key == "shape") {
            jp.consume('[');
            jp.skip_ws();
            if (!jp.peek(']')) {
              while (jp.ok) {
                t.shape.push_back(jp.parse_int());
                if (jp.peek(',')) { jp.consume(','); continue; }
                break;
              }
            }
            jp.consume(']');
          } else if (key == "data_offsets") {
            jp.consume('[');
            t.begin = jp.parse_int();
            jp.consume(',');
            t.end = jp.parse_int();
            jp.consume(']');
          } else {
            jp.skip_value();
          }
          if (jp.peek(',')) { jp.consume(','); continue; }
          break;
        }
        jp.consume('}');
        if (f->data_off + static_cast<size_t>(t.end) > f->map_len) {
          set_error("tensor " + t.name + " extends past end of file");
          delete f;
          return nullptr;
        }
        f->tensors.push_back(std::move(t));
      }
      if (jp.peek(',')) { jp.consume(','); continue; }
      break;
    }
  }
  jp.consume('}');
  if (!jp.ok) {
    set_error("header parse error");
    delete f;
    return nullptr;
  }
  return f;
}

long wtt_st_count(void *h) {
  return static_cast<long>(static_cast<StFile *>(h)->tensors.size());
}

const char *wtt_st_name(void *h, long i) {
  auto *f = static_cast<StFile *>(h);
  if (i < 0 || i >= static_cast<long>(f->tensors.size())) return nullptr;
  return f->tensors[i].name.c_str();
}

// dtype_out: >=16 bytes; shape_out: >=8 entries.
int wtt_st_info(void *h, const char *name, char *dtype_out, long *shape_out,
                int *ndim_out, long *nbytes_out) {
  auto *f = static_cast<StFile *>(h);
  const TensorEntry *t = f->find(name);
  if (!t) {
    set_error(std::string("no tensor named ") + name);
    return -1;
  }
  snprintf(dtype_out, 16, "%s", t->dtype.c_str());
  *ndim_out = static_cast<int>(t->shape.size());
  for (size_t i = 0; i < t->shape.size() && i < 8; ++i)
    shape_out[i] = static_cast<long>(t->shape[i]);
  *nbytes_out = static_cast<long>(t->end - t->begin);
  return 0;
}

const void *wtt_st_data(void *h, const char *name) {
  auto *f = static_cast<StFile *>(h);
  const TensorEntry *t = f->find(name);
  if (!t) {
    set_error(std::string("no tensor named ") + name);
    return nullptr;
  }
  return static_cast<const unsigned char *>(f->map) + f->data_off + t->begin;
}

void wtt_st_close(void *h) { delete static_cast<StFile *>(h); }

// ---------------------------------------------------------------------------
// Writer: one call with parallel-arrays of tensor descriptors.
// dtypes: e.g. "F32"; shapes: flattened with ndims[]; datas: raw pointers.
// ---------------------------------------------------------------------------
int wtt_st_write(const char *path, long n, const char **names,
                 const char **dtypes, const long *shapes, const int *ndims,
                 const void **datas, const long *nbytes) {
  std::string header = "{";
  int64_t off = 0;
  long shape_cursor = 0;
  for (long i = 0; i < n; ++i) {
    if (i) header += ",";
    header += "\"";
    header += names[i];
    header += "\":{\"dtype\":\"";
    header += dtypes[i];
    header += "\",\"shape\":[";
    for (int d = 0; d < ndims[i]; ++d) {
      if (d) header += ",";
      header += std::to_string(shapes[shape_cursor + d]);
    }
    shape_cursor += ndims[i];
    header += "],\"data_offsets\":[";
    header += std::to_string(off);
    header += ",";
    header += std::to_string(off + nbytes[i]);
    header += "]}";
    off += nbytes[i];
  }
  header += "}";
  // pad header to 8-byte multiple with spaces (safetensors convention)
  while (header.size() % 8 != 0) header += ' ';

  int fd = open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) {
    set_error(std::string("open for write failed: ") + path);
    return -1;
  }
  uint64_t hlen = header.size();
  bool okay = write(fd, &hlen, 8) == 8 &&
              write(fd, header.data(), header.size()) ==
                  static_cast<ssize_t>(header.size());
  for (long i = 0; okay && i < n; ++i) {
    const char *src = static_cast<const char *>(datas[i]);
    long remaining = nbytes[i];
    while (remaining > 0) {
      ssize_t w = write(fd, src, static_cast<size_t>(remaining));
      if (w <= 0) { okay = false; break; }
      src += w;
      remaining -= w;
    }
  }
  close(fd);
  if (!okay) {
    set_error("write failed");
    return -1;
  }
  return 0;
}

}  // extern "C"
