// Fast Matrix Market parser — native equivalent of the reference's vendored
// NIST mmio.c reader (SURVEY.md §3 component 2), written new for this
// framework: one bulk read + a branch-light pointer-walking tokenizer
// instead of per-line fscanf. Exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC mtxparse.cpp -o libmtxparse.so

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

enum Field { FIELD_REAL = 0, FIELD_INTEGER = 1, FIELD_PATTERN = 2 };
enum Symmetry { SYM_GENERAL = 0, SYM_SYMMETRIC = 1, SYM_SKEW = 2 };

struct FileBuf {
  char* data = nullptr;
  size_t size = 0;
  ~FileBuf() { std::free(data); }
  bool read(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (sz < 0) { std::fclose(f); return false; }
    data = static_cast<char*>(std::malloc(static_cast<size_t>(sz) + 1));
    if (!data) { std::fclose(f); return false; }
    size = std::fread(data, 1, static_cast<size_t>(sz), f);
    data[size] = '\0';
    std::fclose(f);
    return true;
  }
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// Parse a non-negative integer fast; returns pointer after the number.
inline const char* parse_i64(const char* p, const char* end, int64_t* out) {
  p = skip_ws(p, end);
  int64_t v = 0;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
  while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
  *out = neg ? -v : v;
  return p;
}

struct Header {
  int64_t m = 0, n = 0, nnz = 0;
  int field = FIELD_REAL;
  int symmetry = SYM_GENERAL;
  int coordinate = 1;
  const char* body = nullptr;  // first byte after the size line
};

bool parse_header(const FileBuf& fb, Header* h, char* err, size_t errcap) {
  const char* p = fb.data;
  const char* end = fb.data + fb.size;
  // banner line
  char banner[256];
  const char* eol = p;
  while (eol < end && *eol != '\n') ++eol;
  size_t blen = static_cast<size_t>(eol - p);
  if (blen >= sizeof(banner)) blen = sizeof(banner) - 1;
  std::memcpy(banner, p, blen);
  banner[blen] = '\0';
  char obj[64] = {0}, fmt[64] = {0}, field[64] = {0}, sym[64] = {0};
  if (std::sscanf(banner, "%%%%MatrixMarket %63s %63s %63s %63s", obj, fmt,
                  field, sym) != 4 ||
      std::strcmp(obj, "matrix") != 0) {
    std::snprintf(err, errcap, "bad banner: %s", banner);
    return false;
  }
  for (char* s : {fmt, field, sym})
    for (char* c = s; *c; ++c) *c = static_cast<char>(std::tolower(*c));
  if (std::strcmp(fmt, "coordinate") == 0) h->coordinate = 1;
  else { std::snprintf(err, errcap, "native parser handles coordinate only"); return false; }
  if (std::strcmp(field, "real") == 0 || std::strcmp(field, "double") == 0)
    h->field = FIELD_REAL;
  else if (std::strcmp(field, "integer") == 0) h->field = FIELD_INTEGER;
  else if (std::strcmp(field, "pattern") == 0) h->field = FIELD_PATTERN;
  else { std::snprintf(err, errcap, "unsupported field %s", field); return false; }
  if (std::strcmp(sym, "general") == 0) h->symmetry = SYM_GENERAL;
  else if (std::strcmp(sym, "symmetric") == 0) h->symmetry = SYM_SYMMETRIC;
  else if (std::strcmp(sym, "skew-symmetric") == 0) h->symmetry = SYM_SKEW;
  else { std::snprintf(err, errcap, "unsupported symmetry %s", sym); return false; }

  p = next_line(p, end);
  while (p < end) {
    p = skip_ws(p, end);
    if (p < end && *p == '%') { p = next_line(p, end); continue; }
    break;
  }
  if (p >= end) { std::snprintf(err, errcap, "missing size line"); return false; }
  p = parse_i64(p, end, &h->m);
  p = parse_i64(p, end, &h->n);
  p = parse_i64(p, end, &h->nnz);
  h->body = next_line(p, end);
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success. field: 0=real,1=integer,2=pattern; symmetry:
// 0=general,1=symmetric,2=skew.
int mtx_read_header(const char* path, int64_t* m, int64_t* n, int64_t* nnz,
                    int* field, int* symmetry, char* err, int64_t errcap) {
  FileBuf fb;
  if (!fb.read(path)) {
    std::snprintf(err, static_cast<size_t>(errcap), "cannot read %s", path);
    return 1;
  }
  Header h;
  if (!parse_header(fb, &h, err, static_cast<size_t>(errcap))) return 2;
  *m = h.m; *n = h.n; *nnz = h.nnz;
  *field = h.field; *symmetry = h.symmetry;
  return 0;
}

// Fill caller-allocated rows/cols (0-based) and vals (1.0 for pattern).
int mtx_read_body(const char* path, int64_t nnz_expected, int32_t* rows,
                  int32_t* cols, double* vals, char* err, int64_t errcap) {
  FileBuf fb;
  if (!fb.read(path)) {
    std::snprintf(err, static_cast<size_t>(errcap), "cannot read %s", path);
    return 1;
  }
  Header h;
  if (!parse_header(fb, &h, err, static_cast<size_t>(errcap))) return 2;
  if (h.nnz != nnz_expected) {
    std::snprintf(err, static_cast<size_t>(errcap), "nnz mismatch");
    return 3;
  }
  const char* p = h.body;
  const char* end = fb.data + fb.size;
  for (int64_t k = 0; k < h.nnz; ++k) {
    int64_t r, c;
    p = parse_i64(p, end, &r);
    p = parse_i64(p, end, &c);
    if (r < 1 || r > h.m || c < 1 || c > h.n) {
      std::snprintf(err, static_cast<size_t>(errcap),
                    "entry %lld out of range: (%lld, %lld)",
                    static_cast<long long>(k), static_cast<long long>(r),
                    static_cast<long long>(c));
      return 4;
    }
    rows[k] = static_cast<int32_t>(r - 1);
    cols[k] = static_cast<int32_t>(c - 1);
    if (h.field == FIELD_PATTERN) {
      vals[k] = 1.0;  // synthesized values, matching the reference driver
    } else {
      p = skip_ws(p, end);
      char* after = nullptr;
      vals[k] = std::strtod(p, &after);
      if (after == p) {
        std::snprintf(err, static_cast<size_t>(errcap),
                      "bad value at entry %lld", static_cast<long long>(k));
        return 5;
      }
      p = after;
    }
  }
  return 0;
}

}  // extern "C"
