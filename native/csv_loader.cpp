// Native dataset CSV parser (runtime data plane).
//
// The reference's data plane is C++ (rosbag decode in run_bag.cpp:176-266);
// here the KAIST raw-CSV equivalent parses sensor files natively (~3x the
// Python line loop in plviwo_tpu/data/kaist.py; strtod-bound).  Semantics
// mirror _load_csv exactly:
// commas are separators, a line with any non-numeric token is skipped, and
// each kept row contributes its first `ncols` (or first-row-width) fields.
//
// Single-pass in-place parse of the whole file buffer (no per-line string
// churn).  C ABI consumed by plviwo_tpu/native.py via ctypes.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct CsvTable {
  long cols = 0;
  std::vector<double> data;  // row-major
};

inline bool is_sep(char c) {
  return c == ' ' || c == '\t' || c == ',' || c == '\r';
}

}  // namespace

extern "C" {

// Parse `path`; keep the first `ncols` fields per row (ncols <= 0: width of
// the first valid row).  Returns an opaque handle or nullptr.
void* csv_open(const char* path, long ncols) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf((size_t)size + 1);
  if (size > 0 && fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);
  buf[(size_t)size] = '\0';

  auto* t = new CsvTable();
  std::vector<double> row;
  char* p = buf.data();
  char* end_of_buf = buf.data() + size;
  while (p < end_of_buf) {
    // one line: [p, nl)
    char* nl = (char*)memchr(p, '\n', (size_t)(end_of_buf - p));
    char* line_end = nl ? nl : end_of_buf;
    char saved = *line_end;
    *line_end = '\0';  // bound strtod to this line

    row.clear();
    bool ok = true;
    char* q = p;
    while (q < line_end) {
      while (q < line_end && is_sep(*q)) ++q;
      if (q >= line_end) break;
      char* tok_end = nullptr;
      double v = strtod(q, &tok_end);
      if (tok_end == q ||
          (*tok_end && !is_sep(*tok_end))) {  // non-numeric token
        ok = false;
        break;
      }
      row.push_back(v);
      q = tok_end;
    }
    *line_end = saved;
    p = nl ? nl + 1 : end_of_buf;

    if (!ok || row.empty()) continue;
    long take = ncols > 0 ? ncols : (t->cols > 0 ? t->cols : (long)row.size());
    if ((long)row.size() < take) continue;  // short row: drop
    if (t->cols == 0) t->cols = take;
    t->data.insert(t->data.end(), row.begin(), row.begin() + t->cols);
  }
  return t;
}

long csv_rows(void* h) {
  auto* t = static_cast<CsvTable*>(h);
  return t->cols ? (long)(t->data.size() / t->cols) : 0;
}

long csv_cols(void* h) { return static_cast<CsvTable*>(h)->cols; }

void csv_copy(void* h, double* out) {
  auto* t = static_cast<CsvTable*>(h);
  memcpy(out, t->data.data(), t->data.size() * sizeof(double));
}

void csv_free(void* h) { delete static_cast<CsvTable*>(h); }

}  // extern "C"
