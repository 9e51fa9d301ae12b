// Native pileup -> base-count extraction (the reference's count-extraction
// role: SURVEY.md §2 'Count extraction', scripts/ExtractCountFreqGenes.py ::
// main [M] — mpileup/bam-readcount-style input -> position x sample x 4
// counts). SURVEY.md §2.1 names this host-side parser as the one place the
// rebuild should write C++: everything downstream is JAX, but turning
// multi-GB `samtools mpileup` text into the dense counts tensor is a
// byte-level scan that Python does ~50x slower.
//
// Input format: multi-sample `samtools mpileup` text —
//   contig \t pos(1-based) \t ref \t [depth \t bases \t quals] x S
// The bases column grammar handled here (htslib pileup encoding):
//   . ,            match to ref (forward / reverse strand)
//   ACGTN acgtn    mismatch (case = strand)
//   ^X             read start; X = mapping-quality char (consumed, not a base)
//   $              read end marker (consumed, not a base)
//   +NN<seq> -NN<seq>  insertion/deletion AFTER the current base: NN decimal
//                  length, then that many sequence chars (consumed)
//   *              deletion placeholder (covers the site but is not a base;
//                  ignored, matching bam-readcount/DESMAN semantics)
//   > <            reference skip from spliced alignment (ignored)
// A base is counted only if its paired quality char (phred+33) is >= min_baseq.
//
// C ABI mirrors countsio.cpp; bound via ctypes in desman_tpu/native.py.
// Build: make native  (g++ -O3 -shared -fPIC -> desman_tpu/_libpileupio.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PileupFile {
  int64_t V = 0;
  int64_t S = 0;
  std::vector<std::string> contigs;   // unique contig names, first-seen order
  std::vector<int32_t> contig_ids;    // [V]
  std::vector<int64_t> positions;     // [V] (1-based, as in the file)
  std::vector<char> refs;             // [V] reference base (upper-cased)
  std::vector<int32_t> counts;        // [V * S * 4], ACGT
  std::string error;
};

inline int base_index(char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return -1;
  }
}

// Decode one sample's bases+quals columns into cnt[4]. Returns false on a
// malformed column (sets *err).
bool decode_bases(const char* bases, size_t blen, const char* quals,
                  size_t qlen, int ref_idx, int min_baseq, int32_t cnt[4],
                  std::string* err) {
  size_t qi = 0;  // quality cursor: advances once per read-base symbol
  for (size_t i = 0; i < blen; ++i) {
    char c = bases[i];
    if (c == '^') {            // read start: next char is mapping quality
      if (i + 1 >= blen) { *err = "dangling ^ in bases column"; return false; }
      ++i;
      continue;
    }
    if (c == '$') continue;    // read end marker
    if (c == '+' || c == '-') {  // indel: [+-]NN<seq>
      size_t j = i + 1;
      int64_t len = 0;
      while (j < blen && bases[j] >= '0' && bases[j] <= '9') {
        len = len * 10 + (bases[j] - '0');
        ++j;
      }
      if (j == i + 1 || len < 0 || j + (size_t)len > blen) {
        *err = "malformed indel in bases column";
        return false;
      }
      i = j + (size_t)len - 1;  // consume the inserted/deleted sequence
      continue;
    }
    // Everything else consumes one quality char.
    if (qi >= qlen) { *err = "bases/quals length mismatch"; return false; }
    int q = quals[qi++] - 33;
    int idx;
    if (c == '.' || c == ',') {
      idx = ref_idx;           // match to reference (may be -1 for ref N)
    } else if (c == '*' || c == '>' || c == '<' || c == 'N' || c == 'n') {
      idx = -1;                // covers the site but contributes no base
    } else {
      idx = base_index(c);
      if (idx < 0) { *err = std::string("unexpected symbol in bases column: ") + c; return false; }
    }
    if (idx >= 0 && q >= min_baseq) ++cnt[idx];
  }
  return true;
}

// Split a tab-separated line in place; returns field start pointers + lens.
size_t split_tabs(char* line, size_t len, std::vector<char*>* f,
                  std::vector<size_t>* fl) {
  f->clear();
  fl->clear();
  size_t start = 0;
  for (size_t i = 0; i <= len; ++i) {
    if (i == len || line[i] == '\t') {
      f->push_back(line + start);
      fl->push_back(i - start);
      if (i < len) line[i] = '\0';
      start = i + 1;
    }
  }
  return f->size();
}

PileupFile* parse(const char* path, int min_baseq) {
  auto* pf = new PileupFile();
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    pf->error = std::string("cannot open ") + path;
    return pf;
  }
  std::unordered_map<std::string, int32_t> contig_id;
  std::vector<char*> f;
  std::vector<size_t> fl;
  char* line = nullptr;
  size_t cap = 0;
  ssize_t got;
  int64_t lineno = 0;
  while ((got = getline(&line, &cap, fp)) != -1) {
    ++lineno;
    size_t len = (size_t)got;
    while (len && (line[len - 1] == '\n' || line[len - 1] == '\r')) --len;
    if (!len || line[0] == '#') continue;
    size_t nf = split_tabs(line, len, &f, &fl);
    if (nf < 6 || (nf - 3) % 3 != 0) {
      char buf[128];
      std::snprintf(buf, sizeof buf,
                    "line %lld: expected 3 + 3*S tab fields, got %zu",
                    (long long)lineno, nf);
      pf->error = buf;
      break;
    }
    int64_t S = (int64_t)(nf - 3) / 3;
    if (pf->S == 0) {
      pf->S = S;
    } else if (S != pf->S) {
      char buf[128];
      std::snprintf(buf, sizeof buf, "line %lld: %lld samples, expected %lld",
                    (long long)lineno, (long long)S, (long long)pf->S);
      pf->error = buf;
      break;
    }
    char* endp = nullptr;
    int64_t pos = std::strtoll(f[1], &endp, 10);
    if (endp == f[1] || *endp != '\0') {
      char buf[128];
      std::snprintf(buf, sizeof buf, "line %lld: malformed position field",
                    (long long)lineno);
      pf->error = buf;
      break;
    }
    std::string contig(f[0], fl[0]);
    auto it = contig_id.find(contig);
    int32_t cid;
    if (it == contig_id.end()) {
      cid = (int32_t)pf->contigs.size();
      contig_id.emplace(contig, cid);
      pf->contigs.push_back(contig);
    } else {
      cid = it->second;
    }
    pf->contig_ids.push_back(cid);
    pf->positions.push_back(pos);
    char ref = fl[2] ? f[2][0] : 'N';
    if (ref >= 'a' && ref <= 'z') ref = (char)(ref - 'a' + 'A');
    pf->refs.push_back(ref);
    int ref_idx = base_index(ref);
    size_t row = pf->counts.size();
    pf->counts.resize(row + (size_t)pf->S * 4, 0);
    std::string err;
    for (int64_t s = 0; s < pf->S; ++s) {
      const char* bases = f[3 + 3 * s + 1];
      size_t blen = fl[3 + 3 * s + 1];
      const char* quals = f[3 + 3 * s + 2];
      size_t qlen = fl[3 + 3 * s + 2];
      // htslib writes "*\t*" for zero-depth samples
      if (blen == 1 && bases[0] == '*' && qlen == 1 && quals[0] == '*') continue;
      if (!decode_bases(bases, blen, quals, qlen, ref_idx, min_baseq,
                        &pf->counts[row + (size_t)s * 4], &err)) {
        char buf[160];
        std::snprintf(buf, sizeof buf, "line %lld sample %lld: %s",
                      (long long)lineno, (long long)(s + 1), err.c_str());
        pf->error = buf;
        break;
      }
    }
    if (!pf->error.empty()) break;
    ++pf->V;
  }
  free(line);
  std::fclose(fp);
  return pf;
}

}  // namespace

extern "C" {

void* pileup_open(const char* path, int min_baseq) {
  return parse(path, min_baseq);
}

const char* pileup_error(void* h) {
  auto* pf = static_cast<PileupFile*>(h);
  return pf->error.empty() ? nullptr : pf->error.c_str();
}

int64_t pileup_V(void* h) { return static_cast<PileupFile*>(h)->V; }
int64_t pileup_S(void* h) { return static_cast<PileupFile*>(h)->S; }
int64_t pileup_n_contigs(void* h) {
  return (int64_t)static_cast<PileupFile*>(h)->contigs.size();
}

// counts: int32 [V,S,4]; positions: int64 [V]; contig_ids: int32 [V];
// refs: char [V]
void pileup_fill(void* h, void* counts, void* positions, void* contig_ids,
                 void* refs) {
  auto* pf = static_cast<PileupFile*>(h);
  std::memcpy(counts, pf->counts.data(), pf->counts.size() * sizeof(int32_t));
  std::memcpy(positions, pf->positions.data(), pf->positions.size() * sizeof(int64_t));
  std::memcpy(contig_ids, pf->contig_ids.data(), pf->contig_ids.size() * sizeof(int32_t));
  std::memcpy(refs, pf->refs.data(), pf->refs.size());
}

int64_t pileup_contig_name(void* h, int64_t i, char* buf, int64_t buflen) {
  auto* pf = static_cast<PileupFile*>(h);
  if (i < 0 || i >= (int64_t)pf->contigs.size()) return -1;
  const std::string& s = pf->contigs[(size_t)i];
  int64_t n = (int64_t)s.size() < buflen - 1 ? (int64_t)s.size() : buflen - 1;
  std::memcpy(buf, s.data(), (size_t)n);
  buf[n] = '\0';
  return (int64_t)s.size();
}

void pileup_close(void* h) { delete static_cast<PileupFile*>(h); }

}  // extern "C"
