// Differential-oracle probe #21: the pangenome graph-alignment plane.
// Compiles the reference's gfa.h + gaf.h + pangenome.h AS-IS and runs
// the real parseGfa (/root/reference/src/gfa.h:70-176), GAF record
// parsing (gaf.h:94-149) and findGraphJunctions junction extraction in
// graph-segment coordinates incl. leading/trailing clips and
// path-segment coordinate transforms (pangenome.h:46-220) over real
// GFA/GAF text files, so delly_tpu/models/pangenome.py can be fuzzed
// against the reference code actually executing.
//
// usage: probe <minMapQual> <minRefSep> <gfa> <gaf1> [gaf2 ...]
// stdout, one line per seed (sorted): "seed junction;junction;..."
//   junction = forward,scleft,refidx,rstart,refpos,seqpos,qual
// then "GRAPH <nseq> <total_len> <offsets csv> <ranks csv>"
#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <set>
#include <sstream>
#include <vector>

#include "probe_common.hpp"

#include <boost/filesystem.hpp>
#include <boost/multi_array.hpp>
#include <boost/unordered_map.hpp>

// htslib global: char -> BAM cigar op (public wire-format mapping)
static int8_t bam_cigar_table[256];
static void initCigarTable() {
  for (int i = 0; i < 256; ++i) bam_cigar_table[i] = -1;
  const char* ops = "MIDNSHP=X";
  for (int i = 0; ops[i]; ++i) bam_cigar_table[(int)ops[i]] = (int8_t)i;
}

namespace torali {
inline std::size_t hashCombine64(std::size_t seed, std::size_t v) {
  return seed ^ (v + 0x9E3779B97F4A7C15ULL + (seed << 6) + (seed >> 2));
}
inline std::size_t fnv1a64(const char* s) {
  std::size_t h = 0xCBF29CE484222325ULL;
  for (; *s; ++s) {
    h ^= (unsigned char)*s;
    h *= 0x100000001B3ULL;
  }
  return h;
}
// util.h hash_lr(qname) — the repo's documented 64-bit recipe
inline std::size_t hash_lr(std::string const& qname) {
  return hashCombine64(hash_string(qname.c_str()),
                       fnv1a64(qname.c_str()));
}
// util.h:284-296 — gzip magic probe
inline bool is_gz(boost::filesystem::path const& f) {
  std::ifstream bfile(f.string().c_str(),
                      std::ios_base::binary | std::ios::ate);
  bfile.seekg(0, std::ios::beg);
  char byte1;
  bfile.read(&byte1, 1);
  char byte2;
  bfile.read(&byte2, 1);
  bfile.close();
  return (byte1 == '\x1F') && (byte2 == '\x8B');
}
}  // namespace torali

// plain-text inputs only: the gzip_decompressor path is never entered
// (is_gz false), so the iostreams shim passthrough suffices
namespace boost {
namespace iostreams {
struct input {};
template <typename T>
struct filtering_streambuf;
template <>
struct filtering_streambuf<input> : std::streambuf {
  std::streambuf* inner = nullptr;
  void push(std::ifstream& f) { inner = f.rdbuf(); }
  template <typename F>
  void push(F const&, int) {}
  void pop() {}
  int underflow() override {
    return inner ? inner->sgetc() : EOF;
  }
  int uflow() override { return inner ? inner->sbumpc() : EOF; }
  std::streamsize xsgetn(char* s, std::streamsize n) override {
    return inner ? inner->sgetn(s, n) : 0;
  }
};
struct gzip_decompressor {};
}  // namespace iostreams
namespace posix_time2 {}  // placeholder
}  // namespace boost

// stage banners
namespace boost {
namespace posix_time {
inline ptime second_clock::local_time() { return ptime(); }
std::string to_simple_string(ptime) { return std::string(); }
}  // namespace posix_time
}  // namespace boost

#define UTIL_H
#define MAX_CN 10

#include "gfa.h"

#include "gaf.h"

#include "pangenome.h"

using namespace torali;

struct Cfg {
  uint16_t minMapQual;
  uint32_t minRefSep;
  std::vector<boost::filesystem::path> files;
  boost::filesystem::path genome;
};

int main(int argc, char** argv) {
  initCigarTable();
  if (argc < 4) {
    std::cerr << "usage: probe <minMapQual> <minRefSep> <gfa> <gaf...>"
              << std::endl;
    return 2;
  }
  Cfg c;
  c.minMapQual = (uint16_t)std::atoi(argv[1]);
  c.minRefSep = (uint32_t)std::atoi(argv[2]);
  c.genome = boost::filesystem::path(argv[3]);
  for (int a = 4; a < argc; ++a)
    c.files.push_back(boost::filesystem::path(argv[a]));

  Graph g;
  if (!parseGfa(c, g)) {
    std::cerr << "GFA parse failed" << std::endl;
    return 1;
  }
  typedef std::vector<Junction> TJunctionVector;
  typedef std::map<std::size_t, TJunctionVector> TReadBp;
  TReadBp readBp;
  std::set<std::size_t> validSR;
  if (!findGraphJunctions(c, g, readBp, validSR)) {
    std::cerr << "GAF parse failed" << std::endl;
    return 1;
  }
  for (auto const& kv : readBp) {
    std::cout << kv.first << ' ';
    bool first = true;
    for (auto const& j : kv.second) {
      std::cout << (first ? "" : ";") << (int)j.forward << ','
                << (int)j.scleft << ',' << j.refidx << ',' << j.rstart
                << ',' << j.refpos << ',' << j.seqpos << ','
                << (int)j.qual;
      first = false;
    }
    std::cout << '\n';
  }
  std::cout << "GRAPH " << g.smap.size() << ' ' << g.sequence.size();
  std::cout << ' ';
  for (std::size_t i = 0; i < g.offset.size(); ++i)
    std::cout << (i ? "," : "") << g.offset[i];
  // segment name -> id pairs in sorted-name order
  std::map<std::string, uint32_t> sorted(g.smap.begin(), g.smap.end());
  std::cout << ' ';
  bool first = true;
  for (auto const& kv : sorted) {
    std::cout << (first ? "" : ",") << kv.first << '=' << kv.second;
    first = false;
  }
  std::cout << '\n';
  return 0;
}
