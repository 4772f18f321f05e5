// Differential-oracle probe #18: the multi-sample MERGE emission
// engine.  Compiles the reference's merge.h AS-IS (its program_options
// CLI function sliced off at fixture time) and runs the real
// mergeRun + mergeBCFs pipeline (/root/reference/src/merge.h:1821-1869,
// 1731-1819) in the exact driver order of merge() (:2050-2115, no
// chunking) over the functional text-mode htslib vcf layer, so
// delly_tpu/models/merge.py can be fuzzed end-to-end against the
// reference code actually executing: _collectSVtype gating
// (:341-629), subtype-aware _svMatch clustering with UnionFind
// (:246-338), allele grouping and _retainAllele (:632-765),
// _emitSelected site emission with AC/AN/SUPP/ALLELEID (:881-1214),
// consensus synthesis for external callers (:849-878), the CNV
// interval path (:1449-1582, 1217-1445), and _regroupLoci TR locus
// relabeling during the k-way merge (:1584-1729).
//
// usage: probe <outfile> <tmpdir> <cnvmode 0/1> <pass 0/1>
//        <precise 0/1> <qualthres> <recurrentSamples> <vaf> <coverage>
//        <minsize> <maxsize> <bpoffset> <recoverlap> <repMinAF>
//        <genome.fa|-> <in1.vcf> [in2.vcf ...]
// (subtype knobs stay at CLI defaults, merge.h:1902-1912)
// output: the merged VCF text written to <outfile>
#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <vector>

#include "probe_common.hpp"

#include <boost/container/flat_set.hpp>
#include <boost/dynamic_bitset.hpp>
#include <boost/filesystem.hpp>
#include <boost/icl/split_interval_map.hpp>
#include <boost/multi_array.hpp>
#include <boost/unordered_map.hpp>

#include "probe_replay.hpp"

#include "vcf_text_replay.hpp"

// ---- functional faidx over a real FASTA file (name-keyed) ----
static std::map<std::string, std::string> g_fasta;
struct faidx_t {};
faidx_t* fai_load(const char* path) {
  g_fasta.clear();
  std::ifstream in(path);
  if (!in.good()) return nullptr;
  std::string line, name;
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    if (line[0] == '>') {
      name = line.substr(1);
      std::size_t sp = name.find_first_of(" \t");
      if (sp != std::string::npos) name = name.substr(0, sp);
    } else {
      g_fasta[name] += line;
    }
  }
  static faidx_t f;
  return &f;
}
void fai_destroy(faidx_t*) {}
char* faidx_fetch_seq(const faidx_t*, const char* tname, int lo, int hi,
                      int* seqlen) {
  std::string const& s = g_fasta[tname];
  if (lo < 0) lo = 0;
  if (hi >= (int)s.size()) hi = (int)s.size() - 1;
  if (hi < lo) {
    *seqlen = 0;
    char* out = (char*)std::malloc(1);
    out[0] = '\0';
    return out;
  }
  std::string sub = s.substr(lo, hi - lo + 1);
  *seqlen = (int)sub.size();
  char* out = (char*)std::malloc(sub.size() + 1);
  std::memcpy(out, sub.c_str(), sub.size() + 1);
  return out;
}
int faidx_seq_len(const faidx_t*, const char* tname) {
  auto it = g_fasta.find(tname);
  return it == g_fasta.end() ? -1 : (int)it->second.size();
}
int faidx_has_seq(const faidx_t*, const char* tname) {
  return g_fasta.count(tname) ? 1 : 0;
}

namespace torali {
// util.h:614-624 — output path writability check (probe: tmpdir)
inline bool _outfileValid(boost::filesystem::path const&) {
  return true;
}
}  // namespace torali

// gregorian date rendering named by the emitters' fileDate lines (the
// header is excluded from comparison; any fixed token works)
namespace boost {
namespace posix_time {
gregorian::date ptime::date() const { return gregorian::date(); }
}  // namespace posix_time
namespace gregorian {
std::string to_iso_string(date) { return std::string("19700101"); }
}  // namespace gregorian
}  // namespace boost

#define UTIL_H  // helpers restated above / pulled via probe_common
#define MAX_CN 10

#include "version.h"

// real reference code sliced by the test fixture (UTIL_H predefined):
// _decodeOrientation (util.h:287-326) + entropy (util.h:565-579)
#include "util_merge_slice.h"

// merge.h minus its program_options CLI function (sliced)
#include "merge_sliced.h"

using namespace torali;

int main(int argc, char** argv) {
  if (argc < 17) {
    std::cerr << "usage: see header" << std::endl;
    return 2;
  }
  MergeConfig c;
  c.svcounter = 1;
  c.alleleCounter = 1;
  int a = 1;
  boost::filesystem::path outPath(argv[a++]);
  std::string tmpdir(argv[a++]);
  c.cnvMode = std::atoi(argv[a++]) != 0;
  c.filterForPass = std::atoi(argv[a++]) != 0;
  c.filterForPrecise = std::atoi(argv[a++]) != 0;
  c.qualthres = std::atoi(argv[a++]);
  c.recurrentSamples = std::atoi(argv[a++]);
  c.vaf = std::atof(argv[a++]);
  c.coverage = std::atoi(argv[a++]);
  c.minsize = std::atoi(argv[a++]);
  c.maxsize = std::atoi(argv[a++]);
  c.bpoffset = std::atoi(argv[a++]);
  c.recoverlap = std::atof(argv[a++]);
  c.repMinAF = std::atof(argv[a++]);
  std::string genome(argv[a++]);
  if (genome != "-") {
    c.genome = boost::filesystem::path(genome);
    c.hasGenome = true;
  } else {
    c.hasGenome = false;
  }
  for (; a < argc; ++a)
    c.files.push_back(boost::filesystem::path(argv[a]));
  // remaining knobs at their CLI defaults (merge.h:1902-1921)
  c.chunksize = 500;
  c.meiOffset = 50;
  c.meiSizeRatio = 0.85f;
  c.meiSeqId = 0.8f;
  c.trOffset = 200;
  c.trFrac = 0.25f;
  c.trSeqId = 0.7f;
  c.normFrac = 0.5f;
  c.juncSeqId = 0.7f;
  c.seqCutoff = 10000;
  c.cnvLargeSize = 200000;
  c.cnvMinUniq = 0.75f;
  c.cnvGainUniq = 0.9f;
  c.totalSamples = c.files.size();

  // driver core, merge() stage order (merge.h:2050-2115), including
  // the chunked path (optimal chunk sizing :2040-2052, per-chunk
  // mergeRun with the vaf/coverage reset on the re-merge :2066-2087).
  // DELLY_MERGE_CHUNKSIZE mirrors the CLI -u option (floored at 100,
  // merge.h:1989)
  if (const char* cs = std::getenv("DELLY_MERGE_CHUNKSIZE"))
    c.chunksize = (uint32_t)std::atoi(cs);
  if (c.chunksize < 100) c.chunksize = 100;
  if (c.files.size() > c.chunksize) {
    int32_t bestChunkSize = c.chunksize;
    int32_t bestBinSize = 0;
    for (uint32_t i = 50; i < c.chunksize; ++i) {
      int32_t chunks = ((c.files.size() - 1) / i);
      int32_t lastBin = c.files.size() - chunks * i;
      if (lastBin > bestBinSize) {
        bestBinSize = lastBin;
        bestChunkSize = i;
      }
    }
    c.chunksize = bestChunkSize;
  }
  int32_t minSVT = 0, maxSVT = 9;
  if (c.cnvMode) {
    minSVT = 9;
    maxSVT = 10;
  }
  std::vector<boost::filesystem::path> svtCollect(maxSVT);
  for (int32_t svt = minSVT; svt < maxSVT; ++svt) {
    svtCollect[svt] = boost::filesystem::path(
        tmpdir + "/svt" + std::to_string(svt) + ".vcf");
    if (c.files.size() <= c.chunksize) {
      c.outfile = svtCollect[svt];
      mergeRun(c, svt);
    } else {
      std::vector<boost::filesystem::path> fileRestore = c.files;
      uint32_t chunks = ((c.files.size() - 1) / c.chunksize) + 1;
      std::vector<boost::filesystem::path> chunkCollect(chunks);
      for (uint32_t ic = 0; ic < chunks; ++ic) {
        chunkCollect[ic] = boost::filesystem::path(
            tmpdir + "/chunk" + std::to_string(svt) + "_"
            + std::to_string(ic) + ".vcf");
        c.files.clear();
        for (uint32_t k = ic * c.chunksize;
             (k < (ic + 1) * c.chunksize) && (k < fileRestore.size());
             ++k)
          c.files.push_back(fileRestore[k]);
        c.outfile = chunkCollect[ic];
        mergeRun(c, svt);
      }
      c.files = chunkCollect;
      c.outfile = svtCollect[svt];
      float vafStore = c.vaf;
      uint32_t coverageStore = c.coverage;
      c.vaf = 0;
      c.coverage = 0;
      mergeRun(c, svt);
      c.vaf = vafStore;
      c.coverage = coverageStore;
      c.files = fileRestore;
    }
  }
  c.outfile = outPath;
  if (c.cnvMode) {
    std::ifstream in(svtCollect[9].string().c_str());
    std::ofstream out(outPath.string().c_str());
    out << in.rdbuf();
  } else {
    mergeBCFs(c, svtCollect);
  }
  return 0;
}
