// Differential-oracle probe #13: drives the REFERENCE SR-genotyping
// probe construction (/root/reference/src/coverage.h, included as-is
// with split.h and the DP stack) so delly_tpu/models/genotype_sr.py
// can be fuzzed against the real reference code actually executing:
// the HW alignment scorer with its k-cutoff and score transform
// (_editDistanceHW, coverage.h:107-116), the per-svt probe-window cut
// transforms (_cutRefStart/_cutRefEnd, :117-162), and the full
// _generateProbes pass (allele tagging, per-svt reference probes,
// consensus re-alignment and split detection, REF/ALT probe windows
// with homology-padded flanks, sorted BpRegion tracks, :164-263) over
// a functional faidx shim.
//
// stdin, one case per line:
//   HWSCORE <flankQuality> <query> <target>
//   CUTREF  <bpPoint> <svt> <rStart> <rEnd> <offL> <offR>
//   PROBES  <minFlank> <flankQ> <consWin> <indelsize>
//           <nchr> <chrlens,...> <seq1> [<seq2>] <nsv>
//           per sv: <id,chr,start,chr2,end,svt,inslen,precise>
//                   <consensus|.> <alleles|.>
// stdout:
//   HWSCORE: %.17g
//   CUTREF:  <cutStart> <cutEnd>
//   PROBES:  per sv "id:alleles:cons0:ref0:cons1:ref1|..." then " # "
//            bpRegions "chr,rs,re,bppos,hl,hr,svt,id,bp|..."
#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <map>
#include <set>
#include <sstream>

#include "probe_common.hpp"

#include <boost/container/flat_set.hpp>
#include <boost/dynamic_bitset.hpp>
#include <boost/filesystem.hpp>
#include <boost/multi_array.hpp>
#include <boost/unordered_map.hpp>

// functional faidx over in-memory chromosomes
static std::vector<std::string> g_chrseq;
struct faidx_t {};
faidx_t* fai_load(const char*) {
  static faidx_t f;
  return &f;
}
void fai_destroy(faidx_t*) {}
char* faidx_fetch_seq(const faidx_t*, const char* tname, int lo, int hi,
                      int* seqlen) {
  int tid = std::atoi(tname);
  std::string const& s = g_chrseq[tid];
  if (hi >= (int)s.size()) hi = (int)s.size() - 1;
  std::string sub = s.substr(lo, hi - lo + 1);
  *seqlen = (int)sub.size();
  char* out = (char*)std::malloc(sub.size() + 1);
  std::memcpy(out, sub.c_str(), sub.size() + 1);
  return out;
}
int faidx_seq_len(const faidx_t*, const char* tname) {
  return (int)g_chrseq[std::atoi(tname)].size();
}

namespace boost {
namespace posix_time {
inline ptime second_clock::local_time() { return ptime(); }
std::string to_simple_string(ptime) { return std::string(); }
}  // namespace posix_time
}  // namespace boost

int hts_idx_get_stat(const hts_idx_t*, int, uint64_t*, uint64_t*);

namespace torali {
// util.h symbols named by the uninstantiated annotateCoverage driver
std::size_t hash_pair(bam1_t*);
std::size_t hash_pair_mate(bam1_t*);
uint32_t alignmentLength(bam1_t*);
uint32_t halfAlignmentLength(bam1_t*);
int32_t readLength(bam1_t*);
std::size_t hash_sr(bam1_t*);
std::size_t hash_lr(bam1_t*);
template <typename T>
T medianVector(std::vector<T>&);
}  // namespace torali

#define UTIL_H  // helpers pulled via probe_common

#include "threadpool.h"

#include "coverage.h"

using namespace torali;

struct Cfg {
  int32_t minimumFlankSize;
  float flankQuality;
  int32_t minConsWindow;
  int32_t indelsize;
  boost::filesystem::path genome;
};

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op == "HWSCORE") {
      Cfg c;
      std::string q, t;
      ss >> c.flankQuality >> q >> t;
      std::printf("%.17g\n", _editDistanceHW(c, q, t));
    } else if (op == "CUTREF") {
      int bpPoint, svt;
      int64_t rS, rE, offL, offR;
      ss >> bpPoint >> svt >> rS >> rE >> offL >> offR;
      std::printf("%d %d\n",
                  _cutRefStart(rS, rE, offL, (unsigned)bpPoint, svt),
                  _cutRefEnd(rS, rE, offR, (unsigned)bpPoint, svt));
    } else if (op == "PROBES") {
      Cfg c;
      int nchr, nsv;
      std::string lens;
      ss >> c.minimumFlankSize >> c.flankQuality >> c.minConsWindow >>
          c.indelsize >> nchr >> lens;
      g_chrseq.assign(nchr, "");
      std::vector<uint32_t> tlen;
      {
        std::istringstream ls(lens);
        std::string item;
        while (std::getline(ls, item, ','))
          tlen.push_back(std::stoul(item));
      }
      for (int t = 0; t < nchr; ++t) ss >> g_chrseq[t];
      ss >> nsv;
      std::vector<StructuralVariantRecord> svs(nsv);
      for (int i = 0; i < nsv; ++i) {
        std::string meta, cons, alleles;
        ss >> meta >> cons >> alleles;
        std::istringstream ms(meta);
        std::string item;
        std::vector<long> f;
        while (std::getline(ms, item, ','))
          f.push_back(std::stol(item));
        StructuralVariantRecord& s = svs[i];
        s.id = (int32_t)f[0];
        s.chr = (int32_t)f[1];
        s.svStart = (int32_t)f[2];
        s.chr2 = (int32_t)f[3];
        s.svEnd = (int32_t)f[4];
        s.svt = (int32_t)f[5];
        s.insLen = (int32_t)f[6];
        s.precise = f[7] != 0;
        s.consensus = (cons == ".") ? std::string() : cons;
        s.alleles = (alleles == ".") ? std::string() : alleles;
      }
      // header with numeric names (faidx shim keys on atoi(name))
      std::vector<char*> names(nchr);
      std::vector<std::string> nameStore(nchr);
      for (int t = 0; t < nchr; ++t) {
        nameStore[t] = std::to_string(t);
        names[t] = const_cast<char*>(nameStore[t].c_str());
      }
      bam_hdr_t hdr;
      hdr.n_targets = nchr;
      hdr.target_len = tlen.data();
      hdr.target_name = names.data();
      typedef std::vector<std::string> TProbes;
      std::vector<TProbes> refProbeArr(2, TProbes(nsv));
      std::vector<TProbes> consProbeArr(2, TProbes(nsv));
      std::vector<std::vector<BpRegion> > bpRegion(nchr);
      std::vector<bool> svOnChr(nchr, false);
      _generateProbes(c, &hdr, svs, refProbeArr, consProbeArr,
                      bpRegion, svOnChr);
      bool first = true;
      for (int i = 0; i < nsv; ++i) {
        std::cout << (first ? "" : "|") << svs[i].id << ':'
                  << (svs[i].alleles.empty() ? "." : svs[i].alleles);
        for (int bp = 0; bp < 2; ++bp)
          std::cout << ':'
                    << (consProbeArr[bp][svs[i].id].empty()
                            ? "."
                            : consProbeArr[bp][svs[i].id])
                    << ':'
                    << (refProbeArr[bp][svs[i].id].empty()
                            ? "."
                            : refProbeArr[bp][svs[i].id]);
        first = false;
      }
      if (first) std::cout << '-';
      std::cout << " # ";
      first = true;
      for (int t = 0; t < nchr; ++t)
        for (BpRegion const& b : bpRegion[t]) {
          std::cout << (first ? "" : "|") << t << ',' << b.regionStart
                    << ',' << b.regionEnd << ',' << b.bppos << ','
                    << b.homLeft << ',' << b.homRight << ',' << b.svt
                    << ',' << b.id << ',' << (int)b.bpPoint;
          first = false;
        }
      if (first) std::cout << '-';
      std::cout << '\n';
    }
    std::cout.flush();
    std::fflush(stdout);
  }
  return 0;
}
