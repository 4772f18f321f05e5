// Differential-oracle probe #6: drives the REFERENCE clique-clustering
// engine (/root/reference/src/cluster.h, included as-is) so the repo's
// from-scratch delly_tpu/models/cluster.py can be fuzzed against the
// real reference code actually executing: streaming component building
// with graph-cleaning barriers, component merging/relabeling, edge
// pruning, greedy weighted clique growth with the per-svt
// _initClique/_updateClique wiggle algebra (PE) and the CIPOS/CIEND
// window algebra + paired-seed dedup (SR), and the emitted
// StructuralVariantRecord fields.
//
// cluster.h's heavy includes (boost filesystem/iostreams, htslib,
// util.h, junction.h) are never used by the clustering code itself;
// they are satisfied by no-op shim headers + include-guard predefines,
// with the record types coming from tags.h via probe_common.hpp.
//
// stdin, one case per line:
//   CLUSTERSR <svt> <nchr> <maxReadSep> <minClq> <prune> <n> \
//             <chr,pos,chr2,pos2,rstart,sstart,qual,inslen,id> ...
//   CLUSTERPE <svt> <varisize> <minClq> <prune> <n> \
//             <tid,pos,mtid,mpos,alen,malen,median,mad,maxisize,flag,mapq> ...
// stdout, one line per case:
//   CLUSTERSR: <svid,svid,...|-> then per SV
//     "|chr,svStart,chr2,svEnd,cipl,ciph,ciel,cieh,sr,srmapq,mapq,ins,svt,id"
//   CLUSTERPE: "-" or per SV
//     "|chr,svStart,chr2,svEnd,cipl,ciph,ciel,cieh,pe,pemapq,mapq,svt"
#include <iostream>
#include <map>
#include <set>
#include <sstream>

#include "probe_common.hpp"

#define UTIL_H      // cluster.h's util.h include (unused by clustering)
#define JUNCTION_H  // ditto junction.h

#include "cluster.h"

using namespace torali;

struct Cfg {
  int32_t nchr;
  uint32_t maxReadSep;
  uint32_t minCliqueSize;
  uint32_t graphPruning;
};

static std::vector<int64_t> fields(std::string const& tok) {
  std::vector<int64_t> out;
  std::istringstream ls(tok);
  std::string item;
  while (std::getline(ls, item, ',')) out.push_back(std::stoll(item));
  return out;
}

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op == "CLUSTERSR") {
      Cfg c;
      int svt, n;
      ss >> svt >> c.nchr >> c.maxReadSep >> c.minCliqueSize >>
          c.graphPruning >> n;
      std::vector<SRBamRecord> br;
      for (int i = 0; i < n; ++i) {
        std::string tok;
        ss >> tok;
        std::vector<int64_t> f = fields(tok);
        br.push_back(SRBamRecord(f[0], f[1], f[2], f[3], f[4], f[5],
                                 f[6], f[7], (std::size_t)f[8]));
      }
      std::vector<StructuralVariantRecord> svs;
      cluster(c, br, svs, svt);
      bool first = true;
      for (auto const& r : br) {
        std::cout << (first ? "" : ",") << r.svid;
        first = false;
      }
      if (first) std::cout << '-';
      for (auto const& s : svs)
        std::cout << '|' << s.chr << ',' << s.svStart << ',' << s.chr2
                  << ',' << s.svEnd << ',' << s.ciposlow << ','
                  << s.ciposhigh << ',' << s.ciendlow << ','
                  << s.ciendhigh << ',' << s.srSupport << ','
                  << s.srMapQuality << ',' << s.mapq << ','
                  << s.insLen << ',' << s.svt << ',' << s.id;
      std::cout << '\n';
    } else if (op == "CLUSTERPE") {
      Cfg c;
      c.nchr = 0;
      c.maxReadSep = 0;
      int svt, n;
      uint32_t varisize;
      ss >> svt >> varisize >> c.minCliqueSize >> c.graphPruning >> n;
      std::vector<BamAlignRecord> recs;
      bam1_t b;
      for (int i = 0; i < n; ++i) {
        std::string tok;
        ss >> tok;
        std::vector<int64_t> f = fields(tok);
        b.core.tid = (int32_t)f[0];
        b.core.pos = (int32_t)f[1];
        b.core.mtid = (int32_t)f[2];
        b.core.mpos = (int32_t)f[3];
        b.core.flag = (uint16_t)f[9];
        recs.push_back(BamAlignRecord(&b, (uint8_t)f[10],
                                      (uint16_t)f[4], (uint16_t)f[5],
                                      (int32_t)f[6], (int32_t)f[7],
                                      (int32_t)f[8]));
      }
      std::vector<StructuralVariantRecord> svs;
      cluster(c, recs, svs, varisize, svt);
      if (svs.empty()) std::cout << '-';
      for (auto const& s : svs)
        std::cout << '|' << s.chr << ',' << s.svStart << ',' << s.chr2
                  << ',' << s.svEnd << ',' << s.ciposlow << ','
                  << s.ciposhigh << ',' << s.ciendlow << ','
                  << s.ciendhigh << ',' << s.peSupport << ','
                  << s.peMapQuality << ',' << s.mapq << ',' << s.svt;
      std::cout << '\n';
    }
    std::cout.flush();
  }
  return 0;
}
