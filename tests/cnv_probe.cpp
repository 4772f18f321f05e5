// Differential-oracle probe #7: drives the REFERENCE read-depth
// segmentation plane (/root/reference/src/cnv.h, included as-is) so
// the repo's from-scratch delly_tpu/models/cnv.py can be fuzzed
// against the real reference code actually executing: split-read
// breakpoint clustering with the flank CN-shift z-test
// (collectBreakpoints, cnv.h:64-135), the penalized-least-squares
// optimal-partition segmentation with pruning (cnvSegment,
// cnv.h:237-291), the full per-chromosome segmentRD driver (window
// profile building, MAD sigma, breakpoint fusion, SE-scaled neighbor
// merging, CNV record output, cnv.h:294-461) and
// mergeAdjacentSameCN (cnv.h:205-234).
//
// The CNV record struct mirrors util.h:42-66 (data layout needed for
// interop); BCF I/O templates in cnv.h are parsed but never
// instantiated (declaration-only htslib shim).
//
// stdin, one case per line (arrays are comma-separated):
//   SEGMENT <penalty> <kmin> <y...>                    (raw cnvSegment)
//   BP      <minClip> <targetExpCov> <fragUniq> <meanisize> <ploidy>
//           <minBpSupport> <gclo> <gchi> <reflen>
//           <gc...> <uniq...> <cov...> <gcbias_cov...> <clips...|->
//   RD      <minClip> <targetExpCov> <fragUniq> <meanisize> <ploidy>
//           <minBpSupport> <penalty> <cnMergeTol> <window_size>
//           <minCnvSize> <gclo> <gchi> <reflen>
//           <gc...> <uniq...> <cov...> <gcbias_cov...> <clips...|->
//   GT      <fragUniq> <meanisize> <ploidy> <gclo> <gchi> <reflen>
//           <regWin> <gc...> <uniq...> <cov...> <covUniq...>
//           <covMap...> <gcbias_cov...> <tilefac...|->
//           <cnvs "s:e;s:e;..."|->                     (genotypeCNVs)
// stdout, one line per case:
//   SEGMENT: <bnd,...|->
//   BP:      "pos,cil,cih,qual,sup|..." or "-"
//   RD:      "chr,start,end,cil,cih,cel,ceh,srl,srr,cn%.17g,map%.17g|..."
//   GT:      "cn%.17g,map%.17g,uf%.17g,sd%.17g|..." or "-"
#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "probe_common.hpp"

#include <boost/math/special_functions/round.hpp>

#define MAX_CN 10  // util.h:25-27

namespace torali {
// version.h / util.h symbols named by the uninstantiated cnvVCF
extern std::string dellyVersionNumber;
struct cstyle_str {
  const char* operator()(std::string const& s) const { return s.c_str(); }
};
}  // namespace torali

namespace torali {
// util.h:42-66 — the CNV record (util.h itself needs htslib, so the
// plain struct is restated here for the probe).
struct CNV {
  int32_t chr, start, end;
  int32_t ciposlow, ciposhigh, ciendlow, ciendhigh;
  int32_t qval, srleft, srright;
  double cn, mappable, uniqfrac, sd;
  std::string id;
  CNV()
      : chr(0), start(0), end(0), ciposlow(0), ciposhigh(0),
        ciendlow(0), ciendhigh(0), qval(0), srleft(0), srright(0),
        cn(-1), mappable(0), uniqfrac(-1), sd(1), id("") {}
  CNV(int32_t c, int32_t s, int32_t e, int32_t cil, int32_t cih,
      int32_t cel, int32_t ceh, double estcn, double mp)
      : chr(c), start(s), end(e), ciposlow(cil), ciposhigh(cih),
        ciendlow(cel), ciendhigh(ceh), qval(0), srleft(0), srright(0),
        cn(estcn), mappable(mp), uniqfrac(-1), sd(1), id("") {}
  bool operator<(const CNV& o) const {
    return ((chr < o.chr) || ((chr == o.chr) && (start < o.start)) ||
            ((chr == o.chr) && (start == o.start) && (end < o.end)) ||
            ((chr == o.chr) && (start == o.start) && (end == o.end) &&
             (cn < o.cn)));
  }
};
// gcbias.h:24-35 — only .coverage is read by the segmentation plane.
struct GcBias {
  double coverage;
};
}  // namespace torali

#define UTIL_H  // cnv.h's util.h include (types restated above)

#include "cnv.h"

using namespace torali;

struct Cfg {
  int32_t minClip;
  double targetExpCov;
  float fragmentUnique;
  int32_t meanisize;
  uint32_t ploidy;
  uint32_t minBpSupport;
  float penalty;
  float cnMergeTol;
  uint32_t window_size;
  uint32_t minCnvSize;
};

// genotypeCNVs field types exactly as CountDNAConfig declares them
// (coral.h:42,53,60): float fragmentUnique/ploidy, uint32 meanisize —
// the uniqueness gate and the CN math see float32 products.
struct GtCfg {
  float fragmentUnique;
  uint32_t meanisize;
  float ploidy;
};

template <typename T>
static std::vector<T> arr(std::istringstream& ss) {
  std::string tok;
  ss >> tok;
  std::vector<T> out;
  if (tok == "-") return out;
  std::istringstream ls(tok);
  std::string item;
  while (std::getline(ls, item, ',')) out.push_back((T)std::stod(item));
  return out;
}

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op == "GT") {
      GtCfg c;
      uint32_t gclo, gchi, regWin;
      int32_t reflen;
      ss >> c.fragmentUnique >> c.meanisize >> c.ploidy >> gclo >>
          gchi >> reflen >> regWin;
      std::vector<uint16_t> gc = arr<uint16_t>(ss);
      std::vector<uint16_t> uniq = arr<uint16_t>(ss);
      std::vector<uint16_t> cov = arr<uint16_t>(ss);
      std::vector<uint16_t> covUniq = arr<uint16_t>(ss);
      std::vector<uint16_t> covMap = arr<uint16_t>(ss);
      std::vector<double> gcov = arr<double>(ss);
      std::vector<float> tileFac = arr<float>(ss);
      std::vector<GcBias> gcbias(gcov.size());
      for (std::size_t i = 0; i < gcov.size(); ++i)
        gcbias[i].coverage = gcov[i];
      std::string cnvtok;
      ss >> cnvtok;
      std::vector<CNV> cnvs;
      if (cnvtok != "-") {
        std::istringstream cs(cnvtok);
        std::string one;
        while (std::getline(cs, one, ';')) {
          std::size_t colon = one.find(':');
          cnvs.emplace_back(0, std::stoi(one.substr(0, colon)),
                            std::stoi(one.substr(colon + 1)), 0, 0, 0,
                            0, 0.0, 0.0);
        }
      }
      uint32_t tlen[1] = {(uint32_t)reflen};
      bam_hdr_t hdr;
      hdr.n_targets = 1;
      hdr.target_len = tlen;
      hdr.target_name = nullptr;
      std::pair<uint32_t, uint32_t> gcbound(gclo, gchi);
      genotypeCNVs(c, gcbound, gc, uniq, gcbias, tileFac, regWin, cov,
                   covUniq, covMap, &hdr, 0, cnvs);
      if (cnvs.empty()) std::cout << '-';
      bool first = true;
      char buf[64];
      for (auto const& v : cnvs) {
        std::cout << (first ? "" : "|");
        std::snprintf(buf, sizeof buf, "%.17g", v.cn);
        std::cout << buf << ',';
        std::snprintf(buf, sizeof buf, "%.17g", v.mappable);
        std::cout << buf << ',';
        std::snprintf(buf, sizeof buf, "%.17g", v.uniqfrac);
        std::cout << buf << ',';
        std::snprintf(buf, sizeof buf, "%.17g", v.sd);
        std::cout << buf;
        first = false;
      }
      std::cout << '\n';
    } else if (op == "SEGMENT") {
      double penalty;
      int kmin;
      ss >> penalty >> kmin;
      std::vector<double> y = arr<double>(ss);
      std::vector<int32_t> bnd;
      cnvSegment(y, penalty, kmin, bnd);
      if (bnd.empty()) std::cout << '-';
      for (std::size_t i = 0; i < bnd.size(); ++i)
        std::cout << (i ? "," : "") << bnd[i];
      std::cout << '\n';
    } else if (op == "BP" || op == "RD") {
      Cfg c;
      uint32_t gclo, gchi;
      int32_t reflen;
      ss >> c.minClip >> c.targetExpCov >> c.fragmentUnique >>
          c.meanisize >> c.ploidy >> c.minBpSupport;
      if (op == "RD")
        ss >> c.penalty >> c.cnMergeTol >> c.window_size >>
            c.minCnvSize;
      ss >> gclo >> gchi >> reflen;
      std::vector<uint16_t> gc = arr<uint16_t>(ss);
      std::vector<uint16_t> uniq = arr<uint16_t>(ss);
      std::vector<uint16_t> cov = arr<uint16_t>(ss);
      std::vector<double> gcov = arr<double>(ss);
      std::vector<int32_t> clips = arr<int32_t>(ss);
      std::vector<GcBias> gcbias(gcov.size());
      for (std::size_t i = 0; i < gcov.size(); ++i)
        gcbias[i].coverage = gcov[i];
      uint32_t tlen[1] = {(uint32_t)reflen};
      bam_hdr_t hdr;
      hdr.n_targets = 1;
      hdr.target_len = tlen;
      hdr.target_name = nullptr;
      std::pair<uint32_t, uint32_t> gcbound(gclo, gchi);
      std::vector<SVBreakpoint> chrbp;
      collectBreakpoints(c, gcbound, gc, uniq, gcbias, cov, &hdr, 0,
                         clips, chrbp);
      if (op == "BP") {
        if (chrbp.empty()) std::cout << '-';
        bool first = true;
        for (auto const& b : chrbp) {
          std::cout << (first ? "" : "|") << b.pos << ',' << b.cilow
                    << ',' << b.cihigh << ',' << b.qual << ','
                    << b.support;
          first = false;
        }
        std::cout << '\n';
      } else {
        std::vector<CNV> cnvs;
        segmentRD(c, gcbound, gc, uniq, gcbias, std::vector<float>(),
                  0u, cov, &hdr, 0, chrbp, cnvs);
        mergeAdjacentSameCN(cnvs, (double)c.cnMergeTol);
        if (cnvs.empty()) std::cout << '-';
        bool first = true;
        char buf[64];
        for (auto const& v : cnvs) {
          std::cout << (first ? "" : "|") << v.chr << ',' << v.start
                    << ',' << v.end << ',' << v.ciposlow << ','
                    << v.ciposhigh << ',' << v.ciendlow << ','
                    << v.ciendhigh << ',' << v.srleft << ','
                    << v.srright << ',';
          std::snprintf(buf, sizeof buf, "%.17g", v.cn);
          std::cout << buf << ',';
          std::snprintf(buf, sizeof buf, "%.17g", v.mappable);
          std::cout << buf;
          first = false;
        }
        std::cout << '\n';
      }
    }
    std::cout.flush();
  }
  return 0;
}
