// Differential-oracle probe #8: drives the REFERENCE RD-scan window
// selection and GC-bias curve math (/root/reference/src/scan.h and
// gcbias.h, included as-is) so delly_tpu/models/{scan,gcbias}.py can
// be fuzzed against the real reference code actually executing:
// estCountBounds median/MAD bounds (scan.h:51-70), selectWindows
// uniqueness + CN2 gating incl. the scan-file rescale (scan.h:234-281),
// gcBound percentile clipping (gcbias.h:37-50), regCorrFactor binning
// (gcbias.h:53-61) and smoothFillCurve hole-filling + 3-bin smoothing
// (gcbias.h:63-88).  The BAM/fasta driver templates parse against
// declaration-only shims and are never instantiated.
//
// stdin, one case per line (arrays comma-separated):
//   BOUNDS  <nchr> [<n> <start,end,cov,uniqcov,select> ...]...
//   SELECT  <noSel> <hasScanFile> <uniqRatio> <nchr> [windows...]
//   GCBOUND <exclgc> <n> <pctSample,pctRef> ...
//   REGCORR <gcfrac> <regcorr...|->
//   SMOOTH  <curve...|-> <weight...|->
// stdout, one line per case:
//   BOUNDS:  <lower> <upper>
//   SELECT:  select flags + rescaled cov/uniqcov per window
//   GCBOUND: <lower> <upper>
//   REGCORR: <factor %.17g>
//   SMOOTH:  <curve... %.17g>
#include <cstdio>
#include <iostream>
#include <sstream>

#include "probe_common.hpp"

int faidx_seq_len(const faidx_t*, const char*);

#define UTIL_H  // scan.h/gcbias.h util include (helpers restated below)
#define LAST_BIN 65535  // util.h:21-23

namespace torali {
// util.h:29-40 — library insert-size summary (plain struct restated)
struct LibraryInfo {
  int32_t rs = 0;
  int32_t median = 0;
  int32_t mad = 0;
  int32_t minNormalISize = 0;
  int32_t minISizeCutoff = 0;
  int32_t maxNormalISize = 0;
  int32_t maxISizeCutoff = 0;
  uint32_t abnormal_pairs = 0;
};
std::size_t hash_pair(bam1_t*);
std::size_t hash_pair_mate(bam1_t*);
uint32_t alignmentLength(bam1_t*);
uint32_t halfAlignmentLength(bam1_t*);
}  // namespace torali

#include "scan.h"

#include "gcbias.h"

using namespace torali;

struct Cfg {
  bool noScanWindowSelection;
  bool hasScanFile;
  float uniqueToTotalCovRatio;
  float exclgc;
};

static std::vector<double> arr(std::istringstream& ss) {
  std::string tok;
  ss >> tok;
  std::vector<double> out;
  if (tok == "-") return out;
  std::istringstream ls(tok);
  std::string item;
  while (std::getline(ls, item, ',')) out.push_back(std::stod(item));
  return out;
}

static std::vector<std::vector<ScanWindow> > readWindows(
    std::istringstream& ss) {
  int nchr;
  ss >> nchr;
  std::vector<std::vector<ScanWindow> > sc(nchr);
  for (int r = 0; r < nchr; ++r) {
    int n;
    ss >> n;
    for (int i = 0; i < n; ++i) {
      std::vector<double> f = arr(ss);
      ScanWindow w;
      w.start = (int32_t)f[0];
      w.end = (int32_t)f[1];
      w.cov = (uint32_t)f[2];
      w.uniqcov = (uint32_t)f[3];
      w.select = f[4] != 0;
      sc[r].push_back(w);
    }
  }
  return sc;
}

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op == "BOUNDS") {
      auto sc = readWindows(ss);
      std::pair<uint32_t, uint32_t> b = estCountBounds(sc);
      std::cout << b.first << ' ' << b.second << '\n';
    } else if (op == "SELECT") {
      Cfg c;
      c.exclgc = 0;
      int nosel, hasfile;
      ss >> nosel >> hasfile >> c.uniqueToTotalCovRatio;
      c.noScanWindowSelection = nosel != 0;
      c.hasScanFile = hasfile != 0;
      auto sc = readWindows(ss);
      selectWindows(c, sc);
      bool first = true;
      for (auto const& chrw : sc)
        for (auto const& w : chrw) {
          std::cout << (first ? "" : "|") << (w.select ? 1 : 0) << ','
                    << w.cov << ',' << w.uniqcov;
          first = false;
        }
      if (first) std::cout << '-';
      std::cout << '\n';
    } else if (op == "GCBOUND") {
      Cfg c;
      int n;
      ss >> c.exclgc >> n;
      std::vector<GcBias> gcb(n);
      for (int i = 0; i < n; ++i) {
        std::vector<double> f = arr(ss);
        gcb[i].percentileSample = f[0];
        gcb[i].percentileReference = f[1];
      }
      std::pair<uint32_t, uint32_t> b = gcBound(c, gcb);
      std::cout << b.first << ' ' << b.second << '\n';
    } else if (op == "REGCORR") {
      double gcfrac;
      ss >> gcfrac;
      std::vector<double> rc = arr(ss);
      std::printf("%.17g\n", regCorrFactor(rc, gcfrac));
    } else if (op == "SMOOTH") {
      std::vector<double> curve = arr(ss);
      std::vector<double> weight = arr(ss);
      smoothFillCurve(curve, weight);
      for (std::size_t i = 0; i < curve.size(); ++i)
        std::printf("%s%.17g", i ? "," : "", curve[i]);
      if (curve.empty()) std::printf("-");
      std::printf("\n");
    }
    std::cout.flush();
    std::fflush(stdout);
  }
  return 0;
}
