// Differential-oracle probe #23: the CNV BCF emission plane.
// Compiles the reference's cnv.h AS-IS and runs the real
// mergeAdjacentSameCN (/root/reference/src/cnv.h:205-234), cnvVCF
// (:558-742, with _computeCNLs from bolog.h and the LowQual /
// CN==ploidy / callable-fraction gates) and the re-genotyping reader
// parseVcfCNV (:463-555) over the functional text-mode vcf layer, so
// delly_tpu/models/cnv.py's cnv_vcf / merge_adjacent_same_cn /
// parse_vcf_cnv can be byte-compared.
//
// stdin, one case per line:
//   CNVEMIT <ploidy> <cnMinCallable> <cnMergeTol> <hasGenoFile 0/1>
//           <nchr> <chrlens,csv> <ncnv>
//           per cnv: <chr,start,end,cil,cih,cel,ceh,qval,srl,srr>
//                    <cn> <mappable> <uniqfrac> <sd> <id|.>
//   -> VCF body lines joined by '\x01', or "-"
//   CNVPARSE <vcfpath> <nchr>
//   -> parsed CNVs "chr,start,end,cil,cih,cel,ceh,qval,srl,srr,
//      cn%g,mappable%g,id" joined by '|', or "-"
#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <set>
#include <sstream>

#include "probe_common.hpp"

#include <boost/filesystem.hpp>
#include <boost/multi_array.hpp>
#include <boost/unordered_map.hpp>

#include "probe_replay.hpp"

#include "vcf_text_replay.hpp"

// gregorian date rendering named by cnvVCF's fileDate line
namespace boost {
namespace posix_time {
gregorian::date ptime::date() const { return gregorian::date(); }
}  // namespace posix_time
namespace gregorian {
std::string to_iso_string(date) { return std::string("19700101"); }
}  // namespace gregorian
}  // namespace boost

namespace torali {
// util.h:42-66 — CNV record (restated data layout, as cnv_probe.cpp)
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
  bool operator<(const CNV& o) const {
    return ((chr < o.chr) || ((chr == o.chr) && (start < o.start)) ||
            ((chr == o.chr) && (start == o.start) && (end < o.end)) ||
            ((chr == o.chr) && (start == o.start) && (end == o.end) &&
             (cn < o.cn)));
  }
};
// gcbias.h:24-35 — only .coverage is read by the segmentation plane
struct GcBias {
  double coverage;
};
// modvcf.h:137-141 — string -> const char* functor
struct cstyle_str {
  const char* operator()(const std::string& s) { return s.c_str(); }
};
}  // namespace torali

#define UTIL_H  // types restated above / pulled via probe_common
#define MAX_CN 10

#include "version.h"

#include "bolog.h"

#include "cnv.h"

using namespace torali;

struct Cfg {
  uint32_t ploidy;
  float cnMinCallable;
  float cnMergeTol;
  bool hasGenoFile = false;
  bool hasSegFile = false;
  std::string sampleName = "0";
  boost::filesystem::path bamFile;
  boost::filesystem::path genome;
  boost::filesystem::path outfile;
  boost::filesystem::path segfile;
  boost::filesystem::path genofile;
};

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op == "CNVPARSE") {
      std::string vcfpath;
      int nchr;
      ss >> vcfpath >> nchr;
      g_tlen.assign(nchr, 1u << 30);
      replaySetTargetNames();
      Cfg c;
      c.genofile = boost::filesystem::path(vcfpath);
      bam_hdr_t* hdr = sam_hdr_read(nullptr);
      std::vector<CNV> cnvs;
      parseVcfCNV(c, hdr, cnvs);
      bool first = true;
      for (auto const& v : cnvs) {
        char cnb[32], mpb[32];
        std::snprintf(cnb, sizeof(cnb), "%g", v.cn);
        std::snprintf(mpb, sizeof(mpb), "%g", v.mappable);
        std::cout << (first ? "" : "|") << v.chr << ',' << v.start
                  << ',' << v.end << ',' << v.ciposlow << ','
                  << v.ciposhigh << ',' << v.ciendlow << ','
                  << v.ciendhigh << ',' << v.qval << ',' << v.srleft
                  << ',' << v.srright << ',' << cnb << ',' << mpb
                  << ',' << (v.id.empty() ? "." : v.id);
        first = false;
      }
      if (first) std::cout << '-';
      std::cout << '\n';
      std::cout.flush();
      continue;
    }
    if (op != "CNVEMIT") continue;
    Cfg c;
    int geno, nchr, ncnv;
    std::string lens;
    ss >> c.ploidy >> c.cnMinCallable >> c.cnMergeTol >> geno >> nchr >>
        lens;
    c.hasGenoFile = geno != 0;
    g_tlen.clear();
    {
      std::istringstream ls(lens);
      std::string item;
      while (std::getline(ls, item, ','))
        g_tlen.push_back(std::stoul(item));
    }
    replaySetTargetNames();
    g_files.assign(1, std::map<int, std::vector<bam1_t> >());
    c.bamFile = boost::filesystem::path("0");
    c.outfile = boost::filesystem::path("-");
    ss >> ncnv;
    std::vector<CNV> cnvs(ncnv);
    for (int i = 0; i < ncnv; ++i) {
      std::string meta, cn, mp, uq, sd, id;
      ss >> meta >> cn >> mp >> uq >> sd >> id;
      std::istringstream ms(meta);
      std::string item;
      std::vector<long> f;
      while (std::getline(ms, item, ',')) f.push_back(std::stol(item));
      CNV& v = cnvs[i];
      v.chr = (int32_t)f[0];
      v.start = (int32_t)f[1];
      v.end = (int32_t)f[2];
      v.ciposlow = (int32_t)f[3];
      v.ciposhigh = (int32_t)f[4];
      v.ciendlow = (int32_t)f[5];
      v.ciendhigh = (int32_t)f[6];
      v.qval = (int32_t)f[7];
      v.srleft = (int32_t)f[8];
      v.srright = (int32_t)f[9];
      v.cn = std::atof(cn.c_str());
      v.mappable = std::atof(mp.c_str());
      v.uniqfrac = std::atof(uq.c_str());
      v.sd = std::atof(sd.c_str());
      v.id = (id == ".") ? std::string() : id;
    }

    // coral() emission order (coral.h:418-424)
    if (!c.hasGenoFile) mergeAdjacentSameCN(cnvs, c.cnMergeTol);
    cnvVCF(c, cnvs);

    std::string out;
    std::istringstream vs(g_vcf_stdout);
    std::string vline;
    while (std::getline(vs, vline)) {
      if (!vline.empty() && vline[0] == '#') continue;
      if (!out.empty()) out += '\x01';
      out += vline;
    }
    if (out.empty()) out = "-";
    std::cout << out << '\n';
    std::cout.flush();
  }
  return 0;
}
