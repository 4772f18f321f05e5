// Differential-oracle probe #24: the REFERENCE CNV counting driver.
// Compiles /root/reference/src/coral.h sliced at its program_options
// CLI function (fixture slices off `int coral(...)`) and EXECUTES the
// real bamCount end-to-end over the functional replay layers: the
// per-chromosome GC track (sliding fragment window, coral.h:140-162),
// regional tile factors (:164-179), coverage + clip collection
// (:182-258 with the real addBaseCoverage / addSplitReadBreakpoints
// sliced from util.h), the callable/uniqueness masks and hom-del vs
// unmappable run logic (:260-281, 352-393), adaptive and fixed
// read-depth windows with covfile logR/CN emission (:296-414,
// captured through the filtering_ostream shim), segmentation +
// genotyping via the real cnv.h, and the coral()-order tail
// (sort -> mergeAdjacentSameCN -> cnvVCF, :418-424) over the
// text-mode vcf layer — so delly_tpu/models/coral.py::bam_count can
// be byte-compared on covfile rows AND the emitted CNV VCF body.
//
// stdin, one case per line:
//   BAMCOUNT <minQual> <mapqUniq> <minClip> <minRefSep> <minBpSupport>
//     <penalty> <cnMergeTol> <cnMinCallable> <minCnvSize> <meanisize>
//     <window_size> <window_offset> <fracWindow> <fragmentUnique>
//     <uniqueToTotalCovRatio> <ploidy> <ctrlPloidy> <expectedCN>
//     <purity> <basecov 0/1> <adaptive 0/1> <targetExpCov>
//     <minNormalISize> <maxNormalISize> <regWin> <gclo> <gchi>
//     <refIdx csv|-> <genofile|-> <nchr> <chrlens csv>
//     <seq per chr ...> <gcbias_cov csv> <regcorr csv|->
//     <nrec> [<qname> <tid,pos,flag,mapq,mtid,mpos,isize> <cigar>
//             <seq|.>]...
// stdout, one line per case:
//   <covfile rows joined by \x01 or -> \x02 <VCF body joined by \x01
//   or ->
#include <algorithm>
#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <set>
#include <sstream>

#include "probe_common.hpp"

#include <boost/dynamic_bitset.hpp>
#include <boost/filesystem.hpp>
#include <boost/iostreams/device/file.hpp>
#include <boost/iostreams/filter/gzip.hpp>
#include <boost/iostreams/filtering_stream.hpp>
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

// functional faidx over in-memory chromosomes (numeric names)
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
  std::string const& s = g_chrseq[std::atoi(tname)];
  return s.empty() ? -1 : (int)s.size();  // htslib: -1 when absent
}

namespace torali {
// 64-bit read-id recipe shared with delly_tpu/utils/hashing.py (map
// keys only: distinct qnames -> distinct keys, READ1 id-1 invariant)
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
inline std::size_t hash_sr(bam1_t* rec) {
  const char* q = bam_get_qname(rec);
  std::size_t seed = hashCombine64(hash_string(q), fnv1a64(q));
  if ((rec->core.flag & BAM_FREAD1) && (seed > 0)) --seed;
  return seed;
}
inline std::size_t hash_pair(bam1_t* rec) {
  std::size_t seed = hash_string(bam_get_qname(rec));
  seed = hashCombine64(seed, (std::size_t)(uint32_t)rec->core.tid);
  seed = hashCombine64(seed, (std::size_t)(uint32_t)rec->core.pos);
  seed = hashCombine64(seed, (std::size_t)(uint32_t)rec->core.mtid);
  seed = hashCombine64(seed, (std::size_t)(uint32_t)rec->core.mpos);
  return seed;
}
inline std::size_t hash_pair_mate(bam1_t* rec) {
  std::size_t seed = hash_string(bam_get_qname(rec));
  seed = hashCombine64(seed, (std::size_t)(uint32_t)rec->core.mtid);
  seed = hashCombine64(seed, (std::size_t)(uint32_t)rec->core.mpos);
  seed = hashCombine64(seed, (std::size_t)(uint32_t)rec->core.tid);
  seed = hashCombine64(seed, (std::size_t)(uint32_t)rec->core.pos);
  return seed;
}
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
// modvcf.h:137-141 — string -> const char* functor
struct cstyle_str {
  const char* operator()(const std::string& s) { return s.c_str(); }
};
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
}  // namespace torali

#define UTIL_H   // helpers restated above + real slices below
#define LAST_BIN 65535
#define MAX_CN 10

namespace torali {
// util.h gzip probe named (never executed) by bed.h's BED reader
inline bool is_gz(boost::filesystem::path const&) { return false; }
}  // namespace torali

// real reference code sliced by the test fixture: alignmentLength,
// halfAlignmentLength, addBaseCoverage, addSplitReadBreakpoints,
// chrNoData (util.h:440-499, 612-625)
#include "util_coral_slice.h"

#include "version.h"

#include "bolog.h"

// real reference code sliced by the test fixture: coral.h minus its
// program_options CLI function (pulls scan.h / gcbias.h / cnv.h /
// bed.h as-is)
#include "coral_sliced.h"

using namespace torali;

static std::vector<uint32_t> parseCigar(std::string const& s) {
  std::vector<uint32_t> out;
  if (s == "*") return out;
  const char* ops = "MIDNSHP=X";
  uint32_t len = 0;
  for (char ch : s) {
    if (ch >= '0' && ch <= '9') {
      len = len * 10 + (ch - '0');
    } else {
      const char* p = std::strchr(ops, ch);
      out.push_back((len << 4) | (uint32_t)(p - ops));
      len = 0;
    }
  }
  return out;
}

static std::vector<double> csv(std::istringstream& ss) {
  std::string tok;
  ss >> tok;
  std::vector<double> out;
  if (tok == "-") return out;
  std::istringstream ls(tok);
  std::string item;
  while (std::getline(ls, item, ',')) out.push_back(std::stod(item));
  return out;
}

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op != "BAMCOUNT") continue;
    CountDNAConfig c;
    int basecov, adaptive, nchr, nrec, minNorm, maxNorm;
    uint32_t regWin, gclo, gchi;
    std::string refidx, genofile, lens;
    ss >> c.minQual >> c.mapqUniq >> c.minClip >> c.minRefSep >>
        c.minBpSupport >> c.penalty >> c.cnMergeTol >> c.cnMinCallable >>
        c.minCnvSize >> c.meanisize >> c.window_size >> c.window_offset >>
        c.fracWindow >> c.fragmentUnique >> c.uniqueToTotalCovRatio >>
        c.ploidy >> c.ctrlPloidy >> c.expectedCN >> c.purity >> basecov >>
        adaptive >> c.targetExpCov >> minNorm >> maxNorm >> regWin >>
        gclo >> gchi >> refidx >> genofile >> nchr >> lens;
    c.basecov = basecov != 0;
    c.adaptive = adaptive != 0;
    c.hasGenoFile = genofile != "-";
    if (c.hasGenoFile) c.genofile = boost::filesystem::path(genofile);
    c.hasSegFile = false;
    c.sampleName = "0";
    c.bamFile = boost::filesystem::path("0");
    c.genome = boost::filesystem::path("0");
    c.covfile = boost::filesystem::path("cap");  // captured via shim
    c.outfile = boost::filesystem::path("-");
    c.nchr = (uint32_t)nchr;
    c.refIdx.clear();
    if (refidx != "-") {
      std::istringstream rs(refidx);
      std::string item;
      while (std::getline(rs, item, ','))
        c.refIdx.insert((int32_t)std::stol(item));
    }
    g_tlen.clear();
    {
      std::istringstream ls(lens);
      std::string item;
      while (std::getline(ls, item, ','))
        g_tlen.push_back(std::stoul(item));
    }
    g_chrseq.assign(nchr, "");
    for (int t = 0; t < nchr; ++t) ss >> g_chrseq[t];
    replaySetTargetNames();
    std::vector<GcBias> gcbias(c.meanisize + 1);
    {
      std::vector<double> gv = csv(ss);
      for (std::size_t i = 0; i < gv.size() && i < gcbias.size(); ++i)
        gcbias[i].coverage = gv[i];
    }
    std::vector<double> regcorr = csv(ss);
    LibraryInfo li;
    li.minNormalISize = minNorm;
    li.maxNormalISize = maxNorm;

    g_files.assign(1, std::map<int, std::vector<bam1_t> >());
    ss >> nrec;
    for (int i = 0; i < nrec; ++i) {
      std::string qn, meta, cig, seq;
      ss >> qn >> meta >> cig >> seq;
      std::istringstream ms(meta);
      std::string item;
      std::vector<long> f;
      while (std::getline(ms, item, ',')) f.push_back(std::stol(item));
      bam1_t r;
      r.core = bam1_core_t{};
      r.qname_ = qn;
      r.core.tid = (int32_t)f[0];
      r.core.pos = (int32_t)f[1];
      r.core.flag = (uint16_t)f[2];
      r.core.qual = (uint8_t)f[3];
      r.core.mtid = (int32_t)f[4];
      r.core.mpos = (int32_t)f[5];
      r.core.isize = f[6];
      r.cigar_ = parseCigar(cig);
      r.core.n_cigar = (uint32_t)r.cigar_.size();
      if (seq == ".") seq.clear();
      r.core.l_qseq = (int32_t)seq.size();
      g_files[0][r.core.tid].push_back(r);
    }

    std::ostringstream cov_cap;
    boost::iostreams::filtering_ostream::capture = &cov_cap;
    g_vcf_stdout.clear();
    int rc = bamCount(c, li, gcbias, std::make_pair(gclo, gchi),
                      regcorr, regWin);
    boost::iostreams::filtering_ostream::capture = nullptr;
    if (rc != 0) {
      std::cout << "ERR\n";
      std::cout.flush();
      continue;
    }
    std::string covout;
    {
      std::istringstream cs(cov_cap.str());
      std::string cl;
      while (std::getline(cs, cl)) {
        if (!covout.empty()) covout += '\x01';
        covout += cl;
      }
    }
    if (covout.empty()) covout = "-";
    std::string vcfout;
    {
      std::istringstream vs(g_vcf_stdout);
      std::string vl;
      while (std::getline(vs, vl)) {
        if (!vl.empty() && vl[0] == '#') continue;
        if (!vcfout.empty()) vcfout += '\x01';
        vcfout += vl;
      }
    }
    if (vcfout.empty()) vcfout = "-";
    std::cout << covout << '\x02' << vcfout << '\n';
    std::cout.flush();
  }
  return 0;
}
