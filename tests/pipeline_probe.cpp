// Differential-oracle probe #16: the FULL short-read pipeline golden
// oracle.  Compiles the reference's shortpe.h (scanPEandSR +
// assembleSplitReads + mergeSort), coverage.h (annotateCoverage) and
// modvcf.h (vcfOutput) AS-IS, and drives them in the exact dellyRun
// stage order (/root/reference/src/delly.h:86-196: scan -> assemble ->
// mergeSort -> sort+renumber -> annotateCoverage -> vcfOutput) over the
// functional htslib replay layer + in-memory faidx, with a functional
// TEXT-MODE htslib vcf layer underneath vcfOutput, so the whole
// BAM -> VCF body can be byte-compared against delly_tpu's run_sr on
// identical inputs: PASS/LowQual site-filter rules (modvcf.h:475-482),
// SVLEN sign conventions (:527-536), END/CHR2/POS2, the full INFO
// ordering, GL->PL (:671-683), HP-based het phasing (:686-699),
// RDCN = iround(2RC/(RCL+RCR)) (:702-711), AC/AN (:722-733), and the
// totalGtSup>=2 discovery gate (:464-472).
//
// The text renderer follows htslib's VCF rendering rules (%g floats,
// "." for missing ints, GT phase bits) so both sides meet on the same
// textual plane; delly_tpu's side renders through io/bcf.py
// bcf_to_vcf_text which implements the same rules.
//
// Hash functions implement the repo's documented 64-bit recipe
// (utils/hashing.py) — values are map keys only; both sides are driven
// with the same functions.
//
// stdin, one case per line:
//   PIPE <minMapQual> <minTraQual> <minGenoQual> <madCutoff> <minClip>
//        <minCliqueSize> <minRefSep> <maxReadSep> <maxGenoReadCount>
//        <maxReadPerSV> <graphPruning> <minConsWindow> <nchr>
//        <chrlens,csv> <seq...per chr> <nrec>
//        per rec: <qname> <tid,pos,flag,mapq,mtid,mpos,isize> <cigar>
//                 <seq|.>
// stdout, one line per case: VCF body lines joined by '\x01', or "-"
#include <algorithm>
#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <map>
#include <set>
#include <sstream>
#include <unordered_map>
#include <unordered_set>

#include "probe_common.hpp"

#include <boost/container/flat_set.hpp>
#include <boost/dynamic_bitset.hpp>
#include <boost/filesystem.hpp>
#include <boost/icl/split_interval_map.hpp>
#include <boost/iostreams/device/file.hpp>
#include <boost/iostreams/filter/gzip.hpp>
#include <boost/iostreams/filtering_stream.hpp>
#include <boost/multi_array.hpp>
#include <boost/unordered_map.hpp>

#include "probe_replay.hpp"

// ---------- functional in-memory faidx (numeric contig names) ----------
static std::vector<std::string> g_chrseq;
struct faidx_t {};
faidx_t* fai_load(const char*) {
  static faidx_t f;
  return &f;
}
void fai_destroy(faidx_t*) {}
char* faidx_fetch_seq(const faidx_t*, const char* tname, int lo, int hi,
                      int* seqlen) {
  // htslib clamps out-of-range requests
  int tid = std::atoi(tname);
  std::string const& s = g_chrseq[tid];
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
  return (int)g_chrseq[std::atoi(tname)].size();
}

// functional text-mode htslib vcf layer (shared multi-file reader/
// writer; vcfOutput writes to "-" -> g_vcf_stdout, and the -v
// re-genotyping mode reads a real VCF text file through vcfParse)
#include "vcf_text_replay.hpp"

// gregorian date rendering named by vcfOutput's fileDate line (the
// header is excluded from comparison; any fixed token works)
namespace boost {
namespace posix_time {
gregorian::date ptime::date() const { return gregorian::date(); }
}  // namespace posix_time
namespace gregorian {
std::string to_iso_string(date) { return std::string("19700101"); }
}  // namespace gregorian
}  // namespace boost

namespace torali {
// 64-bit read-id recipe shared with delly_tpu/utils/hashing.py
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
inline std::size_t hash_lr(bam1_t* rec) {
  const char* q = bam_get_qname(rec);
  return hashCombine64(hash_string(q), fnv1a64(q));
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
// util.h:440-452 — reference-consuming CIGAR length
inline uint32_t alignmentLength(bam1_t const* rec) {
  const uint32_t* cigar = bam_get_cigar(rec);
  uint32_t alen = 0;
  for (uint32_t i = 0; i < rec->core.n_cigar; ++i) {
    int op = bam_cigar_op(cigar[i]);
    if (op == BAM_CMATCH || op == BAM_CEQUAL || op == BAM_CDIFF ||
        op == BAM_CDEL || op == BAM_CREF_SKIP)
      alen += bam_cigar_oplen(cigar[i]);
  }
  return alen;
}
inline uint32_t halfAlignmentLength(bam1_t const* rec) {
  return alignmentLength(rec) / 2;
}
// util.h:429-438
inline int32_t readLength(bam1_t const* rec) {
  const uint32_t* cigar = bam_get_cigar(rec);
  int32_t hc = 0;
  for (uint32_t ci = 0; ci < rec->core.n_cigar; ++ci)
    if (bam_cigar_op(cigar[ci]) == BAM_CHARD_CLIP)
      hc += bam_cigar_oplen(cigar[ci]);
  return (int32_t)rec->core.l_qseq + hc;
}
// util.h:78-84 — nth_element median
template <typename TValue>
inline TValue medianVector(std::vector<TValue>& v) {
  std::size_t n = v.size() / 2;
  std::nth_element(v.begin(), v.begin() + n, v.end());
  return v[n];
}
// util.h:29-40
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
// util.h:759-768
template <typename TConfig>
inline int32_t getVariability(TConfig const&,
                              std::vector<LibraryInfo> const& lib) {
  int32_t v = 0;
  for (uint32_t i = 0; i < lib.size(); ++i) {
    if (lib[i].maxNormalISize > v) v = lib[i].maxNormalISize;
    if (lib[i].rs > v) v = lib[i].rs;
  }
  return v;
}
// util.h:69-76 — per-SV read-count record
struct ReadCount {
  int32_t leftRC;
  int32_t rc;
  int32_t rightRC;
  ReadCount() : leftRC(0), rc(0), rightRC(0) {}
  ReadCount(int32_t l, int32_t m, int32_t r)
      : leftRC(l), rc(m), rightRC(r) {}
};
struct Graph {
  boost::unordered_map<std::string, uint32_t> smap;
};
bool isBamCram(std::string const&);
// named (not instantiated) inside vcfParse — util.h:287-326
int32_t _decodeOrientation(std::string const&, std::string const&);
}  // namespace torali

#define UTIL_H       // helpers restated above / pulled via probe_common
#define PANGENOME_H  // graph path never instantiated
#define MAX_CN 10    // util.h:25-27

// real reference code sliced by the test fixture (UTIL_H predefined):
// getLibraryParams (util.h:771-891) + entropy (util.h:565-579)
#include "util_pipeline_slice.h"

#include "threadpool.h"

#include "shortpe.h"

#include "modvcf.h"

using namespace torali;

struct Cfg {
  uint16_t minMapQual;
  uint16_t minTraQual;
  uint16_t minGenoQual;
  uint16_t madCutoff;
  uint16_t madNormalCutoff = 5;
  int32_t nchr;
  int32_t minimumFlankSize = 13;
  int32_t indelsize = 1000;
  int32_t minConsWindow = 100;
  uint32_t graphPruning;
  uint32_t minRefSep;
  uint32_t maxReadSep;
  uint32_t minClip;
  uint32_t maxGenoReadCount;
  uint32_t minCliqueSize;
  uint32_t maxThreads = 1;
  uint32_t maxReadPerSV;
  float flankQuality = 0.95f;
  float meiMinFrac = 0.8f;
  float trMinFrac = 0.85f;
  bool hasExcludeFile = false;
  bool hasVcfFile = false;
  bool hasDumpFile = false;
  std::set<int32_t> svtset;
  DnaScore<int> aliscore = DnaScore<int>(5, -4, -10, -1);
  boost::filesystem::path outfile;
  boost::filesystem::path vcffile;
  boost::filesystem::path genome;
  boost::filesystem::path exclude;
  boost::filesystem::path dumpfile;
  std::vector<boost::filesystem::path> files;
  std::vector<std::string> sampleName;
};

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

static std::vector<uint8_t> packSeq(std::string const& s) {
  // htslib nt16 packing ("=ACMGRSVTWYHKDBN")
  const char* tab = "=ACMGRSVTWYHKDBN";
  std::vector<uint8_t> out((s.size() + 1) / 2, 0);
  for (std::size_t i = 0; i < s.size(); ++i) {
    const char* p = std::strchr(tab, std::toupper((unsigned char)s[i]));
    uint8_t code = p ? (uint8_t)(p - tab) : 15;
    out[i >> 1] |= code << ((~i & 1) << 2);
  }
  return out;
}

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op != "PIPE") continue;
    Cfg c;
    std::string lens;
    int nchr, nrec;
    std::string vcfpath;
    ss >> c.minMapQual >> c.minTraQual >> c.minGenoQual >> c.madCutoff >>
        c.minClip >> c.minCliqueSize >> c.minRefSep >> c.maxReadSep >>
        c.maxGenoReadCount >> c.maxReadPerSV >> c.graphPruning >>
        c.minConsWindow >> vcfpath >> nchr >> lens;
    if (vcfpath != "-") {
      c.hasVcfFile = true;
      c.vcffile = boost::filesystem::path(vcfpath);
    } else {
      c.hasVcfFile = false;
    }
    c.nchr = nchr;
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
    g_files.assign(1, std::map<int, std::vector<bam1_t> >());
    c.files.clear();
    c.files.push_back(boost::filesystem::path("0"));
    c.sampleName.assign(1, "0");
    c.outfile = boost::filesystem::path("-");
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
      r.seq4_ = packSeq(seq);
      g_files[0][r.core.tid].push_back(r);
    }

    // ---- dellyRun stage order (delly.h:86-196) ----
    typedef boost::icl::interval_set<uint32_t> TChrIntervals;
    std::vector<TChrIntervals> validRegions(g_tlen.size());
    for (std::size_t k = 0; k < g_tlen.size(); ++k)
      validRegions[k].insert(
          boost::icl::discrete_interval<uint32_t>::right_open(
              0, g_tlen[k]));

    std::vector<LibraryInfo> sampleLib(c.files.size());
    getLibraryParams(c, validRegions, sampleLib);

    std::vector<StructuralVariantRecord> svs, srSVs;
    if (!c.hasVcfFile) {
      typedef std::map<std::pair<int32_t, std::size_t>, int32_t>
          TPosRead;
      std::vector<TPosRead> srStore(g_tlen.size());
      scanPEandSR(c, validRegions, svs, srSVs, srStore, sampleLib);
      assembleSplitReads(c, validRegions, srStore, srSVs);
      mergeSort(svs, srSVs);
    } else {
      // re-genotyping input reader (delly.h:150, modvcf.h:155-339)
      bam_hdr_t* bamhd = sam_hdr_read(nullptr);
      vcfParse(c, bamhd, svs);
    }

    std::sort(svs.begin(), svs.end());
    uint32_t cliqueCount = 0;
    for (auto& sv : svs) sv.id = cliqueCount++;

    std::vector<std::vector<JunctionCount> > jctMap;
    std::vector<std::vector<SpanningCount> > spanMap;
    std::vector<std::vector<ReadCount> > rcMap;
    if (!svs.empty())
      annotateCoverage(c, sampleLib, svs, rcMap, jctMap, spanMap);

    vcfOutput(c, svs, jctMap, rcMap, spanMap);

    // emit body lines joined by \x01
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
