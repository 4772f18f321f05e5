// Differential-oracle probe #20: the ASSEMBLY-MODE pipeline end to end.
// Compiles the reference's asmode.h AS-IS (with delly.h/merge.h's CLI
// driver functions sliced off at fixture time; everything else real)
// and runs the real runAsm (/root/reference/src/asmode.h:668-696) over
// the functional htslib replay layer + in-memory faidx + the text-mode
// vcf layer, so delly_tpu/models/asmode.py can be compared end to end:
// findAsmJunctions CIGAR candidates with per-(sample,hap) read seeds
// (:89-189), _findAsmStructuralVariants (:204-236), assembly-derived
// consensus windows (_setAsmConsensus :306-461), _directIndelAllele
// left-alignment (:239-303), and the cross-sample merge with
// haplotype-aware phased GT synthesis (_asmMergeWrite :464-668).
//
// stdin, one case per line:
//   ASM <minMapQual> <minClip> <minRefSep> <maxReadSep> <consWin>
//       <flankSize> <flankQ> <indelsize> <diploid 0/1> <nfiles>
//       <nchr> <chrlens,csv> <seq...per chr>
//       <nrec> per rec: <file> <qname>
//              <tid,pos,flag,mapq,mtid,mpos,isize> <cigar> <seq|.>
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

// functional boost::hash_combine (the shim header is a no-op): the
// repo's documented 64-bit recipe (utils/hashing.py) — used for the
// per-(read, sample) seeds both sides key on
namespace boost {
template <typename T>
inline void hash_combine(std::size_t& seed, T const& v) {
  seed ^= (std::size_t)v + 0x9E3779B97F4A7C15ULL + (seed << 6) +
          (seed >> 2);
}
}  // namespace boost

#include "probe_replay.hpp"

// functional in-memory faidx (numeric contig names)
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
int faidx_has_seq(const faidx_t*, const char* tname) {
  int tid = std::atoi(tname);
  return (tid >= 0 && tid < (int)g_chrseq.size()) ? 1 : 0;
}

#include "vcf_text_replay.hpp"

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
// util.h:744-749
template <typename TIterator, typename TValue>
inline void getMedian(TIterator begin, TIterator end, TValue& median) {
  std::nth_element(begin, begin + (end - begin) / 2, end);
  median = *(begin + (end - begin) / 2);
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
// util.h:69-76
struct ReadCount {
  int32_t leftRC;
  int32_t rc;
  int32_t rightRC;
  ReadCount() : leftRC(0), rc(0), rightRC(0) {}
  ReadCount(int32_t l, int32_t m, int32_t r)
      : leftRC(l), rc(m), rightRC(r) {}
};
// util.h:545-548
inline char _ucBase(char const ch) {
  return (char)std::toupper((unsigned char)ch);
}
struct Graph {
  boost::unordered_map<std::string, uint32_t> smap;
};
bool isBamCram(std::string const&);
// named-only declarations inside uninstantiated templates
template <typename TConfig, typename TValidRegion, typename TLib>
void getLibraryParams(TConfig const&, TValidRegion const&, TLib&);
bool getSMTag(std::string const&, std::string const&, std::string&);
inline bool _outfileValid(boost::filesystem::path const&) {
  return true;
}
}  // namespace torali

#define UTIL_H       // helpers restated above / pulled via probe_common
#define PANGENOME_H  // graph path never instantiated
#define MAX_CN 10

// real reference code sliced by the test fixture (UTIL_H predefined):
// _decodeOrientation + entropy + _parseExcludeIntervals prerequisites
#include "util_asm_slice.h"

#include "threadpool.h"

// annotateSV: asmode names it without including svanno.h (the real
// binary gets it via tegua.h's include order)
#include "svanno.h"

// asmode.h includes delly.h and merge.h by name; the fixture shadows
// them in its -I dir with versions whose program_options CLI drivers
// are sliced off, everything else byte-identical reference code
#include "asmode_sliced.h"

// gregorian date rendering named by the emitters' fileDate lines
namespace boost {
namespace posix_time {
gregorian::date ptime::date() const { return gregorian::date(); }
}  // namespace posix_time
namespace gregorian {
std::string to_iso_string(date) { return std::string("19700101"); }
}  // namespace gregorian
}  // namespace boost

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

static std::vector<uint8_t> packSeq(std::string const& s) {
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
    if (op != "ASM") continue;
    AsmConfig c;
    c.hasVcfFile = true;
    c.minCliqueSize = 2;
    c.graphPruning = 1000;
    c.meiMinFrac = 0.8f;
    c.trMinFrac = 0.85f;
    c.svtset.clear();
    int diploid, nfiles, nchr, nrec;
    std::string lens;
    ss >> c.minMapQual >> c.minClip >> c.minRefSep >> c.maxReadSep >>
        c.minConsWindow >> c.minimumFlankSize >> c.flankQuality >>
        c.indelsize >> diploid >> nfiles >> nchr >> lens;
    c.diploid = diploid != 0;
    g_tlen.clear();
    {
      std::istringstream ls(lens);
      std::string item;
      while (std::getline(ls, item, ','))
        g_tlen.push_back(std::stoul(item));
    }
    c.nchr = nchr;
    g_chrseq.assign(nchr, "");
    for (int t = 0; t < nchr; ++t) ss >> g_chrseq[t];
    replaySetTargetNames();
    g_files.assign(nfiles, std::map<int, std::vector<bam1_t> >());
    c.files.clear();
    for (int f = 0; f < nfiles; ++f)
      c.files.push_back(boost::filesystem::path(std::to_string(f)));
    // file -> sample/hap mapping (asmode.h:843-860)
    c.nsamples = c.diploid ? (nfiles / 2) : nfiles;
    c.fileSample.resize(nfiles);
    c.fileHap.resize(nfiles);
    c.sampleName.resize(c.nsamples);
    for (int f = 0; f < nfiles; ++f) {
      c.fileSample[f] = c.diploid ? (f / 2) : f;
      c.fileHap[f] = (uint8_t)(c.diploid ? (f % 2) : 0);
    }
    for (uint32_t s = 0; s < c.nsamples; ++s)
      c.sampleName[s] = "S" + std::to_string(s);
    c.outfile = boost::filesystem::path("-");
    ss >> nrec;
    for (int i = 0; i < nrec; ++i) {
      int fidx;
      std::string qn, meta, cig, seq;
      ss >> fidx >> qn >> meta >> cig >> seq;
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
      g_files[fidx][r.core.tid].push_back(r);
    }

    runAsm(c);

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
