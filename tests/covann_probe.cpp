// Differential-oracle probe #15: drives the REFERENCE SR-genotyping
// read loop (/root/reference/src/coverage.h annotateCoverage, included
// as-is with split.h/msa.h and the DP stack) over the functional
// htslib replay layer + in-memory faidx, so delly_tpu/models/
// genotype_sr.py's annotate_coverage can be fuzzed end-to-end against
// the real reference code actually executing: probe generation,
// breakpoint-region junction genotyping with the HW scorer and the
// refAlignedReadCount %2 reference-bias subsampling, the clip/quality
// pair maps with first-pair-observation semantics, normal and abnormal
// spanning-pair counting, covBases/covFragment coverage tracks and the
// per-SV leftRC/rc/rightRC sums (coverage.h:265-743).
//
// Hash functions implement the repo's documented 64-bit recipe
// (utils/hashing.py) — values are map keys only; both sides are driven
// with the same functions.
//
// stdin, one case per line:
//   COVANN <minGenoQual> <minFlank> <flankQ> <consWin> <indelsize>
//          <maxGenoReadCount> <median,minNormalISize,maxNormalISize,
//          maxISizeCutoff> <nchr> <chrlens,...> <seq...per chr> <nsv>
//          per sv: <id,chr,start,chr2,end,svt,inslen,precise,pe>
//                  <consensus|.>
//          <nrec> per rec: <qname> <tid,pos,flag,qual,mtid,mpos,isize>
//                  <cigar> <seq|.>
// stdout, one line: per sv
//   "id:Jref csv|.:Jalt csv|.:Sref csv|.:Salt csv|.:leftRC,rc,rightRC"
//   joined by " | ", or "-"
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
#include <boost/iostreams/device/file.hpp>
#include <boost/iostreams/filter/gzip.hpp>
#include <boost/iostreams/filtering_stream.hpp>
#include <boost/multi_array.hpp>
#include <boost/unordered_map.hpp>

#include "probe_replay.hpp"

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
  return (int)g_chrseq[std::atoi(tname)].size();
}

namespace torali {
// 64-bit read-id recipe shared with delly_tpu/utils/hashing.py
inline std::size_t hashCombine64(std::size_t seed, std::size_t v) {
  return seed ^ (v + 0x9E3779B97F4A7C15ULL + (seed << 6) + (seed >> 2));
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
// util.h:440-452
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
// util.h:69-76 — per-SV read-count record (data layout for interop)
struct ReadCount {
  int32_t leftRC;
  int32_t rc;
  int32_t rightRC;
  ReadCount() : leftRC(0), rc(0), rightRC(0) {}
  ReadCount(int32_t l, int32_t m, int32_t r)
      : leftRC(l), rc(m), rightRC(r) {}
};
}  // namespace torali

#define UTIL_H  // helpers restated above / pulled via probe_common

#include "threadpool.h"

#include "coverage.h"

using namespace torali;

struct Cfg {
  uint16_t minGenoQual;
  int32_t minimumFlankSize;
  float flankQuality;
  int32_t minConsWindow;
  int32_t indelsize;
  uint32_t maxGenoReadCount;
  uint16_t maxThreads = 1;
  bool hasDumpFile = false;
  boost::filesystem::path dumpfile;
  std::vector<boost::filesystem::path> files;
  boost::filesystem::path genome;
};

struct Lib {
  int32_t median = 0;
  int32_t minNormalISize = 0;
  int32_t maxNormalISize = 0;
  int32_t maxISizeCutoff = 0;
};

static std::vector<uint32_t> parseCigar(std::string const& s) {
  std::vector<uint32_t> out;
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

static void dumpQuals(std::vector<uint8_t> const& v) {
  if (v.empty()) {
    std::cout << '.';
    return;
  }
  for (std::size_t i = 0; i < v.size(); ++i)
    std::cout << (i ? "," : "") << (int)v[i];
}

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op != "COVANN") continue;
    Cfg c;
    std::string libtok, lens;
    int nchr, nsv, nrec;
    ss >> c.minGenoQual >> c.minimumFlankSize >> c.flankQuality >>
        c.minConsWindow >> c.indelsize >> c.maxGenoReadCount >>
        libtok >> nchr >> lens;
    std::vector<Lib> libs(1);
    {
      std::istringstream ls(libtok);
      std::string item;
      std::vector<long> f;
      while (std::getline(ls, item, ',')) f.push_back(std::stol(item));
      libs[0].median = (int32_t)f[0];
      libs[0].minNormalISize = (int32_t)f[1];
      libs[0].maxNormalISize = (int32_t)f[2];
      libs[0].maxISizeCutoff = (int32_t)f[3];
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
    ss >> nsv;
    std::vector<StructuralVariantRecord> svs(nsv);
    for (int i = 0; i < nsv; ++i) {
      std::string meta, cons;
      ss >> meta >> cons;
      std::istringstream ms(meta);
      std::string item;
      std::vector<long> f;
      while (std::getline(ms, item, ',')) f.push_back(std::stol(item));
      StructuralVariantRecord& s = svs[i];
      s.id = (int32_t)f[0];
      s.chr = (int32_t)f[1];
      s.svStart = (int32_t)f[2];
      s.chr2 = (int32_t)f[3];
      s.svEnd = (int32_t)f[4];
      s.svt = (int32_t)f[5];
      s.insLen = (int32_t)f[6];
      s.precise = f[7] != 0;
      s.peSupport = (int32_t)f[8];
      s.consensus = (cons == ".") ? std::string() : cons;
    }
    g_files.assign(1, std::map<int, std::vector<bam1_t> >());
    c.files.clear();
    c.files.push_back(boost::filesystem::path("0"));
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
    // header with numeric names (faidx shim keys on atoi(name));
    // annotateCoverage re-reads the header itself (coverage.h:285), so
    // the names must be installed in the replay layer's own storage
    replaySetTargetNames();

    std::vector<std::vector<ReadCount> > covCount;
    std::vector<std::vector<JunctionCount> > countMap;
    std::vector<std::vector<SpanningCount> > spanMap;
    annotateCoverage(c, libs, svs, covCount, countMap, spanMap);

    bool first = true;
    for (int i = 0; i < nsv; ++i) {
      std::cout << (first ? "" : " | ") << svs[i].id << ':';
      dumpQuals(countMap[0][svs[i].id].ref);
      std::cout << ':';
      dumpQuals(countMap[0][svs[i].id].alt);
      std::cout << ':';
      dumpQuals(spanMap[0][svs[i].id].ref);
      std::cout << ':';
      dumpQuals(spanMap[0][svs[i].id].alt);
      std::cout << ':' << covCount[0][svs[i].id].leftRC << ','
                << covCount[0][svs[i].id].rc << ','
                << covCount[0][svs[i].id].rightRC;
      first = false;
    }
    if (first) std::cout << '-';
    std::cout << '\n';
    std::cout.flush();
  }
  return 0;
}
