// Differential-oracle probe #12: drives the REFERENCE short-read
// discovery scan (/root/reference/src/shortpe.h scanPEandSR, included
// as-is with junction.h/cluster.h and the DP stack) over the
// functional htslib replay layer, so delly_tpu/models/sr.py's sharded
// scan plane can be fuzzed end-to-end against the real reference code
// actually executing: the SR CIGAR walk, hash-keyed mate maps with
// first-pair-observation semantics, per-svt PE candidate gating
// (isize/orientation/quality/translocation rules), SR junction pairing
// (fetchSVs), SR + PE clique clustering, and the srStore read
// assignments (shortpe.h:285-533).
//
// Hash functions implement the repo's documented 64-bit recipe
// (utils/hashing.py: hash_string + golden-ratio combine + FNV-1a64 for
// the qname range hash).  Hash values act only as map keys — grouping
// and the READ1-gets-id-minus-1 invariant are what downstream logic
// consumes — and the test drives both sides with the same functions.
//
// stdin, one case per line:
//   SCANPE <minMapQual> <minClip> <minRefSep> <minTraQual> <maxReadSep>
//          <minCliqueSize> <graphPruning>
//          <rs,median,mad,maxNormalISize,maxISizeCutoff>
//          <nchr> <chrlens,...> <nrec> then per record:
//          <qname> <tid,pos,flag,qual,mtid,mpos,isize> <cigar>
// stdout, one line:
//   PE SVs "chr,start,chr2,end,cipl,ciph,ciel,cieh,pe,pemapq,mapq,svt|"
//   then " # " SR SVs (same fields + sr,srmapq) then " # " srStore
//   "chr,rstart,id,svid|..."
#include <algorithm>
#include <cstdio>
#include <cstring>
#include <iostream>
#include <map>
#include <set>
#include <sstream>
#include <unordered_map>

#include "probe_common.hpp"

#include <boost/container/flat_set.hpp>
#include <boost/filesystem.hpp>
#include <boost/icl/split_interval_map.hpp>
#include <boost/multi_array.hpp>
#include <boost/unordered_map.hpp>

#include "probe_replay.hpp"

namespace torali {
// 64-bit read-id recipe shared with delly_tpu/utils/hashing.py: the
// values are map keys only (grouping + the READ1 id-1 invariant).
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
struct Graph {
  boost::unordered_map<std::string, uint32_t> smap;
};
bool isBamCram(std::string const&);
}  // namespace torali

#define UTIL_H       // helpers restated above / pulled via probe_common
#define PANGENOME_H  // graph path never instantiated
#define COVERAGE_H   // coverage/genotyping templates not exercised
#define BOLOG_H      // likelihood templates not exercised

#include "threadpool.h"

#include "shortpe.h"

using namespace torali;

struct Cfg {
  uint16_t minMapQual;
  uint16_t minTraQual;
  uint32_t minClip;
  uint32_t minRefSep;
  uint32_t maxReadSep;
  uint32_t minCliqueSize;
  uint32_t graphPruning;
  int32_t nchr;
  uint16_t maxThreads = 1;
  std::set<int32_t> svtset;
  std::vector<boost::filesystem::path> files;
  boost::filesystem::path genome;
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

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op != "SCANPE") continue;
    Cfg c;
    std::string libtok, lens;
    int nchr, nrec;
    ss >> c.minMapQual >> c.minClip >> c.minRefSep >> c.minTraQual >>
        c.maxReadSep >> c.minCliqueSize >> c.graphPruning >> libtok >>
        nchr >> lens >> nrec;
    c.nchr = nchr;
    std::vector<LibraryInfo> libs(1);
    {
      std::istringstream ls(libtok);
      std::string item;
      std::vector<long> f;
      while (std::getline(ls, item, ',')) f.push_back(std::stol(item));
      libs[0].rs = (int32_t)f[0];
      libs[0].median = (int32_t)f[1];
      libs[0].mad = (int32_t)f[2];
      libs[0].maxNormalISize = (int32_t)f[3];
      libs[0].maxISizeCutoff = (int32_t)f[4];
    }
    g_tlen.clear();
    {
      std::istringstream ls(lens);
      std::string item;
      while (std::getline(ls, item, ','))
        g_tlen.push_back(std::stoul(item));
    }
    g_files.assign(1, std::map<int, std::vector<bam1_t> >());
    c.files.push_back(boost::filesystem::path("0"));
    for (int i = 0; i < nrec; ++i) {
      std::string qn, meta, cig;
      ss >> qn >> meta >> cig;
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
      int32_t ql = 0;
      for (uint32_t cg : r.cigar_) {
        int o = bam_cigar_op(cg);
        if (o == BAM_CMATCH || o == BAM_CINS || o == BAM_CSOFT_CLIP ||
            o == BAM_CEQUAL || o == BAM_CDIFF)
          ql += bam_cigar_oplen(cg);
      }
      r.core.l_qseq = ql;
      g_files[0][r.core.tid].push_back(r);
    }
    typedef boost::icl::interval_set<uint32_t> TChrIntervals;
    std::vector<TChrIntervals> validRegions(g_tlen.size());
    for (std::size_t k = 0; k < g_tlen.size(); ++k)
      validRegions[k].insert(
          boost::icl::discrete_interval<uint32_t>::right_open(
              0, g_tlen[k]));

    std::vector<StructuralVariantRecord> svs, srSVs;
    typedef std::map<std::pair<int32_t, std::size_t>, int32_t> TPosRead;
    std::vector<TPosRead> srStore(g_tlen.size());
    scanPEandSR(c, validRegions, svs, srSVs, srStore, libs);

    auto dumpSV = [](StructuralVariantRecord const& s) {
      std::cout << s.chr << ',' << s.svStart << ',' << s.chr2 << ','
                << s.svEnd << ',' << s.ciposlow << ',' << s.ciposhigh
                << ',' << s.ciendlow << ',' << s.ciendhigh << ','
                << s.peSupport << ',' << s.peMapQuality << ','
                << s.srSupport << ',' << s.srMapQuality << ','
                << s.mapq << ',' << s.insLen << ',' << s.svt << ','
                << s.id;
    };
    bool first = true;
    for (auto const& s : svs) {
      std::cout << (first ? "" : "|");
      dumpSV(s);
      first = false;
    }
    if (first) std::cout << '-';
    std::cout << " # ";
    first = true;
    for (auto const& s : srSVs) {
      std::cout << (first ? "" : "|");
      dumpSV(s);
      first = false;
    }
    if (first) std::cout << '-';
    std::cout << " # ";
    first = true;
    for (std::size_t chrc = 0; chrc < srStore.size(); ++chrc)
      for (auto const& kv : srStore[chrc]) {
        std::cout << (first ? "" : "|") << chrc << ','
                  << kv.first.first << ',' << kv.first.second << ','
                  << kv.second;
        first = false;
      }
    if (first) std::cout << '-';
    std::cout << '\n';
    std::cout.flush();
  }
  return 0;
}
