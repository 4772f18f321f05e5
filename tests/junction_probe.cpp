// Differential-oracle probe #10: drives the REFERENCE split-read
// junction plane (/root/reference/src/junction.h, included as-is with
// assemble.h and the DP stack) so delly_tpu/models/junctions.py can be
// fuzzed against the real reference code actually executing: the
// long-read CIGAR walk with indel-extension look-ahead merging
// (findJunctions, junction.h:319-460, including the per-read junction
// sort at :452), and the pairwise junction matchers
// selectDeletions/Duplications/Inversions/Insertions/Translocations +
// bridgeInsertions behind fetchSVs (junction.h:60-316,463-475).
//
// The htslib iteration layer is a functional REPLAY shim: records fed
// on stdin are stored per (file, tid) and handed back through
// sam_itr_next, so findJunctions runs its real loop.  hash_lr returns
// the probe-assigned read id (grouping key only; junction semantics
// do not depend on the hash value).
//
// stdin, one case per line:
//   LIBPARAMS <madNormalCutoff> <madCutoff> <nchr> <chrlens,...>
//      <nrec> then per record:
//      <tid,pos,flag,qual,lqseq,mtid,mpos,isize>
//      -> rs median mad minN maxN minCut maxCut  (util.h:771-891)
//   LR <minRefSep> <minClip> <indelExt> <minMapQual> <maxReadSep>
//      <nchr> <chrlens,...> <nrec>
//      then per record: <readid,tid,pos,flag,qual> <cigar>
//      (cigar like 120M5000D80M900S)
// stdout, one line per case:
//   junctions "readid:fw,scleft,refidx,rstart,refpos,seqpos,qual|..."
//   then "#" then per-svt SRBamRecords (sorted)
//   "svt:chr,pos,chr2,pos2,rstart,sstart,qual,inslen,id|..."
#include <algorithm>
#include <cstdio>
#include <cstring>
#include <iostream>
#include <map>
#include <set>
#include <sstream>

#include "probe_common.hpp"

#include <boost/filesystem.hpp>
#include <boost/multi_array.hpp>
#include <boost/icl/split_interval_map.hpp>
#include <boost/unordered_map.hpp>

#include "probe_replay.hpp"

namespace torali {
// probe read-id stand-ins for util.h's qname hashes (grouping only)
inline std::size_t hash_lr(bam1_t* r) { return r->seed_; }
inline std::size_t hash_sr(bam1_t* r) { return r->seed_; }
std::size_t hash_pair(bam1_t*);
std::size_t hash_pair_mate(bam1_t*);
// util.h:429-438 — read length incl. hard clips
inline int32_t readLength(bam1_t const* rec) {
  const uint32_t* cigar = bam_get_cigar(rec);
  int32_t totalHardClip = 0;
  for (std::size_t ci = 0; ci < rec->core.n_cigar; ++ci)
    if (bam_cigar_op(cigar[ci]) == BAM_CHARD_CLIP)
      totalHardClip += bam_cigar_oplen(cigar[ci]);
  return (int32_t)rec->core.l_qseq + totalHardClip;
}
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
// named in the uninstantiated alt-alignment branch
struct Graph {
  boost::unordered_map<std::string, uint32_t> smap;
};
bool isBamCram(std::string const&);
}  // namespace torali

#define UTIL_H       // helpers restated above / pulled via probe_common
#define PANGENOME_H  // graph path never instantiated

#include "junction.h"

// getLibraryParams, compiled byte-exact from the reference via a
// sed slice the test fixture generates (UTIL_H is predefined above)
#include "util_libparams_slice.h"

struct LibCfg {
  int32_t madNormalCutoff;
  int32_t madCutoff;
  std::vector<boost::filesystem::path> files;
  boost::filesystem::path genome;
};

using namespace torali;

struct Cfg {
  uint32_t minRefSep;
  uint32_t minClip;
  float indelExtension;
  uint16_t minMapQual;
  uint32_t maxReadSep;
  bool hasAltFile = false;
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
    if (op == "LIBPARAMS") {
      LibCfg c;
      int nchr, nrec;
      std::string lens;
      ss >> c.madNormalCutoff >> c.madCutoff >> nchr >> lens >> nrec;
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
        std::string meta;
        ss >> meta;
        std::istringstream ms(meta);
        std::string item;
        std::vector<long> f;
        while (std::getline(ms, item, ','))
          f.push_back(std::stol(item));
        bam1_t r;
        r.core = bam1_core_t{};
        r.core.tid = (int32_t)f[0];
        r.core.pos = (int32_t)f[1];
        r.core.flag = (uint16_t)f[2];
        r.core.qual = (uint8_t)f[3];
        r.core.l_qseq = (int32_t)f[4];
        r.core.mtid = (int32_t)f[5];
        r.core.mpos = (int32_t)f[6];
        r.core.isize = f[7];
        g_files[0][r.core.tid].push_back(r);
      }
      typedef boost::icl::interval_set<uint32_t> TChrIntervals;
      std::vector<TChrIntervals> validRegions(g_tlen.size());
      for (std::size_t k = 0; k < g_tlen.size(); ++k)
        validRegions[k].insert(
            boost::icl::discrete_interval<uint32_t>::right_open(
                0, g_tlen[k]));
      std::vector<LibraryInfo> libs(1);
      getLibraryParams(c, validRegions, libs);
      std::cout << libs[0].rs << ' ' << libs[0].median << ' '
                << libs[0].mad << ' ' << libs[0].minNormalISize << ' '
                << libs[0].maxNormalISize << ' '
                << libs[0].minISizeCutoff << ' '
                << libs[0].maxISizeCutoff << '\n';
      std::cout.flush();
      continue;
    }
    if (op != "LR") continue;
    Cfg c;
    int nchr, nrec;
    std::string lens;
    ss >> c.minRefSep >> c.minClip >> c.indelExtension >>
        c.minMapQual >> c.maxReadSep >> nchr >> lens >> nrec;
    g_tlen.clear();
    {
      std::istringstream ls(lens);
      std::string item;
      while (std::getline(ls, item, ',')) g_tlen.push_back(std::stoul(item));
    }
    g_files.assign(1, std::map<int, std::vector<bam1_t> >());
    c.files.push_back(boost::filesystem::path("0"));
    for (int i = 0; i < nrec; ++i) {
      std::string meta, cig;
      ss >> meta >> cig;
      std::istringstream ms(meta);
      std::string item;
      std::vector<long> f;
      while (std::getline(ms, item, ',')) f.push_back(std::stol(item));
      bam1_t r;
      r.seed_ = (std::size_t)f[0];
      r.core.tid = (int32_t)f[1];
      r.core.pos = (int32_t)f[2];
      r.core.flag = (uint16_t)f[3];
      r.core.qual = (uint8_t)f[4];
      r.cigar_ = parseCigar(cig);
      r.core.n_cigar = (uint32_t)r.cigar_.size();
      int32_t ql = 0;  // l_qseq = query length excl. hard clips
      for (uint32_t cg : r.cigar_) {
        int o = bam_cigar_op(cg);
        if (o == BAM_CMATCH || o == BAM_CINS || o == BAM_CSOFT_CLIP ||
            o == BAM_CEQUAL || o == BAM_CDIFF)
          ql += bam_cigar_oplen(cg);
      }
      r.core.l_qseq = ql;
      r.qname_ = "r" + std::to_string(f[0]);
      g_files[0][r.core.tid].push_back(r);
    }
    // whole-chromosome valid regions
    typedef boost::icl::interval_set<uint32_t> TChrIntervals;
    std::vector<TChrIntervals> validRegions(g_tlen.size());
    for (std::size_t k = 0; k < g_tlen.size(); ++k)
      validRegions[k].insert(
          boost::icl::discrete_interval<uint32_t>::right_open(
              0, g_tlen[k]));

    typedef std::vector<Junction> TJunctionVector;
    typedef boost::unordered_map<std::size_t, TJunctionVector> TReadBp;
    TReadBp readBp;
    std::set<std::size_t> validSR;
    findJunctions(c, validRegions, readBp, validSR);

    // dump junctions sorted by (readid, vector order)
    std::vector<std::size_t> seeds;
    for (auto const& kv : readBp) seeds.push_back(kv.first);
    std::sort(seeds.begin(), seeds.end());
    bool first = true;
    for (std::size_t s : seeds)
      for (Junction const& j : readBp[s]) {
        std::cout << (first ? "" : "|") << s << ':' << (j.forward ? 1 : 0)
                  << ',' << (j.scleft ? 1 : 0) << ',' << j.refidx << ','
                  << j.rstart << ',' << j.refpos << ',' << j.seqpos
                  << ',' << j.qual;
        first = false;
      }
    if (first) std::cout << '-';
    std::cout << " # ";
    // fetchSVs over all svts; sort each bucket for order independence
    std::vector<std::vector<SRBamRecord> > br(2 * DELLY_SVT_TRANS);
    fetchSVs(c, readBp, br);
    first = true;
    for (std::size_t svt = 0; svt < br.size(); ++svt) {
      std::sort(br[svt].begin(), br[svt].end(),
                [](SRBamRecord const& a, SRBamRecord const& b) {
                  return std::tie(a.chr, a.pos, a.chr2, a.pos2, a.id,
                                  a.sstart) <
                         std::tie(b.chr, b.pos, b.chr2, b.pos2, b.id,
                                  b.sstart);
                });
      for (SRBamRecord const& r : br[svt]) {
        std::cout << (first ? "" : "|") << svt << ':' << r.chr << ','
                  << r.pos << ',' << r.chr2 << ',' << r.pos2 << ','
                  << r.rstart << ',' << r.sstart << ',' << r.qual
                  << ',' << r.inslen << ',' << r.id;
        first = false;
      }
    }
    if (first) std::cout << '-';
    std::cout << '\n';
    std::cout.flush();
  }
  return 0;
}
