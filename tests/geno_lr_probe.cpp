// Differential-oracle probe #19: the FULL long-read genotyping loop.
// Compiles the reference's genotype.h AS-IS (with svanno.h + methyl.h
// and the edlib scorer) and runs the real genotypeLR
// (/root/reference/src/genotype.h:93-397) over the functional htslib
// replay layer + in-memory faidx, so delly_tpu/models/genotype_lr.py
// can be fuzzed end-to-end against the reference code actually
// executing: the per-chromosome breakpoint multimap and read-overlap
// window (:140-212), the per-read maxGenoReadCount caps (:230-233),
// _findSeqBp and the centered flanking-offset algebra (:248-262), NW
// edit distances with the per-svt reverse-complement rules (:276-284),
// the informative-read gate and edit-distance-delta quality (:291-307),
// HP/PS phasing tallies (:216-223, 315-335), 5mC methylation
// accumulation over MM/ML tags (:310-324), the coverage track and
// RC/RCL/RCR windows (:182-194, 344-377), plus annotateSV and symbolic
// allele synthesis on the fly (:156-163).
//
// stdin, one case per line:
//   GENOLR <minMapQual> <minFlank> <flankQ> <consWin> <genoCap>
//          <maxGenoReadCount> <methylProb> <minCpgDepth> <meiMinFrac>
//          <trMinFrac> <nchr> <chrlens,csv> <seq...per chr> <nsv>
//          per sv: <id,chr,start,chr2,end,svt,inslen,precise,consBp>
//                  <consensus|.>
//          <nrec> per rec: <qname> <tid,pos,flag,mapq,mtid,mpos,isize>
//                  <cigar> <seq|.> <auxhex|.>
// stdout, one line: per sv
//   "id:Jref:Jalt:hp1r:hp1a:hp2r:hp2a:ps:leftRC,rc,rightRC:methyl16:
//    homlen,seqType,isRC,trPeriod,trCopies" joined by " | ", or "-"
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

namespace torali {
// util.h:69-76 — per-SV read-count record
struct ReadCount {
  int32_t leftRC;
  int32_t rc;
  int32_t rightRC;
  ReadCount() : leftRC(0), rc(0), rightRC(0) {}
  ReadCount(int32_t l, int32_t m, int32_t r)
      : leftRC(l), rc(m), rightRC(r) {}
};
// coverage.h:69-85 — junction genotyping tallies (LR uses the same
// record layout; restated as data-layout interop)
struct JunctionCount {
  std::vector<uint8_t> ref;
  std::vector<uint8_t> alt;
  std::vector<uint8_t> hp1ref;
  std::vector<uint8_t> hp1alt;
  std::vector<uint8_t> hp2ref;
  std::vector<uint8_t> hp2alt;
  int32_t ps = -1;
};
}  // namespace torali

#define UTIL_H  // helpers restated above / pulled via probe_common
#define MAX_CN 10

#include "svanno.h"

#include "methyl.h"

#include "genotype.h"

using namespace torali;

struct Cfg {
  uint16_t minMapQual;
  int32_t minimumFlankSize;
  float flankQuality;
  int32_t minConsWindow;
  int32_t genoCap;
  uint32_t maxGenoReadCount;
  uint16_t methylProb;
  uint32_t minCpgDepth;
  int32_t methylWindow = 1000;  // tegua.h:248 default
  float meiMinFrac;
  float trMinFrac;
  bool hasDumpFile = false;
  boost::filesystem::path dumpfile;
  std::vector<boost::filesystem::path> files;
  boost::filesystem::path genome;
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
  const char* tab = "=ACMGRSVTWYHKDBN";
  std::vector<uint8_t> out((s.size() + 1) / 2, 0);
  for (std::size_t i = 0; i < s.size(); ++i) {
    const char* p = std::strchr(tab, std::toupper((unsigned char)s[i]));
    uint8_t code = p ? (uint8_t)(p - tab) : 15;
    out[i >> 1] |= code << ((~i & 1) << 2);
  }
  return out;
}

static std::vector<uint8_t> parseHex(std::string const& s) {
  std::vector<uint8_t> out;
  if (s == ".") return out;
  for (std::size_t i = 0; i + 1 < s.size(); i += 2) {
    auto nib = [](char c) -> uint8_t {
      return (c >= 'a') ? (uint8_t)(c - 'a' + 10)
             : (c >= 'A') ? (uint8_t)(c - 'A' + 10)
                          : (uint8_t)(c - '0');
    };
    out.push_back((uint8_t)((nib(s[i]) << 4) | nib(s[i + 1])));
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
    if (op != "GENOLR") continue;
    Cfg c;
    std::string lens;
    int nchr, nsv, nrec;
    ss >> c.minMapQual >> c.minimumFlankSize >> c.flankQuality >>
        c.minConsWindow >> c.genoCap >> c.maxGenoReadCount >>
        c.methylProb >> c.minCpgDepth >> c.meiMinFrac >> c.trMinFrac >>
        nchr >> lens;
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
      s.consBp = (int32_t)f[8];
      s.consensus = (cons == ".") ? std::string() : cons;
    }
    g_files.assign(1, std::map<int, std::vector<bam1_t> >());
    c.files.clear();
    c.files.push_back(boost::filesystem::path("0"));
    ss >> nrec;
    for (int i = 0; i < nrec; ++i) {
      std::string qn, meta, cig, seq, aux;
      ss >> qn >> meta >> cig >> seq >> aux;
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
      r.aux_ = parseHex(aux);
      g_files[0][r.core.tid].push_back(r);
    }

    std::vector<std::vector<JunctionCount> > jctMap(
        1, std::vector<JunctionCount>(nsv));
    std::vector<std::vector<ReadCount> > covMap(
        1, std::vector<ReadCount>(nsv));
    std::vector<std::vector<MethylInfo> > methylMap(
        1, std::vector<MethylInfo>(nsv));
    genotypeLR(c, svs, jctMap, covMap, methylMap);

    bool first = true;
    for (int i = 0; i < nsv; ++i) {
      int32_t id = svs[i].id;
      std::cout << (first ? "" : " | ") << id << ':';
      dumpQuals(jctMap[0][id].ref);
      std::cout << ':';
      dumpQuals(jctMap[0][id].alt);
      std::cout << ':';
      dumpQuals(jctMap[0][id].hp1ref);
      std::cout << ':';
      dumpQuals(jctMap[0][id].hp1alt);
      std::cout << ':';
      dumpQuals(jctMap[0][id].hp2ref);
      std::cout << ':';
      dumpQuals(jctMap[0][id].hp2alt);
      std::cout << ':' << jctMap[0][id].ps;
      std::cout << ':' << covMap[0][id].leftRC << ','
                << covMap[0][id].rc << ',' << covMap[0][id].rightRC;
      MethylInfo const& mi = methylMap[0][id];
      std::cout << ':' << mi.refSvStartL << ',' << mi.refSvStartR << ','
                << mi.refSvRightL << ',' << mi.refSvRightR << ','
                << mi.altSvStartL << ',' << mi.altSvStartR << ','
                << mi.altSvRightL << ',' << mi.altSvRightR << ','
                << mi.mncStartL << ',' << mi.mncStartR << ','
                << mi.mncRightL << ',' << mi.mncRightR << ','
                << mi.mdpStartL << ',' << mi.mdpStartR << ','
                << mi.mdpRightL << ',' << mi.mdpRightR;
      char trc[32];
      std::snprintf(trc, sizeof(trc), "%g", (double)svs[i].anno.trCopies);
      std::cout << ':' << svs[i].anno.homLen << ','
                << (int)svs[i].anno.seqType << ','
                << (int)svs[i].anno.isRC << ','
                << svs[i].anno.trPeriod << ',' << trc;
      first = false;
    }
    if (first) std::cout << '-';
    std::cout << '\n';
    std::cout.flush();
  }
  return 0;
}
