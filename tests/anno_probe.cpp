// Differential-oracle probe #11: drives the REFERENCE MEI/TR
// annotation engine (/root/reference/src/svanno.h, included as-is) and
// the genotyping CIGAR helpers (genotype.h:21-91) so
// delly_tpu/models/svanno.py and genotype_lr.py can be fuzzed against
// the real reference code actually executing: autocorrelation tandem
// -repeat detection (svanno.h:42-56), breakpoint homology / TSD scans,
// INS classification against the embedded ALU/LINE1/SVA/NUMT/soloLTR/
// HERVK templates fwd+rev with the polyA suffix, and TR templating of
// INS/DEL (annotateSV, svanno.h:58-237); plus _readStart/_readEnd/
// _findSeqBp (genotype.h:31-91).
//
// stdin, one case per line:
//   TRDET <maxPeriod> <minFrac> <seq>
//   ANNO  <meiMinFrac> <trMinFrac> <chrlen> <svt> <svStart> <svEnd>
//         <alleles|.> <seq>
//   SEQBP <pos> <recpos> <cigar>     (also emits readStart/readEnd)
//   METHYL <probTh> <flag> <seq> <mm|.> <mlbytes(csv)|->
// stdout:
//   TRDET: <period> <copies %.9g>
//   ANNO:  <isRC> <seqType> <homLen> <trPeriod> <trCopies %.9g>
//   SEQBP: <seqbp> <readStart> <readEnd>
//   METHYL: <has> <calls csv>
#include <cstdio>
#include <cstring>
#include <map>
#include <set>
#include <iostream>
#include <sstream>

#include "probe_common.hpp"

#include <boost/filesystem.hpp>
#include <boost/multi_array.hpp>
#include <boost/unordered_map.hpp>

#define UTIL_H  // helpers supplied by probe_common

#include "svanno.h"

#include "methyl.h"

#include "genotype.h"

using namespace torali;

struct Cfg {
  float meiMinFrac;
  float trMinFrac;
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
    if (op == "TRDET") {
      int maxPeriod;
      float minFrac;
      std::string s;
      ss >> maxPeriod >> minFrac >> s;
      std::pair<int32_t, float> r =
          detectTandemRepeat(s, maxPeriod, minFrac);
      std::printf("%d %.9g\n", r.first, r.second);
    } else if (op == "ANNO") {
      Cfg c;
      int chrlen, svt;
      int64_t svStart, svEnd;
      std::string alleles, seq;
      ss >> c.meiMinFrac >> c.trMinFrac >> chrlen >> svt >> svStart >>
          svEnd >> alleles >> seq;
      if (alleles == ".") alleles = "";
      uint32_t tlen[1] = {(uint32_t)chrlen};
      bam_hdr_t hdr;
      hdr.n_targets = 1;
      hdr.target_len = tlen;
      hdr.target_name = nullptr;
      StructuralVariantRecord sv;
      sv.chr = 0;
      sv.svt = svt;
      sv.svStart = (int32_t)svStart;
      sv.svEnd = (int32_t)svEnd;
      sv.alleles = alleles;
      annotateSV(c, &hdr, seq.c_str(), sv);
      std::printf("%d %d %d %d %.9g\n", sv.anno.isRC ? 1 : 0,
                  sv.anno.seqType, sv.anno.homLen, sv.anno.trPeriod,
                  sv.anno.trCopies);
    } else if (op == "METHYL") {
      int probTh, flag;
      std::string seq, mm, ml;
      ss >> probTh >> flag >> seq >> mm >> ml;
      if (mm == ".") mm = "";
      bam1_t r;
      r.core = bam1_core_t{};
      r.core.flag = (uint16_t)flag;
      r.core.l_qseq = (int32_t)seq.size();
      static const char* nt16 = "=ACMGRSVTWYHKDBN";
      r.seq4_.assign((seq.size() + 1) / 2, 0);
      for (std::size_t i = 0; i < seq.size(); ++i) {
        const char* q = std::strchr(nt16, std::toupper((unsigned char)seq[i]));
        uint8_t code = q ? (uint8_t)(q - nt16) : 15;
        r.seq4_[i >> 1] |= code << ((~i & 1) << 2);
      }
      if (!mm.empty()) {
        r.aux_.push_back('M');
        r.aux_.push_back('M');
        r.aux_.push_back('Z');
        for (char ch : mm) r.aux_.push_back((uint8_t)ch);
        r.aux_.push_back(0);
      }
      if (ml != "-") {
        std::vector<uint8_t> vals;
        std::istringstream ls(ml);
        std::string item;
        while (std::getline(ls, item, ','))
          vals.push_back((uint8_t)std::stoi(item));
        r.aux_.push_back('M');
        r.aux_.push_back('L');
        r.aux_.push_back('B');
        r.aux_.push_back('C');
        uint32_t n = (uint32_t)vals.size();
        for (int k = 0; k < 4; ++k)
          r.aux_.push_back((uint8_t)(n >> (8 * k)));
        for (uint8_t v : vals) r.aux_.push_back(v);
      }
      std::vector<int8_t> calls;
      bool has = buildMethylCalls(&r, (uint8_t)probTh, calls);
      std::cout << (has ? 1 : 0) << ' ';
      for (std::size_t i = 0; i < calls.size(); ++i)
        std::cout << (i ? "," : "") << (int)calls[i];
      if (calls.empty()) std::cout << '-';
      std::cout << '\n';
      std::cout.flush();
    } else if (op == "SEQBP") {
      uint32_t pos;
      int64_t rpos;
      std::string cig;
      ss >> pos >> rpos >> cig;
      bam1_t r;
      r.core = bam1_core_t{};
      r.core.pos = (int32_t)rpos;
      r.cigar_ = parseCigar(cig);
      r.core.n_cigar = (uint32_t)r.cigar_.size();
      std::printf("%d %d %d\n", _findSeqBp(&r, pos), _readStart(&r),
                  _readEnd(&r));
    }
    std::fflush(stdout);
  }
  return 0;
}
