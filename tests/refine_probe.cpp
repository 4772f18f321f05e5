// Differential-oracle probe #3: drives the REFERENCE breakpoint
// refinement engine (/root/reference/src/split.h, included as-is,
// together with tags.h / gotoh.h / needle.h / edlib.cpp) so the repo's
// from-scratch delly_tpu/models/refine.py can be fuzzed against the
// real reference code actually executing: _getSVRef probe
// construction, longNeedle/splitAlign consensus-to-reference
// alignment, _findSplit gap selection + percent-identity gate,
// micro-homology, per-svt coordinate back-transform, exact small-indel
// alleles, and the final sv-field updates.
//
// split.h's only dependencies beyond the DP stack are a handful of
// small util.h helpers and the htslib record structs that tags.h
// touches; both are supplied here (hand-written to util.h's documented
// behavior — see line citations), NOT copied.
//
// stdin, one case per line:
//   REFINE <svt> <realign> <minFlank> <flankQ> <consWin> <indelsz>
//          <chr> <chr2> <svStart> <svEnd> <insLen> <cons> <seq1> <seq2|.>
// stdout, one line per case:
//   0                                  (refinement rejected)
//   1 <svStart> <svEnd> <cipl> <ciph> <ciel> <cieh> <insLen> <homLen>
//     <consBp> <srq%.9g> <alleles|.> <consensus>
#include <cstdio>
#include <iostream>
#include <sstream>

#include "probe_common.hpp"

#include "split.h"

using namespace torali;

struct Cfg {
  int32_t minimumFlankSize;
  float flankQuality;
  int32_t minConsWindow;
  int32_t indelsize;
};

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op != "REFINE") continue;
    Cfg c;
    int svt, realign, chr, chr2;
    int64_t svStart, svEnd, insLen;
    std::string cons, seq1, seq2;
    ss >> svt >> realign >> c.minimumFlankSize >> c.flankQuality >>
        c.minConsWindow >> c.indelsize >> chr >> chr2 >> svStart >>
        svEnd >> insLen >> cons >> seq1 >> seq2;
    if (seq2 == ".") seq2 = "";

    uint32_t tlen[2] = {(uint32_t)seq1.size(), (uint32_t)seq2.size()};
    bam_hdr_t hdr;
    hdr.n_targets = seq2.empty() ? 1 : 2;
    hdr.target_len = tlen;
    hdr.target_name = nullptr;

    StructuralVariantRecord sv;
    sv.chr = chr;
    sv.chr2 = chr2;
    sv.svStart = (int32_t)svStart;
    sv.svEnd = (int32_t)svEnd;
    sv.svt = svt;
    sv.insLen = (int32_t)insLen;
    sv.consensus = cons;

    bool ok = alignConsensus(c, &hdr, seq1.c_str(),
                             seq2.empty() ? nullptr : seq2.c_str(), sv,
                             realign != 0);
    if (!ok) {
      std::cout << 0 << '\n';
    } else {
      char srq[32];
      std::snprintf(srq, sizeof srq, "%.9g", sv.srAlignQuality);
      std::cout << 1 << ' ' << sv.svStart << ' ' << sv.svEnd << ' '
                << sv.ciposlow << ' ' << sv.ciposhigh << ' '
                << sv.ciendlow << ' ' << sv.ciendhigh << ' '
                << sv.insLen << ' ' << sv.homLen << ' ' << sv.consBp
                << ' ' << srq << ' '
                << (sv.alleles.empty() ? "." : sv.alleles) << ' '
                << sv.consensus << '\n';
    }
    std::cout.flush();
  }
  return 0;
}
