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
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <iostream>
#include <limits>
#include <sstream>
#include <string>
#include <vector>

// --- htslib record shims: the only members tags.h/split.h touch ---
struct bam1_core_t {
  int32_t tid;
  int32_t pos;
  uint16_t flag;
  int32_t mtid;
  int32_t mpos;
  int64_t isize;
};
struct bam1_t {
  bam1_core_t core;
};
struct bam_hdr_t {
  int32_t n_targets;
  uint32_t* target_len;
  char** target_name;
};
#define BAM_FREVERSE 16
#define BAM_FMREVERSE 32
static inline const char* bam_get_qname(bam1_t*) { return ""; }

#include <cctype>

namespace boost {
// util.h pulls boost::to_upper_copy from boost/algorithm/string.hpp;
// split.h uses it on reference slices (split.h:76-159).
inline std::string to_upper_copy(std::string const& s) {
  std::string out(s);
  for (char& c : out) c = (char)std::toupper((unsigned char)c);
  return out;
}
}  // namespace boost

namespace torali {
// util.h:549-563 (see dp_probe.cpp for the non-ACGTN quirk).
inline void reverseComplement(std::string& sequence) {
  std::string rev(sequence.rbegin(), sequence.rend());
  for (std::size_t i = 0; i < rev.size(); ++i) {
    switch (std::toupper((unsigned char)rev[i])) {
      case 'A': sequence[i] = 'T'; break;
      case 'C': sequence[i] = 'G'; break;
      case 'G': sequence[i] = 'C'; break;
      case 'T': sequence[i] = 'A'; break;
      case 'N': sequence[i] = 'N'; break;
      default: break;
    }
  }
}
}  // namespace torali

#include "edlib.h"
#include "tags.h"

namespace torali {

// util.h:87-100 — target coordinates of an HW (infix) edlib hit.
inline uint32_t infixStart(EdlibAlignResult const& cigar) {
  int32_t tIdx = cigar.endLocations[0];
  for (int32_t i = 0; i < cigar.alignmentLength; i++)
    if (cigar.alignment[i] != EDLIB_EDOP_INSERT) tIdx--;
  return (tIdx >= 0) ? (uint32_t)(tIdx + 1) : 0u;
}
inline uint32_t infixEnd(EdlibAlignResult const& cigar) {
  return cigar.endLocations[0];
}

// util.h:240-248 — symbolic ALT id per svt.
inline std::string _addID(int32_t const svt) {
  if (svt == 0 || svt == 1) return "INV";
  if (svt == 2) return "DEL";
  if (svt == 3) return "DUP";
  if (svt == 4) return "INS";
  if (svt == 9) return "CNV";
  return "BND";
}

// util.h:251-271 — REF,ALT allele strings (BND bracket notation).
inline std::string _addAlleles(std::string const& ref,
                               std::string const& alt) {
  return ref + "," + alt;
}
inline std::string _addAlleles(std::string const& ref,
                               std::string const& chr2,
                               StructuralVariantRecord const& sv,
                               int32_t const svt) {
  if (_translocation(svt)) {
    uint8_t ct = _getSpanOrientation(svt);
    std::string pos2 = std::to_string(sv.svEnd);
    if (ct == 0) return ref + "," + ref + "]" + chr2 + ":" + pos2 + "]";
    if (ct == 1) return ref + ",[" + chr2 + ":" + pos2 + "[" + ref;
    if (ct == 2) return ref + "," + ref + "[" + chr2 + ":" + pos2 + "[";
    if (ct == 3) return ref + ",]" + chr2 + ":" + pos2 + "]" + ref;
  }
  return ref + ",<" + _addID(svt) + ">";
}

}  // namespace torali

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
