// Shared shim preamble for the differential-oracle probes that compile
// reference headers as-is (refine_probe.cpp, assemble_probe.cpp).
// Supplies the htslib record structs/API declarations the reference's
// template code names, plus the handful of small util.h helpers
// (hand-written to util.h's documented behavior, NOT copied — see line
// citations).  Functions inside uninstantiated reference templates
// only need declarations; only what the probes actually call needs a
// definition.
#ifndef DP_PROBE_COMMON_HPP
#define DP_PROBE_COMMON_HPP

#include <algorithm>
#include <cctype>
#include <cmath>
#include <numeric>
#include <cstdint>
#include <limits>
#include <string>
#include <unordered_set>
#include <vector>

// --- htslib shims ---
struct bam1_core_t {
  int32_t tid;
  int32_t pos;
  uint16_t flag;
  uint8_t qual;
  int32_t l_qseq;
  int32_t mtid;
  int32_t mpos;
  int64_t isize;
  uint32_t n_cigar;
};
// Functional record: layout is probe-defined (reference code only
// touches it through the core fields and the accessor macros below).
struct bam1_t {
  bam1_core_t core;
  std::vector<uint32_t> cigar_;
  std::string qname_;
  std::vector<uint8_t> seq4_;  // packed 4-bit nt16 codes
  std::vector<uint8_t> aux_;   // htslib aux wire format: tag,tag,type,...
  std::size_t seed_ = 0;       // probe-assigned read id (hash_* stub)
};
struct bam_hdr_t {
  int32_t n_targets;
  uint32_t* target_len;
  char** target_name;
};
struct samFile;
struct hts_idx_t;
struct hts_itr_t;
struct faidx_t;
#define BAM_FPAIRED 1
#define BAM_FUNMAP 4
#define BAM_FMUNMAP 8
#define BAM_FREVERSE 16
#define BAM_FMREVERSE 32
#define BAM_FREAD1 64
#define BAM_FREAD2 128
#define BAM_FSECONDARY 256
#define BAM_FQCFAIL 512
#define BAM_FDUP 1024
#define BAM_FSUPPLEMENTARY 2048
// htslib CIGAR encoding (public wire-format constants)
#define BAM_CMATCH 0
#define BAM_CINS 1
#define BAM_CDEL 2
#define BAM_CREF_SKIP 3
#define BAM_CSOFT_CLIP 4
#define BAM_CHARD_CLIP 5
#define BAM_CPAD 6
#define BAM_CEQUAL 7
#define BAM_CDIFF 8
#define bam_cigar_op(c) ((c) & 0xf)
#define bam_cigar_oplen(c) ((c) >> 4)
// functional record accessors over the probe-defined layout
inline const char* bam_get_qname(const bam1_t* b) {
  return b->qname_.c_str();
}
inline uint32_t* bam_get_cigar(const bam1_t* b) {
  return const_cast<uint32_t*>(b->cigar_.data());
}
inline uint8_t* bam_get_seq(const bam1_t* b) {
  return const_cast<uint8_t*>(b->seq4_.data());
}
inline int bam_seqi(const uint8_t* s, int i) {
  return (s[i >> 1] >> ((~i & 1) << 2)) & 0xf;
}
inline int64_t bam_aux2i(const uint8_t* s) {
  switch ((char)*s) {
    case 'c': return (int8_t)s[1];
    case 'C': return (uint8_t)s[1];
    case 's': return (int16_t)((uint16_t)s[1] | ((uint16_t)s[2] << 8));
    case 'S': return (uint16_t)s[1] | ((uint16_t)s[2] << 8);
    case 'i': case 'I': {
      uint32_t v = (uint32_t)s[1] | ((uint32_t)s[2] << 8) |
                   ((uint32_t)s[3] << 16) | ((uint32_t)s[4] << 24);
      return ((char)*s == 'i') ? (int32_t)v : (int64_t)v;
    }
    default: return 0;
  }
}
inline char* bam_aux2Z(const uint8_t* s) {
  return (char*)(s + 1);
}
// functional aux scan over the htslib tag wire format
inline uint8_t* bam_aux_get(const bam1_t* b, const char tag[2]) {
  const uint8_t* p = b->aux_.data();
  const uint8_t* end = p + b->aux_.size();
  while (p + 3 <= end) {
    const uint8_t* rec = p;
    char type = (char)p[2];
    p += 3;
    std::size_t sz = 0;
    switch (type) {
      case 'A': case 'c': case 'C': sz = 1; break;
      case 's': case 'S': sz = 2; break;
      case 'i': case 'I': case 'f': sz = 4; break;
      case 'Z': case 'H':
        while (p + sz < end && p[sz]) ++sz;
        ++sz;
        break;
      case 'B': {
        char sub = (char)p[0];
        uint32_t n = (uint32_t)p[1] | ((uint32_t)p[2] << 8) |
                     ((uint32_t)p[3] << 16) | ((uint32_t)p[4] << 24);
        std::size_t esz = (sub == 'c' || sub == 'C') ? 1
                          : (sub == 's' || sub == 'S') ? 2 : 4;
        sz = 5 + (std::size_t)n * esz;
        break;
      }
      default: return nullptr;
    }
    if (rec[0] == (uint8_t)tag[0] && rec[1] == (uint8_t)tag[1])
      return const_cast<uint8_t*>(rec + 2);
    p += sz;
  }
  return nullptr;
}
void bam_hdr_destroy(bam_hdr_t*);
samFile* sam_open(const char*, const char*);
int sam_close(samFile*);
bam_hdr_t* sam_hdr_read(samFile*);
hts_idx_t* sam_index_load(samFile*, const char*);
void hts_idx_destroy(hts_idx_t*);
hts_itr_t* sam_itr_queryi(hts_idx_t*, int, int64_t, int64_t);
void hts_itr_destroy(hts_itr_t*);
int sam_itr_next(samFile*, hts_itr_t*, bam1_t*);
int hts_set_fai_filename(samFile*, const char*);
faidx_t* fai_load(const char*);
void fai_destroy(faidx_t*);
char* faidx_fetch_seq(const faidx_t*, const char*, int, int, int*);
bam1_t* bam_init1();
void bam_destroy1(bam1_t*);

namespace boost {
// util.h pulls boost::to_upper_copy from boost/algorithm/string.hpp.
inline std::string to_upper_copy(std::string const& s) {
  std::string out(s);
  for (char& c : out) c = (char)std::toupper((unsigned char)c);
  return out;
}
// log banners / VCF date strings in uninstantiated driver templates
namespace gregorian {
struct date {};
std::string to_iso_string(date);
}  // namespace gregorian
namespace posix_time {
struct ptime {
  gregorian::date date() const;
};
std::string to_simple_string(ptime);
struct second_clock {
  static ptime local_time();
};
}  // namespace posix_time
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

// util.h:273-285 — CT orientation string per svt.
inline std::string _addOrientation(int32_t const svt) {
  uint8_t ct = _getSpanOrientation(svt);
  if (ct == 0) return "3to3";
  if (ct == 1) return "5to5";
  if (ct == 2) return "3to5";
  if (ct == 3) return "5to3";
  return "NtoN";
}

// util.h:102-130 — debug printers, named only in comments/templates.
inline void printAlignment(std::string const&, std::string const&,
                           EdlibAlignMode const,
                           EdlibAlignResult const&) {}

}  // namespace torali

#endif
