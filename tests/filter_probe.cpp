// Differential-oracle probe #17: the somatic/germline FILTER engine.
// Compiles the reference's filter.h AS-IS (with modvcf.h + popgen.h;
// its program_options CLI function sliced off at fixture time) and
// runs the real filterRun (/root/reference/src/filter.h:495-1012) over
// the functional text-mode htslib vcf layer (vcf_text_replay.hpp), so
// delly_tpu/models/filter.py can be fuzzed end-to-end against the
// reference code actually executing: PASS gating and size/quality
// windows (:605-610,706), germline CNV reclassification with CN-shift,
// DEL/DUP calling, population-SD CNL recompute and popgen EM
// (:228-493), the somatic CNV Gaussian overlap test (:163-225), the
// germline SV gates with posterior GQ re-genotyping (:722-810), the
// somatic SV tumor/control gates (:862-880), and the redundant-site
// collapse window with dosage-R2 (:89-160, 596-603, 929-943).
//
// usage: probe <in.vcf> <filter> <soft 0/1> <pass 0/1> <minsize>
//        <maxsize> <coverage> <qualthres> <rdist> <rminshared>
//        <ratiogeno> <altaf> <controlcont> <genogq> <hwe> <rsize>
//        <rcorr> <rddel> <rddup> <maxsd> <recCnv> <pgerm> <cn_offset>
//        <noRefine 0/1> <noCollapse 0/1> [name=tumor|control ...]
// stdout: the filtered VCF text (header + body)
#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <vector>

#include "probe_common.hpp"

#include <boost/container/flat_set.hpp>
#include <boost/dynamic_bitset.hpp>
#include <boost/filesystem.hpp>
#include <boost/icl/split_interval_map.hpp>
#include <boost/math/distributions/chi_squared.hpp>
#include <boost/math/distributions/normal.hpp>
#include <boost/multi_array.hpp>
#include <boost/unordered_map.hpp>

#include "probe_replay.hpp"

#include "vcf_text_replay.hpp"

namespace torali {
// util.h:744-749 — nth_element median
template <typename TIterator, typename TValue>
inline void getMedian(TIterator begin, TIterator end, TValue& median) {
  std::nth_element(begin, begin + (end - begin) / 2, end);
  median = *(begin + (end - begin) / 2);
}
// util.h:752-757 — nth_element percentile
template <typename TVector, typename TPercentile, typename TValue>
inline void getPercentile(TVector& vec, TPercentile p,
                          TValue& percentile) {
  std::nth_element(vec.begin(), vec.begin() + int(vec.size() * p),
                   vec.end());
  percentile = *(vec.begin() + int(vec.size() * p));
}
// named (not instantiated) inside vcfParse — util.h:287-326
int32_t _decodeOrientation(std::string const&, std::string const&);
}  // namespace torali

#define UTIL_H  // helpers restated above / pulled via probe_common
#define MAX_CN 10

#include "version.h"

#include "popgen.h"

#include "modvcf.h"

// filter.h minus its program_options CLI function (the test fixture
// slices everything up to `int filter(int argc, char **argv)`)
#include "filter_sliced.h"

using namespace torali;

int main(int argc, char** argv) {
  if (argc < 26) {
    std::cerr << "usage: see header" << std::endl;
    return 2;
  }
  FilterConfig c;
  int a = 1;
  c.vcffile = boost::filesystem::path(argv[a++]);
  c.filter = argv[a++];
  c.softFilter = std::atoi(argv[a++]) != 0;
  c.filterForPass = std::atoi(argv[a++]) != 0;
  c.minsize = std::atoi(argv[a++]);
  c.maxsize = std::atoi(argv[a++]);
  c.coverage = std::atoi(argv[a++]);
  c.qualthres = std::atoi(argv[a++]);
  c.rdist = std::atoi(argv[a++]);
  c.rminshared = std::atoi(argv[a++]);
  c.ratiogeno = std::atof(argv[a++]);
  c.altaf = std::atof(argv[a++]);
  c.controlcont = std::atof(argv[a++]);
  c.genogq = std::atof(argv[a++]);
  c.hwe = std::atof(argv[a++]);
  c.rsize = std::atof(argv[a++]);
  c.rcorr = std::atof(argv[a++]);
  c.rddel = std::atof(argv[a++]);
  c.rddup = std::atof(argv[a++]);
  c.maxsd = std::atof(argv[a++]);
  c.recCnv = std::atof(argv[a++]);
  c.pgerm = std::atof(argv[a++]);
  c.cn_offset = std::atof(argv[a++]);
  c.noRefine = std::atoi(argv[a++]) != 0;
  c.noCollapse = std::atoi(argv[a++]) != 0;
  c.outfile = boost::filesystem::path("-");
  c.epsilon = 1e-20;
  c.maxiter = 1000;
  c.ploidy = 2;
  c.hasSampleFile = false;
  for (; a < argc; ++a) {
    std::string tok(argv[a]);
    std::size_t eq = tok.find('=');
    std::string name = tok.substr(0, eq), role = tok.substr(eq + 1);
    c.hasSampleFile = true;
    if (role == "tumor")
      c.tumorSet.insert(name);
    else
      c.controlSet.insert(name);
  }
  // post-parse rule (filter.h:1104)
  if (c.filter == "germline") c.controlcont = 1.0;

  filterRun(c);
  std::cout << g_vcf_stdout;
  return 0;
}
