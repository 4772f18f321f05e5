// Differential-oracle probe #5: drives the REFERENCE statistics layer
// (/root/reference/src/popgen.h and bolog.h, included as-is with
// minimal boost::math shims) so the repo's from-scratch
// delly_tpu/ops/{popgen,likelihood}.py can be fuzzed against the real
// reference code actually executing: HWE allele-frequency EM, genotype
// -frequency EM, inbreeding coefficient, imputation R², dosage R²,
// HWE LRT p-value, diploid GL/GQ/GT computation, and copy-number
// likelihoods (including their float32 store-and-read-back behavior).
//
// stdin, one case per line:
//   POPGEN <eps> <maxiter> <n> <gl0,gl1,gl2> ...
//   DOSR2  <minShared> <n> <a...> <m> <b...>      (dosages, -1 = miss)
//   GLS    <refq,...|-> <altq,...|->              (phred mapqs)
//   CNL    <ploidy> <mean> <sd>
// stdout, one line per case:
//   POPGEN: af0 af1 gt0 gt1 gt2 fic rsq pval     (all %.17g)
//   DOSR2:  r2                                   (%.17g)
//   GLS:    gl0 gl1 gl2 gq gt0 gt1   |  MISSING 0 <gt_missing>
//   CNL:    g0..g9 gq varqual                    (gl %.9g float32)
#include <cstdint>
#include <cstdio>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#define MAX_CN 10  // util.h:25-27
// htslib/vcf.h genotype encoding (public API constants)
#define bcf_gt_unphased(idx) (((idx) + 1) << 1)
#define bcf_gt_missing 0

#include "bolog.h"
#include "popgen.h"

using namespace torali;

struct Cfg {
  double epsilon;
  std::size_t maxiter;
  double ploidy;
};

static std::vector<double> parseList(std::string const& tok) {
  std::vector<double> out;
  if (tok == "-" || tok == ".") return out;
  std::istringstream ls(tok);
  std::string item;
  while (std::getline(ls, item, ',')) out.push_back(std::stod(item));
  return out;
}

int main() {
  std::printf("%s", "");  // keep stdio/iostream sync defaults
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op == "POPGEN") {
      Cfg c;
      int n;
      ss >> c.epsilon >> c.maxiter >> n;
      typedef std::vector<std::vector<double> > TGlVector;
      TGlVector glv;
      for (int i = 0; i < n; ++i) {
        std::string tok;
        ss >> tok;
        glv.push_back(parseList(tok));
      }
      double af[2] = {0, 0};
      double gtf[3] = {0, 0, 0};
      double fic = 0, rsq = 0, pval = 1;
      _estBiallelicAF(c, glv, af);
      _estBiallelicGTFreq(c, glv, gtf);
      _estBiallelicFIC(glv, af, fic);
      _estBiallelicRSQ(glv, af, rsq);
      _estBiallelicHWE_LRT(glv, af, gtf, pval);
      std::printf("%.17g %.17g %.17g %.17g %.17g %.17g %.17g %.17g\n",
                  af[0], af[1], gtf[0], gtf[1], gtf[2], fic, rsq, pval);
    } else if (op == "DOSR2") {
      int minShared, n, m;
      ss >> minShared >> n;
      std::vector<double> a(n), b;
      for (int i = 0; i < n; ++i) ss >> a[i];
      ss >> m;
      b.resize(m);
      for (int i = 0; i < m; ++i) ss >> b[i];
      std::printf("%.17g\n", _dosageR2(a, b, minShared));
    } else if (op == "GLS") {
      std::string rtok, atok;
      ss >> rtok >> atok;
      std::vector<double> rq = parseList(rtok), aq = parseList(atok);
      std::vector<uint8_t> mapqRef(rq.begin(), rq.end());
      std::vector<uint8_t> mapqAlt(aq.begin(), aq.end());
      static BoLog<double> bl;  // modvcf.h:347
      float gls[3] = {0, 0, 0};
      int32_t gq[1] = {0};
      int32_t gts[2] = {-7, -7};
      _computeGLs(bl, mapqRef, mapqAlt, gls, gq, gts, 0);
      if (gts[0] == bcf_gt_missing && gts[1] == bcf_gt_missing &&
          (mapqRef.empty() && mapqAlt.empty())) {
        std::printf("MISSING %d %d\n", gq[0], bcf_gt_missing);
      } else {
        std::printf("%.9g %.9g %.9g %d %d %d\n", gls[0], gls[1],
                    gls[2], gq[0], gts[0], gts[1]);
      }
    } else if (op == "CNL") {
      Cfg c;
      double mean, sd;
      ss >> c.ploidy >> mean >> sd;
      float gl[MAX_CN];
      int32_t gq[1] = {0};
      int32_t varqual = _computeCNLs(c, mean, sd, gl, gq);
      for (int i = 0; i < MAX_CN; ++i) std::printf("%.9g ", gl[i]);
      std::printf("%d %d\n", gq[0], varqual);
    }
    std::fflush(stdout);
  }
  return 0;
}
