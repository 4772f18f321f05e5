// Minimal compile-only stand-in for boost::accumulators as named by
// the reference's cnv.h genotypeCNVs (mean/variance accumulator).
// That function is NOT driven by any probe — this exists solely so the
// header parses; the statistics here are a plain sequential
// sum/sum-of-squares, NOT boost's iterative algorithm.  NOT boost code.
#ifndef DP_PROBE_BOOST_ACCUMULATORS_SHIM
#define DP_PROBE_BOOST_ACCUMULATORS_SHIM

namespace boost {
namespace accumulators {

namespace tag {
struct mean {};
struct variance {};
}  // namespace tag

template <typename... T>
struct features {};

template <typename Sample, typename Features>
struct accumulator_set {
  double n = 0, s = 0, ss = 0;
  void operator()(Sample x) {
    n += 1;
    s += x;
    ss += (double)x * (double)x;
  }
};

template <typename A>
inline double mean(A const& a) {
  return a.n > 0 ? a.s / a.n : 0.0;
}

template <typename A>
inline double variance(A const& a) {
  if (a.n <= 0) return 0.0;
  double m = a.s / a.n;
  return a.ss / a.n - m * m;
}

}  // namespace accumulators
}  // namespace boost

#endif
