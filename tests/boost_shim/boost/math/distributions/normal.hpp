// Minimal stand-in for boost::math::normal + pdf as used by the
// reference's bolog.h.  The pdf mirrors boost's evaluation order
// (exponent = x - mean; exponent *= -exponent; exponent /= 2*sd*sd;
// exp(exponent) / (sd * sqrt(2*pi))) so double results agree with a
// real boost build to the last bit on the sane-parameter inputs the
// pipeline produces.  NOT boost code.
#ifndef DP_PROBE_BOOST_MATH_NORMAL_SHIM
#define DP_PROBE_BOOST_MATH_NORMAL_SHIM

#include <cmath>

namespace boost {
namespace math {

struct normal {
  double m, s;
  normal(double mean, double sd) : m(mean), s(sd) {}
};

inline double pdf(normal const& d, double x) {
  double exponent = x - d.m;
  exponent *= -exponent;
  exponent /= 2 * d.s * d.s;
  double result = std::exp(exponent);
  result /= d.s * std::sqrt(2 * 3.14159265358979323846);
  return result;
}

}  // namespace math
}  // namespace boost

#endif
