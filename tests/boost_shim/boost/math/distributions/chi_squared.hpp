// Minimal stand-in for boost::math::chi_squared as used by the
// reference's popgen.h (df=1 upper tail only).  For df=1,
// P(X > x) = gamma_q(1/2, x/2) = erfc(sqrt(x/2)); boost evaluates the
// same special case through its incomplete-gamma machinery, so values
// agree to ~1 ulp of libm's erfc.  NOT boost code.
#ifndef DP_PROBE_BOOST_MATH_CHISQ_SHIM
#define DP_PROBE_BOOST_MATH_CHISQ_SHIM

#include <cmath>

namespace boost {
namespace math {

struct chi_squared {
  double df;
  explicit chi_squared(double d) : df(d) {}
};

struct complemented_chisq {
  chi_squared dist;
  double x;
};

inline complemented_chisq complement(chi_squared const& d, double x) {
  return complemented_chisq{d, x};
}

inline double cdf(complemented_chisq const& c) {
  // df == 1 is the only case the reference exercises (popgen.h:199)
  return std::erfc(std::sqrt(c.x / 2.0));
}

}  // namespace math
}  // namespace boost

#endif
