// Minimal stand-in for boost::math round/iround as used by the
// reference's bolog.h: round half away from zero (what std::round /
// std::lround implement).  NOT boost code.
#ifndef DP_PROBE_BOOST_MATH_ROUND_SHIM
#define DP_PROBE_BOOST_MATH_ROUND_SHIM

#include <cmath>

namespace boost {
namespace math {

template <typename T>
inline double round(T v) {
  return std::round(static_cast<double>(v));
}

template <typename T>
inline int iround(T v) {
  return static_cast<int>(std::lround(static_cast<double>(v)));
}

}  // namespace math
}  // namespace boost

#endif
