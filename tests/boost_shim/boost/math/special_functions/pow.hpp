// No-op shim (see probe_common.hpp).  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_MATH_SPECIAL_FUNCTIONS_POW_HPP
#define DP_PROBE_SHIM_BOOST_MATH_SPECIAL_FUNCTIONS_POW_HPP
#endif
