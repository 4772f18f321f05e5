// No-op shim (see probe_common.hpp).  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_FUNCTIONAL_HASH_HPP
#define DP_PROBE_SHIM_BOOST_FUNCTIONAL_HASH_HPP
#endif
