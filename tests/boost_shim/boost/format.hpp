// No-op shim (see probe_common.hpp).  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_FORMAT
#define DP_PROBE_SHIM_BOOST_FORMAT
#endif
