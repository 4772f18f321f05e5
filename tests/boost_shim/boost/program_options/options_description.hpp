// No-op shim: contents unused by probe-instantiated code paths
// (see probe_common.hpp).  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_PROGRAM_OPTIONS_OPTIONS_DESCRIPTION_HPP
#define DP_PROBE_SHIM_BOOST_PROGRAM_OPTIONS_OPTIONS_DESCRIPTION_HPP
#endif
