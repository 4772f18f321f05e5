// No-op shim: the reference header including this never uses its
// contents in the probe-instantiated code paths (types/records come
// from tests/probe_common.hpp).  NOT boost/htslib code.
#ifndef DP_PROBE_SHIM_BOOST_IOSTREAMS_DEVICE_FILE_HPP
#define DP_PROBE_SHIM_BOOST_IOSTREAMS_DEVICE_FILE_HPP
#endif
