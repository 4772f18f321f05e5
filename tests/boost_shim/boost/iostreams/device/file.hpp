// See filtering_stream.hpp in this directory.
#ifndef DP_PROBE_SHIM_BOOST_IOSTREAMS_DEVICE_FILE_HPP
#define DP_PROBE_SHIM_BOOST_IOSTREAMS_DEVICE_FILE_HPP
#include <boost/iostreams/filtering_stream.hpp>
#endif
