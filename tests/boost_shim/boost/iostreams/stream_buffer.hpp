// See filtering_stream.hpp in this directory.
#ifndef DP_PROBE_SHIM_BOOST_IOSTREAMS_STREAM_BUFFER_HPP
#define DP_PROBE_SHIM_BOOST_IOSTREAMS_STREAM_BUFFER_HPP
#include <boost/iostreams/filtering_stream.hpp>
#endif
