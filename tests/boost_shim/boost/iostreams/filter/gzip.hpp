// See filtering_stream.hpp in this directory.
#ifndef DP_PROBE_SHIM_BOOST_IOSTREAMS_FILTER_GZIP_HPP
#define DP_PROBE_SHIM_BOOST_IOSTREAMS_FILTER_GZIP_HPP
#include <boost/iostreams/filtering_stream.hpp>
#endif
