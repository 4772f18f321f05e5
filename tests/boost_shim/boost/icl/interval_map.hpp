// Re-export shim: filter.h includes this path.  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_ICL_INTERVAL_MAP_HPP
#define DP_PROBE_SHIM_BOOST_ICL_INTERVAL_MAP_HPP
#include <boost/icl/split_interval_map.hpp>
#endif
