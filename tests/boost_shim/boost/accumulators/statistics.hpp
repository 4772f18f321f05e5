// See accumulators.hpp in this directory.
#ifndef DP_PROBE_BOOST_ACCUMULATORS_STATS_SHIM
#define DP_PROBE_BOOST_ACCUMULATORS_STATS_SHIM
#include <boost/accumulators/accumulators.hpp>
#endif
