// No-op shim (see probe_common.hpp).  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_GRAPH_CONNECTED_COMPONENTS_HPP
#define DP_PROBE_SHIM_BOOST_GRAPH_CONNECTED_COMPONENTS_HPP
#endif
