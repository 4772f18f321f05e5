// Functional stand-in: boost::unordered_map as used by the reference
// is API-compatible with std::unordered_map for the operations the
// headers perform.  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_UNORDERED_MAP
#define DP_PROBE_SHIM_BOOST_UNORDERED_MAP

#include <unordered_map>

namespace boost {
template <typename K, typename V,
          typename H = std::hash<K>, typename E = std::equal_to<K>,
          typename A = std::allocator<std::pair<const K, V> > >
using unordered_map = std::unordered_map<K, V, H, E, A>;
}

#endif
