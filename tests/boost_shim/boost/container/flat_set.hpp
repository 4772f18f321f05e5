// Functional stand-in: boost::container::flat_set is API-compatible
// with std::set for the ordered-set operations the reference performs.
// NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_FLAT_SET
#define DP_PROBE_SHIM_BOOST_FLAT_SET

#include <set>

namespace boost {
namespace container {
template <typename K, typename C = std::less<K>,
          typename A = std::allocator<K> >
using flat_set = std::set<K, C, A>;
}  // namespace container
}  // namespace boost

#endif
