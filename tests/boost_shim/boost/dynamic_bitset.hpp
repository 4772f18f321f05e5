// Minimal stand-in for boost::dynamic_bitset as used by the
// reference's gotoh.h / needle.h trace matrices: construct with
// (size, fill) and read/write single bits via operator[].  Backed by
// std::vector<bool> (bit-packed).  This is NOT boost code — see
// multi_array.hpp in this directory.
#ifndef DP_PROBE_BOOST_DYNAMIC_BITSET_SHIM
#define DP_PROBE_BOOST_DYNAMIC_BITSET_SHIM

#include <cstddef>
#include <vector>

namespace boost {

template <typename Block = unsigned long>
class dynamic_bitset {
 public:
  dynamic_bitset() {}
  dynamic_bitset(std::size_t n, bool value = false) : b_(n, value) {}
  std::vector<bool>::reference operator[](std::size_t i) { return b_[i]; }
  bool operator[](std::size_t i) const { return b_[i]; }
  std::size_t size() const { return b_.size(); }

 private:
  std::vector<bool> b_;
};

}  // namespace boost

#endif
