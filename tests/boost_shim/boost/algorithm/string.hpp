// Functional stand-in for the boost string algorithms the reference
// uses concretely (split on a delimiter set); to_upper_copy comes from
// probe_common.hpp.  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_ALGORITHM_STRING
#define DP_PROBE_SHIM_BOOST_ALGORITHM_STRING

#include <string>
#include <vector>

namespace boost {

struct is_any_of {
  std::string set;
  explicit is_any_of(std::string const& s) : set(s) {}
  bool operator()(char c) const { return set.find(c) != std::string::npos; }
};

// boost::split semantics: empty tokens are KEPT (token_compress_off)
template <typename TSeq, typename TPred>
inline void split(TSeq& out, std::string const& s, TPred pred) {
  out.clear();
  std::string cur;
  for (char c : s) {
    if (pred(c)) {
      out.push_back(cur);
      cur.clear();
    } else {
      cur.push_back(c);
    }
  }
  out.push_back(cur);
}

}  // namespace boost

#endif
