// Minimal compile-only stand-in for the boost::icl interval containers
// named inside the reference's uninstantiated BAM-driver templates
// (scan.h:84-101, util.h interval sets).  Functional enough to
// typecheck begin/end iteration with lower()/upper(); never driven by
// a probe.  NOT boost code.
#ifndef DP_PROBE_BOOST_ICL_SHIM
#define DP_PROBE_BOOST_ICL_SHIM

#include <set>
#include <utility>

namespace boost {
namespace icl {

template <typename T>
struct discrete_interval {
  T lo{}, hi{};
  static discrete_interval right_open(T l, T h) {
    return discrete_interval{l, h};
  }
  T lower() const { return lo; }
  T upper() const { return hi; }
  bool operator<(discrete_interval const& o) const {
    return lo < o.lo || (lo == o.lo && hi < o.hi);
  }
};

template <typename T>
class interval_set {
 public:
  typedef std::set<discrete_interval<T> > storage;
  typedef typename storage::iterator iterator;
  typedef typename storage::const_iterator const_iterator;
  iterator begin() { return s_.begin(); }
  iterator end() { return s_.end(); }
  const_iterator begin() const { return s_.begin(); }
  const_iterator end() const { return s_.end(); }
  void insert(discrete_interval<T> const& iv) { s_.insert(iv); }
  void clear() { s_.clear(); }
  std::size_t size() const { return s_.size(); }
  bool empty() const { return s_.empty(); }

 private:
  storage s_;
};

template <typename K, typename V>
class split_interval_map {};

}  // namespace icl
}  // namespace boost

#endif
