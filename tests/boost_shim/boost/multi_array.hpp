// Minimal from-scratch stand-in for the boost headers used by the
// reference's DP stack (align.h / gotoh.h / needle.h / msa.h), written
// for tests/dp_probe.cpp so those headers compile WITHOUT boost.  Only
// the exact API surface those four files touch is provided, with
// matching semantics (zero value-initialization, shape(), resize
// discarding contents — every resize call site there targets a fresh
// array).  This is NOT boost code.
#ifndef DP_PROBE_BOOST_MULTI_ARRAY_SHIM
#define DP_PROBE_BOOST_MULTI_ARRAY_SHIM

#include <cstddef>
#include <memory>
#include <string>
#include <type_traits>
#include <vector>

namespace boost {

namespace shim_detail {
struct extent2 {
  std::size_t d0, d1;
};
struct extent1 {
  std::size_t d0;
  extent2 operator[](std::size_t d) const { return extent2{d0, d}; }
};
struct extent0 {
  extent1 operator[](std::size_t d) const { return extent1{d}; }
};
}  // namespace shim_detail

inline shim_detail::extent0 extents;

template <typename T, std::size_t N>
class multi_array;

template <typename T>
class multi_array<T, 2> {
 public:
  typedef std::ptrdiff_t index;

  multi_array() : sh_{0, 0} {}
  explicit multi_array(shim_detail::extent2 e) : sh_{0, 0} { resize(e); }
  multi_array(multi_array const& o) : sh_{0, 0} { *this = o; }
  multi_array& operator=(multi_array const& o) {
    if (this != &o) {
      resize(shim_detail::extent2{o.sh_[0], o.sh_[1]});
      for (std::size_t i = 0; i < sh_[0] * sh_[1]; ++i)
        data_[i] = o.data_[i];
    }
    return *this;
  }

  void resize(shim_detail::extent2 e) {
    sh_[0] = e.d0;
    sh_[1] = e.d1;
    data_.reset(new T[sh_[0] * sh_[1]]());  // value-init, like boost
  }
  const std::size_t* shape() const { return sh_; }
  T* operator[](std::size_t i) { return data_.get() + i * sh_[1]; }
  const T* operator[](std::size_t i) const {
    return data_.get() + i * sh_[1];
  }

 private:
  std::size_t sh_[2];
  std::unique_ptr<T[]> data_;
};

// align.h's _alignmentScore (never instantiated by the probe) names
// boost::tokenizer / char_separator / lexical_cast without including
// their headers; give it functional minimal definitions so two-phase
// lookup succeeds.
template <typename CharT>
struct char_separator {
  std::string dropped;
  explicit char_separator(const CharT* d) : dropped(d) {}
};

template <typename Sep>
class tokenizer {
 public:
  typedef std::vector<std::string>::const_iterator iterator;
  tokenizer(std::string const& s, Sep const& sep) {
    std::string cur;
    for (char c : s) {
      if (sep.dropped.find(c) != std::string::npos) {
        if (!cur.empty()) toks_.push_back(cur);
        cur.clear();
      } else {
        cur.push_back(c);
      }
    }
    if (!cur.empty()) toks_.push_back(cur);
  }
  iterator begin() const { return toks_.begin(); }
  iterator end() const { return toks_.end(); }

 private:
  std::vector<std::string> toks_;
};

template <typename T>
inline typename std::enable_if<!std::is_same<T, std::string>::value
                                   && !std::is_same<T, char>::value,
                               T>::type
lexical_cast(std::string const& s) {
  return static_cast<T>(std::stol(s));
}

template <typename T>
inline typename std::enable_if<std::is_same<T, char>::value, T>::type
lexical_cast(std::string const& s) {
  return s.empty() ? '\0' : s[0];
}

template <typename T, typename S>
inline typename std::enable_if<std::is_same<T, std::string>::value,
                               T>::type
lexical_cast(S const& v) {
  return std::to_string(v);
}

}  // namespace boost

#endif
