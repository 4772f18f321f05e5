// Minimal functional stand-in for boost::filesystem::path as used by
// the reference config structs (a string wrapper with .string()); the
// free functions are declaration-only (named in uninstantiated driver
// templates).  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_FILESYSTEM_HPP
#define DP_PROBE_SHIM_BOOST_FILESYSTEM_HPP

#include <fstream>
#include <ostream>
#include <string>

namespace boost {
namespace filesystem {

class path {
 public:
  path() {}
  path(std::string const& s) : s_(s) {}
  path(const char* s) : s_(s) {}
  std::string const& string() const { return s_; }
  path stem() const;
  path filename() const;
  path parent_path() const;
  bool empty() const { return s_.empty(); }
  void clear() { s_.clear(); }
  bool operator==(path const& o) const { return s_ == o.s_; }
  bool operator<(path const& o) const { return s_ < o.s_; }

 private:
  std::string s_;
};

inline bool exists(path const& p) {
  std::ifstream f(p.string().c_str());
  return f.good();
}
inline std::uintmax_t file_size(path const& p) {
  std::ifstream f(p.string().c_str(),
                  std::ios::binary | std::ios::ate);
  return f.good() ? (std::uintmax_t)f.tellg() : 0;
}
inline bool is_regular_file(path const& p) {
  // functional enough for the sliced _alternateAlignments (the alt
  // branch never runs: hasAltFile=false keeps the list empty)
  std::ifstream f(p.string().c_str());
  return f.good();
}

// functional: temp-name templating + deletion (asmode.h:659-667 writes
// a temp BCF, reads it back through the merge plane and removes it)
inline path unique_path(path const& model) {
  std::string s = model.string();
  char fill = 'a';
  for (char& ch : s)
    if (ch == '%') {
      ch = fill;
      fill = (fill == 'z') ? 'a' : (char)(fill + 1);
    }
  return path(s);
}
inline bool remove(path const& p) {
  return ::remove(p.string().c_str()) == 0;
}

inline std::ostream& operator<<(std::ostream& os, path const& p) {
  return os << p.string();
}

}  // namespace filesystem
}  // namespace boost

#endif
