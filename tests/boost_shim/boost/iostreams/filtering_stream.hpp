// Declaration-only stand-in for boost::iostreams filtering streams as
// named inside uninstantiated reference driver templates; never
// constructed by any probe.  NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_IOSTREAMS_FILTERING_STREAM
#define DP_PROBE_SHIM_BOOST_IOSTREAMS_FILTERING_STREAM

#include <iosfwd>
#include <string>

namespace boost {
namespace iostreams {

class filtering_ostream {
 public:
  filtering_ostream();
  template <typename T>
  void push(T const&);
  template <typename T>
  filtering_ostream& operator<<(T const&);
  filtering_ostream& operator<<(std::ostream& (*)(std::ostream&));
  bool good() const;
  void pop();
  void flush();
  void reset();
};

class filtering_istream {
 public:
  filtering_istream();
  template <typename T>
  void push(T const&);
  bool good() const;
  void pop();
  void reset();
};

struct gzip_compressor {
  gzip_compressor();
};
struct gzip_decompressor {
  gzip_decompressor();
};
struct file_sink {
  template <typename... A>
  explicit file_sink(A&&...);
};
struct file_source {
  template <typename... A>
  explicit file_source(A&&...);
};

}  // namespace iostreams
}  // namespace boost

#endif
