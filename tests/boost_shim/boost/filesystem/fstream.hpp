// Re-export shim.  NOT boost code.
#ifndef DP_SHIM_boost_filesystem_fstream_hpp
#define DP_SHIM_boost_filesystem_fstream_hpp
#include <boost/filesystem.hpp>
#endif
