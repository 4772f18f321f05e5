// Re-export shim.  NOT boost code.
#ifndef DP_SHIM_boost_filesystem_path_hpp
#define DP_SHIM_boost_filesystem_path_hpp
#include <boost/filesystem.hpp>
#endif
