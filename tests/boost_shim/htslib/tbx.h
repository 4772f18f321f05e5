// No-op shim: tabix API named by filter.h includes only.  NOT htslib
// code.
#ifndef DP_PROBE_SHIM_HTSLIB_TBX_H
#define DP_PROBE_SHIM_HTSLIB_TBX_H
#endif
