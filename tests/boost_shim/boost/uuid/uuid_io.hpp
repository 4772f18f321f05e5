// No-op shim: uuids are only used by the sliced-off CLI driver.
// NOT boost code.
#ifndef DP_PROBE_SHIM_BOOST_UUID_uuid_io_HPP
#define DP_PROBE_SHIM_BOOST_UUID_uuid_io_HPP
#endif
