// Functional htslib REPLAY layer shared by the probes that run real
// reference BAM-iteration loops (junction_probe.cpp, pe_probe.cpp):
// records are stored per (file, tid) in g_files and handed back
// through sam_itr_next in order; probe regions are whole chromosomes.
// Satisfies the declarations in probe_common.hpp.  NOT htslib code.
#ifndef DP_PROBE_REPLAY_HPP
#define DP_PROBE_REPLAY_HPP

#include <map>
#include <vector>

// ---- functional replay IO layer (satisfies probe_common decls) ----
struct samFile {
  int idx;
};
struct hts_idx_t {
  int idx;
};
struct hts_itr_t {
  int file;
  int tid;
  std::size_t i;
};
static std::vector<std::map<int, std::vector<bam1_t> > > g_files;
static std::vector<uint32_t> g_tlen;
// optional target names (probes that run reference code dereferencing
// hdr->target_name set these; sam_hdr_read is re-invoked inside the
// reference loops, so the names must live here, not in probe locals)
static std::vector<std::string> g_tname_store;
static std::vector<char*> g_tname;

samFile* sam_open(const char* f, const char*) {
  return new samFile{std::atoi(f)};
}
int sam_close(samFile* s) {
  delete s;
  return 0;
}
bam_hdr_t* sam_hdr_read(samFile*) {
  static bam_hdr_t h;
  h.n_targets = (int32_t)g_tlen.size();
  h.target_len = g_tlen.data();
  h.target_name = g_tname.empty() ? nullptr : g_tname.data();
  return &h;
}
static void replaySetTargetNames() {
  g_tname_store.resize(g_tlen.size());
  g_tname.resize(g_tlen.size());
  for (std::size_t t = 0; t < g_tlen.size(); ++t) {
    g_tname_store[t] = std::to_string(t);
    g_tname[t] = const_cast<char*>(g_tname_store[t].c_str());
  }
}
void bam_hdr_destroy(bam_hdr_t*) {}
hts_idx_t* sam_index_load(samFile* s, const char*) {
  return new hts_idx_t{s->idx};
}
void hts_idx_destroy(hts_idx_t* i) { delete i; }
int hts_set_fai_filename(samFile*, const char*) { return 0; }
hts_itr_t* sam_itr_queryi(hts_idx_t* i, int tid, int64_t, int64_t) {
  return new hts_itr_t{i->idx, tid, 0};  // probe regions = whole chr
}
void hts_itr_destroy(hts_itr_t* it) { delete it; }
bam1_t* bam_init1() { return new bam1_t(); }
void bam_destroy1(bam1_t* b) { delete b; }
int sam_itr_next(samFile*, hts_itr_t* it, bam1_t* rec) {
  std::vector<bam1_t>& v = g_files[it->file][it->tid];
  if (it->i >= v.size()) return -1;
  *rec = v[it->i++];
  return 0;
}

namespace boost {
namespace posix_time {
// instantiated banner path: stub the clock/format decls
inline ptime second_clock::local_time() { return ptime(); }
std::string to_simple_string(ptime) { return std::string(); }
}  // namespace posix_time
}  // namespace boost


// index statistics: mapped-record count per target (chrNoData gate)
int hts_idx_get_stat(const hts_idx_t* i, int tid, uint64_t* mapped,
                     uint64_t* unmapped) {
  std::map<int, std::vector<bam1_t> >& f =
      g_files[const_cast<hts_idx_t*>(i)->idx];
  *mapped = f.count(tid) ? f[tid].size() : 0;
  *unmapped = 0;
  return 0;
}

#endif
