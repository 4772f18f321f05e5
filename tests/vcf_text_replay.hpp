// Functional TEXT-MODE htslib vcf layer shared by the probes that run
// reference BCF-consuming drivers (filter_probe.cpp,
// merge_emit_probe.cpp): VCF text files parse into in-memory headers +
// records with htslib get/update semantics, updates render back with
// htslib rules (%g floats, '.' missing, GT phase bits), and writers
// emit VCF text to real paths so later reference reads see them.
// Satisfies the declarations in boost_shim/htslib/vcf.h.  NOT htslib
// code.
#ifndef DP_PROBE_VCF_TEXT_REPLAY_HPP
#define DP_PROBE_VCF_TEXT_REPLAY_HPP

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <fstream>
#include <map>
#include <string>
#include <vector>

#include <htslib/vcf.h>

struct VTFile {
  bool writer = false;
  std::string path;
  // reader state
  bcf_hdr_t* hdr = nullptr;
  std::vector<std::string> body;
  std::size_t idx = 0;
  // writer state
  std::string buf;
};
struct htsFile {
  VTFile* f;
};
static std::string g_vcf_stdout;  // writer output for path "-"

struct HdrData {
  std::vector<std::string> lines;  // ## header lines, in order
  std::vector<std::string> dict;   // FILTER/INFO/FORMAT ids, [0]=PASS
  std::map<std::string, int> infoType, fmtType;
  std::vector<std::string> contigs;
  std::vector<std::string> samples;
  std::vector<char*> samplePtrs;
};
static std::map<const bcf_hdr_t*, HdrData> g_hdrs;
static std::deque<bcf_hdr_t> g_hdr_pool;

struct FmtField {
  std::string key;
  std::vector<std::string> vals;  // rendered per-sample strings
};
struct InfoKV {
  std::string key, val;
  bool flag;
};
struct RecData {
  std::string id{"."};
  std::vector<std::string> alleles;
  std::vector<int> filters;
  std::vector<InfoKV> info;
  std::vector<FmtField> fmt;
  bool qualMissing = false;
  std::vector<char*> allelePtrs;  // backs rec->d.allele
};
static std::map<const bcf1_t*, RecData> g_recs;

// keep the raw pointers reference code dereferences (rec->d.id,
// rec->d.allele[i]) in sync with the side data
static void _syncRecPtrs(bcf1_t* rec) {
  RecData& d = g_recs.at(rec);
  rec->d.id = const_cast<char*>(d.id.c_str());
  d.allelePtrs.clear();
  for (auto& a : d.alleles)
    d.allelePtrs.push_back(const_cast<char*>(a.c_str()));
  rec->d.allele = d.allelePtrs.data();
}

static int _typeCode(std::string const& t) {
  if (t == "Integer") return BCF_HT_INT;
  if (t == "Float") return BCF_HT_REAL;
  if (t == "Flag") return BCF_HT_FLAG;
  return BCF_HT_STR;
}
static std::string _lineAttr(std::string const& line,
                             std::string const& attr) {
  std::size_t at = line.find(attr + "=");
  if (at == std::string::npos) return std::string();
  at += attr.size() + 1;
  std::size_t end = line.find_first_of(",>", at);
  return line.substr(at, end - at);
}

static void _hdrAddLine(bcf_hdr_t* h, std::string const& line) {
  HdrData& d = g_hdrs[h];
  d.lines.push_back(line);
  for (const char* pre : {"##FILTER=<", "##INFO=<", "##FORMAT=<"}) {
    if (line.compare(0, std::strlen(pre), pre) != 0) continue;
    std::string id = _lineAttr(line, "ID");
    if (!id.empty() &&
        std::find(d.dict.begin(), d.dict.end(), id) == d.dict.end())
      d.dict.push_back(id);
    std::string ty = _lineAttr(line, "Type");
    if (line.compare(0, 8, "##INFO=<") == 0)
      d.infoType[id] = _typeCode(ty);
    if (line.compare(0, 10, "##FORMAT=<") == 0)
      d.fmtType[id] = _typeCode(ty);
  }
  if (line.compare(0, 10, "##contig=<") == 0)
    d.contigs.push_back(_lineAttr(line, "ID"));
  h->n[0] = (int32_t)d.dict.size();
  h->n[1] = (int32_t)d.contigs.size();
}

static bcf_hdr_t* _newHdr() {
  g_hdr_pool.push_back(bcf_hdr_t());
  bcf_hdr_t* h = &g_hdr_pool.back();
  h->n[0] = h->n[1] = h->n[2] = 0;
  h->samples = nullptr;
  g_hdrs[h].dict.assign(1, "PASS");
  return h;
}
static void _hdrFinishSamples(bcf_hdr_t* h) {
  HdrData& d = g_hdrs[h];
  d.samplePtrs.clear();
  for (auto& s : d.samples)
    d.samplePtrs.push_back(const_cast<char*>(s.c_str()));
  h->samples = d.samplePtrs.data();
  h->n[2] = (int32_t)d.samples.size();
}

static std::vector<std::string> _split(std::string const& s, char sep) {
  std::vector<std::string> out;
  std::string cur;
  for (char ch : s) {
    if (ch == sep) {
      out.push_back(cur);
      cur.clear();
    } else {
      cur += ch;
    }
  }
  out.push_back(cur);
  return out;
}

htsFile* hts_open(const char* path, const char* mode) {
  VTFile* f = new VTFile();
  f->path = path;
  if (mode[0] == 'r') {
    std::ifstream in(path);
    if (!in.good()) {
      delete f;
      return nullptr;
    }
    f->hdr = _newHdr();
    std::string line;
    while (std::getline(in, line)) {
      if (line.empty()) continue;
      if (line.compare(0, 2, "##") == 0) {
        _hdrAddLine(f->hdr, line);
      } else if (line[0] == '#') {
        std::vector<std::string> cols = _split(line, '\t');
        HdrData& d = g_hdrs[f->hdr];
        for (std::size_t i = 9; i < cols.size(); ++i)
          d.samples.push_back(cols[i]);
        _hdrFinishSamples(f->hdr);
      } else {
        f->body.push_back(line);
      }
    }
    return new htsFile{f};
  }
  f->writer = true;
  return new htsFile{f};
}
int hts_close(htsFile* hf) {
  VTFile* f = hf->f;
  if (f->writer) {
    if (f->path == "-") {
      g_vcf_stdout = f->buf;
    } else {
      std::ofstream out(f->path.c_str());
      out << f->buf;
    }
  }
  delete f;
  delete hf;
  return 0;
}
htsFile* bcf_open(const char* p, const char* m) { return hts_open(p, m); }
int bcf_close(htsFile* f) { return hts_close(f); }
bcf_hdr_t* bcf_hdr_read(htsFile* hf) { return hf->f->hdr; }
void bcf_hdr_destroy(bcf_hdr_t*) {}
bcf_hdr_t* bcf_hdr_dup(const bcf_hdr_t* src) {
  bcf_hdr_t* h = _newHdr();
  g_hdrs[h] = g_hdrs.at(src);
  _hdrFinishSamples(h);
  return h;
}
bcf_hdr_t* bcf_hdr_init(const char*) {
  bcf_hdr_t* h = _newHdr();
  _hdrAddLine(h, "##fileformat=VCFv4.2");
  return h;
}
int bcf_hdr_append(bcf_hdr_t* h, const char* line) {
  _hdrAddLine(h, line);
  return 0;
}
int bcf_hdr_add_sample(bcf_hdr_t* h, const char* s) {
  if (s != nullptr) {
    g_hdrs.at(h).samples.push_back(s);
    _hdrFinishSamples(h);
  }
  return 0;
}
int bcf_hdr_remove(bcf_hdr_t* h, int type, const char* id) {
  // remove the header LINE; htslib keeps the dictionary id valid
  const char* pre = (type == BCF_HL_INFO)  ? "##INFO=<"
                    : (type == BCF_HL_FMT) ? "##FORMAT=<"
                    : (type == BCF_HL_FLT) ? "##FILTER=<"
                                           : "##";
  HdrData& d = g_hdrs.at(h);
  for (auto it = d.lines.begin(); it != d.lines.end(); ++it) {
    if (it->compare(0, std::strlen(pre), pre) == 0 &&
        _lineAttr(*it, "ID") == id) {
      d.lines.erase(it);
      return 0;
    }
  }
  return 0;
}
int bcf_hdr_id2int(const bcf_hdr_t* h, int, const char* key) {
  HdrData const& d = g_hdrs.at(h);
  for (std::size_t i = 0; i < d.dict.size(); ++i)
    if (d.dict[i] == key) return (int)i;
  return -1;
}
const char* bcf_hdr_int2id(const bcf_hdr_t* h, int, int id) {
  return g_hdrs.at(h).dict[id].c_str();
}
int bcf_hdr_id2type(const bcf_hdr_t* h, int hl, int id) {
  HdrData const& d = g_hdrs.at(h);
  if (id < 0 || id >= (int)d.dict.size()) return -1;
  std::string const& key = d.dict[id];
  if (hl == BCF_HL_FMT) {
    auto it = d.fmtType.find(key);
    return it == d.fmtType.end() ? -1 : it->second;
  }
  auto it = d.infoType.find(key);
  return it == d.infoType.end() ? -1 : it->second;
}
const char* bcf_hdr_id2name(const bcf_hdr_t* h, int rid) {
  return g_hdrs.at(h).contigs[rid].c_str();
}
int bcf_hdr_name2id(bcf_hdr_t* h, const char* name) {
  HdrData const& d = g_hdrs.at(h);
  for (std::size_t i = 0; i < d.contigs.size(); ++i)
    if (d.contigs[i] == name) return (int)i;
  return -1;
}
const char** bcf_hdr_seqnames(const bcf_hdr_t* h, int* nseq) {
  HdrData const& d = g_hdrs.at(h);
  *nseq = (int)d.contigs.size();
  const char** out =
      (const char**)malloc(d.contigs.size() * sizeof(char*));
  for (std::size_t i = 0; i < d.contigs.size(); ++i)
    out[i] = d.contigs[i].c_str();
  return out;
}
int bcf_hdr_set_samples(bcf_hdr_t*, const char*, int) { return 0; }
int bcf_hdr_write(htsFile* hf, bcf_hdr_t* h) {
  HdrData const& d = g_hdrs.at(h);
  std::string& buf = hf->f->buf;
  for (auto const& l : d.lines) buf += l + "\n";
  buf += "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO";
  if (!d.samples.empty()) {
    buf += "\tFORMAT";
    for (auto const& s : d.samples) buf += "\t" + s;
  }
  buf += "\n";
  return 0;
}

bcf1_t* bcf_init1() {
  bcf1_t* r = new bcf1_t();
  g_recs[r];
  return r;
}
bcf1_t* bcf_init() { return bcf_init1(); }
void bcf_destroy(bcf1_t* r) {
  g_recs.erase(r);
  delete r;
}
void bcf_destroy1(bcf1_t* r) { bcf_destroy(r); }
void bcf_clear1(bcf1_t* r) {
  r->rid = 0;
  r->pos = 0;
  r->qual = 0;
  r->n_allele = 0;
  g_recs[r] = RecData();
  _syncRecPtrs(r);
}
bcf1_t* bcf_dup(bcf1_t* src) {
  bcf1_t* r = new bcf1_t(*src);
  g_recs[r] = g_recs.at(src);
  _syncRecPtrs(r);
  return r;
}
int bcf_unpack(bcf1_t*, int) { return 0; }

int bcf_read(htsFile* hf, bcf_hdr_t* h, bcf1_t* rec) {
  VTFile* f = hf->f;
  if (f->idx >= f->body.size()) return -1;
  std::vector<std::string> cols = _split(f->body[f->idx++], '\t');
  bcf_clear1(rec);
  RecData& d = g_recs[rec];
  HdrData const& hd = g_hdrs.at(h);
  rec->rid = -1;
  for (std::size_t i = 0; i < hd.contigs.size(); ++i)
    if (hd.contigs[i] == cols[0]) rec->rid = (int32_t)i;
  rec->pos = std::stol(cols[1]) - 1;
  d.id = cols[2];
  d.alleles.push_back(cols[3]);
  if (cols[4] != ".")
    for (auto& a : _split(cols[4], ',')) d.alleles.push_back(a);
  rec->n_allele = (uint32_t)d.alleles.size();
  if (cols[5] == ".") {
    d.qualMissing = true;
    rec->qual = 0;
  } else {
    rec->qual = std::stof(cols[5]);
  }
  if (cols[6] != ".")
    for (auto& fn : _split(cols[6], ';')) {
      for (std::size_t i = 0; i < hd.dict.size(); ++i)
        if (hd.dict[i] == fn) d.filters.push_back((int)i);
    }
  if (cols[7] != ".")
    for (auto& kv : _split(cols[7], ';')) {
      std::size_t eq = kv.find('=');
      if (eq == std::string::npos)
        d.info.push_back(InfoKV{kv, "", true});
      else
        d.info.push_back(
            InfoKV{kv.substr(0, eq), kv.substr(eq + 1), false});
    }
  if (cols.size() > 8) {
    std::vector<std::string> keys = _split(cols[8], ':');
    for (auto& k : keys) d.fmt.push_back(FmtField{k, {}});
    for (std::size_t s = 9; s < cols.size(); ++s) {
      std::vector<std::string> vals = _split(cols[s], ':');
      for (std::size_t k = 0; k < keys.size(); ++k)
        d.fmt[k].vals.push_back(k < vals.size() ? vals[k] : ".");
    }
  }
  _syncRecPtrs(rec);
  return 0;
}

static InfoKV* _findInfo(RecData& d, const char* key) {
  for (auto& kv : d.info)
    if (kv.key == key) return &kv;
  return nullptr;
}
static FmtField* _findFmt(RecData& d, const char* key) {
  for (auto& f : d.fmt)
    if (f.key == key) return &f;
  return nullptr;
}

int bcf_get_info_int32(bcf_hdr_t*, bcf1_t* rec, const char* key,
                       int32_t** dst, int* ndst) {
  InfoKV* kv = _findInfo(g_recs.at(rec), key);
  if (!kv || kv->flag) return -3;
  std::vector<std::string> toks = _split(kv->val, ',');
  *dst = (int32_t*)realloc(*dst, toks.size() * sizeof(int32_t));
  for (std::size_t i = 0; i < toks.size(); ++i)
    (*dst)[i] = (toks[i] == ".") ? bcf_int32_missing
                                 : (int32_t)std::stol(toks[i]);
  *ndst = (int)toks.size();
  return (int)toks.size();
}
int bcf_get_info_float(bcf_hdr_t*, bcf1_t* rec, const char* key,
                       float** dst, int* ndst) {
  InfoKV* kv = _findInfo(g_recs.at(rec), key);
  if (!kv || kv->flag) return -3;
  std::vector<std::string> toks = _split(kv->val, ',');
  *dst = (float*)realloc(*dst, toks.size() * sizeof(float));
  for (std::size_t i = 0; i < toks.size(); ++i) {
    if (toks[i] == ".")
      bcf_float_set_missing((*dst)[i]);
    else
      (*dst)[i] = std::stof(toks[i]);
  }
  *ndst = (int)toks.size();
  return (int)toks.size();
}
int bcf_get_info_string(bcf_hdr_t*, bcf1_t* rec, const char* key,
                        char** dst, int* ndst) {
  InfoKV* kv = _findInfo(g_recs.at(rec), key);
  if (!kv || kv->flag) return -3;
  *dst = (char*)realloc(*dst, kv->val.size() + 1);
  std::memcpy(*dst, kv->val.c_str(), kv->val.size() + 1);
  *ndst = (int)kv->val.size() + 1;
  return (int)kv->val.size();
}
int bcf_get_info_flag(bcf_hdr_t*, bcf1_t* rec, const char* key, void*,
                      int*) {
  InfoKV* kv = _findInfo(g_recs.at(rec), key);
  return kv ? 1 : -3;
}

static int _gtEncode(std::string const& tok,
                     std::vector<int32_t>& out) {
  // "0/1", "0|1", ".", "./." -> htslib gt encoding
  std::string cur;
  bool phased = false;
  for (std::size_t i = 0; i <= tok.size(); ++i) {
    if (i == tok.size() || tok[i] == '/' || tok[i] == '|') {
      int32_t v;
      if (cur == "." || cur.empty())
        v = bcf_gt_missing;
      else
        v = phased ? bcf_gt_phased(std::stoi(cur))
                   : bcf_gt_unphased(std::stoi(cur));
      out.push_back(v);
      cur.clear();
      if (i < tok.size()) phased = (tok[i] == '|');
    } else {
      cur += tok[i];
    }
  }
  return (int)out.size();
}

int bcf_get_format_int32(const bcf_hdr_t* h, bcf1_t* rec,
                         const char* key, int32_t** dst, int* ndst) {
  RecData& d = g_recs.at(rec);
  FmtField* f = _findFmt(d, key);
  if (!f) return -3;
  int ns = bcf_hdr_nsamples(h);
  if (std::strcmp(key, "GT") == 0) {
    std::vector<std::vector<int32_t> > per(ns);
    int w = 0;
    for (int s = 0; s < ns; ++s) {
      _gtEncode(f->vals[s], per[s]);
      w = std::max(w, (int)per[s].size());
    }
    *dst = (int32_t*)realloc(*dst, ns * w * sizeof(int32_t));
    for (int s = 0; s < ns; ++s)
      for (int k = 0; k < w; ++k)
        (*dst)[s * w + k] = (k < (int)per[s].size())
                                ? per[s][k]
                                : bcf_int32_vector_end;
    *ndst = ns * w;
    return ns * w;
  }
  std::vector<std::vector<std::string> > per(ns);
  int w = 0;
  for (int s = 0; s < ns; ++s) {
    per[s] = _split(f->vals[s], ',');
    w = std::max(w, (int)per[s].size());
  }
  *dst = (int32_t*)realloc(*dst, ns * w * sizeof(int32_t));
  for (int s = 0; s < ns; ++s)
    for (int k = 0; k < w; ++k) {
      if (k >= (int)per[s].size())
        (*dst)[s * w + k] = bcf_int32_vector_end;
      else if (per[s][k] == ".")
        (*dst)[s * w + k] =
            (k == 0) ? bcf_int32_missing : bcf_int32_vector_end;
      else
        (*dst)[s * w + k] = (int32_t)std::stol(per[s][k]);
    }
  *ndst = ns * w;
  return ns * w;
}
int bcf_get_format_float(const bcf_hdr_t* h, bcf1_t* rec,
                         const char* key, float** dst, int* ndst) {
  RecData& d = g_recs.at(rec);
  FmtField* f = _findFmt(d, key);
  if (!f) return -3;
  int ns = bcf_hdr_nsamples(h);
  std::vector<std::vector<std::string> > per(ns);
  int w = 0;
  for (int s = 0; s < ns; ++s) {
    per[s] = _split(f->vals[s], ',');
    w = std::max(w, (int)per[s].size());
  }
  *dst = (float*)realloc(*dst, ns * w * sizeof(float));
  for (int s = 0; s < ns; ++s)
    for (int k = 0; k < w; ++k) {
      if (k >= (int)per[s].size() || per[s][k] == ".")
        bcf_float_set_missing((*dst)[s * w + k]);
      else
        (*dst)[s * w + k] = std::stof(per[s][k]);
    }
  *ndst = ns * w;
  return ns * w;
}
int bcf_get_format_string(const bcf_hdr_t* h, bcf1_t* rec,
                          const char* key, char*** dst, int* ndst) {
  RecData& d = g_recs.at(rec);
  FmtField* f = _findFmt(d, key);
  if (!f) return -3;
  int ns = bcf_hdr_nsamples(h);
  std::size_t total = 0;
  for (int s = 0; s < ns; ++s) total += f->vals[s].size() + 1;
  char* buf = (char*)malloc(total);
  char** arr = (char**)malloc(ns * sizeof(char*));
  char* p = buf;
  for (int s = 0; s < ns; ++s) {
    arr[s] = p;
    std::memcpy(p, f->vals[s].c_str(), f->vals[s].size() + 1);
    p += f->vals[s].size() + 1;
  }
  *dst = arr;
  *ndst = ns;
  return ns;
}
int bcf_has_filter(const bcf_hdr_t* h, bcf1_t* rec, char* name) {
  RecData const& d = g_recs.at(rec);
  int id = bcf_hdr_id2int(h, BCF_DT_ID, name);
  if (id < 0) return -1;
  if (d.filters.empty()) return (id == 0) ? 1 : 0;
  for (int fid : d.filters)
    if (fid == id) return 1;
  return 0;
}

// --- updates (htslib semantics: in-place replace, append if new) ---
static std::string _fmtFloat(double v) {
  char b[64];
  std::snprintf(b, sizeof(b), "%g", v);
  return b;
}
static void _setInfo(bcf1_t* rec, const char* key,
                     std::string const& val, bool flag) {
  RecData& d = g_recs.at(rec);
  InfoKV* kv = _findInfo(d, key);
  if (kv) {
    kv->val = val;
    kv->flag = flag;
    return;
  }
  d.info.push_back(InfoKV{key, val, flag});
}
int bcf_update_info(const bcf_hdr_t*, bcf1_t* rec, const char* key,
                    const void*, int n, int) {
  if (n == 0) {  // remove tag (_remove_info_tag)
    RecData& d = g_recs.at(rec);
    for (auto it = d.info.begin(); it != d.info.end(); ++it)
      if (it->key == key) {
        d.info.erase(it);
        break;
      }
  }
  return 0;
}
int bcf_update_format(const bcf_hdr_t*, bcf1_t* rec, const char* key,
                      const void*, int n, int) {
  if (n == 0) {
    RecData& d = g_recs.at(rec);
    for (auto it = d.fmt.begin(); it != d.fmt.end(); ++it)
      if (it->key == key) {
        d.fmt.erase(it);
        break;
      }
  }
  return 0;
}
int bcf_update_info_flag(bcf_hdr_t*, bcf1_t* rec, const char* key,
                         const char*, int n) {
  if (n) _setInfo(rec, key, "", true);
  return 0;
}
int bcf_update_info_int32(bcf_hdr_t*, bcf1_t* rec, const char* key,
                          const void* vp, int n) {
  const int32_t* v = (const int32_t*)vp;
  std::string out;
  for (int i = 0; i < n; ++i) {
    if (i) out += ",";
    out += (v[i] == bcf_int32_missing) ? "." : std::to_string(v[i]);
  }
  _setInfo(rec, key, out, false);
  return 0;
}
int bcf_update_info_float(bcf_hdr_t*, bcf1_t* rec, const char* key,
                          const void* vp, int n) {
  const float* v = (const float*)vp;
  std::string out;
  for (int i = 0; i < n; ++i) {
    if (i) out += ",";
    out += bcf_float_is_missing(v[i]) ? "." : _fmtFloat((double)v[i]);
  }
  _setInfo(rec, key, out, false);
  return 0;
}
int bcf_update_info_string(bcf_hdr_t*, bcf1_t* rec, const char* key,
                           const char* v) {
  _setInfo(rec, key, v, false);
  return 0;
}
int bcf_update_id(bcf_hdr_t*, bcf1_t* rec, const char* id) {
  g_recs.at(rec).id = id;
  _syncRecPtrs(rec);
  return 0;
}
int bcf_update_alleles_str(bcf_hdr_t*, bcf1_t* rec, const char* a) {
  RecData& d = g_recs.at(rec);
  d.alleles.clear();
  for (auto& tok : _split(a, ',')) d.alleles.push_back(tok);
  rec->n_allele = (uint32_t)d.alleles.size();
  _syncRecPtrs(rec);
  return 0;
}
int bcf_update_filter(bcf_hdr_t*, bcf1_t* rec, int32_t* ids, int n) {
  RecData& d = g_recs.at(rec);
  d.filters.assign(ids, ids + n);
  return 0;
}
static FmtField& _fmtSlot(bcf1_t* rec, const char* key) {
  RecData& d = g_recs.at(rec);
  FmtField* f = _findFmt(d, key);
  if (f) {
    f->vals.clear();
    return *f;
  }
  d.fmt.push_back(FmtField{key, {}});
  return d.fmt.back();
}
int bcf_update_genotypes(bcf_hdr_t* h, bcf1_t* rec, const int32_t* gts,
                         int n) {
  int ns = bcf_hdr_nsamples(h);
  int w = ns ? n / ns : 0;
  FmtField& f = _fmtSlot(rec, "GT");
  for (int s = 0; s < ns; ++s) {
    std::string out;
    for (int k = 0; k < w; ++k) {
      int32_t v = gts[s * w + k];
      if (v == bcf_int32_vector_end) break;
      if (k) out += (v & 1) ? "|" : "/";
      int a = (v >> 1) - 1;
      out += (a < 0) ? "." : std::to_string(a);
    }
    f.vals.push_back(out.empty() ? "." : out);
  }
  return 0;
}
int bcf_update_format_int32(bcf_hdr_t* h, bcf1_t* rec, const char* key,
                            const int32_t* v, int n) {
  int ns = bcf_hdr_nsamples(h);
  int w = ns ? n / ns : 0;
  FmtField& f = _fmtSlot(rec, key);
  for (int s = 0; s < ns; ++s) {
    std::string out;
    for (int k = 0; k < w; ++k) {
      int32_t x = v[s * w + k];
      if (x == bcf_int32_vector_end) break;
      if (k) out += ",";
      out += (x == bcf_int32_missing) ? "." : std::to_string(x);
    }
    f.vals.push_back(out.empty() ? "." : out);
  }
  return 0;
}
int bcf_update_format_float(bcf_hdr_t* h, bcf1_t* rec, const char* key,
                            const float* v, int n) {
  int ns = bcf_hdr_nsamples(h);
  int w = ns ? n / ns : 0;
  FmtField& f = _fmtSlot(rec, key);
  for (int s = 0; s < ns; ++s) {
    std::string out;
    for (int k = 0; k < w; ++k) {
      float x = v[s * w + k];
      if (k) out += ",";
      out += bcf_float_is_missing(x) ? "." : _fmtFloat((double)x);
    }
    f.vals.push_back(out.empty() ? "." : out);
  }
  return 0;
}
int bcf_update_format_string(bcf_hdr_t*, bcf1_t* rec, const char* key,
                             const char** v, int n) {
  FmtField& f = _fmtSlot(rec, key);
  for (int s = 0; s < n; ++s) f.vals.push_back(v[s]);
  return 0;
}
int bcf_write1(htsFile* hf, bcf_hdr_t* h, bcf1_t* rec) {
  HdrData const& hd = g_hdrs.at(h);
  RecData const& d = g_recs.at(rec);
  std::string line = hd.contigs[rec->rid];
  line += "\t" + std::to_string(rec->pos + 1);
  line += "\t" + d.id;
  line += "\t" + d.alleles[0] + "\t";
  if (d.alleles.size() < 2) {
    line += ".";
  } else {
    for (std::size_t i = 1; i < d.alleles.size(); ++i)
      line += (i > 1 ? "," : "") + d.alleles[i];
  }
  line += "\t" + (d.qualMissing ? std::string(".")
                                : _fmtFloat((double)rec->qual));
  if (d.filters.empty()) {
    line += "\t.";
  } else {
    line += "\t";
    for (std::size_t i = 0; i < d.filters.size(); ++i)
      line += (i ? ";" : "") + hd.dict[d.filters[i]];
  }
  std::string info;
  for (auto const& kv : d.info) {
    if (!info.empty()) info += ";";
    info += kv.flag ? kv.key : kv.key + "=" + kv.val;
  }
  line += "\t" + (info.empty() ? std::string(".") : info);
  if (!d.fmt.empty()) {
    std::string keys;
    for (auto const& f : d.fmt) {
      if (!keys.empty()) keys += ":";
      keys += f.key;
    }
    line += "\t" + keys;
    for (int s = 0; s < bcf_hdr_nsamples(h); ++s) {
      std::string col;
      for (auto const& f : d.fmt) {
        if (!col.empty()) col += ":";
        col += ((std::size_t)s < f.vals.size()) ? f.vals[s] : ".";
      }
      line += "\t" + col;
    }
  }
  hf->f->buf += line + "\n";
  return 0;
}
int bcf_index_build(const char*, int) { return 0; }
// replay BAM headers use index-named contigs ("0", "1", ...)
int bam_name2id(void*, const char* name) {
  if (!name || !*name) return -1;
  for (const char* p = name; *p; ++p)
    if (*p < '0' || *p > '9') return -1;
  return std::atoi(name);
}

#endif
