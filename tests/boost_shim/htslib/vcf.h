// Declaration-only htslib VCF/BCF shim: just enough for the
// reference's templated BCF I/O code (cnv.h parseVcfCNV / cnvVCF and
// friends) to PARSE — none of it is instantiated or linked by any
// probe.  Public htslib API names and the few record members the
// headers touch.  NOT htslib code.
#ifndef DP_PROBE_SHIM_HTSLIB_VCF_H
#define DP_PROBE_SHIM_HTSLIB_VCF_H

#include <cstdint>

struct htsFile;
struct hts_idx_t;

struct bcf_hdr_t_shim_detail {
  int32_t n[3];
};
typedef bcf_hdr_t_shim_detail bcf_hdr_t_base;
struct bcf_hdr_t : bcf_hdr_t_base {
  char** samples = nullptr;  // filter.h reads hdr->samples[i]
};

// INFO/FORMAT record internals: the member surface modvcf.h's plain
// _remove_info/_remove_format touch (never called by probes, but they
// must compile).  Public htslib field names, shim-defined layout.
struct bcf_info_t {
  int key;
  uint8_t* vptr;
  int vptr_off;
  int vptr_free;
};
struct bcf_fmt_t {
  int id;
  uint8_t* p;
  int p_off;
  int p_free;
};
struct bcf_dec_t {
  char* id;
  char** allele;
  bcf_info_t* info;
  bcf_fmt_t* fmt;
  int shared_dirty;
  int indiv_dirty;
};
struct bcf1_t {
  int32_t rid;
  int64_t pos;
  float qual;
  uint32_t n_info;
  uint32_t n_fmt;
  uint32_t n_allele;
  int unpacked;
  bcf_dec_t d;
};

#define BCF_UN_SHR 3
#define BCF_UN_INFO 4
#define BCF_UN_FMT 8
#define BCF_UN_ALL 15
#define BCF1_DIRTY_INF 4
#define BCF_DT_ID 0
#define BCF_DT_CTG 1
#define BCF_HL_FLT 0
#define BCF_HL_INFO 1
#define BCF_HL_FMT 2
#define BCF_HT_FLAG 0
#define BCF_HT_INT 1
#define BCF_HT_REAL 2
#define BCF_HT_STR 3
#define bcf_hdr_nsamples(hdr) ((hdr)->n[2])
#define bcf_gt_unphased(idx) (((idx) + 1) << 1)
#define bcf_gt_phased(idx) ((((idx) + 1) << 1) | 1)
#define bcf_gt_missing 0
#define bcf_gt_is_missing(val) ((val) >> 1 ? 0 : 1)
#define bcf_gt_allele(val) (((val) >> 1) - 1)
#define bcf_int8_missing (-127 - 1)
#define bcf_int16_missing (-32767 - 1)
#define bcf_int32_missing (-2147483647 - 1)
// htslib float-missing NaN payload (0x7F800001)
inline int bcf_float_is_missing(float f) {
  union { float f; uint32_t u; } v;
  v.f = f;
  return v.u == 0x7F800001u;
}
inline void bcf_float_set_missing(float& f) {
  union { float f; uint32_t u; } v;
  v.u = 0x7F800001u;
  f = v.f;
}

htsFile* bcf_open(const char*, const char*);
int bcf_close(htsFile*);
htsFile* hts_open(const char*, const char*);
int hts_close(htsFile*);
bcf_hdr_t* bcf_hdr_read(htsFile*);
bcf_hdr_t* bcf_hdr_init(const char*);
void bcf_hdr_destroy(bcf_hdr_t*);
int bcf_hdr_write(htsFile*, bcf_hdr_t*);
int bcf_hdr_append(bcf_hdr_t*, const char*);
int bcf_hdr_add_sample(bcf_hdr_t*, const char*);
int bcf_hdr_id2int(const bcf_hdr_t*, int, const char*);
const char* bcf_hdr_id2name(const bcf_hdr_t*, int);
int bcf_hdr_name2id(bcf_hdr_t*, const char*);
int bam_name2id(void*, const char*);
bcf1_t* bcf_init();
void bcf_destroy(bcf1_t*);
void bcf_destroy1(bcf1_t*);
void bcf_clear1(bcf1_t*);
int bcf_read(htsFile*, bcf_hdr_t*, bcf1_t*);
int bcf_write1(htsFile*, bcf_hdr_t*, bcf1_t*);
int bcf_unpack(bcf1_t*, int);
int bcf_get_info_int32(bcf_hdr_t*, bcf1_t*, const char*, int32_t**,
                       int*);
int bcf_get_info_float(bcf_hdr_t*, bcf1_t*, const char*, float**, int*);
int bcf_get_info_string(bcf_hdr_t*, bcf1_t*, const char*, char**, int*);
int bcf_update_id(bcf_hdr_t*, bcf1_t*, const char*);
int bcf_update_alleles_str(bcf_hdr_t*, bcf1_t*, const char*);
int bcf_update_filter(bcf_hdr_t*, bcf1_t*, int32_t*, int);
int bcf_update_info_flag(bcf_hdr_t*, bcf1_t*, const char*, const char*,
                         int);
int bcf_update_info_int32(bcf_hdr_t*, bcf1_t*, const char*,
                          const void*, int);
// htslib's is a macro over generic bcf_update_info, so callers may pass
// float(*)[N]; accept const void*
int bcf_update_info_float(bcf_hdr_t*, bcf1_t*, const char*,
                          const void*, int);
int bcf_update_info_string(bcf_hdr_t*, bcf1_t*, const char*,
                           const char*);
int bcf_update_genotypes(bcf_hdr_t*, bcf1_t*, const int32_t*, int);
int bcf_update_format_int32(bcf_hdr_t*, bcf1_t*, const char*,
                            const int32_t*, int);
int bcf_update_format_float(bcf_hdr_t*, bcf1_t*, const char*,
                            const float*, int);
int bcf_update_format_string(bcf_hdr_t*, bcf1_t*, const char*,
                             const char**, int);
int bcf_index_build(const char*, int);
int bcf_update_info(const bcf_hdr_t*, bcf1_t*, const char*, const void*,
                    int, int);
int bcf_update_format(const bcf_hdr_t*, bcf1_t*, const char*,
                      const void*, int, int);
const char* bcf_hdr_int2id(const bcf_hdr_t*, int, int);
int bcf_hdr_id2type(const bcf_hdr_t*, int, int);
int bcf_get_info_flag(bcf_hdr_t*, bcf1_t*, const char*, void*, int*);
#define bcf_int32_vector_end (-2147483647)
bcf1_t* bcf_init1();
bcf1_t* bcf_dup(bcf1_t*);
bcf_hdr_t* bcf_hdr_dup(const bcf_hdr_t*);
int bcf_hdr_remove(bcf_hdr_t*, int, const char*);
int bcf_has_filter(const bcf_hdr_t*, bcf1_t*, char*);
int bcf_get_format_int32(const bcf_hdr_t*, bcf1_t*, const char*,
                         int32_t**, int*);
int bcf_get_format_float(const bcf_hdr_t*, bcf1_t*, const char*,
                         float**, int*);
int bcf_get_format_string(const bcf_hdr_t*, bcf1_t*, const char*,
                          char***, int*);

#endif
