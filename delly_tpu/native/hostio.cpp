// Native host I/O plane: multithreaded BGZF codec + BAM record scanner.
//
// Fills the role HTSlib plays in the reference (src/htslib submodule):
// BGZF block decompression is the dominant host CPU cost of every BAM
// pass (reference SURVEY: sam_itr_next loops), so blocks are inflated in
// parallel across a thread pool. The BAM record scanner walks the
// decompressed stream once and emits a struct-of-arrays view of the core
// fields (tid/pos/flag/mapq/mtid/mpos/tlen/l_qseq + record offsets) so
// the Python layer can batch-filter records with numpy before touching
// per-record payloads.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cctype>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <unordered_set>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------
// BGZF decompression
// ---------------------------------------------------------------------

struct BgzfBlock {
  size_t in_off;    // offset of the compressed payload (after header)
  size_t in_len;    // compressed payload length
  size_t out_off;   // offset in the output buffer
  size_t out_len;   // ISIZE
};

// Scan BGZF headers to build the block table. Returns 0 on success.
static int scan_blocks(const uint8_t* data, size_t n,
                       std::vector<BgzfBlock>& blocks, size_t& total_out) {
  size_t pos = 0;
  total_out = 0;
  while (pos + 18 <= n) {
    if (data[pos] != 0x1f || data[pos + 1] != 0x8b) break;
    uint8_t flg = data[pos + 3];
    if (!(flg & 4)) return -1;  // BGZF requires FEXTRA
    uint16_t xlen = (uint16_t)(data[pos + 10] | (data[pos + 11] << 8));
    size_t xstart = pos + 12;
    // the FEXTRA area must lie inside the buffer (crafted/truncated
    // headers can claim xlen up to 65535 beyond the end)
    if (xstart + xlen > n) return -2;
    size_t bsize = 0;
    size_t xoff = 0;
    while (xoff + 4 <= xlen) {
      uint8_t si1 = data[xstart + xoff];
      uint8_t si2 = data[xstart + xoff + 1];
      uint16_t slen = (uint16_t)(data[xstart + xoff + 2]
                                 | (data[xstart + xoff + 3] << 8));
      if (4 + (size_t)slen > xlen - xoff) break;
      if (si1 == 66 && si2 == 67 && slen == 2) {
        bsize = (size_t)(data[xstart + xoff + 4]
                         | (data[xstart + xoff + 5] << 8)) + 1;
      }
      xoff += 4 + slen;
    }
    // bsize must cover header + FEXTRA + CRC32 + ISIZE
    if (bsize < 12 + (size_t)xlen + 8 || pos + bsize > n) return -2;
    size_t payload_off = xstart + xlen;
    size_t payload_len = bsize - (payload_off - pos) - 8;
    uint32_t isize;
    std::memcpy(&isize, data + pos + bsize - 4, 4);
    if (isize > (1u << 20)) return -2;  // BGZF payloads are <= 64 KiB
    BgzfBlock b;
    b.in_off = payload_off;
    b.in_len = payload_len;
    b.out_off = total_out;
    b.out_len = isize;
    blocks.push_back(b);
    total_out += isize;
    pos += bsize;
  }
  return 0;
}

// Inflate every block of the table into `buf` with `threads` workers.
// Returns 0 on success or a negative error code.
static int inflate_blocks(const uint8_t* data,
                          const std::vector<BgzfBlock>& blocks,
                          uint8_t* buf, int threads) {
  std::atomic<size_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= blocks.size()) return;
      const BgzfBlock& b = blocks[i];
      if (b.out_len == 0) continue;
      z_stream zs;
      std::memset(&zs, 0, sizeof(zs));
      if (inflateInit2(&zs, -15) != Z_OK) { err.store(-4); return; }
      zs.next_in = const_cast<Bytef*>(data + b.in_off);
      zs.avail_in = (uInt)b.in_len;
      zs.next_out = buf + b.out_off;
      zs.avail_out = (uInt)b.out_len;
      int zrc = inflate(&zs, Z_FINISH);
      size_t got = zs.total_out;
      inflateEnd(&zs);
      // htslib errors when the inflated size disagrees with the ISIZE
      // trailer — otherwise uninitialized output bytes would flow to
      // callers as 'decoded' data
      if (zrc != Z_STREAM_END || got != (size_t)b.out_len) {
        err.store(-5);
        return;
      }
      // CRC32 trailer check (bgzf.c bgzf_uncompress parity)
      uint32_t want_crc;
      std::memcpy(&want_crc, data + b.in_off + b.in_len, 4);
      uint32_t have_crc = (uint32_t)crc32(
          crc32(0L, Z_NULL, 0), buf + b.out_off, (uInt)b.out_len);
      if (want_crc != have_crc) { err.store(-6); return; }
    }
  };
  int nthreads = std::max(1, threads);
  if (nthreads == 1 || blocks.size() < 4) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return err.load();
}

// Decompress a BGZF stream with `threads` workers. Returns the number of
// output bytes, or a negative error code. The caller owns *out (free
// with delly_free).
long long bgzf_inflate(const uint8_t* data, size_t n, int threads,
                       uint8_t** out) {
  std::vector<BgzfBlock> blocks;
  size_t total = 0;
  int rc = scan_blocks(data, n, blocks, total);
  if (rc != 0) return rc;
  uint8_t* buf = (uint8_t*)std::malloc(total ? total : 1);
  if (!buf) return -3;
  int erc = inflate_blocks(data, blocks, buf, threads);
  if (erc != 0) { std::free(buf); return erc; }
  *out = buf;
  return (long long)total;
}

// Total uncompressed size of a BGZF stream (sum of ISIZE trailers via
// a header-only scan), or a negative error code.
long long bgzf_total_out(const uint8_t* data, size_t n) {
  std::vector<BgzfBlock> blocks;
  size_t total = 0;
  int rc = scan_blocks(data, n, blocks, total);
  if (rc != 0) return rc;
  return (long long)total;
}

// Decompress directly into a caller-owned buffer of capacity `cap`
// (sized via bgzf_total_out — lets Python decompress straight into a
// fresh bytes object, no intermediate copy). Returns bytes written or
// a negative error code.
long long bgzf_inflate_into(const uint8_t* data, size_t n, int threads,
                            uint8_t* out, size_t cap) {
  std::vector<BgzfBlock> blocks;
  size_t total = 0;
  int rc = scan_blocks(data, n, blocks, total);
  if (rc != 0) return rc;
  if (total > cap) return -6;
  int erc = inflate_blocks(data, blocks, out, threads);
  if (erc != 0) return erc;
  return (long long)total;
}

// Decompress a BGZF span into a caller buffer, dropping the first
// `ubeg` and the last `tail_drop` uncompressed bytes IN the inflate
// pass (boundary blocks go through a 64 KiB scratch; interior blocks
// write in place). This is the virtual-offset range read
// (io/bgzf.py::read_voffset_range) without the output-sized slice
// copy Python would otherwise pay. Returns bytes written or a
// negative error code.
long long bgzf_inflate_range_into(const uint8_t* data, size_t n,
                                  int threads, size_t ubeg,
                                  size_t tail_drop, uint8_t* out,
                                  size_t cap) {
  std::vector<BgzfBlock> blocks;
  size_t total = 0;
  int rc = scan_blocks(data, n, blocks, total);
  if (rc != 0) return rc;
  if (ubeg > total) ubeg = total;
  size_t uend = total - std::min(tail_drop, total);
  if (uend < ubeg) uend = ubeg;
  size_t want = uend - ubeg;
  if (want > cap) return -6;
  std::atomic<size_t> next(0);
  std::atomic<int> err(0);
  auto inflate_one = [&](const BgzfBlock& b, uint8_t* dst) -> int {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) return -4;
    zs.next_in = const_cast<Bytef*>(data + b.in_off);
    zs.avail_in = (uInt)b.in_len;
    zs.next_out = dst;
    zs.avail_out = (uInt)b.out_len;
    int zrc = inflate(&zs, Z_FINISH);
    size_t got = zs.total_out;
    inflateEnd(&zs);
    if (zrc != Z_STREAM_END || got != b.out_len) return -5;
    return 0;
  };
  auto worker = [&]() {
    std::vector<uint8_t> scratch;
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= blocks.size()) return;
      const BgzfBlock& b = blocks[i];
      if (b.out_len == 0) continue;
      size_t lo = std::max(b.out_off, ubeg);
      size_t hi = std::min(b.out_off + b.out_len, uend);
      if (hi <= lo) continue;
      if (lo == b.out_off && hi == b.out_off + b.out_len) {
        if (inflate_one(b, out + (b.out_off - ubeg)) != 0) {
          err.store(-5);
          return;
        }
      } else {
        if (scratch.size() < b.out_len) scratch.resize(b.out_len);
        if (inflate_one(b, scratch.data()) != 0) {
          err.store(-5);
          return;
        }
        std::memcpy(out + (lo - ubeg), scratch.data() + (lo - b.out_off),
                    hi - lo);
      }
    }
  };
  int nthreads = std::max(1, threads);
  if (nthreads == 1 || blocks.size() < 4) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  if (err.load() != 0) return err.load();
  return (long long)want;
}

// Uncompressed size of the [ubeg, total - tail_drop) range of a BGZF
// span (header-only scan), or a negative error code.
long long bgzf_range_out(const uint8_t* data, size_t n, size_t ubeg,
                         size_t tail_drop) {
  std::vector<BgzfBlock> blocks;
  size_t total = 0;
  int rc = scan_blocks(data, n, blocks, total);
  if (rc != 0) return rc;
  if (ubeg > total) ubeg = total;
  size_t uend = total - std::min(tail_drop, total);
  if (uend < ubeg) uend = ubeg;
  return (long long)(uend - ubeg);
}

// ---------------------------------------------------------------------
// BGZF compression
// ---------------------------------------------------------------------

static const size_t MAX_PAYLOAD = 65280;
static const uint8_t BGZF_EOF_BLOCK[28] = {
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff,
    0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00};

// Compress one <=64KiB payload into a BGZF block appended to `out`.
static int deflate_block(const uint8_t* payload, size_t len, int level,
                         std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                   Z_DEFAULT_STRATEGY) != Z_OK) return -1;
  size_t bound = deflateBound(&zs, len);
  std::vector<uint8_t> cdata(bound);
  zs.next_in = const_cast<Bytef*>(payload);
  zs.avail_in = (uInt)len;
  zs.next_out = cdata.data();
  zs.avail_out = (uInt)bound;
  int zrc = deflate(&zs, Z_FINISH);
  size_t clen = bound - zs.avail_out;
  deflateEnd(&zs);
  if (zrc != Z_STREAM_END) return -2;
  size_t bsize = 18 + clen + 8;
  uint8_t header[18] = {0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff,
                        6, 0, 'B', 'C', 2, 0, 0, 0};
  header[16] = (uint8_t)((bsize - 1) & 0xff);
  header[17] = (uint8_t)(((bsize - 1) >> 8) & 0xff);
  uint32_t crc = crc32(0L, payload, (uInt)len);
  uint32_t isize = (uint32_t)len;
  out.insert(out.end(), header, header + 18);
  out.insert(out.end(), cdata.data(), cdata.data() + clen);
  out.insert(out.end(), (uint8_t*)&crc, (uint8_t*)&crc + 4);
  out.insert(out.end(), (uint8_t*)&isize, (uint8_t*)&isize + 4);
  return 0;
}

long long bgzf_deflate(const uint8_t* data, size_t n, int level,
                       int threads, int write_eof, uint8_t** out) {
  size_t nblocks = (n + MAX_PAYLOAD - 1) / MAX_PAYLOAD;
  if (nblocks == 0) nblocks = 1;
  std::vector<std::vector<uint8_t>> parts(nblocks);
  std::atomic<size_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= nblocks) return;
      size_t off = i * MAX_PAYLOAD;
      size_t len = std::min(MAX_PAYLOAD, n - off);
      if (deflate_block(data + off, len, level, parts[i]) != 0) {
        err.store(-1);
        return;
      }
    }
  };
  int nthreads = std::max(1, threads);
  if (nthreads == 1 || nblocks < 4) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  if (err.load() != 0) return -1;
  size_t total = 0;
  for (auto& p : parts) total += p.size();
  if (write_eof) total += sizeof(BGZF_EOF_BLOCK);
  uint8_t* buf = (uint8_t*)std::malloc(total ? total : 1);
  if (!buf) return -3;
  size_t pos = 0;
  for (auto& p : parts) {
    std::memcpy(buf + pos, p.data(), p.size());
    pos += p.size();
  }
  if (write_eof) {
    std::memcpy(buf + pos, BGZF_EOF_BLOCK, sizeof(BGZF_EOF_BLOCK));
  }
  *out = buf;
  return (long long)total;
}

// ---------------------------------------------------------------------
// BAM record scanner (SoA core fields)
// ---------------------------------------------------------------------

// Walks decompressed BAM alignment records starting at `start` and fills
// parallel arrays (caller-allocated, capacity `cap`):
//   offsets[i]  byte offset of record i's block_size field
//   tid/pos/flag/mapq/mtid/mpos/tlen/lqseq[i]  core fields
// Returns the number of records, or -1 if a record overruns the buffer.
long long bam_scan(const uint8_t* data, size_t n, size_t start,
                   int64_t* offsets, int32_t* tid, int32_t* pos,
                   int32_t* flag, int32_t* mapq, int32_t* mtid,
                   int32_t* mpos, int32_t* tlen, int32_t* lqseq,
                   size_t cap) {
  size_t p = start;
  size_t count = 0;
  while (p + 4 <= n && count < cap) {
    uint32_t block_size;
    std::memcpy(&block_size, data + p, 4);
    if (p + 4 + block_size > n || block_size < 32) break;
    const uint8_t* r = data + p + 4;
    offsets[count] = (int64_t)p;
    std::memcpy(&tid[count], r, 4);
    std::memcpy(&pos[count], r + 4, 4);
    mapq[count] = r[9];
    flag[count] = (int32_t)(r[14] | (r[15] << 8));
    std::memcpy(&lqseq[count], r + 16, 4);
    std::memcpy(&mtid[count], r + 20, 4);
    std::memcpy(&mpos[count], r + 24, 4);
    std::memcpy(&tlen[count], r + 28, 4);
    ++count;
    p += 4 + block_size;
  }
  return (long long)count;
}

// Record count of a decoded BAM record stream (block-size skip walk).
// Lets bam_scan callers allocate exact SoA columns instead of the
// worst-case len/36 bound — long-read records run to tens of KB, so
// the bound over-allocates ~1000x there and the arena calloc memsets
// it all.
long long bam_count(const uint8_t* data, size_t n, size_t start) {
  size_t p = start;
  size_t count = 0;
  while (p + 4 <= n) {
    uint32_t block_size;
    std::memcpy(&block_size, data + p, 4);
    if (p + 4 + block_size > n || block_size < 32) break;
    ++count;
    p += 4 + block_size;
  }
  return (long long)count;
}

// Per-record CIGAR aggregates + read-name hash for the records at
// `offsets` (from bam_scan). Emits, per record:
//   name_hash  — the reference's 32-bit string hash (tags.h:260-267)
//   fnv_hash   — FNV-1a 64 over the qname (second hash_sr ingredient)
//   ref_span   — reference-consuming span M/=/X/D/N (util.h:440-447)
//   leading_sc — soft-clip length when the first op is S
//   clip_flags — bit0: any soft clip, bit1: any clip (S or H)
//   max_clip   — longest S/H op, max_indel — longest I/D op (junction
//                extraction prefilters, junction.h:22-41)
//   lead_clip / trail_clip — S-or-H clip length at the first/last op
//                (genotype.h:31-57 read start/end)
// Lets the genotyping/scan passes run off struct-of-arrays data without
// Python-parsing every record.
void bam_cigar_stats(const uint8_t* data, size_t n, const int64_t* offsets,
                     int64_t nrec, int32_t threads, uint32_t* name_hash,
                     uint64_t* fnv_hash, int32_t* ref_span,
                     int32_t* leading_sc, int32_t* clip_flags,
                     int32_t* max_clip, int32_t* max_indel,
                     int32_t* lead_clip, int32_t* trail_clip) {
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(256);
      if (i >= nrec) return;
      int64_t hi = std::min(nrec, i + 256);
      for (; i < hi; ++i) {
        // validate the in-record field lengths against block_size:
        // a corrupt record must not read past its own bytes
        int32_t block_size;
        std::memcpy(&block_size, data + offsets[i], 4);
        const uint8_t* r = data + offsets[i] + 4;
        uint8_t l_read_name = r[8];
        uint16_t n_cigar = (uint16_t)(r[12] | (r[13] << 8));
        if (block_size < 32
            || (size_t)offsets[i] + 4 + (size_t)block_size > n
            || 32 + (size_t)l_read_name + 4ull * n_cigar
               > (size_t)block_size) {
          name_hash[i] = 0; fnv_hash[i] = 0; ref_span[i] = 0;
          leading_sc[i] = 0; clip_flags[i] = 0; max_clip[i] = 0;
          max_indel[i] = 0; lead_clip[i] = 0; trail_clip[i] = 0;
          continue;
        }
        const uint8_t* qname = r + 32;
        uint32_t h = 37;
        uint64_t fh = 0xCBF29CE484222325ull;
        // hash to the first NUL (tags.h:260-267 hash_string): the BAM
        // extranul padding must not enter the seed, or BAM and CRAM
        // containers would hash the same read differently
        for (int j = 0; j + 1 < (int)l_read_name && qname[j]; ++j) {
          h = (h * 54059u) ^ ((uint32_t)qname[j] * 76963u);
          fh = (fh ^ (uint64_t)qname[j]) * 0x100000001B3ull;
        }
        name_hash[i] = h;
        fnv_hash[i] = fh;
        const uint8_t* cig = r + 32 + l_read_name;
        int32_t span = 0, lsc = 0, flags = 0, mc = 0, mi = 0;
        int32_t lead = 0, trail = 0;
        for (int j = 0; j < (int)n_cigar; ++j) {
          uint32_t v;
          std::memcpy(&v, cig + 4 * j, 4);
          uint32_t op = v & 0xF;
          int32_t ol = (int32_t)(v >> 4);
          if (op == 0 || op == 7 || op == 8 || op == 2 || op == 3)
            span += ol;                                // M,=,X,D,N
          if (op == 1 || op == 2) {                    // I,D
            if (ol > mi) mi = ol;
          } else if (op == 4) {                        // S
            flags |= 3;
            if (j == 0) lsc = ol;
            if (ol > mc) mc = ol;
          } else if (op == 5) {                        // H
            flags |= 2;
            if (ol > mc) mc = ol;
          }
          if (op == 4 || op == 5) {                    // S,H
            if (j == 0) lead = ol;
            if (j == (int)n_cigar - 1) trail = ol;
          }
        }
        ref_span[i] = span;
        leading_sc[i] = lsc;
        clip_flags[i] = flags;
        max_clip[i] = mc;
        max_indel[i] = mi;
        lead_clip[i] = lead;
        trail_clip[i] = trail;
      }
    }
  };
  int nthreads = std::max(1, (int)threads);
  if (nthreads == 1 || nrec < 512) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
}

// CMATCH-only base-coverage difference array (coverage.h:461-476): for
// each record, every M segment [pos+rp, pos+rp+ol) clipped to target_len
// adds +1/-1 into diff (length target_len + 1). Caller cumsums + clamps.
// Only op 0 (M) counts, matching the reference's base-coverage walk.
void bam_match_coverage(const uint8_t* data, size_t n,
                        const int64_t* offsets, int64_t nrec,
                        int32_t target_len, int32_t* diff) {
  for (int64_t i = 0; i < nrec; ++i) {
    int32_t block_size;
    std::memcpy(&block_size, data + offsets[i], 4);
    const uint8_t* r = data + offsets[i] + 4;
    int32_t pos;
    std::memcpy(&pos, r + 4, 4);
    uint8_t l_read_name = r[8];
    uint16_t n_cigar = (uint16_t)(r[12] | (r[13] << 8));
    if (block_size < 32
        || (size_t)offsets[i] + 4 + (size_t)block_size > n
        || 32 + (size_t)l_read_name + 4ull * n_cigar
           > (size_t)block_size) continue;
    const uint8_t* cig = r + 32 + l_read_name;
    int32_t rp = 0;
    for (int j = 0; j < (int)n_cigar; ++j) {
      uint32_t v;
      std::memcpy(&v, cig + 4 * j, 4);
      uint32_t op = v & 0xF;
      int32_t ol = (int32_t)(v >> 4);
      if (op == 0) {                                   // M
        int32_t lo = pos + rp;
        int32_t hi2 = pos + rp + ol;
        if (hi2 > target_len) hi2 = target_len;
        if (lo < 0) lo = 0;
        if (lo < hi2) {
          ++diff[lo];
          --diff[hi2];
        }
        rp += ol;
      } else if (op == 2 || op == 3) {                 // D,N
        rp += ol;
      }
    }
  }
}

// Dual base-coverage difference arrays (util.h:454-474): M/=/X spans of
// each record add +1/-1 into diff_all, and into diff_uniq as well when
// the record's MAPQ >= mapq_uniq. Both arrays have length reflen + 1;
// the caller cumsums and applies the uint16 saturation clamp.
void bam_base_coverage(const uint8_t* data, size_t n,
                       const int64_t* offsets, int64_t nrec,
                       int32_t mapq_uniq, int32_t reflen,
                       int32_t* diff_all, int32_t* diff_uniq) {
  for (int64_t i = 0; i < nrec; ++i) {
    int32_t block_size;
    std::memcpy(&block_size, data + offsets[i], 4);
    const uint8_t* r = data + offsets[i] + 4;
    int32_t pos;
    std::memcpy(&pos, r + 4, 4);
    uint8_t mapq = r[9];
    uint8_t l_read_name = r[8];
    uint16_t n_cigar = (uint16_t)(r[12] | (r[13] << 8));
    if (block_size < 32
        || (size_t)offsets[i] + 4 + (size_t)block_size > n
        || 32 + (size_t)l_read_name + 4ull * n_cigar
           > (size_t)block_size) continue;
    const uint8_t* cig = r + 32 + l_read_name;
    int uniq = mapq >= mapq_uniq;
    int32_t rp = pos;
    for (int j = 0; j < (int)n_cigar; ++j) {
      uint32_t v;
      std::memcpy(&v, cig + 4 * j, 4);
      uint32_t op = v & 0xF;
      int32_t ol = (int32_t)(v >> 4);
      if (op == 0 || op == 7 || op == 8) {             // M,=,X
        int32_t lo = rp > 0 ? rp : 0;
        int32_t hi = rp + ol < reflen ? rp + ol : reflen;
        if (hi > lo) {
          ++diff_all[lo];
          --diff_all[hi];
          if (uniq) {
            ++diff_uniq[lo];
            --diff_uniq[hi];
          }
        }
        rp += ol;
      } else if (op == 2 || op == 3) {                 // D,N
        rp += ol;
      }
    }
  }
}

// rANS 4x8 static decoder (CRAM 3.0 block method 4; htscodecs
// rans_static layout): order-0 and order-1, 4 interleaved states,
// 12-bit normalized frequencies. Returns 0 on success.
struct RansTable {
  uint8_t lookup[4096];
  uint32_t fstart[256];
  uint32_t ffreq[256];
};

static int read_itf8_c(const uint8_t* b, size_t n, size_t& pos,
                       int64_t& out) {
  if (pos >= n) return -1;
  uint8_t b0 = b[pos++];
  if (b0 < 0x80) { out = b0; return 0; }
  if (b0 < 0xC0) {
    if (pos + 1 > n) return -1;
    out = ((int64_t)(b0 & 0x3F) << 8) | b[pos];
    pos += 1;
    return 0;
  }
  if (b0 < 0xE0) {
    if (pos + 2 > n) return -1;
    out = ((int64_t)(b0 & 0x1F) << 16) | ((int64_t)b[pos] << 8) | b[pos + 1];
    pos += 2;
    return 0;
  }
  if (b0 < 0xF0) {
    if (pos + 3 > n) return -1;
    out = ((int64_t)(b0 & 0x0F) << 24) | ((int64_t)b[pos] << 16)
          | ((int64_t)b[pos + 1] << 8) | b[pos + 2];
    pos += 3;
    return 0;
  }
  if (pos + 4 > n) return -1;
  out = ((int64_t)(b0 & 0x0F) << 28) | ((int64_t)b[pos] << 20)
        | ((int64_t)b[pos + 1] << 12) | ((int64_t)b[pos + 2] << 4)
        | (b[pos + 3] & 0x0F);
  pos += 4;
  return 0;
}

// Order-0 frequency table (sym [rle] freq ... 0) into `tab`.
static int read_freq_table0(const uint8_t* b, size_t n, size_t& pos,
                            RansTable& tab) {
  uint32_t freqs[256] = {0};
  if (pos >= n) return -1;
  int sym = b[pos++];
  int last_sym = sym;
  int rle = 0;
  for (;;) {
    int64_t f;
    if (read_itf8_c(b, n, pos, f) != 0) return -1;
    if (sym < 0 || sym > 255) return -1;
    freqs[sym] = (uint32_t)f;
    if (rle > 0) {
      rle--;
      sym++;
    } else {
      if (pos >= n) return -1;
      int nxt = b[pos++];
      if (nxt == last_sym + 1) {
        if (pos >= n) return -1;
        rle = b[pos++];
      }
      sym = nxt;
      if (sym == 0) break;
    }
    last_sym = sym;
  }
  uint32_t c = 0;
  for (int s2 = 0; s2 < 256; ++s2) {
    tab.fstart[s2] = c;
    tab.ffreq[s2] = freqs[s2];
    if (freqs[s2]) {
      // guard each term: c + freqs[s2] can wrap uint32 with a crafted
      // ITF8 frequency (e.g. 0xFFFFFFFF), passing the sum check and
      // memset-ing gigabytes over the 4096-byte table
      if (freqs[s2] > 4096 || c > 4096 - freqs[s2]) return -2;
      std::memset(tab.lookup + c, s2, freqs[s2]);
      c += freqs[s2];
    }
  }
  return 0;
}

static inline uint32_t rans_advance(uint32_t x, const RansTable& t,
                                    uint8_t s, uint32_t m,
                                    const uint8_t* b, size_t n,
                                    size_t& pos) {
  x = t.ffreq[s] * (x >> 12) + m - t.fstart[s];
  while (x < (1u << 23) && pos < n) x = (x << 8) | b[pos++];
  return x;
}

int rans_decode_c(const uint8_t* data, size_t n, uint8_t* out,
                  int64_t out_sz) {
  if (n < 9) return -1;
  int order = data[0];
  size_t pos = 9;
  if (order == 0) {
    RansTable tab;
    if (read_freq_table0(data, n, pos, tab) != 0) return -2;
    if (pos + 16 > n) return -1;
    uint32_t st[4];
    std::memcpy(st, data + pos, 16);
    pos += 16;
    for (int64_t i = 0; i < out_sz; ++i) {
      int j = i & 3;
      uint32_t m = st[j] & 4095;
      uint8_t s = tab.lookup[m];
      out[i] = s;
      st[j] = rans_advance(st[j], tab, s, m, data, n, pos);
    }
    return 0;
  }
  if (order != 1) return -3;
  // order-1: outer context RLE of order-0 rows
  std::vector<RansTable> tabs(256);
  std::vector<char> have(256, 0);
  if (pos >= n) return -1;
  int ctx = data[pos++];
  int last_ctx = ctx;
  int rle = 0;
  for (;;) {
    if (ctx < 0 || ctx > 255) return -1;
    if (read_freq_table0(data, n, pos, tabs[ctx]) != 0) return -2;
    have[ctx] = 1;
    if (rle > 0) {
      rle--;
      ctx++;
    } else {
      if (pos >= n) return -1;
      int nxt = data[pos++];
      if (nxt == last_ctx + 1) {
        if (pos >= n) return -1;
        rle = data[pos++];
      }
      ctx = nxt;
      if (ctx == 0) break;
    }
    last_ctx = ctx;
  }
  if (pos + 16 > n) return -1;
  uint32_t st[4];
  std::memcpy(st, data + pos, 16);
  pos += 16;
  int64_t isz4 = out_sz >> 2;
  uint8_t l[4] = {0, 0, 0, 0};
  for (int64_t i = 0; i < isz4; ++i) {
    for (int j = 0; j < 4; ++j) {
      if (!have[l[j]]) return -4;
      const RansTable& t = tabs[l[j]];
      uint32_t m = st[j] & 4095;
      uint8_t s = t.lookup[m];
      out[j * isz4 + i] = s;
      st[j] = rans_advance(st[j], t, s, m, data, n, pos);
      l[j] = s;
    }
  }
  for (int64_t i = 4 * isz4; i < out_sz; ++i) {
    if (!have[l[3]]) return -4;
    const RansTable& t = tabs[l[3]];
    uint32_t m = st[3] & 4095;
    uint8_t s = t.lookup[m];
    out[i] = s;
    st[3] = rans_advance(st[3], t, s, m, data, n, pos);
    l[3] = s;
  }
  return 0;
}

// ---------------------------------------------------------------
// rANS Nx16 entropy stage (CRAM 3.1 method 5; io/rans_nx16.py is the
// behavioral contract and the fallback). `buf` points at the
// frequency tables (flags/size/transform parsing stays in Python).
// Decodes out_sz bytes with nway interleave. Returns bytes consumed
// or a negative error (Python falls back on any error).
// ---------------------------------------------------------------

static int nx16_read_uint7(const uint8_t* b, size_t n, size_t& pos,
                           uint32_t& v) {
  v = 0;
  for (;;) {
    if (pos >= n) return -1;
    uint8_t c = b[pos++];
    v = (v << 7) | (c & 0x7F);
    if (!(c & 0x80)) return 0;
  }
}

static int nx16_read_alphabet(const uint8_t* b, size_t n, size_t& pos,
                              uint8_t* syms, int& nsym) {
  nsym = 0;
  int rle = 0;
  int last = -2;
  for (;;) {
    int sym;
    if (rle > 0) {
      rle--;
      sym = last + 1;
    } else {
      if (pos >= n) return -1;
      sym = b[pos++];
      if (nsym > 0 && sym == 0) break;
      if (sym == last + 1) {
        if (pos >= n) return -1;
        rle = b[pos++];
      }
    }
    if (nsym >= 256 || sym > 255) return -1;
    syms[nsym++] = (uint8_t)sym;
    last = sym;
  }
  return 0;
}

// normalize to sum 1<<shift exactly like io/rans_nx16._normalise
static void nx16_normalise(uint32_t* freq, const uint8_t* syms,
                           int nsym, int shift) {
  uint64_t total = 0;
  for (int i = 0; i < nsym; ++i) total += freq[syms[i]];
  uint32_t target = 1u << shift;
  if (total == target || total == 0) return;
  uint64_t acc = 0;
  for (int i = 0; i < nsym; ++i) {
    uint64_t f = freq[syms[i]];
    uint64_t nf = (f * target) / total;
    if (nf < 1) nf = 1;
    freq[syms[i]] = (uint32_t)nf;
    acc += nf;
  }
  int big = 0;
  for (int i = 1; i < nsym; ++i)
    if (freq[syms[i]] > freq[syms[big]]) big = i;
  int64_t fix = (int64_t)target - (int64_t)acc;
  int64_t nb = (int64_t)freq[syms[big]] + fix;
  if (nb >= 1) {
    freq[syms[big]] = (uint32_t)nb;
  } else {
    for (int i = 0; i < nsym; ++i) freq[syms[i]] = 1;
    freq[syms[0]] += target - nsym;
  }
}

struct Nx16Table {
  uint16_t fstart[256];
  uint16_t ffreq[256];
  uint8_t lookup[4096];
  int valid;
};

static int nx16_build_table(const uint32_t* freq, const uint8_t* syms,
                            int nsym, Nx16Table& t) {
  uint32_t c = 0;
  std::memset(t.fstart, 0, sizeof(t.fstart));
  std::memset(t.ffreq, 0, sizeof(t.ffreq));
  for (int i = 0; i < nsym; ++i) {
    uint8_t s = syms[i];
    uint32_t f = freq[s];
    t.fstart[s] = (uint16_t)c;
    t.ffreq[s] = (uint16_t)f;
    if (f > 4096 || c > 4096 - f) return -1;
    std::memset(t.lookup + c, s, f);
    c += f;
  }
  if (c != 4096) return -1;
  t.valid = 1;
  return 0;
}

static inline uint32_t nx16_advance(uint32_t x, const Nx16Table& t,
                                    uint8_t s, uint32_t m,
                                    const uint8_t* b, size_t n,
                                    size_t& pos) {
  x = t.ffreq[s] * (x >> 12) + m - t.fstart[s];
  if (x < (1u << 15)) {
    // mirror the Python slice semantics: missing tail bytes read as 0
    uint32_t w = 0;
    if (pos < n) w = b[pos];
    if (pos + 1 < n) w |= (uint32_t)b[pos + 1] << 8;
    pos += 2;
    x = (x << 16) | w;
  }
  return x;
}

static int64_t nx16_decode_o0(const uint8_t* b, size_t n, size_t pos,
                              uint8_t* out, int64_t out_sz, int nway);

int64_t rans_nx16_decode(const uint8_t* b, size_t n, uint8_t* out,
                         int64_t out_sz, int order1, int nway) {
  if (nway != 4 && nway != 32) return -1;
  if (!order1) return nx16_decode_o0(b, n, 0, out, out_sz, nway);

  // ---- order-1: shared alphabet + per-context tables --------------
  size_t pos = 0;
  if (pos >= n) return -1;
  uint8_t comp = b[pos++];
  int shift = ((comp >> 4) != 1) ? 12 : 10;
  if (shift != 12) return -2;  // fast-shift variant: Python fallback
  std::vector<uint8_t> sub;
  const uint8_t* tb = b;
  size_t tn = n;
  size_t tpos = pos;
  if (comp & 1) {
    uint32_t clen, ulen;
    if (nx16_read_uint7(b, n, pos, clen) != 0) return -1;
    if (nx16_read_uint7(b, n, pos, ulen) != 0) return -1;
    if (ulen > (1u << 24)) return -1;
    sub.resize(ulen);
    if (nx16_decode_o0(b, n, pos, sub.data(), ulen, 4) < 0) return -1;
    tb = sub.data();
    tn = ulen;
    tpos = 0;
    pos += clen;
  }
  uint8_t syms[256];
  int nsym = 0;
  if (nx16_read_alphabet(tb, tn, tpos, syms, nsym) != 0) return -1;
  std::vector<Nx16Table> tabs(256);
  for (int i = 0; i < 256; ++i) tabs[i].valid = 0;
  for (int ci = 0; ci < nsym; ++ci) {
    uint32_t freq[256] = {0};
    int zrun = 0;
    int any = 0;
    for (int si = 0; si < nsym; ++si) {
      if (zrun > 0) {
        zrun--;
        continue;
      }
      uint32_t f;
      if (nx16_read_uint7(tb, tn, tpos, f) != 0) return -1;
      if (f == 0) {
        if (tpos >= tn) return -1;
        zrun = tb[tpos++];
        continue;
      }
      freq[syms[si]] = f;
      any = 1;
    }
    if (!any) continue;  // empty context table stays invalid
    nx16_normalise(freq, syms, nsym, shift);
    if (nx16_build_table(freq, syms, nsym, tabs[syms[ci]]) != 0)
      return -1;
  }
  if (!(comp & 1)) pos = tpos;

  if (nway > 32) return -1;
  uint32_t st[32];
  for (int j = 0; j < nway; ++j) {
    uint32_t w = 0;
    for (int k = 0; k < 4; ++k) {
      uint32_t byte = (pos < n) ? b[pos] : 0;
      pos++;
      w |= byte << (8 * k);
    }
    st[j] = w;
  }
  int64_t frac = out_sz / nway;
  int64_t idx[32], ends[32];
  uint8_t ctxs[32];
  for (int j = 0; j < nway; ++j) {
    idx[j] = j * frac;
    ends[j] = (j + 1) * frac;
    ctxs[j] = 0;
  }
  ends[nway - 1] = out_sz;
  int64_t remaining = out_sz;
  // context-0 availability: contexts are drawn from decoded symbols
  // (all in the alphabet) plus the initial 0
  while (remaining > 0) {
    for (int j = 0; j < nway; ++j) {
      if (idx[j] >= ends[j]) continue;
      const Nx16Table& t = tabs[ctxs[j]];
      if (!t.valid) return -3;
      uint32_t x = st[j];
      uint32_t m = x & 4095;
      uint8_t s = t.lookup[m];
      out[idx[j]++] = s;
      remaining--;
      st[j] = nx16_advance(x, t, s, m, b, n, pos);
      ctxs[j] = s;
    }
  }
  return (int64_t)pos;
}

static int64_t nx16_decode_o0(const uint8_t* b, size_t n, size_t pos,
                              uint8_t* out, int64_t out_sz, int nway) {
  uint8_t syms[256];
  int nsym = 0;
  if (nx16_read_alphabet(b, n, pos, syms, nsym) != 0) return -1;
  uint32_t freq[256] = {0};
  for (int i = 0; i < nsym; ++i) {
    uint32_t f;
    if (nx16_read_uint7(b, n, pos, f) != 0) return -1;
    freq[syms[i]] = f;
  }
  nx16_normalise(freq, syms, nsym, 12);
  Nx16Table tab;
  if (nx16_build_table(freq, syms, nsym, tab) != 0) return -1;
  if (nway > 32) return -1;
  uint32_t st[32];
  for (int j = 0; j < nway; ++j) {
    uint32_t w = 0;
    for (int k = 0; k < 4; ++k) {
      uint32_t byte = (pos < n) ? b[pos] : 0;
      pos++;
      w |= byte << (8 * k);
    }
    st[j] = w;
  }
  for (int64_t i = 0; i < out_sz; ++i) {
    int j = (int)(i % nway);
    uint32_t x = st[j];
    uint32_t m = x & 4095;
    uint8_t s = tab.lookup[m];
    out[i] = s;
    st[j] = nx16_advance(x, tab, s, m, b, n, pos);
  }
  return (int64_t)pos;
}

// ---------------------------------------------------------------
// fqzcomp quality codec (CRAM 3.1 method 7; io/fqzcomp.py is the
// behavioral contract and the fallback). Decodes a DO_LEN stream to
// total_out concatenated quality bytes. Returns 0 or negative error.
// ---------------------------------------------------------------

struct FqzRC {
  const uint8_t* b;
  size_t n, pos;
  uint64_t code;
  uint64_t range;
  uint64_t r;
  void init(const uint8_t* buf, size_t len, size_t p) {
    b = buf;
    n = len;
    pos = p;
    range = 0xFFFFFFFFull;
    code = 0;
    for (int i = 0; i < 4; ++i) code = (code << 8) | byte_();
  }
  uint8_t byte_() {
    uint8_t v = (pos < n) ? b[pos] : 0;
    pos++;
    return v;
  }
  uint32_t get_freq(uint32_t tot) {
    r = range / tot;
    uint64_t f = code / r;
    return (uint32_t)((f < tot - 1) ? f : tot - 1);
  }
  void decode(uint32_t cum, uint32_t freq) {
    code -= (uint64_t)cum * r;
    range = r * freq;
    while (range < (1ull << 24)) {
      code = ((code << 8) | byte_()) & 0xFFFFFFFFFFull;
      range <<= 8;
    }
  }
};

struct FqzModel {
  std::vector<uint16_t> sym, freq;
  uint32_t tot;
  void init(int nsym) {
    sym.resize(nsym);
    freq.assign(nsym, 1);
    for (int i = 0; i < nsym; ++i) sym[i] = (uint16_t)i;
    tot = nsym;
  }
  void rescale() {
    uint32_t t = 0;
    for (size_t i = 0; i < freq.size(); ++i) {
      freq[i] -= freq[i] >> 1;
      t += freq[i];
    }
    tot = t;
  }
  int decode(FqzRC& rc) {
    uint32_t f = rc.get_freq(tot);
    uint32_t cum = 0;
    size_t i = 0;
    while (cum + freq[i] <= f) cum += freq[i++];
    int s = sym[i];
    rc.decode(cum, freq[i]);
    freq[i] += 16;
    tot += 16;
    if (i > 0 && freq[i] > freq[i - 1]) {
      std::swap(sym[i], sym[i - 1]);
      std::swap(freq[i], freq[i - 1]);
    }
    if (tot > (1u << 16) - 16) rescale();
    return s;
  }
};

static int fqz_read_array(const uint8_t* b, size_t n, size_t& pos,
                          uint8_t* vals, int count) {
  if (pos >= n) return -1;
  int cnt = b[pos++];
  if (cnt == 0) {
    if (pos + count > n) return -1;
    std::memcpy(vals, b + pos, count);
    pos += count;
    return 0;
  }
  int k = 0;
  for (int i = 0; i < cnt; ++i) {
    if (pos + 2 > n) return -1;
    uint8_t v = b[pos], r = b[pos + 1];
    pos += 2;
    if (k + r > count) return -1;
    std::memset(vals + k, v, r);
    k += r;
  }
  return (k == count) ? 0 : -1;
}

struct FqzParam {
  uint32_t context;
  uint8_t pflags, max_sym;
  int qbits, qshift, qloc, sloc, ploc, dloc;
  uint8_t qmap[256], qtab[256], dtab[256];
  uint8_t ptab[1024];
};

int fqz_decode(const uint8_t* b, size_t n, uint8_t* out,
               int64_t total_out) {
  size_t pos = 0;
  if (pos + 2 > n) return -1;
  if (b[pos++] != 5) return -1;
  uint8_t gflags = b[pos++];
  int nparam = 1;
  if (gflags & 1) {
    if (pos >= n) return -1;
    nparam = b[pos++];
    if (nparam < 1) return -1;
  }
  uint8_t stab[256];
  for (int i = 0; i < 256; ++i) stab[i] = (uint8_t)i;
  if (gflags & 2) {
    if (pos >= n) return -1;
    pos++;  // max_sel
    if (fqz_read_array(b, n, pos, stab, 256) != 0) return -1;
  }
  std::vector<FqzParam> params(nparam);
  for (int pi = 0; pi < nparam; ++pi) {
    FqzParam& p = params[pi];
    if (pos + 7 > n) return -1;
    p.context = b[pos] | ((uint32_t)b[pos + 1] << 8);
    pos += 2;
    p.pflags = b[pos++];
    p.max_sym = b[pos++];
    uint8_t x = b[pos++];
    p.qbits = x >> 4;
    p.qshift = x & 15;
    x = b[pos++];
    p.qloc = x >> 4;
    p.sloc = x & 15;
    x = b[pos++];
    p.ploc = x >> 4;
    p.dloc = x & 15;
    for (int i = 0; i < 256; ++i) {
      p.qmap[i] = (uint8_t)i;
      p.qtab[i] = (uint8_t)i;
      p.dtab[i] = 0;
    }
    std::memset(p.ptab, 0, sizeof(p.ptab));
    if (p.pflags & 16) {
      if (fqz_read_array(b, n, pos, p.qmap, 256) != 0) return -1;
    }
    if (p.pflags & 128) {
      if (fqz_read_array(b, n, pos, p.qtab, 256) != 0) return -1;
    }
    if (p.pflags & 32) {
      if (fqz_read_array(b, n, pos, p.ptab, 1024) != 0) return -1;
    }
    if (p.pflags & 64) {
      if (fqz_read_array(b, n, pos, p.dtab, 256) != 0) return -1;
    }
  }

  FqzRC rc;
  rc.init(b, n, pos);
  std::vector<FqzModel*> qual_m(65536, (FqzModel*)nullptr);
  FqzModel sel_m, dup_m, len_m[4];
  sel_m.init(nparam > 1 ? nparam : 1);
  dup_m.init(2);
  for (int k = 0; k < 4; ++k) len_m[k].init(256);
  std::vector<uint8_t> prev;
  int64_t done = 0;
  int64_t nrec = 0;
  int64_t nrec_cap = total_out + 1024;
  int rcode = 0;
  while (done < total_out) {
    if (++nrec > nrec_cap) {
      rcode = -2;
      break;
    }
    int sel = (nparam > 1) ? sel_m.decode(rc) : 0;
    FqzParam& p = params[stab[sel] % nparam];
    int64_t ln;
    if (p.pflags & 4) {
      ln = (int64_t)len_m[0].decode(rc)
           | ((int64_t)len_m[1].decode(rc) << 8)
           | ((int64_t)len_m[2].decode(rc) << 16)
           | ((int64_t)len_m[3].decode(rc) << 24);
      if (done + ln > total_out) {
        rcode = -2;
        break;
      }
    } else {
      rcode = -3;  // external-lengths form: Python handles it
      break;
    }
    if (p.pflags & 2) {
      if (dup_m.decode(rc)) {
        for (int64_t i = 0; i < ln; ++i)
          out[done + i] = (i < (int64_t)prev.size()) ? prev[i] : 0;
        done += ln;
        continue;
      }
    }
    uint32_t qhist = 0, delta = 0;
    int q1 = 0;
    uint32_t qmask = (1u << p.qbits) - 1;
    prev.resize(ln);
    for (int64_t i = 0; i < ln; ++i) {
      uint32_t ctx = p.context;
      ctx += (qhist & qmask) << p.qloc;
      ctx += (uint32_t)p.ptab[(i < 1023) ? i : 1023] << p.ploc;
      ctx += (uint32_t)p.dtab[(delta < 255) ? delta : 255] << p.dloc;
      ctx += (uint32_t)sel << p.sloc;
      ctx &= 0xFFFF;
      FqzModel*& m = qual_m[ctx];
      if (!m) {
        m = new FqzModel();
        m->init(p.max_sym + 1);
      }
      int q = m->decode(rc);
      uint8_t v = (p.pflags & 16) ? p.qmap[q] : (uint8_t)q;
      out[done + i] = v;
      prev[i] = v;
      qhist = (qhist << p.qshift) + p.qtab[q];
      delta += (q1 != q);
      q1 = q;
    }
    done += ln;
  }
  for (size_t i = 0; i < qual_m.size(); ++i) delete qual_m[i];
  return rcode;
}

// ---------------------------------------------------------------
// adaptive arithmetic entropy stage (CRAM 3.1 method 6;
// io/arith_nx.py is the contract and fallback): order-0/1 byte
// models over the fqzcomp range coder. `b` points at the entropy
// payload (flag/transform parsing stays in Python). Returns 0 or
// negative error.
// ---------------------------------------------------------------
int arith_decode_bytes(const uint8_t* b, size_t n, uint8_t* out,
                       int64_t out_sz, int order1) {
  FqzRC rc;
  rc.init(b, n, 0);
  if (order1) {
    std::vector<FqzModel*> models(256, (FqzModel*)nullptr);
    int ctx = 0;
    for (int64_t i = 0; i < out_sz; ++i) {
      FqzModel*& m = models[ctx];
      if (!m) {
        m = new FqzModel();
        m->init(256);
      }
      int v = m->decode(rc);
      out[i] = (uint8_t)v;
      ctx = v;
    }
    for (size_t i = 0; i < models.size(); ++i) delete models[i];
  } else {
    FqzModel m;
    m.init(256);
    for (int64_t i = 0; i < out_sz; ++i)
      out[i] = (uint8_t)m.decode(rc);
  }
  return 0;
}

// Decode an entire ITF-8 stream (CRAM external int series) in one
// pass. Returns the number of values written (caller sizes `out` with
// at least `n` entries: one byte per value lower-bounds the stream).
int64_t itf8_decode_stream(const uint8_t* b, size_t n, int32_t* out) {
  size_t pos = 0;
  int64_t count = 0;
  while (pos < n) {
    uint8_t b0 = b[pos];
    uint32_t v;
    if (b0 < 0x80) {
      v = b0;
      pos += 1;
    } else if (b0 < 0xC0) {
      if (pos + 2 > n) break;
      v = ((uint32_t)(b0 & 0x3F) << 8) | b[pos + 1];
      pos += 2;
    } else if (b0 < 0xE0) {
      if (pos + 3 > n) break;
      v = ((uint32_t)(b0 & 0x1F) << 16) | ((uint32_t)b[pos + 1] << 8)
          | b[pos + 2];
      pos += 3;
    } else if (b0 < 0xF0) {
      if (pos + 4 > n) break;
      v = ((uint32_t)(b0 & 0x0F) << 24) | ((uint32_t)b[pos + 1] << 16)
          | ((uint32_t)b[pos + 2] << 8) | b[pos + 3];
      pos += 4;
    } else {
      if (pos + 5 > n) break;
      v = ((uint32_t)(b0 & 0x0F) << 28) | ((uint32_t)b[pos + 1] << 20)
          | ((uint32_t)b[pos + 2] << 12) | ((uint32_t)b[pos + 3] << 4)
          | (b[pos + 4] & 0x0F);
      pos += 5;
    }
    out[count++] = (int32_t)v;
  }
  return count;
}

// ---------------------------------------------------------------------
// CRAM slice -> BAM record transcoder (common profile)
// ---------------------------------------------------------------------
// Decodes one CRAM 3.0 slice whose data series all use EXTERNAL
// encodings (one content id per series; RN/IN/SC as BYTE_ARRAY_STOP
// with NUL; tags as BYTE_ARRAY_LEN over two external streams) directly
// into uncompressed BAM records. This is the profile our writer and
// htslib's default emit; anything else falls back to the Python
// decoder (io/cram.py _decode_slice).
//
// Stream indexes (fixed order, null when absent):
//   0 BF 1 CF 2 RI 3 RL 4 AP 5 RG 6 MF 7 NS 8 NP 9 TS 10 NF 11 TL
//   12 FN 13 FC 14 FP 15 DL 16 BA 17 BS 18 IN 19 SC 20 HC 21 PD
//   22 RS 23 BB 24 QQ 25 QS 26 MQ 27 RN
struct CramStream {
  const uint8_t* p;
  size_t n;
  size_t off;
};

static inline int cram_itf8(CramStream& s, int32_t& out) {
  if (s.off >= s.n) return -1;
  uint8_t b0 = s.p[s.off++];
  uint32_t v;
  if (b0 < 0x80) v = b0;
  else if (b0 < 0xC0) {
    if (s.off + 1 > s.n) return -1;
    v = ((uint32_t)(b0 & 0x3F) << 8) | s.p[s.off];
    s.off += 1;
  } else if (b0 < 0xE0) {
    if (s.off + 2 > s.n) return -1;
    v = ((uint32_t)(b0 & 0x1F) << 16) | ((uint32_t)s.p[s.off] << 8)
        | s.p[s.off + 1];
    s.off += 2;
  } else if (b0 < 0xF0) {
    if (s.off + 3 > s.n) return -1;
    v = ((uint32_t)(b0 & 0x0F) << 24) | ((uint32_t)s.p[s.off] << 16)
        | ((uint32_t)s.p[s.off + 1] << 8) | s.p[s.off + 2];
    s.off += 3;
  } else {
    if (s.off + 4 > s.n) return -1;
    v = ((uint32_t)(b0 & 0x0F) << 28) | ((uint32_t)s.p[s.off] << 20)
        | ((uint32_t)s.p[s.off + 1] << 12) | ((uint32_t)s.p[s.off + 2] << 4)
        | (s.p[s.off + 3] & 0x0F);
    s.off += 4;
  }
  out = (int32_t)v;
  return 0;
}

static inline int cram_byte(CramStream& s, uint8_t& out) {
  if (s.off >= s.n) return -1;
  out = s.p[s.off++];
  return 0;
}

static inline int cram_stop_array(CramStream& s, const uint8_t*& ptr,
                                  int32_t& len) {
  const uint8_t* start = s.p + s.off;
  const uint8_t* stop =
      (const uint8_t*)std::memchr(start, 0, s.n - s.off);
  if (!stop) return -1;
  ptr = start;
  len = (int32_t)(stop - start);
  s.off += len + 1;
  return 0;
}

static const int CS_BF = 0, CS_CF = 1, CS_RI = 2, CS_RL = 3, CS_AP = 4,
                 CS_RG = 5, CS_MF = 6, CS_NS = 7, CS_NP = 8, CS_TS = 9,
                 CS_NF = 10, CS_TL = 11, CS_FN = 12, CS_FC = 13,
                 CS_FP = 14, CS_DL = 15, CS_BA = 16, CS_BS = 17,
                 CS_IN = 18, CS_SC = 19, CS_HC = 20, CS_PD = 21,
                 CS_RS = 22, CS_BB = 23, CS_QQ = 24, CS_QS = 25,
                 CS_MQ = 26, CS_RN = 27, CS_N = 28;

static void NT16_LUT_INIT(uint8_t* lut) {
  const char* a = "=ACMGRSVTWYHKDBN";
  std::memset(lut, 15, 256);
  for (int i = 0; i < 16; ++i) {
    lut[(uint8_t)a[i]] = (uint8_t)i;
    lut[(uint8_t)std::tolower((unsigned char)a[i])] = (uint8_t)i;
  }
}

struct CramRecMeta {
  int64_t rec_off;   // offset of record start in out buffer
  int32_t tid, pos, rl, nf, cf, ref_span;
  int32_t bf_off;    // offset of flag field within record
};

// Returns total bytes written, or -1 on decode error / -2 if the output
// buffer is too small (caller retries with a bigger one).
int64_t cram_decode_slice(
    const uint8_t** stream_ptrs, const int64_t* stream_lens,
    int32_t nrec, int32_t slice_ref, int32_t slice_start, int32_t ap_delta,
    int32_t rn_preserved, const uint8_t* sub_matrix,
    // tag dictionary: line -> [tag indexes]; tags: 3 bytes each + two
    // streams (len, val) per distinct tag
    int32_t ntag_lines, const int32_t* line_offs, const int32_t* line_tags,
    int32_t ndtags, const uint8_t* tag3s,
    const uint8_t** tagl_ptrs, const int64_t* tagl_lens,
    const uint8_t** tagv_ptrs, const int64_t* tagv_lens,
    const uint8_t* ref, int64_t ref_len,
    int32_t nrg, const int32_t* rg_offs, const uint8_t* rg_blob,
    uint8_t* out, int64_t out_cap, int32_t* out_nrec) {
  CramStream S[CS_N];
  for (int k = 0; k < CS_N; ++k) {
    S[k].p = stream_ptrs[k];
    S[k].n = (size_t)stream_lens[k];
    S[k].off = 0;
  }
  std::vector<CramStream> TL_(ndtags), TV(ndtags);
  for (int k = 0; k < ndtags; ++k) {
    TL_[k].p = tagl_ptrs[k];
    TL_[k].n = (size_t)tagl_lens[k];
    TL_[k].off = 0;
    TV[k].p = tagv_ptrs[k];
    TV[k].n = (size_t)tagv_lens[k];
    TV[k].off = 0;
  }
  uint8_t lut[256];
  NT16_LUT_INIT(lut);
  // substitution decode table: [ref_base_idx][code] -> alt base
  const char* bases5 = "ACGTN";
  uint8_t sub_tab[256][4];
  std::memset(sub_tab, 'N', sizeof(sub_tab));
  for (int ri = 0; ri < 5; ++ri) {
    uint8_t byte = sub_matrix[ri];
    int k = 0;
    for (int bi = 0; bi < 5; ++bi) {
      if (bi == ri) continue;
      uint8_t code = (byte >> (6 - 2 * k)) & 3;
      sub_tab[(uint8_t)bases5[ri]][code] = (uint8_t)bases5[bi];
      ++k;
    }
  }
  std::vector<CramRecMeta> metas(nrec);
  std::vector<uint8_t> seqbuf, qualbuf;
  std::vector<uint32_t> cig;
  int64_t pos_out = 0;
  int32_t last_ap = slice_start;
  for (int32_t r = 0; r < nrec; ++r) {
    int32_t bf, cf, rl, ap, rg = -1, tl = 0;
    if (cram_itf8(S[CS_BF], bf) || cram_itf8(S[CS_CF], cf)) return -1;
    int32_t tid = slice_ref;
    if (slice_ref == -2) {
      if (cram_itf8(S[CS_RI], tid)) return -1;
    }
    if (cram_itf8(S[CS_RL], rl) || cram_itf8(S[CS_AP], ap)) return -1;
    // rl comes straight from the file; every seq/qual write below is
    // bounds-checked against it so a corrupt CRAM cannot overflow.
    if (rl < 0) return -1;
    if (ap_delta) {
      ap = last_ap + ap;
      last_ap = ap;
    }
    if (S[CS_RG].p && cram_itf8(S[CS_RG], rg)) return -1;
    const uint8_t* qname = (const uint8_t*)"";
    int32_t qlen = 0;
    if (rn_preserved) {
      if (cram_stop_array(S[CS_RN], qname, qlen)) return -1;
    }
    int32_t mf = 0, ns = -1, np = -1, ts = 0, nf = -1;
    if (cf & 0x2) {
      if (cram_itf8(S[CS_MF], mf)) return -1;
      if (!rn_preserved) {
        if (cram_stop_array(S[CS_RN], qname, qlen)) return -1;
      }
      if (cram_itf8(S[CS_NS], ns) || cram_itf8(S[CS_NP], np)
          || cram_itf8(S[CS_TS], ts))
        return -1;
      np -= 1;  // NP is 1-based
    } else if (cf & 0x4) {
      if (cram_itf8(S[CS_NF], nf)) return -1;
    }
    if (S[CS_TL].p) {
      if (cram_itf8(S[CS_TL], tl)) return -1;
    }
    // tags: collect (tag3, payload) for this line
    if (tl < 0 || tl >= ntag_lines) return -1;
    // aux assembled later; first decode to know sizes
    struct TagVal { const uint8_t* t3; const uint8_t* v; int32_t n; };
    std::vector<TagVal> tvals;
    for (int32_t li = line_offs[tl]; li < line_offs[tl + 1]; ++li) {
      int32_t ti = line_tags[li];
      int32_t vlen;
      if (cram_itf8(TL_[ti], vlen)) return -1;
      if (TV[ti].off + (size_t)vlen > TV[ti].n) return -1;
      tvals.push_back({tag3s + 3 * ti, TV[ti].p + TV[ti].off, vlen});
      TV[ti].off += vlen;
    }
    // sequence/features
    seqbuf.assign((size_t)rl, 'N');
    qualbuf.assign((size_t)rl, 0xFF);
    cig.clear();
    int32_t mapq = 0;
    int32_t ref_span = 0;
    if (!(bf & 4)) {
      int32_t fn;
      if (cram_itf8(S[CS_FN], fn)) return -1;
      int32_t rpos = 0;           // read cursor
      int64_t roff = ap - 1;      // reference cursor
      int32_t fpos = 0;
      auto add_op = [&](char opch, int32_t n) {
        if (n <= 0) return;
        static const char* OPS = "MIDNSHP=X";
        uint32_t opi = (uint32_t)(std::strchr(OPS, opch) - OPS);
        if (!cig.empty() && (cig.back() & 0xF) == opi)
          cig.back() += (uint32_t)n << 4;
        else
          cig.push_back(((uint32_t)n << 4) | opi);
      };
      auto fill_match = [&](int32_t n) -> bool {
        if (n <= 0) return true;
        if (rpos + (int64_t)n > rl) return false;
        int64_t avail = 0;
        if (ref && roff >= 0) {
          avail = ref_len - roff;
          if (avail < 0) avail = 0;
          if (avail > n) avail = n;
          if (avail > 0)
            std::memcpy(seqbuf.data() + rpos, ref + roff, (size_t)avail);
        }
        for (int64_t k2 = avail; k2 < n; ++k2) seqbuf[rpos + k2] = 'N';
        add_op('M', n);
        rpos += n;
        roff += n;
        return true;
      };
      for (int32_t f = 0; f < fn; ++f) {
        uint8_t fc;
        int32_t fd;
        if (cram_byte(S[CS_FC], fc) || cram_itf8(S[CS_FP], fd)) return -1;
        fpos += fd;
        if (!fill_match((fpos - 1) - rpos)) return -1;
        switch (fc) {
          case 'X': {
            uint8_t code;
            if (cram_byte(S[CS_BS], code)) return -1;
            if (rpos >= rl) return -1;
            uint8_t rb = (ref && roff >= 0 && roff < ref_len) ? ref[roff] : 'N';
            if (rb >= 'a' && rb <= 'z') rb -= 32;
            if (!std::strchr("ACGTN", rb)) rb = 'N';
            seqbuf[rpos] = sub_tab[rb][code & 3];
            add_op('M', 1);
            ++rpos;
            ++roff;
            break;
          }
          case 'B': {
            uint8_t b2, q2;
            if (cram_byte(S[CS_BA], b2) || cram_byte(S[CS_QS], q2))
              return -1;
            if (rpos >= rl) return -1;
            seqbuf[rpos] = b2;
            qualbuf[rpos] = q2;
            add_op('M', 1);
            ++rpos;
            ++roff;
            break;
          }
          case 'I': {
            const uint8_t* a2;
            int32_t n2;
            if (cram_stop_array(S[CS_IN], a2, n2)) return -1;
            if (n2 < 0 || rpos + (int64_t)n2 > rl) return -1;
            std::memcpy(seqbuf.data() + rpos, a2, n2);
            add_op('I', n2);
            rpos += n2;
            break;
          }
          case 'S': {
            const uint8_t* a2;
            int32_t n2;
            if (cram_stop_array(S[CS_SC], a2, n2)) return -1;
            if (n2 < 0 || rpos + (int64_t)n2 > rl) return -1;
            std::memcpy(seqbuf.data() + rpos, a2, n2);
            add_op('S', n2);
            rpos += n2;
            break;
          }
          case 'i': {
            uint8_t b2;
            if (cram_byte(S[CS_BA], b2)) return -1;
            if (rpos >= rl) return -1;
            seqbuf[rpos] = b2;
            add_op('I', 1);
            ++rpos;
            break;
          }
          case 'D': {
            int32_t n2;
            if (cram_itf8(S[CS_DL], n2)) return -1;
            if (n2 < 0) return -1;
            add_op('D', n2);
            roff += n2;
            break;
          }
          case 'N': {
            int32_t n2;
            if (cram_itf8(S[CS_RS], n2)) return -1;
            if (n2 < 0) return -1;
            add_op('N', n2);
            roff += n2;
            break;
          }
          case 'H': {
            int32_t n2;
            if (cram_itf8(S[CS_HC], n2)) return -1;
            if (n2 < 0) return -1;
            add_op('H', n2);
            break;
          }
          case 'P': {
            int32_t n2;
            if (cram_itf8(S[CS_PD], n2)) return -1;
            if (n2 < 0) return -1;
            add_op('P', n2);
            break;
          }
          case 'b': {
            const uint8_t* a2;
            int32_t n2;
            if (cram_stop_array(S[CS_BB], a2, n2)) return -1;
            if (n2 < 0 || rpos + (int64_t)n2 > rl) return -1;
            std::memcpy(seqbuf.data() + rpos, a2, n2);
            add_op('M', n2);
            rpos += n2;
            roff += n2;
            break;
          }
          case 'q': {
            const uint8_t* a2;
            int32_t n2;
            if (cram_stop_array(S[CS_QQ], a2, n2)) return -1;
            if (n2 < 0 || rpos + (int64_t)n2 > rl) return -1;
            std::memcpy(qualbuf.data() + rpos, a2, n2);
            break;
          }
          case 'Q': {
            uint8_t q2;
            if (cram_byte(S[CS_QS], q2)) return -1;
            if (rpos >= rl) return -1;
            qualbuf[rpos] = q2;
            break;
          }
          default:
            return -1;
        }
      }
      if (!fill_match(rl - rpos)) return -1;
      if (cram_itf8(S[CS_MQ], mapq)) return -1;
      if (cf & 0x1) {
        if (S[CS_QS].off + (size_t)rl > S[CS_QS].n) return -1;
        std::memcpy(qualbuf.data(), S[CS_QS].p + S[CS_QS].off, rl);
        S[CS_QS].off += rl;
      }
      for (auto c : cig) {
        uint32_t op = c & 0xF;
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
          ref_span += (int32_t)(c >> 4);
      }
    } else {
      for (int32_t k2 = 0; k2 < rl; ++k2) {
        uint8_t b2;
        if (cram_byte(S[CS_BA], b2)) return -1;
        seqbuf[k2] = b2;
      }
      if (cf & 0x1) {
        if (S[CS_QS].off + (size_t)rl > S[CS_QS].n) return -1;
        std::memcpy(qualbuf.data(), S[CS_QS].p + S[CS_QS].off, rl);
        S[CS_QS].off += rl;
      }
      ref_span = rl;
    }
    int32_t out_rl = rl;
    if (cf & 0x8) out_rl = 0;  // SEQ "*": structure only

    // assemble BAM record
    int32_t name_len = (qlen ? qlen : 1) + 1;  // "*" when empty
    int32_t n_cigar = (int32_t)cig.size();
    int32_t aux_len = 0;
    if (rg >= 0 && rg < nrg)
      aux_len += 3 + (rg_offs[rg + 1] - rg_offs[rg]) + 1;
    for (auto& tv : tvals) aux_len += 3 + tv.n;
    int64_t body = 32 + name_len + 4LL * n_cigar + (out_rl + 1) / 2
                   + out_rl + aux_len;
    if (pos_out + 4 + body > out_cap) return -2;
    uint8_t* w = out + pos_out;
    int32_t body32 = (int32_t)body;
    std::memcpy(w, &body32, 4);
    metas[r].rec_off = pos_out;
    metas[r].bf_off = (int32_t)(pos_out + 4 + 14);
    metas[r].tid = tid;
    metas[r].pos = ap - 1;
    metas[r].rl = rl;
    metas[r].nf = nf;
    metas[r].cf = cf;
    metas[r].ref_span = (bf & 4) ? rl : ref_span;
    w += 4;
    int32_t pos0 = ap - 1;
    std::memcpy(w, &tid, 4);
    std::memcpy(w + 4, &pos0, 4);
    w[8] = (uint8_t)name_len;
    w[9] = (uint8_t)mapq;
    w[10] = 0;
    w[11] = 0;  // bin
    w[12] = (uint8_t)(n_cigar & 0xFF);
    w[13] = (uint8_t)(n_cigar >> 8);
    int32_t flag = bf;
    if (cf & 0x2) {
      if (mf & 1) flag |= 0x20;
      if (mf & 2) flag |= 0x8;
    }
    w[14] = (uint8_t)(flag & 0xFF);
    w[15] = (uint8_t)(flag >> 8);
    std::memcpy(w + 16, &out_rl, 4);
    int32_t mtid = ns, mpos = np, tlen = ts;
    if (!(cf & 0x2)) { mtid = -1; mpos = -1; tlen = 0; }
    std::memcpy(w + 20, &mtid, 4);
    std::memcpy(w + 24, &mpos, 4);
    std::memcpy(w + 28, &tlen, 4);
    w += 32;
    if (qlen) {
      std::memcpy(w, qname, qlen);
      w[qlen] = 0;
    } else {
      w[0] = '*';
      w[1] = 0;
    }
    w += name_len;
    std::memcpy(w, cig.data(), 4LL * n_cigar);
    w += 4LL * n_cigar;
    // packed seq
    for (int32_t k2 = 0; k2 < out_rl; k2 += 2) {
      uint8_t hi = lut[seqbuf[k2]] << 4;
      uint8_t lo = (k2 + 1 < out_rl) ? lut[seqbuf[k2 + 1]] : 0;
      *w++ = hi | lo;
    }
    if (out_rl) {
      std::memcpy(w, qualbuf.data(), out_rl);
      w += out_rl;
    }
    if (rg >= 0 && rg < nrg) {
      *w++ = 'R';
      *w++ = 'G';
      *w++ = 'Z';
      int32_t rgl = rg_offs[rg + 1] - rg_offs[rg];
      std::memcpy(w, rg_blob + rg_offs[rg], rgl);
      w += rgl;
      *w++ = 0;
    }
    for (auto& tv : tvals) {
      std::memcpy(w, tv.t3, 3);
      std::memcpy(w + 3, tv.v, tv.n);
      w += 3 + tv.n;
    }
    pos_out += 4 + body;
  }
  // NF mate resolution (spec 8.2): fix up both records in place
  for (int32_t i = 0; i < nrec; ++i) {
    int32_t nf = metas[i].nf;
    if (nf < 0) continue;
    int32_t j = i + nf + 1;
    if (j >= nrec) continue;
    CramRecMeta& a = metas[i];
    CramRecMeta& b = metas[j];
    uint8_t* ra = out + a.rec_off + 4;
    uint8_t* rb = out + b.rec_off + 4;
    // copy qname a -> b
    uint8_t a_nlen = ra[8];
    uint8_t b_nlen = rb[8];
    if (a_nlen == b_nlen)
      std::memcpy(rb + 32, ra + 32, a_nlen);
    else if (b_nlen == 2 && rb[32] == '*') {
      // names differ in length: unsupported in-place; bail out
      return -1;
    }
    auto get_flag = [&](uint8_t* rp) {
      return (int32_t)(rp[14] | (rp[15] << 8));
    };
    auto set_flag = [&](uint8_t* rp, int32_t f) {
      rp[14] = (uint8_t)(f & 0xFF);
      rp[15] = (uint8_t)(f >> 8);
    };
    int32_t fa = get_flag(ra), fb = get_flag(rb);
    if (fb & 0x10) fa |= 0x20;
    if (fb & 0x4) fa |= 0x8;
    if (fa & 0x10) fb |= 0x20;
    if (fa & 0x4) fb |= 0x8;
    set_flag(ra, fa);
    set_flag(rb, fb);
    std::memcpy(ra + 20, &b.tid, 4);
    std::memcpy(ra + 24, &b.pos, 4);
    std::memcpy(rb + 20, &a.tid, 4);
    std::memcpy(rb + 24, &a.pos, 4);
    int32_t a_end = a.pos + a.ref_span;
    int32_t b_end = b.pos + b.ref_span;
    int32_t left = a.pos < b.pos ? a.pos : b.pos;
    int32_t right = a_end > b_end ? a_end : b_end;
    int32_t span = right - left;
    int32_t ts_a = (a.pos <= b.pos) ? span : -span;
    int32_t ts_b = -ts_a;
    std::memcpy(ra + 28, &ts_a, 4);
    std::memcpy(rb + 28, &ts_b, 4);
  }
  *out_nrec = nrec;
  return pos_out;
}

// ---------------------------------------------------------------------
// Host DP matrices (traceback-carrying paths)
// ---------------------------------------------------------------------

void nw_matrix_mt(const uint8_t* s1, int32_t m, const uint8_t* s2,
                  int32_t n, int32_t match, int32_t mismatch, int32_t ge,
                  int32_t horizontal_free, int32_t threads, int32_t* mat);
void edist_matrix_mt(const uint8_t* q, int32_t m, const uint8_t* t,
                     int32_t n, int32_t mode, const uint8_t* eq,
                     int32_t threads, int32_t* mat);

// Linear-gap NW score matrix (reference needle.h:59-66 with
// AlignConfig<horizontal_free, false>): fills (m+1)*(n+1) int32
// row-major into `mat`. Horizontal gaps are free in rows 0 and m when
// horizontal_free != 0.
void nw_matrix(const uint8_t* s1, int32_t m, const uint8_t* s2, int32_t n,
               int32_t match, int32_t mismatch, int32_t ge,
               int32_t horizontal_free, int32_t* mat) {
  const int64_t stride = n + 1;
  int32_t hg0 = horizontal_free ? 0 : ge;
  for (int32_t c = 0; c <= n; ++c) mat[c] = c * hg0;
  for (int32_t r = 1; r <= m; ++r) {
    int32_t hg = (horizontal_free && (r == m)) ? 0 : ge;
    const int32_t* prev = mat + (int64_t)(r - 1) * stride;
    int32_t* cur = mat + (int64_t)r * stride;
    cur[0] = prev[0] + ge;
    const uint8_t c1 = s1[r - 1];
    // pass 1 (vectorizable): diagonal/vertical candidates
    for (int32_t c = 1; c <= n; ++c) {
      int32_t sub = prev[c - 1] + ((c1 == s2[c - 1]) ? match : mismatch);
      int32_t up = prev[c] + ge;
      cur[c] = sub > up ? sub : up;
    }
    // pass 2 (max-plus scan): horizontal-gap chain
    for (int32_t c = 1; c <= n; ++c) {
      int32_t left = cur[c - 1] + hg;
      if (left > cur[c]) cur[c] = left;
    }
  }
}

// Unit-cost edit-distance DP matrix (edlib semantics, reference
// edlib.cpp): fills (m+1)*(n+1) int32 row-major. mode 0=NW (target
// prefix charged), 2=HW (free target prefix); SHW shares the NW matrix.
// eq: optional 256x256 equality table (IUPAC custom pairs) or NULL.
void edist_matrix(const uint8_t* q, int32_t m, const uint8_t* t,
                  int32_t n, int32_t mode, const uint8_t* eq,
                  int32_t* mat) {
  const int64_t stride = n + 1;
  for (int32_t c = 0; c <= n; ++c) mat[c] = (mode == 2) ? 0 : c;
  for (int32_t r = 1; r <= m; ++r) {
    const int32_t* prev = mat + (int64_t)(r - 1) * stride;
    int32_t* cur = mat + (int64_t)r * stride;
    cur[0] = r;
    const uint8_t qc = q[r - 1];
    if (eq) {
      const uint8_t* eqrow = eq + (int32_t)qc * 256;
      for (int32_t c = 1; c <= n; ++c) {
        int32_t diag = prev[c - 1] + (eqrow[t[c - 1]] ? 0 : 1);
        int32_t up = prev[c] + 1;
        cur[c] = diag < up ? diag : up;
      }
    } else {
      for (int32_t c = 1; c <= n; ++c) {
        int32_t diag = prev[c - 1] + ((qc == t[c - 1]) ? 0 : 1);
        int32_t up = prev[c] + 1;
        cur[c] = diag < up ? diag : up;
      }
    }
    for (int32_t c = 1; c <= n; ++c) {
      int32_t left = cur[c - 1] + 1;
      if (left < cur[c]) cur[c] = left;
    }
  }
}

// Batched distance-only edit distance threaded over pairs: q: (B, M)
// row-major, t: (B, N). out: (B,) int32. The CPU-side equivalent of
// the device Myers kernel for toolchains without a TPU. Per pair this
// runs Myers' bit-parallel column update on 64-bit words (the same
// recurrence as ops/myers.py::_delta_at_qlen, widened to uint64): the
// word-wise add's carry chain performs the column min-plus, so a
// column costs ~15 ops per 64 query rows instead of a dense row sweep.
// Modes: 0=NW (D[m][n]), 1=SHW / 2=HW (min over the last row); NW/SHW
// charge the target prefix (hin=+1), HW does not.
void edist_many(const uint8_t* q, const int32_t* qlens, int32_t mcap,
                const uint8_t* t, const int32_t* tlens, int32_t ncap,
                int64_t nb, int32_t mode, int32_t threads,
                int32_t* out) {
  std::atomic<int64_t> next(0);
  const int32_t wmax = (mcap + 63) / 64;
  auto worker = [&]() {
    std::vector<uint64_t> peq((size_t)256 * wmax);
    std::vector<uint64_t> pv(wmax), mv(wmax);
    std::vector<uint8_t> touched;
    touched.reserve(16);
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= nb) return;
      const uint8_t* qi = q + i * (int64_t)mcap;
      const uint8_t* ti = t + i * (int64_t)ncap;
      int32_t m = qlens[i];
      int32_t n = tlens[i];
      if (m == 0) { out[i] = (mode == 0) ? n : 0; continue; }
      const int32_t w = (m + 63) / 64;
      // fixed wmax row stride; clear only letters touched by the
      // previous pair (full stride, since w varies per pair)
      for (uint8_t c : touched)
        std::memset(peq.data() + (size_t)c * wmax, 0,
                    (size_t)wmax * 8);
      touched.clear();
      for (int32_t r = 0; r < m; ++r) {
        uint8_t c = qi[r];
        uint64_t* row = peq.data() + (size_t)c * wmax;
        bool seen = false;
        for (uint8_t tc : touched) if (tc == c) { seen = true; break; }
        if (!seen) touched.push_back(c);
        row[r >> 6] |= 1ULL << (r & 63);
      }
      for (int32_t wi = 0; wi < w; ++wi) {
        pv[wi] = ~0ULL;
        mv[wi] = 0ULL;
      }
      const int32_t hi_word = (m - 1) >> 6;
      const int32_t hi_bit = (m - 1) & 63;
      const int32_t hin0 = (mode == 2) ? 0 : 1;
      int32_t score = m;               // D[m][0]
      int32_t res = (mode == 0) ? ((n == 0) ? m : 0x7FFFFFFF) : m;
      for (int32_t j = 0; j < n; ++j) {
        const uint64_t* eqrow = peq.data() + (size_t)ti[j] * wmax;
        int32_t hin = hin0;
        for (int32_t wi = 0; wi < w; ++wi) {
          uint64_t eq = eqrow[wi];
          const uint64_t hin_neg = (uint64_t)(hin < 0);
          const uint64_t hin_pos = (uint64_t)(hin > 0);
          const uint64_t pvw = pv[wi], mvw = mv[wi];
          const uint64_t xv = eq | mvw;
          const uint64_t eq2 = eq | hin_neg;
          const uint64_t xh = (((eq2 & pvw) + pvw) ^ pvw) | eq2;
          uint64_t ph = mvw | ~(xh | pvw);
          uint64_t mh = pvw & xh;
          const int32_t hout =
              (int32_t)((ph >> 63) & 1) - (int32_t)((mh >> 63) & 1);
          if (wi == hi_word)
            score += (int32_t)((ph >> hi_bit) & 1)
                   - (int32_t)((mh >> hi_bit) & 1);
          ph = (ph << 1) | hin_pos;
          mh = (mh << 1) | hin_neg;
          pv[wi] = mh | ~(xv | ph);
          mv[wi] = ph & xv;
          hin = hout;
        }
        if (mode == 0) {
          if (j + 1 == n) res = score;
        } else if (score < res) {
          res = score;
        }
      }
      out[i] = res;
    }
  };
  int nthreads = std::max(1, (int)threads);
  if (nthreads == 1 || nb < 2) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int tix = 0; tix < nthreads; ++tix) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
}

// Split-aligner score search (reference needle.h:45-222 "longNeedle"):
// fills the forward NW matrix for (s1,s2) and the reverse-complement one
// for (r1,r2) on two threads, then scans the join grid for the best
// max(fwd[r][0..c]) + max(rev[m-r][0..n-c]) split. Writes the flat argmax
// over the (m+1)*(n+1) grid (first occurrence on ties, matching
// np.argmax) and the best joined score. Both full matrices are kept for
// the caller's traceback.
void long_needle_core(const uint8_t* s1, int32_t m, const uint8_t* s2,
                      int32_t n, const uint8_t* r1, const uint8_t* r2,
                      int32_t match, int32_t mismatch, int32_t ge,
                      int32_t horizontal_free, int32_t threads,
                      int32_t* fwd, int32_t* rev,
                      int64_t* out_flat, int64_t* out_best) {
  {
    int32_t half = std::max(1, (int)threads / 2);
    std::thread tf([&] {
      nw_matrix_mt(s1, m, s2, n, match, mismatch, ge, horizontal_free,
                   half, fwd);
    });
    nw_matrix_mt(r1, m, r2, n, match, mismatch, ge, horizontal_free,
                 half, rev);
    tf.join();
  }
  const int64_t stride = n + 1;
  int nthreads = std::max(1, (int)std::min<int64_t>(threads, m + 1));
  std::vector<int64_t> bests(nthreads, INT64_MIN);
  std::vector<int64_t> flats(nthreads, 0);
  auto scan_rows = [&](int tix, int32_t r0, int32_t r1e) {
    std::vector<int32_t> pref(n + 1);
    int64_t best = INT64_MIN, flat = 0;
    for (int32_t r = r0; r < r1e; ++r) {
      const int32_t* frow = fwd + (int64_t)r * stride;
      const int32_t* rrow = rev + (int64_t)(m - r) * stride;
      int32_t pm = rrow[0];
      pref[0] = pm;
      for (int32_t c = 1; c <= n; ++c) {
        if (rrow[c] > pm) pm = rrow[c];
        pref[c] = pm;
      }
      int32_t fm = frow[0];
      for (int32_t c = 0; c <= n; ++c) {
        if (frow[c] > fm) fm = frow[c];
        int64_t tot = (int64_t)fm + (int64_t)pref[n - c];
        if (tot > best) {
          best = tot;
          flat = (int64_t)r * stride + c;
        }
      }
    }
    bests[tix] = best;
    flats[tix] = flat;
  };
  if (nthreads == 1) {
    scan_rows(0, 0, m + 1);
  } else {
    std::vector<std::thread> pool;
    int32_t chunk = (m + nthreads) / nthreads;
    for (int tix = 0; tix < nthreads; ++tix) {
      int32_t r0 = tix * chunk;
      int32_t r1e = std::min<int32_t>(m + 1, r0 + chunk);
      if (r0 >= r1e) { bests[tix] = INT64_MIN; continue; }
      pool.emplace_back(scan_rows, tix, r0, r1e);
    }
    for (auto& th : pool) th.join();
  }
  int64_t best = INT64_MIN, flat = 0;
  for (int tix = 0; tix < nthreads; ++tix) {
    if (bests[tix] > best || (bests[tix] == best && flats[tix] < flat)) {
      best = bests[tix];
      flat = flats[tix];
    }
  }
  *out_flat = flat;
  *out_best = best;
}

// Wavefront-threaded DP fills: columns are split into one chunk per
// thread; a thread may run pass 2 (the horizontal max-plus / min-plus
// chain) of row r only after its left neighbor finished row r, so the
// chain crosses chunk boundaries exactly. Pipeline fill: with R rows
// and C chunks the parallel efficiency is R / (R + C).
struct WaveSync {
  std::vector<std::atomic<int32_t>> done;
  explicit WaveSync(int nchunks) : done(nchunks) {
    for (auto& d : done) d.store(-1, std::memory_order_relaxed);
  }
};

void nw_matrix_mt(const uint8_t* s1, int32_t m, const uint8_t* s2,
                  int32_t n, int32_t match, int32_t mismatch, int32_t ge,
                  int32_t horizontal_free, int32_t threads, int32_t* mat) {
  int nchunks = std::max(1, (int)std::min<int64_t>(threads, (n + 255) / 256));
  if (nchunks == 1 || m < 64) {
    nw_matrix(s1, m, s2, n, match, mismatch, ge, horizontal_free, mat);
    return;
  }
  const int64_t stride = n + 1;
  int32_t hg0 = horizontal_free ? 0 : ge;
  for (int32_t c = 0; c <= n; ++c) mat[c] = c * hg0;
  WaveSync sync(nchunks);
  auto worker = [&](int k) {
    int32_t c0 = 1 + (int64_t)k * n / nchunks;
    int32_t c1 = 1 + (int64_t)(k + 1) * n / nchunks;  // exclusive
    for (int32_t r = 1; r <= m; ++r) {
      int32_t hg = (horizontal_free && (r == m)) ? 0 : ge;
      const int32_t* prev = mat + (int64_t)(r - 1) * stride;
      int32_t* cur = mat + (int64_t)r * stride;
      const uint8_t ch = s1[r - 1];
      for (int32_t c = c0; c < c1; ++c) {
        int32_t sub = prev[c - 1] + ((ch == s2[c - 1]) ? match : mismatch);
        int32_t up = prev[c] + ge;
        cur[c] = sub > up ? sub : up;
      }
      if (k == 0) {
        cur[0] = prev[0] + ge;
      } else {
        while (sync.done[k - 1].load(std::memory_order_acquire) < r) {
        }
      }
      for (int32_t c = c0; c < c1; ++c) {
        int32_t left = cur[c - 1] + hg;
        if (left > cur[c]) cur[c] = left;
      }
      sync.done[k].store(r, std::memory_order_release);
    }
  };
  std::vector<std::thread> pool;
  for (int k = 1; k < nchunks; ++k) pool.emplace_back(worker, k);
  worker(0);
  for (auto& th : pool) th.join();
}

void edist_matrix_mt(const uint8_t* q, int32_t m, const uint8_t* t,
                     int32_t n, int32_t mode, const uint8_t* eq,
                     int32_t threads, int32_t* mat) {
  int nchunks = std::max(1, (int)std::min<int64_t>(threads, (n + 255) / 256));
  if (nchunks == 1 || m < 64) {
    edist_matrix(q, m, t, n, mode, eq, mat);
    return;
  }
  const int64_t stride = n + 1;
  for (int32_t c = 0; c <= n; ++c) mat[c] = (mode == 2) ? 0 : c;
  WaveSync sync(nchunks);
  auto worker = [&](int k) {
    int32_t c0 = 1 + (int64_t)k * n / nchunks;
    int32_t c1 = 1 + (int64_t)(k + 1) * n / nchunks;
    for (int32_t r = 1; r <= m; ++r) {
      const int32_t* prev = mat + (int64_t)(r - 1) * stride;
      int32_t* cur = mat + (int64_t)r * stride;
      const uint8_t qc = q[r - 1];
      if (eq) {
        const uint8_t* eqrow = eq + (int32_t)qc * 256;
        for (int32_t c = c0; c < c1; ++c) {
          int32_t diag = prev[c - 1] + (eqrow[t[c - 1]] ? 0 : 1);
          int32_t up = prev[c] + 1;
          cur[c] = diag < up ? diag : up;
        }
      } else {
        for (int32_t c = c0; c < c1; ++c) {
          int32_t diag = prev[c - 1] + ((qc == t[c - 1]) ? 0 : 1);
          int32_t up = prev[c] + 1;
          cur[c] = diag < up ? diag : up;
        }
      }
      if (k == 0) {
        cur[0] = r;
      } else {
        while (sync.done[k - 1].load(std::memory_order_acquire) < r) {
        }
      }
      for (int32_t c = c0; c < c1; ++c) {
        int32_t left = cur[c - 1] + 1;
        if (left < cur[c]) cur[c] = left;
      }
      sync.done[k].store(r, std::memory_order_release);
    }
  };
  std::vector<std::thread> pool;
  for (int k = 1; k < nchunks; ++k) pool.emplace_back(worker, k);
  worker(0);
  for (auto& th : pool) th.join();
}

// Single-pair Myers bit-parallel distance scan returning the distance
// AND the leftmost optimal end column (DP column coordinates, 0 =
// empty-target alignment). Same recurrence as edist_many; eq adds
// IUPAC-style custom equality (Peq bit r of letter c set when
// eq[q[r]][c]). out2 = {dist, end_col}.
static void edist_scan_impl(const uint8_t* q, int32_t m,
                            const uint8_t* t, int32_t n, int32_t mode,
                            const uint8_t* eq, int32_t take_last,
                            int32_t* out2) {
  if (m == 0) {
    out2[0] = (mode == 0) ? n : 0;
    out2[1] = (mode == 0) ? n : 0;
    return;
  }
  const int32_t w = (m + 63) / 64;
  std::vector<uint64_t> peq((size_t)256 * w, 0);
  for (int32_t r = 0; r < m; ++r) {
    if (eq) {
      const uint8_t* eqrow = eq + (size_t)q[r] * 256;
      for (int32_t c = 0; c < 256; ++c)
        if (eqrow[c]) peq[(size_t)c * w + (r >> 6)] |= 1ULL << (r & 63);
    } else {
      peq[(size_t)q[r] * w + (r >> 6)] |= 1ULL << (r & 63);
    }
  }
  std::vector<uint64_t> pv(w, ~0ULL), mv(w, 0ULL);
  const int32_t hi_word = (m - 1) >> 6;
  const int32_t hi_bit = (m - 1) & 63;
  const int32_t hin0 = (mode == 2) ? 0 : 1;
  int32_t score = m;
  int32_t res = (mode == 0) ? ((n == 0) ? m : 0x7FFFFFFF) : m;
  int32_t end_col = (mode == 0) ? n : 0;
  for (int32_t j = 0; j < n; ++j) {
    const uint64_t* eqrow = peq.data() + (size_t)t[j] * w;
    int32_t hin = hin0;
    for (int32_t wi = 0; wi < w; ++wi) {
      uint64_t eqw = eqrow[wi];
      const uint64_t hin_neg = (uint64_t)(hin < 0);
      const uint64_t hin_pos = (uint64_t)(hin > 0);
      const uint64_t pvw = pv[wi], mvw = mv[wi];
      const uint64_t xv = eqw | mvw;
      const uint64_t eq2 = eqw | hin_neg;
      const uint64_t xh = (((eq2 & pvw) + pvw) ^ pvw) | eq2;
      uint64_t ph = mvw | ~(xh | pvw);
      uint64_t mh = pvw & xh;
      const int32_t hout =
          (int32_t)((ph >> 63) & 1) - (int32_t)((mh >> 63) & 1);
      if (wi == hi_word)
        score += (int32_t)((ph >> hi_bit) & 1)
               - (int32_t)((mh >> hi_bit) & 1);
      ph = (ph << 1) | hin_pos;
      mh = (mh << 1) | hin_neg;
      pv[wi] = mh | ~(xv | ph);
      mv[wi] = ph & xv;
      hin = hout;
    }
    if (mode == 0) {
      if (j + 1 == n) res = score;
    } else if (score < res || (take_last && score == res)) {
      res = score;
      end_col = j + 1;
    }
  }
  out2[0] = res;
  out2[1] = end_col;
}

void edist_scan(const uint8_t* q, int32_t m, const uint8_t* t, int32_t n,
                int32_t mode, const uint8_t* eq, int32_t* out2) {
  edist_scan_impl(q, m, t, n, mode, eq, 0, out2);
}

// Rightmost-optimal end (edlib startLocations: the LAST optimal SHW
// position of the reversed problem = the leftmost alignment start,
// edlib.cpp:252-254).
void edist_scan_last(const uint8_t* q, int32_t m, const uint8_t* t,
                     int32_t n, int32_t mode, const uint8_t* eq,
                     int32_t* out2) {
  edist_scan_impl(q, m, t, n, mode, eq, 1, out2);
}

// Sequential per-range sums: out[k] = x[starts[k]] + ... +
// x[ends[k]-1], accumulated LEFT-TO-RIGHT from zero per range — the
// reference's per-window running sums (coral.h:296-339, cnv.h:313-339)
// round this way, and vectorized pairwise summation (numpy reduceat /
// np.sum) differs in the last ulp for non-integer doubles.
void seq_range_sums(const double* x, const int64_t* starts,
                    const int64_t* ends, int64_t n_ranges,
                    double* out) {
  for (int64_t k = 0; k < n_ranges; ++k) {
    double s = 0.0;
    for (int64_t i = starts[k]; i < ends[k]; ++i) s += x[i];
    out[k] = s;
  }
}

// Full last DP row via the Myers scan: out_row[j] = d(query,
// target[:j]) for j = 0..n (unit costs, NW/SHW boundary D[0][j] = j).
// Feeds the Hirschberg column computations of the edlib-parity PATH
// alignment (ops/edist.py _hirschberg_nw) at bit-parallel speed.
void edist_scan_row(const uint8_t* q, int32_t m, const uint8_t* t,
                    int32_t n, const uint8_t* eq, int32_t* out_row) {
  out_row[0] = m;
  if (m == 0) {
    for (int32_t j = 1; j <= n; ++j) out_row[j] = j;
    return;
  }
  const int32_t w = (m + 63) / 64;
  std::vector<uint64_t> peq((size_t)256 * w, 0);
  for (int32_t r = 0; r < m; ++r) {
    if (eq) {
      const uint8_t* eqrow = eq + (size_t)q[r] * 256;
      for (int32_t c = 0; c < 256; ++c)
        if (eqrow[c]) peq[(size_t)c * w + (r >> 6)] |= 1ULL << (r & 63);
    } else {
      peq[(size_t)q[r] * w + (r >> 6)] |= 1ULL << (r & 63);
    }
  }
  std::vector<uint64_t> pv(w, ~0ULL), mv(w, 0ULL);
  const int32_t hi_word = (m - 1) >> 6;
  const int32_t hi_bit = (m - 1) & 63;
  int32_t score = m;
  for (int32_t j = 0; j < n; ++j) {
    const uint64_t* eqrow = peq.data() + (size_t)t[j] * w;
    int32_t hin = 1;
    for (int32_t wi = 0; wi < w; ++wi) {
      uint64_t eqw = eqrow[wi];
      const uint64_t hin_neg = (uint64_t)(hin < 0);
      const uint64_t hin_pos = (uint64_t)(hin > 0);
      const uint64_t pvw = pv[wi], mvw = mv[wi];
      const uint64_t xv = eqw | mvw;
      const uint64_t eq2 = eqw | hin_neg;
      const uint64_t xh = (((eq2 & pvw) + pvw) ^ pvw) | eq2;
      uint64_t ph = mvw | ~(xh | pvw);
      uint64_t mh = pvw & xh;
      const int32_t hout =
          (int32_t)((ph >> 63) & 1) - (int32_t)((mh >> 63) & 1);
      if (wi == hi_word)
        score += (int32_t)((ph >> hi_bit) & 1)
               - (int32_t)((mh >> hi_bit) & 1);
      ph = (ph << 1) | hin_pos;
      mh = (mh << 1) | hin_neg;
      pv[wi] = mh | ~(xv | ph);
      mv[wi] = ph & xv;
      hin = hout;
    }
    out_row[j + 1] = score;
  }
}

// Banded unit-cost edit-distance DP with in-C traceback (Ukkonen
// corridor; role of edlib's banded alignment, edlib.cpp TASK_PATH).
// Corridor: cells (i, j) with j - i in [lo, hi]. Band storage is
// (m+1) x W row-major, W = hi - lo + 1, diag slot k = j - i - lo;
// predecessors in band coords: diag (i-1, k), up (i-1, k+1),
// left (i, k-1). When the corridor half-width is >= the true
// distance, every cell of every optimal path lies inside the band
// and the band values on those cells equal the full-matrix values,
// so the greedy traceback (up INSERT, then left DELETE, then diag
// -- the edlib obtainAlignmentTraceback order) walks identically to
// the full-matrix walk. Readout: mode 0 = cell (m, n); mode 1 =
// leftmost min over row m; mode 2 = end_col if >= 0, else leftmost
// min. ops_out needs capacity m + n. out3 = {dist, end_col, nops};
// dist = INF (1<<29) signals the readout cell is outside the band.
void edist_path_banded(const uint8_t* q, int32_t m, const uint8_t* t,
                       int32_t n, int32_t mode, const uint8_t* eq,
                       int32_t lo, int32_t hi, int32_t end_col,
                       uint8_t* ops_out, int32_t* out3) {
  const int32_t INF = 1 << 29;
  const int64_t W = (int64_t)hi - lo + 1;
  std::vector<int32_t> band((size_t)(m + 1) * W);
  auto B = [&](int32_t i, int32_t j) -> int32_t& {
    return band[(size_t)i * W + (j - i - lo)];
  };
  for (int64_t k = 0; k < W; ++k) {
    int64_t j = k + lo;
    band[k] = (j < 0 || j > n) ? INF
              : ((mode == 2) ? 0 : (int32_t)j);
  }
  for (int32_t i = 1; i <= m; ++i) {
    const uint8_t qc = q[i - 1];
    const uint8_t* eqrow = eq ? eq + (size_t)qc * 256 : nullptr;
    int32_t* cur = band.data() + (size_t)i * W;
    const int32_t* prev = cur - W;
    for (int64_t k = 0; k < W; ++k) {
      int64_t j = (int64_t)i + k + lo;
      if (j < 0 || j > n) {
        cur[k] = INF;
        continue;
      }
      if (j == 0) {
        cur[k] = i;
        continue;
      }
      const uint8_t tc = t[j - 1];
      int32_t sub = eqrow ? (eqrow[tc] ? 0 : 1) : ((qc == tc) ? 0 : 1);
      int32_t best = prev[k] >= INF ? INF : prev[k] + sub;   // diagonal
      if (k + 1 < W && prev[k + 1] < INF) {                  // up
        int32_t v = prev[k + 1] + 1;
        if (v < best) best = v;
      }
      if (k > 0 && cur[k - 1] < INF) {                       // left
        int32_t v = cur[k - 1] + 1;
        if (v < best) best = v;
      }
      cur[k] = best > INF ? INF : best;
    }
  }
  if (mode == 0) end_col = n;
  if (end_col < 0) {   // leftmost min over row m inside the corridor
    int32_t best = INF;
    for (int64_t k = 0; k < W; ++k) {
      int64_t j = (int64_t)m + k + lo;
      if (j < 0 || j > n) continue;
      int32_t v = band[(size_t)m * W + k];
      if (v < best) {
        best = v;
        end_col = (int32_t)j;
      }
    }
    if (end_col < 0) end_col = 0;
  }
  int32_t dist = INF;
  if (end_col - m >= lo && end_col - m <= hi)
    dist = B(m, end_col);
  out3[0] = dist;
  out3[1] = end_col;
  out3[2] = 0;
  if (dist >= INF) return;
  // greedy traceback, emitted reversed then flipped in place
  // (0=MATCH, 1=INSERT, 2=DELETE, 3=MISMATCH -- edlib op codes)
  int32_t i = m, j = end_col, nops = 0;
  auto in_band = [&](int32_t bi, int32_t bj) {
    return bj - bi >= lo && bj - bi <= hi && bj >= 0 && bj <= n;
  };
  while (i > 0) {
    int32_t curv = B(i, j);
    if (in_band(i - 1, j) && B(i - 1, j) < INF
        && B(i - 1, j) + 1 == curv) {
      ops_out[nops++] = 1;                       // up: INSERT
      --i;
    } else if (j > 0 && in_band(i, j - 1) && B(i, j - 1) < INF
               && B(i, j - 1) + 1 == curv) {
      ops_out[nops++] = 2;                       // left: DELETE
      --j;
    } else if (j == 0) {
      ops_out[nops++] = 1;                       // column 0: INSERT
      --i;
    } else {
      const uint8_t qc = q[i - 1], tc = t[j - 1];
      bool is_match = eq ? (eq[(size_t)qc * 256 + tc] != 0) : (qc == tc);
      ops_out[nops++] = is_match ? 0 : 3;
      --i;
      --j;
    }
  }
  if (mode != 2) {
    while (j > 0) {
      ops_out[nops++] = 2;
      --j;
    }
  }
  for (int32_t a = 0, b = nops - 1; a < b; ++a, --b)
    std::swap(ops_out[a], ops_out[b]);
  out3[2] = nops;
}

// Penalized optimal-partition segmentation with pruning (reference
// cnv.h:237-291; same recurrence and tie/pruning behavior as the
// numpy formulation in models/cnv.py::cnv_segment — first-minimum
// argmin, prune when cost > f[t]). Double math matches numpy exactly
// (the build disables FP contraction). Returns the number of internal
// boundaries written to out_bounds (in ascending order).
int64_t cnv_segment_core(const double* y, int64_t n, double beta,
                         int64_t kmin, int64_t* out_bounds) {
  if (n < 2 * kmin) return 0;
  std::vector<double> s1(n + 1, 0.0), s2(n + 1, 0.0);
  for (int64_t i = 0; i < n; ++i) {
    s1[i + 1] = s1[i] + y[i];
    s2[i + 1] = s2[i] + y[i] * y[i];
  }
  std::vector<double> f(n + 1, 0.0);
  std::vector<int64_t> prev(n + 1, 0);
  f[0] = -beta;
  std::vector<int64_t> r_set, r_next;
  r_set.reserve(n);
  r_next.reserve(n);
  for (int64_t t = kmin; t <= n; ++t) {
    if (t == kmin || t >= 2 * kmin) r_set.push_back(t - kmin);
    double best = 0.0;
    int64_t bi = -1;
    r_next.clear();
    // two passes like the numpy code: argmin first, then prune with
    // the final f[t] (cost <= f[t])
    for (size_t k = 0; k < r_set.size(); ++k) {
      const int64_t s = r_set[k];
      const double nn = (double)(t - s);
      const double sm = s1[t] - s1[s];
      const double cost = f[s] + ((s2[t] - s2[s]) - sm * sm / nn);
      const double val = cost + beta;
      if (bi < 0 || val < best) {
        best = val;
        bi = (int64_t)k;
      }
    }
    f[t] = best;
    prev[t] = r_set[bi];
    for (size_t k = 0; k < r_set.size(); ++k) {
      const int64_t s = r_set[k];
      const double nn = (double)(t - s);
      const double sm = s1[t] - s1[s];
      const double cost = f[s] + ((s2[t] - s2[s]) - sm * sm / nn);
      if (cost <= f[t]) r_next.push_back(s);
    }
    r_set.swap(r_next);
  }
  int64_t nb = 0;
  int64_t t = n;
  while (t > 0) {
    int64_t s = prev[t];
    if (s > 0) out_bounds[nb++] = s;
    if (s >= t) break;
    t = s;
  }
  for (int64_t a = 0, b = nb - 1; a < b; ++a, --b)
    std::swap(out_bounds[a], out_bounds[b]);
  return nb;
}

// Batched pair-key hash (util.h:502-517 hash_combine chain over
// (tid,pos,mtid,mpos) from a precomputed name hash) — one pass, no
// numpy temporaries. Matches utils/hashing.hash_pair_h bit-for-bit.
void hash_pair_h_many(const uint64_t* qh, const int64_t* a,
                      const int64_t* b, const int64_t* c,
                      const int64_t* d, int64_t n, uint64_t* out) {
  const uint64_t gold = 0x9E3779B97F4A7C15ULL;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t seed = qh[i];
    const uint64_t vs[4] = {(uint64_t)a[i], (uint64_t)b[i],
                            (uint64_t)c[i], (uint64_t)d[i]};
    for (int k = 0; k < 4; ++k)
      seed ^= vs[k] + gold + (seed << 6) + (seed >> 2);
    out[i] = seed;
  }
}

// Mate-pair automaton, single sequential pass (the reference's
// qualities/clip dict walks, shortpe.h:411-445 / coverage.h:550-600 /
// tags.h:269-274 _firstPairObs). Semantically identical to the
// vectorized numpy formulation in models/pairing.py (which property-
// tests both against scalar oracles).
//
// pair_first_obs: rows arrive in file order with non-decreasing pos.
// `uncond` rows are first and insert add[i] into the per-position
// seen-set; `eqm` rows (same-position mates) probe chk[i] and are
// first only when unseen (then insert add[i]).
void pair_first_obs(const int64_t* pos, const uint8_t* uncond,
                    const uint8_t* eqm, const uint64_t* chk,
                    const uint64_t* add, int64_t n,
                    uint8_t* first_out) {
  std::unordered_set<uint64_t> seen;
  int64_t last_pos = INT64_MIN;
  for (int64_t i = 0; i < n; ++i) {
    if (pos[i] != last_pos) {
      seen.clear();
      last_pos = pos[i];
    }
    uint8_t f = uncond[i];
    if (!f && eqm[i]) f = (seen.find(chk[i]) == seen.end()) ? 1 : 0;
    first_out[i] = f;
    if (f) seen.insert(add[i]);
  }
}

// pair_match: dict store/overwrite on first rows, probe+pop on second
// rows. Emits (second_row, first_row) matches in file order; returns
// the match count. Open-addressing table with tombstones (keys are
// 64-bit hashes; load factor <= 0.5).
int64_t pair_match(const uint64_t* keys, const uint8_t* first,
                   int64_t n, int64_t* s_out, int64_t* f_out) {
  uint64_t cap = 16;
  while (cap < (uint64_t)2 * (uint64_t)(n > 0 ? n : 1)) cap <<= 1;
  const uint64_t mask = cap - 1;
  std::vector<uint64_t> tkey(cap);
  std::vector<int64_t> tval(cap);
  std::vector<uint8_t> state(cap, 0);  // 0 empty, 1 full, 2 tombstone
  int64_t nout = 0;
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t k = keys[i];
    uint64_t h = k;
    h ^= h >> 33; h *= 0xff51afd7ed558ccdULL; h ^= h >> 33;
    uint64_t slot = h & mask;
    if (first[i]) {
      uint64_t ins = UINT64_MAX;
      for (;;) {
        uint8_t st = state[slot];
        if (st == 0) {
          if (ins == UINT64_MAX) ins = slot;
          break;
        }
        if (st == 1 && tkey[slot] == k) { ins = slot; break; }
        if (st == 2 && ins == UINT64_MAX) ins = slot;
        slot = (slot + 1) & mask;
      }
      state[ins] = 1;
      tkey[ins] = k;
      tval[ins] = i;
    } else {
      for (;;) {
        uint8_t st = state[slot];
        if (st == 0) break;
        if (st == 1 && tkey[slot] == k) {
          s_out[nout] = i;
          f_out[nout] = tval[slot];
          ++nout;
          state[slot] = 2;  // pop
          break;
        }
        slot = (slot + 1) & mask;
      }
    }
  }
  return nout;
}

// Population-genetics site statistics with the reference's exact
// sequential accumulation order (popgen.h:12-201): HWE allele-
// frequency EM, genotype-frequency EM, inbreeding coefficient FIC,
// imputation RSQ and the HWE LRT chi2(1) p-value, all in one pass.
// gl is n x 3 row-major linear-space likelihoods.  out[8] =
// {af0, af1, gtf0, gtf1, gtf2, fic, rsq, pvalue}.  Outputs that the
// reference leaves untouched on degenerate input keep 0/0/0/1 inits.
void popgen_site_stats(const double* gl, int64_t n, double epsilon,
                       int64_t maxiter, double* out) {
  double af0 = 0, af1 = 0, g0 = 0, g1 = 0, g2 = 0;
  double fic = 0, rsq = 0, pvalue = 1;
  if (n > 0) {
    // EM allele frequency under HWE (popgen.h:12-51)
    double ap0 = 0.5, ap1 = 0.5;
    double err = 1;
    for (int64_t count = 0; (err > epsilon) && (count < maxiter);
         ++count) {
      const double p0 = ap0 * ap0, p1 = 2 * ap0 * ap1, p2 = ap1 * ap1;
      af0 = 0;
      af1 = 0;
      double used = 0;
      for (int64_t i = 0; i < n; ++i) {
        double t0 = p0 * gl[3 * i], t1 = p1 * gl[3 * i + 1],
               t2 = p2 * gl[3 * i + 2];
        double p = t0 + t1 + t2;
        if (p <= 0) continue;
        t0 /= p;
        t1 /= p;
        t2 /= p;
        af0 += t0 + 0.5 * t1;
        af1 += t2 + 0.5 * t1;
        used += 1;
      }
      if (used > 0) {
        af0 /= used;
        af1 /= used;
      }
      err = (ap0 - af0) * (ap0 - af0) + (ap1 - af1) * (ap1 - af1);
      ap0 = af0;
      ap1 = af1;
    }
    // EM genotype frequencies (popgen.h:54-91)
    double q0 = 1.0 / 3.0, q1 = 1.0 / 3.0, q2 = 1.0 / 3.0;
    err = 1;
    for (int64_t count = 0; (err > epsilon) && (count < maxiter);
         ++count) {
      g0 = 0;
      g1 = 0;
      g2 = 0;
      double used = 0;
      for (int64_t i = 0; i < n; ++i) {
        const double t0 = q0 * gl[3 * i], t1 = q1 * gl[3 * i + 1],
                     t2 = q2 * gl[3 * i + 2];
        const double p = t0 + t1 + t2;
        if (p <= 0) continue;
        g0 += t0 / p;
        g1 += t1 / p;
        g2 += t2 / p;
        used += 1;
      }
      if (used > 0) {
        g0 /= used;
        g1 /= used;
        g2 /= used;
      }
      err = (q0 - g0) * (q0 - g0) + (q1 - g1) * (q1 - g1) +
            (q2 - g2) * (q2 - g2);
      q0 = g0;
      q1 = g1;
      q2 = g2;
    }
    const double h0 = af0 * af0, h1 = 2 * af0 * af1, h2 = af1 * af1;
    // inbreeding coefficient (popgen.h:94-111)
    double sumGLHet = 0, denominator = 0;
    for (int64_t i = 0; i < n; ++i) {
      const double p =
          gl[3 * i] * h0 + gl[3 * i + 1] * h1 + gl[3 * i + 2] * h2;
      if (p <= 0) continue;
      sumGLHet += ((gl[3 * i + 1] * h1) / p);
      denominator += h1;
    }
    if (denominator > 0) fic = 1 - sumGLHet / denominator;
    // imputation quality (popgen.h:114-147)
    double sumD = 0, sumD2 = 0, used = 0;
    for (int64_t i = 0; i < n; ++i) {
      double t0 = gl[3 * i] * h0, t1 = gl[3 * i + 1] * h1,
             t2 = gl[3 * i + 2] * h2;
      const double p = t0 + t1 + t2;
      if (p <= 0) continue;
      t0 /= p;
      t1 /= p;
      t2 /= p;
      sumD += (t1 + 2 * t0);
      sumD2 += (t1 + 2 * t0) * (t1 + 2 * t0);
      used += 1;
    }
    if ((used > 1) && (h1 > 0)) {
      const double meanD = sumD / used;
      double v = (sumD2 - used * meanD * meanD);
      if (v < 0) v = 0;
      v /= (used - 1);
      rsq = v / h1;
    }
    // HWE LRT (popgen.h:180-201); chi2(1) upper tail = erfc(sqrt(x/2))
    double lnull = 0, lalt = 0;
    for (int64_t i = 0; i < n; ++i) {
      const double pnull =
          gl[3 * i] * h0 + gl[3 * i + 1] * h1 + gl[3 * i + 2] * h2;
      const double palt = gl[3 * i] * g0 + gl[3 * i + 1] * g1 +
                          gl[3 * i + 2] * g2;
      if ((pnull <= 0) || (palt <= 0)) continue;
      lnull += std::log(pnull);
      lalt += std::log(palt);
    }
    double lrts = -2 * (lnull - lalt);
    if (lrts < 0) lrts = 0;
    pvalue = std::erfc(std::sqrt(lrts / 2));
  }
  out[0] = af0;
  out[1] = af1;
  out[2] = g0;
  out[3] = g1;
  out[4] = g2;
  out[5] = fic;
  out[6] = rsq;
  out[7] = pvalue;
}

// Read-depth window builder with the reference's exact reset-to-zero
// sequential accumulation (cnv.h:307-350): walk the valid positions in
// order, accumulate coverage / raw expected / corrected expected, and
// close a window when the raw expected sum reaches target_exp (>0) or
// after win_bases valid positions.  Emits per-window [start, end)
// genome coordinates, the coverage and corrected-expected sums, and
// z = log2(max(cov/exp, 1/64)) computed with std::log2 like the
// reference.  Returns the window count (capacity n is always enough —
// every window consumes >= 1 valid position).
int64_t rd_windows(const int64_t* vpos, const double* vcov,
                   const double* ve1, const double* vecor, int64_t n,
                   double target_exp, int64_t win_bases, int64_t* ws,
                   int64_t* we, double* wcov, double* wexp, double* z) {
  double covsum = 0, expraw = 0, expcor = 0;
  int64_t winlen = 0, start = -1, k = 0;
  const double rFloor = 1.0 / 64.0;
  for (int64_t i = 0; i < n; ++i) {
    if (start < 0) start = vpos[i];
    covsum += vcov[i];
    expraw += ve1[i];
    expcor += vecor[i];
    ++winlen;
    const bool close = (target_exp > 0) ? (expraw >= target_exp)
                                        : (winlen >= win_bases);
    if (close) {
      const double r = (expcor > 0) ? (covsum / expcor) : 1.0;
      z[k] = std::log2(r > rFloor ? r : rFloor);
      ws[k] = start;
      we[k] = vpos[i] + 1;
      wcov[k] = covsum;
      wexp[k] = expcor;
      ++k;
      covsum = 0;
      expraw = 0;
      expcor = 0;
      winlen = 0;
      start = -1;
    }
  }
  if ((winlen > 0) && (start >= 0)) {  // trailing partial window flush
    const double r = (expcor > 0) ? (covsum / expcor) : 1.0;
    z[k] = std::log2(r > rFloor ? r : rFloor);
    ws[k] = start;
    we[k] = vpos[n - 1] + 1;
    wcov[k] = covsum;
    wexp[k] = expcor;
    ++k;
  }
  return k;
}

// Flank z-profile for the CNV breakpoint CN-shift test with the
// reference's exact accumulation (cnv.h:88-110): walk the (already
// direction-ordered) valid-position slices, accumulate coverage and
// expected coverage, and emit z = log2(max(cov/exp, 1/64)) each time
// the expected sum reaches sub_exp (max 8 sub-windows).
int32_t rd_flank_z(const double* vcov, const double* vexp, int64_t n,
                   double sub_exp, double* z_out) {
  double covsum = 0, expcov = 0;
  const double rFloor = 1.0 / 64.0;
  int32_t nz = 0;
  for (int64_t i = 0; i < n && nz < 8; ++i) {
    covsum += vcov[i];
    expcov += vexp[i];
    if (expcov >= sub_exp) {
      const double r = covsum / expcov;
      z_out[nz++] = std::log2(r > rFloor ? r : rFloor);
      covsum = 0;
      expcov = 0;
    }
  }
  return nz;
}

// Squared Pearson correlation over shared-called dosages with the
// reference's sequential accumulation (popgen.h:149-177); -1 when
// fewer than min_shared shared calls or a degenerate variance.
double dosage_r2_seq(const double* a, int64_t na, const double* b,
                     int64_t nb, int32_t min_shared) {
  double n = 0, sa = 0, sb = 0, saa = 0, sbb = 0, sab = 0;
  const int64_t m = (na < nb) ? na : nb;
  for (int64_t i = 0; i < m; ++i) {
    if ((a[i] < 0) || (b[i] < 0)) continue;
    const double x = a[i], y = b[i];
    n += 1;
    sa += x;
    sb += y;
    saa += x * x;
    sbb += y * y;
    sab += x * y;
  }
  if (n < (double)min_shared) return -1;
  const double cov = sab - sa * sb / n;
  const double va = saa - sa * sa / n;
  const double vb = sbb - sb * sb / n;
  if ((va <= 0) || (vb <= 0)) return -1;
  const double r = cov / std::sqrt(va * vb);
  return r * r;
}

// genotypeCNVs numeric core (cnv.h:140-199): sequential covsum/expcov
// accumulation over the CNV's valid positions, then the chunked SD
// estimate — wsz = winlen/10 consecutive valid positions per chunk, a
// trailing partial chunk discarded, per-chunk CN pushed into a
// boost::accumulators lazy-variance pair (sd = sqrt(sum(x^2)/n -
// mean^2), floored at 0.025; NaN passes through like the reference's
// `if (sd < 0.025)` on a NaN).  cov/expv are the per-position values
// in genome order; winlen <= 1 never reaches here (caller mirrors the
// wsz > 1 gate).
void cnv_gt_core(const double* cov, const double* expv, int64_t winlen,
                 double ploidy, double* cn_out, double* sd_out) {
  double covsum = 0, expcov = 0;
  for (int64_t i = 0; i < winlen; ++i) {
    covsum += cov[i];
    expcov += expv[i];
  }
  double cn = ploidy;
  if (expcov > 0) cn = ploidy * covsum / expcov;
  *cn_out = cn;
  const uint32_t wsz = (uint32_t)(winlen / 10);
  if (wsz > 1) {
    double n = 0, s = 0, ss = 0;
    covsum = 0;
    expcov = 0;
    int32_t wl = 0;
    for (int64_t i = 0; i < winlen; ++i) {
      covsum += cov[i];
      expcov += expv[i];
      ++wl;
      if (wl % wsz == 0) {
        double c = ploidy;
        if (expcov > 0) c = ploidy * covsum / expcov;
        n += 1;
        s += c;
        ss += c * c;
        covsum = 0;
        expcov = 0;
      }
    }
    const double m = s / n;
    double sd = std::sqrt(ss / n - m * m);
    if (sd < 0.025) sd = 0.025;
    *sd_out = sd;
  } else {
    *cn_out = -1;
    *sd_out = 0.025;
  }
}

void delly_free(uint8_t* ptr) { std::free(ptr); }

// ---------------------------------------------------------------------
// Fused isize_mapping_pos (reference tags.h:229-258) over record SoA
// columns: pair orientation from the flag bits, then the
// translocation / intra-chromosomal svt split with the insert-size
// cutoff; -1 marks pairs with no SV signal. One pass instead of the
// ~15 chained numpy temporaries of the vectorized form
// (utils/tags.py::isize_mapping_pos_batch).
void isize_svt_many(const int32_t* flag, const int32_t* tid,
                    const int32_t* pos, const int32_t* mtid,
                    const int32_t* mpos, const int32_t* tlen,
                    int64_t n, double cutoff, int64_t svt_trans,
                    int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const bool f16 = (flag[i] & 16) != 0;
    const bool f32 = (flag[i] & 32) != 0;
    int orient;
    if (!f16)
      orient = !f32 ? 0 : (pos[i] < mpos[i] ? 2 : 3);
    else
      orient = !f32 ? (pos[i] > mpos[i] ? 2 : 3) : 1;
    int64_t r;
    if (tid[i] != mtid[i]) {
      if (orient == 0)
        r = svt_trans;
      else if (orient == 1)
        r = svt_trans + 1;
      else if (tid[i] > mtid[i])
        r = svt_trans + (!f16 ? 2 : 3);
      else
        r = svt_trans + (!f16 ? 3 : 2);
    } else if (pos[i] == mpos[i]) {
      r = -1;
    } else if (orient == 0) {
      r = 0;
    } else if (orient == 1) {
      r = 1;
    } else if (orient == 2) {
      // cutoff is the float maxISizeCutoff (median + 9*MAD) — compare
      // in double; truncating it reclassifies every pair with |tlen|
      // in (floor(cutoff), cutoff) as a DUP-type signal
      r = (cutoff > (double)std::llabs((long long)tlen[i])) ? -1 : 2;
    } else {
      r = (std::llabs((long long)pos[i] - mpos[i]) < 100) ? -1 : 3;
    }
    out[i] = r;
  }
}

// ---------------------------------------------------------------------
// Affine-gap Gotoh DP fill (reference gotoh.h:71-174): given the
// precomputed profile score matrix (align.h:89-111, integer), fills the
// S/H/V matrices with the direct Gotoh recurrence
//   V[r][c] = max(S[r-1][c] + vg_open[c], V[r-1][c] + vg_ext[c])
//   H[r][c] = max(S[r][c-1] + O_r,        H[r][c-1] + E_r)
//   S[r][c] = max(S[r-1][c-1] + score, V[r][c], H[r][c])
// with the AlignConfig end-free boundary costs (align.h:45-73): O/E are
// zero on the first/last row when horizontal_free, vg_open/vg_ext carry
// the per-column vertical analogue. Traceback stays in Python over the
// returned matrices.
void gotoh_core(const int32_t* score, int64_t m, int64_t n,
                const int64_t* vg_open, const int64_t* vg_ext,
                int32_t hfree, int32_t vfree, int64_t go, int64_t ge,
                int64_t* S, int64_t* H, int64_t* V) {
  const int64_t NEG = -1000000;  // -DnaScore.inf (align.h:21)
  const int64_t stride = n + 1;
  const int64_t hrow0 = (hfree ? 0 : 1);
  const int64_t vcol0 = (vfree ? 0 : 1);
  for (int64_t c = 0; c <= n; ++c) {
    S[c] = hrow0 * (go + c * ge);
    H[c] = S[c];
    V[c] = NEG;
  }
  S[0] = 0;
  H[0] = NEG;
  for (int64_t r = 1; r <= m; ++r) {
    S[r * stride] = vcol0 * (go + r * ge);
    V[r * stride] = S[r * stride];
    H[r * stride] = NEG;
  }
  for (int64_t r = 1; r <= m; ++r) {
    const bool row_free = hfree && (r == m);
    const int64_t O = row_free ? 0 : go + ge;
    const int64_t E = row_free ? 0 : ge;
    const int64_t* Sp = S + (r - 1) * stride;
    const int64_t* Vp = V + (r - 1) * stride;
    const int32_t* sc = score + (r - 1) * n;
    int64_t* Sr = S + r * stride;
    int64_t* Hr = H + r * stride;
    int64_t* Vr = V + r * stride;
    int64_t hprev = NEG;
    for (int64_t c = 1; c <= n; ++c) {
      const int64_t v1 = Sp[c] + vg_open[c];
      const int64_t v2 = Vp[c] + vg_ext[c];
      const int64_t v = v1 > v2 ? v1 : v2;
      Vr[c] = v;
      int64_t t = Sp[c - 1] + sc[c - 1];
      if (v > t) t = v;
      const int64_t h1 = Sr[c - 1] + O;
      const int64_t h2 = hprev + E;
      const int64_t h = h1 > h2 ? h1 : h2;
      Hr[c] = h;
      hprev = h;
      Sr[c] = t > h ? t : h;
    }
  }
}

// ---------------------------------------------------------------------
// Batched bit-parallel LCS length (reference msa.h:10-30 "lcs"): the
// CIPR recurrence — V starts all-ones over b's bit positions and, per
// character of a, U = V & M[c]; V = (V + U) | (V - U) with the
// add/sub carry chains rippling across 64-bit words. The LCS length is
// the number of zero bits of V within b's first n positions. Feeds the
// MSA similarity matrix (msa.h:32-44); same flat padded-batch API as
// edist_many.
void lcs_many(const uint8_t* a, const int32_t* alens, int32_t mcap,
              const uint8_t* b, const int32_t* blens, int32_t ncap,
              int64_t nb, int32_t threads, int32_t* out) {
  std::atomic<int64_t> next(0);
  const int32_t wmax = (ncap + 63) / 64;
  auto worker = [&]() {
    std::vector<uint64_t> match((size_t)256 * wmax);
    std::vector<uint64_t> v(wmax);
    std::vector<uint8_t> touched;
    touched.reserve(16);
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= nb) return;
      const uint8_t* ai = a + i * (int64_t)mcap;
      const uint8_t* bi = b + i * (int64_t)ncap;
      int32_t m = alens[i];
      int32_t n = blens[i];
      if (m == 0 || n == 0) { out[i] = 0; continue; }
      const int32_t w = (n + 63) / 64;
      for (uint8_t c : touched)
        std::memset(match.data() + (size_t)c * wmax, 0,
                    (size_t)wmax * 8);
      touched.clear();
      for (int32_t r = 0; r < n; ++r) {
        uint8_t c = bi[r];
        uint64_t* row = match.data() + (size_t)c * wmax;
        bool seen = false;
        for (uint8_t tc : touched) if (tc == c) { seen = true; break; }
        if (!seen) touched.push_back(c);
        row[r >> 6] |= 1ULL << (r & 63);
      }
      for (int32_t wi = 0; wi < w; ++wi) v[wi] = ~0ULL;
      for (int32_t r = 0; r < m; ++r) {
        const uint64_t* mrow = match.data() + (size_t)ai[r] * wmax;
        uint64_t carry = 0, borrow = 0;
        for (int32_t wi = 0; wi < w; ++wi) {
          const uint64_t vw = v[wi];
          const uint64_t u = vw & mrow[wi];
          uint64_t s = vw + u;
          uint64_t c1 = (uint64_t)(s < vw);
          uint64_t s2 = s + carry;
          carry = c1 | (uint64_t)(s2 < s);
          uint64_t d = vw - u;
          uint64_t b1 = (uint64_t)(d > vw);
          uint64_t d2 = d - borrow;
          borrow = b1 | (uint64_t)(d2 > d);
          v[wi] = s2 | d2;
        }
      }
      int32_t zeros = 0;
      for (int32_t wi = 0; wi < w; ++wi) {
        uint64_t word = ~v[wi];
        if (wi == w - 1 && (n & 63))
          word &= (1ULL << (n & 63)) - 1;  // only b's real positions
        zeros += (int32_t)__builtin_popcountll(word);
      }
      out[i] = zeros;
    }
  };
  int nthreads = std::max(1, (int)threads);
  if (nthreads == 1 || nb < 64) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int tix = 0; tix < nthreads; ++tix) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
}

// ---------------------------------------------------------------------
// CNV covfile row rendering (coral.h:296-414 output plane): batch-format
// "chr\tstart\tend\t%g\t%g\t%g\n" rows (logR/CN are "NA" where the
// window is uncallable).  %g here matches Python's format(x, 'g')
// byte-for-byte for finite doubles, inf and nan, so the native path is
// byte-identical to the Python fallback loop.  Returns a malloc'd
// buffer (free with delly_free) and its length via out_len.
uint8_t* cov_rows(const char* chrn, const int64_t* start,
                  const int64_t* end, const double* uniq,
                  const double* logr, const double* cn,
                  const uint8_t* na, int64_t nw, int64_t* out_len) {
  size_t chrlen = std::strlen(chrn);
  size_t cap = (size_t)nw * (chrlen + 64) + 64;
  char* buf = (char*)std::malloc(cap);
  if (!buf) {
    *out_len = -1;
    return nullptr;
  }
  size_t off = 0;
  for (int64_t i = 0; i < nw; ++i) {
    if (cap - off < chrlen + 128) {
      cap = cap * 2 + 256;
      char* nb = (char*)std::realloc(buf, cap);
      if (!nb) {
        std::free(buf);
        *out_len = -1;
        return nullptr;
      }
      buf = nb;
    }
    std::memcpy(buf + off, chrn, chrlen);
    off += chrlen;
    off += (size_t)std::snprintf(buf + off, 64, "\t%lld\t%lld\t",
                                 (long long)start[i],
                                 (long long)end[i]);
    off += (size_t)std::snprintf(buf + off, 32, "%g", uniq[i]);
    if (na[i]) {
      std::memcpy(buf + off, "\tNA\tNA\n", 7);
      off += 7;
    } else {
      buf[off++] = '\t';
      off += (size_t)std::snprintf(buf + off, 32, "%g", logr[i]);
      buf[off++] = '\t';
      off += (size_t)std::snprintf(buf + off, 32, "%g", cn[i]);
      buf[off++] = '\n';
    }
  }
  *out_len = (int64_t)off;
  return (uint8_t*)buf;
}

}  // extern "C"
