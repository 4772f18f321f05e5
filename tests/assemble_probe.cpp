// Differential-oracle probe #4: drives the REFERENCE consensus
// assembly engine (/root/reference/src/assemble.h, included as-is with
// the DP stack and edlib.cpp) so the repo's from-scratch
// delly_tpu/models/assemble.py can be fuzzed against the real
// reference code actually executing: msaEdlib (all-pairs NW ->
// centroid seed -> worst-20% drop -> incremental IUPAC-consensus
// alignment -> coverage consensus -> 5% trim, assemble.h:385-473) and
// msaWfa (7-mer tables + best-diagonal overlap layout -> superstring
// building -> HW re-alignment -> consensus -> prefix/suffix trim,
// assemble.h:501-728), plus the k-mer diagonal primitive.
//
// stdin, one case per line (seqs are plain tokens, "." = empty):
//   MSAEDLIB <minclq> <n> <seq1> ... <seqn>
//   MSAWFA   <minclq> <prefix|.> <suffix|.> <n> <seq1> ... <seqn>
//   KMERDIAG <s1> <s2>
// stdout, one line per case:
//   MSAEDLIB/MSAWFA: <support> <consensus|.>
//   KMERDIAG: <bestDiagonal>
#include <iostream>
#include <sstream>

#include "probe_common.hpp"

namespace torali {
// util.h:501-542 read hashes, named in the uninstantiated driver.
std::size_t hash_lr(bam1_t*);
std::size_t hash_sr(bam1_t*);
std::size_t hash_pair(bam1_t*);
std::size_t hash_pair_mate(bam1_t*);
}  // namespace torali

#include "assemble.h"

using namespace torali;

struct Cfg {
  int32_t minCliqueSize;
};

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op == "MSAEDLIB" || op == "MSAWFA") {
      Cfg c;
      int n;
      std::string prefix, suffix;
      ss >> c.minCliqueSize;
      if (op == "MSAWFA") {
        ss >> prefix >> suffix;
        if (prefix == ".") prefix = "";
        if (suffix == ".") suffix = "";
      }
      ss >> n;
      std::vector<std::string> sps(n);
      for (int i = 0; i < n; ++i) {
        ss >> sps[i];
        if (sps[i] == ".") sps[i] = "";
      }
      std::string cs;
      int support = (op == "MSAEDLIB")
                        ? msaEdlib(c, sps, cs)
                        : msaWfa(c, sps, cs, prefix, suffix);
      std::cout << support << ' ' << (cs.empty() ? "." : cs) << '\n';
    } else if (op == "KMERDIAG") {
      std::string s1, s2;
      ss >> s1 >> s2;
      std::vector<uint32_t> k1, k2;
      fillKmerTable(s1, k1);
      fillKmerTable(s2, k2);
      std::cout << bestDiagonal(k1, k2, s1.size(), s2.size()) << '\n';
    }
    std::cout.flush();
  }
  return 0;
}
