// Differential-oracle probe #2: drives the REFERENCE pairwise/MSA DP
// stack (/root/reference/src/{align,gotoh,needle,msa}.h, included
// as-is) over a line protocol so the repo's from-scratch equivalents
// (delly_tpu/ops/{gotoh,needle,msa}.py) can be fuzzed against the real
// reference code actually executing.  boost containers are supplied by
// the exact-semantics shims in tests/boost_shim/ (the reference uses
// boost only as a container library here).
//
// stdin, one case per line (sequences are plain tokens, "." = empty):
//   GOTOH      <H> <V> <m> <mm> <go> <ge> <s1> <s2>
//   GOTOHSCORE <H> <V> <m> <mm> <go> <ge> <s1> <s2>
//   NEEDLE     <H> <V> <m> <mm> <ge> <s1> <s2>
//   LONGNEEDLE <H> <V> <m> <mm> <ge> <s1> <s2>
//   LONGHOM    <thr> <s1> <s2>
//   MSA        <minclq> <m> <mm> <go> <ge> <n> <seq1> ... <seqn>
//
// stdout, one line per case:
//   GOTOH/NEEDLE: <score> <row1> <row2>
//   GOTOHSCORE/LONGHOM: <int>
//   LONGNEEDLE: "0"  or  "1 <row1> <row2>"
//   MSA: <support> <consensus|.>
#include <cstdint>
#include <cstdio>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

// msa.h's outputConsensus (never instantiated here) dereferences a
// bam_hdr_t*; provide the single member it names so the reference
// header parses without htslib.
struct bam_hdr_t {
  char** target_name;
};

#include <cctype>

namespace torali {
// needle.h calls reverseComplement (defined in the reference's util.h,
// which needs htslib).  Reproduce util.h:549-563's exact semantics:
// position i receives the complement of toupper(seq[n-1-i]) when that
// is A/C/G/T/N; for any other character the ORIGINAL seq[i] stays.
inline void reverseComplement(std::string& sequence) {
  std::string rev(sequence.rbegin(), sequence.rend());
  for (std::size_t i = 0; i < rev.size(); ++i) {
    switch (std::toupper((unsigned char)rev[i])) {
      case 'A': sequence[i] = 'T'; break;
      case 'C': sequence[i] = 'G'; break;
      case 'G': sequence[i] = 'C'; break;
      case 'T': sequence[i] = 'A'; break;
      case 'N': sequence[i] = 'N'; break;
      default: break;
    }
  }
}
}  // namespace torali

#include "align.h"
#include "gotoh.h"
#include "msa.h"
#include "needle.h"

using namespace torali;

typedef boost::multi_array<char, 2> TAlign;

struct Cfg {
  int32_t minCliqueSize;
  DnaScore<int> aliscore;
};

static std::string seqArg(std::string const& tok) {
  return tok == "." ? std::string() : tok;
}

static void printAlign(TAlign const& a) {
  for (std::size_t i = 0; i < a.shape()[0]; ++i) {
    std::string row(a.shape()[1], '-');
    for (std::size_t j = 0; j < a.shape()[1]; ++j) row[j] = a[i][j];
    std::cout << ' ' << (row.empty() ? "." : row);
  }
}

template <typename TFunc>
static void withConfig(int h, int v, TFunc&& f) {
  if (h && v) f(AlignConfig<true, true>());
  else if (h) f(AlignConfig<true, false>());
  else if (v) f(AlignConfig<false, true>());
  else f(AlignConfig<false, false>());
}

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream ss(line);
    std::string op;
    ss >> op;
    if (op == "GOTOH" || op == "GOTOHSCORE" || op == "NEEDLE") {
      int h, v, m, mm, go = 0, ge;
      std::string t1, t2;
      ss >> h >> v >> m >> mm;
      if (op != "NEEDLE") ss >> go;
      ss >> ge >> t1 >> t2;
      std::string s1 = seqArg(t1), s2 = seqArg(t2);
      DnaScore<int> sc(m, mm, go, ge);
      withConfig(h, v, [&](auto ac) {
        if (op == "GOTOHSCORE") {
          std::cout << gotohScore(s1, s2, ac, sc) << '\n';
        } else {
          TAlign align;
          int score = (op == "GOTOH") ? gotoh(s1, s2, align, ac, sc)
                                      : needle(s1, s2, align, ac, sc);
          std::cout << score;
          printAlign(align);
          std::cout << '\n';
        }
      });
    } else if (op == "LONGNEEDLE") {
      int h, v, m, mm, ge;
      std::string t1, t2;
      ss >> h >> v >> m >> mm >> ge >> t1 >> t2;
      std::string s1 = seqArg(t1), s2 = seqArg(t2);
      DnaScore<int> sc(m, mm, 0, ge);
      withConfig(h, v, [&](auto ac) {
        TAlign align;
        if (longNeedle(s1, s2, align, ac, sc)) {
          std::cout << 1;
          printAlign(align);
          std::cout << '\n';
        } else {
          std::cout << 0 << '\n';
        }
      });
    } else if (op == "LONGHOM") {
      int thr;
      std::string t1, t2;
      ss >> thr >> t1 >> t2;
      std::cout << longestHomology(seqArg(t1), seqArg(t2), thr) << '\n';
    } else if (op == "MSA") {
      Cfg c;
      int m, mm, go, ge, n;
      ss >> c.minCliqueSize >> m >> mm >> go >> ge >> n;
      c.aliscore = DnaScore<int>(m, mm, go, ge);
      std::vector<std::string> sps(n);
      for (int i = 0; i < n; ++i) {
        ss >> sps[i];
        sps[i] = seqArg(sps[i]);
      }
      std::string cs;
      int support = msa(c, sps, cs);
      std::cout << support << ' ' << (cs.empty() ? "." : cs) << '\n';
    }
    std::cout.flush();
  }
  return 0;
}
