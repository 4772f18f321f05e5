// Single-thread CPU baseline for the genotyping realignment hot loop:
// infix (HW) edit distance of each query (breakpoint probe) against each
// target (read window). This is an original implementation of the textbook
// banded-free DP, compiled -O3, used only as the bench.py reference point
// (the role the single-threaded C++ aligner plays in the reference tool).
//
// Usage: baseline_edist <B> <M> <N> <iters>
// Reads B*(M+N) bytes of sequence data from stdin, runs iters sweeps over
// the batch, prints pairs-per-second to stdout.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

static int edist_hw(const uint8_t* q, int m, const uint8_t* t, int n,
                    int* prev, int* cur) {
  for (int j = 0; j <= n; ++j) prev[j] = 0;  // free target prefix
  for (int i = 1; i <= m; ++i) {
    cur[0] = i;
    const uint8_t qc = q[i - 1];
    for (int j = 1; j <= n; ++j) {
      int d = prev[j - 1] + (qc != t[j - 1]);
      int u = prev[j] + 1;
      int l = cur[j - 1] + 1;
      int best = d < u ? d : u;
      cur[j] = best < l ? best : l;
    }
    int* tmp = prev;
    prev = cur;
    cur = tmp;
  }
  int best = prev[0];
  for (int j = 1; j <= n; ++j)
    if (prev[j] < best) best = prev[j];
  return best;
}

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr, "usage: %s B M N iters\n", argv[0]);
    return 1;
  }
  int B = std::atoi(argv[1]);
  int M = std::atoi(argv[2]);
  int N = std::atoi(argv[3]);
  int iters = std::atoi(argv[4]);
  std::vector<uint8_t> qbuf((size_t)B * M), tbuf((size_t)B * N);
  if (std::fread(qbuf.data(), 1, qbuf.size(), stdin) != qbuf.size()) return 2;
  if (std::fread(tbuf.data(), 1, tbuf.size(), stdin) != tbuf.size()) return 2;
  std::vector<int> prev(N + 1), cur(N + 1);
  volatile long long sink = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < iters; ++it) {
    for (int b = 0; b < B; ++b) {
      sink += edist_hw(qbuf.data() + (size_t)b * M, M,
                       tbuf.data() + (size_t)b * N, N, prev.data(),
                       cur.data());
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  std::printf("%.3f\n", (double)B * iters / secs);
  return (int)(sink == -1);
}
