// Differential-oracle probe: drives the REFERENCE edlib implementation
// (/root/reference/src/edlib.cpp, compiled as-is) over a line protocol
// so the repo's from-scratch edit-distance/alignment plane
// (delly_tpu/ops/edist.py + native edist_scan/edist_path_banded) can be
// fuzzed against the real reference code actually executing.
//
// stdin, one case per line:
//   <mode> <task> <k> <qhex> <thex> <eqhex>
// mode: 0=NW 1=SHW 2=HW; task: 0=DISTANCE 1=LOC 2=PATH; k: int
// qhex/thex: hex-encoded bytes ("-" for empty)
// eqhex: hex-encoded byte pairs for additionalEqualities ("-" for none)
//
// stdout, one line per case:
//   <status> <dist> <ends|-> <starts|-> <alnhex|->
// ends/starts are comma-separated ints in edlib's own order.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "edlib.h"

static std::vector<char> unhex(const std::string& s) {
    std::vector<char> out;
    if (s == "-") return out;
    for (size_t i = 0; i + 1 < s.size(); i += 2) {
        auto nib = [](char c) -> int {
            if (c >= '0' && c <= '9') return c - '0';
            if (c >= 'a' && c <= 'f') return c - 'a' + 10;
            return c - 'A' + 10;
        };
        out.push_back(static_cast<char>((nib(s[i]) << 4) | nib(s[i + 1])));
    }
    return out;
}

int main() {
    char line[1 << 20];
    while (std::fgets(line, sizeof(line), stdin)) {
        int mode, task;
        long k;
        char qh[1 << 18], th[1 << 18], eh[4096];
        if (std::sscanf(line, "%d %d %ld %s %s %s", &mode, &task, &k,
                        qh, th, eh) != 6)
            continue;
        std::vector<char> q = unhex(qh), t = unhex(th), e = unhex(eh);
        std::vector<EdlibEqualityPair> pairs;
        for (size_t i = 0; i + 1 < e.size(); i += 2)
            pairs.push_back({e[i], e[i + 1]});
        EdlibAlignConfig cfg = edlibNewAlignConfig(
            static_cast<int>(k),
            mode == 0 ? EDLIB_MODE_NW
                      : (mode == 1 ? EDLIB_MODE_SHW : EDLIB_MODE_HW),
            task == 0 ? EDLIB_TASK_DISTANCE
                      : (task == 1 ? EDLIB_TASK_LOC : EDLIB_TASK_PATH),
            pairs.empty() ? nullptr : pairs.data(),
            static_cast<int>(pairs.size()));
        EdlibAlignResult r = edlibAlign(q.data(),
                                        static_cast<int>(q.size()),
                                        t.data(),
                                        static_cast<int>(t.size()), cfg);
        std::printf("%d %d ", r.status, r.editDistance);
        if (r.endLocations && r.numLocations > 0) {
            for (int i = 0; i < r.numLocations; ++i)
                std::printf("%s%d", i ? "," : "", r.endLocations[i]);
        } else {
            std::printf("-");
        }
        std::printf(" ");
        if (r.startLocations && r.numLocations > 0) {
            for (int i = 0; i < r.numLocations; ++i)
                std::printf("%s%d", i ? "," : "", r.startLocations[i]);
        } else {
            std::printf("-");
        }
        std::printf(" ");
        if (r.alignment && r.alignmentLength > 0) {
            for (int i = 0; i < r.alignmentLength; ++i)
                std::printf("%02x", r.alignment[i]);
        } else {
            std::printf("-");
        }
        std::printf("\n");
        edlibFreeAlignResult(r);
    }
    std::fflush(stdout);
    return 0;
}
