// Levenshtein edit-distance ops — host-side native component.
//
// Capability equivalent of fairseq's libnat / libnat_cuda (ref:
// fairseq/clib/libnat/edit_dist.cpp — edit distance + alignment used by
// non-autoregressive translation training).  Independent implementation:
// classic DP with backtrace, batch entry point over padded id arrays.
//
// Build: g++ -O3 -shared -fPIC edit_distance.cpp -o libeditdist.so

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Plain edit distance between two id sequences.
int64_t edit_distance(const int32_t* a, int64_t la, const int32_t* b, int64_t lb) {
    std::vector<int64_t> prev(lb + 1), cur(lb + 1);
    for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
    for (int64_t i = 1; i <= la; ++i) {
        cur[0] = i;
        for (int64_t j = 1; j <= lb; ++j) {
            int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0);
            cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
        }
        std::swap(prev, cur);
    }
    return prev[lb];
}

// Batched: sequences padded with pad_id; distances written to out (n,).
void edit_distance_batch(const int32_t* a, const int32_t* b, int64_t n,
                         int64_t max_a, int64_t max_b, int32_t pad_id,
                         int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* ai = a + i * max_a;
        const int32_t* bi = b + i * max_b;
        int64_t la = 0, lb = 0;
        while (la < max_a && ai[la] != pad_id) ++la;
        while (lb < max_b && bi[lb] != pad_id) ++lb;
        out[i] = edit_distance(ai, la, bi, lb);
    }
}

// Alignment ops: for each position of `b`, the matched position in `a`
// under an optimal alignment (-1 for insertions), the libnat
// suggested-ops building block.  ops buffer must hold lb entries.
void edit_alignment(const int32_t* a, int64_t la, const int32_t* b, int64_t lb,
                    int32_t* ops) {
    std::vector<std::vector<int64_t>> d(la + 1, std::vector<int64_t>(lb + 1));
    for (int64_t i = 0; i <= la; ++i) d[i][0] = i;
    for (int64_t j = 0; j <= lb; ++j) d[0][j] = j;
    for (int64_t i = 1; i <= la; ++i)
        for (int64_t j = 1; j <= lb; ++j)
            d[i][j] = std::min({d[i - 1][j] + 1, d[i][j - 1] + 1,
                                d[i - 1][j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0)});
    // backtrace
    int64_t i = la, j = lb;
    while (j > 0) {
        if (i > 0 && d[i][j] == d[i - 1][j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0)) {
            ops[j - 1] = (int32_t)(i - 1);
            --i; --j;
        } else if (i > 0 && d[i][j] == d[i - 1][j] + 1) {
            --i;  // deletion from a
        } else {
            ops[j - 1] = -1;  // insertion into b
            --j;
        }
    }
}

}  // extern "C"
