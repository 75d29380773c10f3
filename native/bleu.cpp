// Fast BLEU scorer — host-side native component.
//
// Capability equivalent of fairseq's libbleu (ref:
// fairseq/fairseq/clib/libbleu/libbleu.cpp — C++ n-gram counting behind a
// ctypes interface).  Independent implementation: hashes 1..4-gram counts
// of reference and hypothesis id sequences and accumulates clipped
// matches + totals for corpus-level BLEU.
//
// Build: g++ -O3 -shared -fPIC bleu.cpp -o libbleu_tpu.so

#include <cstdint>
#include <cstring>
#include <unordered_map>

namespace {

struct NgramKey {
    uint64_t h;
    bool operator==(const NgramKey& o) const { return h == o.h; }
};

struct NgramKeyHash {
    size_t operator()(const NgramKey& k) const { return (size_t)k.h; }
};

inline uint64_t hash_ngram(const int32_t* toks, int n) {
    // FNV-1a over the token bytes, order-sensitive
    uint64_t h = 1469598103934665603ull;
    for (int i = 0; i < n; ++i) {
        uint64_t v = (uint64_t)(uint32_t)toks[i];
        for (int b = 0; b < 4; ++b) {
            h ^= (v >> (8 * b)) & 0xFF;
            h *= 1099511628211ull;
        }
    }
    return h;
}

using Counts = std::unordered_map<NgramKey, int64_t, NgramKeyHash>;

void count_ngrams(const int32_t* toks, int len, int n, Counts& out) {
    for (int i = 0; i + n <= len; ++i)
        out[NgramKey{hash_ngram(toks + i, n)}] += 1;
}

}  // namespace

extern "C" {

struct BleuStat {
    int64_t reflen;
    int64_t predlen;
    int64_t match[4];
    int64_t count[4];
};

void bleu_zero_init(BleuStat* stat) { memset(stat, 0, sizeof(BleuStat)); }

// Accumulate one sentence pair into the corpus stats.
void bleu_add(BleuStat* stat, const int32_t* ref, int ref_len,
              const int32_t* pred, int pred_len) {
    stat->reflen += ref_len;
    stat->predlen += pred_len;
    for (int n = 1; n <= 4; ++n) {
        Counts ref_counts, pred_counts;
        count_ngrams(ref, ref_len, n, ref_counts);
        count_ngrams(pred, pred_len, n, pred_counts);
        int64_t match = 0, total = 0;
        for (auto& kv : pred_counts) {
            total += kv.second;
            auto it = ref_counts.find(kv.first);
            if (it != ref_counts.end())
                match += kv.second < it->second ? kv.second : it->second;
        }
        stat->match[n - 1] += match;
        stat->count[n - 1] += total;
    }
}

}  // extern "C"
