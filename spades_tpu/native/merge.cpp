// K-way merge of sorted unique k-mer runs with count summation.
//
// Native-runtime analog of the reference's loser-tree bucket merge
// (/root/reference/src/common/kmer_index/kmer_mph/kmer_index_builder.hpp:346
// MergeKMers: per-bucket sorted runs merged through adt::loser_tree).  The
// TPU pipeline produces sorted deduplicated runs per device tile
// (ops/count.py count_batch_device_tiled); this routine streams them into a
// single sorted unique array, summing multiplicities of k-mers that appear
// in several runs.  O(total * log n_runs) with a classic tournament
// (loser) tree; rows are W big-endian uint32 words so plain word-wise
// comparison is lexicographic sequence order.
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Cursor {
    const uint32_t* row;   // current row (W words), nullptr when exhausted
    const int64_t* cnt;    // current count
    uint64_t remaining;    // rows left in this run (including current)
};

inline int cmp_rows(const uint32_t* a, const uint32_t* b, int W) {
    for (int w = 0; w < W; ++w) {
        if (a[w] != b[w]) return a[w] < b[w] ? -1 : 1;
    }
    return 0;
}

}  // namespace

extern "C" {

// words:    concatenated run rows, total_rows x W uint32 (row-major)
// counts:   per-row multiplicities, total_rows int64
// run_off:  n_runs+1 row offsets delimiting runs; each run sorted, unique
// out_words/out_counts: caller-allocated, capacity total_rows
// returns the number of unique merged rows (<= total_rows), or -1 on error.
int64_t stbr_merge_runs(const uint32_t* words, const int64_t* counts,
                        const uint64_t* run_off, int32_t n_runs, int32_t W,
                        uint32_t* out_words, int64_t* out_counts) {
    if (n_runs < 0 || W <= 0) return -1;
    std::vector<Cursor> cur;
    cur.reserve(n_runs);
    for (int32_t r = 0; r < n_runs; ++r) {
        uint64_t lo = run_off[r], hi = run_off[r + 1];
        if (hi < lo) return -1;
        if (hi == lo) continue;
        cur.push_back(Cursor{words + lo * W, counts + lo, hi - lo});
    }
    const int n = static_cast<int>(cur.size());
    if (n == 0) return 0;

    // Tournament tree over n leaves: internal nodes hold the *loser* of the
    // match, `winner` the overall minimum.  Exhausted cursors compare as
    // +infinity (row == nullptr).
    int tree_n = 1;
    while (tree_n < n) tree_n <<= 1;
    auto less = [&](int a, int b) {
        // true when cursor a's current row < cursor b's
        if (a >= n || cur[a].row == nullptr) return false;
        if (b >= n || cur[b].row == nullptr) return true;
        int c = cmp_rows(cur[a].row, cur[b].row, W);
        if (c != 0) return c < 0;
        return a < b;  // deterministic tie-break (equal rows merge anyway)
    };
    cur.resize(tree_n, Cursor{nullptr, nullptr, 0});  // pad with exhausted leaves
    std::vector<int> node(tree_n, 0);  // node[1..tree_n-1]: loser of the match
    {
        // bottom-up tournament build with a temporary winners array
        std::vector<int> winners(2 * tree_n);
        for (int i = 0; i < tree_n; ++i) winners[tree_n + i] = i;
        for (int i = tree_n - 1; i >= 1; --i) {
            int a = winners[2 * i], b = winners[2 * i + 1];
            int w = less(a, b) ? a : b;
            node[i] = (w == a) ? b : a;  // loser stays in the node
            winners[i] = w;
        }
        node[0] = winners[1];  // overall winner parked in node[0]
    }
    int winner = node[0];
    auto replay = [&](int leaf) {
        // after advancing `leaf`, replay its path: the path holds exactly the
        // losers it previously beat, so matches against them re-decide the min
        int w = leaf;
        for (int i = (tree_n + leaf) >> 1; i >= 1; i >>= 1) {
            if (less(node[i], w)) {
                int t = node[i];
                node[i] = w;
                w = t;
            }
        }
        return w;
    };

    int64_t out_n = 0;
    uint32_t* ow = out_words;
    int64_t acc = 0;
    bool have_current = false;
    std::vector<uint32_t> current(W);

    while (winner < n && cur[winner].row != nullptr) {
        const uint32_t* row = cur[winner].row;
        if (have_current && cmp_rows(current.data(), row, W) == 0) {
            acc += *cur[winner].cnt;
        } else {
            if (have_current) {
                std::memcpy(ow, current.data(), sizeof(uint32_t) * W);
                ow += W;
                out_counts[out_n++] = acc;
            }
            std::memcpy(current.data(), row, sizeof(uint32_t) * W);
            acc = *cur[winner].cnt;
            have_current = true;
        }
        // advance winner's cursor
        Cursor& c = cur[winner];
        if (--c.remaining == 0) {
            c.row = nullptr;
            c.cnt = nullptr;
        } else {
            c.row += W;
            c.cnt += 1;
        }
        winner = replay(winner);
    }
    if (have_current) {
        std::memcpy(ow, current.data(), sizeof(uint32_t) * W);
        out_counts[out_n++] = acc;
    }
    return out_n;
}

}  // extern "C"
