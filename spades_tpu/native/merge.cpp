// K-way merge of sorted unique k-mer runs with count summation.
//
// Native-runtime analog of the reference's loser-tree bucket merge
// (/root/reference/src/common/kmer_index/kmer_mph/kmer_index_builder.hpp:346
// MergeKMers: per-bucket sorted runs merged through adt::loser_tree).  The
// TPU pipeline produces sorted deduplicated runs per device tile
// (ops/count.py count_batch_device_tiled); this routine streams them into a
// single sorted unique array, summing multiplicities of k-mers that appear
// in several runs.
//
// Fast path (W <= 2, i.e. k <= 31): rows are packed into uint64 keys so the
// loser tree compares single integers, and the key space is range-partitioned
// across OpenMP threads (each thread merges every run's sub-range for its
// partition independently — the same bucket decomposition the reference uses
// across its counting buckets).  Generic path (W > 2): word-wise loser tree.
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

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

// ---------- generic W loser tree (unchanged semantics) --------------------
int64_t merge_generic(const uint32_t* words, const int64_t* counts,
                      const uint64_t* run_off, int32_t n_runs, int32_t W,
                      uint32_t* out_words, int64_t* out_counts) {
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

    int tree_n = 1;
    while (tree_n < n) tree_n <<= 1;
    auto less = [&](int a, int b) {
        if (a >= n || cur[a].row == nullptr) return false;
        if (b >= n || cur[b].row == nullptr) return true;
        int c = cmp_rows(cur[a].row, cur[b].row, W);
        if (c != 0) return c < 0;
        return a < b;
    };
    cur.resize(tree_n, Cursor{nullptr, nullptr, 0});
    std::vector<int> node(tree_n, 0);
    {
        std::vector<int> winners(2 * tree_n);
        for (int i = 0; i < tree_n; ++i) winners[tree_n + i] = i;
        for (int i = tree_n - 1; i >= 1; --i) {
            int a = winners[2 * i], b = winners[2 * i + 1];
            int w = less(a, b) ? a : b;
            node[i] = (w == a) ? b : a;
            winners[i] = w;
        }
        node[0] = winners[1];
    }
    int winner = node[0];
    auto replay = [&](int leaf) {
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

// ---------- uint64-key fast path (W == 1 or 2) ----------------------------

inline uint64_t key_at(const uint32_t* words, uint64_t i, int W) {
    return W == 2
        ? (uint64_t(words[2 * i]) << 32) | words[2 * i + 1]
        : uint64_t(words[i]);
}

// first index in [lo, hi) of `run` whose key >= bound
uint64_t lower_bound_key(const uint32_t* words, uint64_t lo, uint64_t hi,
                         int W, uint64_t bound) {
    while (lo < hi) {
        uint64_t mid = lo + (hi - lo) / 2;
        if (key_at(words, mid, W) < bound)
            lo = mid + 1;
        else
            hi = mid;
    }
    return lo;
}

// Merge each run's [seg_lo[r], seg_hi[r]) rows; writes unique keys + counts.
// Returns number of unique rows written.
int64_t merge_segment_u64(const uint32_t* words, const int64_t* counts,
                          const uint64_t* seg_lo, const uint64_t* seg_hi,
                          int n_runs, int W,
                          uint32_t* out_words, int64_t* out_counts) {
    struct C64 {
        uint64_t key;
        uint64_t pos;   // absolute row index
        uint64_t end;
    };
    std::vector<C64> cur;
    cur.reserve(n_runs);
    for (int r = 0; r < n_runs; ++r) {
        if (seg_lo[r] < seg_hi[r])
            cur.push_back(C64{key_at(words, seg_lo[r], W), seg_lo[r], seg_hi[r]});
    }
    const int n = static_cast<int>(cur.size());
    if (n == 0) return 0;

    int64_t out_n = 0;
    uint32_t* ow = out_words;

    if (n == 1) {
        // single live run: memcpy rows, copy counts (already unique)
        uint64_t len = cur[0].end - cur[0].pos;
        std::memcpy(ow, words + cur[0].pos * W, sizeof(uint32_t) * W * len);
        std::memcpy(out_counts, counts + cur[0].pos, sizeof(int64_t) * len);
        return int64_t(len);
    }

    int tree_n = 1;
    while (tree_n < n) tree_n <<= 1;
    // keys[i] for exhausted/padded leaves = UINT64_MAX with live flag false
    std::vector<uint64_t> keys(tree_n, UINT64_MAX);
    std::vector<uint8_t> live(tree_n, 0);
    for (int i = 0; i < n; ++i) {
        keys[i] = cur[i].key;
        live[i] = 1;
    }
    cur.resize(tree_n, C64{UINT64_MAX, 0, 0});
    auto less = [&](int a, int b) {
        if (!live[a]) return false;
        if (!live[b]) return true;
        if (keys[a] != keys[b]) return keys[a] < keys[b];
        return a < b;
    };
    std::vector<int> node(tree_n, 0);
    {
        std::vector<int> winners(2 * tree_n);
        for (int i = 0; i < tree_n; ++i) winners[tree_n + i] = i;
        for (int i = tree_n - 1; i >= 1; --i) {
            int a = winners[2 * i], b = winners[2 * i + 1];
            int w = less(a, b) ? a : b;
            node[i] = (w == a) ? b : a;
            winners[i] = w;
        }
        node[0] = winners[1];
    }
    int winner = node[0];

    uint64_t cur_key = 0;
    int64_t acc = 0;
    bool have_current = false;

    while (live[winner]) {
        uint64_t k = keys[winner];
        C64& c = cur[winner];
        if (have_current && k == cur_key) {
            acc += counts[c.pos];
        } else {
            if (have_current) {
                if (W == 2) {
                    ow[0] = uint32_t(cur_key >> 32);
                    ow[1] = uint32_t(cur_key);
                } else {
                    ow[0] = uint32_t(cur_key);
                }
                ow += W;
                out_counts[out_n++] = acc;
            }
            cur_key = k;
            acc = counts[c.pos];
            have_current = true;
        }
        if (++c.pos == c.end) {
            live[winner] = 0;
            keys[winner] = UINT64_MAX;
        } else {
            keys[winner] = key_at(words, c.pos, W);
        }
        // replay path to the root
        int w = winner;
        for (int i = (tree_n + winner) >> 1; i >= 1; i >>= 1) {
            if (less(node[i], w)) {
                int t = node[i];
                node[i] = w;
                w = t;
            }
        }
        winner = w;
    }
    if (have_current) {
        if (W == 2) {
            ow[0] = uint32_t(cur_key >> 32);
            ow[1] = uint32_t(cur_key);
        } else {
            ow[0] = uint32_t(cur_key);
        }
        out_counts[out_n++] = acc;
    }
    return out_n;
}

int64_t merge_u64(const uint32_t* words, const int64_t* counts,
                  const uint64_t* run_off, int32_t n_runs, int32_t W,
                  uint32_t* out_words, int64_t* out_counts) {
    int n_threads = 1;
#ifdef _OPENMP
    n_threads = omp_get_max_threads();
#endif
    uint64_t total = run_off[n_runs];
    if (n_threads <= 1 || total < (1u << 16)) {
        std::vector<uint64_t> lo(n_runs), hi(n_runs);
        for (int r = 0; r < n_runs; ++r) {
            lo[r] = run_off[r];
            hi[r] = run_off[r + 1];
        }
        return merge_segment_u64(words, counts, lo.data(), hi.data(), n_runs,
                                 W, out_words, out_counts);
    }

    // Range-partition the key space: splitters sampled from the largest run,
    // then every run is cut by binary search.  Equal keys stay together, so
    // dedup within partitions is complete.
    const int P = n_threads;
    int big = 0;
    for (int r = 0; r < n_runs; ++r)
        if (run_off[r + 1] - run_off[r] > run_off[big + 1] - run_off[big]) big = r;
    std::vector<uint64_t> splitters(P - 1);
    uint64_t blo = run_off[big], bhi = run_off[big + 1];
    for (int p = 1; p < P; ++p) {
        uint64_t idx = blo + (bhi - blo) * p / P;
        splitters[p - 1] = key_at(words, idx, W);
    }

    // seg[p][r] = start row of run r in partition p
    std::vector<std::vector<uint64_t>> seg(P + 1, std::vector<uint64_t>(n_runs));
    for (int r = 0; r < n_runs; ++r) {
        seg[0][r] = run_off[r];
        seg[P][r] = run_off[r + 1];
        for (int p = 1; p < P; ++p)
            seg[p][r] = lower_bound_key(words, run_off[r], run_off[r + 1], W,
                                        splitters[p - 1]);
    }

    std::vector<int64_t> part_n(P, 0);
    std::vector<uint64_t> part_cap(P, 0), part_off(P + 1, 0);
    for (int p = 0; p < P; ++p) {
        uint64_t cap = 0;
        for (int r = 0; r < n_runs; ++r) cap += seg[p + 1][r] - seg[p][r];
        part_cap[p] = cap;
        part_off[p + 1] = part_off[p] + cap;
    }

    // merge partitions in parallel into slack regions of the output buffers
    std::vector<std::vector<uint32_t>> tmp_w(P);
    std::vector<std::vector<int64_t>> tmp_c(P);
#ifdef _OPENMP
#pragma omp parallel for schedule(static, 1)
#endif
    for (int p = 0; p < P; ++p) {
        if (p == 0) {
            // partition 0 writes straight into the head of the output
            part_n[0] = merge_segment_u64(words, counts, seg[0].data(),
                                          seg[1].data(), n_runs, W,
                                          out_words, out_counts);
        } else {
            tmp_w[p].resize(part_cap[p] * W);
            tmp_c[p].resize(part_cap[p]);
            part_n[p] = merge_segment_u64(words, counts, seg[p].data(),
                                          seg[p + 1].data(), n_runs, W,
                                          tmp_w[p].data(), tmp_c[p].data());
        }
    }

    int64_t out_n = part_n[0];
    for (int p = 1; p < P; ++p) {
        std::memcpy(out_words + out_n * W, tmp_w[p].data(),
                    sizeof(uint32_t) * W * part_n[p]);
        std::memcpy(out_counts + out_n, tmp_c[p].data(),
                    sizeof(int64_t) * part_n[p]);
        out_n += part_n[p];
    }
    return out_n;
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
    for (int32_t r = 0; r < n_runs; ++r)
        if (run_off[r + 1] < run_off[r]) return -1;
    if (n_runs == 0) return 0;
    if (W <= 2)
        return merge_u64(words, counts, run_off, n_runs, W, out_words,
                         out_counts);
    return merge_generic(words, counts, run_off, n_runs, W, out_words,
                         out_counts);
}

}  // extern "C"
