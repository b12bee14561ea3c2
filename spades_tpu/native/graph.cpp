// Native graph-construction engine: extension-index build + condensation.
//
// Role mirror of the reference's construction phase
// (/root/reference/src/common/kmer_index/extension_index/
//  kmer_extension_index_builder.hpp:83-108 BuildExtensionIndexFromKPOMers and
//  /root/reference/src/common/assembly_graph/construction/
//  debruijn_graph_constructor.hpp:184-574 UnbranchingPathExtractor +
//  FastGraphFromSequencesConstructor), re-designed for this framework's
// flat-array graph: the (k+1)-mer table is radix-sorted once into the k-mer
// node table WITH per-row inverse indices, so condensation afterwards places
// every arc by direct arithmetic (node_arc_start + popcount) — zero hash or
// binary-search lookups — and extracts unbranching chains with O(A) sequential
// walks instead of O(A log A) pointer-doubling gathers (the right trade on the
// host; the device path in ops/condense.py keeps the log-depth formulation).
//
// Layout contract (core/kmers.py): a k-mer is W = ceil(k/16) uint32 words,
// big-endian — base 0 in the top 2 bits of word 0; unused low bits zero.
// Lexicographic row order == word-wise unsigned comparison.
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int MAXW = 8;  // supports k <= 128

inline uint32_t base_at(const uint32_t* row, int j) {
    return (row[j >> 4] >> (30 - 2 * (j & 15))) & 3u;
}

inline void set_base(uint32_t* row, int j, uint32_t c) {
    row[j >> 4] |= c << (30 - 2 * (j & 15));
}

// reverse 2-bit fields within one 32-bit word
inline uint32_t rev2(uint32_t x) {
    x = ((x >> 2) & 0x33333333u) | ((x & 0x33333333u) << 2);
    x = ((x >> 4) & 0x0F0F0F0Fu) | ((x & 0x0F0F0F0Fu) << 4);
    x = ((x >> 8) & 0x00FF00FFu) | ((x & 0x00FF00FFu) << 8);
    return (x >> 16) | (x << 16);
}

// reverse complement of a packed row (k bases, W words)
inline void revcomp_row(const uint32_t* in, uint32_t* out, int W, int k) {
    uint32_t tmp[MAXW];
    for (int w = 0; w < W; ++w) tmp[w] = rev2(~in[W - 1 - w]);
    int pad = 32 * W - 2 * k;  // realign: result sits in the LOW 2k bits
    if (pad) {
        for (int w = 0; w < W; ++w) {
            uint32_t hi = tmp[w] << pad;
            uint32_t lo = (w + 1 < W) ? (tmp[w + 1] >> (32 - pad)) : 0u;
            out[w] = hi | lo;
        }
    } else {
        for (int w = 0; w < W; ++w) out[w] = tmp[w];
    }
}

inline int cmp_rows(const uint32_t* a, const uint32_t* b, int W) {
    for (int w = 0; w < W; ++w)
        if (a[w] != b[w]) return a[w] < b[w] ? -1 : 1;
    return 0;
}

// prefix k-mer of a (k+1)-mer: first k bases (drop base k, zero the tail)
inline void prefix_row(const uint32_t* p1, uint32_t* out, int W, int k) {
    for (int w = 0; w < W; ++w) out[w] = p1[w];
    int used_last = k - 16 * (W - 1);
    if (used_last < 16) out[W - 1] &= 0xFFFFFFFFu << (32 - 2 * used_last);
}

// suffix k-mer of a (k+1)-mer: last k bases (shift whole register left 2 bits)
inline void suffix_row(const uint32_t* p1, uint32_t* out, int W, int W1, int k) {
    uint32_t sh[MAXW + 1];
    for (int w = 0; w < W1; ++w) {
        sh[w] = (p1[w] << 2) | ((w + 1 < W1) ? (p1[w + 1] >> 30) : 0u);
    }
    for (int w = 0; w < W; ++w) out[w] = sh[w];
    int used_last = k - 16 * (W - 1);
    if (used_last < 16) out[W - 1] &= 0xFFFFFFFFu << (32 - 2 * used_last);
}

// canonicalize: out = min(row, revcomp(row)); returns 1 if revcomp chosen
inline int canon_row(const uint32_t* in, uint32_t* out, int W, int k) {
    uint32_t rc[MAXW];
    revcomp_row(in, rc, W, k);
    if (cmp_rows(rc, in, W) < 0) {
        for (int w = 0; w < W; ++w) out[w] = rc[w];
        return 1;
    }
    for (int w = 0; w < W; ++w) out[w] = in[w];
    return 0;
}

inline int nthreads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

// ---------------------------------------------------------------------------
// Parallel LSD radix sort of packed rows with a uint32 payload.
// Keys are W uint32 words big-endian; digits are 16 bits, least significant
// first; constant digits are skipped.  Stable.
// ---------------------------------------------------------------------------
struct RowSorter {
    int64_t n;
    int W;
    std::vector<uint32_t> keys;  // n*W, ping
    std::vector<uint32_t> ids;   // n
    std::vector<uint32_t> keys2, ids2;

    void sort() {
        const int DIG = 1 << 16;
        int T = nthreads();
        std::vector<int64_t> hist((size_t)T * DIG);
        // significance rank r: 0 = least significant digit (low half of the
        // last word) .. 2W-1 = most significant (high half of word 0)
        for (int r = 0; r < 2 * W; ++r) {
            int word = W - 1 - r / 2;
            int shift = (r % 2) * 16;
            std::fill(hist.begin(), hist.end(), 0);
            bool constant = true;
            uint32_t first_digit = n ? ((keys[(size_t)0 * W + word] >> shift) & 0xFFFF) : 0;
#pragma omp parallel reduction(&& : constant)
            {
#ifdef _OPENMP
                int t = omp_get_thread_num();
#else
                int t = 0;
#endif
                int64_t* h = &hist[(size_t)t * DIG];
                bool loc_const = true;
#pragma omp for schedule(static)
                for (int64_t i = 0; i < n; ++i) {
                    uint32_t dg = (keys[(size_t)i * W + word] >> shift) & 0xFFFF;
                    h[dg]++;
                    loc_const = loc_const && (dg == first_digit);
                }
                constant = constant && loc_const;
            }
            if (constant) continue;
            // exclusive prefix over (digit, thread)
            int64_t sum = 0;
            for (int dg = 0; dg < DIG; ++dg) {
                for (int t = 0; t < T; ++t) {
                    int64_t c = hist[(size_t)t * DIG + dg];
                    hist[(size_t)t * DIG + dg] = sum;
                    sum += c;
                }
            }
            keys2.resize(keys.size());
            ids2.resize(ids.size());
#pragma omp parallel
            {
#ifdef _OPENMP
                int t = omp_get_thread_num();
#else
                int t = 0;
#endif
                int64_t* h = &hist[(size_t)t * DIG];
#pragma omp for schedule(static)
                for (int64_t i = 0; i < n; ++i) {
                    uint32_t dg = (keys[(size_t)i * W + word] >> shift) & 0xFFFF;
                    int64_t pos = h[dg]++;
                    std::memcpy(&keys2[(size_t)pos * W], &keys[(size_t)i * W],
                                W * sizeof(uint32_t));
                    ids2[pos] = ids[i];
                }
            }
            keys.swap(keys2);
            ids.swap(ids2);
        }
    }
};

}  // namespace

// ---------------------------------------------------------------------------
// Extension-index build (with per-row inverse indices)
// ---------------------------------------------------------------------------
extern "C" {

struct StbrExt {
    int64_t U;
    uint32_t* kmers;     // U*W
    uint8_t* in_mask;    // U
    uint8_t* out_mask;   // U
    int64_t* pref_idx;   // P — node row of canonical(prefix) per (k+1)-mer
    int64_t* suf_idx;    // P
    uint8_t* pref_rc;    // P — 1 if the prefix is stored reverse-complemented
    uint8_t* suf_rc;     // P
};

struct StbrGraph {
    int64_t E, V, pool;
    int64_t* e_start;
    int64_t* e_end;
    int64_t* e_conj;
    int64_t* e_off;
    int64_t* e_len;
    double* e_cov;
    uint8_t* seq_pool;
    int64_t* v_conj;
    int32_t error;  // 0 ok, nonzero = inconsistent input
};

void stbr_free_ext(StbrExt* e) {
    if (!e) return;
    std::free(e->kmers);
    std::free(e->in_mask);
    std::free(e->out_mask);
    std::free(e->pref_idx);
    std::free(e->suf_idx);
    std::free(e->pref_rc);
    std::free(e->suf_rc);
    std::free(e);
}

void stbr_free_graph(StbrGraph* g) {
    if (!g) return;
    std::free(g->e_start);
    std::free(g->e_end);
    std::free(g->e_conj);
    std::free(g->e_off);
    std::free(g->e_len);
    std::free(g->e_cov);
    std::free(g->seq_pool);
    std::free(g->v_conj);
    std::free(g);
}

// Build the extension index from P unique canonical (k+1)-mers (W1 words).
// Mirrors ops/extension.py build_extension_index bit-for-bit, additionally
// recording, for every (k+1)-mer row, the dense node index + orientation of
// its canonical prefix and suffix k-mers (the inverse of the sort) so that
// condensation needs no lookups at all.
StbrExt* stbr_build_ext(int64_t P, int32_t W1, int32_t k,
                        const uint32_t* p1_words) {
    int W = (k + 15) / 16;
    if (W > MAXW || W1 > MAXW || k < 1) return nullptr;
    StbrExt* out = (StbrExt*)std::calloc(1, sizeof(StbrExt));
    if (P == 0) {
        out->U = 0;
        out->kmers = (uint32_t*)std::malloc(1);
        out->in_mask = (uint8_t*)std::malloc(1);
        out->out_mask = (uint8_t*)std::malloc(1);
        out->pref_idx = (int64_t*)std::malloc(1);
        out->suf_idx = (int64_t*)std::malloc(1);
        out->pref_rc = (uint8_t*)std::malloc(1);
        out->suf_rc = (uint8_t*)std::malloc(1);
        return out;
    }
    int64_t n2 = 2 * P;
    RowSorter rs;
    rs.n = n2;
    rs.W = W;
    rs.keys.resize((size_t)n2 * W);
    rs.ids.resize(n2);
    // contribution i in [0,P) = canonical prefix of row i;
    // contribution P+i = canonical suffix of row i
    uint8_t* was_rc = (uint8_t*)std::malloc(n2);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < P; ++i) {
        const uint32_t* s = p1_words + (size_t)i * W1;
        uint32_t tmp[MAXW];
        prefix_row(s, tmp, W, k);
        was_rc[i] = (uint8_t)canon_row(tmp, &rs.keys[(size_t)i * W], W, k);
        rs.ids[i] = (uint32_t)i;
        suffix_row(s, tmp, W, W1, k);
        was_rc[P + i] =
            (uint8_t)canon_row(tmp, &rs.keys[(size_t)(P + i) * W], W, k);
        rs.ids[P + i] = (uint32_t)(P + i);
    }
    rs.sort();
    // unique + masks + inverse
    out->pref_idx = (int64_t*)std::malloc(P * sizeof(int64_t));
    out->suf_idx = (int64_t*)std::malloc(P * sizeof(int64_t));
    out->pref_rc = (uint8_t*)std::malloc(P);
    out->suf_rc = (uint8_t*)std::malloc(P);
    uint32_t* ukmers = (uint32_t*)std::malloc((size_t)n2 * W * sizeof(uint32_t));
    uint8_t* im = (uint8_t*)std::calloc(n2, 1);
    uint8_t* om = (uint8_t*)std::calloc(n2, 1);
    int64_t u = -1;
    for (int64_t i = 0; i < n2; ++i) {
        const uint32_t* row = &rs.keys[(size_t)i * W];
        if (u < 0 || cmp_rows(row, ukmers + (size_t)u * W, W) != 0) {
            ++u;
            std::memcpy(ukmers + (size_t)u * W, row, W * sizeof(uint32_t));
        }
        uint32_t id = rs.ids[i];
        if (id < (uint64_t)P) {
            // prefix contribution: out-bit s[k] (in-bit comp(s[k]) if rc)
            const uint32_t* s = p1_words + (size_t)id * W1;
            uint32_t last = base_at(s, k);
            if (was_rc[id])
                im[u] |= (uint8_t)(1u << (3 - last));
            else
                om[u] |= (uint8_t)(1u << last);
            out->pref_idx[id] = u;
            out->pref_rc[id] = was_rc[id];
        } else {
            int64_t r = id - P;
            const uint32_t* s = p1_words + (size_t)r * W1;
            uint32_t first = base_at(s, 0);
            if (was_rc[id])
                om[u] |= (uint8_t)(1u << (3 - first));
            else
                im[u] |= (uint8_t)(1u << first);
            out->suf_idx[r] = u;
            out->suf_rc[r] = was_rc[id];
        }
    }
    std::free(was_rc);
    int64_t U = u + 1;
    out->U = U;
    out->kmers = (uint32_t*)std::realloc(ukmers, (size_t)U * W * sizeof(uint32_t));
    out->in_mask = (uint8_t*)std::realloc(im, U);
    out->out_mask = (uint8_t*)std::realloc(om, U);
    return out;
}

// Condense the extension index into the flat-array conjugate graph.
//
// Arc identities: oriented node n in [0, 2U) (n=2i canonical row i, n=2i+1 its
// reverse complement); every set out-mask bit of n is one arc.  With the
// inverse indices from stbr_build_ext every (k+1)-mer places its one or two
// oriented arcs directly into its slot (node_arc_start[src] + rank of nt among
// set bits) — zero lookups.  Unbranching chains are extracted with a
// latency-hiding segmented pointer chase: the chain list is pre-split at
// "splitter" arc ids (low bits zero), segments are chased with many
// concurrent cursors per thread (memory-level parallelism instead of one
// dependent-load chain), then stitched.  Edge ids are assigned in ascending
// head-arc order and vertices in ascending node order, matching
// ops/condense.py exactly.
namespace {

struct ArcRec {        // 16 B: one cache line holds 4 arcs
    int32_t nxt;       // following arc in the chain, -1 at chain end
    int32_t dst;       // destination oriented node
    float cov;         // (k+1)-mer multiplicity of this arc
    uint8_t nt;        // appended base
    uint8_t pad[3];
};

struct Seg {           // one chased chain segment
    int64_t start;     // first arc
    int64_t last;      // last arc
    int64_t next;      // arc id the segment feeds into (-1 = chain end)
    int64_t len;
    int64_t minarc;
    double cov;
};

// Chase all segments: from each start, follow rec.nxt until the chain ends or
// the next arc is a splitter ((id & smask) == 0).  IL concurrent cursors per
// thread keep ~IL cache misses in flight.
void chase_segments(const ArcRec* recs, const int64_t* starts, int64_t S,
                    int64_t smask, Seg* segs) {
    constexpr int IL = 16;
    int64_t qhead = 0;
#pragma omp parallel
    {
        struct Cur {
            int64_t c, len, minarc, start;
            double cov;
        } cur[IL];
        int active = 0;
        while (true) {
            while (active < IL) {
                int64_t s;
#pragma omp atomic capture
                s = qhead++;
                if (s >= S) break;
                int64_t a = starts[s];
                cur[active++] = {a, 0, a, s, 0.0};
                __builtin_prefetch(&recs[a]);
            }
            if (active == 0) break;
            for (int i = 0; i < active;) {
                Cur& cu = cur[i];
                const ArcRec& r = recs[cu.c];
                cu.len++;
                cu.cov += r.cov;
                if (cu.c < cu.minarc) cu.minarc = cu.c;
                int64_t n = r.nxt;
                if (n < 0 || (n & smask) == 0) {
                    Seg& sg = segs[cu.start];
                    sg.start = starts[cu.start];
                    sg.last = cu.c;
                    sg.next = n;
                    sg.len = cu.len;
                    sg.minarc = cu.minarc;
                    sg.cov = cu.cov;
                    cur[i] = cur[--active];
                } else {
                    cu.c = n;
                    __builtin_prefetch(&recs[n]);
                    ++i;
                }
            }
        }
    }
}

// Second chase: write the per-arc appended bases of each segment into the
// sequence pool (offsets precomputed by the stitcher); same cursor scheme.
void chase_fill(const ArcRec* recs, const Seg* segs, const int64_t* seg_ids,
                const int64_t* seg_off, int64_t S, uint8_t* pool) {
    constexpr int IL = 16;
    int64_t qhead = 0;
#pragma omp parallel
    {
        struct Cur {
            int64_t c, remaining;
            uint8_t* out;
        } cur[IL];
        int active = 0;
        while (true) {
            while (active < IL) {
                int64_t s;
#pragma omp atomic capture
                s = qhead++;
                if (s >= S) break;
                const Seg& sg = segs[seg_ids[s]];
                cur[active++] = {sg.start, sg.len, pool + seg_off[s]};
                __builtin_prefetch(&recs[sg.start]);
            }
            if (active == 0) break;
            for (int i = 0; i < active;) {
                Cur& cu = cur[i];
                const ArcRec& r = recs[cu.c];
                *cu.out++ = r.nt;
                if (--cu.remaining == 0) {
                    cur[i] = cur[--active];
                } else {
                    cu.c = r.nxt;
                    __builtin_prefetch(&recs[r.nxt]);
                    ++i;
                }
            }
        }
    }
}

}  // namespace

StbrGraph* stbr_condense(int64_t U, int32_t W, int32_t k,
                         const uint32_t* kmers, const uint8_t* in_mask,
                         const uint8_t* out_mask, int64_t P, int32_t W1,
                         const uint32_t* p1_words, const int64_t* p1_counts,
                         const int64_t* pref_idx, const uint8_t* pref_rc,
                         const int64_t* suf_idx, const uint8_t* suf_rc) {
    if (W > MAXW || W1 > MAXW) return nullptr;
    static const uint8_t POP4[16] = {0, 1, 1, 2, 1, 2, 2, 3,
                                     1, 2, 2, 3, 2, 3, 3, 4};
    static const uint8_t REV4[16] = {0, 8, 4, 12, 2, 10, 6, 14,
                                     1, 9, 5, 13, 3, 11, 7, 15};
    int64_t N = 2 * U;
    StbrGraph* g = (StbrGraph*)std::calloc(1, sizeof(StbrGraph));
    // oriented node masks, interleaved om|im<<8 so one load serves both
    uint16_t* nm = (uint16_t*)std::malloc((N ? N : 1) * sizeof(uint16_t));
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < U; ++i) {
        nm[2 * i] = (uint16_t)(out_mask[i] | (in_mask[i] << 8));
        nm[2 * i + 1] = (uint16_t)(REV4[in_mask[i]] | (REV4[out_mask[i]] << 8));
    }
    int64_t* arc_start = (int64_t*)std::malloc((N + 1) * sizeof(int64_t));
    int64_t A = 0;
    arc_start[0] = 0;
    for (int64_t n = 0; n < N; ++n) {
        A += POP4[nm[n] & 15u];
        arc_start[n + 1] = A;
    }
    if (A == 0) {
        g->e_start = (int64_t*)std::malloc(1);
        g->e_end = (int64_t*)std::malloc(1);
        g->e_conj = (int64_t*)std::malloc(1);
        g->e_off = (int64_t*)std::malloc(1);
        g->e_len = (int64_t*)std::malloc(1);
        g->e_cov = (double*)std::malloc(1);
        g->seq_pool = (uint8_t*)std::malloc(1);
        g->v_conj = (int64_t*)std::malloc(1);
        std::free(nm);
        std::free(arc_start);
        return g;
    }
    if (A >= (int64_t)1 << 31) {  // ArcRec uses int32 arc ids
        g->error = 2;
        std::free(nm);
        std::free(arc_start);
        return g;
    }

    ArcRec* recs = (ArcRec*)std::malloc((size_t)A * sizeof(ArcRec));
    // has_prv: bit per arc, small enough to stay cache-resident
    uint64_t* has_prv = (uint64_t*)std::calloc((A + 63) / 64, 8);
    int64_t placed = 0;
    // Place arcs.  Each (k+1)-mer row yields its spelled arc and (unless
    // palindromic) the conjugate arc.  nxt is computed right here: the
    // successor of an arc into an unbranching node is that node's only
    // out-arc, arc_start[dst].  Prefetches run PD rows ahead so the random
    // mask/slot traffic overlaps.
    constexpr int64_t PD = 24;
#pragma omp parallel for schedule(static) reduction(+ : placed)
    for (int64_t i = 0; i < P; ++i) {
        if (i + PD < P) {
            int64_t ppn = 2 * pref_idx[i + PD] + pref_rc[i + PD];
            int64_t psn = 2 * suf_idx[i + PD] + suf_rc[i + PD];
            __builtin_prefetch(&nm[ppn]);
            __builtin_prefetch(&nm[psn]);
            __builtin_prefetch(&arc_start[ppn]);
            __builtin_prefetch(&arc_start[psn]);
        }
        const uint32_t* s = p1_words + (size_t)i * W1;
        float cov = p1_counts ? (float)p1_counts[i] : 1.0f;
        int64_t pn = 2 * pref_idx[i] + pref_rc[i];
        int64_t sn = 2 * suf_idx[i] + suf_rc[i];
        uint32_t nt1 = base_at(s, k);
        uint32_t first = base_at(s, 0);
        uint32_t om_pn = nm[pn] & 15u;
        uint16_t m_sn = nm[sn];
        bool sn_unbr = POP4[m_sn & 15u] == 1 && POP4[m_sn >> 8] == 1;
        if ((om_pn >> nt1) & 1) {
            int64_t slot = arc_start[pn] + POP4[om_pn & ((1u << nt1) - 1)];
            int32_t nx = sn_unbr ? (int32_t)arc_start[sn] : -1;
            recs[slot] = {nx, (int32_t)sn, cov, (uint8_t)nt1, {0, 0, 0}};
            if (nx >= 0) {
#pragma omp atomic
                has_prv[nx >> 6] |= 1ull << (nx & 63);
            }
            placed++;
        }
        // conjugate orientation — identical to the first for palindromes;
        // quick reject (ends not complementary) before the full revcomp
        bool palin = false;
        if (first == 3 - nt1) {
            uint32_t rc0[MAXW];
            revcomp_row(s, rc0, W1, k + 1);
            palin = cmp_rows(rc0, s, W1) == 0;
        }
        if (!palin) {
            int64_t pn2 = sn ^ 1;
            int64_t sn2 = pn ^ 1;
            uint32_t nt2 = 3 - first;
            uint32_t om_pn2 = nm[pn2] & 15u;
            uint16_t m_sn2 = nm[sn2];
            bool sn2_unbr = POP4[m_sn2 & 15u] == 1 && POP4[m_sn2 >> 8] == 1;
            if ((om_pn2 >> nt2) & 1) {
                int64_t slot = arc_start[pn2] + POP4[om_pn2 & ((1u << nt2) - 1)];
                int32_t nx = sn2_unbr ? (int32_t)arc_start[sn2] : -1;
                recs[slot] = {nx, (int32_t)sn2, cov, (uint8_t)nt2, {0, 0, 0}};
                if (nx >= 0) {
#pragma omp atomic
                    has_prv[nx >> 6] |= 1ull << (nx & 63);
                }
                placed++;
            }
        }
    }
    if (placed != A) {  // mask bit without a (k+1)-mer row: inconsistent
        g->error = 1;
        std::free(nm);
        std::free(arc_start);
        std::free(recs);
        std::free(has_prv);
        return g;
    }

    // segment starts: every head (no predecessor) + every splitter arc
    int64_t stride = 1024;
    while (stride > 1 && A / stride < 512) stride >>= 1;
    int64_t smask = stride - 1;
    std::vector<int64_t> starts;
    starts.reserve((size_t)(A / stride) + 64);
    std::vector<int64_t> head_list;
    for (int64_t a = 0; a < A; ++a) {
        bool prv = (has_prv[a >> 6] >> (a & 63)) & 1;
        if (!prv) head_list.push_back(a);
        if (!prv || (a & smask) == 0) starts.push_back(a);
    }
    int64_t S = (int64_t)starts.size();
    std::vector<Seg> segs(S);
    chase_segments(recs, starts.data(), S, smask, segs.data());
    // seg index by splitter id for stitching
    std::vector<int64_t> seg_of((size_t)(A / stride) + 1, -1);
    for (int64_t s = 0; s < S; ++s)
        if ((starts[s] & smask) == 0) seg_of[starts[s] >> /*log2*/ __builtin_ctzll(stride)] = s;
    int shift = __builtin_ctzll(stride);

    // stitch chains from heads; count covered arcs
    std::vector<uint8_t> seg_used(S, 0);
    int64_t covered = 0;
    struct Chain {
        int64_t head, tail, len;
        double cov;
        int64_t first_seg;  // index into chain_segs
        int64_t n_segs;
    };
    std::vector<Chain> chains;
    std::vector<int64_t> chain_segs;  // seg ids, grouped per chain
    chains.reserve(head_list.size());
    {
        // map head arc -> its seg id: heads appear in `starts` in arc order
        // interleaved with splitters; rebuild via scan
        std::vector<int64_t> head_seg(head_list.size());
        int64_t hp = 0;
        for (int64_t s = 0; s < S; ++s)
            if (hp < (int64_t)head_list.size() && starts[s] == head_list[hp])
                head_seg[hp++] = s;
        // note: a head that is also a splitter appears once in starts
        for (size_t h = 0; h < head_list.size(); ++h) {
            int64_t sid = head_seg[h];
            Chain ch{head_list[h], 0, 0, 0.0, (int64_t)chain_segs.size(), 0};
            while (true) {
                const Seg& sg = segs[sid];
                seg_used[sid] = 1;
                chain_segs.push_back(sid);
                ch.n_segs++;
                ch.len += sg.len;
                ch.cov += sg.cov;
                ch.tail = sg.last;
                covered += sg.len;
                if (sg.next < 0) break;
                sid = seg_of[sg.next >> shift];
            }
            chains.push_back(ch);
        }
    }

    // leftovers are perfect cycles: splitter segments not reached from any
    // head, plus (rarely) arcs in splitterless cycles.  Cut each cycle
    // before its minimum arc (numpy semantics) and emit it as one chain.
    std::vector<Chain> cycle_chains;
    if (covered < A) {
        // cycles containing splitters: walk unused segs
        for (int64_t s = 0; s < S; ++s) {
            if (seg_used[s]) continue;
            // collect the segment cycle
            int64_t minarc = segs[s].minarc;
            int64_t total = 0;
            double cov = 0;
            int64_t sid = s;
            while (true) {
                const Seg& sg = segs[sid];
                if (seg_used[sid]) break;  // already consumed (same cycle)
                seg_used[sid] = 1;
                total += sg.len;
                cov += sg.cov;
                if (sg.minarc < minarc) minarc = sg.minarc;
                if (sg.next < 0) break;  // cannot happen in a cycle
                sid = seg_of[sg.next >> shift];
                if (sid == s) break;
            }
            covered += total;
            // find the predecessor of minarc by walking the cycle once
            int64_t pred = minarc;
            while (recs[pred].nxt != (int32_t)minarc) pred = recs[pred].nxt;
            Chain ch{minarc, pred, total, cov, -1, 0};
            cycle_chains.push_back(ch);
        }
        // splitterless cycles: not reachable at all — find by elimination
        if (covered < A) {
            std::vector<uint8_t> vis(A, 0);
            for (int64_t s = 0; s < S; ++s) {
                int64_t c = segs[s].start;
                for (int64_t t = 0; t < segs[s].len; ++t) {
                    vis[c] = 1;
                    c = recs[c].nxt;
                }
            }
            for (const Chain& ch : cycle_chains) {
                int64_t c = ch.head;
                for (int64_t t = 0; t < ch.len; ++t) {
                    vis[c] = 1;
                    c = recs[c].nxt;
                }
            }
            for (int64_t a = 0; a < A; ++a) {
                if (vis[a]) continue;
                int64_t minarc = a, total = 0, pred = a;
                double cov = 0;
                int64_t c = a;
                do {
                    vis[c] = 1;
                    total++;
                    cov += recs[c].cov;
                    if (recs[c].nxt < minarc) pred = c;  // pred of future min
                    if (c < minarc) minarc = c;
                    c = recs[c].nxt;
                } while (c != a);
                // recompute pred exactly (min known only now)
                pred = minarc;
                while (recs[pred].nxt != (int32_t)minarc) pred = recs[pred].nxt;
                covered += total;
                cycle_chains.push_back({minarc, pred, total, cov, -1, 0});
            }
        }
        if (covered != A) {  // shared-suffix chains: inconsistent masks
            g->error = 1;
            std::free(nm);
            std::free(arc_start);
            std::free(recs);
            std::free(has_prv);
            return g;
        }
        // cut cycles so the fill chase terminates
        for (const Chain& ch : cycle_chains) recs[ch.tail].nxt = -1;
    }

    // merge chains in ascending head order (numpy edge-id order)
    if (!cycle_chains.empty()) {
        for (const Chain& c : cycle_chains) chains.push_back(c);
        std::sort(chains.begin(), chains.end(),
                  [](const Chain& a, const Chain& b) { return a.head < b.head; });
    }
    int64_t E = (int64_t)chains.size();

    int64_t* e_len = (int64_t*)std::malloc(E * sizeof(int64_t));
    int64_t* e_off = (int64_t*)std::malloc(E * sizeof(int64_t));
    double* e_cov = (double*)std::malloc(E * sizeof(double));
    int64_t pool = 0;
    for (int64_t e = 0; e < E; ++e) {
        e_len[e] = chains[e].len + k;
        e_cov[e] = chains[e].cov;
        e_off[e] = pool;
        pool += e_len[e];
    }
    uint8_t* seq_pool = (uint8_t*)std::malloc(pool ? pool : 1);

    // per-segment fill jobs: cycles fill as one whole-chain segment
    std::vector<int64_t> fill_seg;    // seg id (or ~chain id for cycles)
    std::vector<int64_t> fill_off;    // absolute pool offset of the nts
    std::vector<Seg> cyc_segs;
    for (int64_t e = 0; e < E; ++e) {
        const Chain& ch = chains[e];
        int64_t off = e_off[e] + k;
        if (ch.first_seg < 0) {
            Seg sg{ch.head, ch.tail, -1, ch.len, ch.head, ch.cov};
            cyc_segs.push_back(sg);
            fill_seg.push_back(-(int64_t)cyc_segs.size());  // -1-based marker
            fill_off.push_back(off);
            continue;
        }
        for (int64_t j = 0; j < ch.n_segs; ++j) {
            int64_t sid = chain_segs[ch.first_seg + j];
            fill_seg.push_back(sid);
            fill_off.push_back(off);
            off += segs[sid].len;
        }
    }
    // resolve cycle markers into real seg entries appended after segs
    int64_t base_segs = (int64_t)segs.size();
    for (auto& fs : fill_seg)
        if (fs < 0) fs = base_segs + (-fs - 1);
    segs.insert(segs.end(), cyc_segs.begin(), cyc_segs.end());
    chase_fill(recs, segs.data(), fill_seg.data(), fill_off.data(),
               (int64_t)fill_seg.size(), seq_pool);

    // per-edge endpoints + k-prefix bases.  The head arc's source node is
    // recovered by binary search over arc_start (heads only — E of them).
    int64_t* e_start = (int64_t*)std::malloc((E ? E : 1) * sizeof(int64_t));
    int64_t* e_end = (int64_t*)std::malloc((E ? E : 1) * sizeof(int64_t));
    int64_t* e_conj = (int64_t*)std::malloc((E ? E : 1) * sizeof(int64_t));
    std::vector<int64_t> head_node(E), tail_node(E);
    auto node_of_arc = [&](int64_t a) -> int64_t {
        int64_t lo = 0, hi = N;  // find n with arc_start[n] <= a < arc_start[n+1]
        while (hi - lo > 1) {
            int64_t mid = (lo + hi) >> 1;
            if (arc_start[mid] <= a)
                lo = mid;
            else
                hi = mid;
        }
        return lo;
    };
    int err2 = 0;
#pragma omp parallel for schedule(static) reduction(| : err2)
    for (int64_t e = 0; e < E; ++e) {
        const Chain& ch = chains[e];
        head_node[e] = node_of_arc(ch.head);
        tail_node[e] = node_of_arc(ch.tail);
        // k-prefix = head's source node k-mer
        int64_t n = head_node[e];
        uint32_t row[MAXW];
        if (n & 1)
            revcomp_row(kmers + (size_t)(n >> 1) * W, row, W, k);
        else
            std::memcpy(row, kmers + (size_t)(n >> 1) * W, W * sizeof(uint32_t));
        uint8_t* dstp = seq_pool + e_off[e];
        for (int j = 0; j < k; ++j) dstp[j] = (uint8_t)base_at(row, j);
    }

    // conjugate pairing: rc of arc (n -c-> m) is (m^1 -comp(fb(n))-> n^1);
    // the conjugate edge is the chain whose HEAD is the rc of this tail.
    std::vector<int64_t> head_arcs(E);
    for (int64_t e = 0; e < E; ++e) head_arcs[e] = chains[e].head;
#pragma omp parallel for schedule(static) reduction(| : err2)
    for (int64_t e = 0; e < E; ++e) {
        int64_t tn = tail_node[e];
        uint32_t fb;
        if (tn & 1)
            fb = 3 - base_at(kmers + (size_t)(tn >> 1) * W, k - 1);
        else
            fb = base_at(kmers + (size_t)(tn >> 1) * W, 0);
        int64_t rs = (int64_t)recs[chains[e].tail].dst ^ 1;
        uint32_t rnt = 3 - fb;
        uint32_t om_rs = nm[rs] & 15u;
        if (!((om_rs >> rnt) & 1)) {
            err2 = 1;
            e_conj[e] = e;
            continue;
        }
        int64_t ra = arc_start[rs] + POP4[om_rs & ((1u << rnt) - 1)];
        // binary search ra among sorted head arcs
        int64_t lo = 0, hi = E - 1, res = -1;
        while (lo <= hi) {
            int64_t mid = (lo + hi) >> 1;
            if (head_arcs[mid] == ra) {
                res = mid;
                break;
            }
            if (head_arcs[mid] < ra)
                lo = mid + 1;
            else
                hi = mid - 1;
        }
        if (res < 0) {
            err2 = 1;
            res = e;
        }
        e_conj[e] = res;
    }

    // vertices: endpoint nodes and their conjugates, ids in node order
    {
        std::vector<int64_t> vn;
        vn.reserve(4 * E);
        for (int64_t e = 0; e < E; ++e) {
            int64_t s = head_node[e], t = (int64_t)recs[chains[e].tail].dst;
            vn.push_back(s);
            vn.push_back(s ^ 1);
            vn.push_back(t);
            vn.push_back(t ^ 1);
        }
        std::sort(vn.begin(), vn.end());
        vn.erase(std::unique(vn.begin(), vn.end()), vn.end());
        int64_t V = (int64_t)vn.size();
        int64_t* v_conj = (int64_t*)std::malloc((V ? V : 1) * sizeof(int64_t));
        auto vid = [&](int64_t node) {
            return (int64_t)(std::lower_bound(vn.begin(), vn.end(), node) -
                             vn.begin());
        };
        for (int64_t v = 0; v < V; ++v) v_conj[v] = vid(vn[v] ^ 1);
#pragma omp parallel for schedule(static)
        for (int64_t e = 0; e < E; ++e) {
            e_start[e] = vid(head_node[e]);
            e_end[e] = vid((int64_t)recs[chains[e].tail].dst);
        }
        g->V = V;
        g->v_conj = v_conj;
    }

    std::free(nm);
    std::free(arc_start);
    std::free(recs);
    std::free(has_prv);

    g->E = E;
    g->pool = pool;
    g->e_start = e_start;
    g->e_end = e_end;
    g->e_conj = e_conj;
    g->e_off = e_off;
    g->e_len = e_len;
    g->e_cov = e_cov;
    g->seq_pool = seq_pool;
    g->error = err2;
    return g;
}

// ---------------------------------------------------------------------------
// Hash-based packed-row lookup: the native fast path behind
// ops/count.py searchsorted_rows (the index role of the reference's MPHF
// KMerIndex, kmer_mph/kmer_index.hpp:29).  Returns the position of each
// needle row in `hay`, or -1.  One-shot: builds an open-addressing table of
// the haystack (O(U)), then streams the needles (O(N) expected).
// ---------------------------------------------------------------------------
int64_t stbr_lookup_rows(int64_t U, int32_t W, const uint32_t* hay, int64_t N,
                         const uint32_t* needles, int64_t* out) {
    if (W > MAXW) return -1;
    if (U == 0) {
        for (int64_t i = 0; i < N; ++i) out[i] = -1;
        return 0;
    }
    uint64_t cap = 1;
    while (cap < (uint64_t)U * 2) cap <<= 1;
    uint64_t mask = cap - 1;
    int64_t* table = (int64_t*)std::malloc(cap * sizeof(int64_t));
    if (!table) return -1;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < (int64_t)cap; ++i) table[i] = -1;
    auto hash_row = [W](const uint32_t* r) -> uint64_t {
        uint64_t h = 0x9E3779B97F4A7C15ull;
        for (int w = 0; w < W; ++w) {
            h ^= r[w];
            h *= 0xBF58476D1CE4E5B9ull;
            h ^= h >> 31;
        }
        return h;
    };
    // parallel insert with CAS (rows are unique, so first-wins is fine)
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < U; ++i) {
        uint64_t h = hash_row(hay + (size_t)i * W) & mask;
        while (true) {
            int64_t expected = -1;
            if (__atomic_compare_exchange_n(&table[h], &expected, i, false,
                                            __ATOMIC_RELAXED, __ATOMIC_RELAXED))
                break;
            h = (h + 1) & mask;
        }
    }
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < N; ++i) {
        const uint32_t* r = needles + (size_t)i * W;
        uint64_t h = hash_row(r) & mask;
        int64_t res = -1;
        while (true) {
            int64_t j = table[h];
            if (j < 0) break;
            if (cmp_rows(hay + (size_t)j * W, r, W) == 0) {
                res = j;
                break;
            }
            h = (h + 1) & mask;
        }
        out[i] = res;
    }
    std::free(table);
    return 0;
}

}  // extern "C"
