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
// set bits).  Chains through unbranching nodes are walked sequentially; edge
// ids are assigned in ascending head-arc order and vertices in ascending
// node order, matching ops/condense.py exactly.
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
    // oriented masks/degrees
    uint8_t* om = (uint8_t*)std::malloc(N ? N : 1);
    uint8_t* im = (uint8_t*)std::malloc(N ? N : 1);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < U; ++i) {
        om[2 * i] = out_mask[i];
        om[2 * i + 1] = REV4[in_mask[i]];
        im[2 * i] = in_mask[i];
        im[2 * i + 1] = REV4[out_mask[i]];
    }
    int64_t* arc_start = (int64_t*)std::malloc((N + 1) * sizeof(int64_t));
    int64_t A = 0;
    arc_start[0] = 0;
    for (int64_t n = 0; n < N; ++n) {
        A += POP4[om[n]];
        arc_start[n + 1] = A;
    }
    if (A == 0) {
        g->E = 0;
        g->V = 0;
        g->pool = 0;
        g->e_start = (int64_t*)std::malloc(1);
        g->e_end = (int64_t*)std::malloc(1);
        g->e_conj = (int64_t*)std::malloc(1);
        g->e_off = (int64_t*)std::malloc(1);
        g->e_len = (int64_t*)std::malloc(1);
        g->e_cov = (double*)std::malloc(1);
        g->seq_pool = (uint8_t*)std::malloc(1);
        g->v_conj = (int64_t*)std::malloc(1);
        std::free(om);
        std::free(im);
        std::free(arc_start);
        return g;
    }
    int64_t* arc_src = (int64_t*)std::malloc(A * sizeof(int64_t));
    int64_t* arc_dst = (int64_t*)std::malloc(A * sizeof(int64_t));
    uint8_t* arc_nt = (uint8_t*)std::malloc(A);
    double* arc_cov = (double*)std::malloc(A * sizeof(double));
#pragma omp parallel for schedule(static)
    for (int64_t a = 0; a < A; ++a) arc_src[a] = -1;

    int err = 0;
    // place arcs from (k+1)-mer rows via the inverse indices
#pragma omp parallel for schedule(static) reduction(| : err)
    for (int64_t i = 0; i < P; ++i) {
        const uint32_t* s = p1_words + (size_t)i * W1;
        double cov = p1_counts ? (double)p1_counts[i] : 1.0;
        int64_t pn = 2 * pref_idx[i] + pref_rc[i];
        int64_t sn = 2 * suf_idx[i] + suf_rc[i];
        uint32_t nt1 = base_at(s, k);
        // orientation 1: pn -nt1-> sn (skipped if early clipping cleared it)
        if ((om[pn] >> nt1) & 1) {
            int64_t slot = arc_start[pn] + POP4[om[pn] & ((1u << nt1) - 1)];
            arc_src[slot] = pn;
            arc_dst[slot] = sn;
            arc_nt[slot] = (uint8_t)nt1;
            arc_cov[slot] = cov;
        }
        // orientation 2 (the conjugate arc) — identical for palindromic rows
        uint32_t rc0[MAXW];
        revcomp_row(s, rc0, W1, k + 1);
        if (cmp_rows(rc0, s, W1) != 0) {
            int64_t pn2 = sn ^ 1;
            int64_t sn2 = pn ^ 1;
            uint32_t nt2 = 3 - base_at(s, 0);
            if ((om[pn2] >> nt2) & 1) {
                int64_t slot = arc_start[pn2] + POP4[om[pn2] & ((1u << nt2) - 1)];
                arc_src[slot] = pn2;
                arc_dst[slot] = sn2;
                arc_nt[slot] = (uint8_t)nt2;
                arc_cov[slot] = cov;
            }
        }
    }
    for (int64_t a = 0; a < A; ++a)
        if (arc_src[a] < 0) err = 1;  // mask bit without a (k+1)-mer row
    if (err) {
        g->error = 1;
        std::free(om);
        std::free(im);
        std::free(arc_start);
        std::free(arc_src);
        std::free(arc_dst);
        std::free(arc_nt);
        std::free(arc_cov);
        return g;
    }

    // chain links: arc a feeds the unique out-arc of its destination when the
    // destination is unbranching (outdeg == indeg == 1)
    int64_t* nxt = (int64_t*)std::malloc(A * sizeof(int64_t));
    int64_t* prv = (int64_t*)std::malloc(A * sizeof(int64_t));
#pragma omp parallel for schedule(static)
    for (int64_t a = 0; a < A; ++a) {
        int64_t d = arc_dst[a];
        nxt[a] = (POP4[om[d]] == 1 && POP4[im[d]] == 1) ? arc_start[d] : -1;
    }
#pragma omp parallel for schedule(static)
    for (int64_t a = 0; a < A; ++a) prv[a] = -1;
    for (int64_t a = 0; a < A; ++a)
        if (nxt[a] >= 0) prv[nxt[a]] = a;

    // perfect cycles: cut before the minimum arc (matching the numpy path)
    uint8_t* visited = (uint8_t*)std::calloc(A, 1);
    for (int64_t a = 0; a < A; ++a) {
        if (visited[a] || prv[a] >= 0) continue;
        for (int64_t c = a; c >= 0; c = nxt[c]) visited[c] = 1;
    }
    for (int64_t a = 0; a < A; ++a) {
        if (visited[a]) continue;
        // unvisited => perfect cycle; find its min arc, cut before it
        int64_t mn = a;
        int64_t c = a;
        do {
            visited[c] = 1;
            if (c < mn) mn = c;
            c = nxt[c];
        } while (c != a);
        nxt[prv[mn]] = -1;
        prv[mn] = -1;
    }
    std::free(visited);

    // heads in ascending arc order == ascending edge ids (np.unique order)
    std::vector<int64_t> heads;
    heads.reserve(1024);
    for (int64_t a = 0; a < A; ++a)
        if (prv[a] < 0) heads.push_back(a);
    int64_t E = (int64_t)heads.size();

    int64_t* e_len = (int64_t*)std::malloc(E * sizeof(int64_t));
    int64_t* e_off = (int64_t*)std::malloc(E * sizeof(int64_t));
    double* e_cov = (double*)std::calloc(E, sizeof(double));
    int64_t* tail_arc = (int64_t*)std::malloc(E * sizeof(int64_t));
    int64_t* edge_of_arc = (int64_t*)std::malloc(A * sizeof(int64_t));
    int64_t* pos = (int64_t*)std::malloc(A * sizeof(int64_t));
#pragma omp parallel for schedule(dynamic, 512)
    for (int64_t e = 0; e < E; ++e) {
        int64_t n = 0;
        double cv = 0;
        int64_t last = heads[e];
        for (int64_t c = heads[e]; c >= 0; c = nxt[c]) {
            edge_of_arc[c] = e;
            pos[c] = n++;
            cv += arc_cov[c];
            last = c;
        }
        e_len[e] = n + k;
        e_cov[e] = cv;
        tail_arc[e] = last;
    }
    int64_t pool = 0;
    for (int64_t e = 0; e < E; ++e) {
        e_off[e] = pool;
        pool += e_len[e];
    }
    uint8_t* seq_pool = (uint8_t*)std::malloc(pool ? pool : 1);
    // k-prefix of each edge = its head's source node k-mer
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < E; ++e) {
        int64_t n = arc_src[heads[e]];
        uint32_t row[MAXW];
        if (n & 1)
            revcomp_row(kmers + (size_t)(n >> 1) * W, row, W, k);
        else
            std::memcpy(row, kmers + (size_t)(n >> 1) * W, W * sizeof(uint32_t));
        uint8_t* dst = seq_pool + e_off[e];
        for (int j = 0; j < k; ++j) dst[j] = (uint8_t)base_at(row, j);
    }
#pragma omp parallel for schedule(static)
    for (int64_t a = 0; a < A; ++a)
        seq_pool[e_off[edge_of_arc[a]] + k + pos[a]] = arc_nt[a];

    // conjugate pairing: rc of arc (n -c-> m) is (m^1 -comp(fb(n))-> n^1)
    int64_t* e_conj = (int64_t*)std::malloc(E * sizeof(int64_t));
    int err2 = 0;
#pragma omp parallel for schedule(static) reduction(| : err2)
    for (int64_t e = 0; e < E; ++e) {
        int64_t t = tail_arc[e];
        int64_t n = arc_src[t];
        uint32_t fb;
        if (n & 1)
            fb = 3 - base_at(kmers + (size_t)(n >> 1) * W, k - 1);
        else
            fb = base_at(kmers + (size_t)(n >> 1) * W, 0);
        int64_t rs = arc_dst[t] ^ 1;
        uint32_t rnt = 3 - fb;
        if (!((om[rs] >> rnt) & 1)) {
            err2 = 1;
            e_conj[e] = e;
            continue;
        }
        int64_t ra = arc_start[rs] + POP4[om[rs] & ((1u << rnt) - 1)];
        e_conj[e] = edge_of_arc[ra];
    }

    // vertices: endpoint nodes and their conjugates, ids in node order
    uint8_t* mark = (uint8_t*)std::calloc(N, 1);
    for (int64_t e = 0; e < E; ++e) {
        int64_t s = arc_src[heads[e]], t = arc_dst[tail_arc[e]];
        mark[s] = mark[s ^ 1] = 1;
        mark[t] = mark[t ^ 1] = 1;
    }
    int64_t* node2v = (int64_t*)std::malloc(N * sizeof(int64_t));
    int64_t V = 0;
    for (int64_t n = 0; n < N; ++n) node2v[n] = mark[n] ? V++ : -1;
    int64_t* v_conj = (int64_t*)std::malloc((V ? V : 1) * sizeof(int64_t));
    for (int64_t n = 0; n < N; ++n)
        if (mark[n]) v_conj[node2v[n]] = node2v[n ^ 1];
    int64_t* e_start = (int64_t*)std::malloc((E ? E : 1) * sizeof(int64_t));
    int64_t* e_end = (int64_t*)std::malloc((E ? E : 1) * sizeof(int64_t));
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < E; ++e) {
        e_start[e] = node2v[arc_src[heads[e]]];
        e_end[e] = node2v[arc_dst[tail_arc[e]]];
    }

    std::free(mark);
    std::free(node2v);
    std::free(om);
    std::free(im);
    std::free(arc_start);
    std::free(arc_src);
    std::free(arc_dst);
    std::free(arc_nt);
    std::free(arc_cov);
    std::free(nxt);
    std::free(prv);
    std::free(edge_of_arc);
    std::free(pos);
    std::free(tail_arc);

    g->E = E;
    g->V = V;
    g->pool = pool;
    g->e_start = e_start;
    g->e_end = e_end;
    g->e_conj = e_conj;
    g->e_off = e_off;
    g->e_len = e_len;
    g->e_cov = e_cov;
    g->seq_pool = seq_pool;
    g->v_conj = v_conj;
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
