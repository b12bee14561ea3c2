// Native simplification engine: the full TC / BR(simple + bounded-Dijkstra) /
// EC / relative-coverage schedule on an incremental chain-merging structure.
//
// Role mirror of the reference's simplification stage
// (/root/reference/src/common/stages/simplification.cpp:405-429 iteration
// schedule, modules/simplification/tip_clipper.hpp:23-59,
// bulge_remover.hpp:346, erroneous_connection_remover.hpp,
// parallel_simplification_algorithms.hpp:1-832), re-designed for the
// flat-array graph: original (alive) edges become immutable "arcs"; current
// edges are chains of arcs merged in O(1) by pointer splicing whenever a
// vertex becomes unbranching — the logical equivalent of Compressor
// (modules/simplification/compressor.hpp) with no sequence copies ever.  The
// engine returns the final chain decomposition plus bulge glue records;
// Python materializes nucleotide sequences in one vectorized ragged copy.
//
// Semantics contract: every pass reproduces the vectorized numpy passes in
// spades_tpu/graph/simplify.py (which are themselves the mirror of the
// reference conditions) — snapshot conditions, canonical-group bulge
// processing, ascending-coverage Dijkstra candidate order.  Current-edge id
// order (tie-breaks, final output order) is the chain head-arc index, which
// is exactly the id order compress() produces.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <chrono>
#include <algorithm>
#include <queue>
#include <vector>

namespace {

// STBR_TIMING=1 prints per-pass wall times to stderr (developer knob, the
// TIME_TRACE_SCOPE analog for this engine)
struct PassTimer {
    const char* name;
    std::chrono::steady_clock::time_point t0;
    static bool enabled() {
        static int e = -1;
        if (e < 0) {
            const char* v = std::getenv("STBR_TIMING");
            e = (v && v[0] == '1') ? 1 : 0;
        }
        return e == 1;
    }
    explicit PassTimer(const char* n) : name(n) {
        if (enabled()) t0 = std::chrono::steady_clock::now();
    }
    ~PassTimer() {
        if (enabled()) {
            double ms = std::chrono::duration<double, std::milli>(
                            std::chrono::steady_clock::now() - t0)
                            .count();
            std::fprintf(stderr, "[stbr] %-16s %8.2f ms\n", name, ms);
        }
    }
};

struct Engine {
    int64_t A = 0;  // arcs == alive input edges
    int64_t V = 0;
    const int64_t* v_conj = nullptr;
    // immutable arc chain links (next arc inside a merged chain; -1 = tail)
    std::vector<int64_t> next_arc;
    // current-edge slots (slot i starts as arc i; absorbed slots die)
    std::vector<int64_t> st, en, cj, klen, head, tail;
    std::vector<double> cov;  // coverage SUM over chain
    std::vector<uint8_t> alive;
    std::vector<int64_t> live;  // alive slot ids, refreshed per pass
    // scratch
    std::vector<int64_t> od, idg, vout, owner, last_slot;
    std::vector<uint8_t> visited;
    // event-driven retriggering (PersistentProcessingAlgorithm semantics,
    // parallel_simplification_algorithms.hpp): per-vertex mutation epochs;
    // a bulge pass re-examines only candidates whose endpoints were touched
    // since its own previous scan.  Exact for simple bulges (conditions are
    // endpoint-local); for Dijkstra bulges it is the reference's SmartSet
    // granularity (changes >1 hop away do not retrigger).
    std::vector<int64_t> vmod;
    int64_t step = 0;
    int64_t last_sb_scan = -1, last_dij_scan = -1;
    bool retrigger = true;

    void mark(int64_t v) { vmod[v] = step; }
    void mark_edge(int64_t x) {
        mark(st[x]);
        mark(en[x]);
        int64_t xc = cj[x];
        mark(st[xc]);
        mark(en[xc]);
    }
    // glue records (simple bulges): ragged arm/keep arc lists
    std::vector<int64_t> glue_arm_off{0}, glue_arm_arcs;
    std::vector<int64_t> glue_keep_off{0}, glue_keep_arcs;
    int64_t tips = 0, bulges = 0, ec = 0, isolated = 0, iterations = 0;

    double avg(int64_t x) const {
        int64_t l = klen[x] > 1 ? klen[x] : 1;
        return cov[x] / (double)l;
    }

    void refresh_live() {
        std::vector<int64_t> nl;
        nl.reserve(live.size());
        for (int64_t x : live)
            if (alive[x]) nl.push_back(x);
        live.swap(nl);
    }

    void degrees() {
        std::fill(od.begin(), od.end(), 0);
        std::fill(idg.begin(), idg.end(), 0);
        for (int64_t x : live)
            if (alive[x]) {
                ++od[st[x]];
                ++idg[en[x]];
            }
    }

    int64_t kill(int64_t x) {
        mark_edge(x);
        int64_t n = 0;
        if (alive[x]) {
            alive[x] = 0;
            ++n;
        }
        int64_t xc = cj[x];
        if (alive[xc]) {
            alive[xc] = 0;
            ++n;
        }
        return n;
    }

    void push_chain(int64_t slot, std::vector<int64_t>& out) {
        for (int64_t a = head[slot];; a = next_arc[a]) {
            out.push_back(a);
            if (a == tail[slot]) break;
        }
    }

    // ---- compress: merge chains through unbranching vertices -------------
    // Mirror of graph/compress.py (itself the Compressor analog): link where
    // outdeg[dst]==1 && indeg[dst]==1; perfect cycles cut at the member with
    // the minimum head-arc id (== minimum current-edge id).
    void compress() {
        PassTimer tm("compress");
        refresh_live();
        degrees();
        std::fill(vout.begin(), vout.end(), -1);
        for (int64_t x : live) vout[st[x]] = x;
        const size_t L = live.size();
        std::vector<int64_t> nxt(L);
        // owner[] doubles as slot -> live-index during the link phase
        for (size_t i = 0; i < L; ++i) owner[live[i]] = (int64_t)i;
        std::vector<uint8_t> has_prv(L, 0);
        for (size_t i = 0; i < L; ++i) {
            int64_t x = live[i];
            int64_t v = en[x];
            int64_t n = (od[v] == 1 && idg[v] == 1) ? vout[v] : -1;
            if (n == x) n = -1;  // single-edge perfect loop stays intact
            nxt[i] = n;
            if (n >= 0) has_prv[owner[n]] = 1;
        }
        std::fill(visited.begin(), visited.end(), 0);
        // survivor map built during absorption (distinct from the pos use of
        // owner[] above — committed after the walks)
        std::vector<std::pair<int64_t, int64_t>> absorbed;  // (slot, survivor)
        auto absorb = [&](int64_t h, int64_t cur) {
            mark(st[h]);
            mark(en[h]);  // the merge vertex
            mark(st[cur]);
            mark(en[cur]);
            klen[h] += klen[cur];
            cov[h] += cov[cur];
            en[h] = en[cur];
            next_arc[tail[h]] = head[cur];
            tail[h] = tail[cur];
            alive[cur] = 0;
            absorbed.emplace_back(cur, h);
        };
        // pass 1: proper chains from heads
        for (size_t i = 0; i < L; ++i) {
            int64_t h = live[i];
            if (has_prv[i]) continue;
            visited[h] = 1;
            int64_t last = h;
            for (int64_t cur = nxt[i]; cur >= 0; cur = nxt[owner[cur]]) {
                visited[cur] = 1;
                absorb(h, cur);
                last = cur;
            }
            last_slot[h] = last;
        }
        // pass 2: perfect cycles — every unvisited live slot sits on one
        for (size_t i = 0; i < L; ++i) {
            int64_t x = live[i];
            if (visited[x]) continue;
            int64_t rep = x;  // representative: minimum head-arc member
            for (int64_t cur = nxt[owner[x]]; cur != x; cur = nxt[owner[cur]])
                if (head[cur] < head[rep]) rep = cur;
            visited[rep] = 1;
            int64_t last = rep;
            for (int64_t cur = nxt[owner[rep]]; cur != rep;) {
                int64_t nx = nxt[owner[cur]];
                visited[cur] = 1;
                absorb(rep, cur);
                last = cur;
                cur = nx;
            }
            last_slot[rep] = last;
        }
        // conjugate fixup: the chain containing rc(tail arc) is the chain
        // that absorbed cj[last member] (compress.py's
        // e_conj = edge_of_arc[rc_arc[tail_arc]])
        for (int64_t x : live) owner[x] = x;  // survivors own themselves
        for (auto [slot, surv] : absorbed) owner[slot] = surv;
        for (int64_t x : live)
            if (alive[x]) last_slot[x] = owner[cj[last_slot[x]]];
        for (int64_t x : live)
            if (alive[x]) cj[x] = last_slot[x];
        refresh_live();
    }

    // ---- tip clipper (tip_clipper.hpp:23-59 conditions) ------------------
    int64_t clip_tips(int64_t max_len, double cov_bound, double rctc) {
        PassTimer tm("clip_tips");
        refresh_live();
        if (live.empty()) return 0;
        degrees();
        std::vector<double> best_out, sec_out, best_in, sec_in;
        bool use_rctc = rctc > 0.0;
        if (use_rctc) {
            best_out.assign(V, 0.0);
            sec_out.assign(V, 0.0);
            best_in.assign(V, 0.0);
            sec_in.assign(V, 0.0);
            for (int64_t x : live) {
                if (st[x] == en[x]) continue;  // loops contribute nothing
                double c = avg(x);
                auto upd = [&](std::vector<double>& b, std::vector<double>& s,
                               int64_t v) {
                    if (c >= b[v]) {
                        s[v] = b[v];
                        b[v] = c;
                    } else if (c > s[v]) {
                        s[v] = c;
                    }
                };
                upd(best_out, sec_out, st[x]);
                upd(best_in, sec_in, en[x]);
            }
        }
        std::vector<int64_t> kills;
        for (int64_t x : live) {
            int64_t s = st[x], e = en[x];
            bool end_dead = (od[e] + idg[e]) == 1;
            bool start_dead = (od[s] + idg[s]) == 1;
            if (!((end_dead || start_dead) && (od[s] + idg[e]) > 2)) continue;
            if (klen[x] > max_len) continue;
            double c = avg(x);
            if (c > cov_bound) continue;
            if (use_rctc) {
                double cself = (s != e) ? c : -1.0;
                double oa = (cself >= best_out[s]) ? sec_out[s] : best_out[s];
                double ia = (cself >= best_in[e]) ? sec_in[e] : best_in[e];
                double comp = oa > ia ? oa : ia;
                if (c > rctc * (comp + 1.0)) continue;
            }
            kills.push_back(x);
        }
        int64_t n = 0;
        for (int64_t x : kills) n += kill(x);
        return n;
    }

    // ---- simple bulge remover (bulge_remover.hpp parallel-edge form) -----
    int64_t simple_bulges(int64_t max_len, double max_delta,
                          double max_rel_delta, double max_rel_cov,
                          bool record_glue) {
        PassTimer tm("simple_bulges");
        refresh_live();
        if (live.empty()) return 0;
        ++step;
        int64_t since = retrigger ? last_sb_scan : -1;
        last_sb_scan = step;
        struct Row {
            int64_t grp, x;
            double negcov;
            int64_t len, id;
        };
        std::vector<Row> rows;
        rows.reserve(live.size());
        for (int64_t x : live) {
            int64_t s = st[x], e = en[x];
            if (s == e) continue;
            // all members of a (s,e) group share the filter verdict, so
            // group-level processing stays intact under the epoch filter
            if (since >= 0 && vmod[s] < since && vmod[e] < since) continue;
            int64_t grp = s * V + e;
            int64_t cg = v_conj[e] * V + v_conj[s];
            if (grp > cg) continue;  // canonical conjugate-group member only
            rows.push_back({grp, x, -avg(x), klen[x], head[x]});
        }
        if (rows.empty()) return 0;
        std::sort(rows.begin(), rows.end(), [](const Row& a, const Row& b) {
            if (a.grp != b.grp) return a.grp < b.grp;
            if (a.negcov != b.negcov) return a.negcov < b.negcov;
            if (a.len != b.len) return a.len < b.len;
            return a.id < b.id;
        });
        // snapshot conditions, then apply (matches the vectorized pass)
        std::vector<std::pair<int64_t, int64_t>> glue;  // (arm, keep)
        size_t i = 0;
        while (i < rows.size()) {
            size_t j = i;
            while (j < rows.size() && rows[j].grp == rows[i].grp) ++j;
            int64_t keep = rows[i].x;
            double keep_cov = -rows[i].negcov;
            int64_t keep_len = rows[i].len;
            double delta = max_delta > max_rel_delta * (double)keep_len
                               ? max_delta
                               : max_rel_delta * (double)keep_len;
            for (size_t r = i + 1; r < j; ++r) {
                int64_t x = rows[r].x;
                if (cj[x] == keep) continue;  // never glue onto own conjugate
                if (rows[r].len > max_len) continue;
                double dl = (double)(rows[r].len - keep_len);
                if (dl < 0) dl = -dl;
                if (dl > delta) continue;
                if (-rows[r].negcov > max_rel_cov * keep_cov) continue;
                glue.emplace_back(x, keep);
            }
            i = j;
        }
        if (glue.empty()) return 0;
        // dedupe to one representative per conjugate pair (first occurrence
        // in group order — matches np.unique(pair_rep, return_index=True)),
        // then apply with SNAPSHOT arm coverages (np.add.at semantics)
        std::fill(visited.begin(), visited.end(), 0);
        std::vector<std::pair<int64_t, int64_t>> deduped;
        deduped.reserve(glue.size());
        for (auto [x, keep] : glue) {
            int64_t rep = x < cj[x] ? x : cj[x];
            if (visited[rep]) continue;
            visited[rep] = 1;
            deduped.emplace_back(x, keep);
        }
        std::vector<double> arm_cov(deduped.size());
        for (size_t r = 0; r < deduped.size(); ++r)
            arm_cov[r] = cov[deduped[r].first];
        int64_t n = 0;
        for (size_t r = 0; r < deduped.size(); ++r) {
            auto [x, keep] = deduped[r];
            cov[keep] += arm_cov[r];
            cov[cj[keep]] += arm_cov[r];
            mark_edge(keep);
            if (record_glue) {
                push_chain(x, glue_arm_arcs);
                glue_arm_off.push_back((int64_t)glue_arm_arcs.size());
                push_chain(keep, glue_keep_arcs);
                glue_keep_off.push_back((int64_t)glue_keep_arcs.size());
            }
            n += kill(x);
        }
        return n;
    }

    // ---- bounded-Dijkstra bulge remover (bulge_remover.hpp:346) ----------
    // Sequential ascending-coverage candidate loop; same algorithm as
    // native/bulge.cpp but over current-edge slots.
    int64_t dijkstra_bulges(int64_t max_len, double max_delta,
                            double max_rel_delta, double max_rel_cov) {
        PassTimer tm("dijkstra_bulges");
        refresh_live();
        if (live.empty()) return 0;
        degrees();
        ++step;
        int64_t since = retrigger ? last_dij_scan : -1;
        last_dij_scan = step;
        struct Cand {
            double c;
            int64_t id, x;
        };
        std::vector<Cand> cand;
        for (int64_t x : live) {
            if (klen[x] > max_len || st[x] == en[x]) continue;
            if (od[st[x]] <= 1 || idg[en[x]] <= 1) continue;
            if (since >= 0 && vmod[st[x]] < since && vmod[en[x]] < since)
                continue;
            cand.push_back({avg(x), head[x], x});
        }
        if (cand.empty()) return 0;
        std::sort(cand.begin(), cand.end(), [](const Cand& a, const Cand& b) {
            if (a.c != b.c) return a.c < b.c;
            return a.id < b.id;
        });
        // CSR over live slots (alive re-checked during search)
        std::vector<int64_t> off(V + 1, 0), edges(live.size());
        for (int64_t x : live) ++off[st[x] + 1];
        for (int64_t v = 0; v < V; ++v) off[v + 1] += off[v];
        {
            std::vector<int64_t> cur(off.begin(), off.end() - 1);
            for (int64_t x : live) edges[cur[st[x]]++] = x;
        }
        // snapshot average coverage for conditions (kept stale through the
        // pass, as in the vectorized caller)
        std::vector<double> snap(A, 0.0);
        for (int64_t x : live) snap[x] = avg(x);

        std::vector<int64_t> dist(V, 0), from_edge(V, -1), stamp(V, -1);
        using QItem = std::pair<int64_t, int64_t>;
        std::priority_queue<QItem, std::vector<QItem>, std::greater<QItem>> heap;
        std::vector<int64_t> path;
        int64_t removed = 0;
        for (size_t ci = 0; ci < cand.size(); ++ci) {
            int64_t e = cand[ci].x;
            if (!alive[e]) continue;
            int64_t u = st[e], w = en[e], ecj = cj[e];
            int64_t elen = klen[e];
            double deltad = max_delta > max_rel_delta * (double)elen
                                ? max_delta
                                : max_rel_delta * (double)elen;
            int64_t delta = (int64_t)deltad;
            int64_t bound = elen + delta;
            int64_t gen = (int64_t)ci;
            while (!heap.empty()) heap.pop();
            dist[u] = 0;
            stamp[u] = gen;
            from_edge[u] = -1;
            heap.emplace(0, u);
            bool found = false;
            while (!heap.empty()) {
                auto [d, v] = heap.top();
                heap.pop();
                if (stamp[v] != gen || d > dist[v]) continue;
                if (v == w) {
                    found = true;
                    break;
                }
                for (int64_t i2 = off[v]; i2 < off[v + 1]; ++i2) {
                    int64_t a = edges[i2];
                    if (!alive[a] || a == e || a == ecj) continue;
                    int64_t t = en[a];
                    int64_t nd = d + klen[a];
                    if (nd > bound) continue;
                    if (stamp[t] != gen || nd < dist[t]) {
                        stamp[t] = gen;
                        dist[t] = nd;
                        from_edge[t] = a;
                        heap.emplace(nd, t);
                    }
                }
            }
            if (!found) continue;
            int64_t plen = dist[w];
            if (plen - elen > delta || elen - plen > delta) continue;
            path.clear();
            double pcov = 1e300;
            for (int64_t v = w; v != u;) {
                int64_t a = from_edge[v];
                path.push_back(a);
                if (snap[a] < pcov) pcov = snap[a];
                v = st[a];
            }
            if (snap[e] > max_rel_cov * pcov) continue;
            double denom = plen > 0 ? (double)plen : 1.0;
            for (int64_t a : path) {
                double share = cov[e] * ((double)klen[a] / denom);
                cov[a] += share;
                cov[cj[a]] += share;
                mark_edge(a);
            }
            removed += kill(e);
        }
        return removed;
    }

    // ---- erroneous-connection remover (basic low-coverage condition) -----
    int64_t low_cov_ec(int64_t max_len, double cov_bound) {
        PassTimer tm("low_cov_ec");
        refresh_live();
        if (live.empty()) return 0;
        degrees();
        std::vector<int64_t> kills;
        for (int64_t x : live) {
            if (klen[x] > max_len) continue;
            if (avg(x) >= cov_bound) continue;
            if (od[st[x]] <= 1 || idg[en[x]] <= 1) continue;
            kills.push_back(x);
        }
        int64_t n = 0;
        for (int64_t x : kills) n += kill(x);
        return n;
    }

    // ---- relative-coverage disconnector (relative_coverage_remover.hpp) --
    int64_t rel_cov_disconnect(double ratio, int64_t max_len) {
        refresh_live();
        if (live.empty()) return 0;
        degrees();
        std::vector<double> out_sum(V, 0.0), in_sum(V, 0.0);
        for (int64_t x : live) {
            double c = avg(x);
            out_sum[st[x]] += c;
            in_sum[en[x]] += c;
        }
        std::vector<int64_t> kills;
        for (int64_t x : live) {
            int64_t s = st[x], e = en[x];
            double c = avg(x);
            double start_alt = std::max(out_sum[s] - c, in_sum[s]);
            double end_alt = std::max(in_sum[e] - c, out_sum[e]);
            if (!(c * ratio <= start_alt && c * ratio <= end_alt)) continue;
            if (klen[x] > max_len) continue;
            if (!(od[s] + idg[s] > 1 && od[e] + idg[e] > 1)) continue;
            kills.push_back(x);
        }
        int64_t n = 0;
        for (int64_t x : kills) n += kill(x);
        return n;
    }
};

}  // namespace

struct StbrSimpOut {
    int64_t n_edges;
    int64_t n_arcs_total;
    int64_t* chain_off;   // n_edges+1
    int64_t* chain_arcs;  // oriented arc (input-edge) subset indices
    int64_t* e_start;
    int64_t* e_end;
    int64_t* e_conj;  // index into the output edge list
    int64_t* e_klen;
    double* e_cov;
    // materialized sequences (want_seq mode): merged base pool + offsets
    int64_t pool_size;
    uint8_t* seq_pool;
    int64_t* e_off;  // n_edges
    int64_t n_glues;
    int64_t* glue_arm_off;  // n_glues+1
    int64_t* glue_arm_arcs;
    int64_t* glue_keep_off;  // n_glues+1
    int64_t* glue_keep_arcs;
    int64_t tips, bulges, ec, isolated, iterations;
    int32_t error;
};

extern "C" void stbr_free_simp(StbrSimpOut* o) {
    if (!o) return;
    std::free(o->chain_off);
    std::free(o->chain_arcs);
    std::free(o->e_start);
    std::free(o->e_end);
    std::free(o->e_conj);
    std::free(o->e_klen);
    std::free(o->e_cov);
    std::free(o->seq_pool);
    std::free(o->e_off);
    std::free(o->glue_arm_off);
    std::free(o->glue_arm_arcs);
    std::free(o->glue_keep_off);
    std::free(o->glue_keep_arcs);
    std::free(o);
}

static int64_t* copy64(const std::vector<int64_t>& v) {
    int64_t* p = (int64_t*)std::malloc((v.size() ? v.size() : 1) * sizeof(int64_t));
    if (p && v.size()) std::memcpy(p, v.data(), v.size() * sizeof(int64_t));
    return p;
}

// Full simplification schedule (simplification.cpp:405-429 shape).  Inputs
// describe the ALIVE oriented edges of the current graph (the "arcs"): conj
// indices refer into this subset; klen is edge length in k-mer units.
extern "C" StbrSimpOut* stbr_simplify(
    int64_t A, int64_t V, const int64_t* a_start, const int64_t* a_end,
    const int64_t* a_conj, const int64_t* a_klen, const double* a_cov,
    const int64_t* v_conj,
    // schedule config
    int32_t cycle_iter_count, int64_t tip_len_1, int64_t tip_len_2,
    double tip_cb1, double auto_cb, double rctc,
    int32_t br_enabled, int64_t br_max_len, double max_delta,
    double max_rel_delta, double max_rel_cov,
    int64_t ec_len, int32_t rel_cov_enabled, double rel_cov_ratio,
    int32_t record_glue, int32_t retrigger,
    // sequence materialization: original base pool + per-arc offsets
    // (nt offsets into arc_seq_pool; arc i spans a_klen[i] + k bases)
    const uint8_t* arc_seq_pool, const int64_t* arc_seq_off, int32_t k,
    int32_t want_seq) {
    StbrSimpOut* out = (StbrSimpOut*)std::calloc(1, sizeof(StbrSimpOut));
    if (!out) return nullptr;
    Engine eng;
    eng.A = A;
    eng.V = V;
    eng.v_conj = v_conj;
    eng.next_arc.assign(A, -1);
    eng.st.assign(a_start, a_start + A);
    eng.en.assign(a_end, a_end + A);
    eng.cj.assign(a_conj, a_conj + A);
    eng.klen.assign(a_klen, a_klen + A);
    eng.cov.assign(a_cov, a_cov + A);
    eng.alive.assign(A, 1);
    eng.head.resize(A);
    eng.tail.resize(A);
    for (int64_t i = 0; i < A; ++i) eng.head[i] = eng.tail[i] = i;
    eng.live.resize(A);
    for (int64_t i = 0; i < A; ++i) eng.live[i] = i;
    eng.od.assign(V, 0);
    eng.idg.assign(V, 0);
    eng.vout.assign(V, -1);
    eng.owner.assign(A, -1);
    eng.last_slot.assign(A, -1);
    eng.visited.assign(A, 0);
    eng.vmod.assign(V, -1);
    eng.retrigger = retrigger != 0;

    bool cb_finite = std::isfinite(auto_cb);
    for (int32_t it = 0; it < cycle_iter_count; ++it) {
        eng.iterations = it + 1;
        double frac = (double)(it + 1) / (double)cycle_iter_count;
        double icb = cb_finite ? auto_cb * frac : INFINITY;
        int64_t changed = 0;
        int64_t n = eng.clip_tips(tip_len_1, tip_cb1, rctc);
        n += eng.clip_tips(tip_len_2, auto_cb, /*rctc=*/-1.0);
        if (n) eng.compress();
        eng.tips += n;
        changed += n;
        if (br_enabled) {
            n = eng.simple_bulges(br_max_len, max_delta, max_rel_delta,
                                  max_rel_cov, record_glue != 0);
            n += eng.dijkstra_bulges(br_max_len, max_delta, max_rel_delta,
                                     max_rel_cov);
            if (n) eng.compress();
            eng.bulges += n;
            changed += n;
        }
        n = eng.low_cov_ec(ec_len, icb);
        if (rel_cov_enabled)
            n += eng.rel_cov_disconnect(rel_cov_ratio, ec_len * 5);
        if (n) eng.compress();
        eng.ec += n;
        changed += n;
        if (changed == 0 && frac >= 1.0) break;
        if (changed == 0 && !cb_finite) break;
    }

    // ---- outputs: survivors ordered by head arc (== compress id order) ---
    eng.refresh_live();
    std::vector<int64_t> surv(eng.live);
    std::sort(surv.begin(), surv.end(),
              [&](int64_t a, int64_t b) { return eng.head[a] < eng.head[b]; });
    int64_t E = (int64_t)surv.size();
    std::vector<int64_t> slot2out(A, -1);
    for (int64_t i = 0; i < E; ++i) slot2out[surv[i]] = i;
    std::vector<int64_t> chain_off(1, 0), chain_arcs;
    chain_arcs.reserve(A);
    std::vector<int64_t> es(E), ee(E), ec_(E), ekl(E);
    std::vector<double> ecv(E);
    for (int64_t i = 0; i < E; ++i) {
        int64_t x = surv[i];
        eng.push_chain(x, chain_arcs);
        chain_off.push_back((int64_t)chain_arcs.size());
        es[i] = eng.st[x];
        ee[i] = eng.en[x];
        ec_[i] = slot2out[eng.cj[x]];
        ekl[i] = eng.klen[x];
        ecv[i] = eng.cov[x];
        if (ec_[i] < 0) {
            out->error = 2;  // conjugate invariant broken
        }
    }
    // sequence materialization: one sequential sweep, memcpy per arc (the
    // compress.py ragged copy moved into native code)
    if (want_seq && arc_seq_pool && arc_seq_off) {
        int64_t pool = 0;
        for (int64_t i = 0; i < E; ++i) pool += ekl[i] + k;
        out->e_off = (int64_t*)std::malloc((E ? E : 1) * sizeof(int64_t));
        out->seq_pool = (uint8_t*)std::malloc(pool ? pool : 1);
        out->pool_size = pool;
        if (out->e_off && out->seq_pool) {
            int64_t pos = 0;
            for (int64_t i = 0; i < E; ++i) {
                out->e_off[i] = pos;
                int64_t a0 = chain_arcs[chain_off[i]];
                std::memcpy(out->seq_pool + pos, arc_seq_pool + arc_seq_off[a0],
                            (size_t)k);
                pos += k;
                for (int64_t c = chain_off[i]; c < chain_off[i + 1]; ++c) {
                    int64_t a = chain_arcs[c];
                    std::memcpy(out->seq_pool + pos,
                                arc_seq_pool + arc_seq_off[a] + k,
                                (size_t)a_klen[a]);
                    pos += a_klen[a];
                }
            }
        } else {
            out->error = 1;
        }
    }
    out->n_edges = E;
    out->n_arcs_total = (int64_t)chain_arcs.size();
    out->chain_off = copy64(chain_off);
    out->chain_arcs = copy64(chain_arcs);
    out->e_start = copy64(es);
    out->e_end = copy64(ee);
    out->e_conj = copy64(ec_);
    out->e_klen = copy64(ekl);
    out->e_cov = (double*)std::malloc((E ? E : 1) * sizeof(double));
    if (out->e_cov && E) std::memcpy(out->e_cov, ecv.data(), E * sizeof(double));
    out->n_glues = (int64_t)eng.glue_arm_off.size() - 1;
    out->glue_arm_off = copy64(eng.glue_arm_off);
    out->glue_arm_arcs = copy64(eng.glue_arm_arcs);
    out->glue_keep_off = copy64(eng.glue_keep_off);
    out->glue_keep_arcs = copy64(eng.glue_keep_arcs);
    out->tips = eng.tips;
    out->bulges = eng.bulges;
    out->ec = eng.ec;
    out->isolated = eng.isolated;
    out->iterations = eng.iterations;
    if (!out->chain_off || !out->chain_arcs || !out->e_start || !out->e_end ||
        !out->e_conj || !out->e_klen || !out->e_cov || !out->glue_arm_off ||
        !out->glue_arm_arcs || !out->glue_keep_off || !out->glue_keep_arcs)
        out->error = 1;
    return out;
}
