// Path-alternative bulge removal: sequential bounded Dijkstra over a CSR
// adjacency, candidates processed in ascending-coverage order.
//
// Native-runtime analog of the reference's BulgeRemover + bounded Dijkstra
// (`/root/reference/src/common/modules/simplification/bulge_remover.hpp:346`,
// `dijkstra/dijkstra_algorithm.hpp` bounded variants): the search is
// inherently sequential-per-candidate (each glue mutates coverage/liveness
// seen by later candidates), so it lives in the C++ host runtime rather than
// on-device; the graph itself stays in the flat conjugate-array form.
#include <cstdint>
#include <cstring>
#include <queue>
#include <utility>
#include <vector>

namespace {

struct Csr {
  std::vector<int64_t> off;    // V+1
  std::vector<int64_t> edges;  // out-edge ids grouped by start vertex
};

static Csr build_out_csr(int64_t n_edges, int64_t n_vertices,
                         const int64_t* e_start, const uint8_t* alive) {
  Csr csr;
  csr.off.assign(n_vertices + 1, 0);
  int64_t n_alive = 0;
  for (int64_t e = 0; e < n_edges; ++e)
    if (alive[e]) {
      ++csr.off[e_start[e] + 1];
      ++n_alive;
    }
  for (int64_t v = 0; v < n_vertices; ++v) csr.off[v + 1] += csr.off[v];
  csr.edges.resize(n_alive);
  std::vector<int64_t> cur(csr.off.begin(), csr.off.end() - 1);
  for (int64_t e = 0; e < n_edges; ++e)
    if (alive[e]) csr.edges[cur[e_start[e]]++] = e;
  return csr;
}

}  // namespace

extern "C" int64_t stbr_bulge_pass(
    int64_t n_edges, int64_t n_vertices, const int64_t* e_start,
    const int64_t* e_end, const int64_t* e_conj, const int64_t* lens,
    const double* avg_cov,  // average coverage snapshot (conditions)
    double* e_cov,          // coverage SUM, mutated by glue projection
    uint8_t* alive,         // mutated: killed arms (and conjugates)
    const int64_t* cand, int64_t n_cand, int64_t max_len, double max_delta,
    double max_rel_delta, double max_rel_cov) {
  Csr csr = build_out_csr(n_edges, n_vertices, e_start, alive);

  // stamped per-vertex state: no O(V) clear between candidates
  std::vector<int64_t> dist(n_vertices, 0);
  std::vector<int64_t> from_edge(n_vertices, -1);
  std::vector<int64_t> stamp(n_vertices, -1);
  using QItem = std::pair<int64_t, int64_t>;  // (dist, vertex)
  std::priority_queue<QItem, std::vector<QItem>, std::greater<QItem>> heap;
  std::vector<int64_t> path;

  int64_t removed = 0;
  for (int64_t ci = 0; ci < n_cand; ++ci) {
    const int64_t e = cand[ci];
    if (!alive[e]) continue;
    const int64_t u = e_start[e], w = e_end[e], ec = e_conj[e];
    const int64_t elen = lens[e];
    const int64_t delta = (int64_t)(max_delta > max_rel_delta * (double)elen
                                        ? max_delta
                                        : max_rel_delta * (double)elen);
    const int64_t bound = elen + delta;

    // bounded Dijkstra u -> w, skipping e and conj(e), honoring liveness
    const int64_t gen = ci;
    while (!heap.empty()) heap.pop();
    dist[u] = 0;
    stamp[u] = gen;
    from_edge[u] = -1;
    heap.emplace(0, u);
    bool found = false;
    while (!heap.empty()) {
      const auto [d, v] = heap.top();
      heap.pop();
      if (stamp[v] != gen || d > dist[v]) continue;
      if (v == w) {
        found = true;
        break;
      }
      for (int64_t i = csr.off[v]; i < csr.off[v + 1]; ++i) {
        const int64_t a = csr.edges[i];
        if (!alive[a] || a == e || a == ec) continue;
        const int64_t t = e_end[a];
        const int64_t nd = d + lens[a];
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
    const int64_t plen = dist[w];
    if (plen - elen > delta || elen - plen > delta) continue;
    path.clear();
    double pcov = 1e300;
    for (int64_t v = w; v != u;) {
      const int64_t a = from_edge[v];
      path.push_back(a);
      if (avg_cov[a] < pcov) pcov = avg_cov[a];
      v = e_start[a];
    }
    if (avg_cov[e] > max_rel_cov * pcov) continue;
    // glue: project the arm's coverage sum onto the path, then kill the pair
    const double denom = plen > 0 ? (double)plen : 1.0;
    for (int64_t a : path) {
      const double share = e_cov[e] * ((double)lens[a] / denom);
      e_cov[a] += share;
      e_cov[e_conj[a]] += share;
    }
    if (alive[e]) {
      alive[e] = 0;
      ++removed;
    }
    if (alive[ec]) {
      alive[ec] = 0;
      ++removed;
    }
  }
  return removed;
}
