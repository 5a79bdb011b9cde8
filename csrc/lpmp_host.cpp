// Native host-side combinatorial routines for lp_mp_tpu.
//
// TPU-native counterpart of the reference's vendored native libraries and
// host combinatorics: successive-shortest-path min-cost flow
// (lib/MinCost/MinCost.h), maxflow (lib/max_flow.hxx — Dinic here; the
// BK search-tree reuse optimization matters for repeated solves the new
// framework does not need), greedy additive edge contraction rounding and
// BFS cycle separation (graph.hxx:379-466, union_find.hxx).  These run
// once per tightening/rounding round on the host while the per-iteration
// compute stays on the TPU.
//
// Exposed as a C ABI consumed via ctypes (lp_mp_tpu/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <limits>
#include <queue>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// ---------------------------------------------------------------------------
// min-cost flow: successive shortest paths with potentials
// ---------------------------------------------------------------------------
struct Mcf {
  int n;
  std::vector<int> head;
  std::vector<double> cap, cost;
  std::vector<std::vector<int>> adj;

  explicit Mcf(int n_) : n(n_), adj(n_) {}

  void add_arc(int u, int v, double c, double w) {
    adj[u].push_back(static_cast<int>(head.size()));
    head.push_back(v); cap.push_back(c); cost.push_back(w);
    adj[v].push_back(static_cast<int>(head.size()));
    head.push_back(u); cap.push_back(0.0); cost.push_back(-w);
  }
};

}  // namespace

extern "C" {

// Solve min-cost flow.  Arrays: tails/heads/lowers/uppers/costs of length m;
// excess of length n; out_flows of length m (flow on each user edge).
// Returns objective, or NaN if infeasible.
double lpmp_mcf_solve(int n, int m, const int64_t* tails, const int64_t* heads,
                      const double* lowers, const double* uppers,
                      const double* costs, const double* excess_in,
                      double* out_flows) {
  Mcf g(n);
  std::vector<double> excess(excess_in, excess_in + n);
  double total = 0.0;
  for (int e = 0; e < m; ++e) {
    double lo = lowers[e];
    if (lo != 0.0) {
      excess[tails[e]] -= lo;
      excess[heads[e]] += lo;
      total += lo * costs[e];
    }
    g.add_arc(static_cast<int>(tails[e]), static_cast<int>(heads[e]),
              uppers[e] - lo, costs[e]);
  }

  std::vector<double> pot(n, 0.0);
  // Bellman-Ford init if negative costs present
  bool has_neg = false;
  for (int e = 0; e < m; ++e) has_neg |= (costs[e] < 0 && uppers[e] > lowers[e]);
  if (has_neg) {
    for (int it = 0; it < n; ++it) {
      bool changed = false;
      for (int u = 0; u < n; ++u) {
        for (int a : g.adj[u]) {
          if (g.cap[a] > 1e-12 && pot[u] + g.cost[a] < pot[g.head[a]] - 1e-12) {
            pot[g.head[a]] = pot[u] + g.cost[a];
            changed = true;
          }
        }
      }
      if (!changed) break;
    }
  }

  using QE = std::pair<double, int>;
  std::vector<double> dist(n);
  std::vector<int> par(n);
  std::vector<char> vis(n);
  for (;;) {
    int s = -1;
    for (int i = 0; i < n; ++i) if (excess[i] > 1e-12) { s = i; break; }
    if (s < 0) break;
    std::fill(dist.begin(), dist.end(), kInf);
    std::fill(par.begin(), par.end(), -1);
    std::fill(vis.begin(), vis.end(), 0);
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    dist[s] = 0.0;
    pq.push({0.0, s});
    while (!pq.empty()) {
      auto [d, u] = pq.top(); pq.pop();
      if (vis[u]) continue;
      vis[u] = 1;
      for (int a : g.adj[u]) {
        if (g.cap[a] <= 1e-12) continue;
        int v = g.head[a];
        double nd = d + g.cost[a] + pot[u] - pot[v];
        if (nd < dist[v] - 1e-12) {
          dist[v] = nd;
          par[v] = a;
          pq.push({nd, v});
        }
      }
    }
    int t = -1; double best = kInf;
    for (int v = 0; v < n; ++v)
      if (excess[v] < -1e-12 && dist[v] < best) { best = dist[v]; t = v; }
    if (t < 0) return std::numeric_limits<double>::quiet_NaN();  // infeasible
    for (int v = 0; v < n; ++v)
      if (dist[v] < kInf) pot[v] += dist[v];
    double push = std::min(excess[s], -excess[t]);
    for (int v = t; v != s; v = g.head[par[v] ^ 1]) push = std::min(push, g.cap[par[v]]);
    for (int v = t; v != s; v = g.head[par[v] ^ 1]) {
      int a = par[v];
      g.cap[a] -= push;
      g.cap[a ^ 1] += push;
      total += push * g.cost[a];
    }
    excess[s] -= push;
    excess[t] += push;
  }
  if (out_flows)
    for (int e = 0; e < m; ++e) out_flows[e] = g.cap[2 * e + 1] + lowers[e];
  return total;
}

// ---------------------------------------------------------------------------
// union-find
// ---------------------------------------------------------------------------
static int uf_find(std::vector<int>& p, int x) {
  while (p[x] != x) { p[x] = p[p[x]]; x = p[x]; }
  return x;
}

// Greedy additive edge contraction for multicut.  Edge costs are PAID when
// cut; contract the most positive aggregate edges first.  O(E log E)-ish:
// per-component adjacency hash maps merged smaller-into-larger, a single
// lazy-deletion max-heap (stale entries detected by comparing the stored
// weight against the live adjacency), no global rebuilds.  Writes
// contiguous component labels into out_labels[n].
void lpmp_gaec(int n, int m, const int64_t* us, const int64_t* vs,
               const double* ws, int64_t* out_labels) {
  std::vector<int> parent(n);
  for (int i = 0; i < n; ++i) parent[i] = i;

  std::vector<int> deg(n, 0);
  for (int e = 0; e < m; ++e) {
    if (us[e] == vs[e]) continue;
    ++deg[us[e]];
    ++deg[vs[e]];
  }
  std::vector<std::unordered_map<int, double>> adj(n);
  for (int i = 0; i < n; ++i)
    if (deg[i]) { adj[i].max_load_factor(0.7f); adj[i].reserve(deg[i]); }
  for (int e = 0; e < m; ++e) {
    int a = static_cast<int>(us[e]), b = static_cast<int>(vs[e]);
    if (a == b) continue;
    adj[a][b] += ws[e];
    adj[b][a] += ws[e];
  }
  struct QE { double w; int a, b; };
  struct Cmp { bool operator()(const QE& x, const QE& y) const { return x.w < y.w; } };
  std::priority_queue<QE, std::vector<QE>, Cmp> pq;
  for (int a = 0; a < n; ++a)
    for (auto& [b, w] : adj[a])
      if (a < b && w > 0) pq.push({w, a, b});

  while (!pq.empty()) {
    auto [w, a, b] = pq.top(); pq.pop();
    if (w <= 0) break;
    // stale if either endpoint was merged away or the weight changed
    if (parent[a] != a || parent[b] != b) continue;
    auto it = adj[a].find(b);
    if (it == adj[a].end() || it->second != w) continue;
    // merge smaller adjacency into larger
    if (adj[a].size() < adj[b].size()) std::swap(a, b);
    parent[b] = a;
    adj[a].erase(b);
    adj[b].erase(a);
    for (auto& [c, wc] : adj[b]) {
      adj[c].erase(b);
      double& wn = adj[a][c];
      wn += wc;
      adj[c][a] = wn;
      if (wn > 0) pq.push({wn, std::min(a, c), std::max(a, c)});
    }
    std::unordered_map<int, double>().swap(adj[b]);
  }
  // contiguous ids
  std::vector<int64_t> id(n, -1);
  int64_t next_id = 0;
  for (int i = 0; i < n; ++i) {
    int r = uf_find(parent, i);
    if (id[r] < 0) id[r] = next_id++;
    out_labels[i] = id[r];
  }
}

// ---------------------------------------------------------------------------
// maxflow (Dinic) on an undirected-capacity graph; returns flow value and
// writes the source-side min-cut indicator into out_side[n].
// ---------------------------------------------------------------------------
double lpmp_maxflow(int n, int m, const int64_t* us, const int64_t* vs,
                    const double* cap_uv, const double* cap_vu,
                    int s, int t, int64_t* out_side) {
  std::vector<int> head_, nxt_, start(n, -1);
  std::vector<double> cap_;
  auto add = [&](int u, int v, double c) {
    head_.push_back(v); cap_.push_back(c); nxt_.push_back(start[u]);
    start[u] = static_cast<int>(head_.size()) - 1;
  };
  for (int e = 0; e < m; ++e) {
    add(static_cast<int>(us[e]), static_cast<int>(vs[e]), cap_uv[e]);
    add(static_cast<int>(vs[e]), static_cast<int>(us[e]), cap_vu[e]);
  }
  std::vector<int> level(n), it(n);
  auto bfs = [&]() {
    std::fill(level.begin(), level.end(), -1);
    std::queue<int> q;
    q.push(s); level[s] = 0;
    while (!q.empty()) {
      int u = q.front(); q.pop();
      for (int a = start[u]; a >= 0; a = nxt_[a])
        if (cap_[a] > 1e-12 && level[head_[a]] < 0) {
          level[head_[a]] = level[u] + 1;
          q.push(head_[a]);
        }
    }
    return level[t] >= 0;
  };
  std::function<double(int, double)> dfs = [&](int u, double f) -> double {
    if (u == t) return f;
    for (int& a = it[u]; a >= 0; a = nxt_[a]) {
      int v = head_[a];
      if (cap_[a] > 1e-12 && level[v] == level[u] + 1) {
        double d = dfs(v, std::min(f, cap_[a]));
        if (d > 1e-12) {
          cap_[a] -= d;
          cap_[a ^ 1] += d;
          return d;
        }
      }
    }
    return 0.0;
  };
  double flow = 0.0;
  while (bfs()) {
    for (int i = 0; i < n; ++i) it[i] = start[i];
    double f;
    while ((f = dfs(s, kInf)) > 1e-12) flow += f;
  }
  if (out_side) {
    for (int i = 0; i < n; ++i) out_side[i] = (level[i] >= 0) ? 1 : 0;
  }
  return flow;
}

// ---------------------------------------------------------------------------
// BFS widest-threshold path (graph.hxx bfs_data::find_path analogue):
// among edges with weight > threshold, find a path src->dst; returns its
// length (#nodes) written into out_path (capacity max_len), 0 if none.
// ---------------------------------------------------------------------------
int lpmp_bfs_path(int n, int m, const int64_t* us, const int64_t* vs,
                  const double* ws, int src, int dst, double threshold,
                  int64_t* out_path, int max_len) {
  std::vector<std::vector<std::pair<int, double>>> adj(n);
  for (int e = 0; e < m; ++e) {
    adj[us[e]].push_back({static_cast<int>(vs[e]), ws[e]});
    adj[vs[e]].push_back({static_cast<int>(us[e]), ws[e]});
  }
  std::vector<int> par(n, -2);
  std::queue<int> q;
  q.push(src); par[src] = -1;
  while (!q.empty()) {
    int u = q.front(); q.pop();
    if (u == dst) break;
    for (auto& [v, w] : adj[u])
      if (w > threshold && par[v] == -2) {
        par[v] = u;
        q.push(v);
      }
  }
  if (par[dst] == -2) return 0;
  std::vector<int64_t> rev;
  for (int v = dst; v >= 0; v = par[v]) rev.push_back(v);
  if (static_cast<int>(rev.size()) > max_len) return -static_cast<int>(rev.size());
  std::reverse(rev.begin(), rev.end());
  std::copy(rev.begin(), rev.end(), out_path);
  return static_cast<int>(rev.size());
}

// ---------------------------------------------------------------------------
// Schedule compilation (engine host path; the reference walks factors
// sequentially, LP_MP.h:869-1005 — the TPU engine needs the phase
// decomposition below, which is pure sequential graph-walking and therefore
// native).  Adjacency is CSR over factor ids (message endpoints, both
// directions).
// ---------------------------------------------------------------------------

// levelize (schedule.levelize semantics): place each updated factor, in
// sweep order, into the earliest phase after every earlier factor whose
// touch-set (self + neighbors) intersects its own.  Writes phase id per
// factor into out_phase (-1 = not scheduled); returns #phases.
int64_t lpmp_levelize(int64_t n, const int64_t* order, int64_t n_order,
                      const int64_t* indptr, const int64_t* indices,
                      const uint8_t* updated, int64_t* out_phase) {
  std::vector<int64_t> taken(n, -1);
  int64_t n_phases = 0;
  for (int64_t k = 0; k < n_order; ++k) {
    const int64_t f = order[k];
    if (!updated[f]) continue;
    int64_t p = taken[f];
    for (int64_t e = indptr[f]; e < indptr[f + 1]; ++e)
      p = std::max(p, taken[indices[e]]);
    p += 1;
    out_phase[f] = p;
    n_phases = std::max(n_phases, p + 1);
    if (taken[f] < p) taken[f] = p;
    for (int64_t e = indptr[f]; e < indptr[f + 1]; ++e)
      if (taken[indices[e]] < p) taken[indices[e]] = p;
  }
  return n_phases;
}

// distance-2 greedy coloring over updated factors (schedule.coloring_order
// conflict rule: direct adjacency or shared neighbor); returns #colors.
int64_t lpmp_color2(int64_t n, const int64_t* indptr, const int64_t* indices,
                    const uint8_t* updated, int64_t* color) {
  std::vector<int64_t> used_stamp;  // color -> last factor that saw it
  used_stamp.reserve(64);
  int64_t n_colors = 0;
  for (int64_t f = 0; f < n; ++f) color[f] = -1;
  for (int64_t f = 0; f < n; ++f) {
    if (!updated[f]) continue;
    auto mark = [&](int64_t g) {
      if (g != f && updated[g] && color[g] >= 0) {
        const int64_t c = color[g];
        if (c >= static_cast<int64_t>(used_stamp.size()))
          used_stamp.resize(c + 1, -1);
        used_stamp[c] = f;
      }
    };
    for (int64_t e = indptr[f]; e < indptr[f + 1]; ++e) {
      const int64_t h = indices[e];
      mark(h);
      for (int64_t e2 = indptr[h]; e2 < indptr[h + 1]; ++e2)
        mark(indices[e2]);
    }
    int64_t c = 0;
    while (c < static_cast<int64_t>(used_stamp.size()) && used_stamp[c] == f)
      ++c;
    color[f] = c;
    n_colors = std::max(n_colors, c + 1);
  }
  return n_colors;
}

// Batched BFS path queries: build the thresholded adjacency ONCE, answer k
// (src, dst) queries (cycle separation runs thousands per tighten round on
// one reparametrized graph — rebuilding adjacency per query is O(k*m)).
// out_paths is [k * max_len]; out_lens[q] = path length (0 = none/too long);
// out_bottleneck[q] = min edge weight along the path.
int64_t lpmp_bfs_paths(int64_t n, int64_t m, const int64_t* us,
                       const int64_t* vs, const double* ws, int64_t k,
                       const int64_t* srcs, const int64_t* dsts,
                       double threshold, int64_t max_len, int64_t* out_paths,
                       int64_t* out_lens, double* out_bottleneck) {
  // CSR over arcs with weight > threshold
  std::vector<int64_t> deg(n + 1, 0);
  for (int64_t e = 0; e < m; ++e)
    if (ws[e] > threshold) { ++deg[us[e] + 1]; ++deg[vs[e] + 1]; }
  for (int64_t i = 0; i < n; ++i) deg[i + 1] += deg[i];
  std::vector<int64_t> head(deg.back());
  std::vector<double> hw(deg.back());
  std::vector<int64_t> fill(deg.begin(), deg.end() - 1);
  for (int64_t e = 0; e < m; ++e)
    if (ws[e] > threshold) {
      head[fill[us[e]]] = vs[e]; hw[fill[us[e]]++] = ws[e];
      head[fill[vs[e]]] = us[e]; hw[fill[vs[e]]++] = ws[e];
    }
  std::vector<int64_t> par(n), stamp(n, -1);
  std::vector<double> parw(n);
  std::vector<int64_t> q(n);
  for (int64_t qq = 0; qq < k; ++qq) {
    const int64_t src = srcs[qq], dst = dsts[qq];
    out_lens[qq] = 0;
    out_bottleneck[qq] = 0.0;
    int64_t qh = 0, qt = 0;
    q[qt++] = src; stamp[src] = qq; par[src] = -1;
    bool found = (src == dst);
    while (qh < qt && !found) {
      const int64_t u = q[qh++];
      for (int64_t e = deg[u]; e < deg[u + 1]; ++e) {
        const int64_t v = head[e];
        if (stamp[v] != qq) {
          stamp[v] = qq; par[v] = u; parw[v] = hw[e];
          if (v == dst) { found = true; break; }
          q[qt++] = v;
        }
      }
    }
    if (!found) continue;
    int64_t len = 0;
    double bn = 1e300;
    for (int64_t v = dst; v >= 0; v = par[v]) {
      ++len;
      if (par[v] >= 0 && parw[v] < bn) bn = parw[v];
    }
    if (len > max_len) continue;
    out_lens[qq] = len;
    out_bottleneck[qq] = (len > 1) ? bn : 0.0;
    int64_t* p = out_paths + qq * max_len + len;
    for (int64_t v = dst; v >= 0; v = par[v]) *--p = v;
  }
  return 0;
}

}  // extern "C"
