// Native host-side graph-cut seam solver.
//
// Capability parity with detail::GraphCutSeamFinder(COST_COLOR_GRAD)
// (reference: stitch_global.cpp:616-619): pairwise seam placement as a
// min-cut on the 4-connected overlap grid. The Python layer builds the
// terminal / pairwise capacities (color + gradient costs at the <=8MP seam
// scale, reference stitch_global.cpp:585-589) and falls back to the DP
// seam finder when this library is unavailable — the same ladder the
// reference uses (GraphCut -> DpSeamFinder on failure).
//
// Exported C ABI:
//   tm_graphcut(h, w, cap_src, cap_snk, cap_h, cap_v, labels_out) -> flow
//     cap_src/cap_snk: (h*w) terminal capacities (float32)
//     cap_h: (h*(w-1)) symmetric horizontal neighbor capacities
//     cap_v: ((h-1)*w) symmetric vertical neighbor capacities
//     labels_out: (h*w) uint8; 1 = source side (image A), 0 = sink side
//
// Algorithm: Dinic's max-flow (BFS level graph + iterative blocking-flow
// DFS with current-arc pointers). Simple, deterministic, and easy to
// verify; grid seam graphs converge in few phases.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Arc {
  int head;
  float rcap;
};

class Dinic {
 public:
  explicit Dinic(int n) : n_(n), first_(n + 2) {
    // node n_ = source, n_ + 1 = sink
    for (auto& v : first_) v.reserve(6);
  }

  int src() const { return n_; }
  int snk() const { return n_ + 1; }

  void add_edge(int u, int v, float cap_uv, float cap_vu) {
    first_[u].push_back(static_cast<int>(arcs_.size()));
    arcs_.push_back(Arc{v, cap_uv});
    first_[v].push_back(static_cast<int>(arcs_.size()));
    arcs_.push_back(Arc{u, cap_vu});
  }

  double maxflow() {
    double total = 0.0;
    const int N = n_ + 2;
    std::vector<int> level(N);
    std::vector<size_t> it(N);
    std::vector<int> queue(N);

    while (true) {
      // BFS level graph from source
      std::fill(level.begin(), level.end(), -1);
      int qh = 0, qt = 0;
      queue[qt++] = src();
      level[src()] = 0;
      while (qh < qt) {
        int u = queue[qh++];
        for (int ai : first_[u]) {
          const Arc& a = arcs_[ai];
          if (a.rcap > 1e-12f && level[a.head] < 0) {
            level[a.head] = level[u] + 1;
            queue[qt++] = a.head;
          }
        }
      }
      if (level[snk()] < 0) break;
      std::fill(it.begin(), it.end(), 0);

      // blocking flow: iterative DFS with an explicit path stack
      std::vector<int> path;  // arc indices along the current path
      path.reserve(256);
      int u = src();
      while (true) {
        if (u == snk()) {
          float bn = 1e30f;
          for (int ai : path) bn = std::min(bn, arcs_[ai].rcap);
          for (int ai : path) {
            arcs_[ai].rcap -= bn;
            arcs_[ai ^ 1].rcap += bn;
          }
          total += bn;
          // retreat to the first saturated arc on the path
          size_t cut = 0;
          while (cut < path.size() && arcs_[path[cut]].rcap > 1e-12f)
            ++cut;
          path.resize(cut);
          u = path.empty() ? src() : arcs_[path.back()].head;
          continue;
        }
        bool advanced = false;
        for (; it[u] < first_[u].size(); ++it[u]) {
          int ai = first_[u][it[u]];
          const Arc& a = arcs_[ai];
          if (a.rcap > 1e-12f && level[a.head] == level[u] + 1) {
            path.push_back(ai);
            u = a.head;
            advanced = true;
            break;
          }
        }
        if (advanced) continue;
        // dead end: prune this node from the level graph and retreat
        level[u] = -1;
        if (path.empty()) break;
        int ai = path.back();
        path.pop_back();
        u = path.empty() ? src() : arcs_[path.back()].head;
        (void)ai;
      }
    }

    // min-cut side: nodes reachable from the source in the residual graph
    reach_.assign(N, 0);
    int qh = 0, qt = 0;
    std::vector<int> q(N);
    q[qt++] = src();
    reach_[src()] = 1;
    while (qh < qt) {
      int u = q[qh++];
      for (int ai : first_[u]) {
        const Arc& a = arcs_[ai];
        if (a.rcap > 1e-12f && !reach_[a.head]) {
          reach_[a.head] = 1;
          q[qt++] = a.head;
        }
      }
    }
    return total;
  }

  bool source_side(int i) const { return reach_[i] != 0; }

 private:
  int n_;
  std::vector<std::vector<int>> first_;
  std::vector<Arc> arcs_;
  std::vector<uint8_t> reach_;
};

}  // namespace

extern "C" {

double tm_graphcut(int h, int w, const float* cap_src,
                   const float* cap_snk, const float* cap_h,
                   const float* cap_v, unsigned char* labels_out) {
  const int n = h * w;
  Dinic g(n);
  for (int i = 0; i < n; ++i) {
    if (cap_src[i] > 0.0f) g.add_edge(g.src(), i, cap_src[i], 0.0f);
    if (cap_snk[i] > 0.0f) g.add_edge(i, g.snk(), cap_snk[i], 0.0f);
  }
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x + 1 < w; ++x) {
      float c = cap_h[y * (w - 1) + x];
      if (c > 0.0f) g.add_edge(y * w + x, y * w + x + 1, c, c);
    }
  }
  for (int y = 0; y + 1 < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float c = cap_v[y * w + x];
      if (c > 0.0f) g.add_edge(y * w + x, (y + 1) * w + x, c, c);
    }
  }
  double flow = g.maxflow();
  for (int i = 0; i < n; ++i) labels_out[i] = g.source_side(i) ? 1 : 0;
  return flow;
}

}  // extern "C"
