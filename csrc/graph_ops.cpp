// Native host-side graph construction for preprocessing.
//
// Replaces the reference's third-party native deps on the host path
// (scipy cdist + python loops in process_mols.py:336-353,471): cell-list
// neighbor search in O(n) for receptor C-alpha kNN graphs and all-atom
// radius graphs (tens of thousands of atoms per complex -- the python
// fallback is the preprocessing bottleneck).
//
// Exposed as extern "C" for ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC graph_ops.cpp -o libgraph_ops.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct CellGrid {
  float cell;
  std::unordered_map<int64_t, std::vector<int>> cells;

  static int64_t key(int ix, int iy, int iz) {
    return (static_cast<int64_t>(ix) & 0x1FFFFF) |
           ((static_cast<int64_t>(iy) & 0x1FFFFF) << 21) |
           ((static_cast<int64_t>(iz) & 0x1FFFFF) << 42);
  }

  CellGrid(const float* pos, int n, float cell_size) : cell(cell_size) {
    cells.reserve(n);
    for (int i = 0; i < n; ++i) {
      int ix = static_cast<int>(std::floor(pos[3 * i] / cell));
      int iy = static_cast<int>(std::floor(pos[3 * i + 1] / cell));
      int iz = static_cast<int>(std::floor(pos[3 * i + 2] / cell));
      cells[key(ix, iy, iz)].push_back(i);
    }
  }

  template <typename F>
  void for_neighbors(const float* p, F&& fn) const {
    int ix = static_cast<int>(std::floor(p[0] / cell));
    int iy = static_cast<int>(std::floor(p[1] / cell));
    int iz = static_cast<int>(std::floor(p[2] / cell));
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = cells.find(key(ix + dx, iy + dy, iz + dz));
          if (it == cells.end()) continue;
          for (int j : it->second) fn(j);
        }
  }
};

inline float dist2(const float* a, const float* b) {
  float dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
  return dx * dx + dy * dy + dz * dz;
}

}  // namespace

extern "C" {

// kNN graph with the reference's exact semantics (process_mols.py:336-353):
// all neighbors under `cutoff`, capped at the `max_neighbors` nearest; a node
// with no neighbor under the cutoff connects to its single nearest neighbor.
// Returns the number of edges written (<= capacity).
int knn_edges(const float* pos, int n, float cutoff, int max_neighbors,
              int32_t* out_src, int32_t* out_dst, int capacity) {
  if (n <= 1) return 0;
  CellGrid grid(pos, n, std::max(cutoff, 1e-3f));
  float c2 = cutoff * cutoff;
  std::vector<std::pair<float, int>> nb;
  int m = 0;
  for (int i = 0; i < n; ++i) {
    nb.clear();
    grid.for_neighbors(pos + 3 * i, [&](int j) {
      if (j == i) return;
      float d2 = dist2(pos + 3 * i, pos + 3 * j);
      if (d2 < c2) nb.emplace_back(d2, j);
    });
    if (static_cast<int>(nb.size()) > max_neighbors && max_neighbors > 0) {
      std::partial_sort(nb.begin(), nb.begin() + max_neighbors, nb.end());
      nb.resize(max_neighbors);
    }
    if (nb.empty()) {
      // brute-force nearest (rare; isolated node)
      float best = 1e30f;
      int bj = -1;
      for (int j = 0; j < n; ++j) {
        if (j == i) continue;
        float d2 = dist2(pos + 3 * i, pos + 3 * j);
        if (d2 < best) { best = d2; bj = j; }
      }
      if (bj >= 0) nb.emplace_back(best, bj);
    }
    for (auto& [d2, j] : nb) {
      if (m >= capacity) return m;
      out_src[m] = i;
      out_dst[m] = j;
      ++m;
    }
  }
  return m;
}

// Bipartite radius pairs (torch_cluster.radius analogue): all (i, j) with
// |a_i - b_j| < cutoff.  Returns count written (<= capacity).
int radius_pairs(const float* pos_a, int na, const float* pos_b, int nb_,
                 float cutoff, int32_t* out_a, int32_t* out_b, int capacity) {
  CellGrid grid(pos_b, nb_, std::max(cutoff, 1e-3f));
  float c2 = cutoff * cutoff;
  int m = 0;
  for (int i = 0; i < na; ++i) {
    bool full = false;
    grid.for_neighbors(pos_a + 3 * i, [&](int j) {
      if (full) return;
      if (dist2(pos_a + 3 * i, pos_b + 3 * j) < c2) {
        if (m >= capacity) { full = true; return; }
        out_a[m] = i;
        out_b[m] = j;
        ++m;
      }
    });
    if (full) break;
  }
  return m;
}

// Pairwise min distance between two point sets (steric-clash metric).
float min_cross_distance(const float* a, int na, const float* b, int nb_) {
  float best = 1e30f;
  for (int i = 0; i < na; ++i)
    for (int j = 0; j < nb_; ++j) best = std::min(best, dist2(a + 3 * i, b + 3 * j));
  return std::sqrt(best);
}

// Bond-graph automorphism enumeration (element-labelled nodes, unlabelled
// edges) for symmetry-corrected RMSD -- the native replacement for the
// networkx VF2 fallback (reference uses compiled spyrmsd, utils/utils.py:84).
// Backtracking over vertices in BFS order from the rarest (element, degree,
// neighbor-element-multiset) class, pruning by exact adjacency consistency
// against all previously mapped vertices (bitset rows).  Writes up to
// max_count permutations (each n int32s) into out; returns the count.
int graph_automorphisms(const int32_t* elements, int n, const int32_t* bonds,
                        int n_bonds, int32_t* out, int max_count) {
  if (n <= 0 || max_count <= 0) return 0;
  const int words = (n + 63) / 64;
  std::vector<uint64_t> adj(static_cast<size_t>(n) * words, 0);
  std::vector<std::vector<int>> nbrs(n);
  for (int e = 0; e < n_bonds; ++e) {
    int a = bonds[2 * e], b = bonds[2 * e + 1];
    if (a < 0 || b < 0 || a >= n || b >= n) continue;
    adj[static_cast<size_t>(a) * words + b / 64] |= 1ull << (b % 64);
    adj[static_cast<size_t>(b) * words + a / 64] |= 1ull << (a % 64);
    nbrs[a].push_back(b);
    nbrs[b].push_back(a);
  }
  auto adjacent = [&](int a, int b) {
    return (adj[static_cast<size_t>(a) * words + b / 64] >> (b % 64)) & 1ull;
  };

  // initial class: (element, degree, sorted multiset of neighbor elements)
  std::vector<std::vector<int>> sig(n);
  for (int i = 0; i < n; ++i) {
    sig[i].push_back(elements[i]);
    sig[i].push_back(static_cast<int>(nbrs[i].size()));
    std::vector<int> ne;
    for (int j : nbrs[i]) ne.push_back(elements[j]);
    std::sort(ne.begin(), ne.end());
    sig[i].insert(sig[i].end(), ne.begin(), ne.end());
  }
  std::vector<int> cls(n);          // class id per vertex
  std::vector<int> cls_size;
  {
    std::vector<int> order(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    std::sort(order.begin(), order.end(),
              [&](int a, int b) { return sig[a] < sig[b]; });
    int cid = -1;
    for (size_t k = 0; k < order.size(); ++k) {
      if (k == 0 || sig[order[k]] != sig[order[k - 1]]) {
        ++cid;
        cls_size.push_back(0);
      }
      cls[order[k]] = cid;
      ++cls_size[cid];
    }
  }

  // vertex order: BFS from the vertex of the rarest class (ties: lowest id),
  // unvisited components appended the same way
  std::vector<int> order;
  order.reserve(n);
  std::vector<char> seen(n, 0);
  while (static_cast<int>(order.size()) < n) {
    int start = -1;
    for (int i = 0; i < n; ++i)
      if (!seen[i] && (start < 0 || cls_size[cls[i]] < cls_size[cls[start]]))
        start = i;
    std::vector<int> queue{start};
    seen[start] = 1;
    for (size_t q = 0; q < queue.size(); ++q) {
      int v = queue[q];
      order.push_back(v);
      for (int j : nbrs[v])
        if (!seen[j]) { seen[j] = 1; queue.push_back(j); }
    }
  }

  std::vector<int> map(n, -1), used(n, 0);
  int count = 0;
  // iterative backtracking over `order`
  std::vector<int> cand_pos(n, 0);
  int depth = 0;
  while (depth >= 0) {
    if (depth == n) {
      for (int i = 0; i < n; ++i) out[static_cast<size_t>(count) * n + i] = map[i];
      if (++count >= max_count) return count;
      --depth;
      if (depth >= 0) {
        used[map[order[depth]]] = 0;
        map[order[depth]] = -1;
      }
      continue;
    }
    int v = order[depth];
    int w = -1;
    for (int c = cand_pos[depth]; c < n; ++c) {
      if (used[c] || cls[c] != cls[v]) continue;
      bool ok = true;
      for (int d = 0; d < depth && ok; ++d) {
        int u = order[d];
        if (adjacent(v, u) != adjacent(c, map[u])) ok = false;
      }
      if (ok) { w = c; cand_pos[depth] = c + 1; break; }
    }
    if (w < 0) {
      cand_pos[depth] = 0;
      --depth;
      if (depth >= 0) {
        used[map[order[depth]]] = 0;
        map[order[depth]] = -1;
      }
      continue;
    }
    map[v] = w;
    used[w] = 1;
    ++depth;
  }
  return count;
}

}  // extern "C"
