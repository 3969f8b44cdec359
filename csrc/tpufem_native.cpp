// tpufem native setup runtime.
//
// Reference analogue: the C++ host side of MatrixFreeGpu::reinit — the
// per-cell walks deal.II performs for graph coloring, neighbor finding and
// constraint setup (SURVEY.md §3.2).  These are the setup loops that are
// genuinely scalar/irregular (hash probing, first-fit bitmasks) and thus a
// poor fit for numpy vectorization; everything device-side stays JAX/Pallas.
//
// Exposed via a plain C ABI consumed with ctypes (tpufem.utils.native);
// every entry point has a numpy fallback so the Python package works
// without the compiled library.

#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

using std::size_t;

extern "C" {

// Greedy first-fit cell coloring with conflict = shared DoFs.
// (coloring.h / GraphColoring::make_graph_coloring analogue, SURVEY.md §2.)
// cell_dofs: nc x nn int32 row-major; colors_out: nc int32.
// Returns the number of colors, or -1 if more than 64 would be needed.
int32_t tpufem_greedy_color(const int32_t* cell_dofs, int64_t nc, int64_t nn,
                            int64_t n_dofs, int32_t* colors_out) {
  std::vector<uint64_t> dof_mask(static_cast<size_t>(n_dofs), 0);
  int32_t n_colors = 0;
  for (int64_t c = 0; c < nc; ++c) {
    const int32_t* row = cell_dofs + c * nn;
    uint64_t used = 0;
    for (int64_t j = 0; j < nn; ++j) used |= dof_mask[row[j]];
    int32_t col = 0;
    while ((used >> col) & 1ull) {
      ++col;
      if (col >= 64) return -1;
    }
    colors_out[c] = col;
    const uint64_t bit = 1ull << col;
    for (int64_t j = 0; j < nn; ++j) dof_mask[row[j]] |= bit;
    if (col + 1 > n_colors) n_colors = col + 1;
  }
  return n_colors;
}

// Coarse face-neighbor detection on a 2:1-balanced forest
// (hanging_nodes.cuh setup analogue, SURVEY.md §2).
// origins: nc x dim int64 row-major; sizes: nc int64; out: nc x dim x 2
// int64 = index of the DOUBLE-size neighbor across face (axis, side), or -1.
void tpufem_coarse_face_neighbors(const int64_t* origins,
                                  const int64_t* sizes, int64_t nc,
                                  int32_t dim, int64_t U, int64_t* out) {
  // hash leaves by (size, grid index)
  struct Key {
    int64_t s, a, b, c;
    bool operator==(const Key& o) const {
      return s == o.s && a == o.a && b == o.b && c == o.c;
    }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      uint64_t h = 1469598103934665603ull;
      for (int64_t v : {k.s, k.a, k.b, k.c}) {
        h ^= static_cast<uint64_t>(v);
        h *= 1099511628211ull;
      }
      return static_cast<size_t>(h);
    }
  };
  std::unordered_map<Key, int64_t, KeyHash> leaves;
  leaves.reserve(static_cast<size_t>(nc) * 2);
  for (int64_t c = 0; c < nc; ++c) {
    const int64_t s = sizes[c];
    Key k{s, origins[c * dim + 0] / s,
          dim > 1 ? origins[c * dim + 1] / s : 0,
          dim > 2 ? origins[c * dim + 2] / s : 0};
    leaves.emplace(k, c);
  }
  for (int64_t c = 0; c < nc; ++c) {
    const int64_t s = sizes[c];
    const int64_t S = 2 * s;
    for (int32_t axis = 0; axis < dim; ++axis) {
      for (int32_t side = 0; side < 2; ++side) {
        int64_t& slot = out[(c * dim + axis) * 2 + side];
        slot = -1;
        const int64_t w = origins[c * dim + axis] + s * side;
        if (w == 0 || w == U) continue;
        const int64_t ax_origin = side == 1 ? w : w - S;
        if (ax_origin < 0 || ax_origin % S != 0) continue;
        int64_t co[3] = {0, 0, 0};
        for (int32_t a = 0; a < dim; ++a)
          co[a] = (origins[c * dim + a] / S) * S;
        co[axis] = ax_origin;
        Key k{S, co[0] / S, dim > 1 ? co[1] / S : 0,
              dim > 2 ? co[2] / S : 0};
        auto it = leaves.find(k);
        if (it != leaves.end()) slot = it->second;
      }
    }
  }
}

// Transpose incidence map: for each DoF, the padded list of flat
// (cell*nn + local) positions referencing it (scatter_incidence data,
// SURVEY.md §2 parallelism item 4).  counts_out must be zeroed (n_dofs).
// Returns max multiplicity K; call once with incidence_out == nullptr to
// size the output, then again with a (n_dofs x K) buffer prefilled with
// pad_value.
int64_t tpufem_build_incidence(const int32_t* cell_dofs, int64_t nc,
                               int64_t nn, int64_t n_dofs,
                               int64_t* counts_out, int32_t* incidence_out,
                               int64_t K, int32_t pad_value) {
  if (incidence_out == nullptr) {
    int64_t maxc = 0;
    for (int64_t i = 0; i < nc * nn; ++i) {
      const int64_t d = cell_dofs[i];
      if (++counts_out[d] > maxc) maxc = counts_out[d];
    }
    return maxc;
  }
  for (int64_t i = 0; i < nc * nn; ++i) {
    const int64_t d = cell_dofs[i];
    incidence_out[d * K + counts_out[d]++] = static_cast<int32_t>(i);
  }
  return K;
}

}  // extern "C"
