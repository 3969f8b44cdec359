"""Graph coloring of cells so no two same-color cells share a DoF.

Reference analogue: ``coloring.h`` wrapping deal.II
``GraphColoring::make_graph_coloring`` with conflict indicator = the cell's
DoF set; cells within a color share no DoFs, making the scatter in
``distribute_local_to_global`` race-free without atomics (SURVEY.md §2
"Graph coloring", §2 parallelism item 4).  On TPU the same structure makes
the per-color scatter a *unique-indices* scatter, which XLA lowers far more
efficiently than a generic scatter-add.
"""

from __future__ import annotations

import numpy as np

from tpufem.fem.mesh import Mesh


def color_cells(mesh: Mesh, cell_dofs: np.ndarray) -> list[np.ndarray]:
    """Partition cells into colors; returns list of cell-index arrays.

    Uniform structured meshes use the exact 2^dim parity coloring (cells
    sharing any DoF differ by <= 1 in each axis index).  General (adaptive)
    meshes use greedy first-fit over the DoF-conflict graph.
    """
    if mesh.is_uniform:
        s = int(mesh.sizes[0])
        idx = mesh.origins // s  # (nc, d) cell lattice index
        color = np.zeros(mesh.n_cells, dtype=np.int64)
        for a in range(mesh.dim):
            color |= (idx[:, a] % 2) << a
        return [np.nonzero(color == c)[0].astype(np.int32)
                for c in range(2**mesh.dim) if np.any(color == c)]

    n_dofs = int(cell_dofs.max()) + 1
    dof_used = np.zeros(n_dofs, dtype=np.int64)  # bitmask of colors per dof
    nc = cell_dofs.shape[0]
    colors = np.empty(nc, dtype=np.int64)
    for c in range(nc):
        d = cell_dofs[c]
        used = np.bitwise_or.reduce(dof_used[d])
        col = _lowest_clear_bit(used)
        colors[c] = col
        dof_used[d] |= np.int64(1) << np.int64(col)
    ncol = int(colors.max()) + 1
    return [np.nonzero(colors == c)[0].astype(np.int32) for c in range(ncol)]


def _lowest_clear_bit(mask: int) -> int:
    b = 0
    while (int(mask) >> b) & 1:
        b += 1
        if b >= 62:
            raise RuntimeError("coloring exceeded 62 colors")
    return b


def verify_coloring(colors: list[np.ndarray], cell_dofs: np.ndarray) -> None:
    """Assert no two same-color cells share a DoF (the race-detection test
    the reference lacks — SURVEY.md §5 'Race detection')."""
    for cells in colors:
        d = cell_dofs[cells].ravel()
        if len(np.unique(d)) != len(d):
            raise AssertionError("coloring invalid: shared DoF within a color")
