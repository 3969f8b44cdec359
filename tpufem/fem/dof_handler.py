"""Q_p degree-of-freedom enumeration on structured (possibly adaptive) meshes.

Reference analogue: deal.II ``DoFHandler::distribute_dofs(FE_Q<dim>(p))`` as
consumed by the reference's setup path (SURVEY.md §3.1, §3.2).  The key
product is the SoA cell-to-global-DoF map the reference bakes into
``GpuData.local_to_global`` (SURVEY.md §2 "MatrixFreeGpu").

DoF identification is *entity based*, exactly deal.II's model: a DoF lives on
a vertex, an edge, a face (3D) or a cell interior, and is shared between cells
iff they share that entity (same integer endpoints AND same size).  A fine
edge that covers half of a coarse edge is a different entity — its DoFs are
separate (and hanging, to be constrained; see tpufem.fem.constraints).  This
is what makes adaptive meshes with GLL support points correct: lattice
hashing of node positions would spuriously unify fine node i with coarse node
i/2 even though their physical GLL positions differ.

Local DoF ordering within a cell is lexicographic with x fastest over the
(p+1)^dim node lattice — the ordering all sum-factorization kernels assume.
"""

from __future__ import annotations

import numpy as np

from tpufem.fem.mesh import Mesh, _pack_coords
from tpufem.fem.shapes import support_points_1d


class DoFHandler:
    """Enumerates global DoFs and builds the cell→DoF map.

    Attributes:
      n_dofs:         total number of global DoFs
      cell_dofs:      (ncells, (p+1)^dim) int32 global DoF per local node
      dof_coords:     (n_dofs, dim) float64 physical support-point coords
      boundary_mask:  (n_dofs,) bool — DoF on the domain boundary
    """

    def __init__(self, mesh: Mesh, degree: int):
        self.mesh = mesh
        self.degree = degree
        self._build()

    # ------------------------------------------------------------------
    def _build(self):
        mesh, p = self.mesh, self.degree
        d = mesh.dim
        n1 = p + 1
        nc = mesh.n_cells
        U = mesh.U
        if mesh.is_uniform:
            self._build_uniform()
            return

        # local node lattice (x fastest): node j has per-axis index i_a
        node_idx = np.arange(n1**d)
        I = np.stack([(node_idx // n1**a) % n1 for a in range(d)], axis=-1)
        # (n_nodes, d) int

        o = mesh.origins  # (nc, d)
        s = mesh.sizes  # (nc,)

        # --- entity key per (cell, node):  per axis 3 ints + 1 size int ----
        # boundary axis (i in {0,p}):   (0, vertex_coord, 0)
        # interior axis (0 < i < p):    (1, origin_a,     i)
        # plus s_eff = cell size if any axis interior else 0
        interior = (I > 0) & (I < p)  # (n_nodes, d)
        key_cols = []
        for a in range(d):
            ia = I[:, a][None, :]  # (1, n_nodes)
            int_a = interior[:, a][None, :]
            tag = int_a.astype(np.int64) * np.ones((nc, 1), dtype=np.int64)
            vcoord = o[:, a][:, None] + s[:, None] * (ia == p)
            coord = np.where(int_a, o[:, a][:, None], vcoord)
            iidx = np.where(int_a, ia, 0) * np.ones((nc, 1), dtype=np.int64)
            key_cols += [tag, coord, iidx]
        any_interior = interior.any(axis=1)[None, :]  # (1, n_nodes)
        s_eff = np.where(any_interior, s[:, None], 0)
        key_cols.append(s_eff)
        keys = np.stack([k.ravel() for k in key_cols], axis=-1)
        # pack to a single int64 (ranges: tag<=1, coord<=U, idx<p, s<=U)
        packed = np.zeros(len(keys), dtype=np.int64)
        maxs = []
        for a in range(d):
            maxs += [2, U + 1, n1]
        maxs.append(U + 1)
        for col, m in zip(range(keys.shape[1]), maxs):
            packed = packed * np.int64(m) + keys[:, col]

        uniq, inv = np.unique(packed, return_inverse=True)
        self.n_dofs = len(uniq)
        self.cell_dofs = inv.reshape(nc, n1**d).astype(np.int32)

        # --- support-point coordinates + boundary detection ---------------
        gll = support_points_1d(p)  # (n1,)
        # logical coordinate per (cell, node, axis)
        frac = gll[I]  # (n_nodes, d)
        logical = (o[:, None, :] + s[:, None, None] * frac[None]) / U
        phys = mesh.to_physical(logical)
        self.dof_coords = np.zeros((self.n_dofs, d))
        self.dof_coords[self.cell_dofs.ravel()] = phys.reshape(-1, d)

        # boundary: exact integer test per (cell,node)
        on_bdry = np.zeros((nc, n1**d), dtype=bool)
        for a in range(d):
            lo = (I[None, :, a] == 0) & (o[:, None, a] == 0)
            hi = (I[None, :, a] == p) & (o[:, None, a] + s[:, None] == U)
            on_bdry |= lo | hi
        self.boundary_mask = np.zeros(self.n_dofs, dtype=bool)
        self.boundary_mask[self.cell_dofs[on_bdry]] = True

    # ------------------------------------------------------------------
    def _build_uniform(self):
        """Uniform-mesh fast path: global lexicographic tensor numbering on
        the (p*n+1)^dim node grid — no hashing, O(ncells * nn) arithmetic.

        This is the SoA local_to_global layout the reference precomputes in
        MatrixFreeGpu::reinit (SURVEY.md §3.2), built in closed form.
        """
        mesh, p = self.mesh, self.degree
        d = mesh.dim
        n1 = p + 1
        nc = mesh.n_cells
        s = int(mesh.sizes[0])
        n = mesh.U // s  # cells per axis
        npts = n * p + 1  # global nodes per axis

        node_idx = np.arange(n1**d)
        I = np.stack([(node_idx // n1**a) % n1 for a in range(d)], axis=-1)
        cell_idx = mesh.origins // s  # (nc, d)
        # global per-axis node index: cell_idx*p + i
        g = cell_idx[:, None, :] * p + I[None, :, :]  # (nc, nn, d)
        # x fastest: dof = gx + npts*gy + npts^2*gz
        dof = np.zeros((nc, n1**d), dtype=np.int64)
        for a in range(d):
            dof += g[:, :, a] * npts**a
        self.n_dofs = npts**d
        self.cell_dofs = dof.astype(np.int32)

        gll = support_points_1d(p)
        # coordinates of global node grid: per axis, node k = cell k//p,
        # offset gll[k%p] (and the last node is the far endpoint)
        axis_coord = np.empty(npts)
        k = np.arange(npts)
        cell_of = np.minimum(k // p, n - 1)
        off = k - cell_of * p
        axis_coord = (cell_of + gll[off]) / n
        di = np.arange(self.n_dofs)
        logical = np.stack(
            [axis_coord[(di // npts**a) % npts] for a in range(d)], axis=-1
        )
        self.dof_coords = mesh.to_physical(logical)
        gi = np.stack([(di // npts**a) % npts for a in range(d)], axis=-1)
        self.boundary_mask = ((gi == 0) | (gi == npts - 1)).any(axis=1)

    # ------------------------------------------------------------------
    def face_local_dofs(self, axis: int, side: int) -> np.ndarray:
        """Local indices of the nodes on cell face (axis, side in {0,1}),
        ordered lexicographically in the remaining axes (x-like fastest).

        Used by hanging-node constraint setup (tpufem.fem.constraints)."""
        p, d = self.degree, self.mesh.dim
        n1 = p + 1
        node_idx = np.arange(n1**d)
        I = np.stack([(node_idx // n1**a) % n1 for a in range(d)], axis=-1)
        sel = I[:, axis] == (p if side else 0)
        face_nodes = node_idx[sel]
        # sort by remaining axes, lower axis fastest
        rem = [a for a in range(d) if a != axis]
        sort_key = np.zeros(len(face_nodes), dtype=np.int64)
        for a in reversed(rem):
            sort_key = sort_key * n1 + I[sel][:, a]
        return face_nodes[np.argsort(sort_key, kind="stable")]
