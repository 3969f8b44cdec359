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
        nn = n1**d

        o = mesh.origins  # (nc, d)
        s = mesh.sizes  # (nc,)

        # --- entity key per (cell, node):  per axis 3 ints + 1 size int ----
        # boundary axis (i in {0,p}):   (0, vertex_coord, 0)
        # interior axis (0 < i < p):    (1, origin_a,     i)
        # plus s_eff = cell size if any axis interior else 0
        # Packed IN PLACE into one (nc, nn) int64 — the column-stacked
        # form materialized ~10 full-size temporaries and dominated setup
        # (measured 50 s of a 68 s build at 3.3M DoFs).
        interior = (I > 0) & (I < p)  # (n_nodes, d)
        packed = np.zeros((nc, nn), dtype=np.int64)
        bits = 0
        for a in range(d):
            ia = I[:, a]  # (nn,)
            int_a = interior[:, a]  # (nn,)
            packed <<= 1
            packed += int_a[None, :]
            packed *= np.int64(U + 1)
            coord = np.where(
                int_a[None, :],
                o[:, a, None],
                o[:, a, None] + s[:, None] * (ia == p)[None, :],
            )
            packed += coord
            packed *= np.int64(n1)
            packed += np.where(int_a, ia, 0)[None, :]
            bits += 1 + int(U + 1).bit_length() + int(n1).bit_length()
        any_int = interior.any(axis=1)  # (nn,)
        packed *= np.int64(U + 1)
        packed += np.where(any_int[None, :], s[:, None], 0)
        bits += int(U + 1).bit_length()
        if bits >= 63:
            raise OverflowError(
                f"entity key needs {bits} bits; refine less or shard"
            )

        flat = packed.reshape(-1)
        order = np.argsort(flat, kind="stable")
        sp = flat[order]
        new = np.empty(len(sp), dtype=bool)
        new[0] = True
        np.not_equal(sp[1:], sp[:-1], out=new[1:])
        self.n_dofs = int(new.sum())
        gid_sorted = np.cumsum(new) - 1
        inv = np.empty(len(sp), dtype=np.int32)
        inv[order] = gid_sorted.astype(np.int32)
        self.cell_dofs = inv.reshape(nc, nn)

        # --- support-point coordinates + boundary detection ---------------
        # one REPRESENTATIVE (cell, node) per DoF — mapping all nc*nn
        # points cost 7 s of the old build and scattered 2x the data
        gll = support_points_1d(p)  # (n1,)
        rep = order[np.nonzero(new)[0]]  # flat (cell, node) per DoF
        rc, rn = rep // nn, rep % nn
        frac = gll[I[rn]]  # (n_dofs, d)
        logical = (o[rc] + s[rc, None] * frac) / U
        self.dof_coords = mesh.to_physical(logical)

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
