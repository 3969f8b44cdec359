"""Box-structured apply tier for adaptive (2:1 forest) meshes.

Reference analogue: the colored gather/scatter cell loop on adaptively
refined meshes — ``hanging_nodes.cuh`` + ``coloring.h`` + ``fee_gpu.cuh``
(SURVEY.md §2, §3.4; BASELINE config 4).  On a GPU that loop is fast
because random access is cheap; on TPU a generic gather/scatter runs ~2
orders of magnitude below HBM speed (measured round 1: 0.013 vs
2.8 GDoF/s).  The TPU-native answer exploits the forest structure instead:

- Cells of size ``s`` in a 2:1 forest have s-aligned origins, so each size
  group lives on a sparse sub-lattice.  Per group we take the bounding-box
  lattice and run the *gather-free blocked structured apply*
  (tpufem.ops.structured) over the whole box, masking inactive cells with
  zero quadrature weights — their contributions vanish identically, no
  bookkeeping in the hot loop.
- The solver vector IS the concatenation of the per-box node lattices (the
  "patchwork vector"); CG axpys are elementwise, dots carry 0/1 owner
  weights so each physical DoF counts once.  No gather/scatter primitive
  appears anywhere in the iteration.
- Nodes shared between boxes (vertices on level interfaces, faces between
  same-level boxes) are *duplicated*; a small precomputed exchange
  (gather partial sums from all copies, sum, broadcast back — the same
  compress(add) contract as the multi-chip partitioner, SURVEY.md §3.6)
  reconciles them after each raw apply.  Hanging nodes use the standard
  C / C^T application (tpufem.fem.constraints) with index lists mapped
  into patch coordinates.  Both are O(interface-surface) ≪ O(N).

Correctness contract: ``vmult`` equals the condensed assembled operator
C^T A C with identity on constrained rows, to rounding — tested against
the scipy oracle in tests/test_boxes.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.fem.quadrature import Quadrature
from tpufem.fem.shapes import ShapeInfo
from tpufem.ops.structured import laplace_apply_structured


@dataclasses.dataclass
class Box:
    """One size group's bounding-box lattice (host/static data)."""

    size: int  # cell edge length in mesh integer units
    lo: np.ndarray  # (d,) lattice origin in size units, xyz order
    nb: tuple  # cells per axis, (z, ..., x) order (slowest first)
    cells: np.ndarray  # mesh cell indices in this group
    lattice_shape: tuple  # node lattice shape, (z, ..., x) order
    gid: np.ndarray  # lattice_shape int64 global DoF id, -1 = dead node
    active: np.ndarray  # nb bool — cell present in the mesh
    offset: int = 0  # start of this box's segment in the patch vector

    @property
    def n_nodes(self) -> int:
        return int(np.prod(self.lattice_shape))


def _local_lattice(p: int, d: int) -> np.ndarray:
    """(nn, d) per-axis local node index, xyz column order, x fastest."""
    n1 = p + 1
    idx = np.arange(n1**d)
    return np.stack([(idx // n1**a) % n1 for a in range(d)], axis=-1)


def build_boxes(mesh: Mesh, dofs: DoFHandler) -> list[Box]:
    """Group leaves by size; one bounding-box lattice per group.

    Refinements that cluster (the typical adaptive use) give tight boxes;
    a worst-case scattered refinement degrades to the full fine lattice —
    documented trade-off, mitigable later by splitting groups into
    multiple boxes (the apply below is already per-box, not per-level).
    """
    p, d = dofs.degree, mesh.dim
    I = _local_lattice(p, d)  # (nn, d) xyz
    boxes: list[Box] = []
    offset = 0
    for s in sorted(np.unique(mesh.sizes).tolist(), reverse=True):
        sel = np.nonzero(mesh.sizes == s)[0]
        lat = mesh.origins[sel] // s  # (ng, d) xyz
        lo = lat.min(axis=0)
        nb_xyz = lat.max(axis=0) - lo + 1
        rel = lat - lo  # (ng, d)
        nb = tuple(int(x) for x in nb_xyz[::-1])  # (z, ..., x)
        lattice_shape = tuple(n * p + 1 for n in nb)
        active = np.zeros(nb, dtype=bool)
        active[tuple(rel[:, a] for a in range(d - 1, -1, -1))] = True
        gid = np.full(lattice_shape, -1, dtype=np.int64)
        # node position per (cell, local node), per axis: rel*p + I
        pos = rel[:, None, :] * p + I[None, :, :]  # (ng, nn, d) xyz
        flat = np.zeros(pos.shape[:2], dtype=np.int64)
        for a in range(d):  # x fastest in memory (C order, z leading)
            stride = int(np.prod(lattice_shape[d - a :])) if a else 1
            flat += pos[:, :, a] * stride
        gid.reshape(-1)[flat.ravel()] = dofs.cell_dofs[sel].ravel()
        boxes.append(Box(
            size=int(s), lo=lo, nb=nb, cells=sel,
            lattice_shape=lattice_shape, gid=gid, active=active,
            offset=offset,
        ))
        offset += int(np.prod(lattice_shape))
    return boxes


def _copies_by_gid(boxes: list[Box]):
    """gid -> np.ndarray of flat patch indices (all copies, owner first)."""
    all_gid = np.concatenate([b.gid.reshape(-1) for b in boxes])
    live = np.nonzero(all_gid >= 0)[0]
    order = np.argsort(all_gid[live], kind="stable")
    live = live[order]
    g = all_gid[live]
    starts = np.nonzero(np.concatenate([[True], g[1:] != g[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(g)]])
    return g[starts], live, starts, ends


class BoxLaplaceOperator:
    """Matrix-free Laplace on an adaptive mesh in patchwork representation.

    The whole solver loop (CG + Jacobi/Chebyshev) runs on the patch vector;
    ``to_patch`` / ``from_patch`` convert at the boundaries of the
    computation only.
    """

    def __init__(
        self,
        mesh: Mesh,
        dofs: DoFHandler,
        constraints=None,  # AffineConstraints (hanging nodes), or None
        coefficient: Optional[Callable] = None,
        dtype: str = "float32",
        constrained_mask: Optional[np.ndarray] = None,
        structured_interfaces: bool = True,
        cell_scheme: str = "global",
    ):
        if (mesh.transform is not None
                or getattr(mesh, "support_points", None) is not None):
            # curved adaptive (transform x refinement, VERDICT r2 item 6)
            # or discrete support-point geometry (MappingQ analogue):
            # the per-box cell loop carries the full per-qpoint packed
            # symmetric metric (dead lattice cells get G = 0) through
            # laplace_apply_global_general — same machinery as the
            # uniform curved tier, per box.
            cell_scheme = "global-general"
        self.mesh, self.dofs = mesh, dofs
        self.coefficient = coefficient
        p, d = dofs.degree, mesh.dim
        self.p, self.dim = p, d
        self.dt = jnp.dtype(dtype)
        quad = Quadrature.gauss(p + 1)
        si = ShapeInfo(p, quad)
        self.S = jnp.asarray(si.S, self.dt)
        self.D_col = jnp.asarray(si.D_col, self.dt)
        self.boxes = build_boxes(mesh, dofs)
        self.n_patch = sum(b.n_nodes for b in self.boxes)
        self.n_dofs = dofs.n_dofs

        # ---- per-box apply constants -------------------------------------
        # cell_scheme picks the per-box cell loop:
        #   "global"     — global quadrature-grid banded matmuls
        #                  (laplace_apply_global_diag): no p-strided
        #                  blocking, every axis pass is one dense matmul
        #                  over the whole box lattice (the round-3 tier);
        #   "dense"      — one shared nn x nn local matrix per box, a
        #                  single MXU matmul over the cell batch
        #                  (constant coefficient only);
        #   "structured" — blocked overlapped-extraction sum
        #                  factorization (round-2 tier).
        if cell_scheme == "dense" and coefficient is not None:
            cell_scheme = "structured"
        self._cell_scheme = cell_scheme
        w1 = np.asarray(quad.weights_1d)
        ext = mesh.upper - mesh.lower  # (d,) physical extents, xyz
        self._dense = cell_scheme == "dense"
        self._box_args = []
        self._box_EG = []
        eg_cache: dict = {}
        gsym_cells = None
        if cell_scheme == "global-general":
            from tpufem.fem.mapping import compute_metric
            from tpufem.ops.structured import sym_metric_components

            metric = compute_metric(mesh, quad,
                                    need_points=coefficient is not None)
            jxw = metric.jxw
            if coefficient is not None:
                jxw = jxw * coefficient(
                    metric.quad_points.reshape(-1, d)
                ).reshape(jxw.shape)
            gsym_cells = sym_metric_components(metric.inv_jac, jxw)
        q1 = p + 1
        ncomp = d * (d + 1) // 2
        for b in self.boxes:
            h = b.size / mesh.U * ext  # (d,) physical cell widths, xyz
            scale = jnp.asarray(1.0 / h**2 * np.prod(h), self.dt)
            if cell_scheme in ("global", "global-general"):
                from tpufem.ops.structured import global_interp_matrices

                EG = []
                for n_ax in b.nb:  # tensor-axis order z..x
                    if n_ax not in eg_cache:
                        E, Gd = global_interp_matrices(
                            p, n_ax, si.S, si.D_col)
                        eg_cache[n_ax] = (jnp.asarray(E, self.dt),
                                          jnp.asarray(Gd, self.dt))
                    EG.append(eg_cache[n_ax])
                self._box_EG.append(
                    (tuple(e for e, _ in EG), tuple(g for _, g in EG)))
                if cell_scheme == "global-general":
                    # packed symmetric metric on the box q-grid, dead
                    # cells G = 0 (their qpoint contributions vanish)
                    rel = mesh.origins[b.cells] // b.size - b.lo  # xyz
                    gs = gsym_cells[b.cells].reshape(
                        (len(b.cells),) + (q1,) * d + (ncomp,))
                    blk = np.zeros(tuple(np.ravel(
                        [(n, q1) for n in b.nb])) + (ncomp,))
                    ix: list = []
                    for a in range(d):  # tensor-axis order z..x
                        ix.append(rel[:, d - 1 - a])
                        ix.append(slice(None))
                    blk[tuple(ix)] = gs
                    gbox = blk.reshape(
                        tuple(n * q1 for n in b.nb) + (ncomp,))
                    self._box_args.append(
                        (b.nb, jnp.asarray(gbox, self.dt), None))
                    continue
                wb = b.active.astype(np.float64).reshape(
                    tuple(np.ravel([(n, 1) for n in b.nb]))
                )
                for a in range(d):  # quadrature dims at odd pos, z..x
                    sh = [1] * (2 * d)
                    sh[2 * (d - 1 - a) + 1] = p + 1
                    wb = wb * w1.reshape(sh)
                if coefficient is not None:
                    wb = wb * self._coef_block(b, coefficient, quad)
                self._box_args.append(
                    (b.nb, scale, jnp.asarray(wb, self.dt)))
                continue
            if self._dense:
                from tpufem.ops.dense_local import build_dense_local_matrix

                A_loc = build_dense_local_matrix(
                    p, d, p + 1, np.asarray(scale), self.dt)
                amask = jnp.asarray(
                    b.active.reshape(-1).astype(np.float64), self.dt)
                self._box_args.append((b.nb, A_loc, amask))
                continue
            wb = b.active.astype(np.float64).reshape(
                tuple(np.ravel([(n, 1) for n in b.nb]))
            )
            for a in range(d):  # quadrature dims at odd positions, z..x
                sh = [1] * (2 * d)
                sh[2 * (d - 1 - a) + 1] = p + 1
                wb = wb * w1.reshape(sh)
            wb = wb * self._coef_block(b, coefficient, quad)
            self._box_args.append((b.nb, scale, jnp.asarray(wb, self.dt)))

        # ---- copy reconciliation (compress) -----------------------------
        gids, live, starts, ends = _copies_by_gid(self.boxes)
        counts = ends - starts
        self._owner = np.full(self.n_dofs, -1, dtype=np.int64)
        self._owner[gids] = live[starts]
        if np.any(self._owner < 0):
            raise AssertionError("DoF without a patch copy")
        multi = np.nonzero(counts > 1)[0]
        Kc = int(counts[multi].max()) if len(multi) else 1
        m_idx = np.zeros((len(multi), Kc), dtype=np.int64)
        m_w = np.zeros((len(multi), Kc))
        for r, gi in enumerate(multi):
            c = live[starts[gi] : ends[gi]]
            m_idx[r, : len(c)] = c
            m_idx[r, len(c) :] = c[0]  # pad = owner (0-weight / re-set)
            m_w[r, : len(c)] = 1.0
        self._multi_idx = jnp.asarray(m_idx.astype(np.int32))
        self._multi_w = jnp.asarray(m_w, self.dt)
        self._Kc = Kc

        # owner weights for dots (1 exactly once per DoF)
        w_own = np.zeros(self.n_patch)
        w_own[self._owner] = 1.0
        self.w_owner = jnp.asarray(w_own, self.dt)

        # ---- constraints mapped to patch coordinates --------------------
        self.constraints = constraints
        con_mask_g = np.zeros(self.n_dofs, dtype=bool)
        if constrained_mask is None:
            constrained_mask = dofs.boundary_mask
        con_mask_g |= constrained_mask
        if constraints is not None and constraints.lines:
            con_mask_g |= constraints.constrained_mask()
            cdofs, masters, weights, inhom = constraints.padded_arrays()
            cdofs_all = cdofs
            # structured interface rectangles: the regular bulk of the
            # hanging rows becomes dense slice+matmul work (box_interface);
            # only verified-irregular rows stay on the gather fallback
            self._rects = []
            self._rect_meta = []
            self._rect_groups = []
            self._pairs = []
            if structured_interfaces:
                from tpufem.ops.box_interface import build_interface_rects

                rects, leftover = build_interface_rects(
                    self.boxes, constraints, p, d)
                if structured_interfaces != "rects":
                    # dense 2:1 pair transfers (box_pairs): index-free
                    # C/C^T; rects whose region does not fit stay on the
                    # gather fallback
                    from tpufem.ops.box_pairs import build_pair_plans

                    plans, dropped = build_pair_plans(
                        self.boxes, rects, p, d)
                    if dropped:
                        extra = np.unique(np.concatenate(
                            [r.rows for r in dropped]))
                        leftover = np.union1d(leftover, extra)
                    drop_ids = {id(r) for r in dropped}
                    rects = [r for r in rects if id(r) not in drop_ids]
                    self._pairs = plans
                for r in rects:
                    self._rect_meta.append((r.bf, r.bc, r.fslice, r.cslice))
            if self._pairs:
                self.n_rect_rows = len(cdofs) - len(leftover)
            elif structured_interfaces:
                # batch rects into same-shape groups (VERDICT r2 item 4):
                # one gather + one batched einsum + one masked scatter-add
                # per group instead of ~840 tiny per-rect einsums.  The
                # masked-delta form is exactly the sequential per-rect
                # application: ownership masks are row-disjoint across
                # rects, so overlapping regions never double-apply.
                by_shape: dict = {}
                for r in rects:
                    key = r.mask.shape
                    by_shape.setdefault(key, []).append(r)
                fidx_np, cidx_np, mask_np = [], [], []
                self._rect_sizes = []
                self._rc_sizes = []
                for key, rs in by_shape.items():
                    fidx = np.stack([self._region_indices(r.bf, r.fslice)
                                     for r in rs])
                    cidx = np.stack([self._region_indices(r.bc, r.cslice)
                                     for r in rs])
                    mask = np.stack([r.mask for r in rs])
                    F = tuple(np.asarray(Fk, self.dt) for Fk in rs[0].F)
                    self._rect_groups.append((F,))
                    self._rect_sizes.append((fidx.shape, fidx.size))
                    self._rc_sizes.append((cidx.shape, cidx.size))
                    fidx_np.append(fidx.reshape(-1))
                    cidx_np.append(cidx.reshape(-1))
                    mask_np.append(mask.reshape(-1) != 0)
                # ONE fused master-region gather for all groups (24
                # separate 3D-indexed gathers cost ~1.3 ms of fixed
                # per-op latency at the 3.3M-DoF bench, measured)
                self._rc_gather = jnp.asarray(np.concatenate(
                    cidx_np).astype(np.int32)) if cidx_np else None
                # STATIC scatter plans (sorted-unique indices lower to
                # the fast TPU scatter path; the generic concat-scatter
                # was ~4.5 ms of the 12.6 ms 3.3M-DoF apply, measured):
                #   distribute  = pure SET of interpolated values on
                #     owned rows (row-disjoint across rects);
                #   distribute_t = gather owned rows -> zero them ->
                #     per-group transpose interp -> segment-sum onto
                #     unique masters -> one sorted-unique scatter-add.
                if fidx_np:
                    fc = np.concatenate(fidx_np)
                    cc = np.concatenate(cidx_np)
                    mc = np.concatenate(mask_np)
                    keep = np.nonzero(mc)[0]
                    dst = fc[keep]
                    assert len(np.unique(dst)) == len(dst), (
                        "rect ownership masks must be row-disjoint")
                    order = np.argsort(dst, kind="stable")
                    self._rs_src = jnp.asarray(keep[order].astype(np.int32))
                    self._rs_dst = jnp.asarray(dst[order].astype(np.int32))
                    self._rs_keep = jnp.asarray(keep.astype(np.int32))  # ascending
                    self._rs_gather = jnp.asarray(fc[keep].astype(np.int32))
                    self._rs_total = int(len(fc))
                    order_c = np.argsort(cc, kind="stable")
                    cs = cc[order_c]
                    seg = np.concatenate(
                        [[0], np.cumsum(cs[1:] != cs[:-1])])
                    self._ct_corder = jnp.asarray(order_c.astype(np.int32))
                    self._ct_segids = jnp.asarray(seg.astype(np.int32))
                    self._ct_nseg = int(seg[-1]) + 1 if len(seg) else 0
                    self._ct_uniq = jnp.asarray(np.unique(cs).astype(np.int32))
                self.n_rect_rows = len(cdofs) - len(leftover)
            else:
                leftover = np.arange(len(cdofs))
                self.n_rect_rows = 0
            cdofs = cdofs[leftover]
            masters = masters[leftover]
            weights = weights[leftover]
            inhom = inhom[leftover]
            # gather masters from owner copies
            self._mast_idx = jnp.asarray(
                self._owner[masters].astype(np.int32))
            self._mast_w = jnp.asarray(weights, self.dt)
            self._con_inhom = jnp.asarray(inhom, self.dt)
            # write interpolated values to every copy of each hanging dof
            cc_idx, cc_row = self._all_copies(cdofs, live, starts, ends,
                                              gids)
            self._con_copy_idx = jnp.asarray(cc_idx.astype(np.int32))
            self._con_copy_row = jnp.asarray(cc_row)
            # C^T: (hanging value) * w added to every copy of the master
            rows, tgt, wts = [], [], []
            for i in range(len(cdofs)):
                for j in range(masters.shape[1]):
                    if weights[i, j] == 0.0:
                        continue
                    for c in self._gid_copies(int(masters[i, j]), live,
                                              starts, ends, gids):
                        rows.append(i)
                        tgt.append(c)
                        wts.append(weights[i, j])
            self._ct_rows = jnp.asarray(np.asarray(rows, dtype=np.int32))
            self._ct_tgt = jnp.asarray(np.asarray(tgt, dtype=np.int32))
            self._ct_w = jnp.asarray(np.asarray(wts), self.dt)
            self.has_hanging = True
            self._has_fallback = len(cdofs) > 0
        else:
            self.has_hanging = False
            self._has_fallback = False
            self._rects = []
            self._rect_meta = []
            self._rect_groups = []
            self._pairs = []
            self.n_rect_rows = 0

        # ---- dense pair-transfer device data (box_pairs) ----------------
        self._pair_meta = []
        pair_P, pair_h, pair_alive, pair_msh = [], [], [], []
        pair_E, pair_S = [], []
        self._single_compress = False
        if self._pairs:
            from tpufem.ops.box_pairs import uncovered_multi_rows

            fb = uncovered_multi_rows(self.boxes, self._pairs, gids,
                                      live, starts, ends)
            # sweep-excluded rows must be UNTOUCHED by the sweeps: zero
            # their positions out of every msh mask so the index fallback
            # sees unmodified copies
            box_offs = np.array([b.offset for b in self.boxes])
            for r in fb:
                gi = multi[r]
                for c in live[starts[gi] : ends[gi]]:
                    bi = int(np.searchsorted(box_offs, c, side="right")) - 1
                    bx = self.boxes[bi]
                    crd = np.unravel_index(int(c) - bx.offset,
                                           bx.lattice_shape)
                    for pl in self._pairs:
                        if pl.bf == bi:
                            sls, arr = pl.sub_f, pl.msh
                        elif pl.bc == bi:
                            sls, arr = pl.sub_c, pl.msh
                        else:
                            continue
                        idx, inside = [], True
                        for a, sl in enumerate(sls):
                            st = sl.step or 1
                            if (crd[a] < sl.start or crd[a] >= sl.stop
                                    or (crd[a] - sl.start) % st):
                                inside = False
                                break
                            idx.append((crd[a] - sl.start) // st)
                        if inside:
                            arr[tuple(idx)] = 0.0
            self._multi_fb_np = (m_idx[fb], m_w[fb])
            for pl in self._pairs:
                self._pair_meta.append(dict(
                    bc=pl.bc, bf=pl.bf, src_sl=pl.src_sl,
                    dst_sl=pl.dst_sl, sub_f=pl.sub_f, sub_c=pl.sub_c))
                pair_P.append(tuple(jnp.asarray(Pa, self.dt)
                                    for Pa in pl.P))
                pair_h.append(jnp.asarray(pl.h, self.dt))
                pair_alive.append(jnp.asarray(pl.alive, self.dt))
                pair_msh.append(jnp.asarray(pl.msh, self.dt))
                pair_E.append(jnp.asarray(pl.E, self.dt))
                pair_S.append(tuple(jnp.asarray(Sa, self.dt)
                                    for Sa in pl.S))
            # ONE compress per apply: C^T deltas fold into the partial
            # field before the single reconciliation — valid only when
            # hanging rows are single-copy (their partials are already
            # totals) and no gather-fallback C^T rows exist (those write
            # to every master copy directly, which double-counts under a
            # later compress)
            hang_gids = set(int(g) for g in cdofs_all)
            multi_gids = set(int(g) for g in gids[multi])
            self._single_compress = (
                not (hang_gids & multi_gids) and not self._has_fallback)

        # interior mask per patch entry: 0 on constrained copies AND dead
        m = np.zeros(self.n_patch)
        interior_g = ~con_mask_g
        for b in self.boxes:
            g = b.gid.reshape(-1)
            seg = np.zeros(b.n_nodes)
            ok = g >= 0
            seg[ok] = interior_g[g[ok]].astype(np.float64)
            m[b.offset : b.offset + b.n_nodes] = seg
        self.interior_mask = jnp.asarray(m, self.dt)

        # ---- device-array pytree -----------------------------------------
        # EVERY device array crosses jit boundaries as an ARGUMENT: on this
        # platform, gathers/scatters with closure-captured (constant) index
        # operands lower pathologically (~1000x slower, measured in
        # scripts/kernel_lab.py round 2) and constants are re-staged per
        # invocation.
        self.params = {
            "box_args": tuple((a1, a2) for (_, a1, a2) in self._box_args),
            "box_EG": tuple(self._box_EG),
            "multi_idx": self._multi_idx,
            "multi_w": self._multi_w,
            "interior_mask": self.interior_mask,
            "w_owner": self.w_owner,
            "S": self.S,
            "D_col": self.D_col,
        }
        if self.has_hanging:
            self.params.update(
                mast_idx=self._mast_idx, mast_w=self._mast_w,
                con_inhom=self._con_inhom,
                con_copy_idx=self._con_copy_idx,
                ct_rows=self._ct_rows, ct_tgt=self._ct_tgt,
                ct_w=self._ct_w,
                rect_groups=tuple(self._rect_groups),
            )
            if self._rect_groups:
                self.params.update(
                    rs_src=self._rs_src, rs_dst=self._rs_dst,
                    rs_keep=self._rs_keep, rs_gather=self._rs_gather,
                    rc_gather=self._rc_gather,
                    ct_corder=self._ct_corder,
                    ct_segids=self._ct_segids,
                    ct_uniq=self._ct_uniq,
                )
        if self._pairs:
            mfb_i, mfb_w = self._multi_fb_np
            self.params.update(
                pair_P=tuple(pair_P), pair_h=tuple(pair_h),
                pair_alive=tuple(pair_alive),
                pair_msh=tuple(pair_msh),
                pair_E=tuple(pair_E), pair_S=tuple(pair_S),
                multi_fb_idx=jnp.asarray(mfb_i.astype(np.int32)),
                multi_fb_w=jnp.asarray(mfb_w, self.dt),
            )
        self._box_nb = tuple(nb for (nb, _, _) in self._box_args)
        self._vmult = jax.jit(self._vmult_traced)
        self._vmult_raw = jax.jit(self._vmult_raw_traced)

    # ------------------------------------------------------------------
    def recast(self, dtype) -> "BoxLaplaceOperator":
        """Shallow dtype clone: shares ALL host-side structure (boxes,
        pair metadata, index arrays) and casts only the floating device
        arrays of the ``params`` pytree (compute precision follows the
        data dtype — ``axis_mm_precision``).  Equivalent to rebuilding
        with ``dtype=`` — ``__init__`` casts exactly these arrays from
        the same host data — at ~zero cost, where the full rebuild
        repeats ~40 s of host setup at the bench flagship (and the
        mixed-precision GMG rebuild ~380 s, scripts/adaptive_solve_lab).
        """
        import copy

        new = copy.copy(self)
        new.dt = jnp.dtype(dtype)

        def _cast(a):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                      jnp.floating):
                return jnp.asarray(a, new.dt)
            return a

        new.params = jax.tree_util.tree_map(_cast, self.params)
        # attribute mirrors read outside __init__ (dot, public masks)
        new.S = new.params["S"]
        new.D_col = new.params["D_col"]
        new.interior_mask = new.params["interior_mask"]
        new.w_owner = new.params["w_owner"]
        # fresh jit/solver caches: the lazy caches hold dtype-specific
        # Chebyshev scalars and must not be shared with the original
        new._vmult = jax.jit(new._vmult_traced)
        new._vmult_raw = jax.jit(new._vmult_raw_traced)
        new._solvers_cg = {}
        new._cheb_cache = {}
        return new

    # ------------------------------------------------------------------
    @staticmethod
    def _gid_copies(g, live, starts, ends, gids):
        gi = np.searchsorted(gids, g)
        return live[starts[gi] : ends[gi]]

    def _all_copies(self, dlist, live, starts, ends, gids):
        """(n, Kc) padded copy indices + 0/1 validity for a DoF list."""
        copies = [self._gid_copies(int(g), live, starts, ends, gids)
                  for g in dlist]
        K = max((len(c) for c in copies), default=1)
        idx = np.zeros((len(dlist), K), dtype=np.int64)
        row = np.zeros((len(dlist), K))
        for i, c in enumerate(copies):
            idx[i, : len(c)] = c
            idx[i, len(c) :] = c[0]
            row[i, : len(c)] = 1.0
        return idx, row

    def _coef_block(self, b: Box, coefficient, quad) -> np.ndarray:
        """Per-cell x per-qpoint coefficient on the box lattice, in the
        interleaved ([nz,qz,]ny,qy,nx,qx) layout (dead cells get 1 — their
        weight is already 0)."""
        d, p = self.dim, self.p
        q1 = p + 1
        mesh = self.mesh
        qp = np.asarray(quad.points_1d)  # (q1,) on [0,1]
        # physical coords of qpoints for every lattice cell
        axes = []
        for a in range(d):  # xyz
            nba = b.nb[d - 1 - a]
            cells = (b.lo[a] + np.arange(nba)) * b.size  # lattice origins
            x = (cells[:, None] + b.size * qp[None, :]) / mesh.U
            axes.append(mesh.lower[a]
                        + (mesh.upper[a] - mesh.lower[a]) * x)  # (nba, q1)
        # build full (nz,qz,...,nx,qx) coord grid then evaluate
        shape = tuple(np.ravel([(b.nb[k], q1) for k in range(d)]))
        pts = np.zeros(shape + (d,))
        for a in range(d):
            k = d - 1 - a  # position among (z..x)
            sh = [1] * (2 * d)
            sh[2 * k], sh[2 * k + 1] = b.nb[k], q1
            pts[..., a] = axes[a].reshape(sh) * np.ones(shape)
        vals = coefficient(pts.reshape(-1, d)).reshape(shape)
        return vals

    # ------------------------------------------------------------------
    # patch <-> global transfers (setup/IO boundary only; host numpy)
    def to_patch(self, u_global: np.ndarray) -> jnp.ndarray:
        u_global = np.asarray(u_global)
        out = np.zeros(self.n_patch, dtype=u_global.dtype)
        for b in self.boxes:
            g = b.gid.reshape(-1)
            ok = g >= 0
            seg = np.zeros(b.n_nodes, dtype=u_global.dtype)
            seg[ok] = u_global[g[ok]]
            out[b.offset : b.offset + b.n_nodes] = seg
        return jnp.asarray(out, self.dt)

    def from_patch(self, u_patch) -> np.ndarray:
        u = np.asarray(u_patch, dtype=np.float64)
        return u[self._owner]

    # ------------------------------------------------------------------
    def compress_p(self, pr, y):
        """Sum partial contributions across all copies of each shared DoF
        and broadcast the total back — the box-interface analogue of the
        partitioner's compress(add) (SURVEY.md §3.6).

        With dense pair plans, covered copies reconcile via strided-slab
        down/up sweeps over the pair overlap volumes (index-free); only
        sweep-uncovered rows take the gather/scatter fallback."""
        if self._pair_meta:
            y = self._sweep_compress(pr, y)
            mi = pr["multi_fb_idx"]
            if mi.shape[0]:
                tot = jnp.sum(y[mi] * pr["multi_fb_w"], axis=1)
                y = y.at[mi.reshape(-1)].set(
                    jnp.repeat(tot, mi.shape[1]))
            return y
        mi = pr["multi_idx"]
        if mi.shape[0] == 0:
            return y
        vals = y[mi] * pr["multi_w"]  # (n_multi, Kc)
        tot = jnp.sum(vals, axis=1)
        return y.at[mi.reshape(-1)].set(jnp.repeat(tot, self._Kc))

    # -- dense 2:1 pair transfers (box_pairs) ---------------------------
    def _seg(self, u, bi):
        b = self.boxes[bi]
        return u[b.offset : b.offset + b.n_nodes].reshape(b.lattice_shape)

    def _put_seg(self, u, bi, seg):
        b = self.boxes[bi]
        return jax.lax.dynamic_update_slice(
            u, seg.reshape(-1), (b.offset,))

    @staticmethod
    def _pair_apply(P, U, transpose=False):
        """Separable per-axis contraction (set-semantics prolongation or
        its transpose).  f32 runs at HIGH (bf16x3): the bf16 split of the
        snapped exact-identity rows recombines exactly, so the compress
        sweeps stay faithful; f64 keeps HIGHEST."""
        from tpufem.ops.structured import axis_mm_precision

        hp = axis_mm_precision(U.dtype)
        for a, Pa in enumerate(P):
            M = Pa.T if transpose else Pa
            U = jnp.moveaxis(
                jnp.tensordot(M, jnp.moveaxis(U, a, 0),
                              axes=((1,), (0,)), precision=hp), 0, a)
        return U

    def _sweep_compress(self, pr, y):
        """Copy reconciliation over the pair chain: down sweep pushes
        coarse partials onto the shared fine-lattice copies, up sweep
        broadcasts the fine totals back — 2(n_pairs) dense passes.

        Both sweeps ride MXU einsums: down reuses the prolongation chain
        (exact identity rows at shared positions, mask E commits them);
        up selects the shared fine values with the 0/1 matrices S.  The
        strided-slab formulation measured 10.5 ms at the 3.3M-DoF bench —
        step-2 slices along the lane axis lower pathologically."""
        for i, meta in enumerate(self._pair_meta):  # coarse -> fine
            uC = self._seg(y, meta["bc"])[meta["src_sl"]]
            V = self._pair_apply(pr["pair_P"][i], uC)
            Fseg = self._seg(y, meta["bf"])
            Fseg = Fseg.at[meta["dst_sl"]].add(pr["pair_E"][i] * V)
            y = self._put_seg(y, meta["bf"], Fseg)
        for i in reversed(range(len(self._pair_meta))):  # fine -> coarse
            meta = self._pair_meta[i]
            msh = pr["pair_msh"][i]
            Fs = self._pair_apply(pr["pair_S"][i],
                                  self._seg(y, meta["bf"])[meta["dst_sl"]])
            Cseg = self._seg(y, meta["bc"])
            Cs = Cseg[meta["sub_c"]]
            Cseg = Cseg.at[meta["sub_c"]].set(
                msh * Fs + (1.0 - msh) * Cs)
            y = self._put_seg(y, meta["bc"], Cseg)
        return y

    def _pair_distribute(self, pr, u):
        """Dense C: per pair, prolong the coarse overlap block and commit
        the verified hanging rows with the 0/1 ownership mask.  Masters
        are never hanging (chain closure), so pair order is free."""
        for i, meta in enumerate(self._pair_meta):
            h = pr["pair_h"][i]
            uC = self._seg(u, meta["bc"])[meta["src_sl"]]
            V = self._pair_apply(pr["pair_P"][i], uC)
            Fseg = self._seg(u, meta["bf"])
            blk = Fseg[meta["dst_sl"]]
            Fseg = Fseg.at[meta["dst_sl"]].set(
                blk * (1.0 - h) + h * V)
            u = self._put_seg(u, meta["bf"], Fseg)
        return u

    def _pair_distribute_t(self, pr, y):
        """Dense Cᵀ: restrict the masked hanging rows onto the coarse
        blocks as a delta field, zero the hanging rows, reconcile the
        delta across shared copies with the sweep compress, add."""
        delta = jnp.zeros_like(y)
        for i, meta in enumerate(self._pair_meta):
            h = pr["pair_h"][i]
            Fseg = self._seg(y, meta["bf"])
            yh = Fseg[meta["dst_sl"]] * h
            dC = self._pair_apply(pr["pair_P"][i], yh, transpose=True)
            dC = dC * pr["pair_alive"][i]
            Dc = self._seg(delta, meta["bc"])
            Dc = Dc.at[meta["src_sl"]].add(dC)
            delta = self._put_seg(delta, meta["bc"], Dc)
            Fseg = Fseg.at[meta["dst_sl"]].set(
                Fseg[meta["dst_sl"]] * (1.0 - h))
            y = self._put_seg(y, meta["bf"], Fseg)
        return y + self.compress_p(pr, delta)

    # -- structured interface rectangles (box_interface.py) ------------
    def _region_indices(self, bi: int, sl) -> np.ndarray:
        """Flat patch indices of a static lattice slice of box bi."""
        b = self.boxes[bi]
        grid = np.arange(b.n_nodes, dtype=np.int64).reshape(
            b.lattice_shape)
        return b.offset + grid[sl]

    @staticmethod
    def _rect_interp_b(F, Uc):
        """Batched V = F1 · U (·F2ᵀ) over the rect dim r."""
        hp = jax.lax.Precision.HIGHEST
        if len(F) == 1:
            return jnp.einsum("af,rf->ra", F[0], Uc, precision=hp)
        return jnp.einsum("af,bg,rfg->rab", F[0], F[1], Uc, precision=hp)

    @staticmethod
    def _rect_interp_t_b(F, Yf):
        hp = jax.lax.Precision.HIGHEST
        if len(F) == 1:
            return jnp.einsum("af,ra->rf", F[0], Yf, precision=hp)
        return jnp.einsum("af,bg,rab->rfg", F[0], F[1], Yf, precision=hp)

    def _rect_distribute(self, pr, u):
        """Structured part of C, batched by rect shape group.  The
        masked set: ownership masks are row-disjoint across rects, and
        masters (the cidx reads) are never hanging rows (constraint
        closure), so all groups read the SAME pre-update vector and the
        update is a pure SET of interpolated values on the statically
        pre-sorted unique owned rows — the sorted-unique scatter lowers
        to the fast TPU path (the generic masked-delta concat-scatter
        was ~4.5 ms of the 12.6 ms 3.3M-DoF apply, measured)."""
        if not pr["rect_groups"]:
            return u
        uc_cat = u[pr["rc_gather"]]  # ONE gather for every group
        vs, off = [], 0
        for (F,), (shape, size) in zip(pr["rect_groups"],
                                       self._rc_sizes):
            uc = uc_cat[off:off + size].reshape(shape)
            vs.append(self._rect_interp_b(F, uc).reshape(-1))
            off += size
        v_all = jnp.concatenate(vs) if len(vs) > 1 else vs[0]
        return u.at[pr["rs_dst"]].set(
            v_all[pr["rs_src"]],
            indices_are_sorted=True, unique_indices=True)

    def _rect_distribute_t(self, pr, y):
        """Structured part of Cᵀ: owned rows gathered and zeroed (static
        sorted-unique plan), transpose-interpolated per group, then
        segment-summed onto the unique masters in one sorted-unique
        scatter-add; finally reconciled across shared copies (exact:
        deltas sum)."""
        yk = y[pr["rs_gather"]]  # owned-row values, keep(ascending) order
        y = y.at[pr["rs_dst"]].set(
            jnp.zeros_like(pr["rs_dst"], dtype=y.dtype),
            indices_are_sorted=True, unique_indices=True)
        yf_cat = jnp.zeros((self._rs_total,), y.dtype).at[
            pr["rs_keep"]].set(
            yk, indices_are_sorted=True, unique_indices=True)
        ds, off = [], 0
        for (F,), (shape, size) in zip(pr["rect_groups"],
                                       self._rect_sizes):
            yf = yf_cat[off:off + size].reshape(shape)
            ds.append(self._rect_interp_t_b(F, yf).reshape(-1))
            off += size
        md = jnp.concatenate(ds) if len(ds) > 1 else ds[0]
        sums = jax.ops.segment_sum(
            md[pr["ct_corder"]], pr["ct_segids"],
            num_segments=self._ct_nseg, indices_are_sorted=True)
        delta = jnp.zeros_like(y).at[pr["ct_uniq"]].add(
            sums, indices_are_sorted=True, unique_indices=True)
        yp = y + delta
        # shared-copy fix: every copy of a multi DoF must carry the TOTAL
        # delta, not just its own box's share
        mi = pr["multi_idx"]
        if mi.shape[0]:
            dtot = jnp.sum(delta[mi] * pr["multi_w"], axis=1)
            base = yp[mi[:, 0]] - delta[mi[:, 0]]
            yp = yp.at[mi.reshape(-1)].set(
                jnp.repeat(base + dtot, self._Kc))
        return yp

    def distribute_p(self, pr, u, homogeneous: bool = True):
        """u -> C u on the patch vector (hanging values interpolated)."""
        if not self.has_hanging:
            return u
        if self._pair_meta:
            u = self._pair_distribute(pr, u)
        elif self._rect_groups:
            u = self._rect_distribute(pr, u)
        if not self._has_fallback:
            return u
        vals = jnp.sum(pr["mast_w"] * u[pr["mast_idx"]], axis=1)
        if not homogeneous:
            vals = vals + pr["con_inhom"]
        cci = pr["con_copy_idx"]
        rep = jnp.repeat(vals, cci.shape[1])
        return u.at[cci.reshape(-1)].set(rep)

    def distribute_transpose_p(self, pr, y):
        """y -> C^T y: hanging-row values pushed to masters, zeroed."""
        if not self.has_hanging:
            return y
        if self._has_fallback:
            cci = pr["con_copy_idx"]
            yc = y[cci[:, 0]]  # (ncon,)
            y = y.at[cci.reshape(-1)].set(
                jnp.zeros(cci.shape[0] * cci.shape[1], dtype=y.dtype))
            y = y.at[pr["ct_tgt"]].add(pr["ct_w"] * yc[pr["ct_rows"]])
        if self._pair_meta:
            y = self._pair_distribute_t(pr, y)
        elif self._rect_groups:
            y = self._rect_distribute_t(pr, y)
        return y

    # ------------------------------------------------------------------
    def _cells_p(self, pr, u):
        """Per-box cell loops, PARTIAL sums (copies unreconciled)."""
        from tpufem.ops.dense_local import laplace_apply_dense_masked
        from tpufem.ops.structured import laplace_apply_global_diag

        parts = []
        for i, (arg1, arg2) in enumerate(pr["box_args"]):
            b = self.boxes[i]
            nb = self._box_nb[i]
            xb = jax.lax.dynamic_slice_in_dim(u, b.offset, b.n_nodes)
            if self._cell_scheme == "global-general":
                from tpufem.ops.structured import (
                    laplace_apply_global_general,
                )

                E_list, G_list = pr["box_EG"][i]
                yb = laplace_apply_global_general(
                    xb, self.dim, nb, self.p, E_list, G_list, arg1)
            elif self._cell_scheme == "global":
                E_list, G_list = pr["box_EG"][i]
                yb = laplace_apply_global_diag(
                    xb, self.dim, nb, self.p, E_list, G_list,
                    arg1, arg2)
            elif self._dense:
                yb = laplace_apply_dense_masked(
                    xb, self.dim, nb, self.p, arg1, arg2)
            else:
                yb = laplace_apply_structured(
                    xb, self.dim, nb, self.p, pr["S"], pr["D_col"],
                    arg1, arg2)
            parts.append(yb)
        return jnp.concatenate(parts)

    def _vmult_raw_p(self, pr, u):
        return self.compress_p(pr, self._cells_p(pr, u))

    def _pair_delta_t_inline(self, pr, y):
        """C^T folded into the PARTIAL field: read hanging-row values
        (single-copy, so partial == total), zero them, add the restricted
        deltas onto the coarse blocks as partials — the one compress that
        follows reconciles cell partials and deltas together."""
        for i, meta in enumerate(self._pair_meta):
            h = pr["pair_h"][i]
            Fseg = self._seg(y, meta["bf"])
            yh = Fseg[meta["dst_sl"]] * h
            dC = self._pair_apply(pr["pair_P"][i], yh, transpose=True)
            dC = dC * pr["pair_alive"][i]
            Fseg = Fseg.at[meta["dst_sl"]].set(
                Fseg[meta["dst_sl"]] * (1.0 - h))
            y = self._put_seg(y, meta["bf"], Fseg)
            Cseg = self._seg(y, meta["bc"])
            Cseg = Cseg.at[meta["src_sl"]].add(dC)
            y = self._put_seg(y, meta["bc"], Cseg)
        return y

    def _vmult_p(self, pr, x):
        m = pr["interior_mask"]
        xh = self.distribute_p(pr, m * x)
        if self._single_compress and self._pair_meta:
            y = self._cells_p(pr, xh)
            y = self._pair_delta_t_inline(pr, y)
            y = self.compress_p(pr, y)
        else:
            y = self._vmult_raw_p(pr, xh)
            y = self.distribute_transpose_p(pr, y)
        return m * y + (1.0 - m) * x

    def _vmult_traced(self, pr, x):
        return self._vmult_p(pr, x)

    def _vmult_raw_traced(self, pr, x):
        return self._vmult_raw_p(pr, x)

    # public single-call wrappers (params threaded as jit ARGUMENTS)
    def vmult(self, x):
        """Constrained apply y = m C^T A C (m x) + (1-m) x on the patch
        vector (same semantics as LaplaceOperator.vmult)."""
        return self._vmult(self.params, x)

    def vmult_raw(self, x):
        """Raw apply (A x in patch space, copies reconciled)."""
        return self._vmult_raw(self.params, x)

    def compress(self, y):
        return self.compress_p(self.params, y)

    def distribute(self, u, homogeneous: bool = True):
        return self.distribute_p(self.params, u, homogeneous=homogeneous)

    def distribute_transpose(self, y):
        return self.distribute_transpose_p(self.params, y)

    # ------------------------------------------------------------------
    def dot(self, a, b):
        """Owner-weighted dot == global-space dot, fixed reduction order."""
        return jnp.dot(self.w_owner * a, b,
                       precision=jax.lax.Precision.HIGHEST)

    def cheb_params(self, diag_patch, degree: int = 4,
                    smoothing_range: float = 20.0):
        """Chebyshev preconditioner parameters for the patch operator
        (theta, delta as device scalars, degree static) — the reference's
        ``PreconditionChebyshev`` over the box tier."""
        from tpufem.solvers.chebyshev import make_chebyshev_params

        return make_chebyshev_params(
            lambda pr, v: self._vmult_p(pr, v), diag_patch, self.n_patch,
            degree=degree, smoothing_range=smoothing_range,
            dp=self.params)

    def cg_solve(self, b_patch, diag_patch, x0=None, rtol=1e-10,
                 maxiter=10000, precond: str = "jacobi",
                 cheb_degree: int = 4):
        """Whole preconditioned CG in patch space as ONE jitted
        computation with every device array passed as an argument (never
        closure-captured — see the params note above).  precond:
        "jacobi" (diagonal) or "chebyshev" (degree-``cheb_degree``
        Chebyshev over the Jacobi-preconditioned operator — fewer
        iterations, no extra dot products per smoother step)."""
        from tpufem.solvers.cg import cg_solve as _cg
        from tpufem.solvers.chebyshev import (
            ChebyshevParams,
            chebyshev_smooth,
        )

        if not hasattr(self, "_solvers_cg"):
            self._solvers_cg = {}
        key = (precond, cheb_degree if precond == "chebyshev" else 0)
        if key not in self._solvers_cg:
            def solver(pr, w_own, diag, b, x0_, th, dl, rtol_, maxiter_):
                dot = lambda a, c: jnp.dot(
                    w_own * a, c, precision=jax.lax.Precision.HIGHEST)
                A = lambda v: self._vmult_p(pr, v)
                if precond == "chebyshev":
                    cp = ChebyshevParams(th, dl, cheb_degree)
                    M_inv = lambda r: chebyshev_smooth(
                        A, 1.0 / diag, cp, r)
                else:
                    M_inv = lambda r: r / diag
                return _cg(A, b, M_inv=M_inv, x0=x0_,
                           rtol=rtol_, maxiter=maxiter_, dot=dot)
            self._solvers_cg[key] = jax.jit(solver,
                                            static_argnums=(7, 8))
        if x0 is None:
            x0 = jnp.zeros_like(b_patch)
        th = dl = jnp.zeros((), self.dt)
        if precond == "chebyshev":
            if not hasattr(self, "_cheb_cache"):
                self._cheb_cache = {}
            if cheb_degree not in self._cheb_cache:
                cp = self.cheb_params(diag_patch, degree=cheb_degree)
                self._cheb_cache[cheb_degree] = (cp.theta, cp.delta)
            th, dl = self._cheb_cache[cheb_degree]
        return self._solvers_cg[key](self.params, self.w_owner,
                                     diag_patch, b_patch, x0, th, dl,
                                     rtol, maxiter)

    def diagonal(self) -> jnp.ndarray:
        """Patch-space diagonal of the constrained operator (constrained
        and dead entries get 1)."""
        from tpufem.operators.laplace import LaplaceOperator
        from tpufem.ops.matrix_free import MatrixFree
        from tpufem.utils.config import FemConfig

        cfg = FemConfig(dim=self.dim, degree=self.p,
                        dtype=str(np.dtype(self.dt)), scatter="incidence")
        mf = MatrixFree.build(self.mesh, self.dofs, cfg,
                              coefficient=self.coefficient,
                              constraints=self.constraints)
        diag_g = np.asarray(LaplaceOperator(mf).diagonal(),
                            dtype=np.float64)
        d = np.ones(self.n_patch)
        for b in self.boxes:
            g = b.gid.reshape(-1)
            ok = g >= 0
            seg = np.ones(b.n_nodes)
            seg[ok] = diag_g[g[ok]]
            d[b.offset : b.offset + b.n_nodes] = seg
        # constrained entries are identity rows already (diag 1); dead = 1
        return jnp.asarray(d, self.dt)
