"""Distributed box tier: adaptive (2:1 forest) meshes on a device mesh
at box-tier speed.

Reference analogue: the reference composes its multi-GPU partitioner with
the adaptive hanging-node cell loop — each device runs the SAME fast
kernel on its cell range with two-phase ghost exchange
(``update_ghost_values`` / ``compress``, SURVEY.md §3.6).  tpufem's
``GeneralPartitioner`` already gives that composition for arbitrary
partitions, but its per-shard apply is the generic incidence pipeline
(~0.013 GDoF/s class on TPU).  This module distributes the BOX tier
itself (``tpufem.ops.boxes``, the 0.5+ GDoF/s adaptive path), keeping
every shard's inner loop index-free.

TPU-native design
-----------------
Slab decomposition along the leading lattice axis ("z"), optionally
crossed with a second decomposition along "y" (3D: a 2-axis z × y device
mesh, the box-tier analogue of ``Partitioner2D`` — the lane axis x is
never cut).  Cut planes are aligned to the COARSEST cell size present:

- every box's slab boundary is cell-aligned (sizes are powers of two, so
  s_max-multiples are cell boundaries of every size group);
- cut planes are coarse-NODE-aligned in every box, so the 1D pair
  prolongation rows on a cut plane are exact identity rows: the dense
  C / Cᵀ / sweep transfers never reach across a cut in z.  All
  cross-shard coupling collapses to ONE shared node plane per box per
  neighbor.

Each shard's local patch vector is the concatenation of its per-box z
slabs, padded to shard-uniform shapes (dead cells carry zero quadrature
weight / zero transfer masks — data, not structure, varies per shard).
The apply chain (C → cell loops → folded Cᵀ → copy sweeps) therefore
runs UNMODIFIED per shard — the methods of ``BoxLaplaceOperator`` are
reused verbatim on a per-shard parameter pytree — followed by ONE
cross-shard reconciliation of the cut planes (two single-neighbor
``ppermute`` shifts riding ICI on TPU meshes, then a segment-sum over
precomputed gid groups).  Consistency argument: cells are partitioned
disjointly, so raw partials are complete except on cut-plane rows; C
and the masks are replicated arithmetic on consistent inputs
(bitwise-identical across shards); Cᵀ deltas of a cut-plane hanging row
restrict to the cut plane itself (identity row in z).  A cut-plane node
may have copies in boxes that exist on only ONE side of the cut (a box
ending/starting exactly at the cut), so a per-box plane add is NOT
enough: instead both shards exchange RAW per-box plane partials, sum
each physical node over all its (box, side) copies — both sides hold
symmetric information and reconstruct identical totals, fusing
``compress(add)`` + ``update_ghost_values`` into one exchange — and the
local sweeps skip cut-plane rows (their E/msh masks are zeroed there).

Dots carry owner weights (global copy owner × plane ownership: the
shared plane belongs to the lower shard), psum'd over the shard axis —
fixed reduction tree, bitwise-stable CG iteration counts.

v1 contract (checked at build): the mesh's constraint surface must be
fully dense — no gather-fallback constraint rows and no sweep-uncovered
multi copies (``single_compress``; holds on the whole flagship family),
and the cell scheme must be "global"/"global-general".
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from tpufem.ops.boxes import Box, BoxLaplaceOperator


class _LocalBoxApply(BoxLaplaceOperator):
    """Per-shard apply template: borrows the traced apply-path methods of
    BoxLaplaceOperator (``distribute_p`` / ``_cells_p`` /
    ``_pair_delta_t_inline`` / ``compress_p``) on LOCAL slab geometry.
    Never calls ``BoxLaplaceOperator.__init__`` — holds only the static
    structure those methods read; all arrays arrive via the per-shard
    parameter pytree."""

    def __init__(self, boxes, box_nb, pair_meta, cell_scheme,
                 single_compress, dim, p, dt):
        self.boxes = boxes
        self._box_nb = box_nb
        self._pair_meta = pair_meta
        self._cell_scheme = cell_scheme
        self._single_compress = single_compress
        self._dense = False
        self._has_fallback = False
        self._rect_groups = []
        self._pairs = list(pair_meta)
        self.has_hanging = bool(pair_meta)
        self._Kc = 1
        self.dim, self.p, self.dt = dim, p, dt


def _slab_rows(a_cells: int, r_cells: int, p: int, LZ: int,
               g_off: int, g_len: int):
    """(valid_mask (LZ,), clipped global-row indices (LZ,)) for local
    z-node L ↔ global-region row a_cells*p + L - g_off; rows beyond the
    REAL slab (r_cells == 0: none; else L > r_cells*p) are invalid."""
    L = np.arange(LZ)
    g = a_cells * p + L - g_off
    ok = (g >= 0) & (g < g_len)
    if r_cells == 0:
        ok &= False
    else:
        ok &= L <= r_cells * p
    return ok, np.clip(g, 0, max(g_len - 1, 0))


class DistributedBoxLaplace:
    """Shard a :class:`BoxLaplaceOperator` over a 1- or 2-axis device mesh.

    Parameters: the (host-built) global operator, the shard count (1-axis
    z slabs) or ``shards=(sz, sy)`` (3D only: a 2-axis z × y device mesh,
    the box-tier analogue of ``Partitioner2D``), and an optional explicit
    device list.  ``vmult`` / ``cg_solve`` act on the stacked local patch
    vector of shape ``(sz*sy, NL)`` sharded over both mesh axes;
    ``to_local`` / ``from_local`` convert at IO boundaries.

    Cut planes along each sharded lattice axis reconcile by the raw-
    partial exchange + gid-group sum of the 1-axis scheme, applied as two
    sequential phases (z then y).  Corner lines (on BOTH cut sets) are
    exact because the y phase reads the z-reconciled values and counts
    each (gid, y-side) once via representative weights — all same-side
    copies are equal after the z SET.
    """

    def __init__(self, gop: BoxLaplaceOperator, n_shards: int = None,
                 axis_name: str = "shard", devices=None, shards=None):
        if gop._cell_scheme not in ("global", "global-general"):
            raise NotImplementedError(
                "distributed box tier needs the global cell schemes")
        if gop._has_fallback:
            raise NotImplementedError(
                "gather-fallback constraint rows present — use "
                "GeneralPartitioner for this mesh")
        if gop._pair_meta:
            if not gop._single_compress:
                raise NotImplementedError("single-compress required")
            if int(np.asarray(gop.params["multi_fb_idx"]).shape[0]):
                raise NotImplementedError(
                    "sweep-uncovered multi copies present")
        elif int(np.asarray(gop.params["multi_idx"]).shape[0]):
            raise NotImplementedError(
                "multi copies without dense pair plans")
        if shards is None:
            shards = (int(n_shards), 1)
        sz, sy = int(shards[0]), int(shards[1])
        if sy > 1 and gop.dim != 3:
            raise NotImplementedError("2-axis box sharding needs dim=3 "
                                      "(never cut the lane axis)")
        self.gop = gop
        self.sz, self.sy = sz, sy
        self.n_shards = sz * sy
        self.axis_name = axis_name
        self.axis_name_y = axis_name + "_y"
        self._devices = devices
        d, p = gop.dim, gop.p
        self.dim, self.p, self.dt = d, p, gop.dt
        boxes = gop.boxes
        mesh = gop.mesh
        n_shards = self.n_shards

        # ---- cuts per sharded lattice axis: coarsest-size-aligned, -----
        # balanced by active cells.  Lattice axis 0 = xyz axis d-1 (z),
        # lattice axis 1 = xyz axis d-2 (y, 3D 2-axis only).
        self.cuts_units = self._make_cuts(0, sz)
        self.cuts_y = self._make_cuts(1, sy) if sy > 1 else None

        # ---- per-box slab geometry per axis -----------------------------
        self._slab = self._make_slabs(0, self.cuts_units)
        self._slab_y = (self._make_slabs(1, self.cuts_y) if sy > 1
                        else [(np.zeros(1, int),
                               np.full(1, b.nb[1] if d > 1 else 1, int),
                               b.nb[1] if d > 1 else 1) for b in boxes])

        # on-cut flags per axis row/column: does box bi's slab start/end
        # ON the cut plane (vs. at a box end strictly inside the shard)?
        # Only on-cut planes take part in the cross-shard reconciliation.
        self._bot_cut, self._top_cut = self._make_flags(
            0, self.cuts_units, self._slab, sz)
        if sy > 1:
            self._bot_cut_y, self._top_cut_y = self._make_flags(
                1, self.cuts_y, self._slab_y, sy)
        else:
            nbox = len(boxes)
            self._bot_cut_y = np.zeros((1, nbox), bool)
            self._top_cut_y = np.zeros((1, nbox), bool)

        # local template boxes (shard-uniform shapes)
        lboxes, lnb = [], []
        off = 0
        for bi, b in enumerate(boxes):
            NCZ = self._slab[bi][2]
            lat = (NCZ * p + 1,) + b.lattice_shape[1:]
            nb = (NCZ,) + b.nb[1:]
            if sy > 1:
                NCY = self._slab_y[bi][2]
                lat = (lat[0], NCY * p + 1) + b.lattice_shape[2:]
                nb = (nb[0], NCY) + b.nb[2:]
            lboxes.append(Box(
                size=b.size, lo=b.lo, nb=nb, cells=b.cells[:0],
                lattice_shape=lat, gid=np.zeros(0), active=np.zeros(0),
                offset=off))
            lnb.append(nb)
            off += int(np.prod(lat))
        self.NL = off
        self.lboxes = lboxes

        # full-extent pair metadata on the sharded axes (unsharded
        # tangential slices stay global-static)
        lmeta = []
        for meta in gop._pair_meta:
            lc = lboxes[meta["bc"]].lattice_shape
            lf = lboxes[meta["bf"]].lattice_shape
            nloc = 2 if sy > 1 else 1

            def _loc(sls, lat):
                return tuple(slice(0, lat[a]) for a in range(nloc)) \
                    + tuple(sls[nloc:])

            lmeta.append(dict(
                bc=meta["bc"], bf=meta["bf"],
                src_sl=_loc(meta["src_sl"], lc),
                dst_sl=_loc(meta["dst_sl"], lf),
                sub_c=_loc(meta["sub_c"], lc),
                sub_f=meta["sub_f"],
            ))
        self.tmpl = _LocalBoxApply(
            lboxes, tuple(lnb), lmeta, gop._cell_scheme,
            gop._single_compress, d, p, gop.dt)

        # ---- stacked per-shard parameter pytree ------------------------
        prs = [self._shard_params(s) for s in range(n_shards)]
        self.params = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *prs)
        # per-shard top-plane index per box and axis (r*p; 0 when empty)
        tops = np.stack([
            np.array([int(r[s // sy]) * p for (_, r, _) in self._slab])
            for s in range(n_shards)]).astype(np.int32)
        self.params["plane_top"] = jnp.asarray(tops)
        if sy > 1:
            topy = np.stack([
                np.array([int(r[s % sy]) * p
                          for (_, r, _) in self._slab_y])
                for s in range(n_shards)]).astype(np.int32)
            self.params["plane_top_y"] = jnp.asarray(topy)

        # ---- cut-plane reconciliation groups ---------------------------
        # Raw plane partials are exchanged per box; each physical node on
        # a cut plane then gets the SUM over ALL its (box, shard-side)
        # copies — grouped by global DoF id (the same id is computed on
        # both sides from the global box lattice, so no second exchange
        # is needed: both shards reconstruct identical totals).  With a
        # second sharded axis the y phase runs on the z-reconciled values:
        # corner slots (on a z cut too) contribute through ONE
        # representative per (gid, y-side) — all same-side copies are
        # equal after the z SET — while their set weights cover every
        # copy; non-corner slots sum raw partials as in the z phase.
        dtc = np.dtype(str(np.dtype(self.dt)))
        self._build_cut_groups(0)
        if sy > 1:
            self._build_cut_groups(1)
        self._vmult_sm = None
        self._solvers: dict = {}

    # ------------------------------------------------------------------
    # sharded-axis helpers (lattice axis 0 = z = xyz d-1; axis 1 = y)
    def _axis_xyz(self, ax: int) -> int:
        return self.dim - 1 - ax

    def _axis_row(self, s: int, ax: int) -> int:
        return s // self.sy if ax == 0 else s % self.sy

    def _nbr(self, s: int, ax: int, step: int):
        """Shard index of the axis-ax neighbor, or None at the edge."""
        iz, iy = divmod(s, self.sy)
        if ax == 0:
            iz += step
            if not (0 <= iz < self.sz):
                return None
        else:
            iy += step
            if not (0 <= iy < self.sy):
                return None
        return iz * self.sy + iy

    def _cut_ok(self, ax: int, c: int) -> bool:
        """A cut at unit coord ``c`` is valid unless it strands a 2:1
        fill: if some pair's COARSE box has no cells on one side of c
        while the pair's hanging (dst) rows extend to that side, the
        shard on that side can neither C-fill those rows (the identity
        source plane of the coarse box does not exist in its slab) nor
        land their Cᵀ delta — observed as a ~3e-2 vmult parity break on
        the shell-wedge mesh, where the balanced cut coincided with the
        full 2:1 interface plane."""
        gop = self.gop
        p = gop.p
        a = self._axis_xyz(ax)
        for meta in gop._pair_meta:
            bfb = gop.boxes[meta["bf"]]
            bcb = gop.boxes[meta["bc"]]
            f0 = int(bfb.lo[a]) * bfb.size
            f1 = f0 + int(bfb.nb[ax]) * bfb.size
            b0 = int(bcb.lo[a]) * bcb.size
            b1 = b0 + int(bcb.nb[ax]) * bcb.size
            sl = meta["dst_sl"][ax]
            lat = bfb.lattice_shape[ax]
            r0 = 0 if sl.start is None else int(sl.start)
            r1 = lat if sl.stop is None else int(sl.stop)
            h0 = f0 + r0 * bfb.size / p
            h1 = f0 + (r1 - 1) * bfb.size / p
            if b0 >= c and h0 <= c and f0 < c:
                return False  # lower shard: fine cells, no coarse plane
            if b1 <= c and h1 >= c and f1 > c:
                return False  # upper shard, symmetric
        return True

    def _make_cuts(self, ax: int, ns: int) -> np.ndarray:
        mesh, boxes = self.gop.mesh, self.gop.boxes
        s_max = max(b.size for b in boxes)
        ncand = mesh.U // s_max
        slot = mesh.origins[:, self._axis_xyz(ax)] // s_max
        wt = np.bincount(slot, minlength=ncand).astype(np.float64)
        cum = np.cumsum(wt)
        cuts = [0]
        for s in range(1, ns):
            k = int(np.searchsorted(cum, cum[-1] * s / ns,
                                    side="left")) + 1
            # strictly increasing while slots remain: an EMPTY shard row
            # between non-empty ones would break the single-neighbor
            # plane adjacency.  Unavoidable empties (ns > slots) land at
            # the END, where their planes are dead.
            k = min(max(k, cuts[-1] + 1), ncand)
            if cuts[-1] >= ncand:
                cuts.append(ncand)
                continue
            if not self._cut_ok(ax, k * s_max):
                # nudge to the nearest valid INTERIOR coarse-aligned
                # plane; snapping to the domain end would silently leave
                # the remaining shards empty (the user asked for ns-way
                # parallelism), so that case raises instead
                allowed = [j for j in range(cuts[-1] + 1, ncand)
                           if self._cut_ok(ax, j * s_max)]
                if not allowed:
                    raise NotImplementedError(
                        "no valid cut plane on this axis: every "
                        "interior coarse-aligned plane strands a 2:1 "
                        "interface fill — reduce shards or use "
                        "GeneralPartitioner")
                k = min(allowed, key=lambda j: abs(j - k))
            cuts.append(k)
        cuts.append(ncand)
        return np.asarray(cuts) * s_max

    def _make_slabs(self, ax: int, cuts: np.ndarray):
        out = []
        for b in self.gop.boxes:
            z0 = int(b.lo[self._axis_xyz(ax)])
            a = np.clip(cuts[:-1] // b.size - z0, 0, b.nb[ax])
            e = np.clip(cuts[1:] // b.size - z0, 0, b.nb[ax])
            r = np.maximum(e - a, 0)
            out.append((a.astype(int), r.astype(int),
                        max(int(r.max()), 1)))
        return out

    def _make_flags(self, ax: int, cuts, slabs, ns: int):
        nbox = len(self.gop.boxes)
        bot = np.zeros((ns, nbox), bool)
        top = np.zeros((ns, nbox), bool)
        for bi, b in enumerate(self.gop.boxes):
            z0u = int(b.lo[self._axis_xyz(ax)]) * b.size
            a, r, _ = slabs[bi]
            for i in range(ns):
                if int(r[i]) <= 0:
                    continue
                bot[i, bi] = z0u + int(a[i]) * b.size == cuts[i]
                top[i, bi] = (z0u + int(a[i] + r[i]) * b.size
                              == cuts[i + 1])
        return bot, top

    def _face_gids(self, bi: int, ax: int, c_units: int, s: int):
        """Localized gid face of box bi on the axis-ax plane at c_units
        (None when the box has no lattice plane there).  The OTHER
        sharded axis is restricted to shard s's slab (invalid rows -1);
        unsharded axes stay global."""
        b, lb, p = self.gop.boxes[bi], self.lboxes[bi], self.p
        z0u = int(b.lo[self._axis_xyz(ax)]) * b.size
        j, rem = divmod(c_units - z0u, b.size)
        if rem or j < 0 or j > b.nb[ax]:
            return None
        gid = b.gid.reshape(b.lattice_shape)
        face = np.take(gid, j * p, axis=ax)  # global face, axis removed
        oax = 1 - ax  # the other sharded lattice axis
        if self.sy <= 1 and oax == 1:
            return face.reshape(-1)
        if oax == 0:
            slab, row = self._slab, self._axis_row(s, 0)
        else:
            slab, row = self._slab_y, self._axis_row(s, 1)
        a, r, _ = slab[bi]
        # face axis 0 is the other sharded axis for both ax=0 (face =
        # (y, x...)) and ax=1 (face = (z, x...))
        Lloc = lb.lattice_shape[oax]
        ok, gz = _slab_rows(int(a[row]), int(r[row]), p, Lloc,
                            0, face.shape[0])
        out = np.full((Lloc,) + face.shape[1:], -1, np.int64)
        out[ok] = face[gz[ok]]
        return out.reshape(-1)

    def _face_idx(self, bi: int, ax: int, row: int) -> np.ndarray:
        """Flat local patch indices of box bi's axis-ax plane at local
        row index ``row``."""
        lb = self.lboxes[bi]
        grid = np.arange(int(np.prod(lb.lattice_shape)),
                         dtype=np.int64).reshape(lb.lattice_shape)
        return (lb.offset + np.take(grid, row, axis=ax)).reshape(-1)

    def _corner_mask(self, bi: int, ax: int, s: int) -> np.ndarray:
        """For axis-ax faces: which slots lie on a cut of the OTHER
        sharded axis (corner lines — already axis-oax reconciled)."""
        lb = self.lboxes[bi]
        oax = 1 - ax
        face_shape = tuple(n for a, n in enumerate(lb.lattice_shape)
                           if a != ax)
        m = np.zeros(face_shape, bool)
        if self.sy <= 1:
            return m.reshape(-1)
        if oax == 0:
            slab, flags_b, flags_t, row = (self._slab, self._bot_cut,
                                           self._top_cut,
                                           self._axis_row(s, 0))
        else:
            slab, flags_b, flags_t, row = (self._slab_y, self._bot_cut_y,
                                           self._top_cut_y,
                                           self._axis_row(s, 1))
        _, r, _ = slab[bi]
        if flags_b[row, bi]:
            m[0] = True
        if flags_t[row, bi]:
            m[int(r[row]) * self.p] = True
        return m.reshape(-1)

    def _build_cut_groups(self, ax: int):
        """Per-shard gid groups + weights + scatter indices for the
        axis-ax cut planes, stored in params as cut_{seg,wm,wr,ws,idx}
        (ax=0) / cut_{...}_y (ax=1).  wm = my summation weight, wr =
        received summation weight, ws = my SET weight (differs from wm
        only on corner slots, which sum through one representative but
        set every copy)."""
        p, sy = self.p, self.sy
        n_shards = self.n_shards
        lboxes, boxes = self.lboxes, self.gop.boxes
        dtc = np.dtype(str(np.dtype(self.dt)))
        cuts = self.cuts_units if ax == 0 else self.cuts_y
        slabs = self._slab if ax == 0 else self._slab_y
        bot, top = ((self._bot_cut, self._top_cut) if ax == 0
                    else (self._bot_cut_y, self._top_cut_y))
        faceL = [int(np.prod(lb.lattice_shape) // lb.lattice_shape[ax])
                 for lb in lboxes]
        T = sum(faceL)
        segs = np.zeros((n_shards, 2 * T), np.int32)
        wm = np.zeros((n_shards, 2 * T))
        wr = np.zeros((n_shards, 2 * T))
        ws = np.zeros((n_shards, 2 * T))
        idxs = np.zeros((n_shards, 2 * T), np.int64)
        nseg = 1
        for s in range(n_shards):
            row = self._axis_row(s, ax)
            half_off = 0  # disjoint id blocks for the two cuts
            for half, c in ((0, int(cuts[row + 1])),
                            (1, int(cuts[row]))):
                base = half * T
                gvec = np.full(T, -1, np.int64)
                corner = np.zeros(T, bool)
                off = 0
                for bi in range(len(boxes)):
                    g = self._face_gids(bi, ax, c, s)
                    if g is not None:
                        gvec[off:off + faceL[bi]] = g
                        corner[off:off + faceL[bi]] = self._corner_mask(
                            bi, ax, s)
                    off += faceL[bi]
                ok = gvec >= 0
                if ok.any():
                    uniq, inv = np.unique(gvec[ok], return_inverse=True)
                    segs[s, base:base + T][ok] = inv + half_off
                    half_off += len(uniq)
                    nseg = max(nseg, half_off)
                nbr = self._nbr(s, ax, +1 if half == 0 else -1)
                nrow = None if nbr is None else self._axis_row(nbr, ax)
                valid_m = np.zeros(T, bool)
                valid_r = np.zeros(T, bool)
                off = 0
                for bi, lb in enumerate(lboxes):
                    _, r, _ = slabs[bi]
                    sl = slice(off, off + faceL[bi])
                    okb = ok[off:off + faceL[bi]]
                    mine = (top if half == 0 else bot)[row, bi]
                    recv = (nrow is not None
                            and (bot if half == 0 else top)[nrow, bi])
                    lrow = int(r[row]) * p if half == 0 else 0
                    valid_m[sl] = okb & bool(mine)
                    valid_r[sl] = okb & bool(recv)
                    if mine:
                        idxs[s, base + off:base + off + faceL[bi]] = \
                            self._face_idx(bi, ax, lrow)
                    off += faceL[bi]
                # summation weights: in the SECOND (y) phase, corner
                # slots are already z-reconciled (all same-side copies
                # equal) and count once per (gid, side); the z phase sums
                # raw values everywhere
                wsum_m = valid_m.astype(np.float64)
                wsum_r = valid_r.astype(np.float64)
                if ax == 1:
                    for vec, wv in ((valid_m, wsum_m), (valid_r, wsum_r)):
                        seen: set = set()
                        cidx = np.nonzero(corner & vec)[0]
                        for k in cidx:
                            g = int(gvec[k])
                            if g in seen:
                                wv[k] = 0.0
                            else:
                                seen.add(g)
                wm[s, base:base + T] = wsum_m
                wr[s, base:base + T] = wsum_r
                ws[s, base:base + T] = valid_m.astype(np.float64)
        suff = "" if ax == 0 else "_y"
        setattr(self, "_nseg" + suff, nseg)
        self.params["cut_seg" + suff] = jnp.asarray(segs)
        self.params["cut_wm" + suff] = jnp.asarray(wm.astype(dtc))
        self.params["cut_wr" + suff] = jnp.asarray(wr.astype(dtc))
        self.params["cut_ws" + suff] = jnp.asarray(ws.astype(dtc))
        self.params["cut_idx" + suff] = jnp.asarray(idxs.astype(np.int32))

    # ------------------------------------------------------------------
    def _slice_ax(self, arr, bi: int, s: int, ax: int, axis_pos: int,
                  per: int, pad_to: int, fill=0.0):
        """Slice box bi's shard-s axis-ax slab from a global per-box
        array along array axis ``axis_pos`` (``per`` entries per cell)."""
        slab = self._slab if ax == 0 else self._slab_y
        row = self._axis_row(s, ax)
        a, r, _ = slab[bi]
        lo, n = int(a[row]) * per, int(r[row]) * per
        out_shape = (arr.shape[:axis_pos] + (pad_to,)
                     + arr.shape[axis_pos + 1:])
        out = np.full(out_shape, fill, dtype=arr.dtype)
        if n > 0:
            so = [slice(None)] * arr.ndim
            si_ = [slice(None)] * arr.ndim
            so[axis_pos] = slice(0, n)
            si_[axis_pos] = slice(lo, lo + n)
            out[tuple(so)] = arr[tuple(si_)]
        return out

    def _loc_nodes(self, arr, bi: int, s: int):
        """Localize a full-lattice per-box node array to shard s's slab
        (both sharded axes), zero-filling dead rows.  arr's leading dims
        are the box's global lattice."""
        b, lb, p = self.gop.boxes[bi], self.lboxes[bi], self.p
        az, rz, _ = self._slab[bi]
        iz = self._axis_row(s, 0)
        okz, gz = _slab_rows(int(az[iz]), int(rz[iz]), p,
                             lb.lattice_shape[0], 0, b.lattice_shape[0])
        out = arr[gz] * okz.reshape((-1,) + (1,) * (arr.ndim - 1))
        if self.sy > 1:
            ay, ry, _ = self._slab_y[bi]
            iy = self._axis_row(s, 1)
            oky, gy = _slab_rows(int(ay[iy]), int(ry[iy]), p,
                                 lb.lattice_shape[1], 0,
                                 b.lattice_shape[1])
            out = out[:, gy] * oky.reshape((1, -1) + (1,)
                                           * (arr.ndim - 2))
        return out

    def _shard_params(self, s: int):
        gop, d, p = self.gop, self.dim, self.p
        q1 = p + 1
        sy = self.sy
        iz, iy = self._axis_row(s, 0), self._axis_row(s, 1)
        pr: dict = {}
        # box args + interior mask + owner weights + E/G operators
        box_args, box_EG = [], []
        im_parts, w_parts = [], []
        im_g = np.asarray(gop.interior_mask, np.float64)
        w_g = np.asarray(gop.w_owner, np.float64)
        from tpufem.ops.structured import global_interp_matrices
        from tpufem.fem.quadrature import Quadrature
        from tpufem.fem.shapes import ShapeInfo

        si = ShapeInfo(p, Quadrature.gauss(q1))
        dtc = np.dtype(str(np.dtype(self.dt)))
        for bi, (b, lb) in enumerate(zip(gop.boxes, self.lboxes)):
            NCZ = self._slab[bi][2]
            # interior mask + owner weights: slab node planes
            seg_im = im_g[b.offset : b.offset + b.n_nodes].reshape(
                b.lattice_shape)
            seg_w = w_g[b.offset : b.offset + b.n_nodes].reshape(
                b.lattice_shape)
            im_l = self._loc_nodes(seg_im, bi, s)
            w_l = self._loc_nodes(seg_w, bi, s)
            # shared planes owned by the lower shard along each axis
            if int(self._slab[bi][0][iz]) > 0:
                w_l[0] = 0.0
            if sy > 1 and int(self._slab_y[bi][0][iy]) > 0:
                w_l[:, 0] = 0.0
            im_parts.append(im_l.reshape(-1))
            w_parts.append(w_l.reshape(-1))
            # cell-loop operands
            arg1, arg2 = gop.params["box_args"][bi]
            if gop._cell_scheme == "global-general":
                g = np.asarray(arg1)  # (nqz[, nqy], ..., ncomp)
                g = self._slice_ax(g, bi, s, 0, 0, q1, NCZ * q1)
                if sy > 1:
                    NCY = self._slab_y[bi][2]
                    g = self._slice_ax(g, bi, s, 1, 1, q1, NCY * q1)
                box_args.append((g, np.zeros(1, dtc)))
            else:
                wb = np.asarray(arg2)  # (nz, q1, ny, q1[, nx, q1]) bcast
                wb = self._slice_ax(wb, bi, s, 0, 0, 1, NCZ)
                if sy > 1:
                    NCY = self._slab_y[bi][2]
                    wb = self._slice_ax(wb, bi, s, 1, 2, 1, NCY)
                box_args.append((np.asarray(arg1), wb))
            E_t, G_t = gop._box_EG[bi]
            Ez, Gz = global_interp_matrices(p, NCZ, si.S, si.D_col)
            E_loc = (np.asarray(Ez, dtc),)
            G_loc = (np.asarray(Gz, dtc),)
            if sy > 1:
                NCY = self._slab_y[bi][2]
                Ey, Gy = global_interp_matrices(p, NCY, si.S, si.D_col)
                E_loc += (np.asarray(Ey, dtc),)
                G_loc += (np.asarray(Gy, dtc),)
            k = len(E_loc)
            box_EG.append(
                (E_loc + tuple(np.asarray(E, dtc) for E in E_t[k:]),
                 G_loc + tuple(np.asarray(G, dtc) for G in G_t[k:])))
        pr["box_args"] = tuple(box_args)
        pr["box_EG"] = tuple(box_EG)
        pr["interior_mask"] = np.concatenate(im_parts).astype(dtc)
        pr["w_owner"] = np.concatenate(w_parts).astype(dtc)
        pr["S"] = np.asarray(gop.params["S"])
        pr["D_col"] = np.asarray(gop.params["D_col"])
        pr["multi_idx"] = np.zeros((0, 1), np.int32)
        pr["multi_w"] = np.zeros((0, 1), dtc)

        # pair transfers: sharded-axis factors/masks localized per shard
        if gop._pair_meta:
            pair_P, pair_h, pair_alive = [], [], []
            pair_msh, pair_E, pair_S = [], [], []
            nax = 2 if sy > 1 else 1  # localized tensor axes
            for i, meta in enumerate(gop._pair_meta):
                bc, bf = meta["bc"], meta["bf"]
                Pt = gop.params["pair_P"][i]
                St = gop.params["pair_S"][i]
                hg = np.asarray(gop.params["pair_h"][i], np.float64)
                Eg = np.asarray(gop.params["pair_E"][i], np.float64)
                ag = np.asarray(gop.params["pair_alive"][i], np.float64)
                mg = np.asarray(gop.params["pair_msh"][i], np.float64)
                P_loc, S_loc = [], []
                okf_ax, okc_ax, oks_ax = [], [], []
                gf_ax, gc_ax, gsub_ax = [], [], []
                for ax in range(nax):
                    slab = self._slab if ax == 0 else self._slab_y
                    row = self._axis_row(s, ax)
                    ac, rc, _ = slab[bc]
                    af, rf, _ = slab[bf]
                    Lc = self.lboxes[bc].lattice_shape[ax]
                    Lf = self.lboxes[bf].lattice_shape[ax]
                    d0 = meta["dst_sl"][ax].start
                    nf = meta["dst_sl"][ax].stop - d0
                    s0 = meta["src_sl"][ax].start
                    nc = meta["src_sl"][ax].stop - s0
                    j0 = meta["sub_c"][ax].start
                    nsub = meta["sub_c"][ax].stop - j0
                    okf, gf = _slab_rows(int(af[row]), int(rf[row]), p,
                                         Lf, d0, nf)
                    okc, gc = _slab_rows(int(ac[row]), int(rc[row]), p,
                                         Lc, s0, nc)
                    oks, gsub = _slab_rows(int(ac[row]), int(rc[row]), p,
                                           Lc, j0, nsub)
                    Pg = np.asarray(Pt[ax], np.float64)
                    Sg = np.asarray(St[ax], np.float64)
                    mk = (okf[:, None] & okc[None, :]).astype(np.float64)
                    P_loc.append(Pg[np.ix_(gf, gc)] * mk)
                    # S rows live on the coarse sub grid, cols on the
                    # fine dst
                    mk = (oks[:, None] & okf[None, :]).astype(np.float64)
                    S_loc.append(Sg[np.ix_(gsub, gf)] * mk)
                    okf_ax.append(okf)
                    okc_ax.append(okc)
                    oks_ax.append(oks)
                    gf_ax.append(gf)
                    gc_ax.append(gc)
                    gsub_ax.append(gsub)

                def _loc_mask(arr, oks_, gs_):
                    out = arr[gs_[0]] * oks_[0].reshape(
                        (-1,) + (1,) * (arr.ndim - 1))
                    for ax in range(1, len(gs_)):
                        sh = [1] * arr.ndim
                        sh[ax] = -1
                        out = np.take(out, gs_[ax], axis=ax) \
                            * oks_[ax].reshape(sh)
                    return out

                h_l = _loc_mask(hg, okf_ax, gf_ax)
                E_l = _loc_mask(Eg, okf_ax, gf_ax)
                a_l = _loc_mask(ag, okc_ax, gc_ax)
                m_l = _loc_mask(mg, oks_ax, gsub_ax)
                # cut-plane rows are excluded from the local sweeps: they
                # are reconciled exactly by the cross-shard plane groups
                # (raw-partial sums over every box/shard copy)
                if self._bot_cut[iz, bf]:
                    E_l[0] = 0.0
                if self._top_cut[iz, bf]:
                    E_l[int(self._slab[bf][1][iz]) * p] = 0.0
                if self._bot_cut[iz, bc]:
                    m_l[0] = 0.0
                if self._top_cut[iz, bc]:
                    m_l[int(self._slab[bc][1][iz]) * p] = 0.0
                if sy > 1:
                    if self._bot_cut_y[iy, bf]:
                        E_l[:, 0] = 0.0
                    if self._top_cut_y[iy, bf]:
                        E_l[:, int(self._slab_y[bf][1][iy]) * p] = 0.0
                    if self._bot_cut_y[iy, bc]:
                        m_l[:, 0] = 0.0
                    if self._top_cut_y[iy, bc]:
                        m_l[:, int(self._slab_y[bc][1][iy]) * p] = 0.0
                pair_P.append(tuple(M.astype(dtc) for M in P_loc)
                              + tuple(np.asarray(M) for M in Pt[nax:]))
                pair_S.append(tuple(M.astype(dtc) for M in S_loc)
                              + tuple(np.asarray(M) for M in St[nax:]))
                pair_h.append(h_l.astype(dtc))
                pair_E.append(E_l.astype(dtc))
                pair_alive.append(a_l.astype(dtc))
                pair_msh.append(m_l.astype(dtc))
            pr.update(pair_P=tuple(pair_P), pair_h=tuple(pair_h),
                      pair_alive=tuple(pair_alive),
                      pair_msh=tuple(pair_msh), pair_E=tuple(pair_E),
                      pair_S=tuple(pair_S),
                      multi_fb_idx=np.zeros((0, 1), np.int32),
                      multi_fb_w=np.zeros((0, 1), dtc))
        return pr

    # ------------------------------------------------------------------
    def device_mesh(self) -> DeviceMesh:
        devices = self._devices
        if devices is None:
            devices = jax.devices()[: self.n_shards]
        if len(devices) < self.n_shards:
            raise ValueError(
                f"need {self.n_shards} devices, have {len(devices)}")
        return DeviceMesh(
            np.array(devices[: self.n_shards]).reshape(self.sz, self.sy),
            (self.axis_name, self.axis_name_y))

    def sharding(self, mesh: DeviceMesh) -> NamedSharding:
        return NamedSharding(mesh, P((self.axis_name, self.axis_name_y)))

    # ---- IO boundaries (host) ----------------------------------------
    def _loc_window(self, bi: int, s: int):
        """(z window, y window, valid) node-row windows of box bi's
        shard-s slab in the GLOBAL box lattice + local plane counts."""
        p = self.p
        az, rz, _ = self._slab[bi]
        iz, iy = self._axis_row(s, 0), self._axis_row(s, 1)
        if int(rz[iz]) == 0:
            return None
        npz = int(rz[iz]) * p + 1
        loz = int(az[iz]) * p
        if self.sy > 1:
            ay, ry, _ = self._slab_y[bi]
            if int(ry[iy]) == 0:
                return None
            npy = int(ry[iy]) * p + 1
            loy = int(ay[iy]) * p
        else:
            b = self.gop.boxes[bi]
            npy = b.lattice_shape[1] if self.dim > 1 else 1
            loy = 0
        return loz, npz, loy, npy

    def to_local(self, u_patch) -> np.ndarray:
        """Global patch vector -> (n_shards, NL) stacked local slabs."""
        u = np.asarray(u_patch)
        out = np.zeros((self.n_shards, self.NL), dtype=u.dtype)
        for s in range(self.n_shards):
            for bi, (b, lb) in enumerate(zip(self.gop.boxes,
                                             self.lboxes)):
                win = self._loc_window(bi, s)
                if win is None:
                    continue
                loz, npz, loy, npy = win
                seg = u[b.offset : b.offset + b.n_nodes].reshape(
                    b.lattice_shape)
                dst = out[s, lb.offset : lb.offset
                          + int(np.prod(lb.lattice_shape))].reshape(
                              lb.lattice_shape)
                dst[:npz, :npy] = seg[loz : loz + npz, loy : loy + npy]
        return out

    def from_local(self, u_local) -> np.ndarray:
        """Owned planes of the stacked local vector -> global patch
        (shared cut planes belong to the lower shard along each axis)."""
        u = np.asarray(u_local)
        out = np.zeros(self.gop.n_patch, dtype=u.dtype)
        for s in range(self.n_shards):
            iz, iy = self._axis_row(s, 0), self._axis_row(s, 1)
            for bi, (b, lb) in enumerate(zip(self.gop.boxes,
                                             self.lboxes)):
                win = self._loc_window(bi, s)
                if win is None:
                    continue
                loz, npz, loy, npy = win
                fz = 0 if int(self._slab[bi][0][iz]) == 0 else 1
                fy = 0
                if self.sy > 1 and int(self._slab_y[bi][0][iy]) > 0:
                    fy = 1
                seg = u[s, lb.offset : lb.offset
                        + int(np.prod(lb.lattice_shape))].reshape(
                            lb.lattice_shape)
                dst = out[b.offset : b.offset + b.n_nodes].reshape(
                    b.lattice_shape)
                dst[loz + fz : loz + npz, loy + fy : loy + npy] = (
                    seg[fz:npz, fy:npy])
        return out

    # ---- collectives ---------------------------------------------------
    def _reconcile_axis(self, pr, y, ax: int):
        """Cross-shard compress of the axis-ax cut planes: exchange RAW
        per-box plane faces (two single-neighbor ppermutes), sum each
        physical node over its (box, shard-side) copies via one
        segment-sum on the precomputed gid groups, and SET every local
        copy to the total.  Both shards of a cut reconstruct identical
        totals from symmetric information, so one round-trip suffices —
        the compress(add) + update_ghost_values pair of SURVEY.md §3.6
        fused into a single exchange."""
        ns = self.sz if ax == 0 else self.sy
        aname = self.axis_name if ax == 0 else self.axis_name_y
        suff = "" if ax == 0 else "_y"
        nseg = self._nseg if ax == 0 else self._nseg_y
        tkey = "plane_top" if ax == 0 else "plane_top_y"
        tops, bots = [], []
        for bi, lb in enumerate(self.lboxes):
            n = int(np.prod(lb.lattice_shape))
            seg = jax.lax.dynamic_slice_in_dim(y, lb.offset, n).reshape(
                lb.lattice_shape)
            tops.append(jax.lax.dynamic_slice_in_dim(
                seg, pr[tkey][bi], 1, ax).reshape(-1))
            bots.append(jax.lax.slice_in_dim(seg, 0, 1, axis=ax
                                             ).reshape(-1))
        top = jnp.concatenate(tops)
        bot = jnp.concatenate(bots)
        mybuf = jnp.concatenate([top, bot])  # halves: [top | bottom]
        if ns > 1:
            # from row+1: their bottom faces (pair with my top cut)
            from_next = jax.lax.ppermute(
                bot, aname, [(k, k - 1) for k in range(1, ns)])
            # from row-1: their top faces (pair with my bottom cut)
            from_prev = jax.lax.ppermute(
                top, aname, [(k, k + 1) for k in range(ns - 1)])
            rcbuf = jnp.concatenate([from_next, from_prev])
        else:
            rcbuf = jnp.zeros_like(mybuf)
        seg2 = jnp.concatenate([pr["cut_seg" + suff]] * 2)
        vals = jnp.concatenate([mybuf * pr["cut_wm" + suff],
                                rcbuf * pr["cut_wr" + suff]])
        tot = jax.ops.segment_sum(vals, seg2, num_segments=nseg)
        slot = tot[pr["cut_seg" + suff]]
        return y.at[pr["cut_idx" + suff]].add(
            pr["cut_ws" + suff] * (slot - mybuf))

    def _local_vmult(self, pr, x):
        t = self.tmpl
        m = pr["interior_mask"]
        xh = t.distribute_p(pr, m * x)
        y = t._cells_p(pr, xh)
        if t._pair_meta:
            y = t._pair_delta_t_inline(pr, y)
            y = t.compress_p(pr, y)
        y = self._reconcile_axis(pr, y, 0)
        if self.sy > 1:
            # the y phase reads the z-reconciled values (corner lines
            # count once per side via the representative weights)
            y = self._reconcile_axis(pr, y, 1)
        return m * y + (1.0 - m) * x

    # ---- public sharded API --------------------------------------------
    def _build_vmult(self):
        spec = P((self.axis_name, self.axis_name_y))
        mesh = self.device_mesh()

        def body(x, pr):
            prl = jax.tree.map(lambda a: a[0], pr)
            return self._local_vmult(prl, x[0])[None]

        sm = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                           out_specs=spec)
        return jax.jit(sm)

    def vmult(self, x_local):
        """(n_shards, NL) stacked patch vector -> same layout."""
        if self._vmult_sm is None:
            self._vmult_sm = self._build_vmult()
        return self._vmult_sm(x_local, self.params)

    def put_vector(self, u_patch) -> jax.Array:
        mesh = self.device_mesh()
        return jax.device_put(self.to_local(u_patch), self.sharding(mesh))

    def diagonal_local(self) -> np.ndarray:
        """(n_shards, NL) slab diagonal (pads/dead get 1).  Both copies of
        a shared plane carry the value, so the Jacobi M_inv is consistent
        across shards."""
        dg = np.asarray(self.gop.diagonal(), np.float64)
        loc = self.to_local(dg)
        out = np.where(loc != 0.0, loc, 1.0)
        return out

    def cg_solve(self, b_local, diag_local, x0=None, rtol=1e-10,
                 maxiter=10000, precond: str = "jacobi",
                 cheb_degree: int = 4):
        """Distributed preconditioned CG on the stacked patch vector: ONE
        jitted shard_map program, psum dots with owner weights.  precond
        "chebyshev" smooths with degree-``cheb_degree`` Chebyshev
        (theta/delta estimated once on the global operator, replicated);
        its inner applies carry the plane exchanges but no dot products —
        fewer cross-shard psums per digit of convergence."""
        from tpufem.solvers.cg import CGResult, cg_solve as _cg
        from tpufem.solvers.chebyshev import (
            ChebyshevParams,
            chebyshev_smooth,
        )

        key = (float(rtol), int(maxiter), precond,
               cheb_degree if precond == "chebyshev" else 0)
        if key not in self._solvers:
            spec = P((self.axis_name, self.axis_name_y))
            mesh = self.device_mesh()
            ax = (self.axis_name, self.axis_name_y)

            def body(pr, diag, b, x0_, th, dl):
                prl = jax.tree.map(lambda a: a[0], pr)
                w = prl["w_owner"]

                def dot(u, v):
                    return jax.lax.psum(
                        jnp.dot(w * u, v,
                                precision=jax.lax.Precision.HIGHEST), ax)

                A = lambda v: self._local_vmult(prl, v)
                if precond == "chebyshev":
                    cp = ChebyshevParams(th, dl, cheb_degree)
                    M_inv = lambda r: chebyshev_smooth(
                        A, 1.0 / diag[0], cp, r)
                else:
                    M_inv = lambda r: r / diag[0]
                res = _cg(A, b[0], M_inv=M_inv, x0=x0_[0],
                          rtol=key[0], maxiter=key[1], dot=dot)
                return CGResult(res.x[None], res.iterations,
                                res.residual, res.converged)

            self._solvers[key] = jax.jit(jax.shard_map(
                body, mesh=mesh, in_specs=(spec,) * 4 + (P(), P()),
                out_specs=CGResult(spec, P(), P(), P())))
        if x0 is None:
            x0 = jnp.zeros_like(b_local)
        th = dl = jnp.zeros((), self.dt)
        if precond == "chebyshev":
            # same estimate as the single-device path: identical
            # theta/delta give identical iteration counts
            if not hasattr(self.gop, "_cheb_cache"):
                self.gop._cheb_cache = {}
            if cheb_degree not in self.gop._cheb_cache:
                cp = self.gop.cheb_params(self.gop.diagonal(),
                                          degree=cheb_degree)
                self.gop._cheb_cache[cheb_degree] = (cp.theta, cp.delta)
            th, dl = self.gop._cheb_cache[cheb_degree]
        return self._solvers[key](self.params, diag_local, b_local, x0,
                                  th, dl)
