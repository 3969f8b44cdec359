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
Slab decomposition along the leading lattice axis ("z"), with cut planes
aligned to the COARSEST cell size present:

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
    """Shard a :class:`BoxLaplaceOperator` over a 1-axis device mesh.

    Parameters: the (host-built) global operator, the shard count and an
    optional explicit device list.  ``vmult`` / ``cg_solve`` act on the
    stacked local patch vector of shape ``(n_shards, NL)`` sharded on
    axis 0; ``to_local`` / ``from_local`` convert at IO boundaries.
    """

    def __init__(self, gop: BoxLaplaceOperator, n_shards: int,
                 axis_name: str = "shard", devices=None):
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
        self.gop = gop
        self.n_shards = n_shards
        self.axis_name = axis_name
        self._devices = devices
        d, p = gop.dim, gop.p
        self.dim, self.p, self.dt = d, p, gop.dt
        boxes = gop.boxes
        mesh = gop.mesh

        # ---- z cuts: coarsest-size-aligned, balanced by active cells ---
        s_max = max(b.size for b in boxes)
        ncand = mesh.U // s_max
        zslot = mesh.origins[:, d - 1] // s_max
        wt = np.bincount(zslot, minlength=ncand).astype(np.float64)
        cum = np.cumsum(wt)
        cuts = [0]
        for s in range(1, n_shards):
            k = int(np.searchsorted(cum, cum[-1] * s / n_shards,
                                    side="left")) + 1
            # strictly increasing while slots remain: an EMPTY shard
            # between non-empty ones would break the single-neighbor
            # plane adjacency (its neighbors share a plane but are two
            # ppermute hops apart).  Unavoidable empties (n_shards >
            # slots) land at the END, where their planes are dead.
            cuts.append(min(max(k, cuts[-1] + 1), ncand))
        cuts.append(ncand)
        self.cuts_units = np.asarray(cuts) * s_max  # (n_shards+1,) mesh u.

        # ---- per-box slab geometry -------------------------------------
        # lattice axis 0 = xyz axis d-1; box cell j origin = (lo_z + j)*s
        self._slab = []  # per box: (a (S,), r (S,), NCZ)
        for b in boxes:
            z0 = int(b.lo[d - 1])
            a = np.clip(self.cuts_units[:-1] // b.size - z0, 0, b.nb[0])
            e = np.clip(self.cuts_units[1:] // b.size - z0, 0, b.nb[0])
            r = np.maximum(e - a, 0)
            self._slab.append((a.astype(int), r.astype(int),
                               max(int(r.max()), 1)))

        # on-cut flags: does box bi's shard-s slab start/end ON the cut
        # plane (vs. at a box end strictly inside the shard)?  Only
        # on-cut planes take part in the cross-shard reconciliation.
        nbox = len(boxes)
        self._bot_cut = np.zeros((n_shards, nbox), bool)
        self._top_cut = np.zeros((n_shards, nbox), bool)
        for bi, b in enumerate(boxes):
            z0u = int(b.lo[d - 1]) * b.size
            a, r, _ = self._slab[bi]
            for s in range(n_shards):
                if int(r[s]) <= 0:
                    continue
                lo_u = z0u + int(a[s]) * b.size
                hi_u = z0u + int(a[s] + r[s]) * b.size
                self._bot_cut[s, bi] = lo_u == self.cuts_units[s]
                self._top_cut[s, bi] = hi_u == self.cuts_units[s + 1]

        # local template boxes (shard-uniform shapes)
        lboxes, lnb = [], []
        off = 0
        for b, (a, r, NCZ) in zip(boxes, self._slab):
            lat = (NCZ * p + 1,) + b.lattice_shape[1:]
            nb = (NCZ,) + b.nb[1:]
            lboxes.append(Box(
                size=b.size, lo=b.lo, nb=nb, cells=b.cells[:0],
                lattice_shape=lat, gid=np.zeros(0), active=np.zeros(0),
                offset=off))
            lnb.append(nb)
            off += int(np.prod(lat))
        self.NL = off
        self.lboxes = lboxes

        # full-z pair metadata (tangential slices stay global-static)
        lmeta = []
        for meta in gop._pair_meta:
            LZc = lboxes[meta["bc"]].lattice_shape[0]
            LZf = lboxes[meta["bf"]].lattice_shape[0]
            lmeta.append(dict(
                bc=meta["bc"], bf=meta["bf"],
                src_sl=(slice(0, LZc),) + tuple(meta["src_sl"][1:]),
                dst_sl=(slice(0, LZf),) + tuple(meta["dst_sl"][1:]),
                sub_c=(slice(0, LZc),) + tuple(meta["sub_c"][1:]),
                sub_f=meta["sub_f"],
            ))
        self.tmpl = _LocalBoxApply(
            lboxes, tuple(lnb), lmeta, gop._cell_scheme,
            gop._single_compress, d, p, gop.dt)

        # ---- stacked per-shard parameter pytree ------------------------
        prs = [self._shard_params(s) for s in range(n_shards)]
        self.params = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *prs)
        # per-shard top-plane z index per box (r*p; 0 on empty slabs)
        tops = np.stack([
            np.array([int(r[s]) * p for (_, r, _) in self._slab])
            for s in range(n_shards)]).astype(np.int32)
        self.params["plane_top"] = jnp.asarray(tops)

        # ---- cut-plane reconciliation groups ---------------------------
        # Raw plane partials are exchanged per box; each physical node on
        # a cut plane then gets the SUM over ALL its (box, shard-side)
        # copies — grouped by global DoF id (the same id is computed on
        # both sides from the global box lattice, so no second exchange
        # is needed: both shards reconstruct identical totals).
        tanL = [int(np.prod(lb.lattice_shape[1:])) for lb in lboxes]
        T = sum(tanL)
        dtc = np.dtype(str(np.dtype(self.dt)))

        def plane_gids(bi: int, c_units: int):
            b = boxes[bi]
            z0u = int(b.lo[d - 1]) * b.size
            j, rem = divmod(c_units - z0u, b.size)
            if rem or j < 0 or j > b.nb[0]:
                return None
            return b.gid.reshape(b.lattice_shape[0], -1)[j * p]

        segs = np.zeros((n_shards, 2 * T), np.int32)
        wm = np.zeros((n_shards, 2 * T))
        wr = np.zeros((n_shards, 2 * T))
        idxs = np.zeros((n_shards, 2 * T), np.int64)
        nseg = 1
        for s in range(n_shards):
            half_off = 0  # disjoint id blocks for the two cuts
            for half, c in ((0, int(self.cuts_units[s + 1])),
                            (1, int(self.cuts_units[s]))):
                base = half * T
                gvec = np.full(T, -1, np.int64)
                off = 0
                for bi, b in enumerate(boxes):
                    g = plane_gids(bi, c)
                    if g is not None:
                        gvec[off:off + tanL[bi]] = g
                    off += tanL[bi]
                ok = gvec >= 0
                if ok.any():
                    uniq, inv = np.unique(gvec[ok], return_inverse=True)
                    segs[s, base:base + T][ok] = inv + half_off
                    half_off += len(uniq)
                    nseg = max(nseg, half_off)
                off = 0
                for bi, lb in enumerate(lboxes):
                    _, r, _ = self._slab[bi]
                    sl = slice(base + off, base + off + tanL[bi])
                    okb = ok[off:off + tanL[bi]]
                    mine = (self._top_cut if half == 0
                            else self._bot_cut)[s, bi]
                    if half == 0:
                        recv = (s + 1 < n_shards
                                and self._bot_cut[s + 1, bi])
                        row = int(r[s]) * p
                    else:
                        recv = s > 0 and self._top_cut[s - 1, bi]
                        row = 0
                    wm[s, sl] = okb * float(mine)
                    wr[s, sl] = okb * float(recv)
                    if mine:
                        idxs[s, sl] = (lb.offset + row * tanL[bi]
                                       + np.arange(tanL[bi]))
                    off += tanL[bi]
        self._nseg = nseg
        self.params["cut_seg"] = jnp.asarray(segs)
        self.params["cut_wm"] = jnp.asarray(wm.astype(dtc))
        self.params["cut_wr"] = jnp.asarray(wr.astype(dtc))
        self.params["cut_idx"] = jnp.asarray(idxs.astype(np.int32))
        self._vmult_sm = None
        self._solvers: dict = {}

    # ------------------------------------------------------------------
    def _slice_z(self, arr, bi: int, s: int, per: int, pad_to: int,
                 fill=0.0):
        """Slice box bi's shard-s slab from a global per-box array whose
        leading dim runs ``per`` entries per z cell (+1 node row when
        per == p-ish handled by caller via pad_to)."""
        a, r, _ = self._slab[bi]
        lo, n = int(a[s]) * per, int(r[s]) * per
        out_shape = (pad_to,) + arr.shape[1:]
        out = np.full(out_shape, fill, dtype=arr.dtype)
        if n > 0:
            out[:n] = arr[lo : lo + n]
        return out

    def _shard_params(self, s: int):
        gop, d, p = self.gop, self.dim, self.p
        q1 = p + 1
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
            a, r, NCZ = self._slab[bi]
            a_s, r_s = int(a[s]), int(r[s])
            LZ = lb.lattice_shape[0]
            tan = int(np.prod(b.lattice_shape[1:]))
            # interior mask + owner weights: slab node planes
            seg_im = im_g[b.offset : b.offset + b.n_nodes].reshape(
                b.lattice_shape)
            seg_w = w_g[b.offset : b.offset + b.n_nodes].reshape(
                b.lattice_shape)
            ok, gz = _slab_rows(a_s, r_s, p, LZ, 0, b.lattice_shape[0])
            im_l = np.where(ok[:, None], seg_im.reshape(
                b.lattice_shape[0], tan)[gz], 0.0)
            w_l = np.where(ok[:, None], seg_w.reshape(
                b.lattice_shape[0], tan)[gz], 0.0)
            if a_s > 0:  # shared bottom plane owned by the lower shard
                w_l[0] = 0.0
            im_parts.append(im_l.reshape(-1))
            w_parts.append(w_l.reshape(-1))
            # cell-loop operands
            arg1, arg2 = gop.params["box_args"][bi]
            if gop._cell_scheme == "global-general":
                g = np.asarray(arg1)  # (nqz, ..., ncomp)
                box_args.append((self._slice_z(g, bi, s, q1, NCZ * q1),
                                 np.zeros(1, dtc)))
            else:
                wb = np.asarray(arg2)  # (nz, q1, ny, q1[, nx, q1]) bcast
                box_args.append((np.asarray(arg1),
                                 self._slice_z(wb, bi, s, 1, NCZ)))
            E_t, G_t = gop._box_EG[bi]
            Ez, Gz = global_interp_matrices(p, NCZ, si.S, si.D_col)
            box_EG.append(
                ((np.asarray(Ez, dtc),)
                 + tuple(np.asarray(E, dtc) for E in E_t[1:]),
                 (np.asarray(Gz, dtc),)
                 + tuple(np.asarray(G, dtc) for G in G_t[1:])))
        pr["box_args"] = tuple(box_args)
        pr["box_EG"] = tuple(box_EG)
        pr["interior_mask"] = np.concatenate(im_parts).astype(dtc)
        pr["w_owner"] = np.concatenate(w_parts).astype(dtc)
        pr["S"] = np.asarray(gop.params["S"])
        pr["D_col"] = np.asarray(gop.params["D_col"])
        pr["multi_idx"] = np.zeros((0, 1), np.int32)
        pr["multi_w"] = np.zeros((0, 1), dtc)

        # pair transfers: z factors/masks localized per shard
        if gop._pair_meta:
            pair_P, pair_h, pair_alive = [], [], []
            pair_msh, pair_E, pair_S = [], [], []
            for i, meta in enumerate(gop._pair_meta):
                bc, bf = meta["bc"], meta["bf"]
                ac, rc, _ = self._slab[bc]
                af, rf, _ = self._slab[bf]
                LZc = self.lboxes[bc].lattice_shape[0]
                LZf = self.lboxes[bf].lattice_shape[0]
                d0 = meta["dst_sl"][0].start
                nf = meta["dst_sl"][0].stop - d0
                s0 = meta["src_sl"][0].start
                nc = meta["src_sl"][0].stop - s0
                j0 = meta["sub_c"][0].start
                nsub = meta["sub_c"][0].stop - j0
                okf, gf = _slab_rows(int(af[s]), int(rf[s]), p, LZf, d0, nf)
                okc, gc = _slab_rows(int(ac[s]), int(rc[s]), p, LZc, s0, nc)
                oks, gsub = _slab_rows(int(ac[s]), int(rc[s]), p, LZc,
                                       j0, nsub)
                Pg = np.asarray(gop.params["pair_P"][i][0], np.float64)
                Sg = np.asarray(gop.params["pair_S"][i][0], np.float64)
                hg = np.asarray(gop.params["pair_h"][i], np.float64)
                Eg = np.asarray(gop.params["pair_E"][i], np.float64)
                ag = np.asarray(gop.params["pair_alive"][i], np.float64)
                mg = np.asarray(gop.params["pair_msh"][i], np.float64)
                mk = (okf[:, None] & okc[None, :]).astype(np.float64)
                P_z = Pg[np.ix_(gf, gc)] * mk
                # S rows live on the coarse sub grid, cols on the fine dst
                mk = (oks[:, None] & okf[None, :]).astype(np.float64)
                S_z = Sg[np.ix_(gsub, gf)] * mk
                h_l = np.where(okf.reshape((-1,) + (1,) * (d - 1)),
                               hg[gf], 0.0)
                E_l = np.where(okf.reshape((-1,) + (1,) * (d - 1)),
                               Eg[gf], 0.0)
                a_l = np.where(okc.reshape((-1,) + (1,) * (d - 1)),
                               ag[gc], 0.0)
                m_l = np.where(oks.reshape((-1,) + (1,) * (d - 1)),
                               mg[gsub], 0.0)
                # cut-plane rows are excluded from the local sweeps: they
                # are reconciled exactly by the cross-shard plane groups
                # (raw-partial sums over every box/shard copy)
                if self._bot_cut[s, bf]:
                    E_l[0] = 0.0
                if self._top_cut[s, bf]:
                    E_l[int(rf[s]) * p] = 0.0
                if self._bot_cut[s, bc]:
                    m_l[0] = 0.0
                if self._top_cut[s, bc]:
                    m_l[int(rc[s]) * p] = 0.0
                Pt = gop.params["pair_P"][i]
                St = gop.params["pair_S"][i]
                pair_P.append((P_z.astype(dtc),)
                              + tuple(np.asarray(M) for M in Pt[1:]))
                pair_S.append((S_z.astype(dtc),)
                              + tuple(np.asarray(M) for M in St[1:]))
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
        return DeviceMesh(np.array(devices), (self.axis_name,))

    def sharding(self, mesh: DeviceMesh) -> NamedSharding:
        return NamedSharding(mesh, P(self.axis_name))

    # ---- IO boundaries (host) ----------------------------------------
    def to_local(self, u_patch) -> np.ndarray:
        """Global patch vector -> (n_shards, NL) stacked local slabs."""
        u = np.asarray(u_patch)
        out = np.zeros((self.n_shards, self.NL), dtype=u.dtype)
        for s in range(self.n_shards):
            for bi, (b, lb) in enumerate(zip(self.gop.boxes, self.lboxes)):
                a, r, _ = self._slab[bi]
                if int(r[s]) == 0:
                    continue
                n_pl = int(r[s]) * self.p + 1
                tan = int(np.prod(b.lattice_shape[1:]))
                seg = u[b.offset : b.offset + b.n_nodes].reshape(
                    b.lattice_shape[0], tan)
                lo = int(a[s]) * self.p
                out[s, lb.offset : lb.offset + n_pl * tan] = (
                    seg[lo : lo + n_pl].reshape(-1))
        return out

    def from_local(self, u_local) -> np.ndarray:
        """Owned planes of the stacked local vector -> global patch."""
        u = np.asarray(u_local)
        out = np.zeros(self.gop.n_patch, dtype=u.dtype)
        for s in range(self.n_shards):
            for bi, (b, lb) in enumerate(zip(self.gop.boxes, self.lboxes)):
                a, r, _ = self._slab[bi]
                if int(r[s]) == 0:
                    continue
                tan = int(np.prod(b.lattice_shape[1:]))
                first = 0 if int(a[s]) == 0 else 1  # shared plane: lower
                n_pl = int(r[s]) * self.p + 1
                seg = u[s, lb.offset : lb.offset
                        + int(np.prod(lb.lattice_shape))].reshape(
                            lb.lattice_shape[0], tan)
                lo = (int(a[s]) + 0) * self.p
                out[b.offset + (lo + first) * tan :
                    b.offset + (lo + n_pl) * tan] = (
                        seg[first:n_pl].reshape(-1))
        return out

    # ---- collectives ---------------------------------------------------
    def _plane_reconcile(self, pr, y):
        """Cross-shard compress of the cut planes: exchange RAW per-box
        plane partials (two single-neighbor ppermutes), sum each physical
        node's partials over ALL its (box, shard-side) copies via one
        segment-sum on the precomputed gid groups, and SET every local
        copy to the total.  Both shards of a cut reconstruct identical
        totals from symmetric information, so one round-trip suffices —
        the compress(add) + update_ghost_values pair of SURVEY.md §3.6
        fused into a single exchange."""
        ax, ns = self.axis_name, self.n_shards
        tops, bots = [], []
        for bi, lb in enumerate(self.lboxes):
            n = int(np.prod(lb.lattice_shape))
            tan = int(np.prod(lb.lattice_shape[1:]))
            seg = jax.lax.dynamic_slice_in_dim(y, lb.offset, n).reshape(
                lb.lattice_shape[0], tan)
            tops.append(jax.lax.dynamic_slice_in_dim(
                seg, pr["plane_top"][bi], 1, 0).reshape(-1))
            bots.append(seg[0])
        top = jnp.concatenate(tops)
        bot = jnp.concatenate(bots)
        mybuf = jnp.concatenate([top, bot])  # halves: [top | bottom]
        if ns > 1:
            # from shard s+1: their bottom partials (pair with my top cut)
            from_next = jax.lax.ppermute(
                bot, ax, [(k, k - 1) for k in range(1, ns)])
            # from shard s-1: their top partials (pair with my bottom cut)
            from_prev = jax.lax.ppermute(
                top, ax, [(k, k + 1) for k in range(ns - 1)])
            rcbuf = jnp.concatenate([from_next, from_prev])
        else:
            rcbuf = jnp.zeros_like(mybuf)
        seg2 = jnp.concatenate([pr["cut_seg"], pr["cut_seg"]])
        vals = jnp.concatenate(
            [mybuf * pr["cut_wm"], rcbuf * pr["cut_wr"]])
        tot = jax.ops.segment_sum(vals, seg2, num_segments=self._nseg)
        slot = tot[pr["cut_seg"]]
        return y.at[pr["cut_idx"]].add(pr["cut_wm"] * (slot - mybuf))

    def _local_vmult(self, pr, x):
        t = self.tmpl
        m = pr["interior_mask"]
        xh = t.distribute_p(pr, m * x)
        y = t._cells_p(pr, xh)
        if t._pair_meta:
            y = t._pair_delta_t_inline(pr, y)
            y = t.compress_p(pr, y)
        y = self._plane_reconcile(pr, y)
        return m * y + (1.0 - m) * x

    # ---- public sharded API --------------------------------------------
    def _build_vmult(self):
        spec = P(self.axis_name)
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
                 maxiter=10000):
        """Distributed Jacobi-CG on the stacked patch vector: ONE jitted
        shard_map program, psum dots with owner weights."""
        from tpufem.solvers.cg import CGResult, cg_solve as _cg

        key = (float(rtol), int(maxiter))
        if key not in self._solvers:
            spec = P(self.axis_name)
            mesh = self.device_mesh()
            ax = self.axis_name

            def body(pr, diag, b, x0_):
                prl = jax.tree.map(lambda a: a[0], pr)
                w = prl["w_owner"]

                def dot(u, v):
                    return jax.lax.psum(
                        jnp.dot(w * u, v,
                                precision=jax.lax.Precision.HIGHEST), ax)

                res = _cg(lambda v: self._local_vmult(prl, v), b[0],
                          M_inv=lambda r: r / diag[0], x0=x0_[0],
                          rtol=key[0], maxiter=key[1], dot=dot)
                return CGResult(res.x[None], res.iterations,
                                res.residual, res.converged)

            self._solvers[key] = jax.jit(jax.shard_map(
                body, mesh=mesh, in_specs=(spec,) * 4,
                out_specs=CGResult(spec, P(), P(), P())))
        if x0 is None:
            x0 = jnp.zeros_like(b_local)
        return self._solvers[key](self.params, diag_local, b_local, x0)
