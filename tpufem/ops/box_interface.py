"""Structured hanging-node resolution for the box tier.

The gather-based C/Cᵀ application costs ~10 random memory accesses per
constraint nonzero (~70 ms at 142k hanging rows / 2.3M nonzeros on the
flagship adaptive mesh — 10x the cell loop itself).  This module removes
the random access for the regular bulk of the interface:

In a 2:1 forest, level interfaces are unions of axis-aligned COARSE FACES,
and the constraint rows of the fine nodes on a coarse face are exactly the
tensor-product subface interpolation — the same 1D embedding the reference
applies in-kernel (``hanging_nodes.cuh``'s resolve_hanging_nodes,
SURVEY.md §2/§3.4).  Grouping interface faces into maximal rectangles, the
whole C application per rectangle becomes

    V_fine = F₁ · U_coarse · F₂ᵀ        (dense MXU matmuls)

on STATIC lattice slices of the coarse/fine box segments — no gather, no
scatter — with a precomputed 0/1 mask selecting the rows this rectangle
owns.  Cᵀ is the transpose chain accumulated the same way.  Rows whose
constraints deviate from the tensor prediction (true 3D edge constraints
at region borders, chain-closure rows) are VERIFIED out at setup and stay
on the gather fallback; the split is exact by construction because every
rectangle row is checked against its ``AffineConstraints`` entry before it
is assigned.

Measured coverage on the flagship adaptive benchmark (3D Q4, ball
refinement, 142k hanging rows): ~95% of rows / ~98% of nonzeros move to
the structured path.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from tpufem.solvers.multigrid import prolongation_1d


@dataclasses.dataclass
class InterfaceRect:
    """One maximal rectangle of interface coarse faces (static data)."""

    bf: int  # fine box index
    bc: int  # coarse box index
    fslice: tuple  # static basic-index tuple into the fine box lattice
    cslice: tuple  # static basic-index tuple into the coarse box lattice
    F: list  # per tangential axis: (n_fine, n_coarse) embedding (np)
    mask: np.ndarray  # fine region shape; 1 = row owned by this rectangle
    rows: np.ndarray  # constraint-row indices owned (diagnostics)


def _box_of_gid(boxes):
    """First (owner) copy of each gid: (box index, lattice coords)."""
    n = max(int(b.gid.max()) for b in boxes) + 1
    box_id = np.full(n, -1, dtype=np.int32)
    flat_pos = np.full(n, -1, dtype=np.int64)
    for i in reversed(range(len(boxes))):
        g = boxes[i].gid.reshape(-1)
        ok = g >= 0
        box_id[g[ok]] = i
        flat_pos[g[ok]] = np.nonzero(ok)[0]
    return box_id, flat_pos


def _coords(flat, shape):
    return np.stack(np.unravel_index(flat, shape), axis=-1)  # (..., d)


def build_interface_rects(boxes, constraints, p: int, d: int,
                          merge: str = "maximal"):
    """Decompose the hanging-node constraints into interface rectangles.

    Returns (rects, leftover_rows): leftover_rows indexes into the sorted
    constrained-dof list (``AffineConstraints.padded_arrays`` order) and
    keeps the gather fallback for everything not proven structured.
    """
    cdofs, masters, weights, inhom = constraints.padded_arrays()
    ncon = len(cdofs)
    box_id, flat_pos = _box_of_gid(boxes)

    # row -> fine box + lattice coords (owner copy)
    rb = box_id[cdofs]
    rpos = np.zeros((ncon, d), dtype=np.int64)
    for i, b in enumerate(boxes):
        sel = rb == i
        if sel.any():
            rpos[sel] = _coords(flat_pos[cdofs[sel]], b.lattice_shape)

    # quick per-row map for verification
    row_of_dof = {int(g): i for i, g in enumerate(cdofs)}
    rows_live = [
        {int(m): float(w) for m, w in zip(masters[i], weights[i])
         if w != 0.0}
        for i in range(ncon)
    ]

    # rows with an inhomogeneity must keep the gather path (the rect
    # apply is purely linear)
    assigned = np.zeros(ncon, dtype=bool)
    inhomogeneous = inhom != 0.0
    rects: list[InterfaceRect] = []

    # candidate planes from seed rows (full face interpolation: masters
    # span a (p+1)^(d-1) grid with one shared coarse-plane coordinate)
    nnz = (weights != 0.0).sum(axis=1)
    seeds = np.nonzero(nnz == (p + 1) ** (d - 1))[0]
    planes: dict[tuple, list[int]] = {}
    for r in seeds:
        ms = np.fromiter(rows_live[r].keys(), dtype=np.int64)
        mb = box_id[ms]
        if (mb != mb[0]).any():
            continue
        bc = int(mb[0])
        mpos = _coords(flat_pos[ms], boxes[bc].lattice_shape)
        fixed = [a for a in range(d) if (mpos[:, a] == mpos[0, a]).all()]
        if len(fixed) != 1:
            continue
        ax = fixed[0]  # lattice axis (z..x order) normal to the face
        key = (int(rb[r]), bc, ax, int(mpos[0, ax]), int(rpos[r, ax]))
        planes.setdefault(key, []).append(int(r))

    for (bf, bc, ax, zc, zf), plane_rows in planes.items():
        fine, coarse = boxes[bf], boxes[bc]
        if 2 * fine.size != coarse.size:
            continue  # only 2:1 interfaces are tensor-predictable
        tan = [a for a in range(d) if a != ax]
        # geometric offset fine->coarse along each tangential lattice
        # axis, in FINE node units: lattice axis a corresponds to xyz
        # axis d-1-a; box lo is in cell-size units, node spacing s/p
        off = []
        for a in tan:
            xyz = d - 1 - a
            # global position (units s_f/p) of node index i in each box:
            #   fine:   2*p*lo_f[xyz]/ (s_f cells) ... lo is in units of
            #           own size: global = lo * p (own-size cells * p)
            # fine global = (lo_f[xyz] * p + i_f), coarse global =
            #   (lo_c[xyz] * 2p + 2 i_c)  [coarse spacing = 2 fine units]
            off.append((int(fine.lo[xyz]) * p, int(coarse.lo[xyz]) * 2 * p))
        # coarse-face grid covered by seed rows: face cell coords along
        # tangential axes of the COARSE lattice
        pr = np.asarray(plane_rows)
        fpos = rpos[pr][:, tan]  # fine node coords in fine lattice
        # fine node -> coarse face cell: global = lo_f*p + i_f;
        # face cell u satisfies global in [lo_c*2p + 2p*u, +2p]
        glob = fpos + np.array([o[0] for o in off])[None, :]
        rel = glob - np.array([o[1] for o in off])[None, :]
        ucell = rel // (2 * p)
        if (ucell < 0).any():
            continue
        grid_shape = tuple(int(ucell[:, k].max()) + 1 for k in range(d - 1))
        covered = np.zeros(grid_shape, dtype=bool)
        covered[tuple(ucell[:, k] for k in range(d - 1))] = True

        if merge == "bounding":
            # ONE rectangle per interface plane.  Over-coverage is exact
            # (unverified/absent rows stay mask=0; dead coarse nodes
            # provably receive zero in Cᵀ) but measured SLOWER on the
            # flagship (840 -> 78 rects, 16.7 -> 19.3 ms): the per-rect
            # einsum cost scales with region area, not op count.  Kept
            # for meshes whose interfaces fragment pathologically.
            rect_list = [[
                (int(ucell[:, k].min()), int(ucell[:, k].max()) + 1)
                for k in range(d - 1)
            ]]
        else:
            rect_list = _max_rectangles(covered)

        for rect in rect_list:
            u0 = [r0 for (r0, _) in rect]
            m = [r1 - r0 for (r0, r1) in rect]
            # coarse node region: [u0*p, (u0+m)*p] per tangential axis
            ci0 = [u0[k] * p for k in range(d - 1)]
            cn = [m[k] * p + 1 for k in range(d - 1)]
            # fine node region: global = lo_f*p + i_f
            fi0 = [2 * p * u0[k] + off[k][1] - off[k][0]
                   for k in range(d - 1)]
            fn = [2 * m[k] * p + 1 for k in range(d - 1)]
            if any(fi0[k] < 0 for k in range(d - 1)):
                continue
            ok_extent = True
            for k in range(d - 1):
                if (ci0[k] + cn[k] > coarse.lattice_shape[tan[k]]
                        or fi0[k] + fn[k] > fine.lattice_shape[tan[k]]):
                    ok_extent = False
            if not ok_extent:
                continue
            F = [prolongation_1d(p, m[k]) for k in range(d - 1)]
            # verify every fine node in the region against its
            # constraint row; build the ownership mask
            mask = np.zeros(tuple(fn), dtype=np.float64)
            rows_here = []
            cg = coarse.gid
            fgid = fine.gid
            csl = [None] * d
            csl[ax] = zc
            fsl = [None] * d
            fsl[ax] = zf
            for k in range(d - 1):
                csl[tan[k]] = slice(ci0[k], ci0[k] + cn[k])
                fsl[tan[k]] = slice(fi0[k], fi0[k] + fn[k])
            cregion = cg[tuple(csl)]  # coarse gids (cn...)
            fregion = fgid[tuple(fsl)]  # fine gids (fn...)
            # dead coarse nodes (gid -1) are safe: any row predicted to
            # reference them fails verification (mask 0), so they receive
            # exactly zero in Cᵀ and their garbage is masked out in C
            it = np.ndindex(*fn)
            for idx in it:
                g = int(fregion[idx])
                if g < 0:
                    continue
                r = row_of_dof.get(g)
                if r is None or assigned[r] or inhomogeneous[r]:
                    continue
                pred = {}
                wrow = np.ones(1)
                # tensor weight = prod_k F[k][idx[k], :]
                Wk = [F[k][idx[k]] for k in range(d - 1)]
                if d - 1 == 1:
                    nzj = np.nonzero(np.abs(Wk[0]) > 1e-13)[0]
                    for j in nzj:
                        pred[int(cregion[j])] = float(Wk[0][j])
                else:
                    nz1 = np.nonzero(np.abs(Wk[0]) > 1e-13)[0]
                    nz2 = np.nonzero(np.abs(Wk[1]) > 1e-13)[0]
                    for j1 in nz1:
                        for j2 in nz2:
                            pred[int(cregion[j1, j2])] = float(
                                Wk[0][j1] * Wk[1][j2])
                actual = rows_live[r]
                if set(pred) != set(actual):
                    continue
                if any(abs(pred[g2] - actual[g2]) > 1e-10 for g2 in pred):
                    continue
                mask[idx] = 1.0
                rows_here.append(r)
            if not rows_here:
                continue
            assigned[np.asarray(rows_here)] = True
            rects.append(InterfaceRect(
                bf=bf, bc=bc, fslice=tuple(fsl), cslice=tuple(csl),
                F=F, mask=mask, rows=np.asarray(rows_here),
            ))

    leftover = np.nonzero(~assigned)[0]
    return rects, leftover


def _max_rectangles(covered: np.ndarray):
    """Greedy maximal-rectangle cover of a boolean grid.

    Returns a list of per-axis (start, end) tuples; rectangles are
    disjoint and cover every True cell.  1D grids give maximal runs.
    """
    cov = covered.copy()
    out = []
    if cov.ndim == 1:
        i = 0
        n = len(cov)
        while i < n:
            if not cov[i]:
                i += 1
                continue
            j = i
            while j < n and cov[j]:
                j += 1
            out.append([(i, j)])
            i = j
        return out
    # 2D greedy: for each top-left uncovered True cell, grow the widest
    # run, then extend downward while full rows match
    n1, n2 = cov.shape
    for i in range(n1):
        j = 0
        while j < n2:
            if not cov[i, j]:
                j += 1
                continue
            j2 = j
            while j2 < n2 and cov[i, j2]:
                j2 += 1
            i2 = i + 1
            while i2 < n1 and cov[i2, j:j2].all():
                i2 += 1
            out.append([(i, i2), (j, j2)])
            cov[i:i2, j:j2] = False
            j = j2
    return out
