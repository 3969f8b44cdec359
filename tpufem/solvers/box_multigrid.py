"""Geometric multigrid on adaptive (2:1 forest) meshes — the box tier.

Reference analogue: the GMG stack of ``poisson_mg.cu`` (deal.II
``Multigrid`` + ``MGTransferMatrixFreeGpu``, SURVEY.md §2/§3.5) extended
to adaptively refined meshes the way deal.II's global-coarsening
transfer does: every level is a COMPLETE 2:1 forest obtained by clamping
cell sizes to a floor, so each level solves the same boundary-value
problem on a coarser adaptive mesh and adjacent levels always differ by
exactly one 2:1 refinement sweep.

TPU-native design:
- Level vectors are the box-tier patchwork vectors (tpufem.ops.boxes):
  per-level ``BoxLaplaceOperator`` provides the constrained vmult,
  diagonal, C/Cᵀ and copy reconciliation — the V-cycle composes existing
  machinery and adds only the inter-level transfer.
- The transfer is index-free and separable, like everything else in the
  box tier.  Between adjacent levels each fine box matches exactly one
  rule: ``same`` (identical box at an unchanged size group → verbatim
  segment copy), ``slice`` (same-spacing subregion of the coarse floor
  group → contiguous lattice slice), or ``embed`` (the new fine floor
  group → per-axis 1D subface-embedding matmuls of the parent region,
  the MXU form of the reference's sum-factorized child-gather kernels).
  Restriction is the exact transpose with owner weights, followed by the
  coarse level's compress (copies) and Cᵀ (hanging nodes).
- Above the forest's largest size the hierarchy continues with uniform
  2:1 coarsenings (same ``embed`` rule, one box per level) down to a
  coarsest grid solved with a precomputed dense inverse — deterministic,
  one small matmul on device.
- Platform rule (docs/ROOFLINE.md round 3): every device array the
  traced V-cycle touches travels through the ``device_args`` pytree as a
  jit ARGUMENT; static rule metadata (box offsets, slices) stays host
  side.  The small 1D embedding matrices ride ``device_args`` alongside
  the pair-transfer matrices they generalize.

Correctness contract: prolongation reproduces continuous coarse fields
exactly on live fine nodes (nested FE spaces), restriction is its
owner-weighted adjoint, and the V-cycle preserves the constrained-space
convention (hanging rows and Dirichlet rows of every level vector are
zero).  Tested against the f64 assembled oracle in
tests/test_box_multigrid.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.fem.shapes import subface_interpolation_1d
from tpufem.ops.boxes import BoxLaplaceOperator
from tpufem.solvers.chebyshev import (
    ChebyshevParams,
    chebyshev_smooth,
    make_chebyshev_params,
)


def coarsen_floor(mesh: Mesh, floor: int) -> Mesh:
    """The mesh with every cell smaller than ``floor`` replaced by its
    size-``floor`` ancestor (deduplicated).  2:1 balance is preserved:
    clamping levels at a ceiling cannot increase any neighbor level gap.
    """
    o = mesh.origins.copy()
    s = mesh.sizes.copy()
    small = s < floor
    o[small] = (o[small] // floor) * floor
    s[small] = floor
    rows = np.concatenate([o, s[:, None]], axis=1)
    rows = np.unique(rows, axis=0)
    m2 = Mesh(mesh.dim, mesh.nbase, mesh.max_level, rows[:, :-1],
              rows[:, -1], mesh.lower, mesh.upper,
              transform=mesh.transform)
    m2.transform_jac = mesh.transform_jac
    m2.separable_metric = mesh.separable_metric
    return m2


def embed_1d(p: int, lo_f: int, n_f: int, c0: int, n_c: int) -> np.ndarray:
    """1D node-grid 2:1 embedding for an OFFSET region: fine cells at
    global (fine-unit) indices ``lo_f .. lo_f+n_f-1`` interpolated from
    coarse cells ``c0 .. c0+n_c-1``.  Generalizes
    ``solvers.multigrid.prolongation_1d`` (= the ``lo_f=0, c0=0`` case);
    overlapping rows (shared fine nodes) receive identical values."""
    P = np.zeros((n_f * p + 1, n_c * p + 1))
    C = [subface_interpolation_1d(p, 0), subface_interpolation_1d(p, 1)]
    for j in range(n_f):
        g = lo_f + j
        k = g // 2 - c0
        P[j * p : (j + 1) * p + 1, k * p : (k + 1) * p + 1] = C[g % 2]
    return P


@dataclasses.dataclass
class BoxMGLevel:
    mesh: Mesh
    dofs: DoFHandler
    op: BoxLaplaceOperator
    inv_diag: jnp.ndarray  # patch space
    cheb: ChebyshevParams
    nh_mask: np.ndarray  # 1 except on hanging-row copies (host)


def _build_rules(coarse_boxes, fine_boxes, floor_c: int, p: int, d: int):
    """Static transfer metadata for one adjacent level pair (coarse floor
    ``floor_c`` → fine floor ``floor_c // 2``).  Returns a list of dicts
    with static fields; ``P`` holds host numpy per-axis matrices for
    ``embed`` rules (device copies ride device_args)."""
    by_size = {b.size: (i, b) for i, b in enumerate(coarse_boxes)}
    rules = []
    for fi, bf in enumerate(fine_boxes):
        if bf.size > floor_c:
            ci, bc = by_size[bf.size]
            if not (np.array_equal(bf.lo, bc.lo) and bf.nb == bc.nb):
                raise AssertionError(
                    "size group above the floor changed between levels")
            rules.append(dict(kind="same", bf=fi, bc=ci,
                              sl=(slice(None),) * d, P=None))
        elif bf.size == floor_c:
            ci, bc = by_size[floor_c]
            off = bf.lo - bc.lo  # xyz, in floor_c units
            sl = tuple(
                slice(int(off[d - 1 - t]) * p,
                      int(off[d - 1 - t]) * p + bf.lattice_shape[t])
                for t in range(d))
            rules.append(dict(kind="slice", bf=fi, bc=ci, sl=sl, P=None))
        else:
            if bf.size * 2 != floor_c:
                raise AssertionError("fine group below half the floor")
            ci, bc = by_size[floor_c]
            Ps, sls = [], []
            for t in range(d):
                a = d - 1 - t
                lo = int(bf.lo[a])
                nf = int(bf.nb[t])
                c0 = lo // 2
                n_c = (lo + nf - 1) // 2 + 1 - c0
                s0 = (c0 - int(bc.lo[a])) * p
                sls.append(slice(s0, s0 + n_c * p + 1))
                Ps.append(embed_1d(p, lo, nf, c0, n_c))
            rules.append(dict(kind="embed", bf=fi, bc=ci,
                              sl=tuple(sls), P=Ps))
    return rules


class BoxMultigrid:
    """V-cycle preconditioner over global-coarsening forest levels.

    ``cg_solve`` runs the whole GMG-preconditioned CG as ONE jitted
    computation on the finest level's patch vector — drop-in for
    ``BoxLaplaceOperator.cg_solve`` where the mesh is adaptive.
    """

    def __init__(
        self,
        mesh: Mesh,
        dofs: DoFHandler,
        constraints=None,
        coefficient: Optional[Callable] = None,
        dtype: str = "float32",
        smoother_degree: int = 4,
        smoothing_range: float = 20.0,
        coarse_max_dofs: int = 8192,
        coarse_cheb_degree: int = 16,
        fine_op: Optional[BoxLaplaceOperator] = None,
        fine_diag=None,
        solve_op: Optional[BoxLaplaceOperator] = None,
        exact_defect: bool = True,
    ):
        # solve_op: operator for the OUTER CG in cg_solve (A, dots,
        # residual), typically f32/HIGH, while the V-cycle hierarchy
        # runs at `dtype` — pass dtype="bfloat16" for the fast adaptive
        # tier as the smoother (mixed-precision GMG-CG; the
        # preconditioner only steers the search, the f32 recurrence
        # keeps the convergence test honest).  Same mesh/dofs layout
        # required.  None = the fine level's own operator.
        # exact_defect: in a mixed-precision cycle, compute the FINEST
        # level's pre/post defects with solve_op (f32) instead of the
        # dt-rounded operator — see _cycle_with.
        self.solve_op = solve_op
        self._exact_defect = exact_defect
        self.dim, self.p = mesh.dim, dofs.degree
        self.smoother_degree = smoother_degree
        d = mesh.dim
        smax, smin = int(mesh.sizes.max()), int(mesh.sizes.min())
        U = mesh.U
        if np.any(mesh.origins + mesh.sizes[:, None] > U) or np.any(
                mesh.origins < 0):
            raise ValueError("BoxMultigrid needs a full logical-cube mesh")

        # floors: uniform coarsenings above smax while the grid halves
        # evenly, then one forest level per octave down to the real mesh
        top = smax
        while top < (1 << mesh.max_level) and (U // top) % 2 == 0:
            top *= 2
        floors = []  # descending: floors[0] = coarsest, floors[-1] = smin
        f = top
        while f >= smin:
            floors.append(f)
            f //= 2
        # levels[0] = coarsest
        self.levels: list[BoxMGLevel] = []
        for fl in floors:
            if fl == smin:
                mesh_l, dofs_l, cons_l = mesh, dofs, constraints
                op = fine_op
            else:
                mesh_l = coarsen_floor(mesh, fl)
                dofs_l = DoFHandler(mesh_l, self.p)
                cons_l = (make_hanging_node_constraints(dofs_l)
                          if not mesh_l.is_uniform else None)
                op = None
            if op is None:
                op = BoxLaplaceOperator(
                    mesh_l, dofs_l, constraints=cons_l,
                    coefficient=coefficient, dtype=dtype)
            diag = (fine_diag if (fl == smin and fine_diag is not None)
                    else op.diagonal())
            cheb = make_chebyshev_params(
                lambda pr, v, _op=op: _op._vmult_p(pr, v), diag,
                op.n_patch, degree=smoother_degree,
                smoothing_range=smoothing_range, dp=op.params)
            nh = np.ones(op.n_patch)
            if cons_l is not None and cons_l.lines:
                cm = cons_l.constrained_mask()
                for b in op.boxes:
                    g = b.gid.reshape(-1)
                    ok = g >= 0
                    seg = np.ones(b.n_nodes)
                    seg[ok] = (~cm[g[ok]]).astype(np.float64)
                    nh[b.offset : b.offset + b.n_nodes] = seg
            self.levels.append(BoxMGLevel(
                mesh=mesh_l, dofs=dofs_l, op=op,
                inv_diag=1.0 / diag, cheb=cheb, nh_mask=nh))

        # transfer rules per adjacent pair: self._rules[l] maps level
        # l-1 (coarse) -> l (fine)
        self._rules = [None]
        for l in range(1, len(self.levels)):
            fl_c = floors[l - 1]  # coarse floor of this pair
            self._rules.append(_build_rules(
                self.levels[l - 1].op.boxes, self.levels[l].op.boxes,
                fl_c, self.p, d))

        # coarsest solve: dense inverse of the assembled constrained
        # operator in global DoF space (tiny), else fixed Chebyshev
        c0 = self.levels[0]
        dt = c0.op.dt
        self._coarse_dense = c0.dofs.n_dofs <= coarse_max_dofs
        coarse = {}
        if self._coarse_dense:
            from tpufem.fem.assemble import assemble_laplace

            A = assemble_laplace(c0.dofs,
                                 coefficient=coefficient).toarray()
            bmask = c0.dofs.boundary_mask
            A[bmask, :] = 0.0
            A[:, bmask] = 0.0
            A[bmask, bmask] = 1.0
            Ainv = np.linalg.inv(A)
            # patch <-> global index maps for the coarsest level
            gmap = np.zeros(c0.op.n_patch, dtype=np.int64)
            live = np.zeros(c0.op.n_patch)
            for b in c0.op.boxes:
                g = b.gid.reshape(-1)
                ok = g >= 0
                gm = np.zeros(b.n_nodes, dtype=np.int64)
                gm[ok] = g[ok]
                gmap[b.offset : b.offset + b.n_nodes] = gm
                live[b.offset : b.offset + b.n_nodes] = ok
            coarse = {
                "Ainv": jnp.asarray(Ainv, dt),
                "owner": jnp.asarray(c0.op._owner.astype(np.int32)),
                "gmap": jnp.asarray(gmap.astype(np.int32)),
                "live": jnp.asarray(live, dt),
            }
        else:
            coarse_cheb = make_chebyshev_params(
                lambda pr, v: c0.op._vmult_p(pr, v),
                1.0 / c0.inv_diag, c0.op.n_patch,
                degree=coarse_cheb_degree,
                smoothing_range=smoothing_range * 4, dp=c0.op.params)
            coarse = {"cheb": (coarse_cheb.theta, coarse_cheb.delta)}
            self._coarse_cheb_degree = coarse_cheb_degree

        self.device_args = {
            "levels": [
                {
                    "pr": lvl.op.params,
                    "inv_diag": jnp.asarray(lvl.inv_diag, lvl.op.dt),
                    "cheb": (lvl.cheb.theta, lvl.cheb.delta),
                    "nh": jnp.asarray(lvl.nh_mask, lvl.op.dt),
                }
                for lvl in self.levels
            ],
            "transfers": [
                () if rules is None else tuple(
                    () if r["P"] is None else tuple(
                        jnp.asarray(Pa, self.levels[0].op.dt)
                        for Pa in r["P"])
                    for r in rules)
                for rules in self._rules
            ],
            "coarse": coarse,
        }
        if solve_op is not None:
            self.device_args["sp"] = solve_op.params
        self._vcycle_jit = None
        self._solvers: dict = {}

    # ------------------------------------------------------------------
    def recast(self, dtype, solve_op=None,
               exact_defect=None) -> "BoxMultigrid":
        """Mixed-precision clone sharing ALL host-side construction.

        Level meshes / DoF handlers / constraints, transfer rules, the
        Chebyshev eigenvalue estimates (precision-independent — the
        1.2x safety factor dominates the estimate's own rounding) and
        the coarse dense inverse are reused; only the device pytrees
        are cast to ``dtype`` (`BoxLaplaceOperator.recast`).  This is
        the cheap way to get the fast-tier bf16 V-cycle under an f32
        CG: ``mg.recast("bfloat16")`` ≡ ``BoxMultigrid(...,
        dtype="bfloat16", solve_op=fine_f32_op)`` whose full rebuild
        repeats ~380 s of host setup + per-level bf16 power iterations
        at the bench flagship (scripts/adaptive_solve_lab.py) — recast
        is a few array casts.

        solve_op: operator for the outer CG; default = this hierarchy's
        solve operator (its f32 fine op), which is what mixed precision
        wants.  exact_defect: default inherits ``self``.
        """
        import copy

        new = copy.copy(self)
        dt = jnp.dtype(dtype)
        new.solve_op = (solve_op if solve_op is not None
                        else (self.solve_op if self.solve_op is not None
                              else self.levels[-1].op))
        if exact_defect is not None:
            new._exact_defect = exact_defect
        new.levels = [
            dataclasses.replace(
                lvl, op=lvl.op.recast(dt),
                cheb=ChebyshevParams(
                    jnp.asarray(lvl.cheb.theta, dt),
                    jnp.asarray(lvl.cheb.delta, dt), lvl.cheb.degree))
            for lvl in self.levels
        ]
        coarse = dict(self.device_args["coarse"])
        for k in ("Ainv", "live"):
            if k in coarse:
                coarse[k] = jnp.asarray(coarse[k], dt)
        if "cheb" in coarse:
            coarse["cheb"] = tuple(jnp.asarray(c, dt)
                                   for c in coarse["cheb"])
        new.device_args = {
            "levels": [
                {
                    "pr": lvl.op.params,
                    "inv_diag": jnp.asarray(lvl.inv_diag, dt),
                    "cheb": (lvl.cheb.theta, lvl.cheb.delta),
                    "nh": jnp.asarray(lvl.nh_mask, dt),
                }
                for lvl in new.levels
            ],
            "transfers": [
                () if rules is None else tuple(
                    () if r["P"] is None else tuple(
                        jnp.asarray(Pa, dt) for Pa in r["P"])
                    for r in rules)
                for rules in self._rules
            ],
            "coarse": coarse,
            "sp": new.solve_op.params,
        }
        new._vcycle_jit = None
        new._solvers = {}
        return new

    # ------------------------------------------------------------------
    def _seg(self, lvl: BoxMGLevel, u, bi: int):
        b = lvl.op.boxes[bi]
        return u[b.offset : b.offset + b.n_nodes].reshape(
            b.lattice_shape)

    def prolongate_with(self, gdp, l: int, zc):
        """Coarse level l-1 patch (hanging rows FILLED via distribute)
        → fine level l patch; every fine box written exactly once."""
        lf = self.levels[l]
        lc = self.levels[l - 1]
        out = jnp.zeros(lf.op.n_patch, zc.dtype)
        for ri, r in enumerate(self._rules[l]):
            U = self._seg(lc, zc, r["bc"])[r["sl"]]
            if r["kind"] == "embed":
                U = BoxLaplaceOperator._pair_apply(
                    gdp["transfers"][l][ri], U)
            bf = lf.op.boxes[r["bf"]]
            out = jax.lax.dynamic_update_slice(
                out, U.reshape(-1), (bf.offset,))
        return out

    def restrict_with(self, gdp, l: int, rf):
        """Owner-weighted adjoint of ``prolongate_with`` + coarse
        compress + coarse Cᵀ + coarse interior mask: the level-(l-1)
        defect of a fine residual (hanging/Dirichlet rows zero)."""
        lf = self.levels[l]
        lc = self.levels[l - 1]
        ldc = gdp["levels"][l - 1]
        w = gdp["levels"][l]["pr"]["w_owner"]
        rw = w * rf
        t = jnp.zeros(lc.op.n_patch, rf.dtype)
        for ri, r in enumerate(self._rules[l]):
            F = self._seg(lf, rw, r["bf"])
            if r["kind"] == "embed":
                F = BoxLaplaceOperator._pair_apply(
                    gdp["transfers"][l][ri], F, transpose=True)
            C = self._seg(lc, t, r["bc"])
            C = C.at[r["sl"]].add(F)
            bc = lc.op.boxes[r["bc"]]
            t = jax.lax.dynamic_update_slice(
                t, C.reshape(-1), (bc.offset,))
        t = lc.op.compress_p(ldc["pr"], t)
        t = lc.op.distribute_transpose_p(ldc["pr"], t)
        return ldc["pr"]["interior_mask"] * t

    # ------------------------------------------------------------------
    def _coarse_solve_with(self, gdp, b):
        c0 = self.levels[0]
        cd = gdp["coarse"]
        if self._coarse_dense:
            r_g = b[cd["owner"]]
            z_g = jnp.dot(cd["Ainv"], r_g,
                          precision=jax.lax.Precision.HIGHEST)
            return cd["live"] * z_g[cd["gmap"]]
        cheb = ChebyshevParams(cd["cheb"][0], cd["cheb"][1],
                               self._coarse_cheb_degree)
        ld = gdp["levels"][0]
        Af = lambda x: c0.op._vmult_p(ld["pr"], x)
        return chebyshev_smooth(Af, ld["inv_diag"], cheb, b)

    def _cycle_with(self, gdp, l: int, b):
        if l == 0:
            return self._coarse_solve_with(gdp, b)
        lvl = self.levels[l]
        ld = gdp["levels"][l]
        m = ld["pr"]["interior_mask"]
        cheb = ChebyshevParams(ld["cheb"][0], ld["cheb"][1],
                               self.smoother_degree)
        Af = lambda x: lvl.op._vmult_p(ld["pr"], x)
        st = b.dtype
        dt_l = lvl.op.dt
        if dt_l == st:
            # uniform-precision level (bitwise-unchanged round-3 path;
            # DistributedBoxMultigrid._mcycle mirrors this form)
            b = m * b
            x = chebyshev_smooth(Af, ld["inv_diag"], cheb, b)
            r = m * (b - Af(x))
            rc = self.restrict_with(gdp, l, r)
            xc = self._cycle_with(gdp, l - 1, rc)
            ldc = gdp["levels"][l - 1]
            zc = self.levels[l - 1].op.distribute_p(ldc["pr"], xc)
            x = x + m * ld["nh"] * self.prolongate_with(gdp, l, zc)
            return chebyshev_smooth(Af, ld["inv_diag"], cheb, b, x0=x)
        # mixed precision (e.g. bf16 hierarchy under an f32 solve):
        # smoother applies run in the level op's dtype — the fast
        # adaptive tier — while the cycle SPINE (defect, transfers,
        # correction accumulation) stays in the solve dtype.  Post-
        # smoothing uses the exact delta form x <- x + S(b - A x)
        # (chebyshev_smooth is linear, so this equals the x0 form) so
        # the coarse correction is never rounded to dt_l.  With
        # exact_defect + solve_op, the finest defect uses the f32
        # operator: the coarse correction then targets the TRUE
        # residual (costs 2 f32 applies/cycle, buys CG iterations).
        if (self._exact_defect and self.solve_op is not None
                and l == len(self.levels) - 1):
            sop = self.solve_op
            res = lambda v: sop._vmult_p(gdp["sp"],
                                         v.astype(sop.dt)).astype(st)
        else:
            res = lambda v: Af(v.astype(dt_l)).astype(st)
        b = m * b
        x = chebyshev_smooth(Af, ld["inv_diag"], cheb,
                             b.astype(dt_l)).astype(st)
        r = m * (b - res(x))
        rc = self.restrict_with(gdp, l, r)
        xc = self._cycle_with(gdp, l - 1, rc)
        ldc = gdp["levels"][l - 1]
        zc = self.levels[l - 1].op.distribute_p(ldc["pr"], xc)
        x = x + (m * ld["nh"] * self.prolongate_with(gdp, l, zc)
                 ).astype(st)
        r2 = m * (b - res(x))
        x = x + chebyshev_smooth(Af, ld["inv_diag"], cheb,
                                 r2.astype(dt_l)).astype(st)
        return x

    def preconditioner_with(self, gdp, b):
        """Traceable M⁻¹ body (one V-cycle) for an enclosing jitted CG."""
        return self._cycle_with(gdp, len(self.levels) - 1, b)

    def vcycle(self, b):
        """Standalone jitted V-cycle on the finest patch vector."""
        if self._vcycle_jit is None:
            L = len(self.levels) - 1
            self._vcycle_jit = jax.jit(
                lambda gdp, b_: self._cycle_with(gdp, L, b_))
        return self._vcycle_jit(self.device_args, b)

    @property
    def fine(self) -> BoxMGLevel:
        return self.levels[-1]

    # ------------------------------------------------------------------
    def cg_solve(self, b_patch, x0=None, rtol=1e-10, maxiter=1000):
        """GMG-preconditioned CG on the finest patch vector, ONE jitted
        computation (all device arrays threaded as arguments)."""
        from tpufem.solvers.cg import cg_solve as _cg

        key = ()
        if key not in self._solvers:
            fine = self.levels[-1]
            sop = self.solve_op if self.solve_op is not None else fine.op

            def solver(gdp, sp, b, x0_, rtol_, maxiter_):
                w = sp["w_owner"]
                dot = lambda a, c: jnp.dot(
                    w * a, c, precision=jax.lax.Precision.HIGHEST)
                A = lambda v: sop._vmult_p(sp, v)
                # the cycle spine runs in r's dtype; mixed levels cast
                # around their smoother applies internally
                M_inv = lambda r: self.preconditioner_with(
                    gdp, r).astype(sop.dt)
                return _cg(A, b, M_inv=M_inv, x0=x0_, rtol=rtol_,
                           maxiter=maxiter_, dot=dot)

            self._solvers[key] = (
                jax.jit(solver, static_argnums=(4, 5)), sop)
        solver_jit, sop = self._solvers[key]
        b_patch = jnp.asarray(b_patch, sop.dt)
        if x0 is None:
            x0 = jnp.zeros_like(b_patch)
        return solver_jit(self.device_args, sop.params, b_patch, x0,
                          rtol, maxiter)
