"""MatrixFree: device-resident data for matrix-free operator evaluation.

Reference analogue: ``MatrixFreeGpu<dim,Number>`` (SURVEY.md §2, §3.2) — the
``reinit`` that walks cells on the host and bakes flat device arrays:
SoA ``local_to_global`` cell→DoF maps, cached inverse Jacobians / JxW,
per-cell constraint masks, per-color cell ranges.  Here ``reinit`` is
numpy precompute in ``MatrixFree.build`` and the device arrays are jnp;
``cell_loop`` becomes a traced function (tpufem.ops.cell_loop) whose whole
gather→contract→metric→contract→scatter pipeline XLA fuses.

Scatter schemes (both first-class, mirroring the reference's
atomics-vs-coloring duality, SURVEY.md §7 "Scatter"):
- ``incidence``: transpose gather — each DoF sums its (padded, fixed-K)
  list of (cell, local) contributions; race-free by construction, fully
  dense gathers, usually fastest on one chip.
- ``colored``: per-color unique-indices scatter-add, the reference's
  graph-coloring design; also the basis for the Pallas in-place kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.coloring import color_cells
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mapping import Metric, compute_metric
from tpufem.fem.mesh import Mesh
from tpufem.fem.quadrature import Quadrature
from tpufem.fem.shapes import ShapeInfo
from tpufem.utils.config import FemConfig


@jax.jit
def _scatter_inc(v_loc, inc):
    flat = jnp.concatenate([v_loc.reshape(-1), jnp.zeros((1,), v_loc.dtype)])
    return jnp.sum(flat[inc], axis=1)


def _terms_with_kernel(terms, npts, p, d, config, dtype):
    """(sep_ops, resident) for a sum-of-tensor-products operator: the
    XLA terms apply plus, when use_pallas and the tiling fits, the fused
    ResidentTerms(2D) kernel (exact per-row band tables)."""
    sep_ops = ("terms", terms)
    resident = None
    if config.use_pallas and d in (2, 3):
        from tpufem.ops.pallas_separable import (
            ResidentTerms,
            ResidentTerms2D,
        )

        interp = jax.default_backend() == "cpu"
        cls_k = ResidentTerms if d == 3 else ResidentTerms2D
        try:
            resident = cls_k(
                npts, p,
                [[np.asarray(m, np.float64) for m in t3] for t3 in terms],
                dtype, mode=config.pallas_mode, interpret=interp)
            sep_ops = ("terms", terms, resident)
        except ValueError:
            resident = None  # tiling constraints unmet
    return sep_ops, resident


@dataclasses.dataclass
class MatrixFree:
    """Static + device data for one (mesh, degree, quadrature) instance."""

    config: FemConfig
    mesh: Mesh
    dofs: DoFHandler
    n_dofs: int
    n_cells: int
    # device arrays (jnp, config.dtype unless noted)
    cell_dofs: Any  # (nc, nn) int32
    S: Any  # (nq1, n1)
    D: Any  # (nq1, n1)
    D_col: Any | None  # (nq1, nq1) if nq1 == n1
    metric_kind: str  # 'cartesian' | 'general'
    inv_h: Any | None  # (nc, d)      [cartesian]
    det: Any | None  # (nc,)          [cartesian]
    w_q: Any | None  # (nq,)          [cartesian]
    inv_jac: Any | None  # (nc, nq, d, d)  [general]
    jxw: Any | None  # (nc, nq)       [general]
    # incidence/colors are built lazily on first use (the fast uniform
    # tiers never touch them; at 17M DoFs the incidence map alone is
    # ~0.5 GB of HBM)
    incidence: Any  # (n_dofs, K) int32, lazy (None until first use)
    colors: Any  # list of per-color cell-index arrays, lazy
    interior_mask: Any  # (n_dofs,) dtype — 1 for unconstrained, 0 constrained
    coef_q: Any | None  # (nc, nq) coefficient at quadrature points
    quad: Quadrature
    # host copies for setup-side computations (f64)
    host_metric: Metric
    # resolved scatter scheme ('auto' resolved at build time)
    scheme: str = "incidence"
    # structured (gather-free) fast-path data — uniform Cartesian grids only
    uniform_n: int | None = None  # cells per axis
    struct_scale: Any | None = None  # (dim,) inv_h^2 * det
    struct_w: Any | None = None  # broadcastable quadrature(+coef) weights
    # curved/general-metric structured data (flat global q-grid; packed
    # symmetric jxw * J^-1 J^-T — see ops.structured.sym_metric_components)
    struct_gsym: Any | None = None  # ((n*q1,)*d, d(d+1)/2)
    # hanging-node constraint application data (None on uniform meshes):
    # the reference's hanging_nodes.cuh resolution, as C / C^T application
    con_dofs: Any | None = None  # (ncon,) int32
    con_masters: Any | None = None  # (ncon, K) int32
    con_weights: Any | None = None  # (ncon, K)
    con_inhom: Any | None = None  # (ncon,)
    constraints_obj: Any | None = None  # host AffineConstraints (setup use)
    dense_A: Any | None = None  # (nn, nn) shared local matrix (dense tier)
    sep_ops: Any | None = None  # ([K1_a], [M1_a]) global 1D operators
    # certified relative coefficient error of a CP-expanded operator
    # (None = the operator is exact to rounding)
    coef_cp_err: float | None = None
    # solver-resident fused kernel (3D separable + use_pallas; halo'd
    # layout in/out so CG chains applies with zero pad/unpad passes)
    resident: Any | None = None

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        mesh: Mesh,
        dofs: DoFHandler,
        config: FemConfig,
        coefficient: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        constrained_mask: Optional[np.ndarray] = None,
        constraints=None,  # AffineConstraints (hanging nodes etc.)
        coefficient_axes: Optional[list] = None,
        coefficient_cp_tol: Optional[float] = None,
        coefficient_cp_max_rank: int = 6,
    ) -> "MatrixFree":
        """The reference's ``reinit`` (SURVEY.md §3.2): host-side walk over
        cells producing flat device arrays. Amortized one-time setup.

        ``coefficient_axes``: a SEPARABLE variable coefficient given as d
        per-axis callables, c(x) = prod_a c_a(x_a) (each vectorized on
        physical coords).  On a uniform Cartesian mesh the operator then
        factors EXACTLY into weighted 1D matrices (same tensor Gauss
        rule, so parity with the per-qpoint path is rounding-level) and
        the separable scheme — including the fused ResidentTerms
        kernel — stays available: the variable-coefficient fast path
        (VERDICT r4 item 2).  The equivalent pointwise ``coefficient``
        is synthesized automatically for the diagonal / oracle /
        structured fallback paths; passing both is an error.

        ``coefficient_cp_tol``: with a GENERIC (non-separable)
        ``coefficient`` on a uniform Cartesian mesh and
        scatter='separable', CP-expand c at the quadrature grid to this
        relative tolerance (greedy rank-1 deflation, up to
        ``coefficient_cp_max_rank`` ranks — dim terms each) and ride the
        same fast terms path; the achieved error is recorded in
        ``coef_cp_err`` and the applied operator is EXACTLY the
        per-qpoint operator with the reconstructed coefficient.  Use
        when the tolerance is at or below the discretization error (or
        for preconditioning); the per-qpoint structured tier remains
        the exact path.
        """
        p, d = config.degree, config.dim
        assert mesh.dim == d and dofs.degree == p
        dtype = jnp.dtype(config.dtype)
        quad = Quadrature.gauss(config.nq1)
        si = ShapeInfo(p, quad)
        nn = config.n_dofs_per_cell
        nc = mesh.n_cells

        if coefficient_axes is not None:
            if coefficient is not None:
                raise ValueError(
                    "pass either coefficient or coefficient_axes, not both")
            if len(coefficient_axes) != d:
                raise ValueError(f"coefficient_axes needs {d} callables")
            cax = list(coefficient_axes)

            def coefficient(pts, _cax=cax):  # noqa: F811
                out = np.ones(pts.shape[0])
                for a, ca in enumerate(_cax):
                    out = out * np.asarray(ca(pts[:, a]))
                return out

        metric = compute_metric(mesh, quad, need_points=coefficient is not None)

        coef_q = None
        if coefficient is not None:
            pts = metric.quad_points.reshape(-1, d)
            coef_q = coefficient(pts).reshape(nc, -1)

        if constrained_mask is None:
            constrained_mask = dofs.boundary_mask
        con_arrays = (None,) * 4
        if constraints is not None and constraints.lines:
            constrained_mask = constrained_mask | constraints.constrained_mask()
            c, m, w, ih = constraints.padded_arrays()
            con_arrays = (
                jnp.asarray(c),
                jnp.asarray(m),
                jnp.asarray(w, dtype),
                jnp.asarray(ih, dtype),
            )
        interior = (~constrained_mask).astype(np.float64)

        # resolve scatter scheme; build structured fast-path data if usable
        # (round 2: general/curved metrics ride the blocked structured path
        # too — per-qpoint inv_jac/JxW in the blocked layout)
        structured_ok = mesh.is_uniform and si.nq1 == si.n1
        cartesian_ok = structured_ok and metric.kind == "cartesian"
        dense_ok = cartesian_ok and coef_q is None
        scheme = config.scatter
        if scheme == "auto":
            # structured (gather-free blocked cell loop) is the default on
            # uniform Cartesian grids: near-separable speed in solves with
            # per-cell-short f32 reductions (measured L2 5e-8 vs 2e-5 for
            # the separable tier at 2M DoFs).  'separable' remains the raw
            # apply-throughput choice (bench.py measures both).
            scheme = "structured" if structured_ok else "incidence"
        if scheme == "structured" and not structured_ok:
            raise ValueError(
                "structured scheme needs a uniform mesh and nq1 == p+1"
            )
        # separable also covers orthogonal curved meshes whose metric
        # factors into 1D weights (polar/spherical shells,
        # Mesh.separable_metric) — the operator then factors EXACTLY into
        # sums of tensor products of weighted 1D matrices
        sep_metric_ok = (
            structured_ok
            and coef_q is None
            and getattr(mesh, "separable_metric", None) is not None
        )
        # a SEPARABLE coefficient keeps the separable scheme available
        # (weighted 1D matrices) — only a generic pointwise coefficient
        # forces the per-qpoint tiers
        sep_coef_ok = cartesian_ok and coefficient_axes is not None
        sep_cp_ok = (cartesian_ok and coefficient is not None
                     and coefficient_cp_tol is not None
                     and coefficient_axes is None)
        if scheme == "separable" and not (dense_ok or sep_metric_ok
                                          or sep_coef_ok or sep_cp_ok):
            raise ValueError(
                "separable scheme needs a uniform Cartesian mesh (or an "
                "orthogonal separable metric), nq1 == p+1 and no "
                "non-separable variable coefficient (pass "
                "coefficient_axes for a separable one)"
            )
        if scheme == "dense" and not dense_ok:
            raise ValueError(
                "dense scheme needs a uniform Cartesian mesh, "
                "nq1 == p+1 and no variable coefficient"
            )
        coef_cp_err = None
        uniform_n = None
        struct_scale = None
        struct_w = None
        struct_gsym = None
        dense_A = None
        sep_ops = None
        resident = None
        if scheme == "separable" and metric.kind == "general":
            # orthogonal curved mesh (polar/spherical shell): the metric
            # factors into 1D weights, so the GLOBAL operator factors
            # exactly into sums of tensor products of weighted 1D
            # matrices — assembled with the same Gauss rule, hence
            # rounding-level parity with the per-qpoint general path
            from tpufem.ops.separable import build_separable_metric_terms

            uniform_n = int(mesh.U // mesh.sizes[0])
            terms = build_separable_metric_terms(
                p, d, config.nq1, uniform_n, mesh.separable_metric, dtype
            )
            # fused resident kernel for the exact sum-of-tensor-product
            # factorization (per-row band tables — the curved-shell /
            # graded-grid fast tier, VERDICT r4 item 3); also powers
            # resident_jacobi_cg on shells
            sep_ops, resident = _terms_with_kernel(
                terms, uniform_n * p + 1, p, d, config, dtype)
        elif scheme == "structured" and metric.kind == "general":
            # curved uniform mesh: per-qpoint metric in the blocked layout
            uniform_n = int(mesh.U // mesh.sizes[0])
            n, q1 = uniform_n, config.nq1
            lat = mesh.origins // int(mesh.sizes[0])
            canonical = np.zeros(nc, dtype=np.int64)
            for a in range(d):
                canonical += lat[:, a] * n**a
            order = np.argsort(canonical)
            jxw = metric.jxw
            if coef_q is not None:
                jxw = jxw * coef_q
            # (nc, nq[, d, d]) -> (nz,qz,ny,qy,nx,qx[, d, d])
            perm = []
            for i in range(d):
                perm += [i, d + i]

            def to_blocked(arr):
                trail = arr.shape[2:]
                a2 = arr[order].reshape((n,) * d + (q1,) * d + trail)
                return np.transpose(
                    a2, perm + list(range(2 * d, 2 * d + len(trail)))
                )

            from tpufem.ops.structured import sym_metric_components

            gsym = sym_metric_components(metric.inv_jac, jxw)
            # store in the FLAT global q-grid layout (nq,)*d + (ncomp,):
            # the 7-D interleaved blocked layout picks a pathological TPU
            # tiling (measured: 20 GB copy for a 786 MB array at p=4 r=6)
            ncomp = d * (d + 1) // 2
            flat = np.ascontiguousarray(to_blocked(gsym)).reshape(
                (n * q1,) * d + (ncomp,))
            struct_gsym = jnp.asarray(flat, dtype)
        elif scheme in ("structured", "dense", "separable"):
            uniform_n = int(mesh.U // mesh.sizes[0])
            inv_h0 = metric.inv_h[0]  # identical for all cells
            struct_scale = np.asarray(inv_h0**2 * metric.det[0], dtype)
            # weight block broadcastable against blocked layout
            # ([nz,qz,]ny,qy,nx,qx): quadrature dims at odd positions,
            # axis order z..x (slowest first, see ops.structured)
            w1 = np.asarray(Quadrature.gauss(config.nq1).weights_1d)
            wb = np.ones([1] * (2 * d))
            for a in range(d):
                sh = [1] * (2 * d)
                sh[2 * (d - 1 - a) + 1] = config.nq1
                wb = wb * w1.reshape(sh)
            if scheme == "dense":
                from tpufem.ops.dense_local import build_dense_local_matrix

                dense_A = build_dense_local_matrix(
                    p, d, config.nq1, np.asarray(struct_scale), dtype
                )
            if scheme == "separable" and sep_cp_ok:
                # generic smooth coefficient: CP-expand at the
                # quadrature grid and ride the SAME terms fast path
                # (certified coefficient error in coef_cp_err)
                from tpufem.ops.separable import cp_coef_terms

                terms, coef_cp_err = cp_coef_terms(
                    p, d, config.nq1, uniform_n, mesh.lower, mesh.upper,
                    coefficient, dtype, tol=coefficient_cp_tol,
                    max_rank=coefficient_cp_max_rank)
                sep_ops, resident = _terms_with_kernel(
                    terms, uniform_n * p + 1, p, d, config, dtype)
            elif scheme == "separable" and coefficient_axes is not None:
                # separable variable coefficient: exactly-factored
                # weighted 1D matrices ride the terms apply + the fused
                # ResidentTerms kernel (VERDICT r4 item 2 — the
                # variable-coefficient fast path)
                from tpufem.ops.separable import cartesian_coef_terms

                terms = cartesian_coef_terms(
                    p, d, config.nq1, uniform_n, mesh.lower, mesh.upper,
                    coefficient_axes, dtype)
                sep_ops, resident = _terms_with_kernel(
                    terms, uniform_n * p + 1, p, d, config, dtype)
            elif scheme == "separable":
                from tpufem.ops.separable import (
                    build_separable_operators,
                    global_1d_matrices,
                )

                h = 1.0 / metric.inv_h[0]  # (d,) physical cell widths
                sep_ops = build_separable_operators(
                    p, d, config.nq1, uniform_n, np.asarray(h), dtype
                )
                if config.use_pallas:
                    from tpufem.ops.pallas_separable import (
                        PallasSeparable,
                        ResidentSeparable,
                    )

                    K1u, M1u = global_1d_matrices(p, uniform_n, config.nq1)
                    import jax

                    Ks_np = [np.asarray(K1u / h[a]) for a in range(d)]
                    Ms_np = [np.asarray(M1u * h[a]) for a in range(d)]
                    interp = jax.default_backend() == "cpu"
                    sep_ops = sep_ops + (PallasSeparable(
                        d, uniform_n * p + 1, p, Ks_np, Ms_np, dtype,
                        interpret=interp,
                    ),)
                    if d == 3:
                        plain_mask = np.array_equal(
                            constrained_mask, dofs.boundary_mask)
                        if config.pallas_dirichlet and not plain_mask:
                            # the fused kernel bakes the FULL-boundary
                            # separable mask in; any other constraint set
                            # would be silently mis-masked
                            raise ValueError(
                                "pallas_dirichlet=True requires the plain "
                                "full-boundary Dirichlet mask (no extra "
                                "constraints / custom constrained_mask)")
                        # None = auto: fuse exactly when representable
                        fuse_mask = (plain_mask
                                     if config.pallas_dirichlet is None
                                     else config.pallas_dirichlet)
                        try:
                            kwargs_res = dict(
                                mode=config.pallas_mode,
                                interpret=interp,
                                dirichlet=fuse_mask)
                            resident = ResidentSeparable(
                                uniform_n * p + 1, p, Ks_np, Ms_np,
                                dtype, **kwargs_res)
                        except ValueError:
                            resident = None  # tiling constraints unmet
                    elif d == 2:
                        # 2D resident kernel (uniform = the 2-term
                        # Laplace factorization); enables 2D resident
                        # CG and the 2D fast-tier degree sweep
                        from tpufem.ops.pallas_separable import (
                            ResidentTerms2D,
                        )

                        try:
                            resident = ResidentTerms2D(
                                uniform_n * p + 1, p,
                                [[Ks_np[0], Ms_np[1]],
                                 [Ms_np[0], Ks_np[1]]],
                                dtype, mode=config.pallas_mode,
                                interpret=interp)
                        except ValueError:
                            resident = None  # tiling constraints unmet
            if coef_q is not None:
                n = uniform_n
                q1 = config.nq1
                # reorder rows to canonical x-fastest lattice order: cell
                # ordering is NOT guaranteed to be lexicographic (meshes
                # produced by refine() are sorted axis-0-major), and a
                # silently transposed coefficient field would corrupt the
                # operator (caught by review: 0.44 rel err repro)
                lat = mesh.origins // int(mesh.sizes[0])  # (nc, d)
                canonical = np.zeros(nc, dtype=np.int64)
                for a in range(d):
                    canonical += lat[:, a] * n**a
                coef_canon = coef_q[np.argsort(canonical)]
                # (nc, nq) with cells (cz,cy,cx) and qpoints (qz,qy,qx)
                cq = coef_canon.reshape((n,) * d + (q1,) * d)
                # -> ([nz,qz,]ny,qy,nx,qx): interleave cell/quad per axis
                perm = []
                for i in range(d):
                    perm += [i, d + i]
                cq = np.transpose(cq, perm)
                wb = wb * cq
            # numpy: embedded as a host constant in jitted applies (device
            # constants D2H-hang at lowering on this platform)
            struct_w = np.asarray(wb, dtype)

        kwargs = dict(
            inv_h=None, det=None, w_q=None, inv_jac=None, jxw=None
        )
        if metric.kind == "cartesian":
            kwargs.update(
                inv_h=jnp.asarray(metric.inv_h, dtype),
                det=jnp.asarray(metric.det, dtype),
                w_q=jnp.asarray(metric.w_q, dtype),
            )
        else:
            kwargs.update(
                inv_jac=jnp.asarray(metric.inv_jac, dtype),
                jxw=jnp.asarray(metric.jxw, dtype),
            )

        return cls(
            config=config,
            mesh=mesh,
            dofs=dofs,
            n_dofs=dofs.n_dofs,
            n_cells=nc,
            # device-resident only for the gathering schemes: the
            # gather-free tiers never touch it and it is ~0.5 GB of HBM
            # at the 17M-DoF flagship (measured to pressure the resident
            # GMG program into a 50x slowdown); converted lazily on
            # first gather otherwise
            cell_dofs=(jnp.asarray(dofs.cell_dofs)
                       if scheme in ("incidence", "colored")
                       else np.asarray(dofs.cell_dofs)),
            # 1D shape matrices as HOST constants (numpy): they are baked
            # into every jitted apply; device constants would D2H-fetch at
            # lowering, which hangs on this platform (docs/ROOFLINE.md)
            S=np.asarray(si.S, dtype),
            D=np.asarray(si.D, dtype),
            D_col=np.asarray(si.D_col, dtype) if si.D_col is not None else None,
            metric_kind=metric.kind,
            incidence=None,
            colors=None,
            interior_mask=jnp.asarray(interior, dtype),
            coef_q=jnp.asarray(coef_q, dtype) if coef_q is not None else None,
            quad=quad,
            host_metric=metric,
            scheme=scheme,
            uniform_n=uniform_n,
            struct_scale=struct_scale,
            struct_w=struct_w,
            struct_gsym=struct_gsym,
            con_dofs=con_arrays[0],
            con_masters=con_arrays[1],
            con_weights=con_arrays[2],
            con_inhom=con_arrays[3],
            constraints_obj=constraints,
            dense_A=dense_A,
            sep_ops=sep_ops,
            coef_cp_err=coef_cp_err,
            resident=resident,
            **kwargs,
        )

    # ------------------------------------------------------------------
    def device_args(self, include_gather: bool | None = None):
        """Pytree of the LARGE device-resident arrays referenced inside
        traced applies.

        Platform rule (docs/ROOFLINE.md, round 3): device arrays must
        cross every jit boundary as ARGUMENTS.  A jax.Array captured as a
        closure constant is fetched device-to-host at lowering
        (``_array_mlir_constant_handler`` → ``Array._value``), and that
        transfer intermittently hangs for minutes on this machine's
        remote-TPU runtime — the root cause of the round-2 "bimodal
        compile/execute" behavior.  Small setup matrices (S/D/1D
        operators/weight blocks) are numpy and embed from host memory
        instead; everything here is O(n_dofs)/O(n_cells) and travels as
        arguments.
        """
        con = None
        if self.has_hanging:
            con = (self.con_dofs, self.con_masters, self.con_weights,
                   self.con_inhom)
        dp = {
            "mask": self.interior_mask,
            "coef_q": self.coef_q,
            "inv_h": self.inv_h,
            "det": self.det,
            "w_q": self.w_q,
            "inv_jac": self.inv_jac,
            "jxw": self.jxw,
            "struct_gsym": self.struct_gsym,
            "con": con,
            "cell_dofs": None,
            "incidence": None,
            "colors": None,
        }
        if include_gather is None:
            include_gather = self.scheme in ("incidence", "colored")
        if include_gather:
            if isinstance(self.cell_dofs, np.ndarray):
                self.cell_dofs = jnp.asarray(self.cell_dofs)
            dp["cell_dofs"] = self.cell_dofs
            if self.scheme == "colored":
                dp["colors"] = [jnp.asarray(c)
                                for c in self._ensure_colors()]
            else:
                dp["incidence"] = jnp.asarray(self._ensure_incidence())
        return dp

    # ------------------------------------------------------------------
    def gather(self, u):
        """read_dof_values for all cells: (n_dofs,) -> (nc, nn)."""
        if isinstance(self.cell_dofs, np.ndarray):
            # lazy device conversion (concrete even under trace)
            self.cell_dofs = jnp.asarray(self.cell_dofs)
        return u[self.cell_dofs]

    def _ensure_incidence(self):
        if self.incidence is None:
            from tpufem.utils.native import build_incidence

            nc, nn = self.dofs.cell_dofs.shape
            pad_pos = nc * nn
            # cache as NUMPY: jnp.asarray under an active trace would stage
            # a tracer, and caching a tracer on self leaks it out of the
            # transformation (UnexpectedTracerError)
            self.incidence = build_incidence(
                self.dofs.cell_dofs, self.n_dofs, pad_pos
            )
        return self.incidence

    def _ensure_colors(self):
        if self.colors is None:
            self.colors = color_cells(self.mesh, self.dofs.cell_dofs)
        return self.colors

    def scatter_incidence(self, v_loc):
        """distribute_local_to_global, transpose-gather scheme.

        v_loc: (nc, nn) -> (n_dofs,).  Each DoF gathers its fixed-K padded
        incidence list from the flattened locals and sums — race-free, no
        scatter primitive at all (SURVEY.md §2 parallelism item 4).
        The incidence map is passed as a jit ARGUMENT — constant-index
        gathers lower pathologically on this platform (docs/ROOFLINE.md).
        """
        inc = jnp.asarray(self._ensure_incidence())
        return _scatter_inc(v_loc, inc)

    def scatter_colored(self, v_loc):
        """distribute_local_to_global, graph-colored scheme: one
        unique-indices scatter-add per color (reference's colored plain
        store, SURVEY.md §3.4)."""
        dst = jnp.zeros((self.n_dofs,), v_loc.dtype)
        for cells in self._ensure_colors():
            idx = self.cell_dofs[cells].reshape(-1)
            vals = v_loc[cells].reshape(-1)
            dst = dst.at[idx].add(vals, unique_indices=True)
        return dst

    def scatter(self, v_loc):
        if self.scheme == "colored":
            return self.scatter_colored(v_loc)
        return self.scatter_incidence(v_loc)

    # ------------------------------------------------------------------
    # hanging-node constraint application (C and C^T) — the TPU form of
    # the reference's resolve_hanging_nodes<false/true> (SURVEY.md §3.4)
    @property
    def has_hanging(self) -> bool:
        return self.con_dofs is not None

    def distribute(self, u, homogeneous: bool = True):
        """u -> C u: constrained entries replaced by their interpolation."""
        if not self.has_hanging:
            return u
        vals = jnp.sum(self.con_weights * u[self.con_masters], axis=1)
        if not homogeneous:
            vals = vals + self.con_inhom
        return u.at[self.con_dofs].set(vals, unique_indices=True)

    def distribute_transpose(self, y):
        """y -> C^T y: constrained contributions accumulated to masters,
        constrained entries zeroed."""
        if not self.has_hanging:
            return y
        yc = y[self.con_dofs]  # (ncon,)
        y = y.at[self.con_dofs].set(0.0, unique_indices=True)
        return y.at[self.con_masters.reshape(-1)].add(
            (self.con_weights * yc[:, None]).reshape(-1)
        )
