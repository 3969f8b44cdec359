"""Geometric multigrid V-cycle preconditioner on uniform level hierarchies.

Reference analogue: the GMG stack of ``poisson_mg.cu`` — deal.II
``Multigrid`` + ``PreconditionMG`` driving ``MGTransferMatrixFreeGpu``
(sum-factorized level transfer kernels) and Chebyshev-smoothed
``LaplaceOperatorGpu`` per level (SURVEY.md §2 "GMG transfer", §3.5).

TPU-native design decisions:
- Levels are the uniformly refined hyper_cube grids; the FE spaces nest
  exactly, so each level operator is the true Galerkin operator without
  assembling P^T A P.
- Transfer uses the *global separable* form: on a tensor-product node grid
  the prolongation is P1d ⊗ ... ⊗ P1d, applied as one batched matmul per
  axis (MXU) — mathematically identical to the reference's per-cell
  child-gather kernels with DoF weights, but with the weight bookkeeping
  eliminated by construction.
- The whole V-cycle is a traced function: level loop unrolled at trace
  time (shapes are static per level), so CG + GMG preconditioner runs as a
  single XLA computation with zero host round-trips per iteration.
- Coarsest level solved with a precomputed dense inverse (constrained
  rows = identity) — deterministic, and a single small matmul on device.
- Platform rule (docs/ROOFLINE.md round 3): every device array the traced
  V-cycle touches (level masks, inverse diagonals, Chebyshev eigenvalue
  scalars, the coarse dense inverse, each level operator's metric/index
  arrays) travels through the ``device_args`` pytree as a jit ARGUMENT.
  Device arrays captured as closure constants are fetched device-to-host
  at lowering, which intermittently hangs for minutes on this machine's
  remote-TPU runtime.  The small 1D prolongation matrices stay host-side
  (numpy) and embed as plain constants.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import assemble_laplace
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.fem.shapes import subface_interpolation_1d, support_points_1d
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.chebyshev import (
    ChebyshevParams,
    chebyshev_smooth,
    make_chebyshev_params,
)
from tpufem.utils.config import FemConfig


def prolongation_1d(p: int, n_coarse_cells: int) -> np.ndarray:
    """1D node-grid prolongation (2n cells from n cells), dense
    (2*n*p+1, n*p+1).

    Rows for child c of coarse cell k interpolate via the subface matrix
    (tpufem.fem.shapes.subface_interpolation_1d) — the same 1D embedding
    the reference loads for MGTransferMatrixFreeGpu (SURVEY.md §2).
    Overlapping rows (shared fine nodes) receive identical values, so
    "set" semantics are well-defined.
    """
    n = n_coarse_cells
    nc_pts = n * p + 1
    nf_pts = 2 * n * p + 1
    P = np.zeros((nf_pts, nc_pts))
    C = [subface_interpolation_1d(p, 0), subface_interpolation_1d(p, 1)]
    for k in range(n):
        for c in (0, 1):
            rows = (2 * k + c) * p + np.arange(p + 1)
            cols = k * p + np.arange(p + 1)
            P[np.ix_(rows, cols)] = C[c]
    return P


@dataclasses.dataclass
class MGLevel:
    mf: MatrixFree
    op: LaplaceOperator
    inv_diag: jnp.ndarray
    cheb: ChebyshevParams
    mask: jnp.ndarray  # interior mask (homogeneous constraints per level)
    npts: int  # nodes per axis of this level's tensor grid


class GeometricMultigrid:
    """V-cycle preconditioner over uniformly refined hyper_cube levels."""

    def __init__(
        self,
        dim: int,
        degree: int,
        finest_refine: int,
        coarsest_refine: int = 1,
        dtype: str = "float64",
        smoother_degree: int = 4,
        coefficient: Optional[Callable] = None,
        scatter: str = "auto",
        n_cycles: int = 1,
        nbase: int = 1,
        use_pallas: bool = False,
        pallas_mode: str = "f32",
        pallas_dirichlet: bool | None = None,
        mesh_factory: Optional[Callable] = None,
        coefficient_axes: Optional[list] = None,
    ):
        """``mesh_factory(refine) -> Mesh`` generalizes the level
        hierarchy beyond hyper_cube: any family of uniformly refined
        meshes sharing ONE geometry (e.g. ``Mesh.hyper_shell_3d`` —
        curved-domain GMG; the level FE spaces nest in logical
        coordinates, coarse operators are re-discretized per level, the
        standard geometric-MG construction).  ``coefficient_axes``: a
        separable variable coefficient (see MatrixFree.build) — every
        level's smoother then rides the exactly-factored terms path
        (+ResidentTerms kernel when use_pallas), the fast
        BASELINE-config-5 composition."""
        if coarsest_refine > finest_refine:
            raise ValueError("coarsest_refine must be <= finest_refine")
        if coefficient is not None and coefficient_axes is not None:
            raise ValueError(
                "pass either coefficient or coefficient_axes, not both")
        self.dim, self.degree = dim, degree
        self.n_cycles = n_cycles
        self.nbase = nbase
        if mesh_factory is None:
            mesh_factory = lambda r: Mesh.hyper_cube(dim, r, nbase=nbase)
        # the fused Pallas kernels (separable / terms form) can power
        # every level's smoother applies; accuracy is structured-class
        # (ops/pallas_separable.py).  A generic pointwise coefficient
        # has no separable factorization — flat tiers only.
        pallas_ok = use_pallas and coefficient is None
        self.levels: list[MGLevel] = []
        for r in range(coarsest_refine, finest_refine + 1):
            mesh = mesh_factory(r)
            dofs = DoFHandler(mesh, degree)
            cfg = FemConfig(dim=dim, degree=degree, dtype=dtype,
                            scatter="separable" if pallas_ok else scatter,
                            use_pallas=pallas_ok,
                            pallas_mode=pallas_mode,
                            pallas_dirichlet=pallas_dirichlet)
            mf = MatrixFree.build(mesh, dofs, cfg, coefficient=coefficient,
                                  coefficient_axes=coefficient_axes)
            op = LaplaceOperator(mf)
            diag = op.diagonal()
            cheb = make_chebyshev_params(
                op.vmult_with, diag, dofs.n_dofs, degree=smoother_degree,
                dp=op.device_args,
            )
            self.levels.append(MGLevel(
                mf=mf, op=op, inv_diag=1.0 / diag, cheb=cheb,
                mask=mf.interior_mask,
                npts=nbase * (1 << r) * degree + 1,
            ))
        # 1D prolongations between consecutive levels — HOST (numpy)
        # constants: small, and device constants D2H-hang at lowering on
        # this platform
        self.P1d = []
        for r in range(coarsest_refine, finest_refine):
            P = prolongation_1d(degree, nbase * (1 << r))
            self.P1d.append(np.asarray(P, np.dtype(dtype)))
        # coarse dense inverse (constrained rows/cols -> identity)
        lvl0 = self.levels[0]
        coarse_coef = coefficient
        if coefficient_axes is not None:
            def coarse_coef(pts, _cax=list(coefficient_axes)):
                out = np.ones(pts.shape[0])
                for a, ca in enumerate(_cax):
                    out = out * np.asarray(ca(pts[:, a]))
                return out
        K = assemble_laplace(
            lvl0.mf.dofs, coefficient=coarse_coef
        ).toarray()
        m = np.asarray(lvl0.mask, dtype=np.float64)
        Kc = (m[:, None] * K * m[None, :]) + np.diag(1.0 - m)
        self.coarse_inv = jnp.asarray(
            np.linalg.inv(Kc), jnp.dtype(dtype)
        )
        # the pytree of every device array the traced V-cycle reads,
        # passed as a jit ARGUMENT by all solve entry points
        self.device_args = {
            "coarse_inv": self.coarse_inv,
            "levels": tuple(
                {"dp": lvl.op.device_args, "inv_diag": lvl.inv_diag,
                 "mask": lvl.mask,
                 "cheb": (lvl.cheb.theta, lvl.cheb.delta)}
                for lvl in self.levels
            ),
        }
        self._vcycle_jit = None

    # ------------------------------------------------------------------
    def _tensor_apply(self, P, x, npts_in: int, npts_out: int):
        """Apply P (npts_out, npts_in) along each axis of the tensor grid."""
        d = self.dim
        t = x.reshape((npts_in,) * d)  # index order (z, y, x): x fastest
        for axis in range(d):
            t = jnp.moveaxis(
                jnp.einsum("fi,...i->...f", P,
                           jnp.moveaxis(t, d - 1 - axis, -1),
                           preferred_element_type=t.dtype,
                           precision=jax.lax.Precision.HIGHEST),
                -1, d - 1 - axis,
            )
        return t.reshape(-1)

    def prolongate(self, level: int, xc):
        """Coarse level-1 -> fine level (MGTransfer prolongate)."""
        P = self.P1d[level - 1]
        return self._tensor_apply(
            P, xc, self.levels[level - 1].npts, self.levels[level].npts
        )

    def restrict(self, level: int, xf):
        """Fine level -> coarse level-1 (restrict_and_add analogue = P^T)."""
        P = self.P1d[level - 1].T
        return self._tensor_apply(
            P, xf, self.levels[level].npts, self.levels[level - 1].npts
        )

    # ------------------------------------------------------------------
    def vcycle_with(self, gdp, b):
        """One V-cycle, traceable: gdp = self.device_args threaded in as
        a jit argument by the enclosing program."""
        return self._cycle_with(gdp, len(self.levels) - 1, b)

    def vcycle(self, b):
        """Standalone jitted V-cycle of the fine-level RHS."""
        if self._vcycle_jit is None:
            L = len(self.levels) - 1
            self._vcycle_jit = jax.jit(
                lambda gdp, b_: self._cycle_with(gdp, L, b_))
        return self._vcycle_jit(self.device_args, b)

    def _cycle_with(self, gdp, l: int, b):
        lvl = self.levels[l]
        ld = gdp["levels"][l]
        if l == 0:
            return jnp.dot(gdp["coarse_inv"], b,
                           precision=jax.lax.Precision.HIGHEST)
        m = ld["mask"]
        cheb = ChebyshevParams(ld["cheb"][0], ld["cheb"][1],
                               lvl.cheb.degree)
        Af = lambda x: lvl.op.vmult_with(ld["dp"], x)
        b = m * b
        x = chebyshev_smooth(Af, ld["inv_diag"], cheb, b)
        r = m * (b - Af(x))
        rc = gdp["levels"][l - 1]["mask"] * self.restrict(l, r)
        xc = self._cycle_with(gdp, l - 1, rc)
        x = x + m * self.prolongate(l, xc)
        x = chebyshev_smooth(Af, ld["inv_diag"], cheb, b, x0=x)
        return x

    def preconditioner_with(self, gdp, b):
        """Traceable M_inv body for cg_solve (PreconditionMG analogue):
        the enclosing jit passes gdp = self.device_args as an argument."""
        L = len(self.levels) - 1
        x = self._cycle_with(gdp, L, b)
        for _ in range(self.n_cycles - 1):
            ld = gdp["levels"][L]
            r = b - self.levels[L].op.vmult_with(ld["dp"], x)
            x = x + self._cycle_with(gdp, L, r)
        return x

    def preconditioner(self) -> Callable:
        """Standalone (self-jitting) M_inv callable.  For composition
        into an enclosing jitted solve use ``preconditioner_with`` and
        thread ``device_args`` — this form would bake device constants
        into the enclosing trace."""
        if self.n_cycles == 1:
            return self.vcycle
        jitted = jax.jit(self.preconditioner_with)
        return lambda b: jitted(self.device_args, b)

    @property
    def fine(self) -> MGLevel:
        return self.levels[-1]

    # ------------------------------------------------------------------
    def resident_context(self):
        """Fine-level solver-resident V-cycle: (A, M_inv, kernel, rdp).

        The fine level dominates the V-cycle cost (~10 fine applies per
        preconditioned CG iteration: 2 Chebyshev smooths + residual +
        the outer CG vmult), so its applies run in the Pallas kernel's
        halo'd layout with zero pad/unpad (``solvers/resident.py``);
        coarser levels (8x smaller each) keep the flat path, with ONE
        unpad before restriction and ONE pad after prolongation per
        cycle.  Returns None when the fine level has no resident kernel
        (non-3D, degree with incompatible tiling, or use_pallas=False).

        ``A(rdp, gp)`` and ``m_inv(rdp, b_res)`` are traceable; the
        returned ``rdp`` pytree (halo'd mask + inverse diagonal,
        Chebyshev scalars, the flat-level device_args) must be threaded
        through the enclosing jit as an argument.
        """
        fine = self.levels[-1]
        rk = fine.mf.resident
        L = len(self.levels) - 1
        if rk is None or L == 0:
            return None
        rdp = {
            "m": rk.pad(jnp.asarray(fine.mask, rk.dt)),
            "inv_diag": rk.pad(jnp.asarray(fine.inv_diag, rk.dt)),
            "cheb": (fine.cheb.theta, fine.cheb.delta),
            "g": self.device_args,
        }
        cheb_deg = fine.cheb.degree

        if getattr(rk, "dirichlet", False):
            # mask algebra fused in-kernel (separable iota masks)
            def A(rdp_, gp):
                return rk.raw(gp)
        else:
            def A(rdp_, gp):
                m = rdp_["m"]
                return m * rk.raw(m * gp) + (1.0 - m) * gp

        def m_inv(rdp_, b_res):
            m = rdp_["m"]
            cheb = ChebyshevParams(rdp_["cheb"][0], rdp_["cheb"][1],
                                   cheb_deg)
            Af = lambda gp: A(rdp_, gp)
            b_res = m * b_res
            x = chebyshev_smooth(Af, rdp_["inv_diag"], cheb, b_res)
            r = m * (b_res - Af(x))
            gdp = rdp_["g"]
            rc = gdp["levels"][L - 1]["mask"] * self.restrict(
                L, rk.unpad(r))
            xc = self._cycle_with(gdp, L - 1, rc)
            x = x + m * rk.pad(self.prolongate(L, xc))
            return chebyshev_smooth(Af, rdp_["inv_diag"], cheb, b_res,
                                    x0=x)

        return A, m_inv, rk, rdp
