"""Geometric multigrid for vector-valued operators (elasticity GMG).

Reference analogue: the reference's GMG stack is scalar
(``mg_transfer_matrix_free_gpu`` + Chebyshev over the Laplace operator,
SURVEY.md §2 "GMG transfer", §3.5).  deal.II's step-8/step-16 composition
— ``Multigrid`` over an ``FESystem`` elasticity operator — has no CUDA
counterpart in the reference; this module supplies it TPU-natively:

- level operators: the multi-component ``VectorOperator`` (component
  coupling in the quadrature functor — one MXU-batched cell kernel);
- transfers: the SAME scalar 1D tensor-product embeddings, vmapped over
  the component axis (components share the scalar DoF layout, deal.II's
  FESystem block convention — prolongation acts block-diagonally);
- smoother: Chebyshev on the vector operator (dot-free, fuses into the
  apply pipeline);
- coarse solve: dense constrained inverse of the assembled elasticity
  block matrix (f64 oracle, ``fem/assemble.py::assemble_elasticity``).

Vectors are (C, n_dofs) arrays throughout; every traced entry point
threads ``device_args`` as a jit argument (platform rule — no device
closure constants)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import assemble_elasticity
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.vector import VectorOperator, elasticity_operator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.chebyshev import (
    ChebyshevParams,
    chebyshev_smooth,
    make_chebyshev_params,
)
from tpufem.solvers.multigrid import prolongation_1d
from tpufem.utils.config import FemConfig


@dataclass
class VectorMGLevel:
    mf: MatrixFree
    op: VectorOperator
    inv_diag: jnp.ndarray  # (C, n_dofs)
    cheb: ChebyshevParams
    mask: jnp.ndarray  # (n_dofs,) scalar interior mask (shared by comps)
    npts: int


class VectorMultigrid:
    """V-cycle preconditioner for elasticity over uniformly refined
    hyper_cube levels.  ``op_factory(mf) -> VectorOperator`` generalizes
    beyond elasticity; ``coarse_matrix(dofs) -> (C n, C n) ndarray``
    must assemble the matching coarse block operator."""

    def __init__(
        self,
        dim: int,
        degree: int,
        finest_refine: int,
        coarsest_refine: int = 1,
        dtype: str = "float64",
        smoother_degree: int = 4,
        mu: float = 1.0,
        lam: float = 1.0,
        n_cycles: int = 1,
        op_factory: Optional[Callable] = None,
        coarse_matrix: Optional[Callable] = None,
    ):
        if coarsest_refine > finest_refine:
            raise ValueError("coarsest_refine must be <= finest_refine")
        self.dim, self.degree = dim, degree
        self.n_cycles = n_cycles
        if op_factory is None:
            op_factory = lambda mf: elasticity_operator(mf, mu=mu, lam=lam)
        if coarse_matrix is None:
            coarse_matrix = lambda dofs: assemble_elasticity(
                dofs, mu=mu, lam=lam).toarray()
        self.levels: list[VectorMGLevel] = []
        for r in range(coarsest_refine, finest_refine + 1):
            mesh = Mesh.hyper_cube(dim, r)
            dofs = DoFHandler(mesh, degree)
            mf = MatrixFree.build(
                mesh, dofs, FemConfig(dim=dim, degree=degree, dtype=dtype,
                                      scatter="incidence"))
            op = op_factory(mf)
            C = op.n_components
            diag = op.diagonal()  # (C, n)
            cheb = make_chebyshev_params(
                lambda dp, xf, _op=op, _C=C: _op.vmult_with(
                    dp, xf.reshape(_C, -1)).reshape(-1),
                jnp.asarray(diag).reshape(-1), C * dofs.n_dofs,
                degree=smoother_degree, dp=op.device_args)
            self.levels.append(VectorMGLevel(
                mf=mf, op=op, inv_diag=1.0 / diag, cheb=cheb,
                mask=mf.interior_mask, npts=(1 << r) * degree + 1))
        self.C = self.levels[0].op.n_components
        self.P1d = [
            np.asarray(prolongation_1d(degree, 1 << r), np.dtype(dtype))
            for r in range(coarsest_refine, finest_refine)
        ]
        # coarse dense inverse on the block system; constrained rows of
        # EVERY component -> identity (flat ordering is component-major,
        # matching VectorOperator.vmult_flat)
        lvl0 = self.levels[0]
        K = coarse_matrix(lvl0.mf.dofs)
        m = np.tile(np.asarray(lvl0.mask, np.float64), self.C)
        Kc = (m[:, None] * K * m[None, :]) + np.diag(1.0 - m)
        self.coarse_inv = jnp.asarray(np.linalg.inv(Kc), jnp.dtype(dtype))
        self.device_args = {
            "coarse_inv": self.coarse_inv,
            "levels": tuple(
                {"dp": lvl.op.device_args, "inv_diag": lvl.inv_diag,
                 "mask": lvl.mask,
                 "cheb": (lvl.cheb.theta, lvl.cheb.delta)}
                for lvl in self.levels
            ),
        }

    # -- transfers: scalar tensor-product embedding per component -------
    def _tensor_apply(self, P, x, npts_in: int, npts_out: int):
        d = self.dim
        t = x.reshape((npts_in,) * d)
        for axis in range(d):
            t = jnp.moveaxis(
                jnp.einsum("fi,...i->...f", P,
                           jnp.moveaxis(t, d - 1 - axis, -1),
                           preferred_element_type=t.dtype,
                           precision=jax.lax.Precision.HIGHEST),
                -1, d - 1 - axis)
        return t.reshape(-1)

    def prolongate(self, level: int, xc):
        P = self.P1d[level - 1]
        ni = self.levels[level - 1].npts
        no = self.levels[level].npts
        return jax.vmap(lambda v: self._tensor_apply(P, v, ni, no))(xc)

    def restrict(self, level: int, xf):
        P = self.P1d[level - 1].T
        ni = self.levels[level].npts
        no = self.levels[level - 1].npts
        return jax.vmap(lambda v: self._tensor_apply(P, v, ni, no))(xf)

    # -- V-cycle ---------------------------------------------------------
    def _cycle_with(self, gdp, l: int, b):
        lvl = self.levels[l]
        ld = gdp["levels"][l]
        if l == 0:
            C = self.C
            return jnp.dot(gdp["coarse_inv"], b.reshape(-1),
                           precision=jax.lax.Precision.HIGHEST
                           ).reshape(C, -1)
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
        """Traceable M_inv for cg_solve: b and the result are (C, n)."""
        L = len(self.levels) - 1
        x = self._cycle_with(gdp, L, b)
        for _ in range(self.n_cycles - 1):
            ld = gdp["levels"][L]
            r = b - self.levels[L].op.vmult_with(ld["dp"], x)
            x = x + self._cycle_with(gdp, L, r)
        return x

    @property
    def fine(self) -> VectorMGLevel:
        return self.levels[-1]
