"""Sum-of-tensor-product operators: the mass/Helmholtz fast tier.

Reference analogue: in the reference every operator of the FEEvaluation
family (LocalLaplace, mass, Helmholtz — SURVEY.md §2 "FEEvaluation
device API", §3.4) runs through the SAME fused cell-loop kernel; only
the quadrature-point functor changes, so mass and Helmholtz applies cost
what Laplace costs.  tpufem's generic-functor tier
(`operators/generic.py`) reproduces the CONTRACT on any mesh, but runs
on the gather-based schemes.  This module restores the PERFORMANCE
parity on uniform Cartesian grids: there the assembled global operators
factor exactly

    M         =  Mz (x) My (x) Mx
    alpha M + beta K
              =  beta [ Mz(x)My(x)Kx + Mz(x)Ky(x)Mx + Kz(x)My(x)Mx ]
               + alpha Mz (x) My (x) Mx

(1D matrices assembled with the same Gauss rule as the per-qpoint path,
so parity with the assembled oracle is rounding-level), which is
precisely the contract of the fused ResidentTerms Pallas kernel — the
identical machinery behind the curved-shell and variable-coefficient
fast tiers.  The implicit-Euler heat step (M + dt K) u^{n+1} = M u^n
(`apps/heat.py --resident`) rides this at flagship-class rates.

Platform rules honored: the 1D term matrices are numpy host constants
(baked into jitted programs — device closure constants D2H-hang at
lowering on this machine, docs/ROOFLINE.md round 3); the only device
array, the Dirichlet mask, enters jitted applies as an ARGUMENT.
"""

from __future__ import annotations

from functools import reduce

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.ops.matrix_free import MatrixFree, _terms_with_kernel
from tpufem.ops.separable import (
    build_separable_operators,
    laplace_apply_separable_terms,
)


def helmholtz_separable_terms(p, dim, nq1, n, h, alpha=1.0, beta=1.0):
    """Per-axis 1D factor matrices of alpha M + beta K on a uniform
    Cartesian grid (n cells per axis, physical cell widths h (dim,)).

    Returns a list of terms, each a list of dim (npts, npts) f64 numpy
    matrices in spatial-axis order (index 0 = x) — the `terms` contract
    of ``laplace_apply_separable_terms`` / ``ResidentTerms``.  beta is
    folded into the K factor of each stiffness term, alpha into the
    x factor of the mass term; dim+1 terms in full generality, dim for
    pure stiffness (alpha=0), one for pure mass (beta=0).
    """
    Ks, Ms = build_separable_operators(p, dim, nq1, n, np.asarray(h),
                                       np.float64)
    terms = []
    if beta != 0.0:
        for a in range(dim):
            terms.append([
                np.asarray(beta * Ks[b]) if b == a else np.asarray(Ms[b])
                for b in range(dim)
            ])
    if alpha != 0.0:
        terms.append([np.asarray(alpha * Ms[0])]
                     + [np.asarray(Ms[b]) for b in range(1, dim)])
    return terms


def mass_separable_terms(p, dim, nq1, n, h):
    """The assembled global mass matrix as one tensor-product term."""
    return helmholtz_separable_terms(p, dim, nq1, n, h, alpha=1.0,
                                     beta=0.0)


class TensorProductOperator:
    """Constrained operator for A = sum_a (x)_b X_ab on a uniform grid.

    The role ``GenericOperator`` plays for arbitrary functors, at the
    separable tier's speed: XLA dense 1D contractions by default, the
    fused ResidentTerms kernel (``self.resident``) when ``use_pallas``
    and the tiling fits — making it a drop-in operator for
    ``solvers.resident.resident_jacobi_cg``.

    Constrained semantics match ``LaplaceOperator``: identity on
    constrained rows/cols via the mask algebra
    y = m * A(m * x) + (1 - m) * x (no hanging nodes on uniform grids).
    """

    def __init__(self, mf: MatrixFree, terms):
        if mf.metric_kind != "cartesian":
            raise ValueError(
                "TensorProductOperator needs a uniform Cartesian mesh "
                "(curved meshes: use Mesh.separable_metric terms or the "
                "generic-functor tier)")
        if mf.has_hanging:
            raise ValueError(
                "TensorProductOperator does not handle hanging nodes "
                "(use the box tier / generic-functor tier)")
        cfg = mf.config
        self.mf = mf
        self.n_dofs = mf.n_dofs
        d, p = cfg.dim, cfg.degree
        n = int(mf.mesh.U // mf.mesh.sizes[0])
        npts = n * p + 1
        if npts**d != mf.n_dofs:
            raise ValueError("mesh is not a full uniform tensor grid")
        self.npts = npts
        dtype = cfg.dtype
        self.terms = [[np.asarray(m, dtype) for m in t] for t in terms]
        sep_ops, resident = _terms_with_kernel(
            self.terms, npts, p, d, cfg, dtype)
        self.resident = resident

        def raw(x):
            if len(sep_ops) == 3:  # fused kernel (pad/apply/unpad)
                return sep_ops[2](x)
            return laplace_apply_separable_terms(x, d, npts, self.terms)

        self._raw_fn = raw
        self._raw = jax.jit(raw)

        def con(m, x):
            return m * raw(m * x) + (1.0 - m) * x

        self._con_fn = con
        self._con = jax.jit(con)

    # ------------------------------------------------------------------
    def vmult_raw(self, x):
        """y = A x, no constraint handling (oracle comparisons)."""
        return self._raw(x)

    def vmult(self, x):
        """y = A x with identity rows/cols on constrained DoFs."""
        return self._con(self.mf.interior_mask, x)

    def vmult_with(self, m, x):
        """Traceable constrained apply (mask threaded as an argument)."""
        return self._con_fn(m, x)

    __call__ = vmult

    # ------------------------------------------------------------------
    def diagonal(self):
        """Closed-form diagonal: diag of a tensor product is the tensor
        product of the 1D diagonals, so
        diag(A) = sum_a d_{a,z} (x) d_{a,y} (x) d_{a,x} — the host
        analogue of the reference's unit-basis compute_diagonal().
        Constrained DoFs get 1 (identity rows)."""
        d = self.mf.config.dim
        npts = self.npts
        total = np.zeros((npts,) * d)
        for t in self.terms:
            # grid axis order z..x: spatial axis b sits at grid pos
            # d-1-b (see ops.separable._contract_grid)
            diags = [np.diag(np.asarray(t[b], np.float64))
                     for b in reversed(range(d))]
            total += reduce(np.multiply.outer, diags)
        diag = total.reshape(-1)
        mask = np.asarray(self.mf.interior_mask, np.float64)
        diag = diag * mask + (1.0 - mask)
        return jnp.asarray(diag, jnp.dtype(self.mf.config.dtype))


def helmholtz_tensor_operator(mf: MatrixFree, alpha=1.0,
                              beta=1.0) -> TensorProductOperator:
    """alpha M + beta K as a TensorProductOperator (the fast-tier twin
    of ``operators.generic.helmholtz_operator``)."""
    cfg = mf.config
    n = int(mf.mesh.U // mf.mesh.sizes[0])
    h = 1.0 / np.asarray(mf.host_metric.inv_h[0], np.float64)
    terms = helmholtz_separable_terms(cfg.degree, cfg.dim, cfg.nq1, n, h,
                                      alpha=alpha, beta=beta)
    return TensorProductOperator(mf, terms)


def mass_tensor_operator(mf: MatrixFree) -> TensorProductOperator:
    """M as a TensorProductOperator (fast-tier twin of
    ``operators.generic.mass_operator``)."""
    return helmholtz_tensor_operator(mf, alpha=1.0, beta=0.0)
