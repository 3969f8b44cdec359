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
    global_1d_gradient,
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


# ---------------------------------------------------------------------
# Vector-valued fast tier: elasticity as BLOCKS of tensor products
def elasticity_separable_blocks(p, dim, nq1, n, h, mu=1.0, lam=1.0):
    """Per-block tensor-product factorization of the step-8 elasticity
    operator on a uniform Cartesian grid — EXACT (same Gauss rule as the
    quadrature path, so parity with the assembled oracle is
    rounding-level):

        Block(c,c) = (2 mu + lam) K_c + mu sum_{a != c} K_a
        Block(c,a) = mu [axis c: G^T, axis a: G, rest: M]
                   + lam [axis c: G,  axis a: G^T, rest: M]   (c != a)

    with K_b / M_b the scaled 1D stiffness/mass factors and
    G[i,j] = int phi_i' phi_j (scale-free mixed coupling,
    ``ops.separable.global_1d_gradient``).  Orientation: rows = test
    function; the mu off-diagonal term is int d_c u_a d_a v_c (trial
    derivative on axis c -> G^T there), the lam term int d_a u_a d_c v_c.

    Returns blocks[c][a] = list of terms, each ``[X_x, ..., X_{dim-1}]``
    (the ``ResidentTerms`` / ``laplace_apply_separable_terms`` contract).
    """
    h = np.asarray(h, np.float64)
    Ks, Ms = build_separable_operators(p, dim, nq1, n, h, np.float64)
    G = global_1d_gradient(p, n, nq1)
    blocks = [[None] * dim for _ in range(dim)]
    for c in range(dim):
        for a in range(dim):
            if c == a:
                terms = []
                for b in range(dim):
                    coef = (2.0 * mu + lam) if b == c else mu
                    terms.append([
                        np.asarray(coef * Ks[x]) if x == b
                        else np.asarray(Ms[x]) for x in range(dim)
                    ])
            else:
                t_mu, t_lam = [], []
                for x in range(dim):
                    if x == c:
                        t_mu.append(np.asarray(mu * G.T))
                        t_lam.append(np.asarray(lam * G))
                    elif x == a:
                        t_mu.append(np.asarray(G))
                        t_lam.append(np.asarray(G.T))
                    else:
                        t_mu.append(np.asarray(Ms[x]))
                        t_lam.append(np.asarray(Ms[x]))
                terms = [t_mu, t_lam]
            blocks[c][a] = terms
    return blocks


class SeparableElasticityOperator:
    """Elasticity at the separable tier's speed (uniform Cartesian
    grids): the generic ``VectorOperator`` runs the quadrature pipeline
    on gather-based schemes (~0.015 GDoF/s on this chip — the scatter
    floor); this tier applies the EXACT block factorization above with
    XLA dense 1D contractions, or one fused ``ResidentTerms`` Pallas
    kernel per block when ``use_pallas`` (components padded once into
    the halo'd layout; block outputs accumulate in-layout; 3 unpads).

    Constrained semantics per component: y = m A(m x) + (1 - m) x with
    the scalar interior mask (no hanging nodes on uniform grids).
    """

    def __init__(self, mf: MatrixFree, mu=1.0, lam=1.0,
                 use_pallas=False, mode="f32", interpret=False):
        if mf.metric_kind != "cartesian" or mf.has_hanging:
            raise ValueError(
                "SeparableElasticityOperator needs a uniform Cartesian "
                "mesh without hanging nodes (otherwise: "
                "operators.vector.elasticity_operator)")
        cfg = mf.config
        self.mf = mf
        d, p = cfg.dim, cfg.degree
        self.C = d
        n = int(mf.mesh.U // mf.mesh.sizes[0])
        npts = n * p + 1
        if npts**d != mf.n_dofs:
            raise ValueError("mesh is not a full uniform tensor grid")
        self.npts = npts
        self.n_dofs = mf.n_dofs
        dtype = cfg.dtype
        h = 1.0 / np.asarray(mf.host_metric.inv_h[0], np.float64)
        blocks = elasticity_separable_blocks(p, d, cfg.nq1, n, h, mu, lam)
        self.blocks = [[[np.asarray(m, dtype) for m in t] for t in blk]
                       for blk in blocks]
        self.kernels = None
        if use_pallas and d == 3:
            from tpufem.ops.pallas_separable import ResidentTerms

            try:
                self.kernels = [
                    [ResidentTerms(npts, p, blocks[c][a], dtype,
                                   mode=mode, interpret=interpret)
                     for a in range(d)]
                    for c in range(d)
                ]
            except ValueError:  # tiling does not fit: XLA path
                self.kernels = None

        if self.kernels is not None:
            k00 = self.kernels[0][0]

            def raw(x):
                pads = [k00.pad(x[a]) for a in range(d)]
                outs = []
                for c in range(d):
                    acc = None
                    for a in range(d):
                        t = self.kernels[c][a].raw(pads[a])
                        acc = t if acc is None else acc + t
                    outs.append(k00.unpad(acc))
                return jnp.stack(outs).astype(x.dtype)
        else:

            def raw(x):
                outs = []
                for c in range(d):
                    acc = None
                    for a in range(d):
                        t = laplace_apply_separable_terms(
                            x[a], d, npts, self.blocks[c][a])
                        acc = t if acc is None else acc + t
                    outs.append(acc)
                return jnp.stack(outs)

        self._raw_fn = raw
        self._raw = jax.jit(raw)

        def con(m, x):
            return m * raw(m * x) + (1.0 - m) * x

        self._con_fn = con
        self._con = jax.jit(con)

    def vmult_raw(self, x):
        """y = A x on (C, n_dofs), no constraint handling."""
        return self._raw(x)

    def vmult(self, x):
        return self._con(self.mf.interior_mask, x)

    def vmult_with(self, m, x):
        return self._con_fn(m, x)

    __call__ = vmult

    def vmult_flat(self, xf):
        return self.vmult(xf.reshape(self.C, -1)).reshape(-1)

    def diagonal(self):
        """(C, n_dofs): off-diagonal blocks never touch the global
        diagonal (component indices differ), so diag[c] is the tensor
        diagonal of Block(c,c); constrained rows get 1."""
        d = self.C
        npts = self.npts
        mask = np.asarray(self.mf.interior_mask, np.float64)
        out = []
        for c in range(d):
            total = np.zeros((npts,) * d)
            for t in self.blocks[c][c]:
                diags = [np.diag(np.asarray(t[b], np.float64))
                         for b in reversed(range(d))]
                total += reduce(np.multiply.outer, diags)
            dg = total.reshape(-1) * mask + (1.0 - mask)
            out.append(dg)
        return jnp.asarray(np.stack(out), jnp.dtype(self.mf.config.dtype))
