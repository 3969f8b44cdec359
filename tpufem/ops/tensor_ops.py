"""Batched sum-factorized tensor contractions (the MXU compute core).

Reference analogue: ``tensor_ops.cuh`` — ``TensorOpsShmem<dim,n,Number>``'s
1D contractions in CUDA shared memory with ``__syncthreads()`` between
directions (SURVEY.md §2 "Sum-factorization kernels", §3.4).  TPU-native
form: each 1D contraction over a *batch of cells* is one large matmul
``(ncells * n^(dim-1), n) @ (n, nq)`` that XLA tiles onto the MXU — the
cell batch is the M dimension that makes tiny (p+1)-sized contractions
MXU-efficient (SURVEY.md §7 "Small-matrix MXU utilization").

Two evaluation schemes (both in deal.II's family of tensor evaluators):
- *basis*: d contractions per gradient component (supports nq1 != n1);
- *collocation*: transform to values at quadrature points (d contractions
  with S), then differentiate in quadrature space with D_col = D S^{-1}
  (d contractions) — 2d total instead of d + d^2; requires nq1 == n1.

Data layout: local vectors are (ncells, n1^dim) with lexicographic local
ordering, x fastest; reshaped to (ncells, n_z, n_y, n_x) so the LAST tensor
axis is x.  Axis a in {0=x, 1=y, 2=z} lives at tensor dim (dim - a).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def contract_axis(u, M, axis: int, dim: int, transpose: bool = False):
    """Apply the 1D matrix M (nq, n1) along spatial axis ``axis``.

    u: (nc, m_{d-1}, ..., m_0) where the last dim is x (axis 0).
    transpose=False: out_size along that axis becomes nq (dof -> quad);
    transpose=True:  applies M^T (quad -> dof).
    """
    tdim = u.ndim - 1 - axis  # tensor dim holding spatial axis `axis`
    Mx = M.T if transpose else M
    # move target dim last, contract, move back
    u2 = jnp.moveaxis(u, tdim, -1)
    out = jnp.einsum("...i,qi->...q", u2, Mx, preferred_element_type=u.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, tdim)


def eval_gradients_basis(u, S, D, dim: int):
    """Reference-space gradients at quadrature points, basis scheme.

    u: (nc, n1^dim) -> g: (nc, dim, nq1^dim)
    """
    nc = u.shape[0]
    n1 = S.shape[1]
    nq1 = S.shape[0]
    ut = u.reshape((nc,) + (n1,) * dim)
    outs = []
    for a in range(dim):
        t = ut
        for b in range(dim):
            t = contract_axis(t, D if b == a else S, b, dim)
        outs.append(t.reshape(nc, nq1**dim))
    return jnp.stack(outs, axis=1)


def integrate_gradients_basis(g, S, D, dim: int):
    """Transpose of eval_gradients_basis: g (nc, dim, nq^dim) -> (nc, n1^dim)."""
    nc = g.shape[0]
    nq1 = S.shape[0]
    n1 = S.shape[1]
    acc = None
    for a in range(dim):
        t = g[:, a].reshape((nc,) + (nq1,) * dim)
        for b in range(dim):
            t = contract_axis(t, D if b == a else S, b, dim, transpose=True)
        acc = t if acc is None else acc + t
    return acc.reshape(nc, n1**dim)


def eval_values(u, S, dim: int):
    """Values at quadrature points: (nc, n1^dim) -> (nc, nq1^dim)."""
    nc = u.shape[0]
    n1 = S.shape[1]
    ut = u.reshape((nc,) + (n1,) * dim)
    for b in range(dim):
        ut = contract_axis(ut, S, b, dim)
    return ut.reshape(nc, -1)


def integrate_values(v, S, dim: int):
    """Transpose of eval_values: (nc, nq^dim) -> (nc, n1^dim)."""
    nc = v.shape[0]
    nq1 = S.shape[0]
    vt = v.reshape((nc,) + (nq1,) * dim)
    for b in range(dim):
        vt = contract_axis(vt, S, b, dim, transpose=True)
    return vt.reshape(nc, -1)


def eval_gradients_collocation(u, S, D_col, dim: int):
    """Collocation scheme: also returns values for free.

    u: (nc, n1^dim) -> (values (nc, nq), grads (nc, dim, nq)); nq1 == n1.
    """
    nc = u.shape[0]
    n1 = S.shape[1]
    ut = u.reshape((nc,) + (n1,) * dim)
    for b in range(dim):
        ut = contract_axis(ut, S, b, dim)
    vals = ut
    grads = [
        contract_axis(vals, D_col, a, dim).reshape(nc, -1) for a in range(dim)
    ]
    return vals.reshape(nc, -1), jnp.stack(grads, axis=1)


def integrate_collocation(v, g, S, D_col, dim: int):
    """Transpose of eval_gradients_collocation.

    v: (nc, nq) or None (submitted values), g: (nc, dim, nq) or None
    -> (nc, n1^dim)
    """
    nc = (v if v is not None else g).shape[0]
    nq1 = S.shape[0]
    acc = None
    if g is not None:
        for a in range(dim):
            t = contract_axis(
                g[:, a].reshape((nc,) + (nq1,) * dim), D_col, a, dim,
                transpose=True,
            )
            acc = t if acc is None else acc + t
    if v is not None:
        t = v.reshape((nc,) + (nq1,) * dim)
        acc = t if acc is None else acc + t
    for b in range(dim):
        acc = contract_axis(acc, S, b, dim, transpose=True)
    return acc.reshape(nc, -1)
