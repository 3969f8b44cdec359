"""Dense local-operator apply: the MXU-optimal tier for moderate p.

TPU-first design note (the analogue of the reference's parallelization-
scheme choice, SURVEY.md §2 item 2/3): on CUDA, sum factorization wins
because O(d p^{d+1}) << O(p^{2d}) FLOPs per cell.  On TPU the MXU is a
128x128 systolic array: a contraction with a (p+1)-wide matrix uses ~p/128
of the array, while the FULL tensor-product local matrix (nn x nn with
nn = (p+1)^dim, e.g. 125x125 for 3D Q4) fills it almost perfectly.  At
p <= 7 in 3D the dense local apply is therefore *faster* on TPU despite
doing more FLOPs — the classic tradeoff inverts with hardware width.

Tiers:
1. uniform Cartesian + constant coefficient: ONE nn x nn matrix
   A = sum_a scale_a K_a shared by every cell — apply is a single
   (ncells, nn) @ (nn, nn) matmul between blocked gather and overlap-add.
2. per-cell Cartesian scale (adaptive meshes): d matmuls with the
   reference-cell K_a plus a per-cell weighted sum.

K_a is built with the same quadrature algebra as the oracle
(assemble.cell_basis_gradients), so parity with the assembled operator is
exact to rounding.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import cell_basis_gradients
from tpufem.fem.quadrature import Quadrature
from tpufem.ops.structured import block_all, unblock_all_add


@lru_cache(maxsize=None)
def reference_stiffness_axes(p: int, dim: int, nq1: int) -> tuple:
    """K_a[i,j] = sum_q G[q,i,a] w_q G[q,j,a] on the reference cell,
    one (nn, nn) f64 matrix per axis (unscaled)."""
    quad = Quadrature.gauss(nq1)
    G = cell_basis_gradients(p, dim, quad)  # (nq, nn, d)
    w = quad.tensor_weights(dim)
    return tuple(
        np.einsum("qi,q,qj->ij", G[:, :, a], w, G[:, :, a])
        for a in range(dim)
    )


def _blocked_to_cells(t, dim: int):
    """(nz,pz,ny,py,nx,px) -> (ncells, nn) with cells (cz,cy,cx) x-fastest
    and locals lexicographic x-fastest."""
    cell_dims = tuple(2 * k for k in range(dim))
    loc_dims = tuple(2 * k + 1 for k in range(dim))
    t = jnp.transpose(t, cell_dims + loc_dims)
    nc = int(np.prod(t.shape[:dim]))
    nn = int(np.prod(t.shape[dim:]))
    return t.reshape(nc, nn), t.shape


def _cells_to_blocked(y, shape, dim: int):
    t = y.reshape(shape)
    # inverse of the transpose above
    perm = [0] * 2 * dim
    for k in range(dim):
        perm[2 * k] = k
        perm[2 * k + 1] = dim + k
    return jnp.transpose(t, perm)


def laplace_apply_dense(u, dim: int, ns, p: int, A_local):
    """Tier-1 apply: blocked gather -> one matmul -> overlap-add.

    A_local: (nn, nn) = sum_a scale_a K_a, identical for all cells.
    """
    if isinstance(ns, int):
        ns = (ns,) * dim
    t = block_all(u, dim, ns, p)
    cells, shape = _blocked_to_cells(t, dim)
    y = jnp.dot(cells, A_local.T, preferred_element_type=cells.dtype,
                precision=jax.lax.Precision.HIGHEST)
    t = _cells_to_blocked(y, shape, dim)
    return unblock_all_add(t, dim, ns, p)


def laplace_apply_dense_masked(u, dim: int, ns, p: int, A_local,
                               mask_cells):
    """Tier-1 apply with an active-cell mask (box tier on adaptive
    forests, tpufem.ops.boxes): inactive lattice cells contribute zero.

    mask_cells: (ncells,) 0/1 in (cz, cy, cx) x-fastest order.
    """
    if isinstance(ns, int):
        ns = (ns,) * dim
    t = block_all(u, dim, ns, p)
    cells, shape = _blocked_to_cells(t, dim)
    y = jnp.dot(cells, A_local.T, preferred_element_type=cells.dtype,
                precision=jax.lax.Precision.HIGHEST)
    y = y * mask_cells[:, None]
    t = _cells_to_blocked(y, shape, dim)
    return unblock_all_add(t, dim, ns, p)


def build_dense_local_matrix(p, dim, nq1, scale, dtype) -> np.ndarray:
    """A = sum_a scale[a] * K_a as a HOST constant (numpy: embedded into
    jitted programs without the D2H-at-lowering platform hang)."""
    Ks = reference_stiffness_axes(p, dim, nq1)
    A = sum(float(scale[a]) * Ks[a] for a in range(dim))
    return np.asarray(A, dtype)
