"""Device-side operator diagonal, including hanging nodes x coefficient.

Reference analogue: ``LaplaceOperatorGpu::compute_diagonal()`` via the
unit-basis trick (SURVEY.md §2 "Laplace operator").  The TPU form
evaluates the per-cell quadratic forms in closed form on device:

- cells WITHOUT hanging-constrained local DoFs contribute
  ``diag_e[c, j] = sum_q w |J^-T grad phi_j|^2`` (coefficient folded into
  ``w``), scattered race-free through the incidence map;
- cells WITH hanging locals contribute through the exact pair expansion
  of ``diag(C^T A C)``: with per-local resolution lists
  ``C e_j = sum_a W[j,a] e_{T[j,a]}`` (identity for unconstrained locals,
  master/weight lists for hanging ones),

      diag_i += sum_{j,k,a,b} W[j,a] W[k,b] A^c[j,k]
                [T[j,a] == T[k,b] == i]

  evaluated on device from the cells' local matrices
  ``A^c = G^T W_c G``.  This is exact for arbitrary (closed) constraint
  chains — unlike in-cell-only resolution tricks — because every A entry
  lives in some cell's local matrix and is expanded exactly once.

All index bookkeeping is small host numpy over the O(interface) hanging
cell set; the arithmetic (local matrices, pair products, scatters) runs
on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import cell_basis_gradients


def _quad_weights(mf, cells=None):
    """(nc_sel, nq) total quadrature weights w = JxW * coef on device."""
    if mf.metric_kind == "cartesian":
        det = mf.det if cells is None else mf.det[cells]
        w = det[:, None] * mf.w_q[None, :]
    else:
        w = mf.jxw if cells is None else mf.jxw[cells]
    if mf.coef_q is not None:
        cq = mf.coef_q if cells is None else mf.coef_q[cells]
        w = w * cq
    return w


def cell_diag_entries(mf) -> jnp.ndarray:
    """(nc, nn) unconstrained local diagonals on device."""
    G = jnp.asarray(
        cell_basis_gradients(mf.config.degree, mf.config.dim, mf.quad),
        mf.S.dtype,
    )  # (nq, nn, d)
    w = _quad_weights(mf)
    if mf.metric_kind == "cartesian":
        s = mf.inv_h**2  # (nc, d)
        return jnp.einsum("qja,ca,cq->cj", G**2, s, w,
                          precision=jax.lax.Precision.HIGHEST)
    Gp = jnp.einsum("cqba,qjb->cqja", mf.inv_jac, G,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("cqja,cqja,cq->cj", Gp, Gp, w,
                      precision=jax.lax.Precision.HIGHEST)


def local_matrices(mf, cells: np.ndarray) -> jnp.ndarray:
    """(len(cells), nn, nn) local stiffness matrices on device."""
    G = jnp.asarray(
        cell_basis_gradients(mf.config.degree, mf.config.dim, mf.quad),
        mf.S.dtype,
    )
    cells_j = jnp.asarray(cells)
    w = _quad_weights(mf, cells_j)
    hp = jax.lax.Precision.HIGHEST
    if mf.metric_kind == "cartesian":
        s = mf.inv_h[cells_j] ** 2  # (nh, d)
        return jnp.einsum("qja,qka,ca,cq->cjk", G, G, s, w, precision=hp)
    Gp = jnp.einsum("cqba,qjb->cqja", mf.inv_jac[cells_j], G, precision=hp)
    return jnp.einsum("cqja,cqka,cq->cjk", Gp, Gp, w, precision=hp)


def diagonal_device(mf) -> jnp.ndarray:
    """Unconstrained-operator diagonal diag(A), fully on device."""
    return mf.scatter_incidence(cell_diag_entries(mf))


def diagonal_device_hanging(mf, chunk: int = 16) -> jnp.ndarray:
    """diag(C^T A C) on device (C = hanging-node resolution)."""
    assert mf.has_hanging
    nn = mf.dofs.cell_dofs.shape[1]
    cd = np.asarray(mf.dofs.cell_dofs)
    con = np.asarray(mf.con_dofs)
    masters = np.asarray(mf.con_masters)  # (ncon, K)
    weights = np.asarray(mf.con_weights)
    K = masters.shape[1]

    r_of = np.full(mf.n_dofs, -1, dtype=np.int64)
    r_of[con] = np.arange(len(con))
    rh = r_of[cd]  # (nc, nn), -1 = unconstrained local
    has_h = (rh >= 0).any(axis=1)
    hsel = np.nonzero(has_h)[0]

    # ---- plain cells: local diagonals, hanging cells masked out --------
    de = cell_diag_entries(mf)
    plain = jnp.asarray((~has_h).astype(np.asarray(de).dtype))
    diag = mf.scatter_incidence(de * plain[:, None])
    if len(hsel) == 0:
        return diag

    # ---- hanging cells: exact pair expansion ---------------------------
    # per-local resolution lists, padded to Kc = K + 1:
    #   unconstrained j: [(dof_j, 1)]; hanging j: [(master_a, w_a)...]
    Kc = K + 1
    nh = len(hsel)
    T = np.zeros((nh, nn, Kc), dtype=np.int64)
    W = np.zeros((nh, nn, Kc))
    rhs_ = rh[hsel]
    cds = cd[hsel]
    un = rhs_ < 0
    T[:, :, 0] = np.where(un, cds, 0)
    W[:, :, 0] = un.astype(np.float64)
    safe = np.where(rhs_ >= 0, rhs_, 0)
    T[:, :, 1:] = np.where((rhs_ >= 0)[:, :, None], masters[safe], 0)
    W[:, :, 1:] = np.where((rhs_ >= 0)[:, :, None], weights[safe], 0.0)

    dt = np.asarray(de).dtype
    T_j = jnp.asarray(T)
    W_j = jnp.asarray(W.astype(dt))
    A = local_matrices(mf, hsel)  # (nh, nn, nn)

    def pair_chunk(diag, sl):
        Tc = T_j[sl]  # (m, nn, Kc)
        Wc = W_j[sl]
        Ac = A[sl]
        # contrib[c, j, a] = sum_{k, b} W[j,a] W[k,b] A[j,k]
        #                    [T[j,a] == T[k,b]]
        E = (Tc[:, :, None, :, None] == Tc[:, None, :, None, :])
        P = (Wc[:, :, None, :, None] * Wc[:, None, :, None, :]
             * Ac[:, :, :, None, None] * E)
        val = jnp.sum(P, axis=(2, 4))  # (m, nn, Kc)
        return diag.at[Tc.reshape(-1)].add(val.reshape(-1))

    for c0 in range(0, nh, chunk):
        diag = pair_chunk(diag, slice(c0, min(nh, c0 + chunk)))
    # pad entries (W = 0) accumulated zeros at index 0 — harmless; but the
    # unconstrained-local contributions of hanging cells are INCLUDED in
    # the pair expansion (their (j, 0) self-pairs), so nothing is missing.
    return diag
