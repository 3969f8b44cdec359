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


def diagonal_device_hanging(mf) -> jnp.ndarray:
    """diag(C^T A C) on device (C = hanging-node resolution).

    The pair expansion is evaluated per cell as ``diag_i = B_i^T A B_i``
    where ``B[c, m, j] = sum_a W[c, j, a] [T[c, j, a] == tgt[c, m]]``
    collects the resolution weights of each DISTINCT target m the cell
    touches (compact per-cell target ids from one vectorized row-sort):
    two batched MXU einsums + two scatter-adds, instead of
    materializing the (nn*Kc)^2 pairwise-equality tensor per cell
    (which moved ~0.7 GB of HBM per 16-cell chunk and cost ~80 s at the
    3.3M-DoF adaptive flagship; this form measures ~2 s there).
    """
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
    T = np.zeros((nh, nn, Kc), dtype=np.int32)
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
    # total into target i from cell c is
    #   sum_{(j,a): T=i} sum_{(k,b): T=i} W[j,a] W[k,b] A[j,k]
    #   = B_i^T A^c B_i   with   B_i[j] = sum_{a: T[j,a]=i} W[j,a],
    # so compact the F = nn*Kc flattened resolution entries to per-cell
    # distinct-target ids (vectorized row-sort + rank inversion), build
    # B by one scatter-add, and batch the quadratic forms on the MXU.
    F = nn * Kc
    Tf = T.reshape(nh, F)
    Wf = W.reshape(nh, F).astype(dt)
    jf = np.broadcast_to(np.arange(nn, dtype=np.int32)[:, None],
                         (nn, Kc)).reshape(F)
    order = np.argsort(Tf, axis=1, kind="stable")
    Ts = np.take_along_axis(Tf, order, axis=1)
    new_t = np.concatenate(
        [np.ones((nh, 1), bool), Ts[:, 1:] != Ts[:, :-1]], axis=1)
    rank_sorted = np.cumsum(new_t, axis=1) - 1
    M = int(rank_sorted[:, -1].max()) + 1
    rank = np.empty_like(rank_sorted)
    np.put_along_axis(rank, order, rank_sorted, axis=1)
    # per-cell compact id -> global target (duplicate writes agree; the
    # zero init covers unused pad slots, which carry B rows of zeros)
    tgt = np.zeros((nh, M), dtype=np.int32)
    tgt[np.arange(nh)[:, None], rank] = Tf
    # W = 0 pad entries share the compact slot of genuine target 0 when
    # a cell touches dof 0 — they add zero weight there; cells touching
    # no dof 0 scatter a zero quadratic form into diag[0] — harmless.
    flat = ((np.arange(nh, dtype=np.int64)[:, None] * M + rank) * nn
            + jf[None, :])
    idt = np.int32 if nh * M * nn < 2**31 else np.int64
    B = (jnp.zeros(nh * M * nn, dt)
         .at[jnp.asarray(flat.reshape(-1).astype(idt))]
         .add(jnp.asarray(Wf.reshape(-1)))
         .reshape(nh, M, nn))
    A = local_matrices(mf, hsel)  # (nh, nn, nn)
    hp = jax.lax.Precision.HIGHEST
    H = jnp.einsum("cmj,cjk->cmk", B, A, precision=hp)
    vals = jnp.einsum("cmk,cmk->cm", H, B, precision=hp)
    return diag.at[jnp.asarray(tgt.reshape(-1))].add(vals.reshape(-1))
