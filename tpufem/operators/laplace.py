"""Matrix-free Laplace operator: vmult and diagonal.

Reference analogue: ``laplace_operator_gpu.h`` —
``LaplaceOperatorGpu<dim,fe_degree,Number>::vmult`` = constraint save/zero →
``cell_loop(LocalLaplace)`` → constraint restore, with the quadrature-point
functor ``submit_gradient(coef(q) * get_gradient(q), q)`` and
``compute_diagonal()`` via the unit-basis trick (SURVEY.md §2, §3.4).

TPU-native form: the whole §3.4 box is one traced function — gather,
sum-factorized contractions (MXU batched matmuls over the cell batch),
pointwise metric application, transposed contractions, race-free scatter —
fused by XLA (or handed to the fused Pallas kernel, tpufem.ops.pallas_kernels,
when config.use_pallas).  The constraint save/zero/restore mechanism of
``constraint_handler_gpu.h`` becomes pure mask algebra:
``y = mask * A(mask .* x) + (1-mask) .* x`` — identity on constrained DoFs,
keeping the operator symmetric (same semantics, zero index bookkeeping).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import cell_basis_gradients
from tpufem.ops.matrix_free import MatrixFree
from tpufem.ops import tensor_ops as tops


def _apply_metric_to_gradients(mf: MatrixFree, dp, g):
    """g (nc, d, nq) reference gradients -> submitted reference gradients
    t[b] = sum_a invJ[b,a] * jxw * coef * (sum_b' invJ[b',a] g[b'])."""
    if mf.metric_kind == "cartesian":
        # J diagonal: t[a] = inv_h[a]^2 * det * w_q * coef * g[a]
        scale = dp["inv_h"]**2 * dp["det"][:, None]  # (nc, d)
        t = g * scale[:, :, None] * dp["w_q"][None, None, :]
        if dp["coef_q"] is not None:
            t = t * dp["coef_q"][:, None, :]
        return t
    hp = jax.lax.Precision.HIGHEST
    gp = jnp.einsum("cqba,cbq->caq", dp["inv_jac"], g, precision=hp)
    w = dp["jxw"] if dp["coef_q"] is None else dp["jxw"] * dp["coef_q"]
    gp = gp * w[:, None, :]
    return jnp.einsum("cqba,caq->cbq", dp["inv_jac"], gp, precision=hp)


def laplace_cell_apply(mf: MatrixFree, dp, u_loc):
    """The per-cell-batch pipeline: evaluate -> quad op -> integrate.

    u_loc: (nc, nn) local values -> (nc, nn) local integrals.  This is the
    FEEvaluationGpu evaluate/submit_gradient/integrate sequence (SURVEY.md
    §3.4) over the whole cell batch at once.  All large device arrays
    arrive via the ``dp`` pytree (MatrixFree.device_args); the 1D shape
    matrices are host (numpy) constants.
    """
    dim = mf.config.dim
    if mf.D_col is not None:
        _, g = tops.eval_gradients_collocation(u_loc, mf.S, mf.D_col, dim)
        t = _apply_metric_to_gradients(mf, dp, g)
        return tops.integrate_collocation(None, t, mf.S, mf.D_col, dim)
    g = tops.eval_gradients_basis(u_loc, mf.S, mf.D, dim)
    t = _apply_metric_to_gradients(mf, dp, g)
    return tops.integrate_gradients_basis(t, mf.S, mf.D, dim)


def distribute_with(dp, u, homogeneous: bool = True):
    """u -> C u with the constraint tables from the dp pytree."""
    if dp.get("con") is None:
        return u
    cd, cm, cw, ci = dp["con"]
    vals = jnp.sum(cw * u[cm], axis=1)
    if not homogeneous:
        vals = vals + ci
    return u.at[cd].set(vals, unique_indices=True)


def distribute_transpose_with(dp, y):
    """y -> C^T y with the constraint tables from the dp pytree."""
    if dp.get("con") is None:
        return y
    cd, cm, cw, _ = dp["con"]
    yc = y[cd]
    y = y.at[cd].set(0.0, unique_indices=True)
    return y.at[cm.reshape(-1)].add((cw * yc[:, None]).reshape(-1))


def _scatter_with(mf: MatrixFree, dp, v_loc):
    """distribute_local_to_global via the scheme's dp arrays."""
    if mf.scheme == "colored":
        dst = jnp.zeros((mf.n_dofs,), v_loc.dtype)
        for cells in dp["colors"]:
            idx = dp["cell_dofs"][cells].reshape(-1)
            vals = v_loc[cells].reshape(-1)
            dst = dst.at[idx].add(vals, unique_indices=True)
        return dst
    flat = jnp.concatenate(
        [v_loc.reshape(-1), jnp.zeros((1,), v_loc.dtype)])
    return jnp.sum(flat[dp["incidence"]], axis=1)


class LaplaceOperator:
    """vmult-able Laplace operator with constrained-DoF identity semantics.

    ``vmult``/``vmult_raw`` are standalone jitted entry points;
    ``vmult_with``/``vmult_raw_with`` are the traceable forms for
    composition into larger programs (CG/GMG solves), which must thread
    ``device_args`` explicitly so no device array is ever captured as a
    closure constant (platform rule, see MatrixFree.device_args).
    """

    def __init__(self, mf: MatrixFree):
        self.mf = mf
        self.n_dofs = mf.n_dofs
        self.device_args = mf.device_args()
        self._vmult = jax.jit(partial(_vmult, mf))
        self._vmult_raw = jax.jit(partial(_vmult_raw, mf))

    def vmult(self, x):
        """y = A x with identity rows/cols on constrained DoFs (the
        reference's save/zero/restore around cell_loop, SURVEY.md §3.4)."""
        return self._vmult(self.device_args, x)

    def vmult_raw(self, x):
        """y = A x without any constraint handling (oracle comparisons)."""
        return self._vmult_raw(self.device_args, x)

    def vmult_with(self, dp, x):
        """Traceable constrained apply (dp = device_args passed as a jit
        argument by the enclosing program)."""
        return _vmult(self.mf, dp, x)

    def vmult_raw_with(self, dp, x):
        """Traceable raw apply."""
        return _vmult_raw(self.mf, dp, x)

    def __call__(self, x):
        return self.vmult(x)

    # ------------------------------------------------------------------
    def diagonal(self) -> jnp.ndarray:
        """Diagonal of the (constrained) operator, for Jacobi/Chebyshev.

        Uniform meshes without constraints use a host closed form of the
        reference's unit-basis trick; meshes with hanging nodes (incl. a
        variable coefficient) compute diag(C^T A C) fully on device
        (``_diagonal_device_hanging``) — the reference's device-side
        compute_diagonal(), generalized to global constraint weights.
        Constrained DoFs get 1 (identity rows).
        """
        mf = self.mf
        p, d = mf.config.degree, mf.config.dim
        if mf.has_hanging:
            from tpufem.ops.diagonal import diagonal_device_hanging

            diag = diagonal_device_hanging(mf)
            mask = mf.interior_mask
            return diag * mask + (1.0 - mask)
        G = cell_basis_gradients(p, d, mf.quad)  # (nq, nn, d) f64
        metric = mf.host_metric
        coef = (
            np.asarray(mf.coef_q, dtype=np.float64)
            if mf.coef_q is not None
            else None
        )
        if metric.kind == "cartesian":
            # sum_q G[q,j,a]^2 w_q (optionally * coef[c,q]) pre-contracted
            G2 = G**2  # (nq, nn, d)
            if coef is None:
                B = np.einsum("qja,q->ja", G2, metric.w_q)  # (nn, d)
                diag_e = np.einsum(
                    "ja,ca,c->cj", B, metric.inv_h**2, metric.det
                )
            else:
                B = np.einsum("qja,cq->cja", G2, metric.w_q[None] * coef)
                diag_e = np.einsum(
                    "cja,ca,c->cj", B, metric.inv_h**2, metric.det
                )
        else:
            w = metric.jxw if coef is None else metric.jxw * coef
            # chunk over cells to bound memory
            nc = mf.n_cells
            diag_e = np.empty((nc, G.shape[1]))
            step = max(1, int(2e7 // (G.shape[0] * G.shape[1] * d)))
            for c0 in range(0, nc, step):
                c1 = min(nc, c0 + step)
                Gp = np.einsum(
                    "cqba,qjb->cqja", metric.inv_jac[c0:c1], G
                )
                diag_e[c0:c1] = np.einsum(
                    "cqja,cqja,cq->cj", Gp, Gp, w[c0:c1]
                )
        diag = np.zeros(mf.n_dofs)
        np.add.at(diag, np.asarray(mf.cell_dofs).ravel(), diag_e.ravel())
        mask = np.asarray(mf.interior_mask, dtype=np.float64)
        diag = diag * mask + (1.0 - mask)
        return jnp.asarray(diag, jnp.dtype(mf.config.dtype))


def _vmult_raw(mf: MatrixFree, dp, x):
    if mf.scheme == "separable":
        npts = mf.uniform_n * mf.config.degree + 1
        if mf.sep_ops[0] == "terms":  # orthogonal separable metric
            if len(mf.sep_ops) == 3:  # ("terms", terms, resident kernel)
                return mf.sep_ops[2](x)
            from tpufem.ops.separable import laplace_apply_separable_terms

            return laplace_apply_separable_terms(
                x, mf.config.dim, npts, mf.sep_ops[1])
        if len(mf.sep_ops) == 3:  # (Ks, Ms, pallas_kernel)
            return mf.sep_ops[2](x)
        from tpufem.ops.separable import laplace_apply_separable

        Ks, Ms = mf.sep_ops
        return laplace_apply_separable(x, mf.config.dim, npts, Ks, Ms)
    if mf.scheme == "dense":
        from tpufem.ops.dense_local import laplace_apply_dense

        return laplace_apply_dense(
            x, mf.config.dim, mf.uniform_n, mf.config.degree, mf.dense_A
        )
    if mf.scheme == "structured":
        if mf.struct_gsym is not None:  # curved/general metric
            from tpufem.ops.structured import (
                global_interp_matrices,
                laplace_apply_global_general,
            )

            d, p = mf.config.dim, mf.config.degree
            n = mf.uniform_n
            if not hasattr(mf, "_global_EG"):
                E, Gd = global_interp_matrices(p, n, mf.S, mf.D_col)
                dtc = np.dtype(mf.config.dtype)
                mf._global_EG = ([np.asarray(E, dtc)] * d,
                                 [np.asarray(Gd, dtc)] * d)
            E_list, G_list = mf._global_EG
            return laplace_apply_global_general(
                x, d, n, p, E_list, G_list, dp["struct_gsym"])
        from tpufem.ops.structured import laplace_apply_structured

        return laplace_apply_structured(
            x, mf.config.dim, mf.uniform_n, mf.config.degree,
            mf.S, mf.D_col, mf.struct_scale, mf.struct_w,
        )
    u_loc = x[dp["cell_dofs"]]
    v_loc = laplace_cell_apply(mf, dp, u_loc)
    return _scatter_with(mf, dp, v_loc)


def _vmult(mf: MatrixFree, dp, x):
    """Constrained apply: y = m * C^T A C (m x) + (1-m) x.

    m zeroes all constrained DoFs (Dirichlet + hanging), C fills hanging
    DoFs by interpolation from their masters (resolve_hanging_nodes on
    read), C^T accumulates hanging-row results into masters (transposed
    resolution on write) — SURVEY.md §3.4."""
    m = dp["mask"]
    xh = distribute_with(dp, m * x)
    y = _vmult_raw(mf, dp, xh)
    y = distribute_transpose_with(dp, y)
    return m * y + (1.0 - m) * x
