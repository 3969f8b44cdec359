"""Vector-valued matrix-free operators (multi-component FEEvaluation).

Reference analogue: the reference's ``FEEvaluationGpu`` is scalar
(SURVEY.md §2 "FEEvaluation device API"); deal.II's CPU counterpart takes
an ``n_components`` template parameter and the CUDA port inherited the
scalar case only.  This module closes that gap TPU-natively: a vector
field u with C components is stored block-wise as a ``(C, n_dofs)`` array
and the component axis is *folded into the cell batch* of the existing
sum-factorized machinery — every 1D contraction stays one large MXU
matmul with leading dimension C·nc·(p+1)^(d-1), which is exactly how TPU
wants more work: a bigger batch, not new kernels.

The quadrature-point functor contract mirrors ``operators/generic.py``
with a leading component axis:

    quad_op(values (C, nc, nq) | None, grads (C, nc, dim, nq) | None, ctx)
        -> (submit_values | None, submit_grads | None)

Cross-component coupling (elasticity's stress, for instance) happens in
the functor in physical space; basis transforms, the metric and
gather/scatter are vmapped over components by the framework.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tpufem.operators.generic import (
    QuadContext,
    _jxw,
    _phys_to_ref_grad_weighted,
    _ref_to_phys_grad,
)
from tpufem.operators.laplace import (
    _scatter_with,
    distribute_transpose_with,
    distribute_with,
)
from tpufem.ops import tensor_ops as tops
from tpufem.ops.matrix_free import MatrixFree


def _eval_fields(mf, dp, u_loc, needs_values, needs_gradients):
    """ONE component's local dofs (nc, nn) -> (values, physical grads)."""
    dim = mf.config.dim
    vals = grads = None
    if mf.D_col is not None:
        if needs_gradients:
            v, g_ref = tops.eval_gradients_collocation(
                u_loc, mf.S, mf.D_col, dim
            )
            vals = v if needs_values else None
            grads = _ref_to_phys_grad(mf, dp, g_ref)
        else:
            vals = tops.eval_values(u_loc, mf.S, dim)
    else:
        if needs_values:
            vals = tops.eval_values(u_loc, mf.S, dim)
        if needs_gradients:
            g_ref = tops.eval_gradients_basis(u_loc, mf.S, mf.D, dim)
            grads = _ref_to_phys_grad(mf, dp, g_ref)
    return vals, grads


def _integrate_fields(mf, dp, sv, sg):
    """ONE component's physical-space submissions -> local integrals."""
    dim = mf.config.dim
    if mf.D_col is not None:
        v_int = sv * _jxw(mf, dp) if sv is not None else None
        g_int = _phys_to_ref_grad_weighted(mf, dp, sg) \
            if sg is not None else None
        return tops.integrate_collocation(v_int, g_int, mf.S, mf.D_col, dim)
    out = None
    if sv is not None:
        out = tops.integrate_values(sv * _jxw(mf, dp), mf.S, dim)
    if sg is not None:
        gi = tops.integrate_gradients_basis(
            _phys_to_ref_grad_weighted(mf, dp, sg), mf.S, mf.D, dim
        )
        out = gi if out is None else out + gi
    return out


def _local_apply(mf, dp, quad_op, n_components, needs_values,
                 needs_gradients, u_loc):
    """Cell-local vector apply (C, nc, nn) -> (C, nc, nn): evaluate,
    functor, integrate — no gather/scatter (shared by apply + diagonal)."""
    ctx = QuadContext(config=mf.config, metric_kind=mf.metric_kind,
                      coef_q=dp["coef_q"])
    vals, grads = jax.vmap(
        lambda ul: _eval_fields(mf, dp, ul, needs_values, needs_gradients)
    )(u_loc)
    sv, sg = quad_op(vals, grads, ctx)
    if sv is None:
        sv = (None,) * n_components
    if sg is None:
        sg = (None,) * n_components
    return jnp.stack([
        _integrate_fields(mf, dp, sv[c], sg[c]) for c in range(n_components)
    ])


def make_vector_cell_operator(
    mf: MatrixFree,
    quad_op: Callable,
    n_components: int,
    needs_values: bool = True,
    needs_gradients: bool = True,
) -> Callable:
    """Raw vector operator (dp, u) -> integral contributions.

    u has shape (n_components, n_dofs); the result matches.  Components
    ride as a vmapped leading axis through the scalar eval/integrate/
    scatter building blocks (XLA folds the batch into the contractions).
    """

    def apply(dp, u):
        u_loc = u[:, dp["cell_dofs"]]  # (C, nc, nn)
        out = _local_apply(mf, dp, quad_op, n_components, needs_values,
                           needs_gradients, u_loc)
        return jnp.stack([
            _scatter_with(mf, dp, out[c]) for c in range(n_components)
        ])

    return apply


class VectorOperator:
    """Constrained vector-valued operator around a component-coupling
    quadrature functor (multi-component FEEvaluation analogue).

    Dirichlet/hanging-node constraints are the scalar tables applied per
    component (all components share the scalar DoF layout — the deal.II
    ``FESystem(FE_Q(p), C)`` block convention)."""

    def __init__(self, mf: MatrixFree, quad_op: Callable, n_components: int,
                 needs_values: bool = True, needs_gradients: bool = True):
        self.mf = mf
        self.quad_op = quad_op
        self.n_components = n_components
        self.needs_values = needs_values
        self.needs_gradients = needs_gradients
        self.device_args = mf.device_args(include_gather=True)
        raw = make_vector_cell_operator(mf, quad_op, n_components,
                                        needs_values, needs_gradients)
        self._raw_with = raw
        self._raw = jax.jit(raw)

        def constrained(dp, x):
            m = dp["mask"]
            xh = jax.vmap(lambda v: distribute_with(dp, v))(m[None] * x)
            y = jax.vmap(lambda v: distribute_transpose_with(dp, v))(
                raw(dp, xh))
            return m[None] * y + (1.0 - m[None]) * x

        self._con_with = constrained
        self._con = jax.jit(constrained)

    def vmult_raw(self, x):
        return self._raw(self.device_args, x)

    def vmult(self, x):
        return self._con(self.device_args, x)

    def vmult_with(self, dp, x):
        """Traceable constrained apply for composition into solves."""
        return self._con_with(dp, x)

    def vmult_raw_with(self, dp, x):
        return self._raw_with(dp, x)

    __call__ = vmult

    def vmult_flat(self, xf):
        """Apply on a flattened (C*n_dofs,) vector — the shape the scalar
        Krylov solvers expect; pair with ``cg_solve(op.vmult_flat, ...)``."""
        y = self.vmult(xf.reshape(self.n_components, -1))
        return y.reshape(-1)

    def diagonal(self):
        """diag[(c, i)] of the constrained operator via the unit-basis
        trick (SURVEY.md §2 "Laplace operator": apply the operator to each
        local basis vector, keep its own entry).  The unit local field
        e_{c,j} is applied on EVERY cell at once (the cell operator is
        block-diagonal over cells), so the cost is C·(p+1)^dim cell-local
        applies — a one-time setup cost.  Constrained rows get 1
        (identity semantics).  Returns (C, n_dofs)."""
        mf = self.mf
        dp = self.device_args
        nn = mf.cell_dofs.shape[1]
        C = self.n_components

        @jax.jit
        def column(c, j):
            u_loc = jnp.zeros((C, mf.n_cells, nn), mf.S.dtype)
            u_loc = u_loc.at[c, :, j].set(1.0)
            out = _local_apply(mf, dp, self.quad_op, C, self.needs_values,
                               self.needs_gradients, u_loc)
            return out[c, :, j]  # (nc,)

        cells = jnp.asarray(mf.cell_dofs).reshape(-1)
        entries = []
        for c in range(C):
            cols = jnp.stack([column(c, j) for j in range(nn)], axis=1)
            d = jnp.zeros((mf.n_dofs,), cols.dtype)
            entries.append(d.at[cells].add(cols.reshape(-1)))
        diag = jnp.stack(entries)
        m = dp["mask"]
        return m[None] * diag + (1.0 - m[None])


def elasticity_qop(dim: int, mu=1.0, lam=1.0) -> Callable:
    """The step-8 stress functor, reusable by the single-device
    ``VectorOperator`` and the distributed vector operator alike:
    submit_grad[c] = sigma(u)[c,:] with sigma = 2 mu eps + lam tr I."""

    def qop(vals, grads, ctx):
        # grads: (C=dim, nc, dim, nq); eps[c,:,a,:] = (d_a u_c + d_c u_a)/2
        eps = 0.5 * (grads + jnp.swapaxes(grads, 0, 2))
        tr = jnp.einsum("anaq->nq", grads)
        eye = jnp.eye(dim, dtype=grads.dtype)[:, None, :, None]
        sg = 2.0 * mu * eps + lam * tr[None, :, None, :] * eye
        return None, sg

    return qop


def elasticity_operator(mf: MatrixFree, mu=1.0, lam=1.0) -> VectorOperator:
    """Linear elasticity a(u,v) = int 2 mu eps(u):eps(v)
    + lam (div u)(div v) dx — the deal.II step-8 form, as a
    component-coupling quadrature functor (``elasticity_qop``).

    SPD for mu > 0, lam >= 0 under Dirichlet constraints — solve with
    ``cg_solve(op.vmult_flat, ...)``."""
    dim = mf.config.dim
    return VectorOperator(mf, elasticity_qop(dim, mu, lam),
                          n_components=dim,
                          needs_values=False, needs_gradients=True)
