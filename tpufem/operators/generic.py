"""Generic matrix-free operators from user quadrature-point functors.

Reference analogue: the device-side ``FEEvaluationGpu`` API contract
(SURVEY.md §2 "FEEvaluation device API", §3.4): a local operator is
defined by what it does at each quadrature point —
``get_value``/``get_gradient`` (physical space), a user functor, then
``submit_value``/``submit_gradient`` which the framework integrates.
The reference's ``LocalLaplace`` functor is one instance; mass and
Helmholtz operators are others.

TPU-native form: the functor maps whole *batched* arrays
  (values (nc, nq) | None, grads (nc, dim, nq) | None, points, mf)
    -> (submit_values | None, submit_grads | None)
in physical space; the framework handles basis transforms, the metric
(J^-T / JxW) and gather/scatter.  Runs on any mesh via the gather-based
schemes; the specialized Laplace tiers (separable/dense/structured) remain
the fast path for the flagship operator.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpufem.ops import tensor_ops as tops
from tpufem.ops.matrix_free import MatrixFree


def _ref_to_phys_grad(mf: MatrixFree, g_ref):
    """g_phys[a] = sum_b invJ[b,a] g_ref[b]."""
    if mf.metric_kind == "cartesian":
        return g_ref * mf.inv_h[:, :, None]
    hp = jax.lax.Precision.HIGHEST
    return jnp.einsum("cqba,cbq->caq", mf.inv_jac, g_ref, precision=hp)


def _phys_to_ref_grad_weighted(mf: MatrixFree, g_phys):
    """t_ref[b] = sum_a invJ[b,a] g_phys[a] * JxW."""
    if mf.metric_kind == "cartesian":
        jxw = mf.det[:, None] * mf.w_q[None, :]
        return g_phys * mf.inv_h[:, :, None] * jxw[:, None, :]
    hp = jax.lax.Precision.HIGHEST
    gw = g_phys * mf.jxw[:, None, :]
    return jnp.einsum("cqba,caq->cbq", mf.inv_jac, gw, precision=hp)


def _jxw(mf: MatrixFree):
    if mf.metric_kind == "cartesian":
        return mf.det[:, None] * mf.w_q[None, :]
    return mf.jxw


def make_cell_operator(
    mf: MatrixFree,
    quad_op: Callable,
    needs_values: bool = True,
    needs_gradients: bool = True,
) -> Callable:
    """Raw operator u -> integral contributions (no constraint handling).

    quad_op(values, grads, mf) returns (submit_values, submit_grads) in
    physical space; either may be None.
    """
    dim = mf.config.dim

    def apply(u):
        u_loc = mf.gather(u)
        vals = grads = None
        if mf.D_col is not None:
            if needs_gradients:
                v, g_ref = tops.eval_gradients_collocation(
                    u_loc, mf.S, mf.D_col, dim
                )
                vals = v if needs_values else None
                grads = _ref_to_phys_grad(mf, g_ref)
            else:
                vals = tops.eval_values(u_loc, mf.S, dim)
        else:
            if needs_values:
                vals = tops.eval_values(u_loc, mf.S, dim)
            if needs_gradients:
                g_ref = tops.eval_gradients_basis(u_loc, mf.S, mf.D, dim)
                grads = _ref_to_phys_grad(mf, g_ref)

        sv, sg = quad_op(vals, grads, mf)

        if mf.D_col is not None:
            v_int = sv * _jxw(mf) if sv is not None else None
            g_int = _phys_to_ref_grad_weighted(mf, sg) if sg is not None \
                else None
            out = tops.integrate_collocation(v_int, g_int, mf.S, mf.D_col,
                                             dim)
        else:
            out = None
            if sv is not None:
                out = tops.integrate_values(sv * _jxw(mf), mf.S, dim)
            if sg is not None:
                gi = tops.integrate_gradients_basis(
                    _phys_to_ref_grad_weighted(mf, sg), mf.S, mf.D, dim
                )
                out = gi if out is None else out + gi
        return mf.scatter(out)

    return apply


class GenericOperator:
    """Constrained operator wrapper around a quadrature-point functor
    (the role LaplaceOperatorGpu plays for LocalLaplace, SURVEY.md §3.4)."""

    def __init__(self, mf: MatrixFree, quad_op: Callable,
                 needs_values: bool = True, needs_gradients: bool = True):
        self.mf = mf
        raw = make_cell_operator(mf, quad_op, needs_values, needs_gradients)
        self._raw = jax.jit(raw)

        def constrained(x):
            m = mf.interior_mask
            xh = mf.distribute(m * x)
            y = mf.distribute_transpose(raw(xh))
            return m * y + (1.0 - m) * x

        self._con = jax.jit(constrained)

    def vmult_raw(self, x):
        return self._raw(x)

    def vmult(self, x):
        return self._con(x)

    __call__ = vmult


# ------------------------------------------------------------------
# stock operators
def mass_operator(mf: MatrixFree, coefficient_q=None) -> GenericOperator:
    """M u: quad op = submit_value(coef * value)."""

    def qop(vals, grads, mf_):
        v = vals if coefficient_q is None else vals * coefficient_q
        return v, None

    return GenericOperator(mf, qop, needs_values=True, needs_gradients=False)


def helmholtz_operator(mf: MatrixFree, alpha=1.0, beta=1.0) -> GenericOperator:
    """(alpha M + beta K) u: submit both value and gradient."""

    def qop(vals, grads, mf_):
        sg = beta * grads
        if mf_.coef_q is not None:
            sg = sg * mf_.coef_q[:, None, :]
        return alpha * vals, sg

    return GenericOperator(mf, qop, needs_values=True, needs_gradients=True)
