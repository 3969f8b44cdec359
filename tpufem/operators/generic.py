"""Generic matrix-free operators from user quadrature-point functors.

Reference analogue: the device-side ``FEEvaluationGpu`` API contract
(SURVEY.md §2 "FEEvaluation device API", §3.4): a local operator is
defined by what it does at each quadrature point —
``get_value``/``get_gradient`` (physical space), a user functor, then
``submit_value``/``submit_gradient`` which the framework integrates.
The reference's ``LocalLaplace`` functor is one instance; mass and
Helmholtz operators are others.

TPU-native form: the functor maps whole *batched* arrays
  (values (nc, nq) | None, grads (nc, dim, nq) | None, ctx)
    -> (submit_values | None, submit_grads | None)
in physical space; the framework handles basis transforms, the metric
(J^-T / JxW) and gather/scatter.  ``ctx`` exposes the traced per-cell
data (``ctx.coef_q``) plus static config.  Runs on any mesh via the
gather-based schemes; the specialized Laplace tiers
(separable/dense/structured) remain the fast path for the flagship
operator.

All large device arrays (metric, masks, index maps) arrive via the
``dp = MatrixFree.device_args()`` pytree passed as a jit ARGUMENT —
never captured as closure constants (platform rule: device constants
force a D2H fetch at lowering that hangs on this machine's remote-TPU
runtime; docs/ROOFLINE.md round 3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from tpufem.operators.laplace import (
    _scatter_with,
    distribute_transpose_with,
    distribute_with,
)
from tpufem.ops import tensor_ops as tops
from tpufem.ops.matrix_free import MatrixFree


@dataclasses.dataclass
class QuadContext:
    """What a quadrature-point functor may read: static config plus the
    traced per-cell arrays of the current apply."""

    config: Any
    metric_kind: str
    coef_q: Any  # (nc, nq) traced array or None


def _ref_to_phys_grad(mf: MatrixFree, dp, g_ref):
    """g_phys[a] = sum_b invJ[b,a] g_ref[b]."""
    if mf.metric_kind == "cartesian":
        return g_ref * dp["inv_h"][:, :, None]
    hp = jax.lax.Precision.HIGHEST
    return jnp.einsum("cqba,cbq->caq", dp["inv_jac"], g_ref, precision=hp)


def _phys_to_ref_grad_weighted(mf: MatrixFree, dp, g_phys):
    """t_ref[b] = sum_a invJ[b,a] g_phys[a] * JxW."""
    if mf.metric_kind == "cartesian":
        jxw = dp["det"][:, None] * dp["w_q"][None, :]
        return g_phys * dp["inv_h"][:, :, None] * jxw[:, None, :]
    hp = jax.lax.Precision.HIGHEST
    gw = g_phys * dp["jxw"][:, None, :]
    return jnp.einsum("cqba,caq->cbq", dp["inv_jac"], gw, precision=hp)


def _jxw(mf: MatrixFree, dp):
    if mf.metric_kind == "cartesian":
        return dp["det"][:, None] * dp["w_q"][None, :]
    return dp["jxw"]


def make_cell_operator(
    mf: MatrixFree,
    quad_op: Callable,
    needs_values: bool = True,
    needs_gradients: bool = True,
) -> Callable:
    """Raw operator (dp, u) -> integral contributions (no constraints).

    quad_op(values, grads, ctx) returns (submit_values, submit_grads) in
    physical space; either may be None.
    """
    dim = mf.config.dim

    def apply(dp, u):
        ctx = QuadContext(config=mf.config, metric_kind=mf.metric_kind,
                          coef_q=dp["coef_q"])
        u_loc = u[dp["cell_dofs"]]
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

        sv, sg = quad_op(vals, grads, ctx)

        if mf.D_col is not None:
            v_int = sv * _jxw(mf, dp) if sv is not None else None
            g_int = _phys_to_ref_grad_weighted(mf, dp, sg) \
                if sg is not None else None
            out = tops.integrate_collocation(v_int, g_int, mf.S, mf.D_col,
                                             dim)
        else:
            out = None
            if sv is not None:
                out = tops.integrate_values(sv * _jxw(mf, dp), mf.S, dim)
            if sg is not None:
                gi = tops.integrate_gradients_basis(
                    _phys_to_ref_grad_weighted(mf, dp, sg), mf.S, mf.D, dim
                )
                out = gi if out is None else out + gi
        return _scatter_with(mf, dp, out)

    return apply


class GenericOperator:
    """Constrained operator wrapper around a quadrature-point functor
    (the role LaplaceOperatorGpu plays for LocalLaplace, SURVEY.md §3.4)."""

    def __init__(self, mf: MatrixFree, quad_op: Callable,
                 needs_values: bool = True, needs_gradients: bool = True):
        self.mf = mf
        # generic operators always gather (no specialized tier), so the
        # gather/scatter index maps ride along whatever the mf scheme is
        self.device_args = mf.device_args(include_gather=True)
        raw = make_cell_operator(mf, quad_op, needs_values, needs_gradients)
        self._raw_with = raw
        self._raw = jax.jit(raw)

        def constrained(dp, x):
            m = dp["mask"]
            xh = distribute_with(dp, m * x)
            y = distribute_transpose_with(dp, raw(dp, xh))
            return m * y + (1.0 - m) * x

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


class NonlinearOperator:
    """Nonlinear residual operator from a quadrature-point functor.

    ``quad_op`` may be NONLINEAR in values/gradients (quasilinear
    diffusion, minimal surface, p-Laplacian ...):

      F(u)_i = sum_q [ sv(u_q, grad u_q) phi_i + sg(u_q, grad u_q) .
               grad phi_i ] JxW  -  b_i      on free rows (0 elsewhere).

    ``make_cell_operator`` assumes nothing about linearity — the same
    gather/evaluate/functor/integrate/scatter chain IS the nonlinear
    residual, and the Newton Jacobian is ``jax.linearize`` through it
    (solvers/newton.py).  The reference's pattern hand-derives and
    re-assembles the linearized form each step (deal.II step-15 style,
    SURVEY.md §2 FEEvaluation API); here the linearization is exact by AD
    and stays matrix-free.

    Dirichlet values ride in the iterate (set via ``u0``); hanging-node
    rows are zero in both F and J v — a consistent singular system the
    Krylov solvers handle exactly (the iterate's hanging entries are
    refreshed by C at every residual and on the returned solution).
    """

    def __init__(self, mf: MatrixFree, quad_op: Callable,
                 needs_values: bool = True, needs_gradients: bool = True):
        self.mf = mf
        self.device_args = mf.device_args(include_gather=True)
        self._raw_with = make_cell_operator(mf, quad_op, needs_values,
                                            needs_gradients)
        self._solve_cache = {}

    def residual_with(self, a, u):
        """Traced residual for newton_solve: a = (device_args, rhs b)."""
        dp, b = a
        m = dp["mask"]
        uh = distribute_with(dp, u)
        # condense the whole residual: C^T (R(C u) - b) — the RHS's
        # hanging rows must credit their masters too
        r = distribute_transpose_with(dp, self._raw_with(dp, uh) - b)
        return m * r

    def residual(self, u, b):
        return self.residual_with((self.device_args, jnp.asarray(b)),
                                  jnp.asarray(u))

    def solve(self, b, u0=None, jacobi_diag=None, **newton_kw):
        """Newton-Krylov solve of F(u) = 0 (see solvers/newton.py for the
        keyword surface: rtol, linear="cg"|"gmres"|"bicgstab", ...).

        ``jacobi_diag``: optional (n_dofs,) diagonal used as a FIXED
        Jacobi preconditioner for every inner Krylov solve (e.g. the
        linearization's diagonal at u0, or the linear-problem diagonal
        — spectrally equivalent for coefficient-bounded quasilinear
        forms).  It rides the jitted program as an ARGUMENT (platform
        rule: no device closure constants).

        The WHOLE Newton iteration is one jitted program (cached per
        keyword set), with the operator's device arrays as jit arguments
        — eager while_loop dispatch is unusable over a remote-device
        runtime (docs/ROOFLINE.md platform rules)."""
        from tpufem.solvers.newton import newton_solve

        dp = self.device_args
        b = jnp.asarray(b, dp["mask"].dtype)
        if u0 is None:
            u0 = jnp.zeros_like(b)
        key = tuple(sorted(newton_kw.items())) + (jacobi_diag is None,)
        if key not in self._solve_cache:
            if jacobi_diag is None:

                def run(dp_, b_, u0_):
                    u0c = distribute_with(dp_, u0_)
                    res = newton_solve(self.residual_with, (dp_, b_), u0c,
                                       mask=dp_["mask"], **newton_kw)
                    return res._replace(x=distribute_with(dp_, res.x))
            else:

                def run(dp_, b_, u0_, inv_d_):
                    u0c = distribute_with(dp_, u0_)
                    res = newton_solve(self.residual_with, (dp_, b_), u0c,
                                       mask=dp_["mask"],
                                       M_inv=lambda r: inv_d_ * r,
                                       **newton_kw)
                    return res._replace(x=distribute_with(dp_, res.x))

            self._solve_cache[key] = jax.jit(run)
        args = (dp, b, jnp.asarray(u0, b.dtype))
        if jacobi_diag is not None:
            d = jnp.asarray(jacobi_diag, b.dtype)
            args += (jnp.where(d != 0, 1.0 / d, 1.0),)
        return self._solve_cache[key](*args)


# ------------------------------------------------------------------
# stock operators
def mass_operator(mf: MatrixFree, coefficient_q=None) -> GenericOperator:
    """M u: quad op = submit_value(coef * value)."""

    def qop(vals, grads, ctx):
        v = vals if coefficient_q is None else vals * coefficient_q
        return v, None

    return GenericOperator(mf, qop, needs_values=True, needs_gradients=False)


def helmholtz_operator(mf: MatrixFree, alpha=1.0, beta=1.0) -> GenericOperator:
    """(alpha M + beta K) u: submit both value and gradient."""

    def qop(vals, grads, ctx):
        sg = beta * grads
        if ctx.coef_q is not None:
            sg = sg * ctx.coef_q[:, None, :]
        return alpha * vals, sg

    return GenericOperator(mf, qop, needs_values=True, needs_gradients=True)


def convection_diffusion_operator(
    mf: MatrixFree, velocity, nu=1.0
) -> GenericOperator:
    """Nonsymmetric a(u,v) = int nu grad(u).grad(v) + (b.grad(u)) v dx.

    ``velocity``: callable ``(npts, dim) -> (npts, dim)`` evaluated at the
    quadrature points of ``mf``'s rule, or a precomputed ``(nc, dim, nq)``
    array.  The field enters the traced function as a numpy compile-time
    constant (the reference caches the coefficient at qpoints the same
    way, SURVEY.md §2 "Laplace operator"); pair with
    :func:`tpufem.solvers.bicgstab.bicgstab_solve` — CG is not applicable
    to this form.
    """
    import numpy as np

    from tpufem.fem.mapping import compute_metric

    if callable(velocity):
        gen = compute_metric(mf.mesh, mf.quad, need_points=True).to_general()
        d = mf.config.dim
        bq = velocity(gen.quad_points.reshape(-1, d)).reshape(
            mf.mesh.n_cells, -1, d
        )
        velocity_q = np.ascontiguousarray(np.moveaxis(bq, -1, 1))
    else:
        velocity_q = np.asarray(velocity)

    def qop(vals, grads, ctx):
        sv = jnp.sum(velocity_q * grads, axis=1)  # (nc, nq)
        sg = nu * grads
        if ctx.coef_q is not None:
            sg = sg * ctx.coef_q[:, None, :]
        return sv, sg

    return GenericOperator(mf, qop, needs_values=False, needs_gradients=True)
