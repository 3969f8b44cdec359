"""Matrix-free Newton-Krylov for nonlinear forms, fully device-resident.

Reference analogue: deal.II's nonlinear-solve pattern (step-15 style):
assemble the Jacobian of the quasilinear form, solve the linear system,
line-search, repeat.  On the reference's design each Newton step hand-codes
the linearized quadrature functor and re-assembles.

TPU-native design: the Jacobian is never written down.  The nonlinear
residual F(u) is a traced function (gather -> evaluate -> nonlinear
quadrature functor -> integrate -> scatter), and the Newton linearization
is ``jax.linearize`` THROUGH THE WHOLE CHAIN — the exact Gateaux derivative
of the discrete residual, computed by AD at one extra forward pass per
Krylov apply, with no hand-derived linearized functor and no assembled
matrix.  The entire Newton iteration (inner Krylov solve, backtracking line
search, Eisenstat-Walker forcing) is one ``lax.while_loop`` inside jit.

All device arrays enter via the ``args`` pytree passed as a jit ARGUMENT
(platform rule: no device closure constants; see operators/generic.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpufem.solvers.bicgstab import bicgstab_solve
from tpufem.solvers.cg import _default_dot, cg_solve
from tpufem.solvers.gmres import gmres_solve


class NewtonResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32: Newton steps taken
    residual: jnp.ndarray  # final ||F(x)||
    converged: jnp.ndarray  # bool: residual <= tol
    linear_iterations: jnp.ndarray  # int32: total inner Krylov steps


def newton_solve(
    residual: Callable,
    args,
    u0,
    mask=None,
    rtol: float = 1e-10,
    atol: float = 0.0,
    maxiter: int = 30,
    linear: str = "cg",
    linear_rtol: Optional[float] = None,
    linear_maxiter: int = 2000,
    ls_max: int = 10,
    dot: Callable = _default_dot,
) -> NewtonResult:
    """Solve F(u) = 0 by inexact Newton with an AD matrix-free Jacobian.

    ``residual(args, u)``: traced nonlinear residual; must return zero on
    constrained rows (Dirichlet handled by masking, hanging nodes by
    C/Cᵀ inside the residual).  ``args`` is an arbitrary pytree threaded
    through (device-arg pytrees, RHS vectors) — never closed over.

    ``mask``: interior mask (1 = free DoF).  The Krylov systems use
    ``J_c v = mask * J v + (1-mask) * v`` so constrained rows act as
    identity; with a masked residual the update is exactly zero there and
    Dirichlet values set in ``u0`` are preserved bit-exactly.

    ``linear``: "cg" (symmetric Jacobians — gradient-form nonlinearities),
    "gmres", or "bicgstab".  ``linear_rtol=None`` enables Eisenstat-Walker
    forcing (eta_k = clip(sqrt(||F_k||/||F_0||), 1e-12, 1e-2)): loose early
    solves, tight near the root — preserves quadratic convergence without
    over-solving the first steps.

    Globalization: backtracking (halving) line search with an Armijo-style
    sufficient-decrease test on ||F||; each trial costs one residual apply.
    """
    u0 = jnp.asarray(u0)
    dtype = u0.dtype
    if mask is None:
        mask = jnp.ones_like(u0)

    solvers = {"cg": cg_solve, "gmres": gmres_solve, "bicgstab": bicgstab_solve}
    if linear not in solvers:
        raise ValueError(f"unknown linear solver {linear!r}")
    lin_solve = solvers[linear]

    def fnorm_of(u):
        f = residual(args, u)
        return f, jnp.sqrt(dot(f, f))

    f0, f0n = fnorm_of(u0)
    tol = jnp.maximum(rtol * f0n, atol)
    small = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    def body(s):
        u, f, fn, k, lin_total = s
        # exact Gateaux derivative of the discrete residual, by AD
        _, jvp = jax.linearize(lambda v: residual(args, v), u)

        def J(v):
            return mask * jvp(v) + (1.0 - mask) * v

        if linear_rtol is None:
            eta = jnp.clip(jnp.sqrt(fn / jnp.maximum(f0n, small)),
                           1e-12, 1e-2)
        else:
            eta = linear_rtol
        res = lin_solve(J, -f, rtol=eta, maxiter=linear_maxiter, dot=dot)
        delta = res.x
        lin_total = lin_total + res.iterations

        # backtracking line search on ||F||
        def trial(alpha):
            _, t = fnorm_of(u + alpha * delta)
            return t

        one = jnp.ones((), dtype)

        def ls_cond(t):
            alpha, fn_t, j = t
            need = fn_t > (1.0 - 1e-4 * alpha) * fn
            need = jnp.logical_or(need, ~jnp.isfinite(fn_t))
            return jnp.logical_and(need, j < ls_max)

        def ls_body(t):
            alpha, _, j = t
            alpha = 0.5 * alpha
            return (alpha, trial(alpha), j + 1)

        alpha, fn_new, _ = jax.lax.while_loop(
            ls_cond, ls_body, (one, trial(one), jnp.int32(0))
        )
        u = u + alpha * delta
        f_new = residual(args, u)
        return (u, f_new, fn_new, k + 1, lin_total)

    def cond(s):
        fn, k = s[2], s[3]
        ok = jnp.logical_and(fn > tol, k < maxiter)
        return jnp.logical_and(ok, jnp.isfinite(fn))

    s0 = (u0, f0, f0n, jnp.int32(0), jnp.int32(0))
    u, _, fn, k, lin_total = jax.lax.while_loop(cond, body, s0)
    return NewtonResult(u, k, fn, fn <= tol, lin_total)
