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
    stalled: jnp.ndarray  # bool: line search found no decreasing step


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
    M_inv: Optional[Callable] = None,
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

    ``M_inv``: optional traced preconditioner for the inner Krylov
    solves (a FIXED linear operator across Newton steps — e.g. the
    linear-problem diagonal or a GMG V-cycle; for "gmres" it is applied
    on the right, so no symmetry requirement).

    ``linear``: "cg" (symmetric Jacobians — gradient-form nonlinearities),
    "gmres", or "bicgstab".  ``linear_rtol=None`` enables Eisenstat-Walker
    choice-2 forcing: eta_k = gamma (||F_k||/||F_{k-1}||)^2 with gamma=0.9,
    safeguarded by eta_k >= gamma eta_{k-1}^2 whenever that is > 0.1 (so a
    slow step cannot be followed by a spuriously tight solve) and by
    eta_k >= 0.5 tol/||F_k|| (no over-solving past the outer tolerance),
    clipped to [1e-12, 0.1] — loose early solves, quadratically tightening
    near the root.

    Globalization: backtracking (halving) line search with an Armijo-style
    sufficient-decrease test on ||F||; each trial costs one residual apply
    and the accepted trial's residual vector is carried (no re-evaluation).
    If ``ls_max`` halvings find no decreasing step the step is REJECTED
    (alpha = 0), the iteration stops, and ``stalled`` is set in the result
    so callers can distinguish line-search failure from slow convergence.
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
    ew_gamma, ew_max = 0.9, 0.1

    def body(s):
        u, f, fn, fn_prev, eta_prev, k, lin_total, _ = s
        # exact Gateaux derivative of the discrete residual, by AD
        _, jvp = jax.linearize(lambda v: residual(args, v), u)

        def J(v):
            return mask * jvp(v) + (1.0 - mask) * v

        if linear_rtol is None:
            # Eisenstat-Walker choice 2 (see docstring)
            eta = ew_gamma * (fn / jnp.maximum(fn_prev, small)) ** 2
            safe = ew_gamma * eta_prev**2
            eta = jnp.where(safe > ew_max, jnp.maximum(eta, safe), eta)
            eta = jnp.maximum(eta, 0.5 * tol / jnp.maximum(fn, small))
            eta = jnp.clip(eta, 1e-12, ew_max)
        else:
            eta = jnp.asarray(linear_rtol, dtype)
        res = lin_solve(J, -f, rtol=eta, maxiter=linear_maxiter, dot=dot,
                        M_inv=M_inv)
        delta = res.x
        lin_total = lin_total + res.iterations

        # backtracking line search on ||F||; the trial's residual VECTOR
        # is carried so the accepted step needs no re-evaluation
        def trial(alpha):
            return fnorm_of(u + alpha * delta)

        one = jnp.ones((), dtype)

        def decrease_ok(alpha, fn_t):
            return jnp.logical_and(jnp.isfinite(fn_t),
                                   fn_t <= (1.0 - 1e-4 * alpha) * fn)

        def ls_cond(t):
            alpha, _, fn_t, j = t
            return jnp.logical_and(~decrease_ok(alpha, fn_t), j < ls_max)

        def ls_body(t):
            alpha, _, _, j = t
            alpha = 0.5 * alpha
            f_t, fn_t = trial(alpha)
            return (alpha, f_t, fn_t, j + 1)

        f1, fn1 = trial(one)
        alpha, f_t, fn_t, _ = jax.lax.while_loop(
            ls_cond, ls_body, (one, f1, fn1, jnp.int32(0))
        )
        # exhausted without sufficient decrease -> reject the step
        # (alpha = 0) and flag the stall; accepting a residual-increasing
        # step would let the iteration cycle without progress
        ok = decrease_ok(alpha, fn_t)
        u_new = jnp.where(ok, u + alpha * delta, u)
        f_new = jnp.where(ok, f_t, f)
        fn_new = jnp.where(ok, fn_t, fn)
        return (u_new, f_new, fn_new, fn, eta, k + 1, lin_total, ~ok)

    def cond(s):
        fn, k, stalled = s[2], s[5], s[7]
        ok = jnp.logical_and(fn > tol, k < maxiter)
        ok = jnp.logical_and(ok, jnp.isfinite(fn))
        return jnp.logical_and(ok, ~stalled)

    # eta_prev starts at ew_max so the first step's forcing is exactly
    # the cap (fn == fn_prev == ||F_0|| -> ratio 1 -> clipped to 0.1)
    s0 = (u0, f0, f0n, f0n, jnp.asarray(ew_max, dtype), jnp.int32(0),
          jnp.int32(0), jnp.asarray(False))
    u, _, fn, _, _, k, lin_total, stalled = jax.lax.while_loop(
        cond, body, s0)
    return NewtonResult(u, k, fn, fn <= tol, lin_total, stalled)
