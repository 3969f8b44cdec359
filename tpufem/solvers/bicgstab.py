"""BiCGStab solver for nonsymmetric operators, fully device-resident.

Reference analogue: the reference instantiates deal.II's Krylov templates
over ``GpuVector`` (SURVEY.md §1 L5) — CG for the SPD Laplace; the same
vector concept serves deal.II's ``SolverBicgstab`` for nonsymmetric forms
(convection-diffusion).  TPU-native form mirrors ``solvers/cg.py``: the
whole iteration is ONE ``lax.while_loop`` inside jit — no host round-trips,
fixed-order HIGHEST-precision dots (bitwise-reproducible iteration counts),
injectable ``dot`` so the distributed path can use per-shard dot + psum.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpufem.solvers.cg import _default_dot


class BiCGStabResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32 scalar (full BiCGStab steps)
    residual: jnp.ndarray  # final ||r||
    converged: jnp.ndarray  # bool: residual <= tol


def bicgstab_solve(
    A: Callable,
    b,
    M_inv: Optional[Callable] = None,
    x0=None,
    rtol: float = 1e-10,
    atol: float = 0.0,
    maxiter: int = 10000,
    dot: Callable = _default_dot,
    stall_iters: Optional[int] = None,
) -> BiCGStabResult:
    """Solve A x = b with right-preconditioned BiCGStab.

    A need not be symmetric (convection-diffusion, advection-dominated
    forms).  ``M_inv`` is applied to the search directions (right
    preconditioning), so the reported residual is the TRUE residual of
    the original system.  Breakdown (rho or omega denominators hitting
    zero) and non-finite residuals exit the loop; ``converged`` reports
    whether the tolerance was actually met.

    The mid-step convergence check (||s|| small after the alpha
    half-step) is folded into the exit condition via the updated r, which
    keeps the loop body branch-free (XLA-friendly) at the cost of at most
    one extra half-step of work.
    """
    if M_inv is None:
        M_inv = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if stall_iters is None:
        if jnp.dtype(jnp.asarray(b).dtype).itemsize >= 8:
            stall_iters = maxiter
        else:
            stall_iters = max(100, maxiter // 10)

    bnorm = jnp.sqrt(dot(b, b))
    tol = jnp.maximum(rtol * bnorm, atol)

    r0 = b - A(x0)
    rhat = r0  # fixed shadow residual
    rn0 = jnp.sqrt(dot(r0, r0))
    one = jnp.ones((), dtype=r0.dtype)
    zv = jnp.zeros_like(r0)
    # state: x, r, p, v, rho, alpha, omega, rnorm, k, rn_best, since_best
    state0 = (x0, r0, zv, zv, one, one, one, rn0, jnp.int32(0), rn0,
              jnp.int32(0))

    def cond(s):
        rnorm, k, since_best = s[7], s[8], s[10]
        ok = jnp.logical_and(rnorm > tol, k < maxiter)
        ok = jnp.logical_and(ok, jnp.isfinite(rnorm))
        return jnp.logical_and(ok, since_best < stall_iters)

    def body(s):
        x, r, p, v, rho, alpha, omega, rnorm, k, rnb, sb = s
        rho_new = dot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        ph = M_inv(p)
        v = A(ph)
        alpha = rho_new / dot(rhat, v)
        sres = r - alpha * v
        sh = M_inv(sres)
        t = A(sh)
        omega = dot(t, sres) / dot(t, t)
        x = x + alpha * ph + omega * sh
        r = sres - omega * t
        rnorm = jnp.sqrt(dot(r, r))
        improved = rnorm < rnb
        rnb = jnp.where(improved, rnorm, rnb)
        sb = jnp.where(improved, 0, sb + 1)
        return (x, r, p, v, rho_new, alpha, omega, rnorm, k + 1, rnb, sb)

    out = jax.lax.while_loop(cond, body, state0)
    x, rnorm, k = out[0], out[7], out[8]
    return BiCGStabResult(x, k, rnorm, rnorm <= tol)
