"""Preconditioned conjugate-gradient solver, fully device-resident.

Reference analogue: deal.II ``SolverCG<GpuVector<double>>`` driven from the
host, where every dot product forces a device sync (SURVEY.md §3.3).  The
TPU-native design runs the *entire* iteration in one ``lax.while_loop``
inside jit — no host round-trips; the host gets (x, iters, residual) once at
the end.  Dot products use a fixed reduction order (single jnp.dot per
device; jax.lax.psum tree across shards via the injectable ``dot``), which
is what makes CG iteration counts bitwise-reproducible run-to-run
(BASELINE.md "bitwise-stable iteration counts").
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32 scalar
    residual: jnp.ndarray  # final ||r||
    converged: jnp.ndarray  # bool: residual <= tol (False on stall/maxiter)


def _default_dot(a, b):
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


def cg_solve(
    A: Callable,
    b,
    M_inv: Optional[Callable] = None,
    x0=None,
    rtol: float = 1e-10,
    atol: float = 0.0,
    maxiter: int = 10000,
    dot: Callable = _default_dot,
    stall_iters: Optional[int] = None,
    track_best: Optional[bool] = None,
    p_dtype=None,
) -> CGResult:
    """Solve A x = b with (optionally preconditioned) CG.

    A and M_inv are traced callables; the whole solve is one jitted
    while_loop.  ``dot`` is injectable so the distributed path can use a
    per-shard dot + psum (SURVEY.md §3.6).

    ``stall_iters``: f32 solves can plateau above rtol (residual hits the
    rounding floor); the loop exits once no new residual minimum has been
    seen for this many iterations.  Has no effect on solves that converge
    (a new minimum resets the counter).  Default: disabled for f64 (CG
    residuals are not monotone and an ill-conditioned f64 solve must be
    allowed its full maxiter budget), max(100, maxiter // 10) for
    f32/bf16.

    ``track_best``: carry the best iterate seen and return it on a
    stall/NaN exit.  Costs ~2 extra N-vector passes per iteration in a
    BLAS-1-bound loop; default = on exactly when stall detection is
    active.  With False, a stall exit returns the final iterate (same to
    leading order: the residual has plateaued at the rounding floor).

    ``p_dtype``: storage dtype for the search direction p (e.g.
    ``jnp.bfloat16`` — halves p's HBM traffic; A receives the STORED p
    and its result is upcast back).  x and r stay in b's dtype, so the
    tracked recurrence residual remains faithful to the true residual
    b - A(x) — measured: p-only bf16 storage converges to the same
    iteration count with true rel residual ~9e-6 at rtol 1e-5, while
    quantizing x/r too leaves a 4e-2 TRUE residual (docs/ROOFLINE.md).
    """
    if M_inv is None:
        M_inv = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if stall_iters is None:
        if jnp.dtype(jnp.asarray(b).dtype).itemsize >= 8:
            stall_iters = maxiter  # disabled: never triggers before maxiter
        else:
            stall_iters = max(100, maxiter // 10)
    if track_best is None:
        track_best = stall_iters < maxiter

    cdt = jnp.asarray(b).dtype
    store_p = (lambda v: v.astype(p_dtype)) if p_dtype is not None \
        else (lambda v: v)
    load_p = (lambda v: v.astype(cdt)) if p_dtype is not None \
        else (lambda v: v)

    bnorm = jnp.sqrt(dot(b, b))
    tol = jnp.maximum(rtol * bnorm, atol)

    r0 = b - load_p(A(store_p(x0)))
    z0 = M_inv(r0)
    rz0 = dot(r0, z0)
    rn0 = jnp.sqrt(dot(r0, r0))
    xb0 = (x0,) if track_best else ()
    state0 = (x0, r0, z0, store_p(z0), rz0, rn0, jnp.int32(0),
              rn0, jnp.int32(0)) + xb0
    # state: x, r, z, p, rz, rnorm, k, rn_best, since_best[, x_best]

    def cond(s):
        rnorm, k, since_best = s[5], s[6], s[8]
        ok = jnp.logical_and(rnorm > tol, k < maxiter)
        # NaN-safe: a non-finite residual also exits
        ok = jnp.logical_and(ok, jnp.isfinite(rnorm))
        return jnp.logical_and(ok, since_best < stall_iters)

    def body(s):
        x, r, z, p, rz, rnorm, k, rnb, sb = s[:9]
        v = load_p(A(p))
        pf = load_p(p)
        pv = dot(pf, v)
        alpha = rz / pv
        x = x + alpha * pf
        r = r - alpha * v
        rnorm = jnp.sqrt(dot(r, r))
        z = M_inv(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = store_p(z + beta * pf)
        improved = rnorm < rnb
        xb = ((jnp.where(improved, x, s[9]),) if track_best else ())
        rnb = jnp.where(improved, rnorm, rnb)
        sb = jnp.where(improved, 0, sb + 1)
        return (x, r, z, p, rz_new, rnorm, k + 1, rnb, sb) + xb

    out = jax.lax.while_loop(cond, body, state0)
    x, rnorm, k, rnb, sb = out[0], out[5], out[6], out[7], out[8]
    # if we exited on stall/NaN, return the best iterate seen; without the
    # best-iterate carry, keep the FINAL iterate's rnorm so residual and x
    # stay consistent (the best-seen rnb would describe a discarded x)
    use_best = jnp.logical_or(sb >= stall_iters,
                              jnp.logical_not(jnp.isfinite(rnorm)))
    if track_best:
        x = jnp.where(use_best, out[9], x)
        rnorm = jnp.where(use_best, rnb, rnorm)
    return CGResult(x, k, rnorm, rnorm <= tol)


def make_jacobi(diag) -> Callable:
    """Diagonal (Jacobi) preconditioner — the reference's
    diagonal-preconditioned CG (SURVEY.md §2 'Laplace operator')."""
    inv = 1.0 / diag
    return lambda r: inv * r


@partial(jax.jit, static_argnames=("A", "M_inv", "maxiter"))
def cg_solve_jit(A, b, M_inv=None, x0=None, rtol=1e-10, atol=0.0,
                 maxiter=10000):
    """Convenience jitted wrapper when A/M_inv are hashable callables."""
    return cg_solve(A, b, M_inv=M_inv, x0=x0, rtol=rtol, atol=atol,
                    maxiter=maxiter)
