"""Chebyshev smoother/preconditioner (Jacobi-preconditioned).

Reference analogue: deal.II ``PreconditionChebyshev`` instantiated over
``GpuVector`` with the device diagonal — the GMG smoother of
``poisson_mg.cu`` (SURVEY.md §2 "Poisson-GMG app", §3.5: "Chebyshev
smoother: k x LaplaceOperator.vmult + diagonal scale").

The Chebyshev semi-iteration needs only operator applies and axpys — it is
the ideal TPU smoother: no dot products (no host syncs in the reference; no
cross-chip psum here), everything fuses into the vmult pipeline.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ChebyshevParams(NamedTuple):
    theta: float  # (lam_max + lam_min)/2 of D^-1 A
    delta: float  # (lam_max - lam_min)/2
    degree: int


def estimate_lambda_max(
    A: Callable, inv_diag, n: int, iters: int = 25, seed: int = 0
) -> float:
    """Largest eigenvalue of D^-1 A by power iteration (+5% safety).

    deal.II estimates with CG-Lanczos; power iteration with a safety factor
    serves the same role (the smoothing range only needs a sound upper
    bound).
    """
    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (n,), dtype=inv_diag.dtype)

    def body(_, v):
        w = inv_diag * A(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = inv_diag * A(v)
    lam = jnp.dot(v, w) / jnp.dot(v, v)
    return float(lam) * 1.05


def make_chebyshev_params(
    A: Callable,
    diag,
    n: int,
    degree: int = 4,
    smoothing_range: float = 20.0,
) -> ChebyshevParams:
    """deal.II convention: smooth eigencomponents in
    [lam_max/smoothing_range, 1.2*lam_max] of D^-1 A."""
    inv_diag = 1.0 / diag
    lam_max = estimate_lambda_max(A, inv_diag, n)
    upper = 1.2 * lam_max
    lower = lam_max / smoothing_range
    return ChebyshevParams(
        theta=0.5 * (upper + lower), delta=0.5 * (upper - lower),
        degree=degree,
    )


def chebyshev_smooth(
    A: Callable, inv_diag, params: ChebyshevParams, b, x0=None
):
    """x ~ A^-1 b after `degree` Chebyshev steps (Saad Alg. 12.1).

    With x0=None this is a linear operator in b (usable as a symmetric
    preconditioner); with x0 it smooths an existing iterate (pre/post
    smoothing in the V-cycle, SURVEY.md §3.5).
    """
    theta, delta, m = params.theta, params.delta, params.degree
    sigma1 = theta / delta
    rho0 = 1.0 / sigma1
    if x0 is None:
        r = b
        x = jnp.zeros_like(b)
    else:
        x = x0
        r = b - A(x)
    d = (1.0 / theta) * (inv_diag * r)
    x = x + d
    rho_prev, d_prev = rho0, d
    for _ in range(m - 1):
        r = b - A(x)
        rho = 1.0 / (2.0 * sigma1 - rho_prev)
        d = rho * rho_prev * d_prev + (2.0 * rho / delta) * (inv_diag * r)
        x = x + d
        rho_prev, d_prev = rho, d
    return x
