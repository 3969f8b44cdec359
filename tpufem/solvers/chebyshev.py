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
    theta: float  # (lam_max + lam_min)/2 of D^-1 A; float OR device scalar
    delta: float  # (lam_max - lam_min)/2;           float OR device scalar
    degree: int  # always a static python int


def estimate_lambda_max(
    A: Callable, inv_diag, n: int, iters: int = 25, seed: int = 0, dp=None
):
    """Largest eigenvalue of D^-1 A by power iteration (+5% safety),
    returned as a DEVICE scalar (no host read-back: a device→host fetch
    intermittently hangs on this machine's remote-TPU runtime,
    docs/ROOFLINE.md round 3).

    A: callable(x) when dp is None, else callable(dp, x) — the dp pytree
    (e.g. ``LaplaceOperator.device_args``) is threaded through the jitted
    power iteration as an argument so no device array is captured as a
    closure constant.

    deal.II estimates with CG-Lanczos; power iteration with a safety
    factor serves the same role (the smoothing range only needs a sound
    upper bound).
    """

    def run(dp_, inv_diag_):
        key = jax.random.PRNGKey(seed)
        v = jax.random.normal(key, (n,), dtype=inv_diag_.dtype)
        Af = A if dp_ is None else (lambda x: A(dp_, x))

        def body(_, v):
            w = inv_diag_ * Af(v)
            return w / jnp.linalg.norm(w)

        v = jax.lax.fori_loop(0, iters, body, v)
        w = inv_diag_ * Af(v)
        return jnp.dot(v, w) / jnp.dot(v, v)

    return jax.jit(run)(dp, inv_diag) * 1.05


def make_chebyshev_params(
    A: Callable,
    diag,
    n: int,
    degree: int = 4,
    smoothing_range: float = 20.0,
    dp=None,
) -> ChebyshevParams:
    """deal.II convention: smooth eigencomponents in
    [lam_max/smoothing_range, 1.2*lam_max] of D^-1 A.

    theta/delta come back as DEVICE scalars; traced code must receive
    them as jit arguments (see GeometricMultigrid.device_args), never as
    closure constants.  ``degree`` stays a static python int.
    """
    inv_diag = 1.0 / diag
    lam_max = estimate_lambda_max(A, inv_diag, n, dp=dp)
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
