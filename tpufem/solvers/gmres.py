"""Restarted GMRES solver for nonsymmetric operators, fully device-resident.

Reference analogue: deal.II's ``SolverGMRES`` instantiated over the device
vector (SURVEY.md §1 L5) — the standard Krylov method for nonsymmetric /
indefinite forms when BiCGStab's erratic convergence is unacceptable.

TPU-native design decisions (vs a host-driven translation):

* The WHOLE solve is nested ``lax.while_loop``s inside one jit — an outer
  loop over restart cycles, an inner Arnoldi loop — no host round-trips.
* Orthogonalization is CGS2 (classical Gram-Schmidt with one
  re-orthogonalization pass): two ``(m+1, n) @ (n,)`` matvecs per Arnoldi
  step against the fixed-size basis, instead of ``j`` sequential dots.
  MGS's sequential dots serialize on device; CGS2 is the matmul-friendly
  formulation with equivalent numerical quality, and rows ``> j`` of the
  basis are zero so the extra products contribute exact zeros.
* The Hessenberg column is rotated by the accumulated Givens rotations in a
  masked fixed-trip ``fori_loop`` (scalar ops on an ``(m+1,)`` column —
  negligible next to the operator apply).
* The restart-cycle least-squares solve is a dense masked
  ``solve_triangular`` on the m×m R factor (m ~ 30; trivial on the MXU).
* ``dot`` is injectable so the distributed path uses per-shard dot + psum
  (same contract as ``cg_solve``/``bicgstab_solve``); all dots pin HIGHEST
  precision and a fixed reduction order for run-to-run reproducibility.

Right preconditioning (``M_inv`` must be linear): the Krylov space is built
for ``A M⁻¹`` and the reported residual is the TRUE residual of the
original system.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpufem.solvers.cg import _default_dot


class GMRESResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32 scalar (total Arnoldi steps)
    residual: jnp.ndarray  # final true ||r||
    converged: jnp.ndarray  # bool: residual <= tol


def gmres_solve(
    A: Callable,
    b,
    M_inv: Optional[Callable] = None,
    x0=None,
    rtol: float = 1e-10,
    atol: float = 0.0,
    maxiter: int = 1000,
    restart: int = 30,
    dot: Callable = _default_dot,
    stall_cycles: int = 4,
) -> GMRESResult:
    """Solve A x = b with right-preconditioned restarted GMRES(m).

    ``maxiter`` counts Arnoldi steps (operator applies), not cycles.
    ``stall_cycles``: exit once no new residual minimum has been seen for
    this many restart cycles (f32 solves plateau at the rounding floor).
    The returned iterate is whatever the last completed cycle produced;
    ``converged`` reports whether the tolerance was actually met.
    """
    if M_inv is None:
        M_inv = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
    m = int(restart)
    n = b.shape[0]
    dtype = jnp.asarray(b).dtype
    eps = jnp.finfo(dtype).tiny

    bnorm = jnp.sqrt(dot(b, b))
    tol = jnp.maximum(rtol * bnorm, atol)

    def norm(v):
        return jnp.sqrt(dot(v, v))

    def arnoldi_step(t):
        """One CGS2 Arnoldi step + Givens update on the new column."""
        V, R, cs, sn, g, j, k, res, _ = t
        w = A(M_inv(V[j]))
        hp = jax.lax.Precision.HIGHEST
        # CGS2: rows > j of V are zero, so h picks up exact zeros there.
        # The basis products go through the INJECTED dot (vmapped over
        # rows): on one device XLA fuses this to the same matmul as an
        # einsum; on the distributed path each row product is the
        # owned-masked per-shard dot + psum — a raw einsum would silently
        # compute per-shard PARTIAL inner products.
        def basis_dot(wv):
            return jax.vmap(lambda vi: dot(vi, wv))(V)

        h1 = basis_dot(w)
        w = w - jnp.einsum("in,i->n", V, h1, precision=hp)
        h2 = basis_dot(w)
        w = w - jnp.einsum("in,i->n", V, h2, precision=hp)
        h = h1 + h2
        hnext = norm(w)
        # breakdown threshold is RELATIVE to the column scale ||A M^-1 v_j||
        # (rotations preserve it): rounding leaves ~eps*scale, never ~tiny
        scale = jnp.sqrt(jnp.sum(h * h) + hnext * hnext)
        bk = jnp.finfo(dtype).eps * scale
        # hnext ~ 0 (happy or degenerate breakdown): w/hnext is a noise
        # direction that can overflow and poison the later 0*V einsum
        # rows with NaN — store a zero row instead (the row is outside
        # the live mask either way)
        V = V.at[j + 1].set(jnp.where(hnext > bk,
                                      w / jnp.maximum(hnext, eps), 0.0))

        # rotate the new column by the accumulated Givens rotations
        def rot(i, hc):
            active = i < j
            hi = jnp.where(active, cs[i] * hc[i] + sn[i] * hc[i + 1], hc[i])
            hi1 = jnp.where(active, -sn[i] * hc[i] + cs[i] * hc[i + 1],
                            hc[i + 1])
            return hc.at[i].set(hi).at[i + 1].set(hi1)

        h = jax.lax.fori_loop(0, m, rot, h)
        hj = h[j]
        denom = jnp.sqrt(hj * hj + hnext * hnext)
        # degenerate column (hj ~ hnext ~ 0, e.g. the Krylov space hit
        # the operator's null space): committing it would leave a ~0
        # pivot inside the least-squares live mask and NaN the cycle's
        # iterate — instead ROLL the step BACK (j unchanged, so row j
        # stays outside `live`) and stop this cycle; the outer loop then
        # returns the last well-defined iterate
        degen = denom <= bk
        c = jnp.where(degen, 1.0, hj / jnp.maximum(denom, eps))
        s = jnp.where(degen, 0.0, hnext / jnp.maximum(denom, eps))
        cs = jnp.where(degen, cs, cs.at[j].set(c))
        sn = jnp.where(degen, sn, sn.at[j].set(s))
        h = h.at[j].set(denom)
        R = jnp.where(degen, R, R.at[:, j].set(h[:m]))
        res_new = jnp.where(degen, res, jnp.abs(-s * g[j]))
        g = jnp.where(degen, g,
                      g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j]))
        j = jnp.where(degen, j, j + 1)
        return (V, R, cs, sn, g, j, k + 1, res_new, degen)

    def cycle(x, k):
        """One restart cycle: Arnoldi to m (or convergence), then the
        least-squares update.  Returns (x_new, k_new, true_residual)."""
        r = b - A(x)
        beta = norm(r)
        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(r / jnp.maximum(beta, eps))
        R = jnp.zeros((m, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)

        def icond(t):
            j, k_, res, stop = t[5], t[6], t[7], t[8]
            ok = jnp.logical_and(j < m, k_ < maxiter)
            ok = jnp.logical_and(ok, res > tol)
            ok = jnp.logical_and(ok, ~stop)
            return jnp.logical_and(ok, jnp.isfinite(res))

        t0 = (V, R, cs, sn, g, jnp.int32(0), k, beta, jnp.asarray(False))
        V, R, cs, sn, g, j, k, _, _ = jax.lax.while_loop(
            icond, arnoldi_step, t0)

        # masked m x m triangular solve: rows >= j become identity/0 rhs
        idx = jnp.arange(m)
        live = idx < j
        mask2d = jnp.logical_and(live[:, None], live[None, :])
        R_m = jnp.where(mask2d, R, jnp.eye(m, dtype=dtype))
        g_m = jnp.where(live, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R_m, g_m, lower=False)
        hp = jax.lax.Precision.HIGHEST
        dx = jnp.einsum("in,i->n", V[:m], y, precision=hp)
        x = x + M_inv(dx)
        return x, k, norm(b - A(x))

    r0n = norm(b - A(x0))

    def ocond(s):
        rnorm, k, since_best = s[1], s[2], s[4]
        ok = jnp.logical_and(rnorm > tol, k < maxiter)
        ok = jnp.logical_and(ok, jnp.isfinite(rnorm))
        return jnp.logical_and(ok, since_best < stall_cycles)

    def obody(s):
        x, rnorm, k, rnb, sb = s
        x, k, rnorm = cycle(x, k)
        improved = rnorm < rnb
        rnb = jnp.where(improved, rnorm, rnb)
        sb = jnp.where(improved, 0, sb + 1)
        return (x, rnorm, k, rnb, sb)

    s0 = (x0, r0n, jnp.int32(0), r0n, jnp.int32(0))
    x, rnorm, k, _, _ = jax.lax.while_loop(ocond, obody, s0)
    return GMRESResult(x, k, rnorm, rnorm <= tol)
