"""Solver-resident CG: all solver vectors live in the Pallas kernel's
halo'd layout, so every apply skips the pad/unpad passes.

Round-1 measured 1.33 ms/apply of pure pad/unpad traffic on the flagship
(docs/ROOFLINE.md "Next levers" #1); this module removes it.  The
constraint mask algebra of ``operators/laplace.py`` (y = m·A(m·x) +
(1-m)·x — the reference's constraint save/zero/restore around cell_loop,
SURVEY.md §3.4) is applied directly in the halo'd space: masks pad with
zeros, so the kernel's zero-halo invariant is preserved through every CG
update and the applies chain bit-exactly (chain parity asserted in
tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpufem.solvers.cg import CGResult, cg_solve


def _dot3(a, b):
    """Deterministic full-array dot; halo/pad entries are zero by the
    layout invariant so they contribute nothing."""
    return jnp.dot(a.reshape(-1), b.reshape(-1),
                   precision=jax.lax.Precision.HIGHEST)


# jit cache keyed on the kernel's raw callable (stable per
# ResidentSeparable instance) — a fresh closure per solve call would
# RECOMPILE the whole program every time (minutes on the flagship)
@partial(jax.jit, static_argnames=("raw", "rtol", "maxiter", "sdt",
                                   "fused_mask", "track_best"))
def _jacobi_solve(raw, m, inv_diag, bp, x0p, rtol, maxiter, sdt,
                  fused_mask=False, track_best=None):
    # bf16s kernels: the search direction is STORED in the kernel's bf16
    # layout (p_dtype) so the kernel DMAs half the bytes, but x and r
    # stay in the compute dtype — quantizing them too leaves the TRUE
    # residual b - A(x) at ~4e-2 (measured).  The kernel's OUTPUT is
    # still bf16-quantized (layout dtype), which drifts the recurrence
    # residual from the true one below ~1e-3 — so for bf16s the returned
    # residual/converged are recomputed from the TRUE residual with one
    # extra apply: bf16s solves are loose-tolerance solves that report
    # honestly.
    cdt = bp.dtype
    p_dtype = None if jnp.dtype(sdt) == cdt else jnp.dtype(sdt)
    ms = m.astype(sdt)

    if fused_mask:
        # dirichlet=True kernels apply y = m·A(m·x) + (1-m)·x in VMEM
        # (separable iota masks) — no HBM mask passes out here
        def A(gp):
            return raw(gp.astype(sdt)).astype(cdt)
    else:
        def A(gp):
            gp = gp.astype(sdt)
            return (m * raw(ms * gp).astype(cdt)
                    + (1.0 - m) * gp.astype(cdt))

    res = cg_solve(A, bp, M_inv=lambda r: inv_diag * r, x0=x0p,
                   rtol=rtol, maxiter=maxiter, dot=_dot3,
                   p_dtype=p_dtype, track_best=track_best)
    if p_dtype is None:
        return res
    rt = bp - A(res.x)
    rn = jnp.sqrt(_dot3(rt, rt))
    tol = rtol * jnp.sqrt(_dot3(bp, bp))
    return CGResult(res.x, res.iterations, rn, rn <= tol)


def resident_jacobi_cg(
    op,
    b,
    diag=None,
    rtol: float = 1e-5,
    maxiter: int = 10000,
    x0=None,
    track_best: bool | None = None,
):
    """Jacobi-preconditioned CG with solver-resident vectors.

    ``track_best``: forwarded to :func:`cg_solve` (None = its default:
    on when stall detection is active).  False drops the best-iterate
    carry — ~0.4 ms/iteration of HBM traffic on the flagship — and a
    stall exit then returns the final iterate instead.

    op: a ``LaplaceOperator`` whose MatrixFree carries a resident kernel
    (3D separable + use_pallas), or any operator carrying its own
    ``.resident`` kernel (``operators.tensor_product`` mass/Helmholtz).
    b/diag/x0 are flat (n_dofs,) vectors; the returned CGResult.x is
    flat again (one pad per input, one unpad at the end — everything in
    between stays in the halo'd layout).
    """
    rk = getattr(op, "resident", None)
    if rk is None:
        rk = op.mf.resident
    if rk is None:
        raise ValueError(
            "operator has no resident kernel (needs 3D separable scheme "
            "with use_pallas=True and a tiling-compatible degree)"
        )
    cdt = getattr(rk, "compute_dt", rk.dt)
    m = rk.pad_any(jnp.asarray(op.mf.interior_mask, cdt))
    bp = rk.pad_any(jnp.asarray(b, cdt))
    inv_diag = rk.pad_any(1.0 / jnp.asarray(
        diag if diag is not None else op.diagonal(), cdt))
    x0p = None if x0 is None else rk.pad_any(jnp.asarray(x0, cdt))

    res = _jacobi_solve(rk.raw, m, inv_diag, bp, x0p, rtol, maxiter,
                        str(jnp.dtype(rk.dt)),
                        fused_mask=getattr(rk, "dirichlet", False),
                        track_best=track_best)
    return CGResult(rk.unpad(res.x), res.iterations, res.residual,
                    res.converged)


def resident_gmg_cg(
    mg,
    b,
    rtol: float = 1e-5,
    maxiter: int = 10000,
    track_best: bool | None = None,
):
    """GMG-preconditioned CG with the fine level solver-resident.

    mg: a ``GeometricMultigrid`` whose fine level carries a resident
    kernel (``mg.resident_context()`` non-None).  b is flat (n_dofs,);
    the result is flat again.
    """
    # cache the jitted solve on the mg instance — a fresh closure per
    # call would recompile the whole V-cycle program every time.  All
    # device arrays (rdp) enter the jitted program as ARGUMENTS
    # (platform rule, see MatrixFree.device_args).
    key = (rtol, maxiter, track_best, id(mg.fine.mf.resident))
    cache = getattr(mg, "_resident_cg_cache", None)
    if cache is None or cache[0] != key:
        ctx = mg.resident_context()
        if ctx is None:
            raise ValueError(
                "multigrid fine level has no resident kernel (needs 3D "
                "use_pallas=True with a tiling-compatible degree)"
            )
        A, m_inv, rk, rdp = ctx
        solve = jax.jit(lambda rdp_, bp_: cg_solve(
            lambda gp: A(rdp_, gp), bp_,
            M_inv=lambda r: m_inv(rdp_, r),
            rtol=rtol, maxiter=maxiter, dot=_dot3,
            track_best=track_best))
        mg._resident_cg_cache = (key, solve, rk, rdp)
    _, solve, rk, rdp = mg._resident_cg_cache
    bp = rk.pad(jnp.asarray(b, rk.dt))
    res = solve(rdp, bp)
    return CGResult(rk.unpad(res.x), res.iterations, res.residual,
                    res.converged)
