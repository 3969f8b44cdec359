"""Elasticity GMG: V-cycle-preconditioned CG with mesh-independent
iteration counts, parity with the Jacobi-CG solution, and manufactured
convergence through the preconditioned solve."""

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import assemble_rhs, integrate_difference
from tpufem.solvers.cg import cg_solve, make_jacobi
from tpufem.solvers.vector_multigrid import VectorMultigrid

RNG = np.random.default_rng(23)
MU, LAM = 0.8, 1.7


def _fdot(a, b):
    return jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST)


def gmg_solve(mg, b, rtol=1e-10):
    fine = mg.fine
    res = cg_solve(
        lambda v: fine.op.vmult_with(fine.op.device_args, v),
        jnp.asarray(b),
        M_inv=lambda r: mg.preconditioner_with(mg.device_args, r),
        rtol=rtol, maxiter=500, dot=_fdot)
    return res


def random_rhs(mg):
    mask = np.asarray(mg.fine.mask)
    n = mask.shape[0]
    return np.stack([mask * RNG.standard_normal(n)
                     for _ in range(mg.C)])


def test_elasticity_gmg_mesh_independent_iterations():
    """The deal.II GMG promise: iteration counts do not grow with
    refinement (vs Jacobi's ~2x per level)."""
    iters = {}
    for refine in (2, 3):
        mg = VectorMultigrid(2, 2, finest_refine=refine,
                             coarsest_refine=1, mu=MU, lam=LAM)
        res = gmg_solve(mg, random_rhs(mg))
        assert bool(res.converged)
        iters[refine] = int(res.iterations)
    assert iters[3] <= iters[2] + 2
    assert iters[3] <= 25


def test_elasticity_gmg_matches_jacobi_solution():
    mg = VectorMultigrid(2, 2, finest_refine=3, coarsest_refine=1,
                         mu=MU, lam=LAM)
    fine = mg.fine
    b = random_rhs(mg)
    res_g = gmg_solve(mg, b)
    res_j = cg_solve(
        lambda v: fine.op.vmult_with(fine.op.device_args, v),
        jnp.asarray(b), M_inv=make_jacobi(1.0 / fine.inv_diag),
        rtol=1e-10, maxiter=2000, dot=_fdot)
    assert bool(res_g.converged) and bool(res_j.converged)
    assert int(res_g.iterations) < int(res_j.iterations)
    xg, xj = np.asarray(res_g.x), np.asarray(res_j.x)
    assert np.linalg.norm(xg - xj) / np.linalg.norm(xj) <= 1e-8


def test_elasticity_gmg_manufactured_convergence():
    """u = (sin(pi x) sin(pi y), x(1-x)y(1-y)): each refinement divides
    the L2 error by ~2^(p+1)."""

    def u0(pts):
        return np.sin(np.pi * pts[:, 0]) * np.sin(np.pi * pts[:, 1])

    def u1(pts):
        x, y = pts[:, 0], pts[:, 1]
        return x * (1 - x) * y * (1 - y)

    def rhs_c(c, pts):
        # f = -div sigma(u) for the manufactured u, MU/LAM
        x, y = pts[:, 0], pts[:, 1]
        sx, sy = np.sin(np.pi * x), np.sin(np.pi * y)
        cx, cy = np.cos(np.pi * x), np.cos(np.pi * y)
        pi = np.pi
        if c == 0:
            # u0 = sx sy; u1 = x(1-x)y(1-y)
            u0xx = -pi**2 * sx * sy
            u0yy = -pi**2 * sx * sy
            u1xy = (1 - 2 * x) * (1 - 2 * y)
            return -((2 * MU + LAM) * u0xx + MU * u0yy
                     + (MU + LAM) * u1xy)
        u1xx = -2 * y * (1 - y)
        u1yy = -2 * x * (1 - x)
        u0xy = pi**2 * cx * cy
        return -((2 * MU + LAM) * u1yy + MU * u1xx + (MU + LAM) * u0xy)

    errs = []
    for refine in (2, 3):
        mg = VectorMultigrid(2, 2, finest_refine=refine,
                             coarsest_refine=1, mu=MU, lam=LAM)
        dofs = mg.fine.mf.dofs
        mask = np.asarray(mg.fine.mask)
        b = np.stack([
            mask * assemble_rhs(dofs, lambda p, c=c: rhs_c(c, p))
            for c in range(2)])
        res = gmg_solve(mg, b, rtol=1e-12)
        assert bool(res.converged)
        x = np.asarray(res.x)
        e = np.sqrt(
            integrate_difference(dofs, x[0], u0) ** 2
            + integrate_difference(dofs, x[1], u1) ** 2)
        errs.append(e)
    rate = np.log2(errs[0] / errs[1])
    assert rate > 2.5  # p=2 -> O(h^3)
