"""Newton-Krylov with AD matrix-free Jacobians: quasilinear Poisson
convergence vs manufactured solution, Newton-on-linear == CG, minimal
surface with inhomogeneous Dirichlet, hanging-node composition."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.assemble import assemble_rhs, integrate_difference
from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.generic import NonlinearOperator
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.cg import cg_solve
from tpufem.utils.config import FemConfig

RNG = np.random.default_rng(41)


def build(dim, p, refine):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p, scatter="incidence"))
    return dofs, mf


def quasilinear_qop(vals, grads, ctx):
    """-div((1 + u^2) grad u): sg = (1+u^2) grad u (nonlinear in u)."""
    return None, (1.0 + vals**2)[:, None, :] * grads


def u_exact_2d(pts):
    return np.sin(np.pi * pts[:, 0]) * np.sin(np.pi * pts[:, 1])


def f_quasilinear_2d(pts):
    """f = -(1+u^2) lap u - 2 u |grad u|^2 for the manufactured u."""
    x, y = pts[:, 0], pts[:, 1]
    sx, cx = np.sin(np.pi * x), np.cos(np.pi * x)
    sy, cy = np.sin(np.pi * y), np.cos(np.pi * y)
    u = sx * sy
    lap = -2 * np.pi**2 * u
    grad2 = np.pi**2 * (cx**2 * sy**2 + sx**2 * cy**2)
    return -(1.0 + u**2) * lap - 2.0 * u * grad2


@pytest.mark.parametrize("linear", ["cg", "gmres"])
def test_quasilinear_poisson_newton(linear):
    """Manufactured quasilinear solve: Newton converges in few steps and
    the discretization error is at the linear-Poisson level."""
    dofs, mf = build(2, 2, 4)
    op = NonlinearOperator(mf, quasilinear_qop)
    b = assemble_rhs(dofs, f_quasilinear_2d)
    res = op.solve(jnp.asarray(b), rtol=1e-11, linear=linear)
    assert bool(res.converged)
    assert int(res.iterations) <= 12
    err = integrate_difference(dofs, np.asarray(res.x), u_exact_2d)
    assert err < 5e-5


def test_quasilinear_convergence_rate():
    """L2 error of the quasilinear solve converges at O(h^{p+1}), p=2."""
    errs = []
    for refine in (2, 3, 4):
        dofs, mf = build(2, 2, refine)
        op = NonlinearOperator(mf, quasilinear_qop)
        b = assemble_rhs(dofs, f_quasilinear_2d)
        res = op.solve(jnp.asarray(b), rtol=1e-11)
        assert bool(res.converged)
        errs.append(integrate_difference(dofs, np.asarray(res.x), u_exact_2d))
    rates = (math.log2(errs[0] / errs[1]), math.log2(errs[1] / errs[2]))
    assert min(rates) > 2.7, (errs, rates)


def test_newton_on_linear_matches_cg():
    """With a LINEAR functor, Newton must reproduce the CG solution of the
    constrained Laplace system in O(1) steps (AD Jacobian == operator)."""
    dofs, mf = build(2, 2, 3)

    def linear_qop(vals, grads, ctx):
        return None, grads

    op = NonlinearOperator(mf, linear_qop, needs_values=False)
    lap = LaplaceOperator(mf)
    b = assemble_rhs(dofs, lambda pts: np.ones(len(pts)))
    interior = ~dofs.boundary_mask
    bd = jnp.asarray(np.where(interior, b, 0.0))
    ref = cg_solve(lap.vmult, bd, rtol=1e-12)
    res = op.solve(bd, rtol=1e-12, linear_rtol=1e-13)
    assert bool(res.converged)
    assert int(res.iterations) <= 2
    x1, x2 = np.asarray(ref.x), np.asarray(res.x)
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) < 1e-9


def test_minimal_surface_inhomogeneous_dirichlet():
    """Minimal surface -div(grad u / sqrt(1+|grad u|^2)) = 0 with boundary
    data g (deal.II step-15 analogue): Dirichlet values preserved exactly,
    residual driven to tolerance, maximum principle holds."""
    dofs, mf = build(2, 2, 3)

    def ms_qop(vals, grads, ctx):
        g2 = jnp.sum(grads * grads, axis=1)
        return None, grads / jnp.sqrt(1.0 + g2)[:, None, :]

    op = NonlinearOperator(mf, ms_qop, needs_values=False)
    pts = dofs.dof_coords
    g = np.sin(2 * np.pi * pts[:, 0])  # boundary data (trace of)
    u0 = np.where(dofs.boundary_mask, g, 0.0)
    b = jnp.zeros(dofs.n_dofs)
    res = op.solve(b, u0=jnp.asarray(u0), rtol=1e-10, atol=1e-12)
    assert bool(res.converged)
    x = np.asarray(res.x)
    bd = dofs.boundary_mask
    assert np.array_equal(x[bd], u0[bd])  # bit-exact Dirichlet rows
    assert x.max() <= g[bd].max() + 1e-8 and x.min() >= g[bd].min() - 1e-8


def test_quasilinear_with_hanging_nodes():
    """Quasilinear Newton on an adaptively refined mesh: hanging-node
    consistency (x == C x) and manufactured accuracy."""
    mesh = Mesh.hyper_cube(2, 3)
    centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
    mesh = mesh.refine(np.linalg.norm(centers - 0.31, axis=1) < 0.35)
    dofs = DoFHandler(mesh, 2)
    ac = make_hanging_node_constraints(dofs)
    assert len(ac.lines) > 0
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2, scatter="incidence"),
                          constraints=ac)
    op = NonlinearOperator(mf, quasilinear_qop)
    b = assemble_rhs(dofs, f_quasilinear_2d)
    res = op.solve(jnp.asarray(b), rtol=1e-11)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.allclose(x, ac.distribute(x.copy()), atol=1e-12)
    err = integrate_difference(dofs, x, u_exact_2d)
    assert err < 3e-4  # interpolation floor of this mesh is 2.05e-4


def test_newton_line_search_stall_flag():
    """ADVICE r4: when the backtracking line search exhausts ls_max
    without sufficient decrease, the step must be REJECTED (iterate
    unchanged) and the result flagged `stalled` — not silently accept a
    residual-increasing step and cycle to maxiter.  F(u) = (u0^2+1, u1)
    has no root; near the minimum of ||F|| the Newton direction is a
    huge overshoot in the rootless component, so every trial increases
    ||F||."""
    from tpufem.solvers.newton import newton_solve

    def residual(args, u):
        return jnp.stack([u[0] ** 2 + 1.0, u[1]])

    u0 = jnp.asarray([0.01, 0.5])
    res = newton_solve(residual, None, u0, rtol=1e-10, maxiter=30,
                       linear="gmres")
    assert bool(res.stalled)
    assert not bool(res.converged)
    assert int(res.iterations) <= 2  # stopped at the stall, no cycling
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_newton_eisenstat_walker_still_quadratic():
    """EW choice-2 forcing: the quasilinear solve converges in the same
    few Newton steps as tight inner solves (forcing never degrades the
    outer convergence), with strictly fewer inner Krylov iterations."""
    dofs, mf = build(2, 2, 3)
    op = NonlinearOperator(mf, quasilinear_qop)
    b = jnp.asarray(assemble_rhs(dofs, f_quasilinear_2d))
    res_ew = op.solve(b, rtol=1e-11)  # linear_rtol=None -> EW
    res_tight = op.solve(b, rtol=1e-11, linear_rtol=1e-13)
    assert bool(res_ew.converged) and bool(res_tight.converged)
    assert int(res_ew.iterations) <= int(res_tight.iterations) + 2
    assert int(res_ew.linear_iterations) < int(res_tight.linear_iterations)
    x1, x2 = np.asarray(res_ew.x), np.asarray(res_tight.x)
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x2) < 1e-8


def test_newton_jacobi_preconditioned_inner_solves():
    """M_inv plumbing (round 5): a fixed Jacobi preconditioner on the
    inner CG solves — same solution, strictly fewer inner iterations on
    a graded problem."""
    from tpufem.operators.laplace import LaplaceOperator

    dofs, mf = build(2, 2, 4)
    op = NonlinearOperator(mf, quasilinear_qop)
    b = jnp.asarray(assemble_rhs(dofs, f_quasilinear_2d))
    diag = LaplaceOperator(mf).diagonal()
    res_p = op.solve(b, rtol=1e-11, jacobi_diag=diag)
    res_u = op.solve(b, rtol=1e-11)
    assert bool(res_p.converged) and bool(res_u.converged)
    xp, xu = np.asarray(res_p.x), np.asarray(res_u.x)
    assert np.linalg.norm(xp - xu) / np.linalg.norm(xu) < 1e-8
    assert int(res_p.linear_iterations) < int(res_u.linear_iterations)
