"""Restarted GMRES: convection-diffusion solve vs scipy direct oracle,
SPD agreement with CG, restart robustness, preconditioner hookup."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from tpufem.fem.assemble import (
    assemble_convection,
    assemble_laplace,
    assemble_mass,
    assemble_rhs,
)
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.generic import convection_diffusion_operator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.cg import cg_solve, make_jacobi
from tpufem.solvers.gmres import gmres_solve
from tpufem.utils.config import FemConfig

RNG = np.random.default_rng(37)


def build(dim, p, refine):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p, scatter="incidence"))
    return dofs, mf


def velocity_2d(pts):
    return np.stack([1.0 + 0.3 * pts[:, 1], -0.5 * pts[:, 0]], axis=-1)


@pytest.mark.parametrize("restart", [30, 8])
def test_gmres_solves_convection_diffusion(restart):
    """Dirichlet convection-diffusion solve through the matrix-free
    operator vs scipy direct on the condensed system; small restart
    exercises multiple outer cycles."""
    dofs, mf = build(2, 2, 3)
    nu = 0.1
    op = convection_diffusion_operator(mf, velocity_2d, nu=nu)
    A = (nu * assemble_laplace(dofs)
         + assemble_convection(dofs, velocity_2d)).tocsr()
    b = assemble_rhs(dofs, lambda pts: np.ones(len(pts)))
    interior = ~dofs.boundary_mask
    x_ref = np.zeros(dofs.n_dofs)
    x_ref[interior] = spla.spsolve(
        A[interior][:, interior].tocsc(), b[interior]
    )
    bd = jnp.asarray(np.where(interior, b, 0.0))
    res = gmres_solve(op.vmult, bd, rtol=1e-12, maxiter=2000,
                      restart=restart)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8


def test_gmres_matches_cg_on_spd():
    """On an SPD system GMRES and CG must agree on the solution; also
    checks right preconditioning reports the TRUE residual."""
    dofs, mf = build(2, 2, 3)
    M = assemble_mass(dofs)
    b = RNG.standard_normal(dofs.n_dofs)
    diag = jnp.asarray(M.diagonal())
    Ms = jnp.asarray(M.toarray())
    A = lambda x: Ms @ x
    bj = jnp.asarray(b)
    r1 = cg_solve(A, bj, M_inv=make_jacobi(diag), rtol=1e-12)
    r2 = gmres_solve(A, bj, M_inv=make_jacobi(diag), rtol=1e-12)
    assert bool(r1.converged) and bool(r2.converged)
    x1, x2 = np.asarray(r1.x), np.asarray(r2.x)
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) < 1e-9
    # true residual check
    rn = np.linalg.norm(b - np.asarray(Ms) @ x2)
    assert abs(rn - float(r2.residual)) / max(rn, 1e-30) < 1e-3


def test_gmres_nonnormal_dense():
    """A strongly nonnormal dense system (where BiCGStab is erratic):
    GMRES(m) residual is monotone across cycles and hits the oracle."""
    n = 60
    A0 = np.triu(RNG.standard_normal((n, n))) + 3.0 * np.eye(n)
    b = RNG.standard_normal(n)
    x_ref = np.linalg.solve(A0, b)
    Ad = jnp.asarray(A0)
    res = gmres_solve(lambda x: Ad @ x, jnp.asarray(b), rtol=1e-10,
                      maxiter=500, restart=20)
    assert bool(res.converged)
    assert np.linalg.norm(np.asarray(res.x) - x_ref) < 1e-6 * np.linalg.norm(
        x_ref
    )


def test_gmres_converged_initial_guess():
    """x0 = exact solution: zero iterations, converged."""
    n = 16
    A0 = np.eye(n) * 2.0
    x_ref = RNG.standard_normal(n)
    b = A0 @ x_ref
    res = gmres_solve(lambda x: jnp.asarray(A0) @ x, jnp.asarray(b),
                      x0=jnp.asarray(x_ref), rtol=1e-8)
    assert bool(res.converged)
    assert int(res.iterations) == 0


def test_gmres_singular_operator_null_space_rhs():
    """Degenerate Arnoldi breakdown (ADVICE r4): b entirely in the null
    space of a singular A hits hj ~ hnext ~ 0 at the first step.  The
    rolled-back cycle must return the last FINITE iterate (here x0 = 0),
    not a NaN vector from a ~0 pivot inside the least-squares mask."""
    n = 12
    d = np.ones(n)
    d[-1] = 0.0
    A0 = np.diag(d)
    b = np.zeros(n)
    b[-1] = 1.0
    res = gmres_solve(lambda x: jnp.asarray(A0) @ x, jnp.asarray(b),
                      rtol=1e-10, maxiter=50)
    x = np.asarray(res.x)
    assert np.all(np.isfinite(x))
    assert not bool(res.converged)


def test_gmres_singular_operator_consistent_part():
    """Singular A, rhs with both a solvable and a null component: the
    returned iterate is finite and solves the consistent part (residual
    == the null-space component's norm, 1.0)."""
    n = 12
    d = np.ones(n)
    d[-1] = 0.0
    A0 = np.diag(d)
    b = np.zeros(n)
    b[0] = 1.0
    b[-1] = 1.0
    res = gmres_solve(lambda x: jnp.asarray(A0) @ x, jnp.asarray(b),
                      rtol=1e-10, maxiter=50)
    x = np.asarray(res.x)
    assert np.all(np.isfinite(x))
    assert abs(x[0] - 1.0) < 1e-8  # consistent part solved
    assert abs(float(res.residual) - 1.0) < 1e-8
