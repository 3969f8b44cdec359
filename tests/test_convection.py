"""Nonsymmetric operators + BiCGStab: convection-diffusion vs assembled
oracle, BiCGStab vs scipy direct solve, CG-equivalence on SPD systems."""

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
from tpufem.solvers.bicgstab import bicgstab_solve
from tpufem.solvers.cg import cg_solve, make_jacobi
from tpufem.utils.config import FemConfig

RNG = np.random.default_rng(23)


def build(dim, p, refine):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p, scatter="incidence"))
    return dofs, mf


def velocity_2d(pts):
    return np.stack([1.0 + 0.3 * pts[:, 1], -0.5 * pts[:, 0]], axis=-1)


def velocity_3d(pts):
    return np.stack(
        [1.0 + 0.2 * pts[:, 2], 0.4 * pts[:, 0], -0.3 * pts[:, 1]], axis=-1
    )


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 3), (3, 2)])
def test_convection_diffusion_parity(dim, p):
    dofs, mf = build(dim, p, 3 if dim == 2 else 2)
    vel = velocity_2d if dim == 2 else velocity_3d
    nu = 0.7
    K = assemble_laplace(dofs)
    C = assemble_convection(dofs, vel)
    op = convection_diffusion_operator(mf, vel, nu=nu)
    x = RNG.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    y_ref = nu * (K @ x) + C @ x
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-12


def test_bicgstab_solves_convection_diffusion():
    """Dirichlet convection-diffusion solve: BiCGStab on the constrained
    matrix-free operator vs scipy direct on the condensed system."""
    dofs, mf = build(2, 2, 3)
    nu = 0.1
    op = convection_diffusion_operator(mf, velocity_2d, nu=nu)
    A = (nu * assemble_laplace(dofs) + assemble_convection(dofs, velocity_2d)
         ).tocsr()
    b = assemble_rhs(dofs, lambda pts: np.ones(len(pts)))
    interior = ~dofs.boundary_mask
    # condensed oracle (homogeneous Dirichlet)
    x_ref = np.zeros(dofs.n_dofs)
    x_ref[interior] = spla.spsolve(
        A[interior][:, interior].tocsc(), b[interior]
    )
    bd = jnp.asarray(np.where(interior, b, 0.0))
    res = bicgstab_solve(op.vmult, bd, rtol=1e-12, maxiter=2000)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8


def test_bicgstab_matches_cg_on_spd():
    """On an SPD system BiCGStab and CG must agree on the solution (not
    the trajectory); also checks the Jacobi preconditioner hookup."""
    dofs, mf = build(2, 2, 3)
    M = assemble_mass(dofs)
    b = RNG.standard_normal(dofs.n_dofs)
    diag = jnp.asarray(M.diagonal())
    Ms = jnp.asarray(M.toarray())
    A = lambda x: Ms @ x
    bj = jnp.asarray(b)
    r1 = cg_solve(A, bj, M_inv=make_jacobi(diag), rtol=1e-12)
    r2 = bicgstab_solve(A, bj, M_inv=make_jacobi(diag), rtol=1e-12)
    assert bool(r1.converged) and bool(r2.converged)
    x1, x2 = np.asarray(r1.x), np.asarray(r2.x)
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x1) < 1e-9


def test_convdiff_convergence_rate():
    """Manufactured solution u = sin(pi x) sin(pi y) on [0,1]^2 with
    velocity b: L2 error must converge at O(h^{p+1}), p=2."""
    import math

    p, nu = 2, 1.0

    def u_exact(pts):
        return np.sin(np.pi * pts[:, 0]) * np.sin(np.pi * pts[:, 1])

    def f(pts):
        x, y = pts[:, 0], pts[:, 1]
        u = np.sin(np.pi * x) * np.sin(np.pi * y)
        ux = np.pi * np.cos(np.pi * x) * np.sin(np.pi * y)
        uy = np.pi * np.sin(np.pi * x) * np.cos(np.pi * y)
        bv = velocity_2d(pts)
        return nu * 2 * np.pi**2 * u + bv[:, 0] * ux + bv[:, 1] * uy

    from tpufem.fem.assemble import integrate_difference

    errs = []
    for refine in (2, 3, 4):
        dofs, mf = build(2, p, refine)
        op = convection_diffusion_operator(mf, velocity_2d, nu=nu)
        b = assemble_rhs(dofs, f)
        interior = ~dofs.boundary_mask
        bd = jnp.asarray(np.where(interior, b, 0.0))
        res = bicgstab_solve(op.vmult, bd, rtol=1e-12, maxiter=4000)
        assert bool(res.converged)
        errs.append(integrate_difference(dofs, np.asarray(res.x), u_exact))
    rate = math.log2(errs[0] / errs[1]), math.log2(errs[1] / errs[2])
    assert min(rate) > p + 0.7, (errs, rate)
