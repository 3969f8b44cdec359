"""Vector-valued operators: elasticity vs assembled block oracle,
unit-basis diagonal, Jacobi-CG solve with O(h^{p+1}) convergence."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.assemble import (
    assemble_elasticity,
    assemble_rhs,
    integrate_difference,
)
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.vector import VectorOperator, elasticity_operator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.cg import cg_solve, make_jacobi
from tpufem.utils.config import FemConfig

RNG = np.random.default_rng(31)
MU, LAM = 0.8, 1.7


def build(dim, p, refine):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p, scatter="incidence"))
    return dofs, mf


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 3), (3, 2)])
def test_elasticity_parity(dim, p):
    dofs, mf = build(dim, p, 3 if dim == 2 else 2)
    K = assemble_elasticity(dofs, mu=MU, lam=LAM)
    op = elasticity_operator(mf, mu=MU, lam=LAM)
    x = RNG.standard_normal((dim, dofs.n_dofs))
    y = np.asarray(op.vmult_raw(jnp.asarray(x))).reshape(-1)
    y_ref = K @ x.reshape(-1)
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-12
    # the assembled oracle itself must be symmetric (SPD form)
    assert abs(K - K.T).max() < 1e-12


def test_elasticity_diagonal():
    dofs, mf = build(2, 2, 3)
    K = assemble_elasticity(dofs, mu=MU, lam=LAM)
    op = elasticity_operator(mf, mu=MU, lam=LAM)
    d = np.asarray(op.diagonal()).reshape(-1)
    d_ref = K.diagonal().copy()
    # constrained rows are identity in the operator
    bd = np.concatenate([dofs.boundary_mask] * 2)
    d_ref[bd] = 1.0
    assert np.linalg.norm(d - d_ref) / np.linalg.norm(d_ref) < 1e-12


def test_elasticity_constrained_identity():
    dofs, mf = build(2, 2, 3)
    op = elasticity_operator(mf, mu=MU, lam=LAM)
    x = jnp.asarray(RNG.standard_normal((2, dofs.n_dofs)))
    y = np.asarray(op.vmult(x))
    bd = dofs.boundary_mask
    assert np.allclose(y[:, bd], np.asarray(x)[:, bd])


def u_exact_2d(pts):
    """Divergence-free manufactured displacement, zero on the boundary:
    u = curl(psi), psi = sin^2(pi x) sin^2(pi y) / pi."""
    x, y = pts[:, 0], pts[:, 1]
    u1 = np.sin(np.pi * x) ** 2 * np.sin(2 * np.pi * y)
    u2 = -np.sin(2 * np.pi * x) * np.sin(np.pi * y) ** 2
    return np.stack([u1, u2], axis=-1)


def body_force_2d(pts):
    """f = -div sigma(u) = -mu lap(u) for the divergence-free u above
    (the lam and mu grad^T terms drop: div u = 0 and
    div(grad u^T) = grad(div u) = 0)."""
    x, y = pts[:, 0], pts[:, 1]
    lap1 = (
        2 * np.pi**2 * np.cos(2 * np.pi * x) * np.sin(2 * np.pi * y)
        - 4 * np.pi**2 * np.sin(np.pi * x) ** 2 * np.sin(2 * np.pi * y)
    )
    lap2 = (
        4 * np.pi**2 * np.sin(2 * np.pi * x) * np.sin(np.pi * y) ** 2
        - 2 * np.pi**2 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)
    )
    return np.stack([-MU * lap1, -MU * lap2], axis=-1)


def test_elasticity_solve_convergence():
    """Jacobi-CG elasticity solve converges at O(h^{p+1}) in the
    component-wise L2 error, p=2."""
    p = 2
    errs = []
    for refine in (2, 3, 4):
        dofs, mf = build(2, p, refine)
        op = elasticity_operator(mf, mu=MU, lam=LAM)
        b = np.stack([
            assemble_rhs(dofs, lambda pts, c=c: body_force_2d(pts)[:, c])
            for c in range(2)
        ])
        interior = ~dofs.boundary_mask
        bd = jnp.asarray(np.where(interior[None], b, 0.0)).reshape(-1)
        diag = op.diagonal().reshape(-1)
        res = cg_solve(op.vmult_flat, bd, M_inv=make_jacobi(diag),
                       rtol=1e-12, maxiter=4000)
        assert bool(res.converged)
        x = np.asarray(res.x).reshape(2, -1)
        e = math.sqrt(sum(
            integrate_difference(
                dofs, x[c], lambda pts, c=c: u_exact_2d(pts)[:, c]
            ) ** 2
            for c in range(2)
        ))
        errs.append(e)
    rates = [math.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(rates) > p + 0.7, (errs, rates)
