"""Generic quadrature-functor operators (FEEvaluation API parity):
mass, Helmholtz, custom functors — vs assembled oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.assemble import assemble_laplace, assemble_mass
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.generic import (
    GenericOperator,
    helmholtz_operator,
    mass_operator,
)
from tpufem.ops.matrix_free import MatrixFree
from tpufem.utils.config import FemConfig

RNG = np.random.default_rng(9)


def build(dim, p, refine, warp=None, coefficient=None):
    mesh = Mesh.hyper_cube(dim, refine)
    if warp is not None:
        mesh.transform = warp
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p, scatter="incidence"),
                          coefficient=coefficient)
    return dofs, mf


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 3), (3, 2)])
def test_mass_operator_parity(dim, p):
    dofs, mf = build(dim, p, 3 if dim == 2 else 2)
    M = assemble_mass(dofs)
    op = mass_operator(mf)
    x = RNG.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    assert np.linalg.norm(y - M @ x) / np.linalg.norm(M @ x) < 1e-12


def test_mass_operator_curved():
    def warp(x):
        y = x.copy()
        y[:, 0] += 0.07 * np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
        return y

    dofs, mf = build(2, 2, 3, warp=warp)
    M = assemble_mass(dofs)
    op = mass_operator(mf)
    x = RNG.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    assert np.linalg.norm(y - M @ x) / np.linalg.norm(M @ x) < 1e-12


def test_helmholtz_operator_parity():
    dofs, mf = build(2, 2, 3)
    K = assemble_laplace(dofs)
    M = assemble_mass(dofs)
    alpha, beta = 0.7, 2.5
    op = helmholtz_operator(mf, alpha=alpha, beta=beta)
    x = RNG.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    y_ref = alpha * (M @ x) + beta * (K @ x)
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-12


def test_custom_quad_functor_advection_like():
    """A custom functor: submit_gradient(c * value) — checks the API shape
    for non-symmetric forms: B[i,j] = int c grad(phi_i) . e phi_j."""
    dofs, mf = build(2, 2, 3)

    e = np.array([1.0, 0.5])

    def qop(vals, grads, mf_):
        sg = jnp.stack([e[0] * vals, e[1] * vals], axis=1)
        return None, sg

    op = GenericOperator(mf, qop, needs_values=True, needs_gradients=False)
    x = RNG.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    # oracle: B = sum_c Ge_a^T W diag-applied ... build dense via basis
    from tpufem.fem.assemble import cell_basis_gradients, cell_basis_values
    from tpufem.fem.mapping import compute_metric
    from tpufem.fem.quadrature import Quadrature

    quad = Quadrature.gauss(3)
    met = compute_metric(dofs.mesh, quad).to_general()
    G = cell_basis_gradients(2, 2, quad)
    V = cell_basis_values(2, 2, quad)
    Gp = np.einsum("cqba,qjb->cqja", met.inv_jac, G)
    Be = np.einsum("cqja,a,qk,cq->cjk", Gp, e, V, met.jxw)
    y_ref = np.zeros(dofs.n_dofs)
    xl = x[dofs.cell_dofs]
    yl = np.einsum("cjk,ck->cj", Be, xl)
    np.add.at(y_ref, dofs.cell_dofs.ravel(), yl.ravel())
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-12


def test_generic_constrained_identity():
    dofs, mf = build(2, 2, 3)
    op = helmholtz_operator(mf)
    x = jnp.asarray(RNG.standard_normal(dofs.n_dofs))
    y = np.asarray(op.vmult(x))
    bd = dofs.boundary_mask
    assert np.allclose(y[bd], np.asarray(x)[bd])
