"""Tensor-product mass/Helmholtz operators (the generic-family fast
tier, `operators/tensor_product.py`): assembled-oracle parity for the
XLA terms apply AND the fused ResidentTerms kernel path, closed-form
diagonal, and the heat app's --resident stepping."""

import numpy as np
import pytest

from tpufem.fem.assemble import assemble_laplace, assemble_mass
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.tensor_product import (
    helmholtz_tensor_operator,
    mass_tensor_operator,
)
from tpufem.ops.matrix_free import MatrixFree
from tpufem.utils.config import FemConfig


def _build(dim, degree, refine, use_pallas=False):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, degree)
    cfg = FemConfig(dim=dim, degree=degree, dtype="float64",
                    scatter="incidence", use_pallas=use_pallas)
    return dofs, MatrixFree.build(mesh, dofs, cfg)


@pytest.mark.parametrize("dim,degree,refine", [(2, 3, 3), (3, 2, 2)])
def test_helmholtz_tensor_parity(dim, degree, refine):
    """raw / constrained / diagonal of alpha M + beta K vs the assembled
    oracle (machine precision: same Gauss rule, exact factorization)."""
    dofs, mf = _build(dim, degree, refine)
    alpha, beta = 1.0, 0.37
    A = helmholtz_tensor_operator(mf, alpha=alpha, beta=beta)
    M = mass_tensor_operator(mf)
    A_mat = (alpha * assemble_mass(dofs).toarray()
             + beta * assemble_laplace(dofs).toarray())
    M_mat = assemble_mass(dofs).toarray()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(dofs.n_dofs)

    ref = A_mat @ x
    assert np.abs(np.asarray(A.vmult_raw(x)) - ref).max() \
        <= 1e-12 * np.abs(ref).max()
    ref_m = M_mat @ x
    assert np.abs(np.asarray(M.vmult_raw(x)) - ref_m).max() \
        <= 1e-12 * np.abs(ref_m).max()

    mask = np.asarray(mf.interior_mask)
    y_ref = mask * (A_mat @ (mask * x)) + (1 - mask) * x
    assert np.abs(np.asarray(A.vmult(x)) - y_ref).max() \
        <= 1e-12 * np.abs(y_ref).max()

    d_ref = np.diag(A_mat) * mask + (1 - mask)
    assert np.abs(np.asarray(A.diagonal()) - d_ref).max() \
        <= 1e-12 * np.abs(d_ref).max()


@pytest.mark.parametrize("dim,degree,refine", [(3, 2, 3), (2, 4, 4)])
def test_helmholtz_resident_kernel_parity(dim, degree, refine):
    """use_pallas: the fused ResidentTerms(2D) kernel builds for the
    Helmholtz term set and matches the assembled oracle."""
    dofs, mf = _build(dim, degree, refine, use_pallas=True)
    dt = 0.11
    A = helmholtz_tensor_operator(mf, alpha=1.0, beta=dt)
    assert A.resident is not None, "kernel should build at this size"
    A_mat = (assemble_mass(dofs).toarray()
             + dt * assemble_laplace(dofs).toarray())
    rng = np.random.default_rng(1)
    x = rng.standard_normal(dofs.n_dofs)
    ref = A_mat @ x
    assert np.abs(np.asarray(A.vmult_raw(x)) - ref).max() \
        <= 1e-12 * np.abs(ref).max()


def test_resident_jacobi_cg_on_tensor_operator():
    """resident_jacobi_cg accepts operators carrying their own resident
    kernel: solve (M + dt K) x = b and check the true residual."""
    from tpufem.solvers.resident import resident_jacobi_cg

    dofs, mf = _build(3, 2, 3, use_pallas=True)
    A = helmholtz_tensor_operator(mf, alpha=1.0, beta=1e-2)
    assert A.resident is not None
    mask = np.asarray(mf.interior_mask)
    rng = np.random.default_rng(2)
    b = mask * rng.standard_normal(dofs.n_dofs)
    res = resident_jacobi_cg(A, b, rtol=1e-10)
    assert bool(res.converged)
    x = np.asarray(res.x)
    A_mat = (assemble_mass(dofs).toarray()
             + 1e-2 * assemble_laplace(dofs).toarray())
    r = b - mask * (A_mat @ (mask * x))
    assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(b)


def test_heat_resident_matches_flat():
    """--resident heat stepping (tensor-product tier + resident CG)
    reproduces the generic-tier run."""
    from tpufem.apps.heat import run_heat

    flat = run_heat(dim=3, degree=2, refine=3, dt=1e-3, steps=4)
    fast = run_heat(dim=3, degree=2, refine=3, dt=1e-3, steps=4,
                    resident=True)
    assert fast["l2_error"] == pytest.approx(flat["l2_error"], rel=1e-8)
    rel = (np.linalg.norm(fast["u"] - flat["u"])
           / np.linalg.norm(flat["u"]))
    assert rel < 1e-9, rel
