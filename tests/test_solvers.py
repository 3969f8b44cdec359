"""Solver-layer tests: device-resident CG, golden iteration counts,
end-to-end Poisson solves (BASELINE configs 1 and 2).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.fem.assemble import assemble_laplace
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.apps.poisson import solve_poisson
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.cg import cg_solve, make_jacobi
from tpufem.utils.config import FemConfig


def test_cg_matches_direct_solver():
    mesh = Mesh.hyper_cube(2, 4)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2))
    op = LaplaceOperator(mf)
    rng = np.random.default_rng(1)
    b = jnp.asarray(np.asarray(mf.interior_mask) * rng.standard_normal(dofs.n_dofs))
    res = cg_solve(op.vmult, b, M_inv=make_jacobi(op.diagonal()), rtol=1e-12)
    K = assemble_laplace(dofs)
    mask = np.asarray(mf.interior_mask)
    P = sp.diags(mask)
    Kc = (P @ K @ P + sp.diags(1 - mask)).tocsc()
    x_ref = spla.spsolve(Kc, np.asarray(b))
    rel = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-10


def test_cg_iteration_count_deterministic():
    """Bitwise-stable iteration counts (BASELINE.md): same run twice."""
    mesh = Mesh.hyper_cube(2, 4)
    dofs = DoFHandler(mesh, 1)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 1))
    op = LaplaceOperator(mf)
    rng = np.random.default_rng(7)
    b = jnp.asarray(np.asarray(mf.interior_mask) * rng.standard_normal(dofs.n_dofs))
    M = make_jacobi(op.diagonal())
    r1 = cg_solve(op.vmult, b, M_inv=M, rtol=1e-10)
    r2 = cg_solve(op.vmult, b, M_inv=M, rtol=1e-10)
    assert int(r1.iterations) == int(r2.iterations)
    assert np.array_equal(np.asarray(r1.x), np.asarray(r2.x))


# Golden iteration counts: changing these is a meaningful event (operator or
# solver semantics changed) — SURVEY.md §4.4.
GOLDEN = {
    (2, 1, 4): 39,
    (2, 2, 3): 48,
    (3, 2, 2): 24,
}


@pytest.mark.parametrize("dim,p,refine", sorted(GOLDEN))
def test_golden_iteration_counts(dim, p, refine):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    # pinned to the incidence scheme: goldens fingerprint the operator
    # independent of the (reduction-order-sensitive) scatter scheme choice
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p, scatter="incidence"))
    op = LaplaceOperator(mf)
    rng = np.random.default_rng(123)
    b = jnp.asarray(np.asarray(mf.interior_mask) * rng.standard_normal(dofs.n_dofs))
    res = cg_solve(op.vmult, b, M_inv=make_jacobi(op.diagonal()), rtol=1e-10)
    assert int(res.iterations) == GOLDEN[(dim, p, refine)], (
        f"iteration count changed: {int(res.iterations)}"
    )


def test_cg_f32_stagnation_guard():
    """f32 CG with an unreachable tolerance must stop at the rounding
    floor (returning its best iterate), not spin to maxiter."""
    mesh = Mesh.hyper_cube(2, 4)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2, dtype="float32"))
    op = LaplaceOperator(mf)
    rng = np.random.default_rng(3)
    b = jnp.asarray(
        np.asarray(mf.interior_mask) * rng.standard_normal(dofs.n_dofs),
        jnp.float32,
    )
    res = cg_solve(op.vmult, b, M_inv=make_jacobi(op.diagonal()),
                   rtol=1e-14, maxiter=5000, stall_iters=60)
    assert int(res.iterations) < 2000  # stopped at the floor, not maxiter
    assert np.isfinite(np.asarray(res.x)).all()
    # and the returned iterate is an actual solution to f32 accuracy
    r = np.asarray(b) - np.asarray(op.vmult(res.x))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-4


# ------------------------------------------------------ end-to-end solves
def test_poisson_2d_q1_config1():
    """BASELINE config 1: 2D Q1 uniformly refined square, Jacobi-CG."""
    r = solve_poisson(dim=2, degree=1, refine=5)
    assert r.l2_error < 5e-4
    assert r.residual < 1e-9


def test_poisson_3d_q2_config2():
    """BASELINE config 2: 3D Q2 hex mesh, sum-factorized apply."""
    r = solve_poisson(dim=3, degree=2, refine=3)
    assert r.l2_error < 3e-4


def test_poisson_convergence_device_path():
    errs = [solve_poisson(dim=2, degree=2, refine=r).l2_error for r in (2, 3, 4)]
    rate = np.log2(errs[-2] / errs[-1])
    assert rate > 2.5, (errs, rate)


def test_poisson_inhomogeneous_dirichlet():
    """u = x^2 - y^2 is harmonic: solves Laplace with nonzero boundary."""
    exact = lambda x: x[:, 0] ** 2 - x[:, 1] ** 2
    zero = lambda x: np.zeros(len(x))
    r = solve_poisson(dim=2, degree=2, refine=3, exact=exact, rhs=zero)
    # Q2 reproduces quadratics exactly
    assert r.l2_error < 1e-10, r.l2_error
