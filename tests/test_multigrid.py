"""Chebyshev smoother + geometric multigrid tests (BASELINE config 5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.apps.poisson_mg import solve_poisson_mg
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.chebyshev import (
    chebyshev_smooth,
    estimate_lambda_max,
    make_chebyshev_params,
)
from tpufem.solvers.multigrid import GeometricMultigrid, prolongation_1d
from tpufem.utils.config import FemConfig


def test_lambda_max_estimate_sane():
    mesh = Mesh.hyper_cube(2, 3)
    dofs = DoFHandler(mesh, 1)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 1))
    op = LaplaceOperator(mf)
    diag = np.asarray(op.diagonal())
    lam = estimate_lambda_max(op.vmult, jnp.asarray(1.0 / diag), dofs.n_dofs)
    # D^-1 A for the FEM Laplacian has lam_max ~ 2
    assert 1.0 < lam < 3.0


def test_chebyshev_reduces_error():
    mesh = Mesh.hyper_cube(2, 4)
    dofs = DoFHandler(mesh, 1)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 1))
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    params = make_chebyshev_params(op.vmult, diag, dofs.n_dofs, degree=4)
    rng = np.random.default_rng(0)
    x_true = jnp.asarray(np.asarray(mf.interior_mask)
                         * rng.standard_normal(dofs.n_dofs))
    b = op.vmult(x_true)
    x = chebyshev_smooth(op.vmult, 1.0 / diag, params, b)
    r0 = np.linalg.norm(np.asarray(b))
    r1 = np.linalg.norm(np.asarray(b - op.vmult(x)))
    assert r1 < 0.6 * r0  # smoother alone reduces the residual


def test_prolongation_exact_on_polynomials():
    p = 3
    P = prolongation_1d(p, 2)  # 2 -> 4 cells
    from tpufem.fem.shapes import support_points_1d
    gll = support_points_1d(p)
    xc = np.concatenate([(k + gll[:-1]) / 2 for k in range(2)] + [[1.0]])
    xf = np.concatenate([(k + gll[:-1]) / 4 for k in range(4)] + [[1.0]])
    for k in range(p + 1):
        assert np.allclose(P @ xc**k, xf**k, atol=1e-12)


@pytest.mark.parametrize("dim,degree,refine", [(2, 1, 5), (2, 2, 4), (3, 2, 3)])
def test_gmg_preconditioned_cg_converges_fast(dim, degree, refine):
    r = solve_poisson_mg(dim=dim, degree=degree, refine=refine, coarsest=1)
    # textbook GMG: iteration count small and mesh-independent
    assert r["iterations"] <= 10, r["iterations"]
    assert r["residual"] < 1e-8


def test_gmg_iterations_mesh_independent():
    iters = [
        solve_poisson_mg(dim=2, degree=1, refine=r, coarsest=1)["iterations"]
        for r in (3, 4, 5)
    ]
    assert max(iters) - min(iters) <= 2, iters


def test_gmg_mixed_precision_bf16_preconditioner():
    """bf16 V-cycle inside an f32 outer CG: more iterations, same final
    accuracy (the preconditioner's precision never limits the solution —
    the TPU-native mixed-precision recipe)."""
    r16 = solve_poisson_mg(dim=2, degree=2, refine=4, dtype="float32",
                           precond_dtype="bfloat16")
    r32 = solve_poisson_mg(dim=2, degree=2, refine=4, dtype="float32")
    assert r16["iterations"] <= 3 * max(1, r32["iterations"])
    # same discretization-limited accuracy
    assert r16["l2_error"] < 2.0 * r32["l2_error"] + 1e-8


def test_gmg_variable_coefficient():
    """config 5: -div(c grad u) = f with c varying; verify vs the assembled
    direct solve (u = prod sin is NOT the exact solution of this operator,
    so the L2-vs-manufactured number is meaningless here)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from tpufem.fem.assemble import assemble_laplace, assemble_rhs
    from tpufem.apps.poisson import default_solution

    coef = lambda x: 1.0 + 10.0 * np.sum(x**2, axis=1)
    r = solve_poisson_mg(dim=2, degree=2, refine=4, coefficient=coef)
    assert r["iterations"] <= 14
    assert r["residual"] < 1e-8
    # direct solve of the same discrete system
    mesh = Mesh.hyper_cube(2, 4)
    dofs = DoFHandler(mesh, 2)
    K = assemble_laplace(dofs, coefficient=coef)
    _, f = default_solution(2)
    b = assemble_rhs(dofs, f)
    mask = np.ones(dofs.n_dofs)
    mask[dofs.boundary_mask] = 0.0
    Kc = (sp.diags(mask) @ K @ sp.diags(mask) + sp.diags(1 - mask)).tocsc()
    u_ref = spla.spsolve(Kc, mask * b)
    rel = np.linalg.norm(r["solution"] - u_ref) / np.linalg.norm(u_ref)
    assert rel < 1e-8, rel


def test_gmg_shell_mesh_factory():
    """Curved-domain GMG (mesh_factory levels): V-cycle-preconditioned
    CG on a 2D annulus wedge converges in O(10) iterations and matches
    the Jacobi-CG solution."""
    import jax.numpy as jnp
    import numpy as np

    from tpufem.fem.mesh import Mesh
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.solvers.multigrid import GeometricMultigrid

    mg = GeometricMultigrid(2, 2, 4, coarsest_refine=1, dtype="float64",
                            mesh_factory=Mesh.hyper_shell_2d)
    fine = mg.fine
    rng = np.random.default_rng(3)
    mask = np.asarray(fine.mask)
    b = jnp.asarray(mask * rng.standard_normal(fine.mf.n_dofs))
    res = cg_solve(fine.op.vmult, b, M_inv=mg.preconditioner(),
                   rtol=1e-10, maxiter=60)
    assert bool(res.converged) and int(res.iterations) <= 25, \
        int(res.iterations)
    ref = cg_solve(fine.op.vmult, b, M_inv=make_jacobi(1.0 / fine.inv_diag),
                   rtol=1e-10, maxiter=2000)
    xr, xf = np.asarray(res.x), np.asarray(ref.x)
    assert np.linalg.norm(xr - xf) <= 1e-7 * np.linalg.norm(xf)


def test_gmg_separable_coefficient_resident():
    """BASELINE config 5 on the fast tier: separable variable
    coefficient, every level's smoother on the ResidentTerms kernel;
    resident fine-level GMG-CG matches the flat path."""
    import jax.numpy as jnp
    import numpy as np

    from tpufem.solvers.cg import cg_solve
    from tpufem.solvers.multigrid import GeometricMultigrid
    from tpufem.solvers.resident import resident_gmg_cg

    cax = [lambda x: 1.0 + 0.5 * np.sin(2.1 * np.pi * x),
           lambda y: 1.3 + y * y,
           lambda z: np.exp(0.5 * z)]
    mg = GeometricMultigrid(3, 2, 4, coarsest_refine=2, dtype="float64",
                            use_pallas=True, coefficient_axes=cax)
    fine = mg.fine
    assert fine.mf.sep_ops[0] == "terms" and fine.mf.resident is not None
    rng = np.random.default_rng(5)
    mask = np.asarray(fine.mask)
    b = jnp.asarray(mask * rng.standard_normal(fine.mf.n_dofs))
    res_flat = cg_solve(fine.op.vmult, b, M_inv=mg.preconditioner(),
                        rtol=1e-8, maxiter=100)
    assert bool(res_flat.converged) and int(res_flat.iterations) <= 15
    res_r = resident_gmg_cg(mg, b, rtol=1e-8, maxiter=100)
    assert int(res_r.iterations) == int(res_flat.iterations)
    xr, xf = np.asarray(res_r.x), np.asarray(res_flat.x)
    assert np.linalg.norm(xr - xf) <= 1e-8 * max(np.linalg.norm(xf), 1.0)
