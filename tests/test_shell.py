"""Curved-domain (hyper_shell) solves — the reference's shell geometry
(SURVEY.md §3.1) on the general-metric path.

Geometry note: cells are Q1-mapped (bilinear) images of the polar
transform of their vertices, so the computational domain is a polygonal
approximation of the annulus refined with the mesh — the manufactured
solution is evaluated on the same mapped geometry, making the test exact
up to FE approximation on that geometry.
"""

import numpy as np
import pytest

from tpufem.apps.poisson import solve_poisson
from tpufem.fem.assemble import assemble_laplace
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.utils.config import FemConfig

RNG = np.random.default_rng(21)


def test_shell_metric_is_general():
    mesh = Mesh.hyper_shell_2d(2)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2))
    assert mf.metric_kind == "general"
    # round 2: curved UNIFORM meshes ride the blocked structured path
    assert mf.scheme == "structured"


@pytest.mark.parametrize("p", [1, 2, 4])
def test_shell_vmult_parity(p):
    mesh = Mesh.hyper_shell_2d(3)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, p))
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs)
    x = RNG.standard_normal(dofs.n_dofs)
    import jax.numpy as jnp

    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    assert np.linalg.norm(y - K @ x) / np.linalg.norm(K @ x) < 1e-10


def test_shell_solve_converges():
    """u = x^2 - y^2 is harmonic; Q2 on bilinear cells converges ~O(h^2-3)."""
    exact = lambda x: x[:, 0] ** 2 - x[:, 1] ** 2
    zero = lambda x: np.zeros(len(x))
    errs = []
    for r in (2, 3, 4):
        mesh = Mesh.hyper_shell_2d(r)
        from tpufem.fem.assemble import assemble_rhs, integrate_difference
        from tpufem.solvers.cg import cg_solve, make_jacobi
        import jax.numpy as jnp

        dofs = DoFHandler(mesh, 2)
        mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2))
        op = LaplaceOperator(mf)
        b = assemble_rhs(dofs, zero)
        g = np.zeros(dofs.n_dofs)
        g[dofs.boundary_mask] = exact(dofs.dof_coords[dofs.boundary_mask])
        from tpufem.apps.poisson import dirichlet_setup

        b_con, x0 = dirichlet_setup(op, b, g)
        res = cg_solve(op.vmult, b_con, M_inv=make_jacobi(op.diagonal()),
                       x0=x0, rtol=1e-12)
        errs.append(integrate_difference(dofs, np.asarray(res.x), exact))
    rate = np.log2(errs[-2] / errs[-1])
    assert rate > 1.8, (errs, rate)


def test_curved_uniform_uses_structured_tier():
    """Round 2: curved uniform meshes ride the blocked structured path
    (general per-qpoint metric), not the generic incidence path."""
    mesh = Mesh.hyper_shell_2d(2)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2))
    assert mf.metric_kind == "general"
    assert mf.scheme == "structured"
    assert mf.struct_gsym is not None


@pytest.mark.parametrize("dim,p,make", [
    (2, 1, lambda: Mesh.hyper_shell_2d(3)),
    (2, 3, lambda: Mesh.hyper_shell_2d(3)),
    (3, 2, lambda: Mesh.hyper_shell_3d(2)),
])
def test_curved_structured_vmult_parity(dim, p, make):
    """Blocked general-metric apply == assembled oracle == incidence path."""
    import jax.numpy as jnp

    mesh = make()
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs,
                          FemConfig(dim, p, scatter="structured"))
    assert mf.struct_gsym is not None
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs)
    x = RNG.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    assert np.linalg.norm(y - K @ x) / np.linalg.norm(K @ x) < 1e-12

    mf_i = MatrixFree.build(mesh, dofs,
                            FemConfig(dim, p, scatter="incidence"))
    y_i = np.asarray(LaplaceOperator(mf_i).vmult_raw(jnp.asarray(x)))
    assert np.linalg.norm(y - y_i) / np.linalg.norm(y_i) < 1e-12


def test_curved_structured_with_coefficient():
    import jax.numpy as jnp

    coef = lambda x: 1.0 + np.sum(x**2, axis=1)
    mesh = Mesh.hyper_shell_2d(3)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs,
                          FemConfig(2, 2, scatter="structured"),
                          coefficient=coef)
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs, coefficient=coef)
    x = RNG.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    assert np.linalg.norm(y - K @ x) / np.linalg.norm(K @ x) < 1e-12


def test_shell_3d_solve_converges():
    """3D spherical shell wedge: u = x^2 - y^2 (harmonic), Q2 Dirichlet —
    expect ~O(h^2) on the Q1-mapped geometry."""
    from tpufem.apps.poisson import dirichlet_setup
    from tpufem.fem.assemble import assemble_rhs, integrate_difference
    from tpufem.solvers.cg import cg_solve, make_jacobi
    import jax.numpy as jnp

    exact = lambda x: x[:, 0] ** 2 - x[:, 1] ** 2
    zero = lambda x: np.zeros(len(x))
    errs = []
    for r in (1, 2, 3):
        mesh = Mesh.hyper_shell_3d(r)
        dofs = DoFHandler(mesh, 2)
        mf = MatrixFree.build(mesh, dofs, FemConfig(3, 2))
        assert mf.scheme == "structured"
        op = LaplaceOperator(mf)
        b = assemble_rhs(dofs, zero)
        g = np.zeros(dofs.n_dofs)
        g[dofs.boundary_mask] = exact(dofs.dof_coords[dofs.boundary_mask])
        b_con, x0 = dirichlet_setup(op, b, g)
        res = cg_solve(op.vmult, b_con, M_inv=make_jacobi(op.diagonal()),
                       x0=x0, rtol=1e-12)
        errs.append(integrate_difference(dofs, np.asarray(res.x), exact))
    rate = np.log2(errs[-2] / errs[-1])
    assert rate > 1.7, (errs, rate)


def test_separable_metric_matches_general_and_oracle():
    """Orthogonal shells factor exactly: the separable-metric tier must
    match the per-qpoint general tier to rounding (same Gauss rule,
    tensor rule factorizes) and the assembled oracle to 1e-10."""
    import numpy as np
    import jax.numpy as jnp

    from tpufem.fem.assemble import assemble_laplace
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    for dim, refine, p in [(2, 3, 3), (3, 2, 2)]:
        mesh = (Mesh.hyper_shell_3d(refine) if dim == 3
                else Mesh.hyper_shell_2d(refine))
        dofs = DoFHandler(mesh, p)
        assert mesh.separable_metric is not None
        op_sep = LaplaceOperator(MatrixFree.build(
            mesh, dofs, FemConfig(dim, p, scatter="separable")))
        op_gen = LaplaceOperator(MatrixFree.build(
            mesh, dofs, FemConfig(dim, p, scatter="structured")))
        rng = np.random.default_rng(0)
        x = rng.standard_normal(dofs.n_dofs)
        y_sep = np.asarray(op_sep.vmult_raw(jnp.asarray(x)))
        y_gen = np.asarray(op_gen.vmult_raw(jnp.asarray(x)))
        nrm = np.linalg.norm(y_gen)
        assert np.linalg.norm(y_sep - y_gen) <= 1e-12 * nrm, (dim, p)
        K = assemble_laplace(dofs)
        y_ref = K @ x
        assert np.linalg.norm(y_sep - y_ref) <= 1e-10 * np.linalg.norm(
            y_ref), (dim, p)
