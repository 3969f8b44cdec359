"""Matrix-free operator parity vs the assembled oracle.

The acceptance bar: <= 1e-10 relative error vs the CPU f64 reference for
p = 1..7 in 2D/3D (BASELINE.md; reference test strategy SURVEY.md §4.2-4.3).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.assemble import assemble_laplace
from tpufem.fem.coloring import verify_coloring
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.utils.config import FemConfig

RNG = np.random.default_rng(42)


def rel_err(a, b):
    return np.linalg.norm(a - b) / np.linalg.norm(b)


def build(dim, p, refine, scatter="incidence", coefficient=None, warp=None):
    mesh = Mesh.hyper_cube(dim, refine)
    if warp is not None:
        mesh.transform = warp
    dofs = DoFHandler(mesh, p)
    cfg = FemConfig(dim=dim, degree=p, scatter=scatter)
    mf = MatrixFree.build(mesh, dofs, cfg, coefficient=coefficient)
    return mesh, dofs, mf


@pytest.mark.parametrize("dim,refine", [(2, 3), (3, 2)])
@pytest.mark.parametrize("p", [1, 2, 3, 4, 5, 6, 7])
def test_vmult_parity_all_degrees(dim, p, refine):
    if dim == 3 and p > 5:
        refine = 1
    mesh, dofs, mf = build(dim, p, refine)
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs)
    x = RNG.standard_normal(dofs.n_dofs)
    assert rel_err(np.asarray(op.vmult_raw(jnp.asarray(x))), K @ x) < 1e-10


@pytest.mark.parametrize("dim,p", [(2, 5), (2, 7), (3, 5)])
def test_dense_and_separable_high_degree_parity(dim, p):
    refine = 2 if dim == 2 else 1
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    K = assemble_laplace(dofs)
    x = RNG.standard_normal(dofs.n_dofs)
    for scheme in ("dense", "separable", "structured"):
        mf = MatrixFree.build(mesh, dofs,
                              FemConfig(dim, p, scatter=scheme))
        op = LaplaceOperator(mf)
        y = np.asarray(op.vmult_raw(jnp.asarray(x)))
        assert rel_err(y, K @ x) < 1e-10, (scheme, dim, p)


@pytest.mark.parametrize("scatter", ["incidence", "colored"])
def test_scatter_schemes_agree(scatter):
    mesh, dofs, mf = build(2, 3, 3, scatter=scatter)
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs)
    x = RNG.standard_normal(dofs.n_dofs)
    assert rel_err(np.asarray(op.vmult_raw(jnp.asarray(x))), K @ x) < 1e-10


def test_coloring_valid_uniform_and_adaptive():
    mesh = Mesh.hyper_cube(2, 3)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2))
    colors_u = mf._ensure_colors()  # built lazily now
    verify_coloring(colors_u, dofs.cell_dofs)
    assert sum(len(c) for c in colors_u) == mesh.n_cells
    # adaptive: greedy coloring
    centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
    amesh = mesh.refine(np.linalg.norm(centers, axis=1) < 0.5)
    adofs = DoFHandler(amesh, 2)
    from tpufem.fem.coloring import color_cells
    colors = color_cells(amesh, adofs.cell_dofs)
    verify_coloring(colors, adofs.cell_dofs)
    assert sum(len(c) for c in colors) == amesh.n_cells


def test_variable_coefficient_on_refined_uniform_mesh():
    """Regression: meshes produced by refine() are sorted axis-0-major,
    not x-fastest; the structured-scheme coefficient block must reorder
    cells or the field is silently transposed (was 0.44 rel err)."""
    coef = lambda x: 1.0 + 5.0 * x[:, 0]  # asymmetric on purpose
    mesh = Mesh.hyper_cube(2, 2).refine(np.ones(16, dtype=bool))
    assert mesh.is_uniform
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2),
                          coefficient=coef)
    assert mf.scheme == "structured"
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs, coefficient=coef)
    x = RNG.standard_normal(dofs.n_dofs)
    assert rel_err(np.asarray(op.vmult_raw(jnp.asarray(x))), K @ x) < 1e-10


def test_variable_coefficient_parity():
    coef = lambda x: 1.0 + np.sum(x**2, axis=1)
    mesh, dofs, mf = build(2, 3, 3, coefficient=coef)
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs, coefficient=coef)
    x = RNG.standard_normal(dofs.n_dofs)
    assert rel_err(np.asarray(op.vmult_raw(jnp.asarray(x))), K @ x) < 1e-10


def test_curved_mesh_general_metric_parity():
    def warp(x):
        y = x.copy()
        y[:, 0] = x[:, 0] + 0.08 * np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
        y[:, 1] = x[:, 1] - 0.06 * np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
        return y

    mesh, dofs, mf = build(2, 3, 3, warp=warp)
    assert mf.metric_kind == "general"
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs)
    x = RNG.standard_normal(dofs.n_dofs)
    assert rel_err(np.asarray(op.vmult_raw(jnp.asarray(x))), K @ x) < 1e-10


@pytest.mark.parametrize("dim,p", [(2, 2), (3, 2)])
def test_over_integration_parity(dim, p):
    """QGauss(p+2) over-integration: exercises the basis (non-collocation)
    evaluation scheme, nq1 != n1."""
    from tpufem.fem.quadrature import Quadrature

    mesh = Mesh.hyper_cube(dim, 2)
    dofs = DoFHandler(mesh, p)
    cfg = FemConfig(dim=dim, degree=p, n_q_1d=p + 2)
    mf = MatrixFree.build(mesh, dofs, cfg)
    assert mf.D_col is None and mf.scheme == "incidence"
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs, quad=Quadrature.gauss(p + 2))
    x = RNG.standard_normal(dofs.n_dofs)
    assert rel_err(np.asarray(op.vmult_raw(jnp.asarray(x))), K @ x) < 1e-10
    dg = np.asarray(op.diagonal())
    mask = ~dofs.boundary_mask
    assert rel_err(dg[mask], K.diagonal()[mask]) < 1e-12


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 4), (3, 2)])
def test_diagonal_parity(dim, p):
    mesh, dofs, mf = build(dim, p, 2)
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs)
    mask = ~dofs.boundary_mask
    dg = np.asarray(op.diagonal())
    assert rel_err(dg[mask], K.diagonal()[mask]) < 1e-12


def test_constrained_vmult_identity_on_boundary():
    mesh, dofs, mf = build(2, 2, 3)
    op = LaplaceOperator(mf)
    x = jnp.asarray(RNG.standard_normal(dofs.n_dofs))
    y = np.asarray(op.vmult(x))
    bd = dofs.boundary_mask
    assert np.allclose(y[bd], np.asarray(x)[bd])
    # symmetry of the constrained operator
    a = jnp.asarray(RNG.standard_normal(dofs.n_dofs))
    b = jnp.asarray(RNG.standard_normal(dofs.n_dofs))
    lhs = float(jnp.dot(op.vmult(a), b))
    rhs = float(jnp.dot(a, op.vmult(b)))
    assert np.isclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize("dim,p,coef", [
    (2, 2, False), (2, 3, True), (3, 2, False), (3, 2, True),
])
def test_diagonal_device_hanging(dim, p, coef):
    """Device-side diag(C^T A C) on adaptive meshes, with and without a
    variable coefficient, vs the condensed assembled oracle (removes the
    round-1 NotImplementedError for hanging x coefficient)."""
    from tpufem.fem.constraints import make_hanging_node_constraints

    mesh = Mesh.hyper_cube(dim, 2)
    for _ in range(2 if dim == 2 else 1):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers - 0.31, axis=1) < 0.35)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    assert len(ac.lines) > 0
    coefficient = (lambda x: 1.0 + 10.0 * np.sum(x**2, axis=1)) if coef \
        else None
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p),
                          coefficient=coefficient, constraints=ac)
    op = LaplaceOperator(mf)
    dg = np.asarray(op.diagonal())

    K = assemble_laplace(dofs, coefficient=coefficient)
    Kc = ac.condense_matrix(K)
    mask = ~(dofs.boundary_mask | ac.constrained_mask())
    d_oracle = np.asarray(Kc.diagonal())
    assert rel_err(dg[mask], d_oracle[mask]) < 1e-12


def test_diagonal_device_unconstrained_matches_host():
    """diagonal_device (incidence-scattered device path) == host closed
    form on a uniform mesh."""
    from tpufem.ops.diagonal import diagonal_device

    mesh = Mesh.hyper_cube(3, 2)
    dofs = DoFHandler(mesh, 3)
    mf = MatrixFree.build(mesh, dofs, FemConfig(3, 3, scatter="incidence"))
    op = LaplaceOperator(mf)
    d_host = np.asarray(op.diagonal())
    d_dev = np.asarray(diagonal_device(mf))
    mask = ~dofs.boundary_mask
    assert rel_err(d_dev[mask], d_host[mask]) < 1e-12
