"""Host FEM substrate tests: shapes, mesh, DoF enumeration, oracle.

Test strategy model: SURVEY.md §4 — the reference verifies via manufactured
solutions and CPU/GPU parity; we add unit-level checks it lacks.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.fem.assemble import (
    assemble_laplace,
    assemble_rhs,
    integrate_difference,
)
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.fem.quadrature import Quadrature
from tpufem.fem.shapes import ShapeInfo, subface_interpolation_1d


def u_exact(x):
    return np.prod(np.sin(np.pi * x), axis=1)


def f_rhs(x):
    return x.shape[1] * np.pi**2 * np.prod(np.sin(np.pi * x), axis=1)


# ---------------------------------------------------------------- shapes
@pytest.mark.parametrize("p", range(1, 8))
def test_shape_matrices(p):
    si = ShapeInfo.gauss(p)
    assert np.allclose(si.S.sum(1), 1.0)
    assert np.allclose(si.D.sum(1), 0.0, atol=1e-9)
    x = si.nodes
    for k in range(p + 1):
        u = x**k
        du = si.D @ u
        expect = k * si.quad.points_1d ** (k - 1) if k > 0 else np.zeros_like(du)
        assert np.allclose(du, expect, atol=1e-8)
        assert np.allclose(si.D_col @ (si.S @ u), du, atol=1e-8)


@pytest.mark.parametrize("p", range(1, 8))
def test_subface_interpolation_reproduces_polynomials(p):
    x = ShapeInfo.gauss(p).nodes
    for sub in (0, 1):
        C = subface_interpolation_1d(p, sub)
        for k in range(p + 1):
            child_x = 0.5 * x + 0.5 * sub
            assert np.allclose(C @ x**k, child_x**k, atol=1e-12)


def test_gauss_quadrature_exactness():
    for n in range(1, 9):
        q = Quadrature.gauss(n)
        for k in range(2 * n):
            val = np.sum(q.weights_1d * q.points_1d**k)
            assert np.isclose(val, 1.0 / (k + 1)), (n, k)


# ---------------------------------------------------------------- mesh
def test_uniform_mesh_counts():
    m = Mesh.hyper_cube(2, 3)
    assert m.n_cells == 64
    m3 = Mesh.hyper_cube(3, 2)
    assert m3.n_cells == 64
    assert m.is_uniform and m3.is_uniform


def test_adaptive_refine_coverage_and_balance():
    mesh = Mesh.hyper_cube(2, 2)
    for _ in range(3):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers, axis=1) < 0.4)
    area = np.sum((mesh.sizes.astype(float) / mesh.U) ** 2)
    assert abs(area - 1.0) < 1e-14
    assert not mesh._unbalanced_cells().any()
    cov = np.zeros((mesh.U, mesh.U), dtype=np.int32)
    for o, s in zip(mesh.origins, mesh.sizes):
        cov[o[0]:o[0] + s, o[1]:o[1] + s] += 1
    assert cov.min() == 1 and cov.max() == 1


def test_adaptive_refine_3d():
    mesh = Mesh.hyper_cube(3, 1)
    centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
    mesh = mesh.refine(np.linalg.norm(centers, axis=1) < 0.5)
    vol = np.sum((mesh.sizes.astype(float) / mesh.U) ** 3)
    assert abs(vol - 1.0) < 1e-14
    assert not mesh._unbalanced_cells().any()


# ---------------------------------------------------------------- dofs
@pytest.mark.parametrize("dim,p,expect", [
    (2, 1, 5**2), (2, 2, 9**2), (2, 3, 13**2),
    (3, 1, 5**3), (3, 2, 9**3),
])
def test_dof_counts_uniform(dim, p, expect):
    mesh = Mesh.hyper_cube(dim, 2)
    dofs = DoFHandler(mesh, p)
    assert dofs.n_dofs == expect


def test_dof_shared_support_points_agree():
    mesh = Mesh.hyper_cube(2, 2)
    dofs = DoFHandler(mesh, 3)
    # every (cell, node) referencing dof i must sit at dof_coords[i]
    from tpufem.fem.shapes import support_points_1d
    gll = support_points_1d(3)
    for c in range(mesh.n_cells):
        o, s = mesh.origins[c], mesh.sizes[c]
        for j in range(16):
            i0, i1 = j % 4, j // 4
            x = (o + s * np.array([gll[i0], gll[i1]])) / mesh.U
            d = dofs.cell_dofs[c, j]
            assert np.allclose(dofs.dof_coords[d], x, atol=1e-14)


def test_boundary_mask():
    mesh = Mesh.hyper_cube(2, 2)
    dofs = DoFHandler(mesh, 2)
    onb = (
        np.isclose(dofs.dof_coords, 0.0) | np.isclose(dofs.dof_coords, 1.0)
    ).any(axis=1)
    assert np.array_equal(dofs.boundary_mask, onb)


# ---------------------------------------------------------------- oracle
@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("p", [1, 2, 3])
def test_poisson_convergence_oracle(dim, p):
    """O(h^(p+1)) L2 convergence — SURVEY.md §4.1 mechanism."""
    errs = []
    refs = (2, 3, 4) if dim == 2 else (1, 2, 3)
    for r in refs:
        mesh = Mesh.hyper_cube(dim, r)
        dofs = DoFHandler(mesh, p)
        K = assemble_laplace(dofs)
        b = assemble_rhs(dofs, f_rhs)
        mask = np.ones(dofs.n_dofs)
        mask[dofs.boundary_mask] = 0.0
        P = sp.diags(mask)
        Kc = (P @ K @ P + sp.diags(1.0 - mask)).tocsc()
        u = spla.spsolve(Kc, mask * b)
        errs.append(integrate_difference(dofs, u, u_exact))
    rate = np.log2(errs[-2] / errs[-1])
    assert rate > p + 0.5, (errs, rate)


def grad_exact(x):
    # the app's manufactured-solution gradient — ONE definition
    from tpufem.apps.poisson import default_gradient

    return default_gradient(x.shape[1])(x)


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 2), (3, 2)])
def test_h1_norm_convergence(dim, p):
    """H1 seminorm of the nodal interpolant converges at O(h^p) (one
    order below L2); 'h1' combines both — the deal.II H1_seminorm /
    H1_norm options of VectorTools::integrate_difference."""
    semis, l2s = [], []
    refs = (2, 3, 4) if dim == 2 else (2, 3)
    for r in refs:
        mesh = Mesh.hyper_cube(dim, r)
        dofs = DoFHandler(mesh, p)
        u = u_exact(dofs.dof_coords)
        semis.append(integrate_difference(
            dofs, u, u_exact, norm="h1_semi", grad_exact=grad_exact))
        l2s.append(integrate_difference(dofs, u, u_exact))
        h1 = integrate_difference(
            dofs, u, u_exact, norm="h1", grad_exact=grad_exact)
        assert np.isclose(h1, np.hypot(semis[-1], l2s[-1]), rtol=1e-12)
    rate = np.log2(semis[-2] / semis[-1])
    assert p - 0.3 < rate < p + 0.7, (semis, rate)
    with pytest.raises(ValueError):
        integrate_difference(dofs, u, u_exact, norm="h1")
    with pytest.raises(ValueError):
        integrate_difference(dofs, u, u_exact, norm="max")
