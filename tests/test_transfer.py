"""Mesh coarsening + SolutionTransfer (deal.II execute_coarsening /
SolutionTransfer analogues; the machinery behind time-dependent AMR)."""

import numpy as np
import pytest

from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.estimator import mark_refine_and_coarsen
from tpufem.fem.mesh import Mesh
from tpufem.fem.transfer import interpolate_solution

RNG = np.random.default_rng(3)


def _coverage_ok(mesh):
    """Every point of the domain covered exactly once."""
    fine = np.zeros(tuple([mesh.U] * mesh.dim), np.int32)
    for o, s in zip(mesh.origins, mesh.sizes):
        fine[tuple(slice(o[a], o[a] + s) for a in range(mesh.dim))] += 1
    return fine.min() == 1 and fine.max() == 1


@pytest.mark.parametrize("dim", [2, 3])
def test_coarsen_roundtrip(dim):
    m = Mesh.hyper_cube(dim, 2)
    m2 = m.refine(np.ones(m.n_cells, bool))
    m3 = m2.coarsen(np.ones(m2.n_cells, bool))
    assert m3.n_cells == m.n_cells
    assert _coverage_ok(m3)


def test_coarsen_partial_groups_vetoed():
    """A sibling group merges only when ALL 2^d children are flagged."""
    m = Mesh.hyper_cube(2, 1).refine(np.ones(4, bool))  # 16 cells
    flags = np.ones(16, bool)
    flags[0] = False  # break one group
    mc = m.coarsen(flags)
    assert mc.n_cells == 16 - 3 * 4 + 3  # three groups merge
    assert _coverage_ok(mc)


def test_coarsen_keeps_balance():
    mesh = Mesh.hyper_cube(2, 3)
    c = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
    mesh = mesh.refine(np.linalg.norm(c - 0.31, axis=1) < 0.2)
    mesh = mesh.refine(mesh.sizes == mesh.sizes.min())
    mc = mesh.coarsen(np.ones(mesh.n_cells, bool))
    assert mc.n_cells < mesh.n_cells
    assert not mc._unbalanced_cells().any()
    assert _coverage_ok(mc)


def test_refine_coarsen_preserve_curved_map():
    """refine/coarsen/balance must carry the exact-map attributes — the
    Q1 fallback silently degraded curved geometry before this fix."""
    s = Mesh.hyper_shell_2d(2)
    s2 = s.refine(np.arange(s.n_cells) < 4)
    assert s2.transform_jac is not None
    assert s2.separable_metric is not None
    s3 = s2.coarsen(np.ones(s2.n_cells, bool))
    assert s3.transform_jac is not None


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 3), (3, 2)])
def test_transfer_exact_under_refinement(dim, p):
    """FE spaces nest under refinement: transfer of any FE function is
    exact; a degree-<=p polynomial stays exact through hanging nodes."""
    m = Mesh.hyper_cube(dim, 2)
    d0 = DoFHandler(m, p)
    m1 = m.refine(RNG.random(m.n_cells) < 0.4)
    d1 = DoFHandler(m1, p)
    coef = np.arange(1.0, dim + 1.0)
    u1 = interpolate_solution(d0, d0.dof_coords @ coef + 0.5, d1)
    assert np.abs(u1 - (d1.dof_coords @ coef + 0.5)).max() < 1e-11
    u0 = RNG.standard_normal(d0.n_dofs)
    uid = interpolate_solution(d0, u0, d0)
    assert np.abs(uid - u0).max() < 1e-11


def test_transfer_exact_linear_under_coarsening():
    m = Mesh.hyper_cube(2, 3)
    c = (m.origins + m.sizes[:, None] * 0.5) / m.U
    m1 = m.refine(np.linalg.norm(c - 0.31, axis=1) < 0.3)
    d1 = DoFHandler(m1, 2)
    ac1 = make_hanging_node_constraints(d1)
    coef = np.array([2.0, 3.0])
    u1 = ac1.distribute(d1.dof_coords @ coef + 1.0)
    m2 = m1.coarsen(np.ones(m1.n_cells, bool))
    d2 = DoFHandler(m2, 2)
    u2 = interpolate_solution(d1, u1, d2)
    assert np.abs(u2 - (d2.dof_coords @ coef + 1.0)).max() < 1e-11


def test_transfer_approximates_under_coarsening():
    """Coarsening a smooth non-polynomial field: transfer = pointwise
    interpolation, error O(h^{p+1}) not machine eps."""
    m1 = Mesh.hyper_cube(2, 4)
    d1 = DoFHandler(m1, 1)
    x = d1.dof_coords
    u1 = np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    m2 = m1.coarsen(np.ones(m1.n_cells, bool))
    d2 = DoFHandler(m2, 1)
    u2 = interpolate_solution(d1, u1, d2)
    y = d2.dof_coords
    exact = np.sin(np.pi * y[:, 0]) * np.sin(np.pi * y[:, 1])
    err = np.abs(u2 - exact).max()
    assert err < 1e-11  # support points of the coarse mesh are old nodes


def test_mark_refine_and_coarsen():
    eta = np.array([5.0, 1.0, 4.0, 0.5, 3.0, 2.0])
    r, c = mark_refine_and_coarsen(eta, 0.34, 0.34)
    assert r.tolist() == [True, False, True, False, True, False]
    assert c.tolist() == [False, True, False, True, False, False]
    assert not (r & c).any()
