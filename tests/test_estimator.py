"""Kelly error estimator + solve->estimate->mark->refine AMR loop.

The reference repo refines by a fixed geometric criterion only
(SURVEY.md §3.1 "adaptive variant"); tpufem adds the standard deal.II
KellyErrorEstimator / GridRefinement workflow (step-6).  These tests
pin: exactness on continuous-gradient fields, the h^p indicator rate,
effectivity vs the true H1 error, marker localization, and that the
full AMR loop beats uniform refinement on a peaked solution.
"""

import numpy as np
import pytest

from tpufem.apps.poisson import solve_poisson, solve_poisson_amr
from tpufem.fem.assemble import integrate_errors
from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.estimator import kelly_estimate, mark_fixed_fraction
from tpufem.fem.mesh import Mesh


def _adaptive_mesh(dim, base_ref, steps, center=0.31):
    mesh = Mesh.hyper_cube(dim, base_ref)
    for _ in range(steps):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers - center, axis=1) < 0.35)
    return mesh


# Gaussian peak at an off-grid point: the localization/AMR workload
_A = 100.0
_C2 = np.array([0.31, 0.72])


def _peak(x):
    return np.exp(-_A * ((x - _C2) ** 2).sum(axis=1))


def _peak_rhs(x):
    r2 = ((x - _C2) ** 2).sum(axis=1)
    return (2 * _A * x.shape[1] - 4 * _A * _A * r2) * _peak(x)


def _peak_grad(x):
    return -2 * _A * (x - _C2) * _peak(x)[:, None]


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 3), (3, 2)])
def test_zero_on_linear(dim, p):
    """A globally linear FE function has a continuous gradient -> every
    face jump (incl. across 2:1 hanging faces) is zero."""
    mesh = _adaptive_mesh(dim, 2 if dim == 2 else 1, 2 if dim == 2 else 1)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    assert len(ac.lines) > 0
    pts = dofs.dof_coords
    u = ac.distribute(pts @ np.arange(1.0, dim + 1.0) + 0.5)
    eta = kelly_estimate(dofs, u)
    assert eta.max() < 1e-12


def test_h_rate_p1():
    """For the p=1 interpolant of a smooth function the face gradient
    jumps are O(h), so total eta halves per uniform refinement."""
    tot = []
    for r in (4, 5, 6):
        m = Mesh.hyper_cube(2, r)
        dh = DoFHandler(m, 1)
        x = dh.dof_coords
        u = np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
        e = kelly_estimate(dh, u)
        tot.append(np.sqrt((e**2).sum()))
    rates = [tot[i] / tot[i + 1] for i in range(2)]
    assert all(1.7 < r < 2.3 for r in rates), rates


def test_higher_p_decays_faster():
    tot = []
    for r in (3, 4):
        m = Mesh.hyper_cube(2, r)
        dh = DoFHandler(m, 2)
        x = dh.dof_coords
        u = np.sin(np.pi * x[:, 0]) * np.exp(x[:, 1])
        e = kelly_estimate(dh, u)
        tot.append(np.sqrt((e**2).sum()))
    assert tot[0] / tot[1] > 3.2  # at least ~h^p with p=2


def test_effectivity_vs_h1_error():
    """eta bounds the H1 seminorm error up to a modest constant
    (classic Kelly effectivity ~1-3 for Poisson/Q1)."""
    effs = []
    for r in (4, 5):
        res = solve_poisson(dim=2, degree=1, refine=r,
                            exact=_peak, rhs=_peak_rhs)
        eta = kelly_estimate(res.dofs, res.solution)
        tot = np.sqrt((eta**2).sum())
        _, h1 = integrate_errors(res.dofs, res.solution, _peak, _peak_grad)
        effs.append(tot / h1)
    assert all(1.0 < e < 5.0 for e in effs), effs
    # asymptotic stability: the index must not blow up under refinement
    assert abs(effs[1] - effs[0]) < 1.0


def test_marking_localizes_at_peak():
    m = Mesh.hyper_cube(2, 4)
    dh = DoFHandler(m, 1)
    x = dh.dof_coords
    eta = kelly_estimate(dh, _peak(x))
    flags = mark_fixed_fraction(eta, 0.1)
    n = int(np.ceil(0.1 * m.n_cells))
    assert n <= flags.sum() <= n + 4  # ties may add a few
    cen = (m.origins + m.sizes[:, None] * 0.5) / m.U
    assert np.linalg.norm(cen[flags] - _C2, axis=1).max() < 0.25


def test_mark_fixed_fraction_counts():
    eta = np.array([5.0, 1.0, 4.0, 0.5, 3.0, 2.0])
    flags = mark_fixed_fraction(eta, 0.34)  # ceil(0.34 * 6) = 3 cells
    assert flags.tolist() == [True, False, True, False, True, False]
    assert mark_fixed_fraction(eta, 0.01).sum() == 1  # never zero cells


def test_amr_loop_beats_uniform():
    """5 Kelly-driven cycles on the peak problem: error drops >10x from
    the initial mesh and beats uniform refinement at fewer DoFs."""
    rs = solve_poisson_amr(dim=2, degree=1, refine=3, cycles=5,
                           fraction=0.25, exact=_peak, rhs=_peak_rhs)
    assert rs[-1].n_cells > rs[0].n_cells
    assert rs[-1].l2_error < rs[0].l2_error / 10.0
    uni = solve_poisson(dim=2, degree=1, refine=5,
                        exact=_peak, rhs=_peak_rhs)
    assert rs[-1].n_dofs < uni.n_dofs
    assert rs[-1].l2_error < uni.l2_error


def test_amr_loop_curved_shell():
    """The loop composes with the curved (general-metric) tier: Kelly on
    the physical normals of the annulus map, refinement through the
    curved-adaptive box path."""
    rs = solve_poisson_amr(dim=2, degree=2, refine=2, cycles=3,
                           fraction=0.3, mesh_kind="shell")
    assert rs[-1].n_cells > rs[0].n_cells
    assert rs[-1].l2_error < rs[0].l2_error
