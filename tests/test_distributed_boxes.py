"""Distributed box tier (tpufem.parallel.boxes) parity tests.

The slab-sharded box apply must equal the single-device BoxLaplaceOperator
bitwise-modulo-rounding: same arithmetic per shard on consistent inputs,
one shared-plane compress.  Runs on 8 virtual CPU devices (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.ops.boxes import BoxLaplaceOperator
from tpufem.parallel.boxes import DistributedBoxLaplace

RNG = np.random.default_rng(5)


def adaptive_mesh(dim, base, steps, center=0.31):
    mesh = Mesh.hyper_cube(dim, base)
    for _ in range(steps):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers - center, axis=1) < 0.35)
    return mesh


def _ops(dim, p, steps=2, base=2, n_shards=4, coefficient=None):
    mesh = adaptive_mesh(dim, base, steps)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    gop = BoxLaplaceOperator(mesh, dofs, constraints=ac,
                             coefficient=coefficient, dtype="float64")
    dop = DistributedBoxLaplace(gop, n_shards)
    return dofs, gop, dop


def test_local_roundtrip():
    dofs, gop, dop = _ops(2, 2)
    u = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    loc = dop.to_local(np.asarray(u))
    back = dop.from_local(loc)
    assert np.allclose(back, np.asarray(u), atol=0)


def test_owner_weights_count_each_dof_once():
    dofs, gop, dop = _ops(3, 2)
    w = np.asarray(dop.params["w_owner"], np.float64)  # (S, NL)
    ones = dop.to_local(np.asarray(gop.to_patch(np.ones(dofs.n_dofs))))
    # sum of owner weights over live slots == n_patch owners == n_dofs
    assert int(round(float((w * ones).sum()))) == dofs.n_dofs


@pytest.mark.parametrize("dim,p,shards", [
    (2, 1, 4), (2, 3, 4), (2, 2, 8), (3, 1, 4), (3, 2, 8)])
def test_distributed_vmult_parity(dim, p, shards):
    dofs, gop, dop = _ops(dim, p, n_shards=shards)
    x = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    y_ref = np.asarray(gop.vmult(x))
    xl = dop.put_vector(np.asarray(x))
    y = dop.from_local(np.asarray(dop.vmult(xl)))
    # compare on owner copies (global-space values)
    r = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert r < 1e-13, r


def test_distributed_vmult_variable_coefficient():
    coef = lambda x: 1.0 + 0.5 * np.cos(x[:, 0]) * np.sin(x[:, 1])
    dofs, gop, dop = _ops(2, 2, coefficient=coef)
    x = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    y_ref = np.asarray(gop.vmult(x))
    y = dop.from_local(np.asarray(dop.vmult(dop.put_vector(np.asarray(x)))))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13


def test_distributed_curved_adaptive_vmult():
    """transform x refinement: the global-general cell scheme, sharded."""
    mesh = adaptive_mesh(2, 2, 1)
    mesh.transform = lambda x: x + 0.06 * np.sin(np.pi * x[:, ::-1])
    dofs = DoFHandler(mesh, 2)
    ac = make_hanging_node_constraints(dofs)
    gop = BoxLaplaceOperator(mesh, dofs, constraints=ac, dtype="float64")
    assert gop._cell_scheme == "global-general"
    dop = DistributedBoxLaplace(gop, 4)
    x = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    y_ref = np.asarray(gop.vmult(x))
    y = dop.from_local(np.asarray(dop.vmult(dop.put_vector(np.asarray(x)))))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13


@pytest.mark.parametrize("dim,p", [(2, 2), (3, 2)])
def test_distributed_cg_matches_single_device(dim, p):
    """Iteration count identical, solution parity 1e-10 (SURVEY §3.6)."""
    dofs, gop, dop = _ops(dim, p, n_shards=4)
    mask = np.asarray(gop.interior_mask, np.float64)
    b = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    b = jnp.asarray(mask * np.asarray(b), jnp.float64)
    diag = gop.diagonal()
    ref = gop.cg_solve(b, diag, rtol=1e-10)
    bl = dop.put_vector(np.asarray(b))
    dl = jnp.asarray(dop.diagonal_local())
    res = dop.cg_solve(bl, dl, rtol=1e-10)
    assert int(res.iterations) == int(ref.iterations)
    x_ref = np.asarray(ref.x)
    x = dop.from_local(np.asarray(res.x))
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-9


def test_distributed_empty_slabs_are_harmless():
    """More shards than coarse z-slots: some shards get zero cells."""
    dofs, gop, dop = _ops(2, 1, steps=1, base=2, n_shards=8)
    x = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    y_ref = np.asarray(gop.vmult(x))
    y = dop.from_local(np.asarray(dop.vmult(dop.put_vector(np.asarray(x)))))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13


# ------------------------------------------------------ 2-axis (z x y)
@pytest.mark.parametrize("sz,sy,p", [(2, 2, 1), (2, 2, 2), (2, 4, 2)])
def test_distributed_vmult_parity_2axis(sz, sy, p):
    """z x y device-mesh sharding of the box tier (3D): corner lines on
    both cut sets reconcile through the two-phase exchange."""
    dofs, gop, _ = _ops(3, p, n_shards=1)
    dop = DistributedBoxLaplace(gop, shards=(sz, sy))
    x = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    y_ref = np.asarray(gop.vmult(x))
    y = dop.from_local(np.asarray(dop.vmult(dop.put_vector(np.asarray(x)))))
    r = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert r < 1e-13, r


def test_distributed_vmult_2axis_variable_coefficient():
    coef = lambda x: 1.0 + 0.5 * np.cos(x[:, 0]) * np.sin(x[:, 1] + x[:, 2])
    dofs, gop, _ = _ops(3, 2, n_shards=1, coefficient=coef)
    dop = DistributedBoxLaplace(gop, shards=(2, 2))
    x = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    y_ref = np.asarray(gop.vmult(x))
    y = dop.from_local(np.asarray(dop.vmult(dop.put_vector(np.asarray(x)))))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13


def test_distributed_cg_2axis_matches_single_device():
    dofs, gop, _ = _ops(3, 2, n_shards=1)
    dop = DistributedBoxLaplace(gop, shards=(2, 4))
    mask = np.asarray(gop.interior_mask, np.float64)
    b = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    b = jnp.asarray(mask * np.asarray(b), jnp.float64)
    diag = gop.diagonal()
    ref = gop.cg_solve(b, diag, rtol=1e-10)
    res = dop.cg_solve(dop.put_vector(np.asarray(b)),
                       jnp.asarray(dop.diagonal_local()), rtol=1e-10)
    assert int(res.iterations) == int(ref.iterations)
    x = dop.from_local(np.asarray(res.x))
    x_ref = np.asarray(ref.x)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-9


def test_distributed_2axis_roundtrip_and_owners():
    dofs, gop, _ = _ops(3, 2, n_shards=1)
    dop = DistributedBoxLaplace(gop, shards=(2, 2))
    u = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    back = dop.from_local(dop.to_local(np.asarray(u)))
    assert np.allclose(back, np.asarray(u), atol=0)
    w = np.asarray(dop.params["w_owner"], np.float64)
    ones = dop.to_local(np.asarray(gop.to_patch(np.ones(dofs.n_dofs))))
    assert int(round(float((w * ones).sum()))) == dofs.n_dofs


def test_distributed_2axis_curved_adaptive_vmult():
    """transform x refinement on a z x y mesh: per-qpoint packed metric
    sliced along both sharded axes (global-general scheme)."""
    mesh = adaptive_mesh(3, 2, 1)
    mesh.transform = lambda x: x + 0.05 * np.sin(
        np.pi * x[:, [1, 2, 0]])
    dofs = DoFHandler(mesh, 2)
    ac = make_hanging_node_constraints(dofs)
    gop = BoxLaplaceOperator(mesh, dofs, constraints=ac, dtype="float64")
    assert gop._cell_scheme == "global-general"
    dop = DistributedBoxLaplace(gop, shards=(2, 2))
    x = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    y_ref = np.asarray(gop.vmult(x))
    y = dop.from_local(np.asarray(dop.vmult(dop.put_vector(np.asarray(x)))))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13


def test_box_chebyshev_cg_single_and_distributed():
    """Chebyshev-preconditioned CG on the box tier (the reference's
    PreconditionChebyshev as a CG preconditioner): fewer iterations than
    Jacobi, same solution; distributed matches single-device counts."""
    dofs, gop, _ = _ops(3, 2, n_shards=1)
    mask = np.asarray(gop.interior_mask, np.float64)
    b = gop.to_patch(RNG.standard_normal(dofs.n_dofs))
    b = jnp.asarray(mask * np.asarray(b), jnp.float64)
    diag = gop.diagonal()
    jac = gop.cg_solve(b, diag, rtol=1e-10)
    che = gop.cg_solve(b, diag, rtol=1e-10, precond="chebyshev")
    assert bool(che.converged)
    assert int(che.iterations) < int(jac.iterations)
    xj, xc = np.asarray(jac.x), np.asarray(che.x)
    assert np.linalg.norm(xc - xj) / np.linalg.norm(xj) < 1e-8

    dop = DistributedBoxLaplace(gop, shards=(2, 2))
    res = dop.cg_solve(dop.put_vector(np.asarray(b)),
                       jnp.asarray(dop.diagonal_local()), rtol=1e-10,
                       precond="chebyshev")
    assert int(res.iterations) == int(che.iterations)
    x = dop.from_local(np.asarray(res.x))
    assert np.linalg.norm(x - xc) / np.linalg.norm(xc) < 1e-9


def test_make_cuts_raises_when_no_valid_interior_plane(monkeypatch):
    """When every interior coarse-aligned plane would strand a 2:1
    interface fill, construction must raise loudly instead of silently
    snapping the cut to the domain end (which would leave the requested
    extra shards EMPTY)."""
    mesh = adaptive_mesh(3, 2, 1)
    dofs = DoFHandler(mesh, 2)
    ac = make_hanging_node_constraints(dofs)
    gop = BoxLaplaceOperator(mesh, dofs, constraints=ac, dtype="float64")
    monkeypatch.setattr(DistributedBoxLaplace, "_cut_ok",
                        lambda self, ax, c: False)
    with pytest.raises(NotImplementedError, match="cut plane"):
        DistributedBoxLaplace(gop, shards=(2, 1))
