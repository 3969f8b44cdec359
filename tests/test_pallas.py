"""Pallas fused-kernel parity (interpret mode on CPU).

The compiled path is exercised on the real chip by bench.py / bmop; here
the kernel logic is validated bit-exactly against the XLA separable tier.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.ops.pallas_separable import PallasSeparable
from tpufem.ops.separable import global_1d_matrices, laplace_apply_separable


@pytest.mark.parametrize("dim,p,n,tile", [
    (2, 1, 8, 8), (2, 3, 8, 16), (3, 2, 4, 8), (3, 4, 4, 8),
])
def test_pallas_matches_separable(dim, p, n, tile):
    npts = n * p + 1
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    Ks_np = [np.asarray(K1u / h)] * dim
    Ms_np = [np.asarray(M1u * h)] * dim
    Ks = [jnp.asarray(K1u / h)] * dim
    Ms = [jnp.asarray(M1u * h)] * dim
    rng = np.random.default_rng(0)
    u = rng.standard_normal(npts**dim)
    y_ref = np.asarray(
        laplace_apply_separable(jnp.asarray(u), dim, npts, Ks, Ms)
    )
    pk = PallasSeparable(dim, npts, p, Ks_np, Ms_np, "float64", tile=tile,
                         interpret=True)
    y = np.asarray(pk(jnp.asarray(u)))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13


def test_pallas_matches_assembled_oracle():
    """Direct parity with the assembled matrix (independent of the XLA
    separable implementation)."""
    from tpufem.fem.assemble import assemble_laplace
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh

    dim, p, r = 2, 2, 3
    n = 1 << r
    npts = n * p + 1
    mesh = Mesh.hyper_cube(dim, r)
    dofs = DoFHandler(mesh, p)
    K = assemble_laplace(dofs)
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    pk = PallasSeparable(dim, npts, p, [np.asarray(K1u / h)] * dim,
                         [np.asarray(M1u * h)] * dim, "float64", tile=16,
                         interpret=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(dofs.n_dofs)
    y = np.asarray(pk(jnp.asarray(x)))
    assert np.linalg.norm(y - K @ x) / np.linalg.norm(K @ x) < 1e-12


# ---------------------------------------------------------------------
# solver-resident kernel (halo'd layout in/out, VERDICT r1 item 2)
# ---------------------------------------------------------------------
from tpufem.ops.pallas_separable import ResidentSeparable  # noqa: E402


@pytest.mark.parametrize("p,n,tile", [(2, 8, 8), (4, 4, 8), (3, 8, 24),
                                      (5, 4, 16), (7, 4, 16), (5, 8, 16),
                                      (6, 4, 24), (8, 4, 16), (1, 16, 8)])
def test_resident_matches_separable_and_chains(p, n, tile):
    npts = n * p + 1
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    Ks_np = [np.asarray(K1u / h)] * 3
    Ms_np = [np.asarray(M1u * h)] * 3
    Ks = [jnp.asarray(K1u / h)] * 3
    Ms = [jnp.asarray(M1u * h)] * 3
    rng = np.random.default_rng(0)
    u = rng.standard_normal(npts**3)
    ref = lambda v: laplace_apply_separable(v, 3, npts, Ks, Ms)
    y_ref = np.asarray(ref(jnp.asarray(u)))
    rk = ResidentSeparable(npts, p, Ks_np, Ms_np, "float64", tile=tile,
                           interpret=True)
    y = np.asarray(rk(jnp.asarray(u)))
    nrm = np.linalg.norm(y_ref)
    assert np.linalg.norm(y - y_ref) / nrm < 1e-13
    # chainability: output layout is directly consumable as input —
    # halo/overhang zeros must be maintained KERNEL-side
    gp = rk.pad(jnp.asarray(u))
    y1 = rk.raw(gp)
    hz = np.asarray(y1).copy()
    hz[rk.p : rk.p + npts, rk.H : rk.H + npts, :npts] = 0.0
    assert np.all(hz == 0.0), "halo/overhang not zeroed by the kernel"
    y2 = np.asarray(rk.unpad(rk.raw(y1)))
    y2_ref = np.asarray(ref(ref(jnp.asarray(u))))
    assert np.linalg.norm(y2 - y2_ref) / np.linalg.norm(y2_ref) < 1e-12


@pytest.mark.parametrize("p,n,tile", [(2, 8, 8), (4, 4, 8), (3, 8, 24),
                                      (5, 4, 16)])
def test_resident_dirichlet_fused(p, n, tile):
    """dirichlet=True fuses y = m·A(m·x) + (1-m)·x into the kernel
    (separable iota masks — the round-2 verdict's Jacobi-CG lever);
    output must match the flat mask algebra around the plain resident
    kernel to rounding, and the zero-halo chain invariant must hold."""
    npts = n * p + 1
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    Ks_np = [np.asarray(K1u / h)] * 3
    Ms_np = [np.asarray(M1u * h)] * 3
    rng = np.random.default_rng(5)
    u = rng.standard_normal(npts**3)
    # flat-space reference: mask algebra around the plain kernel
    rk0 = ResidentSeparable(npts, p, Ks_np, Ms_np, "float64", tile=tile,
                            interpret=True)
    g = np.arange(npts)
    m1 = ((g != 0) & (g != npts - 1)).astype(np.float64)
    m = (m1[:, None, None] * m1[None, :, None]
         * m1[None, None, :]).reshape(-1)
    y_ref = m * np.asarray(rk0(jnp.asarray(m * u))) + (1.0 - m) * u
    rkd = ResidentSeparable(npts, p, Ks_np, Ms_np, "float64", tile=tile,
                            interpret=True, dirichlet=True)
    assert rkd.dirichlet
    y = np.asarray(rkd(jnp.asarray(u)))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13
    # chainability: halo/overhang zeros maintained kernel-side
    y1 = rkd.raw(rkd.pad(jnp.asarray(u)))
    hz = np.asarray(y1).copy()
    hz[rkd.p : rkd.p + npts, rkd.H : rkd.H + npts, :npts] = 0.0
    assert np.all(hz == 0.0)
    y2 = np.asarray(rkd.unpad(rkd.raw(y1)))
    y2_ref = (m * np.asarray(rk0(jnp.asarray(m * y_ref)))
              + (1.0 - m) * y_ref)
    assert np.linalg.norm(y2 - y2_ref) / np.linalg.norm(y2_ref) < 1e-13


@pytest.mark.parametrize("p,n", [(2, 16), (4, 8)])
def test_resident_bf16_storage_mode(p, n):
    """bf16s mode: vectors stored bf16 (the DMA-halving lever), f32
    compute — accuracy must stay in the input-quantization class
    (~1e-2 rel), layout invariants identical to f32 mode."""
    npts = n * p + 1
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    Ks_np = [np.asarray(K1u / h)] * 3
    Ms_np = [np.asarray(M1u * h)] * 3
    Ks = [jnp.asarray(K1u / h)] * 3
    Ms = [jnp.asarray(M1u * h)] * 3
    rng = np.random.default_rng(2)
    u = rng.standard_normal(npts**3)
    y_ref = np.asarray(laplace_apply_separable(jnp.asarray(u), 3, npts,
                                               Ks, Ms))
    rk = ResidentSeparable(npts, p, Ks_np, Ms_np, "float32", mode="bf16s",
                           interpret=True)
    assert rk.dt == jnp.dtype(jnp.bfloat16)  # storage dtype
    gp = rk.pad(jnp.asarray(u, jnp.float32))
    y1 = rk.raw(gp)
    assert y1.dtype == jnp.dtype(jnp.bfloat16)
    y = np.asarray(rk.unpad(y1), np.float64)
    nrm = np.linalg.norm(y_ref)
    assert np.linalg.norm(y - y_ref) / nrm < 2e-2
    # kernel-side halo/overhang zeroing (chainability)
    hz = np.asarray(y1, np.float32).copy()
    hz[rk.p : rk.p + npts, rk.H : rk.H + npts, :npts] = 0.0
    assert np.all(hz == 0.0), "halo/overhang not zeroed by the kernel"


def test_resident_cg_matches_flat_cg():
    """Whole solve in the halo'd layout: same iteration count and
    solution as the flat-vector CG."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.solvers.resident import resident_jacobi_cg
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_cube(3, 4)  # 16 cells/axis -> npts 33, 2 tiles
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(
        mesh, dofs,
        FemConfig(3, 2, scatter="separable", use_pallas=True),
    )
    assert mf.resident is not None
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    rng = np.random.default_rng(3)
    mask = np.asarray(mf.interior_mask)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs))

    res_flat = cg_solve(op.vmult, b, M_inv=make_jacobi(diag), rtol=1e-8,
                        maxiter=400)
    res_r = resident_jacobi_cg(op, b, diag=diag, rtol=1e-8, maxiter=400)
    assert int(res_r.iterations) == int(res_flat.iterations)
    xr, xf = np.asarray(res_r.x), np.asarray(res_flat.x)
    assert np.linalg.norm(xr - xf) <= 1e-8 * max(np.linalg.norm(xf), 1.0)


def test_resident_cg_fused_dirichlet_matches_flat():
    """Whole solve with the mask algebra fused INTO the kernel
    (pallas_dirichlet=True): identical trajectory to the flat CG."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.solvers.resident import resident_jacobi_cg
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_cube(3, 4)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(
        mesh, dofs,
        FemConfig(3, 2, scatter="separable", use_pallas=True,
                  pallas_dirichlet=True),
    )
    assert mf.resident is not None and mf.resident.dirichlet
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    rng = np.random.default_rng(3)
    mask = np.asarray(mf.interior_mask)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs))

    res_flat = cg_solve(op.vmult, b, M_inv=make_jacobi(diag), rtol=1e-8,
                        maxiter=400)
    res_r = resident_jacobi_cg(op, b, diag=diag, rtol=1e-8, maxiter=400)
    assert int(res_r.iterations) == int(res_flat.iterations)
    xr, xf = np.asarray(res_r.x), np.asarray(res_flat.x)
    assert np.linalg.norm(xr - xf) <= 1e-8 * max(np.linalg.norm(xf), 1.0)


def test_resident_gmg_cg_matches_flat():
    """Fine-level-resident V-cycle CG: same iterations as the flat path."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.solvers.cg import cg_solve
    from tpufem.solvers.multigrid import GeometricMultigrid
    from tpufem.solvers.resident import resident_gmg_cg

    mg = GeometricMultigrid(3, 2, 4, coarsest_refine=2, use_pallas=True)
    assert mg.resident_context() is not None
    dofs = DoFHandler(Mesh.hyper_cube(3, 4), 2)
    rng = np.random.default_rng(5)
    mask = np.asarray(mg.fine.mask)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs))

    res_flat = cg_solve(mg.fine.op.vmult, b, M_inv=mg.preconditioner(),
                        rtol=1e-8, maxiter=100)
    res_r = resident_gmg_cg(mg, b, rtol=1e-8, maxiter=100)
    assert int(res_r.iterations) == int(res_flat.iterations)
    xr, xf = np.asarray(res_r.x), np.asarray(res_flat.x)
    assert np.linalg.norm(xr - xf) <= 1e-8 * max(np.linalg.norm(xf), 1.0)


def test_fused_dirichlet_rejects_nonstandard_masks():
    """pallas_dirichlet bakes the FULL-boundary mask into the kernel;
    any other constraint set must be rejected at build time, not
    silently mis-masked (review finding)."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_cube(3, 4)
    dofs = DoFHandler(mesh, 2)
    bad = dofs.boundary_mask.copy()
    bad[np.flatnonzero(~bad)[0]] = True  # one extra constrained DoF
    with pytest.raises(ValueError, match="pallas_dirichlet"):
        MatrixFree.build(
            mesh, dofs,
            FemConfig(3, 2, scatter="separable", use_pallas=True,
                      pallas_dirichlet=True),
            constrained_mask=bad)


def test_resident_gmg_cg_fused_dirichlet_matches_flat():
    """Fine-level-resident V-cycle CG with the fused-mask kernel: same
    iterations/solution as the flat-algebra path."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.solvers.cg import cg_solve
    from tpufem.solvers.multigrid import GeometricMultigrid
    from tpufem.solvers.resident import resident_gmg_cg

    mg = GeometricMultigrid(3, 2, 4, coarsest_refine=2, use_pallas=True,
                            pallas_dirichlet=True)
    assert mg.fine.mf.resident.dirichlet
    assert mg.resident_context() is not None
    dofs = DoFHandler(Mesh.hyper_cube(3, 4), 2)
    rng = np.random.default_rng(5)
    mask = np.asarray(mg.fine.mask)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs))

    res_flat = cg_solve(mg.fine.op.vmult, b, M_inv=mg.preconditioner(),
                        rtol=1e-8, maxiter=100)
    res_r = resident_gmg_cg(mg, b, rtol=1e-8, maxiter=100)
    assert int(res_r.iterations) == int(res_flat.iterations)
    xr, xf = np.asarray(res_r.x), np.asarray(res_flat.x)
    assert np.linalg.norm(xr - xf) <= 1e-8 * max(np.linalg.norm(xf), 1.0)


def test_resident_cg_bf16s_true_residual_honest():
    """bf16s-mode solve: x/r stay f32 (quantizing them leaves a ~4e-2
    true residual) and the RETURNED residual/converged come from the
    true residual b - A(x) — the kernel's bf16-quantized output floors
    convergence near ~1e-3, and the result must say so rather than
    echo the drifted recurrence residual."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.resident import resident_jacobi_cg
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_cube(3, 4)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(
        mesh, dofs,
        FemConfig(3, 2, scatter="separable", use_pallas=True,
                  dtype="float32", pallas_mode="bf16s"),
    )
    assert mf.resident is not None
    assert str(jnp.dtype(mf.resident.dt)) == "bfloat16"
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    rng = np.random.default_rng(3)
    mask = np.asarray(mf.interior_mask, np.float64)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs), jnp.float32)

    rtol = 1e-5
    res = resident_jacobi_cg(op, b, diag=diag, rtol=rtol, maxiter=400)
    x = jnp.asarray(np.asarray(res.x), jnp.float32)
    assert x.dtype == jnp.float32  # solution returned in compute dtype
    tr = np.asarray(b) - np.asarray(op.vmult(x))
    rel = np.linalg.norm(tr) / np.linalg.norm(np.asarray(b))
    bn = np.linalg.norm(np.asarray(b))
    # the REPORTED residual is the true residual (recomputed through the
    # bf16s apply, so it agrees with the f32-apply true residual only to
    # the operator's own quantization — same order, not the 1e-5 of the
    # drifted recurrence)
    rep = float(res.residual) / bn
    assert rel / 2 < rep < rel * 2, (rep, rel)
    assert bool(res.converged) == (float(res.residual)
                                   <= rtol * bn), "converged must be honest"
    # x/r kept f32: solution is solve-quality at the bf16-operator floor
    assert rel < 2e-2, rel
    # loose-tolerance use: the same solve at rtol 3e-2 must converge
    res2 = resident_jacobi_cg(op, b, diag=diag, rtol=3e-2, maxiter=400)
    assert bool(res2.converged)


def test_flat_cg_p_bf16_storage():
    """cg_solve(p_dtype=bf16): converges with an honest true residual and
    ~the same iteration count as full-f32."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_cube(3, 3)
    dofs = DoFHandler(mesh, 3)
    mf = MatrixFree.build(mesh, dofs,
                          FemConfig(3, 3, dtype="float32",
                                    scatter="separable"))
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    rng = np.random.default_rng(11)
    mask = np.asarray(mf.interior_mask, np.float64)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs), jnp.float32)

    rtol = 1e-5
    ref = cg_solve(op.vmult, b, M_inv=make_jacobi(diag), rtol=rtol)
    res = cg_solve(lambda p: op.vmult(p.astype(jnp.float32)), b,
                   M_inv=make_jacobi(diag), rtol=rtol,
                   p_dtype=jnp.bfloat16)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 10
    tr = np.asarray(b) - np.asarray(op.vmult(res.x.astype(jnp.float32)))
    rel = np.linalg.norm(tr) / np.linalg.norm(np.asarray(b))
    assert rel < 5 * rtol, rel


def test_pallas_dirichlet_auto_default():
    """pallas_dirichlet=None (the default) fuses the boundary mask into
    the resident kernel exactly when the constraint set is the plain
    full-boundary Dirichlet mask, and silently falls back to the flat
    mask algebra for any other constrained_mask (where True would
    raise)."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_cube(3, 4)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(
        mesh, dofs,
        FemConfig(3, 2, scatter="separable", use_pallas=True))
    assert mf.resident is not None and mf.resident.dirichlet

    bad = dofs.boundary_mask.copy()
    bad[np.flatnonzero(~bad)[0]] = True  # one extra constrained DoF
    mf2 = MatrixFree.build(
        mesh, dofs,
        FemConfig(3, 2, scatter="separable", use_pallas=True),
        constrained_mask=bad)
    assert mf2.resident is not None and not mf2.resident.dirichlet


def test_track_best_false_converging_parity():
    """track_best=False drops the best-iterate carry (a pure HBM-traffic
    lever); a CONVERGING solve must return the identical iterate and
    iteration count, flat and resident."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.solvers.resident import resident_jacobi_cg
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_cube(3, 4)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(
        mesh, dofs,
        FemConfig(3, 2, dtype="float32", scatter="separable",
                  use_pallas=True))
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    rng = np.random.default_rng(9)
    mask = np.asarray(mf.interior_mask, np.float64)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs), jnp.float32)

    ref = cg_solve(op.vmult, b, M_inv=make_jacobi(diag), rtol=1e-5)
    off = cg_solve(op.vmult, b, M_inv=make_jacobi(diag), rtol=1e-5,
                   track_best=False)
    assert bool(ref.converged) and bool(off.converged)
    assert int(ref.iterations) == int(off.iterations)
    assert np.array_equal(np.asarray(ref.x), np.asarray(off.x))

    r_on = resident_jacobi_cg(op, b, diag=diag, rtol=1e-5)
    r_off = resident_jacobi_cg(op, b, diag=diag, rtol=1e-5,
                               track_best=False)
    assert bool(r_on.converged) and bool(r_off.converged)
    assert int(r_on.iterations) == int(r_off.iterations)
    assert np.array_equal(np.asarray(r_on.x), np.asarray(r_off.x))


# ---------------------------------------------------------------------
# resident TERMS kernel: exact per-row bands for sum-of-tensor-product
# operators (curved orthogonal shells / graded grids — VERDICT r4 item 3)
# ---------------------------------------------------------------------
from tpufem.ops.pallas_separable import ResidentTerms  # noqa: E402
from tpufem.ops.separable import (  # noqa: E402
    global_1d_weighted,
    laplace_apply_separable_terms,
)


def _weighted_terms(p, n, nq1, dim=3):
    """Distinct smooth 1D weights per (term, axis): the structure of an
    orthogonal-shell metric, with no shared matrices between terms."""
    wfs = [lambda x: 1.0 + 0.5 * np.sin(2.3 * x + 0.2),
           lambda x: 1.2 + x,
           lambda x: 0.7 + 0.3 * np.cos(1.7 * x)]
    return [[global_1d_weighted(p, n, nq1, wfs[(a + b) % 3],
                                "K" if b == a else "M")
             for b in range(dim)] for a in range(dim)]


@pytest.mark.parametrize("p,n,tile", [(2, 8, 8), (4, 4, 8), (3, 8, 24),
                                      (5, 4, 16)])
def test_resident_terms_matches_xla_terms_and_chains(p, n, tile):
    npts = n * p + 1
    terms = _weighted_terms(p, n, p + 1)
    tj = [[jnp.asarray(m) for m in t3] for t3 in terms]
    ref = lambda v: laplace_apply_separable_terms(v, 3, npts, tj)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(npts**3)
    y_ref = np.asarray(ref(jnp.asarray(u)))
    rk = ResidentTerms(npts, p, terms, "float64", tile=tile,
                       interpret=True)
    y = np.asarray(rk(jnp.asarray(u)))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13
    # chainability: halo/overhang zeros maintained kernel-side
    y1 = rk.raw(rk.pad(jnp.asarray(u)))
    hz = np.asarray(y1).copy()
    hz[rk.p : rk.p + npts, rk.H : rk.H + npts, :npts] = 0.0
    assert np.all(hz == 0.0), "halo/overhang not zeroed by the kernel"
    y2 = np.asarray(rk.unpad(rk.raw(y1)))
    y2_ref = np.asarray(ref(ref(jnp.asarray(u))))
    assert np.linalg.norm(y2 - y2_ref) / np.linalg.norm(y2_ref) < 1e-12


def test_shell_separable_pallas_vmult_parity():
    """A 3D spherical-shell build with use_pallas=True must route the
    separable-metric tier through the ResidentTerms kernel and match the
    XLA terms apply to rounding."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_shell_3d(3)
    dofs = DoFHandler(mesh, 2)
    cfgs = dict(dim=3, degree=2, dtype="float64", scatter="separable")
    mf_x = MatrixFree.build(mesh, dofs, FemConfig(**cfgs))
    mf_p = MatrixFree.build(mesh, dofs,
                            FemConfig(**cfgs, use_pallas=True))
    assert len(mf_p.sep_ops) == 3 and isinstance(
        mf_p.sep_ops[2], ResidentTerms)
    assert mf_p.resident is not None
    op_x, op_p = LaplaceOperator(mf_x), LaplaceOperator(mf_p)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(dofs.n_dofs))
    y_x = np.asarray(op_x.vmult_raw(x))
    y_p = np.asarray(op_p.vmult_raw(x))
    assert np.linalg.norm(y_p - y_x) / np.linalg.norm(y_x) < 1e-13
    # constrained apply parity too (mask algebra around the kernel)
    y_x = np.asarray(op_x.vmult(x))
    y_p = np.asarray(op_p.vmult(x))
    assert np.linalg.norm(y_p - y_x) / np.linalg.norm(y_x) < 1e-13


def test_shell_resident_cg_matches_flat():
    """resident_jacobi_cg on a shell (ResidentTerms kernel): same
    iteration count and solution as the flat CG."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.solvers.resident import resident_jacobi_cg
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_shell_3d(3)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(
        mesh, dofs,
        FemConfig(3, 2, scatter="separable", use_pallas=True))
    assert mf.resident is not None
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    rng = np.random.default_rng(4)
    mask = np.asarray(mf.interior_mask)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs))

    res_flat = cg_solve(op.vmult, b, M_inv=make_jacobi(diag), rtol=1e-8,
                        maxiter=400)
    res_r = resident_jacobi_cg(op, b, diag=diag, rtol=1e-8, maxiter=400)
    assert int(res_r.iterations) == int(res_flat.iterations)
    xr, xf = np.asarray(res_r.x), np.asarray(res_flat.x)
    assert np.linalg.norm(xr - xf) <= 1e-8 * max(np.linalg.norm(xf), 1.0)


from tpufem.ops.pallas_separable import ResidentTerms2D  # noqa: E402


@pytest.mark.parametrize("p,n,tile", [(2, 16, 16), (4, 8, 16), (3, 8, 8)])
def test_resident_2d_matches_separable_and_chains(p, n, tile):
    """2D resident terms kernel (VERDICT r4 item 6: the 2D fast tier):
    parity with the XLA separable apply + chainable halo invariant."""
    npts = n * p + 1
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    Kx, Mx = np.asarray(K1u / h), np.asarray(M1u * h)
    Ks = [jnp.asarray(Kx)] * 2
    Ms = [jnp.asarray(Mx)] * 2
    rng = np.random.default_rng(0)
    u = rng.standard_normal(npts**2)
    ref = lambda v: laplace_apply_separable(v, 2, npts, Ks, Ms)
    y_ref = np.asarray(ref(jnp.asarray(u)))
    rk = ResidentTerms2D(npts, p, [[Kx, Mx], [Mx, Kx]], "float64",
                         tile=tile, interpret=True)
    y = np.asarray(rk(jnp.asarray(u)))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13
    y1 = rk.raw(rk.pad(jnp.asarray(u)))
    hz = np.asarray(y1).copy()
    hz[rk.H : rk.H + npts, :npts] = 0.0
    assert np.all(hz == 0.0), "halo/overhang not zeroed by the kernel"
    y2 = np.asarray(rk.unpad(rk.raw(y1)))
    y2_ref = np.asarray(ref(ref(jnp.asarray(u))))
    assert np.linalg.norm(y2 - y2_ref) / np.linalg.norm(y2_ref) < 1e-12


def test_resident_2d_shell_terms_parity():
    """2D annulus wedge through the 2D terms kernel."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_shell_2d(4)
    dofs = DoFHandler(mesh, 2)
    cfgs = dict(dim=2, degree=2, dtype="float64", scatter="separable")
    mf_x = MatrixFree.build(mesh, dofs, FemConfig(**cfgs))
    mf_p = MatrixFree.build(mesh, dofs,
                            FemConfig(**cfgs, use_pallas=True))
    assert isinstance(mf_p.sep_ops[2], ResidentTerms2D)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(dofs.n_dofs))
    y_x = np.asarray(LaplaceOperator(mf_x).vmult_raw(x))
    y_p = np.asarray(LaplaceOperator(mf_p).vmult_raw(x))
    assert np.linalg.norm(y_p - y_x) / np.linalg.norm(y_x) < 1e-13


@pytest.mark.parametrize("p,n,tile,mode", [
    (4, 40, 64, "f32"), (3, 50, 64, "f32"),
    (4, 40, 64, "bf16s"), (4, 40, 64, "bf16")])
def test_resident_2d_block_x_matches_dense(p, n, tile, mode):
    """Block-tridiagonal x path (ROADMAP r4 gap 3 — large 2D grids):
    parity with the dense K-stacked x path at every mode, plus the
    chainable halo invariant.  The block path dedupes the O(p) unique
    128-lane column blocks of the banded x operators and streams the
    per-tile band table through the grid pipeline (a VMEM-resident
    table lane-pads its singleton dim 128x — measured Mosaic stack
    overflow at npts ~ 4k on chip)."""
    from tpufem.ops.pallas_separable import _xblocks

    npts = n * p + 1
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    Kx, Mx = np.asarray(K1u / h), np.asarray(M1u * h)
    terms = [[Kx, Mx], [Mx, Kx]]
    dt = "float64" if mode == "f32" else "float32"
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(npts**2), dt)
    kd = ResidentTerms2D(npts, p, terms, dt, tile=tile, mode=mode,
                         interpret=True, x_mode="dense")
    kb = ResidentTerms2D(npts, p, terms, dt, tile=tile, mode=mode,
                         interpret=True, x_mode="block")
    yd, yb = np.asarray(kd(u), np.float64), np.asarray(kb(u), np.float64)
    tol = 1e-13 if mode == "f32" else 2e-3
    assert np.linalg.norm(yb - yd) / np.linalg.norm(yd) < tol
    # uniform grid => interior column blocks dedupe to O(p) classes
    X = 128 * (-(-npts // 128))
    ops, groups = _xblocks([t2[0] for t2 in terms], X, npts)
    assert ops.shape[0] <= 2 * p + 4
    assert sorted(j for g in groups for j in g) == list(range(X // 128))
    # chainable halo invariant (block path)
    y1 = kb.raw(kb.pad(u))
    hz = np.asarray(y1).copy()
    hz[kb.H : kb.H + npts, :npts] = 0.0
    assert np.all(hz == 0.0), "halo/overhang not zeroed by the kernel"
    y2 = np.asarray(kb.unpad(kb.raw(y1)), np.float64)
    y2_ref = np.asarray(kd.unpad(kd.raw(kd.pad(u))), np.float64)
    y2d = np.asarray(kd.unpad(kd.raw(kd.pad(jnp.asarray(y2_ref, dt)))),
                     np.float64)
    y2b = np.asarray(kb.unpad(kb.raw(y1)), np.float64)
    assert np.linalg.norm(y2b - y2d) / np.linalg.norm(y2d) < (
        1e-12 if mode == "f32" else 5e-3)


def test_resident_2d_auto_picks_block_for_large_grids():
    """x_mode='auto' keeps the dense path for small grids and switches
    to the block path once the dense x operator would exceed VMEM —
    the constructor no longer raises at npts > ~600."""
    p, n = 4, 256  # npts = 1025: dense operator 2*1152^2*4B = 10.6 MB
    npts = n * p + 1
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    Kx, Mx = np.asarray(K1u * n), np.asarray(M1u / n)
    rk = ResidentTerms2D(npts, p, [[Kx, Mx], [Mx, Kx]], "float32",
                         interpret=True)
    assert rk.x_mode == "block"
    rk_small = ResidentTerms2D(161, p, [[Kx[:161, :161], Mx[:161, :161]],
                                        [Mx[:161, :161], Kx[:161, :161]]],
                               "float32", interpret=True)
    assert rk_small.x_mode == "dense"


def test_resident_2d_cg_matches_flat():
    """2D resident CG (uniform grid) parity with the flat CG."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.solvers.resident import resident_jacobi_cg
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_cube(2, 5)
    dofs = DoFHandler(mesh, 3)
    mf = MatrixFree.build(
        mesh, dofs, FemConfig(2, 3, scatter="separable", use_pallas=True))
    assert mf.resident is not None
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    rng = np.random.default_rng(4)
    mask = np.asarray(mf.interior_mask)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs))
    res_flat = cg_solve(op.vmult, b, M_inv=make_jacobi(diag), rtol=1e-8,
                        maxiter=400)
    res_r = resident_jacobi_cg(op, b, diag=diag, rtol=1e-8, maxiter=400)
    assert int(res_r.iterations) == int(res_flat.iterations)
    xr, xf = np.asarray(res_r.x), np.asarray(res_flat.x)
    assert np.linalg.norm(xr - xf) <= 1e-8 * max(np.linalg.norm(xf), 1.0)


# ---------------------------------------------------------------------
# separable variable coefficient (VERDICT r4 item 2): exactly-factored
# weighted 1D matrices ride the terms apply + ResidentTerms kernel
# ---------------------------------------------------------------------
def _sep_coef_axes(dim):
    cs = [lambda x: 1.0 + 0.5 * np.sin(2.1 * np.pi * x),
          lambda y: 1.3 + y * y,
          lambda z: np.exp(0.5 * z)]
    return cs[:dim]


@pytest.mark.parametrize("dim,p,r", [(2, 3, 3), (3, 2, 2), (3, 4, 2)])
def test_separable_coefficient_matches_assembled_oracle(dim, p, r):
    """coefficient_axes operator == assembled Gauss oracle with the
    product coefficient, to rounding (the factorization is exact)."""
    from tpufem.fem.assemble import assemble_laplace
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    cax = _sep_coef_axes(dim)

    def coef(pts):
        out = np.ones(pts.shape[0])
        for a in range(dim):
            out = out * np.asarray(cax[a](pts[:, a]))
        return out

    mesh = Mesh.hyper_cube(dim, r)
    dofs = DoFHandler(mesh, p)
    K = assemble_laplace(dofs, coefficient=coef)
    mf = MatrixFree.build(
        mesh, dofs, FemConfig(dim, p, dtype="float64",
                              scatter="separable"),
        coefficient_axes=cax)
    assert mf.sep_ops[0] == "terms"
    op = LaplaceOperator(mf)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    y_ref = K @ x
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-12
    # diagonal synthesized from the product coefficient
    diag = np.asarray(op.diagonal())
    mask = np.asarray(mf.interior_mask) > 0
    d_ref = K.diagonal()
    assert np.allclose(diag[mask], d_ref[mask], rtol=1e-10)


def test_separable_coefficient_resident_kernel_and_cg():
    """use_pallas routes the separable-coefficient operator through the
    ResidentTerms kernel; resident CG matches the flat CG."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.solvers.resident import resident_jacobi_cg
    from tpufem.utils.config import FemConfig

    cax = _sep_coef_axes(3)
    mesh = Mesh.hyper_cube(3, 3)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(
        mesh, dofs, FemConfig(3, 2, scatter="separable", use_pallas=True),
        coefficient_axes=cax)
    assert mf.resident is not None and isinstance(
        mf.sep_ops[2], ResidentTerms)
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    rng = np.random.default_rng(4)
    mask = np.asarray(mf.interior_mask)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs))
    res_flat = cg_solve(op.vmult, b, M_inv=make_jacobi(diag), rtol=1e-8,
                        maxiter=400)
    res_r = resident_jacobi_cg(op, b, diag=diag, rtol=1e-8, maxiter=400)
    assert int(res_r.iterations) == int(res_flat.iterations)
    xr, xf = np.asarray(res_r.x), np.asarray(res_flat.x)
    assert np.linalg.norm(xr - xf) <= 1e-8 * max(np.linalg.norm(xf), 1.0)


def test_separable_coefficient_rejects_both_coefficients():
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    mesh = Mesh.hyper_cube(2, 2)
    dofs = DoFHandler(mesh, 2)
    with pytest.raises(ValueError, match="not both"):
        MatrixFree.build(mesh, dofs, FemConfig(2, 2),
                         coefficient=lambda pts: np.ones(pts.shape[0]),
                         coefficient_axes=_sep_coef_axes(2))


def test_cp_decompose_grid_exact_low_rank():
    from tpufem.ops.separable import cp_decompose_grid

    rng = np.random.default_rng(0)
    vs = [rng.standard_normal(9) for _ in range(3)]
    ws = [rng.standard_normal(9) for _ in range(3)]
    T = (np.einsum("z,y,x->zyx", *vs) + 0.5 * np.einsum("z,y,x->zyx", *ws))
    facs, err = cp_decompose_grid(T, max_rank=4, tol=1e-12)
    assert len(facs) <= 3 and err < 1e-10


@pytest.mark.parametrize("dim,p,r", [(2, 2, 3), (3, 2, 2)])
def test_cp_coefficient_operator_certified(dim, p, r):
    """A NON-separable smooth coefficient (step-37 style) rides the
    terms fast path via CP expansion: the operator matches the exact
    per-qpoint oracle within the certified coefficient error."""
    from tpufem.fem.assemble import assemble_laplace
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    coef = lambda pts: 1.0 / (0.5 + 2.0 * np.sum(pts**2, axis=1))
    mesh = Mesh.hyper_cube(dim, r)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(
        mesh, dofs,
        FemConfig(dim, p, dtype="float64", scatter="separable"),
        coefficient=coef, coefficient_cp_tol=1e-9,
        coefficient_cp_max_rank=12)
    assert mf.sep_ops[0] == "terms"
    # this coefficient's intrinsic CP spectrum needs ~rank 12 for 1e-6
    # in 3D (measured); 2D SVD reaches ~1e-10
    assert mf.coef_cp_err is not None and mf.coef_cp_err < 2e-5, \
        mf.coef_cp_err
    K = assemble_laplace(dofs, coefficient=coef)
    op = LaplaceOperator(mf)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(x)))
    y_ref = K @ x
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    # operator perturbation is bounded by the certified coefficient
    # error (times a modest norm-equivalence constant)
    assert rel < 50 * max(mf.coef_cp_err, 1e-15), (rel, mf.coef_cp_err)
    assert rel < 1e-3
