"""Poisson solver with geometric-multigrid-preconditioned CG.

Reference analogue: ``poisson_mg.cu`` (SURVEY.md §2, §3.5): CG
preconditioned by a GMG V-cycle with Chebyshev smoothing per level and
sum-factorized level transfer — BASELINE config 5 (variable-coefficient
operator + Chebyshev-smoothed GMG V-cycle CG).

Run:  python -m tpufem.apps.poisson_mg --dim 2 --degree 2 --refine 5
"""

from __future__ import annotations

import argparse
import time

import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import assemble_rhs, integrate_difference
from tpufem.apps.poisson import default_solution, dirichlet_setup
from tpufem.operators.laplace import LaplaceOperator
from tpufem.solvers.cg import cg_solve
from tpufem.solvers.multigrid import GeometricMultigrid


def solve_poisson_mg(
    dim: int = 2,
    degree: int = 2,
    refine: int = 5,
    coarsest: int = 1,
    dtype: str = "float64",
    smoother_degree: int = 4,
    coefficient=None,
    rtol: float | None = None,
    warm: bool = False,
    precond_dtype: str | None = None,
):
    """GMG-preconditioned CG.

    precond_dtype: run the ENTIRE V-cycle hierarchy in a lower precision
    (e.g. "bfloat16") while the outer CG stays in ``dtype``.  The
    preconditioner's precision affects only the iteration count, never the
    attainable accuracy — the TPU-native mixed-precision play (bf16 MXU
    passes are the fast path the hardware is built for).
    """
    from tpufem.apps.poisson import _ensure_dtype

    _ensure_dtype(dtype)
    if rtol is None:
        rtol = 1e-10 if dtype == "float64" else 1e-6
    t0 = time.perf_counter()
    gmg = GeometricMultigrid(
        dim=dim, degree=degree, finest_refine=refine,
        coarsest_refine=coarsest, dtype=precond_dtype or dtype,
        smoother_degree=smoother_degree, coefficient=coefficient,
    )
    if precond_dtype is not None and precond_dtype != dtype:
        # the outer operator runs in the solve dtype
        import jax.numpy as _jnp

        from tpufem.operators.laplace import LaplaceOperator as _LO
        from tpufem.ops.matrix_free import MatrixFree as _MF
        from tpufem.utils.config import FemConfig as _FC

        # reuse the fine level's host data; only device arrays change dtype
        mesh_f = gmg.fine.mf.mesh
        dofs_f = gmg.fine.mf.dofs
        mf_f = _MF.build(mesh_f, dofs_f,
                         _FC(dim=dim, degree=degree, dtype=dtype),
                         coefficient=coefficient)
        op_f = _LO(mf_f)
        solve_dt = _jnp.dtype(dtype)
        pre_dt = _jnp.dtype(precond_dtype)
        precond_with = lambda gdp_, r: gmg.preconditioner_with(
            gdp_, r.astype(pre_dt)).astype(solve_dt)
        fine_mf, fine_op = mf_f, op_f
    else:
        precond_with = gmg.preconditioner_with
        fine_mf, fine_op = gmg.fine.mf, gmg.fine.op
    mf = fine_mf
    dofs = mf.dofs
    op = fine_op
    u_exact, f = default_solution(dim)
    b = assemble_rhs(dofs, f)
    g = np.zeros(dofs.n_dofs)
    bv = dofs.boundary_mask
    g[bv] = u_exact(dofs.dof_coords[bv])
    b_con, x0 = dirichlet_setup(op, b, g)
    setup_time = time.perf_counter() - t0

    import jax

    # every device array (fine operator data + the whole V-cycle
    # hierarchy) enters the jitted solve as an ARGUMENT (platform rule,
    # see MatrixFree.device_args)
    solve = jax.jit(lambda dp_, gdp_, b_, x0_: cg_solve(
        lambda v: op.vmult_with(dp_, v), b_,
        M_inv=lambda r: precond_with(gdp_, r), x0=x0_, rtol=rtol))
    sargs = (op.device_args, gmg.device_args)
    if warm:
        jax.block_until_ready(solve(*sargs, b_con, x0).x)
    t1 = time.perf_counter()
    res = solve(*sargs, b_con, x0)
    jax.block_until_ready(res.x)
    x = np.asarray(res.x)
    solve_time = time.perf_counter() - t1
    if not bool(res.converged):
        import sys

        print(
            f"WARNING: GMG-CG did not converge in {int(res.iterations)} "
            f"iterations (residual {float(res.residual):.3e})",
            file=sys.stderr,
        )
    err = integrate_difference(dofs, x.astype(np.float64), u_exact)
    return {
        "n_dofs": dofs.n_dofs,
        "iterations": int(res.iterations),
        "residual": float(res.residual),
        "l2_error": err,
        "setup_time": setup_time,
        "solve_time": solve_time,
        "solution": x,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--degree", type=int, default=2)
    ap.add_argument("--refine", type=int, default=5)
    ap.add_argument("--coarsest", type=int, default=1)
    ap.add_argument("--smoother-degree", type=int, default=4)
    ap.add_argument("--variable-coefficient", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (some TPU plugins ignore "
                         "JAX_PLATFORMS; this flag always works)")
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--precond-dtype", default=None,
                    help="run the V-cycle in this dtype (e.g. bfloat16) "
                         "while the outer CG stays in --dtype")
    ap.add_argument("--warm", action="store_true",
                    help="time the second solve (steady state)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    coef = None
    if args.variable_coefficient:
        coef = lambda x: 1.0 + np.sum(x**2, axis=1)
    r = solve_poisson_mg(
        dim=args.dim, degree=args.degree, refine=args.refine,
        coarsest=args.coarsest, smoother_degree=args.smoother_degree,
        coefficient=coef, dtype=args.dtype, warm=args.warm,
        precond_dtype=args.precond_dtype,
    )
    print(f"dofs:       {r['n_dofs']}")
    print(f"setup:      {r['setup_time']:.3f} s")
    print(f"solve:      {r['solve_time']:.3f} s   ({r['iterations']} CG iters)")
    print(f"L2 error:   {r['l2_error']:.6e}")


if __name__ == "__main__":
    main()
